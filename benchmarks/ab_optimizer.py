"""Same-process A/B: guarded AdamW as an optax chain + post-hoc guard
blends (old) vs the single-pass fused transform (new), at flagship state
size (hubert-large trained, SmolLM-135M frozen).

Timing: chained ``lax.scan`` over optimizer steps (grads derived from the
carried params so iterations serialize), one dispatch, interleaved twice.

    python benchmarks/ab_optimizer.py [--iters 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from aat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from aat_tpu.models import hubert as hub  # noqa: E402
from aat_tpu.models import llama as llm  # noqa: E402
from aat_tpu.training import optim as optim_lib  # noqa: E402


def measure_rtt():
    z = jax.jit(lambda x: x + 1.0)(jnp.zeros(()))
    float(z)
    best = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        float(jax.jit(lambda x: x + 1.0)(z))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    params = {
        "audio_encoder": hub.init_hubert_params(
            jax.random.PRNGKey(0), hub.hubert_large_config()),
        "lm_decoder": llm.init_llama_params(
            jax.random.PRNGKey(1), llm.smollm_135m_config()),
    }
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    freeze = optim_lib.trainable_mask(params, train_audio_encoder=True,
                                      train_lm_decoder=False)
    n_train = sum(
        int(np.prod(l.shape)) for l, t in zip(
            jax.tree.leaves(params), jax.tree.leaves(freeze)) if t)
    print(json.dumps({"params_m": round(n / 1e6, 1),
                      "trained_m": round(n_train / 1e6, 1)}), flush=True)
    lr = lambda step: 1e-4 * jnp.minimum(  # noqa: E731
        1.0, (step.astype(jnp.float32) + 1.0) / 100.0)

    old_tx = optim_lib.guard_nonfinite(
        optim_lib.adamw_grouped(lr, params, weight_decay=0.1, freeze=freeze),
        clip_norm=1.0)
    new_tx = optim_lib.fused_guarded_adamw(
        lr, params, weight_decay=0.1, clip_norm=1.0, freeze=freeze)

    params = jax.device_put(params)
    rtt = measure_rtt()
    print(json.dumps({"fetch_rtt_ms": round(rtt * 1e3, 1)}), flush=True)

    def bench(tx, label, rep):
        state0 = tx.init(params)

        def step(carry, _):
            p, s = carry
            grads = jax.tree.map(lambda x: x * 1e-3 + 1e-5, p)
            u, s = tx.update(grads, s, p)
            return (optax.apply_updates(p, u), s), None

        run = jax.jit(lambda p, s: jax.lax.scan(
            step, (p, s), None, length=args.iters)[0])
        out = run(params, state0)
        float(jax.tree.leaves(out[0])[0].ravel()[0])
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            out = run(params, state0)
            float(jax.tree.leaves(out[0])[0].ravel()[0])
            best = min(best, time.perf_counter() - t0)
        rtt_now = measure_rtt()
        dt = (best - rtt_now) / args.iters
        gb = n_train * 28 / 1e9
        print(json.dumps({"variant": label, "rep": rep,
                          "wall_ms": round(best * 1e3, 1),
                          "rtt_ms": round(rtt_now * 1e3, 1),
                          "ms_per_step": round(dt * 1e3, 2),
                          "roofline_gbps": round(gb / dt, 1)}), flush=True)
        return dt

    for rep in range(2):
        bench(old_tx, "old_chain_guard", rep)
        bench(new_tx, "fused", rep)


if __name__ == "__main__":
    main()
