"""Same-process A/B: causal flash forward, rectangular pl.when grid (old)
vs flattened lower-triangle grid (new).

Loads the committed aat_tpu/ops/attention.py (written by the caller to
--old, e.g. ``git show <ref>:aat_tpu/ops/attention.py``) as a standalone
module — the file is self-contained — so both variants run in ONE process,
the only timing methodology that beats this tunnel's per-dispatch jitter.

Timing: a 50-iteration chained ``lax.scan`` whose carry feeds each step's
output back into the next step's input (data-dependent → one dispatch,
iterations serialized on device).

    python benchmarks/ab_causal_tri_fwd.py --old /tmp/attention_old.py
"""

import argparse
import importlib.util
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


def load_old(path):
    spec = importlib.util.spec_from_file_location("attention_old", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def scan_time(fn, x, iters, fetch_rtt):
    """One dispatch, `iters` serialized applications; returns sec/iter."""
    def step(carry, _):
        return fn(carry), None

    run = jax.jit(lambda x: jax.lax.scan(step, x, None, length=iters)[0])
    out = run(x)  # compile + warm
    float(out.ravel()[0])
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        out = run(x)
        float(out.ravel()[0])  # forces the whole queue
        best = min(best, time.perf_counter() - t0 - fetch_rtt)
    return best / iters


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
    ap.add_argument("--old", required=True)
    ap.add_argument("--shape", default="4,16,1536,64")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import aat_tpu.ops.attention as new_mod
    old_mod = load_old(args.old)

    b, h, t, d = map(int, args.shape.split(","))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (b, h, t, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (b, h, t, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (b, h, t, d)), jnp.bfloat16)
    mask = jnp.ones((b, t), jnp.int32)
    sm = d ** -0.5
    fwd_flops = 4 * b * h * t * t * d / 2  # causal: triangle only
    bwd_flops = fwd_flops * 3.5            # fwd 4 + bwd(10) = 14 units / 4

    rtt = measure_rtt()
    print(json.dumps({"fetch_rtt_ms": round(rtt * 1e3, 1)}), flush=True)

    def fwd_fn(mod):
        def f(x):
            out = mod._flash_forward(x, k, v, mask, True, sm,
                                     need_residuals=False)[0]
            return out.astype(x.dtype)
        return f

    def fwdbwd_fn(mod):
        def loss(x):
            out = mod.flash_attention(x, k, v, mask, True, sm)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.grad(loss)

        def f(x):
            return g(x).astype(x.dtype)
        return f

    # interleave old/new twice to expose within-process drift
    for rep in range(2):
        for label, mod in (("old_rect", old_mod), ("new_tri", new_mod)):
            dt = scan_time(fwd_fn(mod), q, args.iters, rtt)
            print(json.dumps({
                "kind": "fwd", "variant": label, "rep": rep,
                "ms": round(dt * 1e3, 3),
                "tflops": round(fwd_flops / dt / 1e12, 1)}), flush=True)
    for rep in range(2):
        for label, mod in (("old_rect", old_mod), ("new_tri", new_mod)):
            dt = scan_time(fwdbwd_fn(mod), q, args.iters, rtt)
            print(json.dumps({
                "kind": "fwd+bwd", "variant": label, "rep": rep,
                "ms": round(dt * 1e3, 3),
                "tflops": round(bwd_flops / dt / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
