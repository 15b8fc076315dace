"""Price the fused Pallas conv-stack kernel (VERDICT r4 item 3): measure
the conv stack's distance to its own matmul floor at the official
whole-utterance shapes, i.e. the CEILING of what a perfect fusion kernel
(inter-layer activations in VMEM, dW in scratch) could recover.

Two arms, same GEMM FLOPs:

  stack  — the production `feature_extractor` (chunked s2d GEMM stack),
           fwd + full bwd (dW + dx), exactly as the train step runs it.
  floor  — the seven equivalent dense GEMMs alone (im2col'd shapes
           [rows_i, C_in*k_i] x [C_in*k_i, C_out]), fwd + dW + dx, with
           NO im2col/halo/LN/GELU between them: the time a perfect
           fusion cannot go below (the MXU work is irreducible).

The difference is the best case for the kernel. Compare it against the
official bs=4 row (270.8 ms, 443.2 audio_s/s, 38.3% MFU) to decide
build-or-kill. Reference ground: the encoder train path
(/root/reference/scripts/trainer_train.py:195-225).

    python benchmarks/ab_conv_floor.py [--bs 4] [--seconds 30]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aat_tpu.models import hubert as hub

    cfg = hub.hubert_large_config()
    l = int(args.seconds * 16000)
    b = args.bs
    key = jax.random.PRNGKey(0)
    params = {"feature_extractor":
              hub.init_hubert_params(key, cfg)["feature_extractor"]}
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    wave = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.3, (b, l)).astype(np.float32)
    ).astype(jnp.bfloat16)

    rtt = _measure_rtt(jax, jnp)

    # ---- arm 1: the production stack, fwd + dW + dx -------------------
    # squared loss: the cotangent depends on the forward value, so XLA
    # cannot simplify dW to column sums (a constant cotangent turns every
    # GEMM into a reduction and the arm measures nothing). Grads wrt
    # params ONLY: the real train step never backprops to the waveform
    # (no col2im scatter exists in the production program).
    def stack_loss(p, w):
        y = hub.feature_extractor(p, cfg, w).astype(jnp.float32)
        return jnp.sum(y * y) * 1e-6

    stack_step = jax.jit(jax.grad(stack_loss, argnums=0))

    # ---- arm 2: the pure GEMM floor (same contraction shapes) ---------
    # per-layer im2col'd GEMM: [rows_i, cin*k] x [cin*k, cout]
    shapes = []
    ln = l
    cin = 1
    for kk, s, cout in zip(cfg.conv_kernel, cfg.conv_stride, cfg.conv_dim):
        ln = (ln - kk) // s + 1
        shapes.append((b * ln, cin * kk, cout))
        cin = cout
    mats = [
        (
            jnp.asarray(
                np.random.default_rng(i).normal(0, 0.1, (r, ck)),
                dtype=jnp.bfloat16,
            ),
            jnp.asarray(
                np.random.default_rng(100 + i).normal(0, 0.1, (ck, co)),
                dtype=jnp.bfloat16,
            ),
        )
        for i, (r, ck, co) in enumerate(shapes)
    ]

    # the floor arm takes grads wrt weights AND inputs: fwd + dW + dx per
    # layer, mirroring the stack's internal chain (its dx GEMMs feed the
    # lower layers' dW); layer-0 dx [rows,10]x[10,1] is negligible.
    def floor_loss(ws, xs):
        acc = jnp.float32(0)
        for x, w in zip(xs, ws):
            y = jnp.dot(x, w).astype(jnp.float32)
            acc = acc + jnp.sum(y * y) * 1e-6
        return acc

    floor_step = jax.jit(jax.grad(floor_loss, argnums=(0, 1)))
    weights = [w for _, w in mats]
    inputs = [x for x, _ in mats]

    def timeit(fn, *a):
        out = fn(*a)  # compile
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*a)
            _ = float(jax.tree.leaves(out)[0].ravel()[0])  # force completion
            dt = (time.perf_counter() - t0 - rtt) / args.iters
            best = min(best, dt)
        return best

    t_stack = timeit(stack_step, params, wave)
    t_floor = timeit(floor_step, weights, inputs)
    gflop = sum(2 * 3 * r * ck * co for r, ck, co in shapes) / 1e9
    print(
        json.dumps(
            {
                "bs": b,
                "stack_ms": round(t_stack * 1e3, 2),
                "floor_ms": round(t_floor * 1e3, 2),
                "fusion_ceiling_ms": round((t_stack - t_floor) * 1e3, 2),
                "floor_tflops": round(gflop / t_floor / 1e3, 1),
                "gemm_tflop": round(gflop / 1e3, 2),
            }
        ),
        flush=True,
    )


def _measure_rtt(jax, jnp):
    x = jax.device_put(jnp.float32(1.0))
    for _ in range(3):
        _ = float(x)
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(x)
    return (time.perf_counter() - t0) / 5


if __name__ == "__main__":
    main()
