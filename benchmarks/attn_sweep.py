"""Block-size sweep for the flash-attention kernel on the real TPU.

Usage: python benchmarks/attn_sweep.py [--dtype bf16] [--causal] [--bwd]
Prints one JSON line per (block_q, block_k) config with achieved TFLOP/s
(useful flops: causal counts the lower triangle only).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from perf_suite import timeit  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    parser.add_argument("--causal", action="store_true")
    parser.add_argument("--bwd", action="store_true")
    parser.add_argument("--shape", default="4,16,1536,64")
    parser.add_argument("--blocks", default="256,512,768,1024,1536")
    args = parser.parse_args()

    from aat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import aat_tpu.ops.attention as attn

    b, h, t, d = map(int, args.shape.split(","))
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (b, h, t, d)), dtype)
    k = jnp.asarray(rng.normal(0, 1, (b, h, t, d)), dtype)
    v = jnp.asarray(rng.normal(0, 1, (b, h, t, d)), dtype)
    mask = jnp.ones((b, t), jnp.int32)
    fwd_flops = 4 * b * h * t * t * d / (2 if args.causal else 1)
    # bwd: dq(3 matmuls) + dkv(4 matmuls) vs fwd's 2
    tot_flops = fwd_flops * (1 + 3.5) if args.bwd else fwd_flops

    blocks = [int(x) for x in args.blocks.split(",")]
    for bq in blocks:
        for bk in blocks:
            if bq > t or bk > t:
                continue

            def run(q, k, v, bq=bq, bk=bk):
                if args.bwd:
                    def loss(q, k, v):
                        o, _, _ = attn._flash_forward(
                            q, k, v, mask, args.causal, d ** -0.5,
                            block_q=bq, block_k=bk)
                        return jnp.sum(o.astype(jnp.float32) ** 2)

                    # grad path goes through custom vjp only via public fn;
                    # drive it directly for block control
                    def loss2(q, k, v):
                        out, lse, _ = attn._flash_forward(
                            q, k, v, mask, args.causal, d ** -0.5,
                            block_q=bq, block_k=bk)
                        g = out.astype(q.dtype)
                        return attn._flash_backward(
                            q, k, v, mask, out, lse, args.causal, d ** -0.5,
                            g, block_q=bq, block_k=bk)

                    return loss2(q, k, v)
                out, _, _ = attn._flash_forward(
                    q, k, v, mask, args.causal, d ** -0.5,
                    block_q=bq, block_k=bk)
                return out

            try:
                fn = jax.jit(run)
                dt = timeit(fn, q, k, v, iters=20)
                print(json.dumps({
                    "block_q": bq, "block_k": bk, "dtype": args.dtype,
                    "causal": args.causal, "bwd": args.bwd,
                    "tflops": round(tot_flops / dt / 1e12, 1),
                    "ms": round(dt * 1e3, 3),
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "block_q": bq, "block_k": bk,
                    "error": str(e)[:200],
                }), flush=True)


if __name__ == "__main__":
    main()
