"""Block-shape sweep for the causal flash kernels on the real TPU.

The causal fwd+bwd number (39.8-60.9 TFLOP/s bf16 at [4,16,1536,64] in r2)
trails the non-causal 95.4 — sweep (block_q, block_k) for the triangular
grid, fwd and bwd independently, to find the best shapes.

    python benchmarks/sweep_causal.py [--fwd-only]
"""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from perf_suite import timeit  # noqa: E402  (same timing methodology)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fwd-only", action="store_true")
    parser.add_argument("--shape", default="4,16,1536,64")
    args = parser.parse_args()

    from aat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from aat_tpu.ops import attention as att

    b, h, t, d = (int(x) for x in args.shape.split(","))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32)).astype(jnp.bfloat16)
    mask = jnp.ones((b, t), jnp.int32)
    sm = d ** -0.5
    fwd_flops = 4 * b * h * t * t * d / 2  # causal
    bwd_work = 4.5 * 4 * b * h * t * t * d / 2

    blocks = [256, 384, 512, 768, 1024, 1536]
    best = {"fwd": (None, 0.0), "bwd": (None, 0.0)}

    for bq, bk in itertools.product(blocks, blocks):
        if bq * bk * 4 > att._SCORE_VMEM_BUDGET:
            continue
        try:
            f = jax.jit(lambda q, k, v, bq=bq, bk=bk: att._flash_forward(
                q, k, v, mask, True, sm, block_q=bq, block_k=bk,
                need_residuals=False)[0])
            dt = timeit(f, q, k, v, iters=20)
            tf = fwd_flops / dt / 1e12
            print(json.dumps({"kind": "fwd", "bq": bq, "bk": bk,
                              "ms": round(dt * 1e3, 3),
                              "tflops": round(tf, 1)}), flush=True)
            if tf > best["fwd"][1]:
                best["fwd"] = ((bq, bk), tf)
        except Exception as e:  # noqa: BLE001 — sweep must survive bad configs
            print(json.dumps({"kind": "fwd", "bq": bq, "bk": bk,
                              "error": str(e)[:200]}), flush=True)

    if not args.fwd_only:
        for bq, bk in itertools.product(blocks, blocks):
            if bq * bk * 4 > att._SCORE_VMEM_BUDGET:
                continue
            try:
                # fwd at its default causal blocks + bwd at the swept blocks
                def run(q, k, v, bq=bq, bk=bk):
                    out, lse, _ = att._flash_forward(q, k, v, mask, True, sm)
                    g = jnp.ones_like(out)
                    return att._flash_backward(q, k, v, mask, out, lse, True,
                                               sm, g, block_q=bq, block_k=bk)

                f = jax.jit(run)
                dt = timeit(f, q, k, v, iters=10)
                tf = bwd_work / dt / 1e12
                print(json.dumps({"kind": "fwd+bwd", "bq": bq, "bk": bk,
                                  "ms": round(dt * 1e3, 3),
                                  "tflops": round(tf, 1)}), flush=True)
                if tf > best["bwd"][1]:
                    best["bwd"] = ((bq, bk), tf)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"kind": "fwd+bwd", "bq": bq, "bk": bk,
                                  "error": str(e)[:200]}), flush=True)

    print(json.dumps({"best": {k: {"blocks": v[0], "tflops": round(v[1], 1)}
                               for k, v in best.items()}}), flush=True)


if __name__ == "__main__":
    main()
