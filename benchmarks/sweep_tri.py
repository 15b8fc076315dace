"""Same-process block sweep for the CAUSAL triangular-grid flash kernels.

Round-3 state: causal fused fwd+bwd measures 1.78 ms at [4,16,1536,64]
bf16 (49 TFLOP/s causal-counted) vs non-causal 1.99 ms — but causal does
~half the work, so the efficiency gap is real. At 512x512 blocks the
triangle covers 6/9 blocks (area 0.667, not 0.5); finer blocks track the
triangle tighter (0.583 at 256^2, 0.542 at 128^2) at the cost of per-step
overhead. This sweep times the tri kernels directly with the chained
``lax.scan`` methodology (one dispatch, serialized iterations — the only
timing that beats this tunnel's per-dispatch jitter), all variants in ONE
process, interleaved twice.

    python benchmarks/sweep_tri.py [--shape 4,16,1536,64] [--fwd-only]
"""

import argparse
import itertools
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

from aat_tpu.ops import attention as att  # noqa: E402


from scan_timing import scan_time_diff


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="4,16,1536,64")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--bwd-only", action="store_true")
    ap.add_argument("--blocks", default="128,256,384,512,768")
    args = ap.parse_args()

    b, h, t, d = map(int, args.shape.split(","))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (b, h, t, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (b, h, t, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (b, h, t, d)), jnp.bfloat16)
    mask = jnp.ones((b, t), jnp.int32)
    sm = d ** -0.5
    fwd_flops = 4 * b * h * t * t * d / 2        # causal triangle only
    bwd_flops = fwd_flops * 3.5                  # fwd(4) + fused bwd(10)

    blocks = [int(x) for x in args.blocks.split(",")]
    combos = [(bq, bk) for bq, bk in itertools.product(blocks, blocks)
              if bq * bk * 4 <= att._SCORE_VMEM_BUDGET]

    results = {"fwd": {}, "fwdbwd": {}}

    def fwd_fn(bq, bk):
        def f(x, k, v, mask):
            out = att._flash_forward(x, k, v, mask, True, sm,
                                     block_q=bq, block_k=bk,
                                     need_residuals=False)[0]
            return out.astype(x.dtype)
        return f

    def fwdbwd_fn(fbq, fbk, bbq, bbk):
        # direct vjp wiring so the backward blocks are sweepable
        def f(x, k, v, mask):
            out, lse, _ = att._flash_forward(x, k, v, mask, True, sm,
                                             block_q=fbq, block_k=fbk)
            g = out  # any cotangent; reuse out to stay data-dependent
            dq, _, _ = att._flash_backward(x, k, v, mask, out, lse, True,
                                           sm, g, block_q=bbq, block_k=bbk)
            return dq.astype(x.dtype)
        return f

    for rep in range(2):
        if not args.bwd_only:
            for bq, bk in combos:
                try:
                    dt = scan_time_diff(fwd_fn(bq, bk), q, iters_hi=args.iters + 20, iters_lo=20, consts=(k, v, mask))
                except Exception as e:  # noqa: BLE001 — sweep survives bad configs
                    print(json.dumps({"kind": "fwd", "bq": bq, "bk": bk,
                                      "error": str(e)[:160]}), flush=True)
                    continue
                tf = fwd_flops / dt / 1e12
                print(json.dumps({"kind": "fwd", "bq": bq, "bk": bk,
                                  "rep": rep, "ms": round(dt * 1e3, 3),
                                  "tflops": round(tf, 1)}), flush=True)
                prev = results["fwd"].get((bq, bk), float("inf"))
                results["fwd"][(bq, bk)] = min(prev, dt)
        if not args.fwd_only:
            for bq, bk in combos:
                try:
                    dt = scan_time_diff(fwdbwd_fn(512, 512, bq, bk), q,
                                         iters_hi=args.iters + 20, iters_lo=20,
                                         consts=(k, v, mask))
                except Exception as e:  # noqa: BLE001
                    print(json.dumps({"kind": "fwd+bwd", "bq": bq, "bk": bk,
                                      "error": str(e)[:160]}), flush=True)
                    continue
                tf = bwd_flops / dt / 1e12
                print(json.dumps({"kind": "fwd+bwd", "bq": bq, "bk": bk,
                                  "rep": rep, "ms": round(dt * 1e3, 3),
                                  "tflops": round(tf, 1)}), flush=True)
                prev = results["fwdbwd"].get((bq, bk), float("inf"))
                results["fwdbwd"][(bq, bk)] = min(prev, dt)

    for kind, table in results.items():
        if not table:
            continue
        flops = fwd_flops if kind == "fwd" else bwd_flops
        best = min(table.items(), key=lambda kv: kv[1])
        print(json.dumps({"best_" + kind: {
            "blocks": list(best[0]), "ms": round(best[1] * 1e3, 3),
            "tflops": round(flops / best[1] / 1e12, 1)}}), flush=True)


if __name__ == "__main__":
    main()
