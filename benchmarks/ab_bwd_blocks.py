"""Same-process A/B: fused attention backward block shapes at
[4,16,1536,64] bf16 — the default (768,1536) two-q-step grid vs a
single-tile (1536,1536) grid (whole rectangle in one kernel visit per
batch-head; the f32 score block hits _SCORE_VMEM_BUDGET exactly).

    python benchmarks/ab_bwd_blocks.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from aat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aat_tpu.ops import attention as attn  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scan_timing import scan_time_diff  # noqa: E402

B, H, T, D = 4, 16, 1536, 64


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, H, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B, H, T, D)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(0, 1, (B, H, T, D)), jnp.bfloat16)
    mask = jnp.ones((B, T), jnp.int32)
    sm = D ** -0.5

    out, lse, _ = attn._flash_forward(q, k, v, mask, False, sm)

    def bwd_fn(bq, bk):
        def f(x, q, k, v, out, lse, g):
            qq = q + x[0, 0, 0, 0].astype(q.dtype)
            dq, dk, dv = attn._flash_backward(
                qq, k, v, mask, out, lse, False, sm, g,
                block_q=bq, block_k=bk)
            return x + dq.astype(jnp.float32) * 1e-6

        return f

    # numeric check between block choices
    base = attn._flash_backward(q, k, v, mask, out, lse, False, sm, g,
                                block_q=768, block_k=1536)
    for bq, bk in ((1536, 1536), (768, 768), (512, 1536)):
        try:
            alt = attn._flash_backward(q, k, v, mask, out, lse, False, sm, g,
                                       block_q=bq, block_k=bk)
            err = max(float(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32)).max())
                      for a, b in zip(alt, base))
            print(json.dumps({"blocks": [bq, bk], "max_diff_vs_default": err}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"blocks": [bq, bk], "error": str(e)[:140]}),
                  flush=True)

    x0 = jnp.zeros((B, H, T, D), jnp.float32)
    flops = 10 * B * H * T * T * D  # fused bwd unit convention
    for rep in range(2):
        for bq, bk in ((768, 1536), (1536, 1536), (768, 768), (512, 1536)):
            try:
                dt = scan_time_diff(bwd_fn(bq, bk), x0, iters_hi=120,
                                    iters_lo=20, pairs=3,
                                    consts=(q, k, v, out, lse, g))
                print(json.dumps({
                    "blocks": [bq, bk], "rep": rep,
                    "ms": round(dt * 1e3, 3),
                    "tflops_bwd_only": round(flops / dt / 1e12, 1),
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"blocks": [bq, bk], "rep": rep,
                                  "error": str(e)[:140]}), flush=True)


if __name__ == "__main__":
    main()
