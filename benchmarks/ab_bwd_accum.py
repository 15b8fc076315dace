"""Same-process A/B: fused-backward dk/dv scratch accumulation strategies
(VERDICT r3 item 5 — the diagnosed Mosaic-pipelining gap of the scratch
accumulators) at [4,16,1536,64] bf16, causal (the production LM-decoder
shape) and dense:

  dynamic — one [Sp, D] accumulator, RMW at the dynamic row offset (default)
  static  — compile-time unrolled pl.when per k-block, static slice offsets
  parity  — double-buffered accumulators alternated by step parity (static
            slices), halving the serial RMW dependency chain

    python benchmarks/ab_bwd_accum.py
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

    for causal in (True, False):
        out, lse, _ = attn._flash_forward(q, k, v, mask, causal, sm)

        base = attn._flash_backward(q, k, v, mask, out, lse, causal, sm, g,
                                    accum_mode="dynamic")
        for mode in ("static", "parity"):
            alt = attn._flash_backward(q, k, v, mask, out, lse, causal, sm,
                                       g, accum_mode=mode)
            err = max(float(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32)).max())
                      for a, b in zip(alt, base))
            print(json.dumps({"causal": causal, "mode": mode,
                              "max_diff_vs_dynamic": err}), flush=True)
            # static: same order, bitwise; parity: f32 add reorder, visible
            # at one bf16 ulp of the output grads here
            assert err <= (0.0 if mode == "static" else 0.01), \
                (causal, mode, err)

        def bwd_fn(mode, causal=causal, out=out, lse=lse):
            def f(x, q, k, v, out, lse, g):
                qq = q + x[0, 0, 0, 0].astype(q.dtype)
                dq, dk, dv = attn._flash_backward(
                    qq, k, v, mask, out, lse, causal, sm, g,
                    accum_mode=mode)
                return x + dq.astype(jnp.float32) * 1e-6

            return f

        x0 = jnp.zeros((B, H, T, D), jnp.float32)
        # bwd-only flop conventions: 10 units dense, 10/2 causal
        flops = 10 * B * H * T * T * D // (2 if causal else 1)
        # implied combined number under sweep_causal's 4.5-unit accounting
        comb_work = 4.5 * 4 * B * H * T * T * D / (2 if causal else 1)
        fwd_ms = {True: 0.487, False: None}[causal]  # r3 recorded tri fwd
        for rep in range(2):
            for mode in ("dynamic", "static", "parity"):
                try:
                    dt = scan_time_diff(bwd_fn(mode), x0, iters_hi=120,
                                        iters_lo=20, pairs=3,
                                        consts=(q, k, v, out, lse, g))
                    row = {"causal": causal, "mode": mode, "rep": rep,
                           "ms": round(dt * 1e3, 3),
                           "tflops_bwd_only": round(flops / dt / 1e12, 1)}
                    if fwd_ms is not None:
                        row["implied_fwd_bwd_tflops"] = round(
                            comb_work / (dt + fwd_ms * 1e-3) / 1e12, 1)
                    print(json.dumps(row), flush=True)
                except Exception as e:  # noqa: BLE001
                    print(json.dumps({"causal": causal, "mode": mode,
                                      "rep": rep, "error": str(e)[:140]}),
                          flush=True)


if __name__ == "__main__":
    main()
