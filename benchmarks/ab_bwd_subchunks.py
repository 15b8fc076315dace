"""Same-process A/B: fused attention backward with the block body split
into N independent k sub-spans (attention._BWD_SUBCHUNKS) vs the single
chain — the hypothesis was that one span's VPU tail (exp/ds, dropout hash)
overlaps the next span's MXU matmuls under Mosaic's scheduler.

MEASURED DEAD END (2026-08-18): the kernel-side knob was implemented
(variadic chunk-shifted bias blocks — a lane-offset slice of the [1, BK]
bias row is an invalid Mosaic broadcast layout — sub-sliced k/v sublanes,
parity to 1e-3 bf16 incl. dropout masks), and the A/B measured NO win:
dense 1.30/1.35/1.32 ms at nsub 1/2/4 (rate 0), 1.62/1.57/1.58 with
dropout 0.1 (~2-3%, within tunnel noise); causal 1.15/1.14/1.31 — nsub=4
is 13% WORSE. Mosaic either already overlaps VPU/MXU across grid steps or
serializes the emitted chains regardless; the extra in-body parallelism
buys nothing. The knob was REVERTED from ops/attention.py — running this
file now A/Bs identical kernels (the monkeypatched global is ignored).

Shapes [4,16,1536,64] bf16; dense + causal, dropout 0.0 / 0.1.

    python benchmarks/ab_bwd_subchunks.py
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

    def bwd_fn(nsub, causal, rate, out, lse):
        def f(x, q, k, v, out, lse, g):
            attn._BWD_SUBCHUNKS = nsub
            qq = q + x[0, 0, 0, 0].astype(q.dtype)
            dq, dk, dv = attn._flash_backward(
                qq, k, v, mask, out, lse, causal, sm, g,
                dropout_rate=rate, dropout_seed=7 if rate else None)
            return x + dq.astype(jnp.float32) * 1e-6

        return f

    x0 = jnp.zeros((B, H, T, D), jnp.float32)
    for causal in (False, True):
        out, lse, _ = attn._flash_forward(q, k, v, mask, causal, sm)
        for rate in (0.0, 0.1):
            # parity across sub-chunk counts
            base = None
            for nsub in (1, 2, 4):
                attn._BWD_SUBCHUNKS = nsub
                got = attn._flash_backward(
                    q, k, v, mask, out, lse, causal, sm, g,
                    dropout_rate=rate, dropout_seed=7 if rate else None)
                got = [np.asarray(t.astype(jnp.float32)) for t in got]
                if base is None:
                    base = got
                else:
                    err = max(float(np.abs(a - b).max())
                              for a, b in zip(got, base))
                    print(json.dumps({"causal": causal, "rate": rate,
                                      "nsub": nsub,
                                      "max_diff_vs_1": err}), flush=True)

            flops = 10 * B * H * T * T * D // (2 if causal else 1)
            for rep in range(2):
                for nsub in (1, 2, 4):
                    dt = scan_time_diff(bwd_fn(nsub, causal, rate, out, lse),
                                        x0, iters_hi=120, iters_lo=20,
                                        pairs=3, consts=(q, k, v, out, lse, g))
                    print(json.dumps({
                        "causal": causal, "rate": rate, "nsub": nsub,
                        "rep": rep, "ms": round(dt * 1e3, 3),
                        "tflops_bwd_only": round(flops / dt / 1e12, 1),
                    }), flush=True)
    attn._BWD_SUBCHUNKS = 1


if __name__ == "__main__":
    main()
