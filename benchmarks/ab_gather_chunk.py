"""A/B the windowed_gather source-residency fix (VERDICT r4 item 2).

At batch 64 x 30 s the flattened-source row gather's operand
(f32[384000,80] = 123 MB) no longer fits VMEM and XLA's gather lowering
drops ~10x (24 ms device, traced). Variants that keep the source
batch-local (per-chunk ~<=32 MB):

  flat      — current: one global row gather over [B*L/blk, blk]
  batched   — take_along_axis with a leading batch dim ([B, L/blk, blk])
  chunked<k>— lax.map over batch chunks of k rows, flat gather per chunk

    python benchmarks/ab_gather_chunk.py [--batches 16 32 64 128]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from aat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def flat_gather(x, starts, length, block):
    b, l = x.shape
    s = starts.shape[1]
    rows = x.reshape(b * (l // block), block)
    n_rows = length // block
    row_idx = starts[..., None] // block + jnp.arange(n_rows)[None, None, :]
    row_idx = jnp.clip(row_idx, 0, l // block - 1)
    global_idx = (
        jnp.arange(b, dtype=row_idx.dtype)[:, None, None] * (l // block) + row_idx
    ).reshape(-1)
    return jnp.take(rows, global_idx, axis=0, mode="clip").reshape(b, s, length)


def batched_gather(x, starts, length, block):
    b, l = x.shape
    s = starts.shape[1]
    rows = x.reshape(b, l // block, block)
    n_rows = length // block
    row_idx = starts[..., None] // block + jnp.arange(n_rows)[None, None, :]
    row_idx = jnp.clip(row_idx, 0, l // block - 1).reshape(b, s * n_rows)
    out = jnp.take_along_axis(rows, row_idx[..., None], axis=1)
    return out.reshape(b, s, length)


def chunked_gather(x, starts, length, block, chunk):
    b, l = x.shape
    s = starts.shape[1]
    xc = x.reshape(b // chunk, chunk, l)
    sc = starts.reshape(b // chunk, chunk, s)
    out = jax.lax.map(
        lambda args: flat_gather(args[0], args[1], length, block), (xc, sc)
    )
    return out.reshape(b, s, length)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 32, 64, 128])
    args = ap.parse_args()

    l, s, length, block = 480000, 128, 24000, 80
    variants = {
        "flat": flat_gather,
        "batched": batched_gather,
        "chunked8": functools.partial(chunked_gather, chunk=8),
        "chunked16": functools.partial(chunked_gather, chunk=16),
    }
    for b in args.batches:
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (b, l)).astype(np.float32)
        starts = (
            rng.integers(0, (l - length) // block, (b, s)) * block
        ).astype(np.int32)
        xd, sd = jax.device_put(x), jax.device_put(starts)
        ref = None
        for name, fn in variants.items():
            if "chunked" in name and b % int(name[len("chunked"):]) != 0:
                continue
            jf = jax.jit(functools.partial(fn, length=length, block=block))
            out = jf(xd, sd)
            got = np.asarray(out[0, 0, :8])
            if ref is None:
                ref = got
            else:
                assert np.array_equal(ref, got), name
            _ = float(out[0, 0, 0])
            t0 = time.perf_counter()
            _ = float(out[0, 0, 0])
            rtt = time.perf_counter() - t0
            iters = 20
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = jf(xd, sd)
                _ = float(out[0, 0, 0])
                dt = min(dt, (time.perf_counter() - t0 - rtt) / iters)
            gb = b * s * length * 4 * 2 / 1e9  # read + write
            print(json.dumps({
                "batch": b, "variant": name, "ms": round(dt * 1e3, 3),
                "GB_s": round(gb / dt, 1),
            }), flush=True)
        print("---", flush=True)


if __name__ == "__main__":
    main()
