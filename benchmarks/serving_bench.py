"""Continuous-batching engine throughput on the real TPU.

Measures steady-state decode tok/s at full slot occupancy (SmolLM-135M
shapes, random weights) and the prefill latency per request, using the
differencing scan methodology where applicable (decode steps are
host-driven dispatches by design, so the decode number is also reported
raw with the measured RTT subtracted per step batch).

    python benchmarks/serving_bench.py [--slots 8] [--steps 64]
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

from aat_tpu.models import llama as llm  # noqa: E402
from aat_tpu.serving import DecodeEngine, EngineConfig  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--prefill", type=int, default=96)
    ap.add_argument("--lm", choices=["smollm", "qwen"], default="smollm",
                    help="qwen = Qwen-1.5-1.8B shapes (the reference's "
                         "second LM option, config.py:42): 1.84B bf16 "
                         "params + the slot-pool KV cache on one v5e")
    args = ap.parse_args()

    if args.lm == "qwen":
        cfg = llm.qwen15_18b_config()
        params = llm.init_llama_params(jax.random.PRNGKey(0), cfg)
        # bf16 weights: 3.7 GB on device (f32 would be 7.4 of the 16 GB
        # HBM before the KV pool); decode math upcasts on the MXU anyway
        params = jax.tree.map(
            lambda x: np.asarray(x, jnp.bfloat16.dtype), params)
    else:
        cfg = llm.smollm_135m_config()
        params = llm.init_llama_params(jax.random.PRNGKey(0), cfg)
    print(json.dumps({"lm": args.lm, "params_m": round(sum(
        x.size for x in jax.tree.leaves(params)) / 1e6, 1)}), flush=True)
    eng = DecodeEngine(params, cfg, EngineConfig(
        max_slots=args.slots, max_prefill_len=args.prefill,
        max_new_tokens=args.steps, eos_token_id=-1,  # run full length
        cache_dtype="bfloat16"))

    rng = np.random.default_rng(0)
    lengths = rng.integers(args.prefill // 2, args.prefill + 1,
                           size=args.slots)

    def mk_req(n):
        e = np.zeros((args.prefill, cfg.hidden_size), np.float32)
        e[:n] = rng.normal(0, 0.5, (n, cfg.hidden_size))
        m = np.zeros((args.prefill,), np.int32)
        m[:n] = 1
        return jnp.asarray(e), jnp.asarray(m)

    # prefill latency (first submit compiles; time the rest)
    reqs = [mk_req(int(n)) for n in lengths]
    eng.submit(*reqs[0])
    float(eng.state.lengths[0])
    t0 = time.perf_counter()
    for r in reqs[1:]:
        eng.submit(*r)
    float(eng.state.lengths[args.slots - 1])
    prefill_ms = (time.perf_counter() - t0) / max(args.slots - 1, 1) * 1e3
    print(json.dumps({"prefill_ms_per_request": round(prefill_ms, 2)}),
          flush=True)

    # batched admission: drain the pool, then admit the same burst in ONE
    # dispatch (submit_many) — amortizes the per-request dispatch+RTT
    eng.drain()
    burst = reqs[: args.slots]
    eng.submit_many(burst)  # compile
    float(eng.state.lengths[0])
    eng.drain()
    t0 = time.perf_counter()
    eng.submit_many(burst)
    float(eng.state.lengths[0])
    batch_ms = (time.perf_counter() - t0) * 1e3
    print(json.dumps({
        "prefill_batched_ms_per_request": round(batch_ms / args.slots, 2),
        "burst": args.slots,
        "burst_total_ms": round(batch_ms, 2),
    }), flush=True)

    # steady-state decode at full occupancy: drive steps back to back; the
    # per-step host fetch is part of the serving design (streaming tokens),
    # so wall-clock includes it — report both wall and RTT-corrected
    eng.step()  # compile
    rtt0 = time.perf_counter()
    float(eng.state.n_gen[0])
    rtt = time.perf_counter() - rtt0

    n_steps = (args.steps - 4) // 2
    t0 = time.perf_counter()
    for _ in range(n_steps):
        eng.step()
    wall = time.perf_counter() - t0
    toks = n_steps * args.slots
    print(json.dumps({
        "mode": "streaming", "decode_steps": n_steps, "slots": args.slots,
        "wall_s": round(wall, 3),
        "tok_s_wall": round(toks / wall, 1),
        "ms_per_step_wall": round(wall / n_steps * 1e3, 2),
        "fetch_rtt_ms": round(rtt * 1e3, 1),
    }), flush=True)

    # chunked decode (run_steps): one dispatch per CHUNK tokens-per-slot
    chunk = 16
    eng.run_steps(chunk)  # compile
    remaining = args.steps - 4 - n_steps - chunk
    n_chunks = max(remaining // chunk, 1)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        eng.run_steps(chunk)
    wall = time.perf_counter() - t0
    toks = n_chunks * chunk * args.slots
    print(json.dumps({
        "mode": "chunked", "chunk": chunk, "n_chunks": n_chunks,
        "slots": args.slots, "wall_s": round(wall, 3),
        "tok_s_wall": round(toks / wall, 1),
        "ms_per_token_step": round(wall / (n_chunks * chunk) * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
