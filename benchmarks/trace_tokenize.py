"""Device-trace the headline tokenize pipeline at several batch sizes and
aggregate per-HLO-op time — root-causing the sublinear batch scaling
(VERDICT r3 item 4: batch 32/64 measured SLOWER per audio-second than 16).

    python benchmarks/trace_tokenize.py [--batches 16 32 64] [--top 25]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from aat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def aggregate(logdir, n_traced):
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {logdir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        events = json.load(f)["traceEvents"]
    device_pids, op_tids = set(), {}
    for e in events:
        if e.get("ph") != "M":
            continue
        name = e.get("args", {}).get("name", "")
        if e.get("name") == "process_name" and ("TPU" in name or "/device" in name):
            device_pids.add(e["pid"])
        if e.get("name") == "thread_name" and name == "XLA Ops":
            op_tids[e["pid"]] = e["tid"]
    by_name, long_names, total = defaultdict(float), {}, 0.0
    for e in events:
        if (e.get("ph") != "X" or e.get("pid") not in device_pids
                or e.get("tid") != op_tids.get(e["pid"])):
            continue
        dur = e.get("dur", 0) / 1e6 / n_traced
        by_name[e["name"]] += dur
        long_names.setdefault(e["name"], e.get("args", {}).get("long_name", ""))
        total += dur
    return by_name, long_names, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 32, 64])
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as bench_mod
    from aat_tpu.ops.segmentation import TokenizerConfig
    from aat_tpu.tokenizer import tokenize_dense

    config = TokenizerConfig(max_segments=128)

    def tokenize_fn(waveforms, lengths):
        table, segments, frame_mask = tokenize_dense(waveforms, lengths, config)
        return table["num_segments"], segments, frame_mask

    for batch in args.batches:
        rng = np.random.default_rng(0)
        waveforms = np.stack([
            bench_mod.make_speechlike(np.random.default_rng(i), args.seconds)
            for i in range(batch)
        ]).astype(np.float32)
        lengths = np.full((batch,), int(args.seconds * 16000), np.int32)
        try:
            from jax.experimental.layout import Format, Layout

            tokenize = jax.jit(tokenize_fn, out_shardings=Format(Layout.AUTO))
        except Exception:
            tokenize = jax.jit(tokenize_fn)
        wv, ln = jax.device_put(waveforms), jax.device_put(lengths)
        out = tokenize(wv, ln)
        _ = float(out[0][0])
        t0 = time.perf_counter()
        _ = float(out[0][0])
        rtt = time.perf_counter() - t0
        iters = 20
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = tokenize(wv, ln)
            _ = float(out[0][0])
            dt = min(dt, (time.perf_counter() - t0 - rtt) / iters)
        logdir = f"/tmp/aat_trace_tok_{batch}"
        n_traced = 5
        jax.profiler.start_trace(logdir)
        for _ in range(n_traced):
            out = tokenize(wv, ln)
        _ = float(out[0][0])
        jax.profiler.stop_trace()
        by_name, long_names, total = aggregate(logdir, n_traced)
        print(json.dumps({
            "batch": batch,
            "wall_ms": round(dt * 1e3, 3),
            "audio_s_per_s": round(batch * args.seconds / dt, 1),
            "device_total_ms": round(total * 1e3, 3),
        }), flush=True)
        for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[: args.top]:
            print(json.dumps({
                "op": name[:90], "ms": round(dur * 1e3, 3),
                "long": long_names[name][:140],
            }), flush=True)
        print("---", flush=True)


if __name__ == "__main__":
    main()
