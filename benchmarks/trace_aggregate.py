"""Aggregate an existing jax.profiler trace dir into per-category/op times.

Shares the category rules (incl. the Pallas custom-call detection) with
trace_train_step.py; use on traces produced by other tools, e.g.
ab_qwen_pack.py --trace.

    python benchmarks/trace_aggregate.py /tmp/aat_trace_qwen_pack8 \
        [--steps 3] [--top 30]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trace_train_step import categorize  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--steps", type=int, default=3,
                    help="steps captured in the trace (durations divide)")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    paths = glob.glob(os.path.join(args.logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {args.logdir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    device_pids = set()
    op_tids = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        name = e.get("args", {}).get("name", "")
        if e.get("name") == "process_name" and ("TPU" in name or "/device" in name):
            device_pids.add(e["pid"])
        if e.get("name") == "thread_name" and name == "XLA Ops":
            op_tids[e["pid"]] = e["tid"]
    by_name = defaultdict(float)
    long_names = {}
    total = 0.0
    for e in events:
        if (e.get("ph") != "X" or e.get("pid") not in device_pids
                or e.get("tid") != op_tids.get(e["pid"])):
            continue
        dur = e.get("dur", 0) / 1e6 / args.steps
        by_name[e["name"]] += dur
        long_names.setdefault(e["name"], e.get("args", {}).get("long_name", ""))
        total += dur

    by_cat = defaultdict(float)
    for name, dur in by_name.items():
        by_cat[categorize(name, long_names[name])] += dur
    print(json.dumps({"device_total_ms_per_step": round(total * 1e3, 2),
                      "trace": path}))
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(json.dumps({"category": cat, "ms": round(dur * 1e3, 2)}))
    print("--- top ops ---")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[: args.top]:
        print(json.dumps({"op": name[:90], "ms": round(dur * 1e3, 3),
                          "long": long_names[name][:140]}))


if __name__ == "__main__":
    main()
