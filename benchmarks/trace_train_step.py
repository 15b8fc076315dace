"""Device-trace the flagship train step and aggregate per-HLO-op time.

jax.profiler device traces WORK on this remoted TPU (per-HLO-op durations
land in trace.json.gz; pid/tid discovered by scanning for the TPU device
process). This is how the r3 dropout/guard overheads were found.

    python benchmarks/trace_train_step.py [--quick] [--top 30]
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from aat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


CATEGORIES = [
    ("attention(pallas)", re.compile(r"custom-call|tpu_custom_call")),
    # 'convolution', not 'conv': bare 'conv' swallows convert/bitcast-convert
    # dtype casts — the exact overhead class this tool exists to expose
    ("conv", re.compile(r"convolution")),
    ("matmul/dot", re.compile(r"dot|gemm|einsum")),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast")),
    ("reduce", re.compile(r"reduce")),
    ("fusion(other)", re.compile(r"fusion")),
]

_SHAPE = re.compile(r"=\s*\(?\s*(?:bf16|f32|f16|s32|u32|s8|u8|pred)\[([0-9,]*)\]")


def _out_elems(long_name: str) -> int:
    """Element count of the op's (first) output — classifies tiny-kernel
    overhead (per-leaf bias updates etc.) separately from real compute."""
    m = _SHAPE.search(long_name)
    if not m:
        return 1 << 30
    dims = [int(x) for x in m.group(1).split(",") if x]
    n = 1
    for d in dims:
        n *= d
    return n


_IS_CUSTOM_CALL = re.compile(r"\)?\s*custom-call\(")


def categorize(name: str, long_name: str = "") -> str:
    # Pallas kernels lower to custom-call HLOs but the OP name carries the
    # autodiff context (e.g. "transpose_jvp___.98" for a backward-kernel
    # call), so detect the HLO opcode from the long name's "= ... custom-
    # call(" form first — name-matching "custom-call" finds nothing and
    # "transpose" would mis-bin the kernels as copies (both happened).
    if _IS_CUSTOM_CALL.search(long_name):
        return "attention(pallas)/custom-call"
    low = name.lower()
    for label, pat in CATEGORIES:
        if pat.search(low):
            if label == "fusion(other)" and _out_elems(long_name) <= 8192:
                return "small-op(<=8K elems)"
            return label
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--whole", action="store_true",
                    help="trace the whole-utterance step (T≈1500, remat + "
                         "pallas flash) instead of the segmented flagship")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--bs", type=int, default=0,
                    help="override batch size (0 = the mode's default)")
    ap.add_argument("--logdir", default="/tmp/aat_trace_step")
    args = ap.parse_args()

    import dataclasses

    import jax

    from aat_tpu.models import hubert as hub
    from aat_tpu.models import llama as llm
    from aat_tpu.models.aslm import AslmConfig, AslmModel
    from aat_tpu.training.config import TrainingConfig
    from aat_tpu.training.trainer import AATTrainerSegmentation

    audio_cfg = hub.hubert_large_config()
    if args.whole:
        # no-remat = the fastest measured whole-utterance mode (remat is a
        # batch-size lever at these shapes, perf_suite train_whole_utterance)
        audio_cfg = dataclasses.replace(
            audio_cfg, attention_impl="pallas", remat=False,
            hidden_dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, layerdrop=0.0)
    lm_cfg = llm.smollm_135m_config()  # pallas at whole-utterance lengths
    config = AslmConfig(
        projection_type="linear",
        audio_encoder_hidden=audio_cfg.hidden_size,
        lm_hidden=lm_cfg.hidden_size,
    )
    model = AslmModel(config, audio_cfg, lm_cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    tcfg = TrainingConfig(
        learning_rate=1e-4, warmup_steps=10, max_steps=1000,
        gradient_accumulation_steps=1,
        train_audio_encoder=True, train_lm_decoder=False,
        compute_dtype="bfloat16",
        logging_steps=10**9, eval_steps=0, save_steps=0,
        output_dir="/tmp/aat_trace_train",
    )
    trainer = AATTrainerSegmentation(model, params, tcfg)
    rng = np.random.default_rng(0)
    if args.whole:
        bs, seconds, text_len = (1, 15.0, 16) if args.quick else (2, 30.0, 32)
        bs = args.bs or bs
        batch = trainer._shard_batch({
            "waveforms": rng.normal(
                0, 0.3, (bs, int(seconds * 16000))).astype(np.float32),
            "waveforms_attention_mask": np.ones(
                (bs, int(seconds * 16000)), np.int32),
            "input_ids": rng.integers(1, lm_cfg.vocab_size, (bs, text_len)),
            "attention_mask": np.ones((bs, text_len), np.int32),
            "input_ids_attention_mask": np.ones((bs, text_len), np.int32),
        })
    else:
        bs, n_seg, frames, text_len = (4, 8, 4000, 32) if args.quick else (8, 16, 4000, 48)
        bs = args.bs or bs
        batch = trainer._shard_batch({
            "batched_segments": rng.normal(0, 0.3, (bs, n_seg, frames)).astype(np.float32),
            "segments_waveforms_mask": np.ones((bs, n_seg, frames), np.float32),
            "segments_boarders_attention_mask": np.ones((bs, n_seg), np.int32),
            "input_ids": rng.integers(1, lm_cfg.vocab_size, (bs, text_len)),
            "attention_mask": np.ones((bs, text_len), np.int32),
            "input_ids_attention_mask": np.ones((bs, text_len), np.int32),
        })
    trainer.training_step([batch])
    trainer.training_step([batch])
    trainer.training_step([batch], fetch_metrics=True)  # steady state

    n_traced = 3
    jax.profiler.start_trace(args.logdir)
    for i in range(n_traced):
        trainer.training_step([batch], fetch_metrics=(i == n_traced - 1))
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(args.logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {args.logdir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # find the TPU device pid and its "XLA Ops" thread — other lanes
    # ("Steps", "XLA Modules") carry per-step envelope events that would
    # double-count every HLO op underneath them
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
        dur = e.get("dur", 0) / 1e6 / n_traced  # us -> s, per step
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
        print(json.dumps({"op": name[:110], "ms": round(dur * 1e3, 3)}))


if __name__ == "__main__":
    main()
