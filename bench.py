"""Benchmark: adaptive audio tokenization throughput on one TPU chip.

Measures the full on-device pipeline — GEMM-native mel spectrogram,
amplitude-minima boundary detection, merge/split segment post-processing,
and dense segment materialization — i.e. BASELINE configs 1+3 fused
(the reference computes these on host CPU via numpy/scipy:
scripts/audio_tokenization_melspec.py, scripts/audio_tokenization.py).

North star (BASELINE.json): >= 100x real-time audio tokenized per chip.
``vs_baseline`` reports multiples of that 100x-real-time target (the
reference publishes no numbers of its own — BASELINE.md).

Prints ONE JSON line.
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def make_speechlike(rng, seconds, sr=16000):
    n = int(seconds * sr)
    t = np.arange(n) / sr
    env = np.zeros(n)
    pos = 0
    while pos < n:
        burst = int(rng.uniform(0.15, 0.6) * sr)
        gap = int(rng.uniform(0.05, 0.3) * sr)
        env[pos : pos + burst] = np.hanning(max(burst, 2))[:burst][: max(n - pos, 0)]
        pos += burst + gap
    w = env * (rng.normal(0, 1, n) * 0.5 + 0.3 * np.sin(2 * np.pi * 220 * t))
    w = w + rng.normal(0, 1e-4, n)
    return (w - w.mean()) / (w.std() + 1e-6)


def main():
    import jax

    from aat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from aat_tpu.ops.segmentation import TokenizerConfig
    from aat_tpu.tokenizer import tokenize_dense

    batch, seconds = 16, 30.0
    sr = 16000
    rng = np.random.default_rng(0)
    waveforms = np.stack(
        [make_speechlike(np.random.default_rng(i), seconds) for i in range(batch)]
    ).astype(np.float32)
    lengths = np.full((batch,), int(seconds * sr), np.int32)
    config = TokenizerConfig(max_segments=128)

    # tokenize_dense runs the per-utterance-parallel pipeline in batch
    # chunks of 8 (lax.map) so the mel-framing / gather intermediates stay
    # VMEM-resident at any batch size — measured faster even at batch 16,
    # and it removes the batch-64 spill cliff (benchmarks/trace_tokenize.py,
    # RESULTS.md round 5).
    def tokenize_fn(waveforms, lengths):
        table, segments, frame_mask = tokenize_dense(waveforms, lengths, config)
        return table["num_segments"], segments, frame_mask

    # Auto output layouts: with the default (descending) layouts XLA ends
    # the program with a relayout copy of the 196 MB segment tensor (~0.7
    # ms/call, device-traced); letting layout assignment pick the output
    # layout removes it. Downstream jits consume whatever layout arrives —
    # boundaries/segment values are identical (pure data movement).
    try:
        from jax.experimental.layout import Format, Layout

        tokenize = jax.jit(tokenize_fn, out_shardings=Format(Layout.AUTO))
    except Exception:  # layout API drift — the default-layout jit is fine
        tokenize = jax.jit(tokenize_fn)

    # warmup / compile. NOTE on methodology: on this remoted TPU backend
    # block_until_ready returns before execution completes, so completion is
    # forced by fetching a scalar that depends on the last iteration's
    # output (launches execute in order), and the fetch round-trip is
    # measured separately and subtracted.
    dev_waveforms = jax.device_put(waveforms)
    dev_lengths = jax.device_put(lengths)
    out = tokenize(dev_waveforms, dev_lengths)
    _ = float(out[0][0])
    t0 = time.perf_counter()
    _ = float(out[0][0])
    rtt = time.perf_counter() - t0

    # best-of-3: the remote tunnel occasionally stalls for seconds; a single
    # stall would otherwise poison the measurement
    iters = 50
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = tokenize(dev_waveforms, dev_lengths)
        _ = float(out[0][0])  # force completion of the whole launch queue
        dt = min(dt, (time.perf_counter() - t0 - rtt) / iters)

    audio_seconds = batch * seconds
    throughput = audio_seconds / dt  # audio-sec tokenized per wall-sec per chip
    target = 100.0  # north-star: 100x real-time per chip
    # token compression: raw encoder frames (~50 Hz) vs adaptive segment tokens
    n_segments = int(np.sum(np.asarray(out[0])))
    tokens_per_sec = n_segments / audio_seconds
    compression = 50.0 / max(tokens_per_sec, 1e-9)
    print(json.dumps({
        "metric": "audio_sec_tokenized_per_sec_per_chip",
        "value": round(throughput, 1),
        "unit": "audio_s/s",
        "vs_baseline": round(throughput / target, 2),
        "segment_tokens_per_audio_sec": round(tokens_per_sec, 2),
        "frame_to_token_compression": round(compression, 1),
    }))


if __name__ == "__main__":
    main()
