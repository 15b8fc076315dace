"""Parity harness: device pipeline vs host-exact reference numerics.

Covers BASELINE configs 1-3 end to end on synthetic (or provided) audio:
  1. mel spectrogram      — device f32 vs bit-exact host float64 path
  2. segment boundaries   — device table vs host-exact spans (bit-identical)
  3. segment embeddings   — bf16 vs f32 HuBERT segment means (MSE)

Usage:
    python scripts/parity_check.py [--clips 8] [--seconds 6] [--encoder-check]
Exit code 0 iff every boundary matches and MSE is under threshold.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    return w + rng.normal(0, 1e-4, n)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--clips", type=int, default=8)
    parser.add_argument("--seconds", type=float, default=6.0)
    parser.add_argument("--mse-threshold", type=float, default=1e-3)
    parser.add_argument("--encoder-check", action="store_true",
                        help="also compare bf16 vs f32 HuBERT segment means")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from aat_tpu.ops.mel import log_mel_spectrogram_exact, normalize_waveform
    from aat_tpu.tokenizer import AdaptiveAudioTokenizer
    from aat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    tok = AdaptiveAudioTokenizer()
    failures = 0

    for i in range(args.clips):
        w = normalize_waveform(
            make_speechlike(np.random.default_rng(i), args.seconds + i % 3)
        )
        # config 1: melspec (device f32 vs bit-exact host)
        exact = log_mel_spectrogram_exact(w)
        out = tok.tokenize_batch(
            w[None].astype(np.float32), np.array([w.size], np.int32)
        )
        t_valid = w.size // 160 + 1
        device_mel = np.asarray(out["melspec"])[0, :, :t_valid]
        mel_max_err = float(np.abs(device_mel - exact).max())

        # config 3: boundaries (must be bit-identical)
        host_spans = tok.segment_spans(w)[0]
        n = int(out["num_segments"][0])
        device_spans = [
            (int(out["starts"][0, j]), int(out["ends"][0, j]), int(out["out_lens"][0, j]))
            for j in range(n)
        ]
        boundaries_ok = device_spans == host_spans
        failures += not boundaries_ok
        print(f"clip {i}: boundaries {'OK' if boundaries_ok else 'MISMATCH'} "
              f"({n} segments), mel max |err| {mel_max_err:.2e}")

    if args.encoder_check:
        from aat_tpu.models import hubert as hub
        from aat_tpu.ops.ragged import masked_mean

        cfg = hub.hubert_large_config()
        params = jax.device_put(hub.init_hubert_params(0, cfg))
        params_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        rng = np.random.default_rng(0)
        seg = rng.normal(0, 0.5, (8, 4000)).astype(np.float32)
        mask = np.ones((8, 4000), np.int32)

        import functools

        @functools.partial(jax.jit, static_argnames=("dtype",))
        def means(p, w, m, dtype):
            frames, fm = hub.hubert_encode(p, cfg, w.astype(dtype), m)
            return masked_mean(frames.astype(jnp.float32), fm)

        m32 = np.asarray(means(params, jnp.asarray(seg), jnp.asarray(mask), dtype=jnp.float32))
        m16 = np.asarray(means(params_bf16, jnp.asarray(seg), jnp.asarray(mask), dtype=jnp.bfloat16))
        rel_mse = float(np.mean((m32 - m16) ** 2) / np.mean(m32 ** 2))
        ok = rel_mse < args.mse_threshold
        failures += not ok
        print(f"encoder bf16-vs-f32 segment-mean relative MSE: {rel_mse:.2e} "
              f"({'OK' if ok else 'FAIL'} @ {args.mse_threshold})")

    print("PARITY:", "PASS" if failures == 0 else f"FAIL ({failures})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
