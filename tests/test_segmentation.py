"""Segmentation parity and invariant tests.

Minima oracle: scipy.signal.argrelextrema with the same epsilon comparator
the reference uses (src/aat/tokenizer.py:82-90). Post-processing is checked
against the documented merge/split/pad contract and conservation invariants
(src/aat/tokenizer.py:141-196), and the device pipeline is checked against
the host-exact path end-to-end.
"""

import numpy as np
import pytest
from scipy.signal import argrelextrema

from tests.conftest import make_speechlike_waveform

from aat_tpu.audio import AudioWaveform
from aat_tpu.ops import mel as mel_ops
from aat_tpu.ops import segmentation as seg_ops
from aat_tpu.ops.segmentation import TokenizerConfig
from aat_tpu.tokenizer import AdaptiveAudioTokenizer

CFG = TokenizerConfig()


def scipy_minima_oracle(melspec, config=CFG):
    """The reference's minima recipe via the same scipy call it makes."""
    amp = np.float32(-10) * melspec.mean(axis=0)
    cumsum = np.cumsum(amp)
    n = config.running_mean_points
    x = (cumsum[n:] - cumsum[:-n]) / float(n)

    def greater_eps(x1, x2):
        return x1 > x2 + 1e-5

    minima = argrelextrema(x, greater_eps)[0]
    return minima[x[minima] > config.max_amplitude_for_minima]


# ---------------------------------------------------------------------------
# Host-exact path
# ---------------------------------------------------------------------------


def test_minima_match_scipy_oracle(rng):
    for seed in range(5):
        r = np.random.default_rng(seed)
        waveform = mel_ops.normalize_waveform(make_speechlike_waveform(r, duration_s=5.0))
        melspec = mel_ops.log_mel_spectrogram_exact(waveform)
        ours = seg_ops.find_amplitude_minima_exact(melspec)
        oracle = scipy_minima_oracle(melspec)
        np.testing.assert_array_equal(ours, oracle)


def test_silence_has_single_boundary():
    # Reference contract (src/aat/tokenizer_test.py:18-23): pure silence has
    # no amplitude minima; the only boundary is the waveform end.
    waveform = np.zeros(2 * 16000)
    boundaries, melspec = seg_ops.pretokenize_exact(waveform)
    assert boundaries == [waveform.shape[-1]]
    assert melspec.shape == (64, 2 * 16000 // 160 + 1)


def test_silence_tokenization_splits_to_max_segments():
    # 4 s of silence: one span of 64000 frames > max (24000) splits into
    # max-size chunks with the remainder handling; frames are conserved.
    tok = AdaptiveAudioTokenizer()
    waveform = np.zeros(4 * 16000)
    segments, _ = tok.tokenize(AudioWaveform(waveform, 16000))
    lens = [s.waveform.shape[-1] for s in segments]
    assert sum(lens) == waveform.shape[-1]
    assert all(CFG.min_segment_frames <= l <= CFG.max_segment_frames for l in lens)


def test_speechlike_tokenize_invariants(rng):
    tok = AdaptiveAudioTokenizer()
    waveform = mel_ops.normalize_waveform(make_speechlike_waveform(rng, duration_s=8.0))
    segments, melspec = tok.tokenize(AudioWaveform(waveform, 16000))
    lens = [s.waveform.shape[-1] for s in segments]
    assert len(segments) > 1, "speechlike input should produce multiple segments"
    assert len(set(lens)) > 1, "adaptive segments should vary in length"
    assert sum(lens) >= waveform.shape[-1]  # conservation (reference :195-196)
    assert all(l >= CFG.min_segment_frames for l in lens)
    assert all(l <= CFG.max_segment_frames for l in lens)


def test_split_sizes_rules():
    min_f, max_f = 2000, 24000
    # exact multiple: no empty tail
    assert seg_ops.split_sizes_for_span(48000, min_f, max_f) == [24000, 24000]
    # remainder >= min: plain tail
    assert seg_ops.split_sizes_for_span(50000, min_f, max_f) == [24000, 24000, 2000]
    # remainder < min: shift last split so the final chunk is exactly min
    sizes = seg_ops.split_sizes_for_span(49000, min_f, max_f)
    assert sizes == [24000, 23000, 2000]
    assert sum(sizes) == 49000
    # single over-long span smaller than max+min
    sizes = seg_ops.split_sizes_for_span(25000, min_f, max_f)
    assert sizes == [23000, 2000]


def test_merge_forward_semantics():
    # A too-short span is absorbed into the *following* segment: the span
    # [0, 1000) is below min (2000), so the first emitted segment starts at 0
    # and ends at the next boundary.
    spans = seg_ops.process_boundaries_exact(20000, [1000, 8000, 20000])
    assert spans[0] == (0, 8000, 8000)
    assert spans[1] == (8000, 20000, 12000)


def test_trailing_pad_to_min():
    # Final boundary span below min: merged forward fails (no later boundary),
    # so the tail is right-padded with zeros to min length.
    spans = seg_ops.process_boundaries_exact(9000, [8000, 9000])
    assert spans[0] == (0, 8000, 8000)
    assert spans[1] == (8000, 9000, 2000)  # out_len padded to min


# ---------------------------------------------------------------------------
# Device pipeline vs host-exact
# ---------------------------------------------------------------------------


def _host_table(waveform, config=CFG):
    spans, _ = AdaptiveAudioTokenizer(config).segment_spans(waveform)
    return spans


def test_device_pipeline_matches_host(rng):
    durations = [3.0, 5.0, 7.5]
    waveforms = [
        mel_ops.normalize_waveform(make_speechlike_waveform(np.random.default_rng(i), d))
        for i, d in enumerate(durations)
    ]
    lengths = np.array([w.shape[-1] for w in waveforms], dtype=np.int32)
    l_max = lengths.max()
    batch = np.zeros((len(waveforms), l_max), dtype=np.float32)
    for i, w in enumerate(waveforms):
        batch[i, : w.shape[-1]] = w

    out = seg_ops.segment_waveforms(batch, lengths, CFG)

    mismatched_utts = 0
    for i, w in enumerate(waveforms):
        host_spans = _host_table(w)
        n = int(out["num_segments"][i])
        device_spans = [
            (int(out["starts"][i, j]), int(out["ends"][i, j]), int(out["out_lens"][i, j]))
            for j in range(n)
        ]
        if device_spans != host_spans:
            mismatched_utts += 1
    # f32-on-device vs exact-host boundary decisions may differ only at
    # sub-epsilon ties; on synthetic speech there should be none.
    assert mismatched_utts == 0


def test_device_pipeline_conservation(rng):
    w = mel_ops.normalize_waveform(make_speechlike_waveform(rng, 6.0)).astype(np.float32)
    batch = w[None, :]
    lengths = np.array([w.shape[-1]], dtype=np.int32)
    out = seg_ops.segment_waveforms(batch, lengths, CFG)
    n = int(out["num_segments"][0])
    assert 0 < n < 300
    total = int(np.sum(np.asarray(out["out_lens"][0, :n])))
    assert total >= w.shape[-1]
    starts = np.asarray(out["starts"][0, :n])
    ends = np.asarray(out["ends"][0, :n])
    assert (starts[1:] == ends[:-1]).all(), "segments must tile contiguously"
    assert starts[0] == 0 and ends[-1] == w.shape[-1]


@pytest.mark.parametrize("min_ms,max_ms", [(125, 1500), (500, 250), (250, 1000)])
def test_device_matches_host_across_configs(min_ms, max_ms):
    """Property sweep: device pipeline == host-exact under different
    min/max segment configs (incl. the reference's odd adaptive-training
    combo where min > max, trainer_train.py:119-122)."""
    config = TokenizerConfig(
        min_segment_duration_milliseconds=min_ms,
        max_segment_duration_milliseconds=max_ms,
        max_segments=128,
    )
    tok = AdaptiveAudioTokenizer(config)
    for seed in range(3):
        w = mel_ops.normalize_waveform(
            make_speechlike_waveform(np.random.default_rng(seed), 3.0 + seed)
        )
        host = tok.segment_spans(w)[0]
        out = seg_ops.segment_waveforms(
            w[None].astype(np.float32), np.array([w.size], np.int32), config
        )
        n = int(out["num_segments"][0])
        dev = [
            (int(out["starts"][0, j]), int(out["ends"][0, j]), int(out["out_lens"][0, j]))
            for j in range(n)
        ]
        assert dev == host, (min_ms, max_ms, seed)


def test_uniform_segment_table_matches_host():
    lengths = np.array([10500, 8000, 3000], np.int32)
    table = seg_ops.uniform_segment_table(lengths, 4000, max_segments=8)
    for i, l in enumerate(lengths):
        host = seg_ops.uniform_boundaries(int(l), 4000)
        n = int(table["num_segments"][i])
        assert n == len(host)
        np.testing.assert_array_equal(np.asarray(table["ends"][i, :n]), host)
        starts = np.asarray(table["starts"][i, :n])
        np.testing.assert_array_equal(starts, np.insert(host[:-1], 0, 0))


def test_uniform_boundaries():
    b = seg_ops.uniform_boundaries(10500, 4000)
    np.testing.assert_array_equal(b, [4000, 8000, 10500])
    b = seg_ops.uniform_boundaries(8000, 4000)
    np.testing.assert_array_equal(b, [4000, 8000])


def test_device_smoothing_tie_margins_quantified():
    """Quantify when the device's re-associated f32 smoothing sum can flip a
    boundary decision vs the host-exact sequential cumsum.

    Speech-like audio must flip ZERO comparator decisions. Pathological
    signals (perfectly periodic AM bursts, near-silence) contain genuine
    sub-epsilon ties — there, flips are permitted but ONLY at decisions
    whose host margin is inside the measured numeric divergence; a flip at
    a well-separated decision would be a real bug, not a tie."""
    import jax.numpy as jnp

    eps = 1e-5  # the reference's greater-than-epsilon comparator
    rng_master = np.random.default_rng(123)
    max_dev = 0.0
    speech_flips = 0
    tie_flips = 0
    for i in range(24):
        kind = i % 4
        r = np.random.default_rng(1000 + i)
        if kind == 0:
            w = make_speechlike_waveform(r, 2.0 + 3.0 * rng_master.random())
        elif kind == 1:
            w = r.normal(0, 0.3, int(16000 * 3)).astype(np.float32)
        elif kind == 2:  # AM bursts: long flat envelopes -> genuine ties
            t = np.arange(int(16000 * 4)) / 16000
            w = (np.sin(2 * np.pi * 220 * t)
                 * (0.5 + 0.5 * np.sign(np.sin(2 * np.pi * 1.3 * t)))).astype(np.float32)
        else:  # near-silence with tiny noise floor
            w = (r.normal(0, 1e-3, int(16000 * 2.5))).astype(np.float32)
        w = mel_ops.normalize_waveform(w).astype(np.float32)
        mels = mel_ops.log_mel_spectrogram_exact(w)
        x_host = seg_ops.smoothed_amplitude_exact(mels)
        x_dev = np.asarray(seg_ops.smoothed_amplitude(jnp.asarray(mels)))
        n = min(len(x_host), len(x_dev))
        x_host, x_dev = x_host[:n], x_dev[:n]
        dev = float(np.abs(x_host - x_dev).max())
        max_dev = max(max_dev, dev)
        for shift in (1, -1):
            a_h = x_host[1:-1] > np.roll(x_host, shift)[1:-1] + eps
            a_d = x_dev[1:-1] > np.roll(x_dev, shift)[1:-1] + eps
            flipped = a_h != a_d
            margin = np.abs(x_host[1:-1] - np.roll(x_host, shift)[1:-1] - eps)
            if kind == 0:
                speech_flips += int(flipped.sum())
            else:
                tie_flips += int(flipped.sum())
                # every flip must sit at a genuine near-tie: the decision
                # margin is within 4x the measured device divergence
                bad = flipped & (margin > 4 * max(dev, 1e-12))
                assert not bad.any(), (
                    f"kind={kind}: flip at margin "
                    f"{margin[bad].min():.3e} >> divergence {dev:.3e}"
                )
    assert speech_flips == 0, (
        f"{speech_flips} comparator flips on speech-like audio "
        f"(max divergence {max_dev:.3e})"
    )
    # the divergence bound the docstring of smoothed_amplitude claims
    assert max_dev < 1e-3, max_dev
