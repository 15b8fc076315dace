"""Mel frontend parity tests.

Oracle: transformers.audio_utils (the exact library the reference calls at
src/aat/tokenizer.py:4,41-51,107-119). The host path must be bit-identical;
the TPU float32 path must be close enough that the epsilon-guarded boundary
detector downstream is unaffected (asserted separately in test_segmentation).
"""

import numpy as np
import pytest

from tests.conftest import make_speechlike_waveform

from aat_tpu.ops import mel as mel_ops

ta = pytest.importorskip("transformers.audio_utils")


def reference_melspec(waveform):
    """Call the same library pipeline the reference uses (not a copy: oracle)."""
    filters = ta.mel_filter_bank(
        num_frequency_bins=1 + 400 // 2,
        num_mel_filters=64,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    )
    window = ta.window_function(400, "hann")
    return ta.spectrogram(
        waveform,
        window,
        frame_length=400,
        hop_length=160,
        power=2.0,
        mel_filters=filters,
        log_mel="log10",
    )


def test_hann_window_matches_transformers():
    ours = mel_ops.hann_window(400)
    theirs = ta.window_function(400, "hann")
    np.testing.assert_array_equal(ours, theirs)


def test_mel_filter_bank_matches_transformers():
    ours = mel_ops.slaney_mel_filter_bank()
    theirs = ta.mel_filter_bank(
        num_frequency_bins=201,
        num_mel_filters=64,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    )
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("n_samples", [16000, 16001, 64000, 5120])
def test_exact_melspec_bit_identical(rng, n_samples):
    waveform = rng.normal(0, 0.3, n_samples)
    ours = mel_ops.log_mel_spectrogram_exact(waveform)
    theirs = reference_melspec(waveform)
    assert ours.shape == theirs.shape == (64, n_samples // 160 + 1)
    np.testing.assert_array_equal(ours, theirs)


def test_exact_melspec_bit_identical_speechlike(rng):
    waveform = make_speechlike_waveform(rng, duration_s=6.0)
    waveform = mel_ops.normalize_waveform(waveform)
    ours = mel_ops.log_mel_spectrogram_exact(waveform)
    theirs = reference_melspec(waveform)
    np.testing.assert_array_equal(ours, theirs)


def test_jax_melspec_close_to_exact(rng):
    waveform = mel_ops.normalize_waveform(make_speechlike_waveform(rng, duration_s=2.0))
    exact = mel_ops.log_mel_spectrogram_exact(waveform)
    device = np.asarray(mel_ops.log_mel_spectrogram(waveform.astype(np.float32)))
    assert device.shape == exact.shape
    # float32 GEMM-DFT noise is largest in near-silent bins (log of tiny
    # power can be off by ~0.2 when the bin is ~60 dB below the loud ones);
    # the raw check is a loose sanity bound, the real contract is the
    # amplitude curve below + end-to-end boundary parity in test_segmentation.
    np.testing.assert_allclose(device, exact, atol=0.5, rtol=0)

    def amplitude_curve(m):
        amp = -10.0 * m.mean(axis=0)
        c = np.cumsum(amp)
        return (c[12:] - c[:-12]) / 12.0

    # ~1e-2 noise comes from log10 of near-silent bins; boundary decisions
    # are validated end-to-end in test_segmentation (device == host spans).
    np.testing.assert_allclose(
        amplitude_curve(device.astype(np.float64)),
        amplitude_curve(exact.astype(np.float64)),
        atol=2e-2,
        rtol=0,
    )


def test_jax_melspec_batched(rng):
    batch = np.stack([
        mel_ops.normalize_waveform(make_speechlike_waveform(rng, duration_s=2.0))
        for _ in range(3)
    ]).astype(np.float32)
    out = mel_ops.log_mel_spectrogram(batch)
    assert out.shape == (3, 64, batch.shape[-1] // 160 + 1)
    single = mel_ops.log_mel_spectrogram(batch[0])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single), atol=1e-5)


def test_pallas_melspec_matches_xla(rng):
    # Short clip: on CPU the kernel runs in (slow) interpret mode.
    waveform = mel_ops.normalize_waveform(make_speechlike_waveform(rng, duration_s=0.6))
    xla = np.asarray(mel_ops.log_mel_spectrogram(waveform.astype(np.float32)))
    fused = np.asarray(
        mel_ops.log_mel_spectrogram(waveform.astype(np.float32), use_pallas=True)
    )
    np.testing.assert_allclose(fused, xla, atol=1e-4, rtol=0)
