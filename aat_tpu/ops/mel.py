"""Mel-spectrogram frontend.

Reference behavior: ``AdaptiveAudioAmplitudeTokenizer.get_melspec``
(/root/reference/src/aat/tokenizer.py:41-51,107-119): hann(400) window,
n_fft=400, hop=160, 64 slaney-norm slaney-scale mel filters over 0..8 kHz,
power-2 spectrogram, log10, float32 output of shape ``[n_mels, T]`` with
``T = len(waveform)//hop + 1`` (center padding, reflect mode).

Two implementations:

- :func:`log_mel_spectrogram_exact` — host numpy, float64 internals, built to
  be *bit-identical* to the reference's ``transformers.audio_utils.spectrogram``
  output (including its quirk of rounding each frame's DFT through complex64
  before the float64 power computation). This anchors the boundary-parity
  north star.
- :func:`log_mel_spectrogram` — TPU path: the DFT is expressed as a strided
  convolution against a windowed cosine/sine basis, i.e. one MXU GEMM per
  utterance, followed by power + mel-projection (second GEMM) + log10 which
  XLA fuses. float32 throughout. A fused Pallas kernel for the post-framing
  pipeline lives in :mod:`aat_tpu.ops.mel_pallas`.

No code is taken from the reference; the spectrogram pipeline is the standard
STFT+mel recipe, re-derived GEMM-first for the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Reference defaults (src/aat/tokenizer.py:19-23).
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 64
SAMPLING_RATE = 16000
FMIN = 0.0
FMAX = 8000.0
MEL_FLOOR = 1e-10


def hann_window(window_length: int, periodic: bool = True) -> np.ndarray:
    """Periodic Hann window, float64, bit-identical to numpy.hanning(M+1)[:-1]
    (the float path numpy uses: 0.5 + 0.5*cos(pi*n/(M-1)), n = 1-M, 3-M, ...)."""
    length = window_length + 1 if periodic else window_length
    n = np.arange(1 - length, length, 2)
    window = 0.5 + 0.5 * np.cos(np.pi * n / (length - 1))
    return window[:window_length]


def _hertz_to_mel_slaney(freq):
    """Slaney-style mel scale (linear below 1 kHz, log above)."""
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    return np.where(
        freq >= min_log_hertz,
        min_log_mel + np.log(np.maximum(freq, 1e-30) / min_log_hertz) * logstep,
        mels,
    )


def _mel_to_hertz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    return np.where(
        mels >= min_log_mel,
        min_log_hertz * np.exp(logstep * (mels - min_log_mel)),
        freq,
    )


def slaney_mel_filter_bank(
    num_frequency_bins: int = N_FFT // 2 + 1,
    num_mel_filters: int = N_MELS,
    min_frequency: float = FMIN,
    max_frequency: float = FMAX,
    sampling_rate: int = SAMPLING_RATE,
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filter bank.

    Returns float64 ``[num_frequency_bins, num_mel_filters]``. Matches the
    filter bank the reference builds at tokenizer init
    (src/aat/tokenizer.py:41-49).
    """
    mel_min = _hertz_to_mel_slaney(min_frequency)
    mel_max = _hertz_to_mel_slaney(max_frequency)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = _mel_to_hertz_slaney(mel_freqs)

    fft_freqs = np.linspace(0, sampling_rate // 2, num_frequency_bins)

    # Triangular filters: rising slope from f[m] to f[m+1], falling to f[m+2].
    filter_diff = np.diff(filter_freqs)
    slopes = filter_freqs[np.newaxis, :] - fft_freqs[:, np.newaxis]
    down_slopes = -slopes[:, :-2] / filter_diff[:-1]
    up_slopes = slopes[:, 2:] / filter_diff[1:]
    filters = np.maximum(np.zeros(1), np.minimum(down_slopes, up_slopes))

    # Slaney area normalization: constant energy per channel.
    enorm = 2.0 / (filter_freqs[2 : num_mel_filters + 2] - filter_freqs[:num_mel_filters])
    filters *= enorm[np.newaxis, :]
    return filters


def num_mel_frames(waveform_length: int, hop_length: int = HOP_LENGTH) -> int:
    """Number of STFT frames for a center-padded signal."""
    return waveform_length // hop_length + 1


# ---------------------------------------------------------------------------
# Host-exact path (float64, bit-identical to the reference pipeline)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _cached_window_and_filters(n_fft: int, n_mels: int, sampling_rate: int, fmax: float):
    window = hann_window(n_fft)
    filters = slaney_mel_filter_bank(
        num_frequency_bins=n_fft // 2 + 1,
        num_mel_filters=n_mels,
        max_frequency=fmax,
        sampling_rate=sampling_rate,
    )
    return window, filters


def log_mel_spectrogram_exact(
    waveform: np.ndarray,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    n_mels: int = N_MELS,
    sampling_rate: int = SAMPLING_RATE,
    fmax: float = FMAX,
) -> np.ndarray:
    """Bit-identical host melspec (float32 ``[n_mels, T]``).

    Replicates the reference pipeline's numerics exactly: float64 rFFT of
    hann-windowed frames, *per-frame rounding through complex64* (the
    reference stores frames into a complex64 buffer), float64 |.|^2, float64
    mel projection with a 1e-10 floor, log10, final cast to float32.
    """
    window, mel_filters = _cached_window_and_filters(n_fft, n_mels, sampling_rate, fmax)

    half = n_fft // 2
    padded = np.pad(np.asarray(waveform), (half, half), mode="reflect").astype(np.float64)
    num_frames = 1 + (padded.size - n_fft) // hop_length

    frames = np.lib.stride_tricks.sliding_window_view(padded, n_fft)[::hop_length][:num_frames]
    spec_c64 = np.fft.rfft(frames * window[np.newaxis, :], n=n_fft, axis=-1).astype(np.complex64)
    power = np.abs(spec_c64.astype(np.complex128)) ** 2.0  # [T, bins] float64

    mel = np.maximum(MEL_FLOOR, np.dot(mel_filters.T, power.T))  # [n_mels, T]
    return np.log10(mel).astype(np.float32)


# ---------------------------------------------------------------------------
# TPU path (float32 GEMM-native DFT)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _dft_mel_constants(n_fft: int, n_mels: int, sampling_rate: int, fmax: float):
    """Windowed DFT basis + mel filters as numpy float32 constants.

    The STFT becomes ``frames @ basis`` with
    ``basis = [window * cos(2πkn/N) | window * -sin(2πkn/N)]`` of shape
    ``[n_fft, 2 * (n_fft//2+1)]`` — pure MXU work.
    """
    bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(bins, dtype=np.float64)
    angle = 2.0 * np.pi * np.outer(n, k) / n_fft
    window = hann_window(n_fft)
    basis = np.concatenate(
        [np.cos(angle) * window[:, None], -np.sin(angle) * window[:, None]], axis=1
    )  # [n_fft, 2*bins]
    mel_filters = slaney_mel_filter_bank(
        num_frequency_bins=bins,
        num_mel_filters=n_mels,
        max_frequency=fmax,
        sampling_rate=sampling_rate,
    )
    return basis.astype(np.float32), mel_filters.astype(np.float32)


def _frames_by_slicing(padded: jnp.ndarray, n_frames: int, n_fft: int, hop: int):
    """Extract overlapping frames from ``[B, P]`` (P multiple of hop) using
    row stacking + slicing only — per-element gathers run ~85M elem/s on
    TPU, while this is memcpy-class. Frame t = padded[t*hop : t*hop+n_fft].
    """
    b, p = padded.shape
    rows = padded.reshape(b, p // hop, hop)
    k = -(-n_fft // hop)  # rows spanned by one frame (ceil)
    r_out = p // hop - (k - 1)
    stacked = jnp.stack([rows[:, i : i + r_out] for i in range(k)], axis=2)
    return stacked.reshape(b, r_out, k * hop)[:, :n_frames, :n_fft]


def frame_waveform(
    waveform: jnp.ndarray, n_fft: int = N_FFT, hop_length: int = HOP_LENGTH
) -> jnp.ndarray:
    """Center-pad (reflect) and frame a ``[..., L]`` waveform to ``[..., T, n_fft]``."""
    half = n_fft // 2
    lead = waveform.shape[:-1]
    length = waveform.shape[-1]
    flat = waveform.reshape((-1, length))
    n_frames = num_mel_frames(length, hop_length)
    p = max(-(-(length + 2 * half) // hop_length),
            n_frames + (-(-n_fft // hop_length))) * hop_length
    padded = jnp.pad(flat, ((0, 0), (half, half)), mode="reflect")
    padded = jnp.pad(padded, ((0, 0), (0, p - padded.shape[-1])))
    frames = _frames_by_slicing(padded, n_frames, n_fft, hop_length)
    return frames.reshape(lead + (n_frames, n_fft))


def frame_waveform_ragged(
    waveforms: jnp.ndarray,
    lengths: jnp.ndarray,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
) -> jnp.ndarray:
    """Frame a padded ``[B, L_max]`` batch with *per-row* reflect centering.

    Matches what the exact path computes for each row's true length: index
    ``i`` outside ``[0, len)`` reflects as ``-i`` / ``2*len - 2 - i``, so the
    frames near each utterance's tail see reflected content rather than the
    batch zero-padding. The left reflection and the framing itself are pure
    slicing; only the per-row tail reflection (``half`` samples per row)
    needs a (tiny) gather + scatter. Frames past a row's valid frame count
    contain stale content and must be masked downstream.
    """
    b, l_max = waveforms.shape
    half = n_fft // 2
    w = waveforms.astype(jnp.float32)
    n_frames = num_mel_frames(l_max, hop_length)

    left = w[:, 1 : half + 1][:, ::-1]  # reflect of the row start (all rows)
    p = max(-(-(l_max + 2 * half) // hop_length),
            n_frames + (-(-n_fft // hop_length))) * hop_length
    padded = jnp.concatenate(
        [left, w, jnp.zeros((b, p - half - l_max), jnp.float32)], axis=1
    )

    # per-row tail reflection: padded[half + len + j] = w[len - 2 - j]
    length = lengths.astype(jnp.int32)
    j = jnp.arange(half, dtype=jnp.int32)
    src_idx = jnp.clip(length[:, None] - 2 - j[None, :], 0, l_max - 1)
    src = jnp.take_along_axis(w, src_idx, axis=1)  # [B, half]
    cols = jnp.minimum(half + length[:, None] + j[None, :], p - 1)
    padded = jax.vmap(lambda row, c, s: row.at[c].set(s))(padded, cols, src)

    return _frames_by_slicing(padded, n_frames, n_fft, hop_length)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "n_mels", "sampling_rate", "fmax", "use_pallas"))
def log_mel_spectrogram(
    waveform: jnp.ndarray,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    n_mels: int = N_MELS,
    sampling_rate: int = SAMPLING_RATE,
    fmax: float = FMAX,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """On-device log-mel spectrogram, float32 ``[..., n_mels, T]``.

    GEMM-native: framing (gather) → ``[T, n_fft] @ [n_fft, 2*bins]`` DFT GEMM
    → power → ``[T, bins] @ [bins, n_mels]`` mel GEMM → log10. Accepts an
    optional leading batch dimension.
    """
    basis_np, mel_np = _dft_mel_constants(n_fft, n_mels, sampling_rate, fmax)
    basis = jnp.asarray(basis_np)
    mel_filters = jnp.asarray(mel_np)
    bins = n_fft // 2 + 1

    frames = frame_waveform(waveform.astype(jnp.float32), n_fft, hop_length)

    logmel = _mel_from_frames(frames, basis, mel_filters, bins, use_pallas)
    return jnp.swapaxes(logmel, -1, -2)  # [..., n_mels, T]


def _mel_from_frames(frames, basis, mel_filters, bins, use_pallas):
    if use_pallas:
        from aat_tpu.ops.mel_pallas import fused_melspec_pallas

        return fused_melspec_pallas(frames, basis, mel_filters)
    # precision=HIGHEST: on TPU the default f32 dot uses bf16 MXU passes
    # (~1e-2 abs error) — too noisy for the epsilon-guarded boundary
    # comparator downstream; full-f32 passes cost ~3x on a kernel that is
    # already >>100x faster than the 100x-realtime target.
    spec = jnp.einsum(
        "...tn,nk->...tk", frames, basis,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )  # [..., T, 2*bins]
    power = spec[..., :bins] ** 2 + spec[..., bins:] ** 2
    mel = jnp.maximum(
        MEL_FLOOR,
        jnp.einsum(
            "...tb,bm->...tm", power, mel_filters,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        ),
    )
    return jnp.log10(mel)


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "n_mels", "sampling_rate", "fmax", "use_pallas"),
)
def log_mel_spectrogram_ragged(
    waveforms: jnp.ndarray,
    lengths: jnp.ndarray,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    n_mels: int = N_MELS,
    sampling_rate: int = SAMPLING_RATE,
    fmax: float = FMAX,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Melspec for a padded ``[B, L_max]`` batch with per-row reflect framing.

    Returns float32 ``[B, n_mels, T_max]``; frames past ``len//hop + 1`` per
    row are garbage and must be masked by the caller.
    """
    basis_np, mel_np = _dft_mel_constants(n_fft, n_mels, sampling_rate, fmax)
    bins = n_fft // 2 + 1
    frames = frame_waveform_ragged(waveforms, lengths, n_fft, hop_length)
    logmel = _mel_from_frames(frames, jnp.asarray(basis_np), jnp.asarray(mel_np), bins, use_pallas)
    return jnp.swapaxes(logmel, -1, -2)


def normalize_waveform(waveform: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """Mean/std normalization used before melspec in the reference collator
    (src/aat/training/collate.py:135-138)."""
    return (waveform - waveform.mean()) / (waveform.std() + eps)


def normalize_waveform_jax(waveform: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    mean = jnp.mean(waveform, axis=-1, keepdims=True)
    std = jnp.std(waveform, axis=-1, keepdims=True)
    return (waveform - mean) / (std + eps)
