"""Adaptive amplitude segmentation: boundary detection + segment post-processing.

Reference behavior (/root/reference/src/aat/tokenizer.py):

- ``find_amplitude_minimas`` (:55-92): amplitude = -10 * melspec.mean(axis=0)
  (float32), running mean over N=12 points via cumsum differences, strict
  local maxima of the smoothed curve under an epsilon comparator
  ``x1 > x2 + 1e-5``, then keep maxima with value > 15.
- ``pretokenize`` (:121-139): minima frame index * hop_length → waveform
  index; append waveform end as the final boundary.
- ``process_segments_boarders`` (:141-183): sequential pass — spans shorter
  than ``min_segment_frames`` are *merged forward* (skipped without advancing
  the previous boundary), spans longer than ``max_segment_frames`` are split
  into max-sized chunks where a nonzero remainder < min shifts the last split
  so the final chunk is exactly min; a trailing remainder is right-padded
  with zeros to min length.
- ``tokenize`` (:185-200): asserts < 300 segments and frame-count
  conservation.

Two implementations, one semantics:

- ``*_exact`` host numpy functions reproduce the reference float32 numerics
  bit-for-bit (including the sequential f32 cumsum whose rounding the
  epsilon comparator can observe).
- :func:`segment_waveforms` is the fixed-shape batched on-device pipeline:
  melspec → amplitude minima mask → boundary compaction → a two-phase
  merge/split that emits a dense ``[B, S_max]`` (start, end, out_len, valid)
  segment table with *no* data-dependent shapes (jit/pjit friendly).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aat_tpu.ops import mel as mel_ops

EPS = 1e-5  # fp32 comparator epsilon (reference :82-83)


@dataclasses.dataclass(frozen=True)
class TokenizerConfig:
    """Mirrors the reference tokenizer constructor (src/aat/tokenizer.py:15-38)."""

    running_mean_points: int = 12
    min_segment_duration_milliseconds: int = 125
    max_segment_duration_milliseconds: int = 1500
    n_fft: int = 400
    hop_length: int = 160
    num_mel_filters: int = 64
    sampling_rate: int = 16000
    max_amplitude_for_minima: float = 15.0
    # Fixed capacities for the on-device pipeline (not in the reference;
    # the reference asserts < 300 segments per utterance).
    max_segments: int = 304
    max_minima: int = 512

    @property
    def min_segment_frames(self) -> int:
        return int(self.min_segment_duration_milliseconds * self.sampling_rate / 1000)

    @property
    def max_segment_frames(self) -> int:
        return int(self.max_segment_duration_milliseconds * self.sampling_rate / 1000)

    @property
    def start_granularity(self) -> int:
        """gcd of hop and the min/max segment frames (40 at defaults).

        Most adaptive starts are multiples of this (minima sit on hop
        boundaries; split offsets on max-frame multiples) — but NOT all: a
        final span ending at the waveform end can trigger the min-shift
        split rule, making its last start ``length - min_frames`` with
        ``length`` arbitrary mod 40. Only uniform segmentation (starts =
        i * max_segment_frames) may use this to enable block row-gathers in
        the dense materialization; adaptive must use the arbitrary-start
        path (ops.ragged.gather_slices)."""
        import math

        return math.gcd(
            math.gcd(self.hop_length, self.min_segment_frames),
            self.max_segment_frames,
        )


# ---------------------------------------------------------------------------
# Host-exact boundary detection (bit-identical float32 numerics)
# ---------------------------------------------------------------------------


def smoothed_amplitude_exact(melspec: np.ndarray, running_mean_points: int = 12) -> np.ndarray:
    """float32 smoothed negative amplitude curve, bit-faithful to the reference.

    The cumsum runs in float32 sequentially (numpy semantics); its rounding is
    observable through the 1e-5 comparator, so this exact float path *is* the
    spec. Routed through the native C++ kernel when built (bitwise-identical,
    tests/test_runtime.py).
    """
    amplitude = np.float32(-10) * melspec.mean(axis=0)  # float32 [T]
    from aat_tpu.runtime import host_ops

    return host_ops.smoothed_amplitude(amplitude, running_mean_points)


def find_amplitude_minima_exact(
    melspec: np.ndarray, config: TokenizerConfig = TokenizerConfig()
) -> np.ndarray:
    """Indices of epsilon-strict local maxima of the smoothed curve with
    value > max_amplitude_for_minima. Matches
    ``scipy.signal.argrelextrema(x, greater_eps)`` + threshold filtering.
    Native C++ path when built."""
    x = smoothed_amplitude_exact(melspec, config.running_mean_points)
    if x.size < 3:
        return np.zeros((0,), dtype=np.int64)
    from aat_tpu.runtime import host_ops

    return host_ops.find_minima(x, EPS, config.max_amplitude_for_minima)


def pretokenize_exact(
    waveform: np.ndarray, melspec: np.ndarray | None = None,
    config: TokenizerConfig = TokenizerConfig(),
) -> Tuple[List[int], np.ndarray]:
    """Waveform-space segment boundaries (minima * hop, then waveform end)."""
    if melspec is None:
        melspec = mel_ops.log_mel_spectrogram_exact(
            waveform, n_fft=config.n_fft, hop_length=config.hop_length,
            n_mels=config.num_mel_filters, sampling_rate=config.sampling_rate,
        )
    minima = find_amplitude_minima_exact(melspec, config)
    boundaries = (minima * config.hop_length).tolist() + [int(waveform.shape[-1])]
    return boundaries, melspec


def split_sizes_for_span(length: int, min_frames: int, max_frames: int) -> List[int]:
    """Chunk lengths for one over-long span, following the reference split
    rule (src/aat/tokenizer.py:161-171): max-sized chunks; a remainder of 0
    drops the empty tail; a remainder < min shifts the last split so the
    final chunk is exactly min."""
    k = length // max_frames
    gap = length - k * max_frames
    if gap == 0:
        return [max_frames] * k
    if gap < min_frames:
        sizes = [max_frames] * (k - 1)
        sizes.append(length - min_frames - (k - 1) * max_frames)
        sizes.append(min_frames)
        return sizes
    return [max_frames] * k + [gap]


def process_boundaries_exact(
    waveform_length: int,
    boundaries: List[int],
    config: TokenizerConfig = TokenizerConfig(),
) -> List[Tuple[int, int, int]]:
    """Merge/split/pad pass → list of (start, end, out_len) segment spans.

    ``out_len >= end - start``; a strictly larger ``out_len`` means the
    segment is right-padded with zeros (only possible for the final segment,
    reference :177-181). Too-short spans are merged *forward* into the next
    span (the reference skips them without advancing ``prev``).
    """
    min_frames, max_frames = config.min_segment_frames, config.max_segment_frames
    spans: List[Tuple[int, int, int]] = []
    prev = 0
    for boundary in boundaries:
        length = boundary - prev
        if length < min_frames:
            continue  # merge forward: prev stays, span absorbed into the next
        if length > max_frames:
            offset = prev
            for size in split_sizes_for_span(length, min_frames, max_frames):
                spans.append((offset, offset + size, size))
                offset += size
        else:
            spans.append((prev, boundary, length))
        prev = boundary

    if prev != waveform_length:
        tail = waveform_length - prev
        spans.append((prev, waveform_length, max(tail, min_frames)))

    return spans


# ---------------------------------------------------------------------------
# On-device batched pipeline (fixed shapes)
# ---------------------------------------------------------------------------


def smoothed_amplitude(melspec: jnp.ndarray, running_mean_points: int = 12) -> jnp.ndarray:
    """Device smoothed curve for ``[..., n_mels, T]`` melspecs → ``[..., T - n]``.

    Uses a direct 12-term windowed mean instead of the reference's f32
    cumsum differences: the cumsum grows to ~1e5 where a float32 ulp is
    ~1e-2, so differencing it injects position-dependent noise; the direct
    sum keeps the curve within ~1e-3 of the exact host values, well inside
    any non-tie margin of the epsilon comparator.
    """
    amplitude = -10.0 * jnp.mean(melspec, axis=-2)
    n = running_mean_points
    t = amplitude.shape[-1]
    # cumsum[N:] - cumsum[:-N] sums amp[i+1 .. i+N]; replicate that window.
    acc = amplitude[..., 1 : t - n + 1]
    for j in range(2, n + 1):
        acc = acc + amplitude[..., j : t - n + j]
    return acc / float(n)


def minima_mask(
    smoothed: jnp.ndarray,
    valid_length: jnp.ndarray,
    max_amplitude: float = 15.0,
) -> jnp.ndarray:
    """Epsilon-strict local-maxima mask over the smoothed curve.

    ``smoothed``: ``[..., Ts]`` (padded); ``valid_length``: ``[...]`` actual
    lengths. Only interior points of each valid region qualify.
    """
    x = smoothed
    ts = x.shape[-1]
    left = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    right = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
    is_max = (x > right + EPS) & (x > left + EPS) & (x > max_amplitude)
    pos = jnp.arange(ts)
    interior = (pos >= 1) & (pos[None, ...] < valid_length[..., None] - 1)
    return is_max & interior


@functools.partial(jax.jit, static_argnames=("config",))
def segment_waveforms(
    waveforms: jnp.ndarray,
    lengths: jnp.ndarray,
    config: TokenizerConfig = TokenizerConfig(),
):
    """Full on-device adaptive segmentation for a padded batch.

    Args:
        waveforms: ``[B, L_max]`` float32 (already normalized).
        lengths: ``[B]`` int32 valid sample counts.

    Returns dict with fixed-shape per-utterance segment tables:
        melspec      [B, n_mels, T_max]
        starts       [B, S_max] int32 segment start sample
        ends         [B, S_max] int32 segment end sample (data end)
        out_lens     [B, S_max] int32 materialized length (>= end-start)
        segment_mask [B, S_max] bool validity
        num_segments [B] int32
    """
    b, l_max = waveforms.shape
    hop = config.hop_length
    n = config.running_mean_points
    s_max = config.max_segments
    k_max = config.max_minima
    min_f, max_f = config.min_segment_frames, config.max_segment_frames

    melspec = mel_ops.log_mel_spectrogram_ragged(
        waveforms, lengths, n_fft=config.n_fft, hop_length=hop,
        n_mels=config.num_mel_filters, sampling_rate=config.sampling_rate,
    )  # [B, n_mels, T_max]

    t_valid = lengths // hop + 1  # frames per utterance
    smoothed = smoothed_amplitude(melspec, n)  # [B, T_max + 1 - n]
    mask = minima_mask(smoothed, t_valid - n, config.max_amplitude_for_minima)

    # Compact minima positions into [B, K_max] boundary slots (ascending).
    ts = mask.shape[-1]
    pos = jnp.broadcast_to(jnp.arange(ts, dtype=jnp.int32)[None, :], mask.shape)
    slot = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1  # target slot per minima
    num_minima = jnp.minimum(jnp.sum(mask, axis=-1), k_max - 1).astype(jnp.int32)
    boundaries = jnp.full((b, k_max), jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    scatter_slot = jnp.where(mask & (slot < k_max - 1), slot, k_max)  # k_max = dropped
    boundaries = jax.vmap(lambda bnd, sl, va: bnd.at[sl].set(va, mode="drop"))(
        boundaries, scatter_slot, pos * hop
    )
    # Final boundary: the waveform end (reference pretokenize :137).
    boundaries = jax.vmap(lambda bnd, i, v: bnd.at[i].set(v))(
        boundaries, num_minima, lengths.astype(jnp.int32)
    )
    n_boundaries = num_minima + 1

    # ---- Phase A: merge-forward via pointer doubling ---------------------
    # Greedy semantics: walking the sorted boundaries, a boundary is kept
    # iff it is the first one at distance >= min_f from the previously kept
    # one (too-short spans merge forward, reference :157-159,175). The walk
    # is the orbit of node 0 under the jump function
    #     next[i] = first j with boundary[j] >= boundary[i] + min_f,
    # which searchsorted computes for all i at once; the orbit is marked in
    # O(log K) doubling rounds instead of a K-step sequential scan (the
    # scan was ~40x slower end-to-end on v5e).
    slot_valid = jnp.arange(k_max)[None, :] < n_boundaries[:, None]
    big = jnp.int32(2**30)
    bvals = jnp.where(slot_valid, boundaries, big)  # sorted ascending per row

    def orbit(row):
        # virtual node k_max = "walk ended"; jumps saturate onto it
        nxt = jnp.searchsorted(row, row + min_f, side="left").astype(jnp.int32)
        nxt = jnp.minimum(nxt, k_max)
        jump = jnp.concatenate([nxt, jnp.array([k_max], jnp.int32)])
        first = jnp.searchsorted(row, jnp.asarray(min_f, row.dtype), side="left")
        mark = jnp.zeros((k_max + 1,), bool).at[jnp.minimum(first, k_max)].set(True)
        rounds = max(int(np.ceil(np.log2(k_max + 1))), 1)
        for _ in range(rounds):
            propagated = jnp.zeros((k_max + 1,), bool).at[jump].max(mark)
            mark = mark | propagated
            jump = jump[jump]
        return mark[:k_max]

    span_keep = jax.vmap(orbit)(bvals) & slot_valid
    span_ends = jnp.where(span_keep, boundaries, 0)
    # each kept span starts at the previous kept boundary (0 for the first)
    prev_kept = jnp.where(span_keep, boundaries, 0)
    prev_kept = jax.lax.associative_scan(jnp.maximum, prev_kept, axis=-1)
    span_starts = jnp.where(
        span_keep, jnp.concatenate(
            [jnp.zeros((b, 1), boundaries.dtype), prev_kept[:, :-1]], axis=1
        ), 0,
    )
    prev_final = jnp.max(prev_kept, axis=-1).astype(jnp.int32)

    # Tail span: right-padded to min_f if anything remains after prev_final.
    has_tail = prev_final != lengths.astype(jnp.int32)
    tail_len = lengths.astype(jnp.int32) - prev_final

    # ---- Phase B: vectorized split of over-long spans -------------------
    span_len = jnp.where(span_keep, span_ends - span_starts, 0)
    # pieces per span, following split_sizes_for_span():
    k = span_len // max_f
    gap = span_len - k * max_f
    n_pieces = jnp.where(
        ~span_keep, 0,
        jnp.where(span_len <= max_f, 1, jnp.where(gap == 0, k, k + 1)),
    )

    # Compact kept spans and their piece counts to the front, then assign
    # each output slot to (span, piece) arithmetically.
    piece_offset = jnp.cumsum(n_pieces, axis=-1) - n_pieces  # start slot per span
    total_pieces = jnp.sum(n_pieces, axis=-1)

    out_slots = jnp.arange(s_max)[None, :]
    # For slot s: find span i with piece_offset[i] <= s < piece_offset[i]+n_pieces[i].
    # searchsorted over cumulative ends:
    cum_end = jnp.cumsum(n_pieces, axis=-1)  # [B, K]
    span_idx = jax.vmap(
        lambda ce: jnp.searchsorted(ce, jnp.arange(s_max), side="right")
    )(cum_end)
    span_idx = jnp.minimum(span_idx, k_max - 1)
    take = jax.vmap(lambda a, i: a[i])
    s_start = take(span_starts, span_idx)
    s_len = take(span_len, span_idx)
    s_k = take(k, span_idx)
    s_gap = take(gap, span_idx)
    s_np = take(n_pieces, span_idx)
    s_off = take(piece_offset, span_idx)
    piece = out_slots - s_off  # piece index j within the span

    # Piece geometry per the reference split rule.
    shifted = (s_gap > 0) & (s_gap < min_f) & (s_len > max_f)
    is_last = piece == s_np - 1
    is_second_last = piece == s_np - 2
    piece_start = s_start + piece * max_f
    piece_start = jnp.where(shifted & is_last, s_start + s_len - min_f, piece_start)
    piece_end = jnp.where(
        is_last, s_start + s_len,
        s_start + (piece + 1) * max_f,
    )
    piece_end = jnp.where(shifted & is_second_last, s_start + s_len - min_f, piece_end)

    in_range = out_slots < total_pieces[:, None]
    starts = jnp.where(in_range, piece_start, 0).astype(jnp.int32)
    ends = jnp.where(in_range, piece_end, 0).astype(jnp.int32)
    seg_mask = in_range

    # Append the tail segment at slot total_pieces when present.
    tail_slot = jnp.minimum(total_pieces, s_max - 1)
    def set_tail(arr, vals):
        return jax.vmap(lambda a, i, v, h: jnp.where(h, a.at[i].set(v), a))(
            arr, tail_slot, vals, has_tail
        )

    starts = set_tail(starts, prev_final)
    ends = set_tail(ends, lengths.astype(jnp.int32))
    seg_mask = set_tail(seg_mask, jnp.ones((b,), bool))
    out_lens = jnp.where(seg_mask, ends - starts, 0)
    out_lens = set_tail(out_lens, jnp.maximum(tail_len, min_f))
    num_segments = total_pieces + has_tail.astype(jnp.int32)

    return {
        "melspec": melspec,
        "starts": starts,
        "ends": ends,
        "out_lens": out_lens,
        "segment_mask": seg_mask,
        "num_segments": num_segments,
    }


@functools.partial(jax.jit, static_argnames=("frames_per_segment", "max_segments"))
def uniform_segment_table(
    lengths: jnp.ndarray, frames_per_segment: int, max_segments: int
):
    """On-device uniform segmentation table (same schema as
    :func:`segment_waveforms` minus the melspec): fixed-size segments with a
    remainder tail (reference collate uniform mode,
    src/aat/training/collate.py:141-149).
    """
    b = lengths.shape[0]
    lengths = lengths.astype(jnp.int32)
    full = lengths // frames_per_segment
    rem = lengths - full * frames_per_segment
    num_segments = full + (rem > 0)

    slots = jnp.arange(max_segments, dtype=jnp.int32)[None, :]
    seg_mask = slots < num_segments[:, None]
    starts = jnp.where(seg_mask, slots * frames_per_segment, 0)
    ends = jnp.minimum(starts + frames_per_segment, lengths[:, None])
    ends = jnp.where(seg_mask, ends, 0)
    out_lens = jnp.where(seg_mask, ends - starts, 0)
    return {
        "starts": starts,
        "ends": ends,
        "out_lens": out_lens,
        "segment_mask": seg_mask,
        "num_segments": num_segments,
    }


def uniform_boundaries(waveform_length: int, frames_per_segment: int) -> np.ndarray:
    """Uniform segmentation cumulative boundaries (reference collate
    src/aat/training/collate.py:141-149)."""
    num_segments = waveform_length // frames_per_segment
    sizes = [frames_per_segment] * num_segments
    if waveform_length % frames_per_segment > 0:
        sizes.append(waveform_length - sum(sizes))
    return np.cumsum(np.array(sizes, dtype=np.int64))
