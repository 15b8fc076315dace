"""Ragged segment ops: dense materialization, masked pooling, scatter-merge.

The reference builds ``[bs, segments, max_segment_waveform_frames]`` dense
segment tensors plus masks in a Python double loop inside the collator
(/root/reference/src/aat/training/collate.py:317-346) — its profiled hot
spot. Here the same layout is produced by a single on-device gather, and
frame→segment reductions (the ``mean_hubert_embeddings.py:19-21`` mean
pooling) are masked segment-sum kernels, so ragged merges never leave the
device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def windowed_gather(
    x: jnp.ndarray, starts: jnp.ndarray, length: int, block: int
) -> jnp.ndarray:
    """Gather fixed-length contiguous windows whose starts are multiples of
    ``block``: ``x [B, L]``, ``starts [B, S]`` → ``[B, S, length]``.

    A scalar gather of B*S*length elements is element-wise on TPU (measured
    ~85M elem/s on v5e); regrouping into [L/block, block] rows turns it into
    a row gather with `block`-wide contiguous reads — ~block× fewer indices.
    """
    b, l = x.shape
    s = starts.shape[1]
    assert length % block == 0 and l % block == 0
    rows = x.reshape(b * (l // block), block)
    n_rows = length // block
    row_idx = starts[..., None] // block + jnp.arange(n_rows)[None, None, :]
    row_idx = jnp.clip(row_idx, 0, l // block - 1)  # [B, S, n_rows]
    global_idx = (
        jnp.arange(b, dtype=row_idx.dtype)[:, None, None] * (l // block) + row_idx
    ).reshape(-1)
    # jnp.take over rows → one gather with slice_sizes (1, block)
    gathered = jnp.take(rows, global_idx, axis=0, mode="clip")
    return gathered.reshape(b, s, length)


@functools.partial(jax.jit, static_argnames=("max_frames", "start_granularity"))
def materialize_segments(
    waveforms: jnp.ndarray,
    starts: jnp.ndarray,
    ends: jnp.ndarray,
    out_lens: jnp.ndarray,
    segment_mask: jnp.ndarray,
    max_frames: int,
    start_granularity: int = 1,
):
    """Gather per-segment waveform windows into a dense batch.

    Args:
        waveforms: ``[B, L]`` float32 source waveforms (zero-padded).
        starts/ends: ``[B, S]`` int32 data spans (``end - start`` samples of
            real data).
        out_lens: ``[B, S]`` int32 materialized lengths (``>= end - start``;
            the excess is zero padding, reference tokenize :177-181).
        segment_mask: ``[B, S]`` bool segment validity.
        max_frames: static per-segment capacity (reference
            ``max_segment_waveform_frames``).

    Returns:
        segments: ``[B, S, max_frames]`` float32
        frame_mask: ``[B, S, max_frames]`` bool — True for the ``out_lens``
            prefix of valid segments (zero-padded tail counts as data, like
            the reference's explicit zero padding).

    Implementation notes: per-element TPU gathers run at ~85M elem/s, far
    too slow for ~50M-element materializations; segment starts are always
    multiples of ``gcd(hop, min/max segment frames)`` (40 for the reference
    defaults — minima sit on hop=160 boundaries, split offsets on
    max-frame multiples, min-shifts on min-frame multiples), so the windows
    are fetched as ``start_granularity``-wide row gathers instead
    (:func:`windowed_gather`). A DMA-per-segment Pallas kernel was tried
    and rejected: Mosaic cannot slice HBM memrefs at arbitrary sample
    offsets.
    """
    b, l = waveforms.shape
    _, s = starts.shape
    f = jnp.arange(max_frames, dtype=jnp.int32)
    in_data = (f[None, None, :] < (ends - starts)[..., None]) & segment_mask[..., None]
    block = start_granularity
    if block > 1 and max_frames % block == 0 and l % block == 0:
        gathered = windowed_gather(waveforms, starts, max_frames, block)
    else:
        idx = jnp.clip(starts[..., None] + f[None, None, :], 0, l - 1)
        gathered = jnp.take_along_axis(
            waveforms[:, None, :], idx.reshape(b, 1, -1), axis=-1
        ).reshape(b, s, max_frames)
    segments = jnp.where(in_data, gathered, 0.0)
    frame_mask = (f[None, None, :] < out_lens[..., None]) & segment_mask[..., None]
    return segments, frame_mask


@jax.jit
def masked_mean(embeddings: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over the time axis: ``[..., T, E], [..., T] → [..., E]``.

    Parity target: per-segment mean of HuBERT frame embeddings
    (/root/reference/scripts/mean_hubert_embeddings.py:19-21).
    """
    m = mask.astype(embeddings.dtype)[..., None]
    total = jnp.sum(embeddings * m, axis=-2)
    count = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    return total / count


@jax.jit
def masked_segment_sum(
    frame_values: jnp.ndarray, segment_ids: jnp.ndarray, num_segments_cap: int
) -> jnp.ndarray:
    """Scatter-add frames into segments: ``[T, E]`` + ``[T]`` ids → ``[S, E]``.

    Frames with ``segment_ids >= num_segments_cap`` (or negative) are dropped.
    Useful when segments are described by a frame→segment id map instead of
    dense spans.
    """
    return jax.ops.segment_sum(
        frame_values, segment_ids, num_segments=num_segments_cap
    )


def frames_per_segment(
    starts: jnp.ndarray, ends: jnp.ndarray, hop_length: int
) -> jnp.ndarray:
    """Melspec frame spans for waveform-sample spans (reference collate
    :340 uses ``boarder // hop_length``)."""
    return starts // hop_length, ends // hop_length
