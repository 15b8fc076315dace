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

    PRECONDITION: every start must be a multiple of ``block`` — the caller
    must guarantee this *by construction* (e.g. uniform segmentation, whose
    starts are multiples of max_segment_frames). A misaligned start is
    silently floor-rounded to the block boundary. For arbitrary starts use
    :func:`gather_slices`.

    A scalar gather of B*S*length elements is element-wise on TPU (measured
    ~0.14G elem/s on v5e); regrouping into [L/block, block] rows turns it
    into a row gather with `block`-wide contiguous reads.

    The gather runs over small BATCH CHUNKS (lax.map, 2 waveforms/chunk)
    instead of one flattened [B*L/block, block] source: XLA keeps a
    VMEM-resident gather source only while it fits (~<=64 MB), so the
    flat form fell off a ~4x cliff at batch 64 x 30 s (123 MB source,
    142 -> 50 GB/s, device-traced fusion.3 = 24 ms of a 60 ms program;
    benchmarks/ab_gather_chunk.py). Chunked sources stay ~2 MB and hold
    ~200-220 GB/s at every batch size — faster than the flat gather even
    when the flat source fits.
    """
    b, l = x.shape
    s = starts.shape[1]
    assert length % block == 0 and l % block == 0
    if b >= 4:
        chunk = 2 if b % 2 == 0 else 1
        xc = x.reshape(b // chunk, chunk, l)
        sc = starts.reshape(b // chunk, chunk, s)
        out = jax.lax.map(
            lambda args: _windowed_gather_flat(args[0], args[1], length, block),
            (xc, sc),
        )
        return out.reshape(b, s, length)
    return _windowed_gather_flat(x, starts, length, block)


def _windowed_gather_flat(
    x: jnp.ndarray, starts: jnp.ndarray, length: int, block: int
) -> jnp.ndarray:
    """One flattened row gather over [B*L/block, block] (see windowed_gather)."""
    b, l = x.shape
    s = starts.shape[1]
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


def gather_slices(x: jnp.ndarray, starts: jnp.ndarray, length: int) -> jnp.ndarray:
    """Gather fixed-length contiguous windows at ARBITRARY starts:
    ``x [B, L]``, ``starts [B, S]`` → ``[B, S, length]``.

    Lowered as a batched ``dynamic_slice`` (one gather of ``length``-wide
    contiguous slices) — measured ~3.7G elem/s on v5e at
    [8, 480000] × [8, 64] × 4000, ~27× the per-element gather. The source is
    right-padded with ``length`` zeros so XLA's dynamic-slice clamping never
    shifts a window that extends past the row end (clamping would corrupt
    the *valid* prefix, not just the masked tail).
    """
    x = jnp.pad(x, ((0, 0), (0, length)))

    def one(row, s):
        return jax.lax.dynamic_slice(row, (s,), (length,))

    return jax.vmap(lambda row, ss: jax.vmap(lambda s: one(row, s))(ss))(
        x, jnp.clip(starts, 0)
    )


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

    Implementation notes: per-element TPU gathers run at ~0.14G elem/s, far
    too slow for ~50M-element materializations. When the caller GUARANTEES
    every start is a multiple of ``start_granularity`` (uniform
    segmentation: starts are multiples of max_segment_frames), the windows
    are fetched as block row-gathers (:func:`windowed_gather`, ~205G
    elem/s). Otherwise a batched dynamic-slice (:func:`gather_slices`,
    ~3.7G elem/s) handles arbitrary starts — adaptive segmentation emits
    one misaligned start per utterance whose final span triggers the
    min-shift rule (start = waveform_length - min_frames, and lengths are
    arbitrary mod 40), so it must NOT claim a granularity. A
    DMA-per-segment Pallas kernel was tried and rejected: Mosaic cannot
    slice HBM memrefs at arbitrary sample offsets.
    """
    b, l = waveforms.shape
    _, s = starts.shape
    f = jnp.arange(max_frames, dtype=jnp.int32)
    in_data = (f[None, None, :] < (ends - starts)[..., None]) & segment_mask[..., None]
    block = start_granularity
    if block > 1 and max_frames % block == 0 and l % block == 0:
        gathered = windowed_gather(waveforms, starts, max_frames, block)
    else:
        gathered = gather_slices(waveforms, starts, max_frames)
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
