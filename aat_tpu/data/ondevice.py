"""On-device datagen: raw padded waveforms → dense segment batch, inside a
jit — zero host round-trips (north-star config 5). Shared by the trainer's
fused step / eval prefix assembly and the serving engine's speech requests.

Replaces the host collator's audio work (text tokenization stays host-side
by nature); reference ground: the collator's melspec + boundary + crop +
dense-batching pipeline (/root/reference/src/aat/training/collate.py:103-346).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from aat_tpu.ops.ragged import materialize_segments
from aat_tpu.ops.segmentation import (
    TokenizerConfig, segment_waveforms, uniform_segment_table,
)


def segment_raw_batch(
    batch: dict,
    *,
    segmentation: str,
    max_segment_frames: int,
    max_segments: int,
    sampling_rate: int,
    tokenizer_config: Optional[TokenizerConfig] = None,
) -> dict:
    """``{"raw_waveforms" [B, L], "raw_lengths" [B]}`` → the dense segment
    keys the model consumes (``batched_segments`` etc.). Both normalization
    passes (tokenizer eps 1e-6, processor eps 1e-7 — reference
    collate.py:135-138,301) derive from ONE mean/var computation."""
    tok_cfg = tokenizer_config or TokenizerConfig(
        max_segments=max_segments,
        max_segment_duration_milliseconds=(
            max_segment_frames * 1000 // sampling_rate
        ),
    )
    waveforms = batch["raw_waveforms"].astype(jnp.float32)
    lengths = batch["raw_lengths"].astype(jnp.int32)
    valid = jnp.arange(waveforms.shape[-1])[None, :] < lengths[:, None]
    n = jnp.maximum(lengths, 1).astype(jnp.float32)[:, None]

    # tokenizer normalization (mean/std eps 1e-6, reference collate :135-138)
    mean = jnp.sum(jnp.where(valid, waveforms, 0), -1, keepdims=True) / n
    var = jnp.sum(jnp.where(valid, (waveforms - mean) ** 2, 0), -1, keepdims=True) / n
    tok_norm = jnp.where(valid, (waveforms - mean) / (jnp.sqrt(var) + 1e-6), 0)

    if segmentation == "uniform":
        table = uniform_segment_table(
            lengths, max_segment_frames, tok_cfg.max_segments
        )
    else:
        table = segment_waveforms(tok_norm, lengths, tok_cfg)

    # processor normalization for segment content (eps 1e-7, :301)
    proc_norm = jnp.where(valid, (waveforms - mean) * jax.lax.rsqrt(var + 1e-7), 0)
    # block row-gathers need starts aligned BY CONSTRUCTION: uniform starts
    # are multiples of max_segment_frames, but adaptive emits a misaligned
    # start whenever the final span triggers the min-shift rule (start =
    # length - min_frames, lengths arbitrary mod 40) — adaptive therefore
    # uses the arbitrary-start dynamic-slice path.
    aligned = (
        segmentation == "uniform"
        and proc_norm.shape[-1] % tok_cfg.start_granularity == 0
    )
    segments, frame_mask = materialize_segments(
        proc_norm, table["starts"], table["ends"], table["out_lens"],
        table["segment_mask"], tok_cfg.max_segment_frames,
        start_granularity=tok_cfg.start_granularity if aligned else 1,
    )
    return {
        **batch,
        "batched_segments": segments,
        "segments_waveforms_mask": frame_mask.astype(jnp.float32),
        "segments_boarders_attention_mask": table["segment_mask"].astype(jnp.int32),
    }
