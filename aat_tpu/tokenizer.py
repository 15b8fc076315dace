"""Adaptive audio amplitude tokenizer — public API.

Capability parity with ``AdaptiveAudioAmplitudeTokenizer``
(/root/reference/src/aat/tokenizer.py:14-200), re-designed TPU-first:

- :meth:`AdaptiveAudioTokenizer.tokenize` — host-exact per-utterance path,
  bit-identical boundaries to the reference (float64 mel + bit-faithful
  float32 boundary math). Returns segment :class:`~aat_tpu.audio.AudioWaveform`
  pieces plus the melspec, like the reference.
- :meth:`AdaptiveAudioTokenizer.tokenize_batch` — fully on-device batched
  pipeline: one jit computes melspec (GEMM-native DFT), boundary detection,
  merge/split post-processing and dense segment materialization for a padded
  ``[B, L]`` batch with fixed shapes.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from aat_tpu.audio import AudioWaveform
from aat_tpu.ops import mel as mel_ops
from aat_tpu.ops import segmentation as seg_ops
from aat_tpu.ops.segmentation import TokenizerConfig


class AdaptiveAudioTokenizer:
    """Variable-length speech segmentation by smoothed-amplitude minima."""

    def __init__(self, config: TokenizerConfig = TokenizerConfig()):
        self.config = config

    # ---- constructor parity helpers (reference ctor args) ----------------

    @classmethod
    def create(
        cls,
        running_mean_points: int = 12,
        min_segment_duration_milliseconds: int = 125,
        max_segment_duration_milliseconds: int = 1500,
        n_fft: int = 400,
        hop_length: int = 160,
        num_mel_filters: int = 64,
        sampling_rate: int = 16000,
        max_amplitude_for_minima: float = 15.0,
    ) -> "AdaptiveAudioTokenizer":
        return cls(TokenizerConfig(
            running_mean_points=running_mean_points,
            min_segment_duration_milliseconds=min_segment_duration_milliseconds,
            max_segment_duration_milliseconds=max_segment_duration_milliseconds,
            n_fft=n_fft,
            hop_length=hop_length,
            num_mel_filters=num_mel_filters,
            sampling_rate=sampling_rate,
            max_amplitude_for_minima=max_amplitude_for_minima,
        ))

    @property
    def sampling_rate(self) -> int:
        return self.config.sampling_rate

    @property
    def hop_length(self) -> int:
        return self.config.hop_length

    @property
    def num_mel_filters(self) -> int:
        return self.config.num_mel_filters

    @property
    def running_mean_points(self) -> int:
        return self.config.running_mean_points

    @property
    def min_segment_frames(self) -> int:
        return self.config.min_segment_frames

    @property
    def max_segment_frames(self) -> int:
        return self.config.max_segment_frames

    # ---- host-exact path -------------------------------------------------

    def get_melspec(self, waveform: np.ndarray) -> np.ndarray:
        """Host-exact log-mel spectrogram (``[n_mels, T]`` float32)."""
        c = self.config
        return mel_ops.log_mel_spectrogram_exact(
            waveform, n_fft=c.n_fft, hop_length=c.hop_length,
            n_mels=c.num_mel_filters, sampling_rate=c.sampling_rate,
        )

    def pretokenize(
        self, waveform: np.ndarray, melspec: Optional[np.ndarray] = None
    ) -> Tuple[List[int], np.ndarray]:
        """Boundary sample indices (minima * hop + waveform end) + melspec."""
        return seg_ops.pretokenize_exact(waveform, melspec, self.config)

    def segment_spans(
        self, waveform: np.ndarray, melspec: Optional[np.ndarray] = None
    ) -> Tuple[List[Tuple[int, int, int]], np.ndarray]:
        """(start, end, out_len) spans after merge/split/pad + melspec."""
        boundaries, melspec = self.pretokenize(waveform, melspec)
        spans = seg_ops.process_boundaries_exact(
            int(waveform.shape[-1]), boundaries, self.config
        )
        return spans, melspec

    def tokenize(
        self, audio: AudioWaveform, melspec: Optional[np.ndarray] = None
    ) -> Tuple[List[AudioWaveform], np.ndarray]:
        """Reference-shaped API: list of segment waveforms + melspec.

        Behavior parity: src/aat/tokenizer.py:185-200 (including the <300
        segments assertion and frame-count conservation).
        """
        audio.assert_sampling_rate(self.config.sampling_rate)
        waveform = audio.waveform
        spans, melspec = self.segment_spans(waveform, melspec)

        segments: List[AudioWaveform] = []
        for start, end, out_len in spans:
            piece = waveform[start:end]
            if out_len > end - start:  # trailing segment, right-pad with zeros
                padded = np.zeros(out_len, dtype=piece.dtype)
                padded[: end - start] = piece
                piece = padded
            segments.append(AudioWaveform(piece, audio.sampling_rate))

        assert len(segments) < 300
        assert sum(s.waveform.shape[-1] for s in segments) >= waveform.shape[-1]
        return segments, melspec

    # ---- on-device batched path -----------------------------------------

    def tokenize_batch(self, waveforms, lengths):
        """Jitted fixed-shape batch segmentation; see
        :func:`aat_tpu.ops.segmentation.segment_waveforms`."""
        return seg_ops.segment_waveforms(waveforms, lengths, self.config)


def tokenize_dense(waveforms, lengths, config=TokenizerConfig(),
                   batch_chunk: int = 8):
    """Full device tokenize: segmentation table + dense segment batch.

    Composes :func:`~aat_tpu.ops.segmentation.segment_waveforms` with
    :func:`~aat_tpu.ops.ragged.materialize_segments` and runs the pipeline
    over BATCH CHUNKS of at most ``batch_chunk`` utterances (``lax.map``).
    Every stage is per-utterance-parallel, and its intermediates (mel
    framing pads/copies, padded-waveform relayouts) only stay VMEM-resident
    at small batch — flat batch 64 x 30 s measured ~35% slower per
    audio-second than batch 16 from exactly those spilled data-movement ops
    (device-traced, benchmarks/trace_tokenize.py). Chunking holds the
    per-chunk working set at the measured sweet spot (chunk 8: 70.8k
    audio_s/s at batch 64 vs 59.5k chunk 4 / 57.1k chunk 32 — loop
    overhead below, VMEM spills above), making throughput flat-to-rising
    in batch size (benchmarks/RESULTS.md).

    Call under ``jax.jit`` (trace-time branching on static shapes only).
    Returns ``(table, segments, frame_mask)`` where ``table`` is the
    :func:`segment_waveforms` dict (all leaves ``[B, ...]``) minus
    ``melspec`` when chunked (kept per-chunk it would materialize the
    full-batch melspec for no consumer; call ``tokenize_batch`` if you
    need it), ``segments`` is ``[B, S_max, max_frames]`` float32 and
    ``frame_mask`` the matching validity mask.
    """
    import jax

    from aat_tpu.ops.ragged import materialize_segments

    b = waveforms.shape[0]
    max_frames = config.max_segment_frames

    def one_chunk(wv, ln):
        table = seg_ops.segment_waveforms(wv, ln, config)
        segments, frame_mask = materialize_segments(
            wv, table["starts"], table["ends"], table["out_lens"],
            table["segment_mask"], max_frames,
            start_granularity=config.start_granularity,
        )
        return table, segments, frame_mask

    if b <= batch_chunk:
        return one_chunk(waveforms, lengths)
    chunk = max(d for d in range(1, batch_chunk + 1) if b % d == 0)
    wc = waveforms.reshape(b // chunk, chunk, waveforms.shape[1])
    lc = lengths.reshape(b // chunk, chunk)

    def chunk_fn(args):
        table, segments, frame_mask = one_chunk(*args)
        table.pop("melspec")
        return table, segments, frame_mask

    out = jax.lax.map(chunk_fn, (wc, lc))
    return jax.tree.map(lambda x: x.reshape(b, *x.shape[2:]), out)
