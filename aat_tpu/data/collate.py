"""Batch collators.

Capability parity with /root/reference/src/aat/training/collate.py:

- :class:`TokenizedAudioWaveformCollator` (:54-358): per item — melspec
  (disk cache or computed), uniform/adaptive segment boundaries, optional
  word-aligned ``n_words`` random crop with melspec overlap margins, prefix
  prompt + BOS/EOS text assembly, waveform normalization, then dense
  ``[bs, segments, max_segment_frames]`` segment batching with masks.
- :class:`NoSegmentationAudioWaveformCollator` (:362-428): whole-utterance
  variant.

Differences by design:
- deterministic, seedable RNG (the reference uses global ``random``/
  ``np.random``);
- waveform normalization implemented natively (the reference shells out to
  the HF Wav2Vec2 processor — zero-mean/unit-var over valid samples,
  collate.py:301) so no network/processor download is needed;
- the dense segment-batching hot loop (reference :321-346, its profiled
  bottleneck) is vectorized numpy here, and the same layout can be produced
  fully on-device by aat_tpu.ops.ragged.materialize_segments.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from aat_tpu.audio import AudioWaveform
from aat_tpu.ops import mel as mel_ops
from aat_tpu.ops.segmentation import uniform_boundaries
from aat_tpu.tokenizer import AdaptiveAudioTokenizer

# Prompt-prefix data strings (reference collate.py:21-32; data constants
# required for augmentation parity).
PREFIXES = [
    "The audio transcription states:",
    "According to the audio transcript:",
    "As per the audio transcription:",
    "In the audio recording it is said:",
    "Based on the audio script:",
    "Per the audio record:",
    "From the audio file it can be heard:",
    "What the audio text conveys is:",
    "Transcribed from the audio:",
    "Listening to the recording reveals:",
]


def zero_mean_unit_var_pad(waveforms: List[np.ndarray], padding_value: float = 0.0):
    """HF Wav2Vec2 feature-extractor semantics: per-utterance zero-mean /
    unit-variance over the valid samples, then right-pad to batch max."""
    max_len = max(w.shape[-1] for w in waveforms)
    bs = len(waveforms)
    out = np.full((bs, max_len), padding_value, dtype=np.float32)
    mask = np.zeros((bs, max_len), dtype=np.int64)
    for i, w in enumerate(waveforms):
        n = w.shape[-1]
        norm = (w - w.mean()) / np.sqrt(w.var() + 1e-7)
        out[i, :n] = norm
        mask[i, :n] = 1
    return out, mask


def pad_waveforms(waveforms: List[np.ndarray]) -> Dict[str, np.ndarray]:
    """PadWaveformsMixin.pad_waveforms parity (collate.py:35-51): raw
    right-padding without normalization."""
    max_len = max(w.shape[-1] for w in waveforms)
    bs = len(waveforms)
    batched = np.zeros((bs, max_len), dtype=np.float32)
    mask = np.zeros((bs, max_len), dtype=np.int64)
    for i, w in enumerate(waveforms):
        batched[i, : w.shape[-1]] = w
        mask[i, : w.shape[-1]] = 1
    return {"input_values": batched, "attention_mask": mask}


class TokenizedAudioWaveformCollator:
    def __init__(
        self,
        audio_encoder_type: str,
        segmentation: str,
        audio_tokenizer: AdaptiveAudioTokenizer,
        tokenizer,
        n_words: Optional[int] = None,
        noise_augmentation: bool = False,
        uniform_segmentation_frames_per_segment: Optional[int] = None,
        add_prefix: bool = True,
        melspec_cache_dir: Optional[str] = None,
        max_segment_waveform_frames: Optional[int] = None,
        seed: int = 0,
        bucket_text: int = 16,
        bucket_segments: int = 8,
    ):
        assert segmentation in ("uniform", "adaptive")
        self.audio_encoder_type = audio_encoder_type
        self.segmentation = segmentation
        self.audio_tokenizer = audio_tokenizer
        self.tokenizer = tokenizer
        self.n_words = n_words
        self.noise_augmentation = noise_augmentation
        self.uniform_segmentation_frames_per_segment = uniform_segmentation_frames_per_segment
        self.add_prefix = add_prefix
        self.melspec_cache_dir = melspec_cache_dir
        self.sampling_rate = audio_tokenizer.sampling_rate
        self.max_segment_waveform_frames = (
            max_segment_waveform_frames or audio_tokenizer.max_segment_frames
        )
        self.rng = np.random.default_rng(seed)
        # shape bucketing: round padded text lengths / segment counts up to
        # multiples so jitted steps see few distinct shapes (TPU-native
        # addition; the reference pads to the per-batch max and would
        # recompile-equivalently re-trace every batch)
        self.bucket_text = bucket_text
        self.bucket_segments = bucket_segments

    # ------------------------------------------------------------------

    def _get_waveform(self, item) -> np.ndarray:
        waveform = np.asarray(item["audio"]["array"], dtype=np.float64)
        assert item["audio"]["sampling_rate"] == self.sampling_rate
        if self.noise_augmentation:
            # reference: waveform += rand(n) * randint(1, 50) / 1000 (:97-98)
            waveform = waveform + self.rng.random(waveform.shape[-1]) * (
                int(self.rng.integers(1, 51)) / 1000
            )
        return waveform

    def _melspec_for(self, item, waveform):
        if self.melspec_cache_dir is not None:
            path = os.path.join(self.melspec_cache_dir, str(item["id"]) + ".npy")
            if os.path.exists(path):
                try:
                    # memory-mapped: the n_words crop and per-segment mel
                    # batching read windows, not whole spectrograms — mmap
                    # defers IO to the slices actually touched (downstream
                    # only slices/stacks, never mutates in place)
                    return np.load(path, mmap_mode="r"), None
                except Exception:  # noqa: BLE001 — cache fallback (reference :132-136)
                    pass
        normed = mel_ops.normalize_waveform(waveform)
        return self.audio_tokenizer.get_melspec(normed), normed

    def _boundaries_for(self, waveform, melspec):
        n = waveform.shape[-1]
        if self.segmentation == "uniform":
            return uniform_boundaries(n, self.uniform_segmentation_frames_per_segment), melspec
        # adaptive: segment lengths → cumsum (reference :150-158)
        normed = mel_ops.normalize_waveform(waveform)
        segments, melspec = self.audio_tokenizer.tokenize(
            AudioWaveform(normed, self.sampling_rate), melspec=melspec
        )
        lengths = np.array([s.waveform.shape[-1] for s in segments])
        return lengths.cumsum(), melspec

    def _crop_to_words(self, item, waveform, melspec, boundaries, n_words):
        """Word-aligned random crop (reference :169-212). Returns
        (waveform, melspec, boundaries, words)."""
        words = list(item["words"])
        if n_words is None or len(words) <= n_words:
            return waveform, melspec, boundaries, words

        hop = self.audio_tokenizer.hop_length
        rmp = self.audio_tokenizer.running_mean_points
        start_word = int(self.rng.integers(0, len(words) - n_words + 1))
        end_word = start_word + n_words
        words = words[start_word:end_word]

        start_frame = int(item["word_start"][start_word] * self.sampling_rate)
        end_frame = int(item["word_end"][end_word - 1] * self.sampling_rate)

        with_zero = np.insert(boundaries, 0, 0)
        start_seg = max(int(np.searchsorted(with_zero, start_frame)) - 1, 0)
        end_seg = int(np.searchsorted(with_zero, end_frame, side="right"))
        assert end_seg < len(with_zero)

        seg_start_sample = int(with_zero[start_seg])
        seg_end_sample = int(with_zero[end_seg])
        boundaries = with_zero[start_seg : end_seg + 1] - seg_start_sample
        boundaries = boundaries[1:]  # cut leading zero

        overlap = 5  # melspec frames (reference :202)
        wf_overlap = overlap * hop
        crop_start = max(0, seg_start_sample - wf_overlap)
        crop_end = min(seg_end_sample + wf_overlap, waveform.shape[-1])
        waveform = waveform[crop_start:crop_end]

        mel_start = max(0, crop_start // hop - rmp - overlap)
        mel_end = min(crop_end // hop + overlap, melspec.shape[-1])
        melspec = melspec[:, mel_start:mel_end]
        return waveform, melspec, boundaries, words

    # ------------------------------------------------------------------

    def __call__(self, items, is_validation: bool = False) -> Dict[str, np.ndarray]:
        tokenizer = self.tokenizer
        bos = tokenizer.decode([tokenizer.bos_token_id])
        eos = tokenizer.decode([tokenizer.eos_token_id])

        n_words = None
        if self.n_words is not None and not is_validation:
            n_words = int(self.rng.integers(5, self.n_words + 1))

        texts, prefixes = [], []
        all_boundaries: List[np.ndarray] = []
        waveforms: List[np.ndarray] = []
        melspecs: List[np.ndarray] = []
        max_frame_lens: List[int] = []

        for item in items:
            waveform = self._get_waveform(item)
            melspec, _ = self._melspec_for(item, waveform)
            boundaries, melspec = self._boundaries_for(waveform, melspec)
            raw_lengths = np.diff(np.insert(boundaries, 0, 0))
            waveform, melspec, boundaries, words = self._crop_to_words(
                item, waveform, melspec, boundaries, n_words
            )

            text = " ".join(words)
            prefix = ""
            if self.add_prefix:
                prefix = PREFIXES[int(self.rng.integers(0, len(PREFIXES)))] + " "
                text = prefix + text
            prefixes.append(bos + prefix)
            texts.append(bos + text + eos)

            waveforms.append(waveform)
            melspecs.append(melspec)
            all_boundaries.append(np.asarray(boundaries))
            max_frame_lens.append(int(raw_lengths.max()))

        def bucket_pad(ids, mask, multiple):
            if multiple <= 1:
                return ids, mask
            width = -(-ids.shape[1] // multiple) * multiple
            pad = ((0, 0), (0, width - ids.shape[1]))
            return np.pad(ids, pad), np.pad(mask, pad)

        result: Dict[str, np.ndarray] = {}
        tokenized = tokenizer(texts, padding=True)
        ids, mask = bucket_pad(
            np.asarray(tokenized["input_ids"]),
            np.asarray(tokenized["attention_mask"]),
            self.bucket_text,
        )
        result["input_ids"] = ids
        result["attention_mask"] = mask
        result["input_ids_attention_mask"] = mask

        tokenized_prefix = tokenizer(prefixes, padding=True)
        pids, pmask = bucket_pad(
            np.asarray(tokenized_prefix["input_ids"]),
            np.asarray(tokenized_prefix["attention_mask"]),
            self.bucket_text,
        )
        result["prefix_input_ids"] = pids
        result["prefix_attention_mask"] = pmask

        bs = len(items)
        max_n_bounds = max(len(b) for b in all_boundaries)
        if self.bucket_segments > 1:
            max_n_bounds = -(-max_n_bounds // self.bucket_segments) * self.bucket_segments
        boarders = np.zeros((bs, max_n_bounds), dtype=np.int64)
        boarders_mask = np.zeros((bs, max_n_bounds), dtype=np.int64)
        for i, b in enumerate(all_boundaries):
            boarders[i, : len(b)] = b
            boarders_mask[i, : len(b)] = 1
        result["segments_boarders_padded"] = boarders
        result["segments_boarders_attention_mask"] = boarders_mask
        result["segments_max_frame_len"] = np.asarray(max_frame_lens)
        result["segments_count"] = max_n_bounds

        max_frames = self.max_segment_waveform_frames
        hop = self.audio_tokenizer.hop_length

        if self.audio_encoder_type != "efficient_net":
            from aat_tpu.runtime import host_ops

            # per-row zero-mean/unit-var + dense segment batching in the
            # native C++ runtime (the reference's profiled hot loop,
            # collate.py:321-346); numpy fallbacks inside host_ops.
            normed, _ = host_ops.normalize_pad(waveforms)
            starts = np.concatenate(
                [np.zeros((bs, 1), np.int64), boarders[:, :-1]], axis=1
            )
            seg_valid = boarders_mask.astype(bool) & (boarders > starts)
            seg_lens = np.where(seg_valid, boarders - starts, 0)
            batched = np.empty((bs, max_n_bounds, max_frames), np.float32)
            masks = np.empty((bs, max_n_bounds, max_frames), np.float32)
            for i in range(bs):
                batched[i], masks[i] = host_ops.assemble_segments(
                    normed[i], starts[i], starts[i] + seg_lens[i], seg_lens[i],
                    max_frames,
                )
            result["batched_segments"] = batched
            result["segments_waveforms_mask"] = masks
            result["batched_segments_melspectrograms"] = None
        else:
            max_mel = int(1 + np.floor(max_frames / hop))
            n_mels = self.audio_tokenizer.num_mel_filters
            mels = np.zeros((bs, max_n_bounds, n_mels, max_mel), np.float32)
            for i in range(bs):
                prev = 0
                for s in range(max_n_bounds):
                    b = int(boarders[i, s])
                    if s > 0 and b == 0:
                        continue
                    m0, m1 = prev // hop, b // hop
                    piece = melspecs[i][:, m0:m1]
                    mels[i, s, :, : piece.shape[1]] = piece[:, :max_mel]
                    prev = b
            result["batched_segments_melspectrograms"] = mels
            result["batched_segments"] = None
            result["segments_waveforms_mask"] = None

        return result


class NoSegmentationAudioWaveformCollator:
    """Whole-utterance collator (reference collate.py:362-428)."""

    def __init__(
        self,
        tokenizer,
        sampling_rate: int = 16000,
        add_prefix: bool = True,
        noise_augmentation: bool = True,
        seed: int = 0,
    ):
        self.tokenizer = tokenizer
        self.sampling_rate = sampling_rate
        self.add_prefix = add_prefix
        self.noise_augmentation = noise_augmentation
        self.rng = np.random.default_rng(seed)

    def __call__(self, items) -> Dict[str, np.ndarray]:
        tokenizer = self.tokenizer
        bos = tokenizer.decode([tokenizer.bos_token_id])
        eos = tokenizer.decode([tokenizer.eos_token_id])

        texts, prefixes, waveforms = [], [], []
        for item in items:
            waveform = np.asarray(item["audio"]["array"], dtype=np.float64)
            if self.noise_augmentation:
                waveform = waveform + self.rng.random(waveform.shape[-1]) * (
                    int(self.rng.integers(1, 51)) / 1000
                )
            text = " ".join(item["words"])
            prefix = ""
            if self.add_prefix:
                prefix = PREFIXES[int(self.rng.integers(0, len(PREFIXES)))] + " "
                text = prefix + text
            prefixes.append(bos + prefix)
            texts.append(bos + text + eos)
            waveforms.append(waveform)

        result: Dict[str, np.ndarray] = {}
        tokenized = tokenizer(texts, padding=True)
        result["input_ids"] = np.asarray(tokenized["input_ids"])
        result["attention_mask"] = np.asarray(tokenized["attention_mask"])
        result["input_ids_attention_mask"] = result["attention_mask"]

        tokenized_prefix = tokenizer(prefixes, padding=True)
        result["prefix_input_ids"] = np.asarray(tokenized_prefix["input_ids"])
        result["prefix_attention_mask"] = np.asarray(tokenized_prefix["attention_mask"])

        normed, mask = zero_mean_unit_var_pad(waveforms)
        result["waveforms"] = normed
        result["waveforms_attention_mask"] = mask
        return result
