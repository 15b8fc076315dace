"""Collator tests (reference collate_test.py:12-51 contract, hermetic):
shape contracts for dense segment batching + masks, uniform and adaptive
segmentation, n_words crop, prefix handling."""

import numpy as np
import pytest

from tests.conftest import make_speechlike_waveform

from aat_tpu.data.collate import (
    NoSegmentationAudioWaveformCollator,
    TokenizedAudioWaveformCollator,
    zero_mean_unit_var_pad,
)
from aat_tpu.tokenizer import AdaptiveAudioTokenizer


class WordTokenizer:
    """Minimal HF-tokenizer-shaped test double (word-level)."""

    bos_token_id = 1
    eos_token_id = 2

    def __init__(self):
        self.vocab = {"<pad>": 0, "<s>": 1, "</s>": 2}

    def _id(self, w):
        if w not in self.vocab:
            self.vocab[w] = len(self.vocab)
        return self.vocab[w]

    def decode(self, ids):
        rev = {v: k for k, v in self.vocab.items()}
        return "".join(rev.get(int(i), "?") for i in ids)

    def batch_decode(self, ids_batch, skip_special_tokens=True):
        rev = {v: k for k, v in self.vocab.items()}
        out = []
        for ids in ids_batch:
            words = [rev.get(int(i), "") for i in ids]
            if skip_special_tokens:
                words = [w for w in words if w not in ("<s>", "</s>", "<pad>", "")]
            out.append(" ".join(words))
        return out

    def __call__(self, texts, padding=True):
        seqs = []
        for t in texts:
            t = t.replace("<s>", " <s> ").replace("</s>", " </s> ")
            seqs.append([self._id(w) for w in t.split()])
        max_len = max(len(s) for s in seqs)
        ids = np.zeros((len(seqs), max_len), np.int64)
        mask = np.zeros((len(seqs), max_len), np.int64)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def make_item(rng, duration_s, n_words=12):
    waveform = make_speechlike_waveform(rng, duration_s)
    words = [f"word{i}" for i in range(n_words)]
    starts = np.linspace(0, duration_s * 0.9, n_words)
    ends = starts + duration_s * 0.08
    return {
        "id": f"utt-{rng.integers(1e6)}",
        "audio": {"array": waveform, "sampling_rate": 16000},
        "words": words,
        "word_start": starts.tolist(),
        "word_end": ends.tolist(),
    }


@pytest.mark.parametrize("segmentation", ["uniform", "adaptive"])
def test_collator_shape_contract(rng, segmentation):
    tok = AdaptiveAudioTokenizer.create(max_segment_duration_milliseconds=250)
    collator = TokenizedAudioWaveformCollator(
        audio_encoder_type="hubert",
        segmentation=segmentation,
        audio_tokenizer=tok,
        tokenizer=WordTokenizer(),
        uniform_segmentation_frames_per_segment=4000,
        add_prefix=True,
        seed=0,
    )
    items = [make_item(rng, 2.0), make_item(rng, 1.5)]
    batch = collator(items)

    bs = 2
    s = batch["segments_count"]
    f = tok.max_segment_frames
    assert batch["batched_segments"].shape == (bs, s, f)
    assert batch["segments_waveforms_mask"].shape == (bs, s, f)
    assert batch["segments_boarders_padded"].shape == (bs, s)
    assert batch["segments_boarders_attention_mask"].shape == (bs, s)
    assert batch["input_ids"].shape == batch["attention_mask"].shape
    assert batch["prefix_input_ids"].shape[0] == bs
    # mask marks exactly the segment lengths
    lens = np.diff(
        np.concatenate([np.zeros((bs, 1), np.int64), batch["segments_boarders_padded"]], 1),
        axis=1,
    )
    lens = np.where(batch["segments_boarders_attention_mask"] > 0, lens, 0)
    np.testing.assert_array_equal(
        batch["segments_waveforms_mask"].sum(-1), np.clip(lens, 0, f)
    )
    # segment content is zero-padded beyond its length
    assert not np.isnan(batch["batched_segments"]).any()


def test_uniform_segments_cover_waveform(rng):
    tok = AdaptiveAudioTokenizer.create(max_segment_duration_milliseconds=250)
    collator = TokenizedAudioWaveformCollator(
        audio_encoder_type="hubert",
        segmentation="uniform",
        audio_tokenizer=tok,
        tokenizer=WordTokenizer(),
        uniform_segmentation_frames_per_segment=4000,
        add_prefix=False,
        seed=0,
    )
    items = [make_item(rng, 1.0)]
    batch = collator(items)
    n = int(items[0]["audio"]["array"].shape[-1])
    assert int(batch["segments_boarders_padded"][0].max()) == n


def test_n_words_crop_bounds_text(rng):
    tok = AdaptiveAudioTokenizer.create(max_segment_duration_milliseconds=250)
    collator = TokenizedAudioWaveformCollator(
        audio_encoder_type="hubert",
        segmentation="uniform",
        audio_tokenizer=tok,
        tokenizer=WordTokenizer(),
        uniform_segmentation_frames_per_segment=4000,
        n_words=6,
        add_prefix=False,
        seed=3,
    )
    items = [make_item(rng, 4.0, n_words=30)]
    batch = collator(items)
    # <s> + up to 6 words + </s>, bucket-padded to a multiple of 16
    assert batch["input_ids"].shape[1] == 16
    assert batch["attention_mask"][0].sum() <= 8
    # validation mode: no crop
    batch_val = collator(items, is_validation=True)
    assert batch_val["input_ids"].shape[1] == 32  # <s> + 30 + </s>


def test_no_segmentation_collator(rng):
    collator = NoSegmentationAudioWaveformCollator(
        WordTokenizer(), add_prefix=True, noise_augmentation=True, seed=0
    )
    items = [make_item(rng, 1.0), make_item(rng, 0.5)]
    batch = collator(items)
    assert batch["waveforms"].shape == batch["waveforms_attention_mask"].shape
    assert batch["waveforms"].shape[0] == 2
    # normalization: valid region ~zero-mean unit-var
    w0 = batch["waveforms"][0][batch["waveforms_attention_mask"][0] > 0]
    assert abs(w0.mean()) < 1e-4 and abs(w0.std() - 1.0) < 1e-2


def test_zero_mean_unit_var_pad_matches_hf_semantics(rng):
    w = [rng.normal(2.0, 3.0, 1000), rng.normal(-1.0, 0.5, 600)]
    out, mask = zero_mean_unit_var_pad(w)
    assert out.shape == (2, 1000)
    assert mask[1, 600:].sum() == 0
    v = out[1, :600]
    assert abs(v.mean()) < 1e-5 and abs(v.std() - 1.0) < 1e-3
    np.testing.assert_array_equal(out[1, 600:], 0.0)
