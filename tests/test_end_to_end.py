"""End-to-end slice: synthetic items → adaptive collator → segmented
trainer → eval with beam generation + WER/BLEU metrics. Exercises the whole
L1→L5 stack on a tiny model (hermetic, CPU)."""

import numpy as np
import pytest

import jax

from tests.test_collate import WordTokenizer, make_item

from aat_tpu.data.collate import TokenizedAudioWaveformCollator
from aat_tpu.data.dataloaders import BatchIterator
from aat_tpu.models import hubert as hub
from aat_tpu.models import llama as llm
from aat_tpu.models.aslm import AslmConfig, AslmModel, PoolingConfig
from aat_tpu.tokenizer import AdaptiveAudioTokenizer
from aat_tpu.training.config import TrainingConfig
from aat_tpu.training.generate import GenerationConfig
from aat_tpu.training.metrics import ComputeMetrics
from aat_tpu.training.trainer import AATTrainerSegmentation
from aat_tpu.utils.timing import RecordTimings


@pytest.mark.slow
def test_whole_utterance_training_path(rng, tmp_path):
    """segmentation='none' flow (reference AATTrainer +
    NoSegmentationAudioWaveformCollator, trainer_train.py:74-84): whole
    utterances through encode_audio with waveform masks."""
    from aat_tpu.data.collate import NoSegmentationAudioWaveformCollator
    from aat_tpu.training.trainer import AATTrainer

    tokenizer = WordTokenizer()
    collate = NoSegmentationAudioWaveformCollator(
        tokenizer, add_prefix=True, noise_augmentation=True, seed=0
    )
    items = [make_item(np.random.default_rng(i), 0.8 + 0.2 * i) for i in range(2)]
    batch = collate(items)
    assert "waveforms" in batch

    config = AslmConfig(
        projection_type="linear",
        audio_encoder_embeddings_seq_len=2,
        audio_encoder_hidden=32, lm_hidden=32, projection_hidden=48,
    )
    model = AslmModel(config, hub.tiny_test_config(), llm.tiny_test_config())
    params = model.init_params(jax.random.PRNGKey(4))
    tcfg = TrainingConfig(
        learning_rate=1e-3, warmup_steps=2, max_steps=6,
        gradient_accumulation_steps=1, compute_dtype="float32",
        train_lm_decoder=True, segmentation="none",
        logging_steps=1000, eval_steps=0, save_steps=0,
        output_dir=str(tmp_path),
    )
    trainer = AATTrainer(model, params, tcfg,
                         compute_metrics=ComputeMetrics(tokenizer),
                         tokenizer=tokenizer)
    losses = [trainer.training_step([batch])["train/loss"] for _ in range(4)]
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]

    metrics = trainer.evaluate([batch])
    assert np.isfinite(metrics["eval/loss"])
    assert "wer" in metrics


@pytest.mark.slow
def test_on_device_datagen_training(rng, tmp_path):
    """North-star config 5: raw waveforms enter the jitted train step;
    segmentation + materialization + encoding + loss run with zero host
    round-trips."""
    from tests.conftest import make_speechlike_waveform

    tokenizer = WordTokenizer()
    config = AslmConfig(
        projection_type="transformer_encoder",
        audio_encoder_hidden=32, lm_hidden=32,
        pooling=PoolingConfig(hidden_dim=32, num_heads=4, num_layers=1,
                              ffn_dim=64, max_positions=256),
    )
    model = AslmModel(config, hub.tiny_test_config(), llm.tiny_test_config())
    params = model.init_params(jax.random.PRNGKey(3))
    tcfg = TrainingConfig(
        learning_rate=1e-3, warmup_steps=2, max_steps=8,
        gradient_accumulation_steps=1, compute_dtype="float32",
        train_lm_decoder=True, logging_steps=1000, eval_steps=0, save_steps=0,
        max_segment_frames=4000, max_on_device_segments=16,
        output_dir=str(tmp_path),
    )
    trainer = AATTrainerSegmentation(model, params, tcfg)

    waveforms = [make_speechlike_waveform(np.random.default_rng(i), 1.0) for i in range(2)]
    l_max = max(w.shape[-1] for w in waveforms)
    raw = np.zeros((2, l_max), np.float32)
    lengths = np.zeros((2,), np.int32)
    for i, w in enumerate(waveforms):
        raw[i, : w.shape[-1]] = w
        lengths[i] = w.shape[-1]
    text = tokenizer(["<s> hello world </s>", "<s> foo bar baz </s>"], padding=True)
    prefix = tokenizer(["<s>", "<s>"], padding=True)
    batch = {
        "raw_waveforms": raw,
        "raw_lengths": lengths,
        "input_ids": text["input_ids"],
        "attention_mask": text["attention_mask"],
        "input_ids_attention_mask": text["attention_mask"],
        "prefix_input_ids": prefix["input_ids"],
        "prefix_attention_mask": prefix["attention_mask"],
    }
    losses = [trainer.training_step([batch])["train/loss"] for _ in range(6)]
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]

    # evaluate(with_generation=True) must work on the SAME raw-waveform
    # batches the step trains on (the reference evaluates its training
    # collator's output, trainer.py:554-602) — the north-star config-5
    # pipeline trains AND evals on one iterator
    trainer.compute_metrics = ComputeMetrics(tokenizer)
    trainer.generation_config = GenerationConfig(
        num_beams=2, repetition_penalty=2.5, no_repeat_ngram_size=4
    )
    eval_metrics = trainer.evaluate([batch], with_generation=True)
    assert np.isfinite(eval_metrics["eval/loss"])
    assert "wer" in eval_metrics


@pytest.mark.slow
def test_full_pipeline_train_and_eval(rng, tmp_path):
    tokenizer = WordTokenizer()
    audio_tokenizer = AdaptiveAudioTokenizer.create(
        max_segment_duration_milliseconds=250
    )
    collate = TokenizedAudioWaveformCollator(
        "hubert", "adaptive", audio_tokenizer, tokenizer,
        n_words=8, add_prefix=True, seed=0,
    )

    items = [make_item(np.random.default_rng(i), 1.2, n_words=10) for i in range(4)]
    train_iter = BatchIterator(items, collate, batch_size=2, shuffle=True,
                               drop_last=True, prefetch=0)

    config = AslmConfig(
        projection_type="transformer_encoder",
        audio_encoder_hidden=32, lm_hidden=32,
        # tiny hubert strides 20x (vs 320x for large): 4000-sample segments
        # give 201 frames, so the pooling position table must cover T+1
        # (reference contract: max_positions = encoder seq len + 1,
        # modeling_aslm.py:110-112)
        pooling=PoolingConfig(hidden_dim=32, num_heads=4, num_layers=1,
                              ffn_dim=64, max_positions=256),
    )
    model = AslmModel(config, hub.tiny_test_config(), llm.tiny_test_config())
    params = model.init_params(jax.random.PRNGKey(0))

    tcfg = TrainingConfig(
        learning_rate=1e-3, warmup_steps=2, max_steps=6,
        gradient_accumulation_steps=1, compute_dtype="float32",
        train_lm_decoder=True, logging_steps=1000, eval_steps=0, save_steps=0,
        output_dir=str(tmp_path),
    )
    trainer = AATTrainerSegmentation(
        model, params, tcfg,
        compute_metrics=ComputeMetrics(tokenizer),
        tokenizer=tokenizer,
        generation_config=GenerationConfig(num_beams=2, repetition_penalty=2.5,
                                           no_repeat_ngram_size=4),
    )

    timings = {}
    with RecordTimings(timings, "train"):
        losses = []
        for batch in train_iter:
            metrics = trainer.training_step([batch])
            losses.append(metrics["train/loss"])
    assert all(np.isfinite(losses))
    assert timings["train"] > 0

    eval_iter = BatchIterator(items[:2], collate, batch_size=2, shuffle=False,
                              drop_last=False, is_validation=True, prefetch=0)
    with RecordTimings(timings, "eval"):
        eval_metrics = trainer.evaluate(eval_iter)
    assert np.isfinite(eval_metrics["eval/loss"])
    assert "wer" in eval_metrics
    assert 0.0 <= eval_metrics["wer"] <= 5.0  # random model: high WER, defined
    assert "evaluate_rouge1" in eval_metrics
