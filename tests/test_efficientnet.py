"""EfficientNet-b0 adapter: shapes, adapter semantics, and a training step
through the melspec path (reference audio_encoder_type=efficient_net,
trainer_train.py:216-225, trainer.py:676-683)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aat_tpu.models.efficientnet import (
    EfficientNetAudioEncoderAdapter,
    EfficientNetConfig,
    efficientnet_features,
    init_efficientnet_params,
)


@pytest.fixture(scope="module")
def params():
    return init_efficientnet_params(seed=0)


def test_feature_shape(params):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, (2, 64, 32, 3)).astype(np.float32))
    feats = efficientnet_features(params, images)
    assert feats.shape == (2, 1280)
    assert np.all(np.isfinite(np.asarray(feats)))


def test_adapter_melspec_contract(params):
    adapter = EfficientNetAudioEncoderAdapter(EfficientNetConfig())
    rng = np.random.default_rng(1)
    mels = jnp.asarray(rng.normal(0, 1, (3, 1, 64, 26)).astype(np.float32))
    out = adapter(params, mels)
    assert out.shape == (3, 1, 1280)  # reference: [bs, 1, 1280] (:86-89)
    # 3-channel repeat means a [bs, n_mels, T] input gives the same result
    out2 = adapter(params, mels[:, 0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_efficientnet_eval_with_generation():
    """Eval + beam generation through the melspec branch (reference
    efficient_net eval path)."""
    import sys

    sys.path.insert(0, "tests")
    from tests.test_collate import WordTokenizer

    from aat_tpu.models import llama as llm
    from aat_tpu.models.aslm import AslmConfig, AslmModel
    from aat_tpu.training.config import TrainingConfig
    from aat_tpu.training.metrics import ComputeMetrics
    from aat_tpu.training.trainer import AATTrainerSegmentation

    tokenizer = WordTokenizer()
    config = AslmConfig(projection_type="mean", audio_encoder_hidden=1280, lm_hidden=32)
    model = AslmModel(config, EfficientNetConfig(), llm.tiny_test_config(),
                      audio_encoder_type="efficient_net")
    trainer = AATTrainerSegmentation(
        model, model.init_params(jax.random.PRNGKey(1)),
        TrainingConfig(
            learning_rate=1e-3, warmup_steps=2, max_steps=5,
            gradient_accumulation_steps=1, compute_dtype="float32",
            audio_encoder_type="efficient_net", train_audio_encoder=False,
            train_lm_decoder=True, logging_steps=1000, eval_steps=0, save_steps=0,
            output_dir="/tmp/aat_tpu_effnet_eval",
        ),
        compute_metrics=ComputeMetrics(tokenizer), tokenizer=tokenizer,
    )
    rng = np.random.default_rng(1)
    bs, s = 2, 2
    text = tokenizer(["<s> alpha beta </s>", "<s> gamma delta </s>"], padding=True)
    prefix = tokenizer(["<s>", "<s>"], padding=True)
    batch = {
        "batched_segments_melspectrograms": rng.normal(0, 1, (bs, s, 64, 26)).astype(np.float32),
        "segments_boarders_attention_mask": np.ones((bs, s), np.int32),
        "input_ids": text["input_ids"],
        "attention_mask": text["attention_mask"],
        "input_ids_attention_mask": text["attention_mask"],
        "prefix_input_ids": prefix["input_ids"],
        "prefix_attention_mask": prefix["attention_mask"],
    }
    metrics = trainer.evaluate([batch])
    assert np.isfinite(metrics["eval/loss"])
    assert "wer" in metrics


def test_efficientnet_training_step():
    from aat_tpu.models import llama as llm
    from aat_tpu.models.aslm import AslmConfig, AslmModel, PoolingConfig
    from aat_tpu.training.config import TrainingConfig
    from aat_tpu.training.trainer import AATTrainerSegmentation

    config = AslmConfig(
        projection_type="mean",
        audio_encoder_hidden=1280,
        lm_hidden=32,
    )
    model = AslmModel(
        config, EfficientNetConfig(), llm.tiny_test_config(),
        audio_encoder_type="efficient_net",
    )
    params = model.init_params(jax.random.PRNGKey(0))
    tcfg = TrainingConfig(
        learning_rate=1e-3, warmup_steps=2, max_steps=5,
        gradient_accumulation_steps=1, compute_dtype="float32",
        audio_encoder_type="efficient_net", train_audio_encoder=False,
        train_lm_decoder=True,
        logging_steps=1000, eval_steps=0, save_steps=0,
        output_dir="/tmp/aat_tpu_effnet",
    )
    trainer = AATTrainerSegmentation(model, params, tcfg)
    rng = np.random.default_rng(0)
    bs, s = 2, 3
    batch = {
        "batched_segments_melspectrograms": rng.normal(
            0, 1, (bs, s, 64, 26)
        ).astype(np.float32),
        "segments_boarders_attention_mask": np.ones((bs, s), np.int32),
        "input_ids": rng.integers(1, 100, (bs, 5)),
        "attention_mask": np.ones((bs, 5), np.int32),
        "input_ids_attention_mask": np.ones((bs, 5), np.int32),
    }
    losses = [trainer.training_step([batch])["train/loss"] for _ in range(3)]
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
