"""Train-mode dropout: stochastic under a PRNG key, deterministic without,
expectation-preserving, and variance-matched against torch train mode
(the reference trains HF modules in train mode with dropout active,
/root/reference/src/aslm/modeling_aslm.py:29-36 + HF Hubert train mode)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aat_tpu.models import hubert as hub
from aat_tpu.ops.dropout import dropout


def test_dropout_helper_statistics():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((64, 256), jnp.float32)
    rate = 0.3
    y = np.asarray(dropout(rng, x, rate))
    frac_zero = (y == 0).mean()
    assert abs(frac_zero - rate) < 0.02
    # inverted dropout preserves expectation; survivors are scaled 1/(1-p)
    assert abs(y.mean() - 1.0) < 0.02
    np.testing.assert_allclose(y[y != 0], 1.0 / (1.0 - rate), rtol=1e-6)
    # identity in eval mode / at rate 0
    np.testing.assert_array_equal(np.asarray(dropout(None, x, rate)), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(dropout(rng, x, 0.0)), np.asarray(x))


def _dropout_cfg(**rates):
    base = hub.tiny_test_config()
    return dataclasses.replace(base, **rates)


def test_hubert_train_mode_stochastic_eval_deterministic():
    cfg = _dropout_cfg(hidden_dropout=0.2, attention_dropout=0.2,
                       activation_dropout=0.2, feature_projection_dropout=0.1)
    params = hub.init_hubert_params(0, cfg)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(0, 0.5, (2, 900)).astype(np.float32))
    mask = jnp.asarray(np.ones((2, 900), np.int64))

    eval1, _ = hub.hubert_encode(params, cfg, wav, mask)
    eval2, _ = hub.hubert_encode(params, cfg, wav, mask)
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))

    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    t1, _ = hub.hubert_encode(params, cfg, wav, mask, dropout_rng=k1)
    t1b, _ = hub.hubert_encode(params, cfg, wav, mask, dropout_rng=k1)
    t2, _ = hub.hubert_encode(params, cfg, wav, mask, dropout_rng=k2)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t1b))
    assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 1e-5
    assert np.abs(np.asarray(t1) - np.asarray(eval1)).max() > 1e-5


def test_hubert_layerdrop_skips_whole_layers():
    cfg = _dropout_cfg(layerdrop=0.999)  # nearly always skip both layers
    params = hub.init_hubert_params(0, cfg)
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.normal(0, 0.5, (1, 900)).astype(np.float32))

    out, _ = hub.hubert_encode(params, cfg, wav, None,
                               dropout_rng=jax.random.PRNGKey(3))
    # all layers skipped → output equals the pre-encoder stream (pos conv +
    # final LN only); recompute that path with a 0-layer config
    cfg0 = dataclasses.replace(cfg, num_hidden_layers=0)
    params0 = dict(params)
    params0["layers"] = []
    base, _ = hub.hubert_encode(params0, cfg0, wav, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


def test_hubert_train_mode_variance_matches_torch():
    """Variance matching vs the torch oracle: run tiny twins (same ported
    weights) in train mode with the same dropout rates; the across-draw
    per-element std must agree in aggregate."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    torch.backends.mkldnn.enabled = False
    from aat_tpu.utils.port import port_hubert

    tcfg = transformers.HubertConfig(
        vocab_size=32, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_stride=(5, 2, 2), conv_kernel=(10, 3, 3),
        conv_bias=True, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=True,
        feat_extract_norm="layer", mask_time_prob=0.0,
        layerdrop=0.0, hidden_dropout=0.25, attention_dropout=0.25,
        feat_proj_dropout=0.1, activation_dropout=0.25,
    )
    torch.manual_seed(0)
    tm = transformers.HubertModel(tcfg)
    params, cfg = port_hubert(tm)
    assert cfg.hidden_dropout == 0.25 and cfg.attention_dropout == 0.25

    rng = np.random.default_rng(2)
    wav = rng.normal(0, 0.5, (2, 900)).astype(np.float32)

    n = 12
    tm.train()
    torch.manual_seed(42)
    with torch.no_grad():
        torch_draws = np.stack([
            tm(torch.tensor(wav)).last_hidden_state.numpy() for _ in range(n)
        ])
    ours_draws = np.stack([
        np.asarray(hub.hubert_encode(params, cfg, jnp.asarray(wav), None,
                                     dropout_rng=jax.random.PRNGKey(i))[0])
        for i in range(n)
    ])

    tm.eval()
    with torch.no_grad():
        eval_out = tm(torch.tensor(wav)).last_hidden_state.numpy()

    # expectation: the mean over draws approaches the eval output for both
    scale = np.abs(eval_out).mean()
    assert np.abs(ours_draws.mean(0) - eval_out).mean() / scale < 0.5
    assert np.abs(torch_draws.mean(0) - eval_out).mean() / scale < 0.5

    # variance: aggregate across-draw std must match torch within 25%
    std_ours = ours_draws.std(0).mean()
    std_torch = torch_draws.std(0).mean()
    assert 0.75 < std_ours / std_torch < 1.33, (std_ours, std_torch)


def test_pooling_dropout_train_eval():
    from aat_tpu.models.aslm import PoolingConfig, init_aslm_params, AslmConfig
    from aat_tpu.models.aslm import pooling_forward

    cfg = AslmConfig(
        projection_type="transformer_encoder",
        audio_encoder_hidden=16, lm_hidden=16,
        pooling=PoolingConfig(hidden_dim=16, num_heads=2, num_layers=2,
                              ffn_dim=32, max_positions=8),
        dropout=0.3,
    )
    params = init_aslm_params(0, cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (3, 6, 16)).astype(np.float32))
    mask = jnp.asarray(np.ones((3, 6), np.int32))

    e1 = pooling_forward(params["pooling"], cfg.pooling, x, mask)
    e2 = pooling_forward(params["pooling"], cfg.pooling, x, mask)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    t1 = pooling_forward(params["pooling"], cfg.pooling, x, mask,
                         dropout_rng=jax.random.PRNGKey(1), dropout_rate=0.3)
    t2 = pooling_forward(params["pooling"], cfg.pooling, x, mask,
                         dropout_rng=jax.random.PRNGKey(2), dropout_rate=0.3)
    assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 1e-6

    draws = np.stack([
        np.asarray(pooling_forward(params["pooling"], cfg.pooling, x, mask,
                                   dropout_rng=jax.random.PRNGKey(i),
                                   dropout_rate=0.3))
        for i in range(32)
    ])
    scale = np.abs(np.asarray(e1)).mean()
    assert np.abs(draws.mean(0) - np.asarray(e1)).mean() / scale < 0.5


@pytest.mark.slow
def test_trainer_grad_step_applies_dropout():
    """End-to-end plumbing: with encoder dropout configured, different train
    steps see different dropout masks (losses differ on identical data);
    the eval step stays deterministic."""
    import dataclasses as dc

    from aat_tpu.models import llama as llm
    from aat_tpu.models.aslm import AslmConfig, AslmModel
    from aat_tpu.training.config import TrainingConfig
    from aat_tpu.training.trainer import AATTrainer

    audio_cfg = dataclasses.replace(
        hub.tiny_test_config(), hidden_dropout=0.3, attention_dropout=0.3
    )
    config = AslmConfig(projection_type="linear", audio_encoder_hidden=32,
                        lm_hidden=32, projection_hidden=48)
    model = AslmModel(config, audio_cfg, llm.tiny_test_config())
    params = model.init_params(jax.random.PRNGKey(0))
    tcfg = TrainingConfig(
        learning_rate=0.0, warmup_steps=1, max_steps=10,
        gradient_accumulation_steps=1, train_audio_encoder=True,
        train_lm_decoder=False, compute_dtype="float32",
        logging_steps=1, eval_steps=0, save_steps=0,
        output_dir="/tmp/aat_tpu_dropout_test",
    )
    trainer = AATTrainer(model, params, tcfg)

    rng = np.random.default_rng(4)
    batch = {
        "batched_segments": rng.normal(0, 0.3, (2, 2, 400)).astype(np.float32),
        "segments_waveforms_mask": np.ones((2, 2, 400), np.int32),
        "segments_boarders_attention_mask": np.ones((2, 2), np.int32),
        "input_ids": rng.integers(1, 100, (2, 6)),
        "attention_mask": np.ones((2, 6), np.int32),
        "input_ids_attention_mask": np.ones((2, 6), np.int32),
    }
    # lr=0: params never change, so loss differences come from dropout alone
    m1 = trainer.training_step([batch])
    m2 = trainer.training_step([batch])
    assert m1["train/loss"] != m2["train/loss"]

    sb = trainer._shard_batch(batch)
    l1, _ = trainer._eval_step(trainer.state.params, sb)
    l2, _ = trainer._eval_step(trainer.state.params, sb)
    assert float(l1) == float(l2)
