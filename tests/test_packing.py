"""Sequence packing (block-diagonal attention over packed equal-length
utterances): kernel masking parity, per-utterance rotary positions, and the
trainer-level loss equivalence packed-vs-unpacked.

The reference starves its big-LM finetune at short caption lengths (Qwen at
batch 40, src/aat/training/trainer.py:50,79 — each row ~96 tokens); packing
folds P utterances per decoder row so the weight traffic amortizes over P×
more tokens with IDENTICAL math. Pallas runs in interpret mode on CPU —
tiny shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aat_tpu.ops.attention import _reference_attention, flash_attention


def _hand_packed_reference(q, k, v, mask, pack_len, sm_scale):
    """Oracle: run each utterance's slice through plain causal attention
    and concatenate — the definition of packing."""
    t = q.shape[2]
    outs = []
    for s0 in range(0, t, pack_len):
        sl = slice(s0, s0 + pack_len)
        outs.append(_reference_attention(
            q[:, :, sl], k[:, :, sl], v[:, :, sl], mask[:, sl], True,
            sm_scale))
    return jnp.concatenate(outs, axis=2)


def test_reference_pack_matches_per_utterance():
    rng = np.random.default_rng(0)
    b, h, t, d, pack_len = 2, 2, 24, 8, 8
    q = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32))
    mask = np.ones((b, t), np.int32)
    mask[1, 5:8] = 0   # pad inside utterance 0
    mask[0, 20:] = 0   # pad at the tail of utterance 2
    mask = jnp.asarray(mask)
    sm = d ** -0.5
    got = _reference_attention(q, k, v, mask, True, sm, pack_len=pack_len)
    ref = _hand_packed_reference(q, k, v, mask, pack_len, sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("pack_len", [64, 80])
def test_flash_pack_matches_reference(monkeypatch, pack_len):
    """Multi-block grids with pack boundaries both aligned (64) and
    straddling (80) the 128-blocks — forward and all three grads, fused
    triangular backward included."""
    import aat_tpu.ops.attention as attn_mod

    monkeypatch.setattr(attn_mod, "_MAX_BLOCK", 128)
    monkeypatch.setattr(attn_mod, "_BLOCK_Q", 128)
    monkeypatch.setattr(attn_mod, "_BLOCK_K", 128)
    monkeypatch.setattr(attn_mod, "_FUSED_BLOCKS_CAUSAL", (128, 128))
    rng = np.random.default_rng(3)
    b, h, t, d = 2, 2, 320, 8
    q = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32))
    mask = np.ones((b, t), np.int32)
    mask[1, 100:128] = 0
    mask = jnp.asarray(mask)

    ours = np.asarray(flash_attention(q, k, v, mask, True, None,
                                      pack_len=pack_len))
    ref = np.asarray(_reference_attention(q, k, v, mask, True, d ** -0.5,
                                          pack_len=pack_len))
    np.testing.assert_allclose(ours, ref, atol=2e-5)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, mask, True, None, pack_len=pack_len) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(
            q, k, v, mask, True, d ** -0.5, pack_len=pack_len) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_llama_packed_matches_unpacked(monkeypatch, impl):
    """AslmModel.forward(pack=P) must produce the SAME logits as the
    unpacked call: block-diagonal masking + restarting rotary positions
    make packing a pure layout transform."""
    import dataclasses

    import aat_tpu.ops.attention as attn_mod
    from aat_tpu.models import hubert as hub
    from aat_tpu.models import llama as llm
    from aat_tpu.models.aslm import AslmConfig, AslmModel

    if impl == "pallas":
        monkeypatch.setattr(attn_mod, "MIN_PALLAS_SEQ_LEN", 1)
    lm_cfg = llm.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
        attention_impl=impl,
    )
    audio_cfg = hub.tiny_test_config()
    cfg = AslmConfig(projection_type="linear", audio_encoder_hidden=32,
                     lm_hidden=32, projection_hidden=64)
    model = AslmModel(cfg, audio_cfg, lm_cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    b, t, h = 4, 12, 32
    embeds = jnp.asarray(rng.normal(0, 1, (b, t, h)).astype(np.float32))
    mask = np.ones((b, t), np.int32)
    mask[2, 9:] = 0
    mask = jnp.asarray(mask)

    unpacked = model.forward(params, embeds, mask)
    packed = model.forward(params, embeds, mask, pack=2)
    assert packed.shape == unpacked.shape
    # compare only valid positions (padded rows see different garbage)
    valid = np.asarray(mask).astype(bool)
    diff = np.abs(np.asarray(packed) - np.asarray(unpacked))[valid]
    assert diff.max() < 1e-4, f"max diff {diff.max()}"


def test_trainer_lm_pack_loss_matches():
    """One f32 segmented training step with lm_pack=2 must produce the same
    loss and (numerically) the same updated params as lm_pack=1."""
    from aat_tpu.models import hubert as hub
    from aat_tpu.models import llama as llm
    from aat_tpu.models.aslm import AslmConfig, AslmModel
    from aat_tpu.training.config import TrainingConfig
    from aat_tpu.training.trainer import AATTrainer

    audio_cfg = hub.tiny_test_config()
    lm_cfg = llm.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    cfg = AslmConfig(projection_type="linear",
                     audio_encoder_hidden=audio_cfg.hidden_size,
                     lm_hidden=32, projection_hidden=64)

    rng = np.random.default_rng(0)
    batch = {
        "batched_segments": rng.normal(0, 0.3, (4, 2, 400)).astype(np.float32),
        "segments_waveforms_mask": np.ones((4, 2, 400), np.int32),
        "segments_boarders_attention_mask": np.ones((4, 2), np.int32),
        "input_ids": rng.integers(1, 64, (4, 8)),
        "attention_mask": np.ones((4, 8), np.int32),
        "input_ids_attention_mask": np.ones((4, 8), np.int32),
    }

    losses, leaves = [], []
    for pack in (1, 2):
        model = AslmModel(cfg, audio_cfg, lm_cfg)
        tcfg = TrainingConfig(
            learning_rate=1e-3, warmup_steps=2, max_steps=10,
            gradient_accumulation_steps=1, train_audio_encoder=True,
            train_lm_decoder=True, compute_dtype="float32", lm_pack=pack,
            eval_steps=0, save_steps=0, logging_steps=1000,
        )
        trainer = AATTrainer(model, model.init_params(jax.random.PRNGKey(0)),
                             tcfg)
        m = trainer.training_step([batch])
        losses.append(float(m["train/loss"]))
        leaves.append(jax.tree.leaves(jax.device_get(trainer.state.params)))
    assert abs(losses[0] - losses[1]) < 1e-5, losses
    for a, b in zip(*leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pack", [1, 2])
def test_caption_sliced_logits_match_full(pack):
    """forward(caption_len=C) must equal the caption window of the full
    logits exactly — the slice happens before final_norm + lm_head, so
    every returned element is the same dot product (round 5; this is the
    fast path that keeps vocab-width tensors off the audio positions)."""
    from aat_tpu.models import hubert as hub
    from aat_tpu.models import llama as llm
    from aat_tpu.models.aslm import AslmConfig, AslmModel
    from aat_tpu.training.trainer import caption_cross_entropy

    lm_cfg = llm.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    audio_cfg = hub.tiny_test_config()
    cfg = AslmConfig(projection_type="linear", audio_encoder_hidden=32,
                     lm_hidden=32, projection_hidden=64)
    model = AslmModel(cfg, audio_cfg, lm_cfg)
    params = model.init_params(jax.random.PRNGKey(1))

    rng = np.random.default_rng(1)
    b, t, h, cl = 4, 12, 32, 5
    embeds = jnp.asarray(rng.normal(0, 1, (b, t, h)).astype(np.float32))
    mask = jnp.ones((b, t), jnp.int32)

    full = model.forward(params, embeds, mask, pack=pack)
    sliced = model.forward(params, embeds, mask, pack=pack, caption_len=cl)
    assert sliced.shape == (b, cl - 1, lm_cfg.vocab_size)
    window = np.asarray(full[:, t - cl : t - 1, :])
    np.testing.assert_allclose(np.asarray(sliced), window, atol=1e-5)

    ids = jnp.asarray(rng.integers(1, 64, (b, cl)))
    id_mask = jnp.ones((b, cl), jnp.int32)
    loss_full = float(caption_cross_entropy(full, ids, id_mask))
    loss_sliced = float(caption_cross_entropy(sliced, ids, id_mask))
    assert abs(loss_full - loss_sliced) < 1e-6, (loss_full, loss_sliced)
