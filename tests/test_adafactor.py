"""Adafactor parity: the reference vendors the fairseq Adafactor
(reference optimizers.py:6-208) whose algorithm is identical to
``transformers.optimization.Adafactor`` — that installed public copy is the
oracle here. Defaults under test: relative_step=True (lr=None),
scale_parameter=True, clip_threshold=1.0, decay_rate=-0.8, eps (1e-30, 1e-3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from aat_tpu.training import optim as optim_lib


def test_adafactor_matches_fairseq_oracle():
    torch = pytest.importorskip("torch")
    from transformers.optimization import Adafactor

    rng = np.random.default_rng(0)
    w0 = rng.normal(0, 0.5, (8, 16)).astype(np.float32)
    b0 = rng.normal(0, 0.5, (16,)).astype(np.float32)
    steps = 12
    gw = [rng.normal(0, 0.1, w0.shape).astype(np.float32) for _ in range(steps)]
    gb = [rng.normal(0, 0.1, b0.shape).astype(np.float32) for _ in range(steps)]

    # torch oracle
    tw = torch.nn.Parameter(torch.tensor(w0))
    tb = torch.nn.Parameter(torch.tensor(b0))
    opt = Adafactor([tw, tb], lr=None, relative_step=True,
                    scale_parameter=True, warmup_init=False)
    for i in range(steps):
        opt.zero_grad()
        tw.grad = torch.tensor(gw[i])
        tb.grad = torch.tensor(gb[i])
        opt.step()

    # our optax path
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    tx = optim_lib.adafactor()
    state = tx.init(params)
    for i in range(steps):
        grads = {"w": jnp.asarray(gw[i]), "b": jnp.asarray(gb[i])}
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["b"]), tb.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_adafactor_freeze_mask():
    params = {"a": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    freeze = {"a": True, "b": False}  # b frozen
    tx = optim_lib.adafactor(freeze=freeze)
    state = tx.init(params)
    grads = {"a": jnp.full((4, 4), 0.1), "b": jnp.full((4,), 0.1)}
    updates, _ = tx.update(grads, state, params)
    assert np.abs(np.asarray(updates["a"])).max() > 0
    np.testing.assert_array_equal(np.asarray(updates["b"]), 0.0)


@pytest.mark.slow
def test_trainer_adafactor_end_to_end():
    """optimizer='adafactor' through AATTrainer: losses finite and falling."""
    from aat_tpu.models import hubert as hub
    from aat_tpu.models import llama as llm
    from aat_tpu.models.aslm import AslmConfig, AslmModel
    from aat_tpu.training.config import TrainingConfig
    from aat_tpu.training.trainer import AATTrainer

    config = AslmConfig(projection_type="linear", audio_encoder_hidden=32,
                        lm_hidden=32, projection_hidden=48)
    model = AslmModel(config, hub.tiny_test_config(), llm.tiny_test_config())
    params = model.init_params(jax.random.PRNGKey(0))
    tcfg = TrainingConfig(
        optimizer="adafactor", learning_rate=None,
        warmup_steps=0, max_steps=8, gradient_accumulation_steps=1,
        train_audio_encoder=True, train_lm_decoder=False,
        compute_dtype="float32", logging_steps=1, eval_steps=0, save_steps=0,
        output_dir="/tmp/aat_tpu_adafactor",
    )
    trainer = AATTrainer(model, params, tcfg)
    rng = np.random.default_rng(1)
    batch = {
        "batched_segments": rng.normal(0, 0.3, (2, 2, 400)).astype(np.float32),
        "segments_waveforms_mask": np.ones((2, 2, 400), np.int32),
        "segments_boarders_attention_mask": np.ones((2, 2), np.int32),
        "input_ids": rng.integers(1, 100, (2, 6)),
        "attention_mask": np.ones((2, 6), np.int32),
        "input_ids_attention_mask": np.ones((2, 6), np.int32),
    }
    losses = [trainer.training_step([batch])["train/loss"] for _ in range(6)]
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
