"""Self-describing exports: ``save_pretrained`` writes config.json with the
Aslm/encoder/LM configs + tokenizer id; ``load_pretrained(path)`` rebuilds
the model in a FRESH PROCESS without hand-supplied configs and reproduces
generation (reference: HF ``PreTrainedModel.save_pretrained`` persists
config.json, modeling_aslm.py:387-393)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from tests.test_training import make_segmented_batch, tiny_model

from aat_tpu.training.config import TrainingConfig
from aat_tpu.training.trainer import AATTrainer

_LOAD_AND_GENERATE = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from aat_tpu.models.build import load_pretrained
from aat_tpu.training.config import TrainingConfig
from aat_tpu.training.generate import GenerationConfig
from aat_tpu.training.trainer import AATTrainer

model, params = load_pretrained({export!r})
cfg = TrainingConfig(
    train_audio_encoder=True, train_lm_decoder=True, compute_dtype="float32",
    learning_rate=1e-3, output_dir={out!r},
)
trainer = AATTrainer(model, params, cfg,
                     generation_config=GenerationConfig(num_beams=2))
batch = dict(np.load({batch!r}))
out = trainer.generate_for_batch(batch, max_new_tokens=8)
np.save({ids!r}, out)
"""


def _add_prefix(batch):
    bs = batch["input_ids"].shape[0]
    batch["prefix_input_ids"] = np.full((bs, 1), 1, np.int64)
    batch["prefix_attention_mask"] = np.ones((bs, 1), np.int64)
    return batch


@pytest.mark.slow
def test_export_fresh_process_roundtrip(tmp_path):
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(5))
    cfg = TrainingConfig(
        learning_rate=1e-3, warmup_steps=1, max_steps=10,
        gradient_accumulation_steps=1, train_audio_encoder=True,
        train_lm_decoder=True, compute_dtype="float32",
        logging_steps=1000, eval_steps=0, save_steps=0,
        output_dir=str(tmp_path / "run"),
    )
    from aat_tpu.training.generate import GenerationConfig

    trainer = AATTrainer(model, params, cfg,
                         generation_config=GenerationConfig(num_beams=2))
    rng = np.random.default_rng(3)
    batch = _add_prefix(make_segmented_batch(rng, bs=2, n_seg=2, frames=200))
    trainer.training_step([batch])  # exported weights differ from init

    export = str(tmp_path / "export")
    trainer.save_pretrained(export)

    # config.json is complete and names the tokenizer
    with open(os.path.join(export, "config.json")) as f:
        desc = json.load(f)
    assert desc["model_type"] == "aslm"
    assert set(desc["saved_subtrees"]) == {"adapter", "audio_encoder", "lm_decoder"}
    assert desc["lm_pretrained_model"] == cfg.lm_pretrained_model
    assert desc["aslm"]["projection_type"] == model.config.projection_type
    assert desc["lm_config"]["hidden_size"] == model.lm_config.hidden_size

    want = trainer.generate_for_batch(batch, max_new_tokens=8)

    # fresh process: rebuild from the export alone and generate
    batch_path = str(tmp_path / "batch.npz")
    np.savez(batch_path, **batch)
    ids_path = str(tmp_path / "generated.npy")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _LOAD_AND_GENERATE.format(
        repo=repo, export=export, out=str(tmp_path / "run2"),
        batch=batch_path, ids=ids_path,
    )
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [sys.executable, "-c", script], env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    got = np.load(ids_path)
    np.testing.assert_array_equal(np.asarray(want), got)


def test_load_pretrained_partial_random_fallback(tmp_path):
    """An adapter-only export (frozen encoder/decoder) loads with
    random-init frozen trees (_keys_to_ignore_on_load_missing)."""
    from aat_tpu.models.build import load_pretrained

    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(5))
    cfg = TrainingConfig(
        learning_rate=1e-3, train_audio_encoder=False, train_lm_decoder=False,
        compute_dtype="float32", logging_steps=1000, eval_steps=0,
        save_steps=0, output_dir=str(tmp_path / "run"),
    )
    trainer = AATTrainer(model, params, cfg)
    export = str(tmp_path / "export")
    trainer.save_pretrained(export)

    model2, params2 = load_pretrained(export)
    assert set(params2) == {"audio_encoder", "adapter", "lm_decoder"}
    # adapter restored exactly
    a0 = jax.tree.leaves(jax.device_get(trainer.state.params["adapter"]))
    a1 = jax.tree.leaves(params2["adapter"])
    for x, y in zip(a0, a1):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert model2.lm_config == model.lm_config
    assert model2.config == model.config
