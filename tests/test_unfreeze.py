"""Mid-run LM unfreeze: decoder params frozen before, trained after
(reference unfreeze_lm_at_epoch, src/aat/training/config.py:44)."""

import numpy as np
import pytest

import jax

from tests.test_training import make_segmented_batch, tiny_model

from aat_tpu.training.config import TrainingConfig
from aat_tpu.training.trainer import AATTrainer


@pytest.mark.slow
def test_unfreeze_lm_decoder_mid_run(tmp_path):
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(9))
    cfg = TrainingConfig(
        learning_rate=1e-3, warmup_steps=1, max_steps=100,
        gradient_accumulation_steps=1, compute_dtype="float32",
        train_audio_encoder=True, train_lm_decoder=False,
        logging_steps=1000, eval_steps=0, save_steps=0,
        output_dir=str(tmp_path),
    )
    t = AATTrainer(model, params, cfg)
    rng = np.random.default_rng(9)
    batch = make_segmented_batch(rng)

    def lm_kernel():
        return np.asarray(t.state.params["lm_decoder"]["layers"][0]["mlp"]["gate"]["kernel"])

    before = lm_kernel()
    t.training_step([batch])
    np.testing.assert_array_equal(lm_kernel(), before)  # frozen: unchanged

    t.unfreeze_lm_decoder()
    t.training_step([batch])
    assert np.abs(lm_kernel() - before).max() > 0  # now training
