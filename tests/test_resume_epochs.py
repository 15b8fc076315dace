"""Cross-epoch resume: a run killed mid-epoch-2 of 3 must, after resume,
consume exactly the batches the uninterrupted run would (HF Trainer
``resume_from_checkpoint`` semantics, which the reference inherits via
trainer_train.py:156-162) and reach the same final parameters."""

import numpy as np
import pytest

import jax

from tests.test_training import make_segmented_batch, tiny_model

from aat_tpu.data.dataloaders import BatchIterator
from aat_tpu.training.config import TrainingConfig
from aat_tpu.training.trainer import AATTrainer, read_checkpoint_meta


def collate(items):
    """Deterministic batch per item-id set; carries the ids for tracking."""
    ids = np.asarray(sorted(int(i) for i in items), np.int64)
    rng = np.random.default_rng(ids)
    b = make_segmented_batch(rng, bs=len(ids), n_seg=2, frames=200, text_len=5)
    b["item_ids"] = ids
    return b


def make_trainer(tmp_path, max_steps, save_steps=0):
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))
    cfg = TrainingConfig(
        learning_rate=3e-3, warmup_steps=2, max_steps=max_steps,
        gradient_accumulation_steps=1, train_audio_encoder=True,
        train_lm_decoder=True, compute_dtype="float32",
        logging_steps=1000, eval_steps=0, save_steps=save_steps,
        save_total_limit=0, output_dir=str(tmp_path),
    )
    return AATTrainer(model, params, cfg)


class SimulatedKill(Exception):
    """Raised mid-run to model a process dying (the LR schedule must NOT
    change between the killed and uninterrupted runs, so max_steps stays
    identical and the kill is an exception)."""


def run_epochs(trainer, train_iter, n_epochs, consumed, start_epoch=0,
               fast_forward=False, kill_at_step=None):
    """The scripts/train.py epoch loop in miniature, recording the item ids
    each training step actually consumed into ``consumed``."""
    orig = trainer.training_step

    def recording_step(mbs, **kw):
        consumed.extend(tuple(int(i) for i in mb["item_ids"]) for mb in mbs)
        out = orig(mbs, **kw)
        if kill_at_step is not None and trainer.state.step >= kill_at_step:
            raise SimulatedKill()
        return out

    trainer.training_step = recording_step
    for epoch in range(n_epochs):
        if epoch < start_epoch:
            continue
        train_iter.set_epoch(epoch)
        trainer.train(train_iter, fast_forward=fast_forward and epoch == start_epoch)
    return consumed


@pytest.mark.slow
def test_resume_mid_epoch_consumes_exact_batches(tmp_path):
    items = list(range(8))  # bs 2 -> 4 steps/epoch, 3 epochs = 12 steps

    def make_iter():
        return BatchIterator(items, collate, batch_size=2, shuffle=True,
                             drop_last=True, seed=7, prefetch=0)

    # A: the uninterrupted 3-epoch run
    tr_a = make_trainer(tmp_path / "a", max_steps=200)
    consumed_a = run_epochs(tr_a, make_iter(), 3, [])
    assert len(consumed_a) == 12
    # shuffle must differ across epochs (set_epoch drives the permutation)
    assert consumed_a[0:4] != consumed_a[4:8]

    # B: killed during step 7 (mid-epoch-2, i.e. epoch index 1) — the last
    # completed checkpoint is step 6, so the resume must replay step 7's data
    tr_b = make_trainer(tmp_path / "b", max_steps=200, save_steps=2)
    consumed_b: list = []
    with pytest.raises(SimulatedKill):
        run_epochs(tr_b, make_iter(), 3, consumed_b, kill_at_step=7)
    assert len(consumed_b) == 7
    assert consumed_b == consumed_a[:7]
    ckpt = str(tmp_path / "b" / "checkpoint-6")
    meta = read_checkpoint_meta(ckpt)
    assert meta["step"] == 6 and meta["train_lm_decoder"] is True

    # C: fresh process resumes from checkpoint-6 — must skip epoch 0
    # entirely, fast-forward 2 steps into epoch 1, and finish epochs 1-2
    tr_c = make_trainer(tmp_path / "c", max_steps=200)
    tr_c.restore_checkpoint(ckpt)
    it = make_iter()
    steps_per_epoch = len(it)  # accum=1
    start_epoch = tr_c.state.step // steps_per_epoch
    assert start_epoch == 1
    consumed_c = run_epochs(tr_c, it, 3, [], start_epoch=start_epoch,
                            fast_forward=True)
    assert consumed_c == consumed_a[6:]
    assert tr_c.state.step == 12

    # and the resumed run reproduces the uninterrupted run's parameters
    flat_a = jax.tree.leaves(jax.device_get(tr_a.state.params))
    flat_c = jax.tree.leaves(jax.device_get(tr_c.state.params))
    for xa, xc in zip(flat_a, flat_c):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xc), atol=1e-7)
