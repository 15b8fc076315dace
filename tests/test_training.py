"""Training stack tests: LR schedule parity, decay/freeze masks, a tiny
overfit run (loss must fall), and checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aat_tpu.models import hubert as hub
from aat_tpu.models import llama as llm
from aat_tpu.models.aslm import AslmConfig, AslmModel, PoolingConfig
from aat_tpu.parallel import mesh as mesh_lib
from aat_tpu.training import optim as optim_lib
from aat_tpu.training.config import TrainingConfig
from aat_tpu.training.lr_schedule import warmup_linear_schedule
from aat_tpu.training.trainer import AATTrainer, caption_cross_entropy


def reference_lr_oracle(step_count, warmup, max_steps, base_lr, start_lr_from=1e-5):
    """The reference WarmupLRScheduler.get_lr rule (lr_scheduler.py:44-61)."""
    if step_count > max_steps:
        return start_lr_from
    if step_count > warmup:
        annealing_step = step_count - warmup
        total = max_steps - warmup
        dec = (base_lr - start_lr_from) / total
        return base_lr - annealing_step * dec
    return base_lr * step_count / warmup


def test_lr_schedule_matches_reference():
    sched = warmup_linear_schedule(1e-4, 10, 100, 1e-5)
    for step in [0, 1, 5, 9, 10, 50, 99, 100, 150]:
        ours = float(sched(step))
        # torch _step_count starts at 1 → our step 0 is its step 1
        ref = reference_lr_oracle(step + 1, 10, 100, 1e-4)
        assert abs(ours - ref) < 1e-9 + 1e-5 * abs(ref), (step, ours, ref)


def test_decay_mask_rules():
    params = {
        "layer": {
            "kernel": jnp.zeros((4, 4)),
            "bias": jnp.zeros((4,)),
            "layer_norm": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))},
            "embedding": jnp.zeros((10, 4)),
        }
    }
    mask = optim_lib.decay_mask(params)
    assert mask["layer"]["kernel"] is True
    assert mask["layer"]["bias"] is False
    assert mask["layer"]["layer_norm"]["scale"] is False
    assert mask["layer"]["layer_norm"]["bias"] is False
    assert mask["layer"]["embedding"] is True


def test_freeze_mask_blocks_updates():
    params = {
        "audio_encoder": {"w": jnp.ones((2, 2))},
        "adapter": {"w": jnp.ones((2, 2))},
        "lm_decoder": {"w": jnp.ones((2, 2))},
    }
    freeze = optim_lib.trainable_mask(
        params, train_audio_encoder=False, train_lm_decoder=False
    )
    tx = optim_lib.adamw_grouped(1e-2, params, freeze=freeze)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_array_equal(np.asarray(updates["audio_encoder"]["w"]), 0.0)
    np.testing.assert_array_equal(np.asarray(updates["lm_decoder"]["w"]), 0.0)
    assert np.abs(np.asarray(updates["adapter"]["w"])).max() > 0


def test_fused_guarded_adamw_matches_chain():
    """fused_guarded_adamw must reproduce guard_nonfinite(adamw_grouped(...))
    step for step — finite, clipped, non-finite, and frozen-leaf cases. The
    fused version exists purely for the kernel fusion (one elementwise pass
    per leaf instead of the optax chain + post-hoc guard blends)."""
    params = {
        "audio_encoder": {"kernel": jnp.asarray(
            np.random.default_rng(0).normal(0, 1, (8, 8)), jnp.float32)},
        "adapter": {
            "kernel": jnp.asarray(
                np.random.default_rng(1).normal(0, 1, (8, 4)), jnp.float32),
            "bias": jnp.asarray(
                np.random.default_rng(2).normal(0, 1, (4,)), jnp.float32),
            "norm": {"scale": jnp.ones((4,), jnp.float32)},
        },
        "lm_decoder": {"kernel": jnp.ones((4, 4), jnp.float32)},
    }
    freeze = optim_lib.trainable_mask(
        params, train_audio_encoder=True, train_lm_decoder=False)
    lr = lambda step: 1e-2 / (1.0 + step.astype(jnp.float32))  # noqa: E731

    for clip in (None, 0.5):
        ref = optim_lib.guard_nonfinite(
            optim_lib.adamw_grouped(lr, params, weight_decay=0.1,
                                    freeze=freeze),
            clip_norm=clip)
        fused = optim_lib.fused_guarded_adamw(
            lr, params, weight_decay=0.1, clip_norm=clip, freeze=freeze)
        p_ref, s_ref = dict(params), ref.init(params)
        p_fused, s_fused = dict(params), fused.init(params)
        rng = np.random.default_rng(3)
        for step in range(6):
            if step == 2:  # a NaN step must drop identically on both
                grads = jax.tree.map(lambda p: p * jnp.nan, params)
            elif step == 4 and clip is not None:  # force the clip branch
                grads = jax.tree.map(lambda p: p * 100.0, params)
            else:
                grads = jax.tree.map(
                    lambda p: jnp.asarray(
                        rng.normal(0, 1, p.shape), p.dtype), params)
            u_ref, s_ref = ref.update(grads, s_ref, p_ref)
            u_fused, s_fused = fused.update(grads, s_fused, p_fused)
            import optax

            p_ref = optax.apply_updates(p_ref, u_ref)
            p_fused = optax.apply_updates(p_fused, u_fused)
            for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fused)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-6, atol=1e-7)
        assert float(s_fused.total_notfinite) == float(
            s_ref.total_notfinite) == 1.0
        # frozen leaves carry no state in either layout
        assert not jax.tree.leaves(
            jax.tree.map(lambda x: x,
                         s_fused.mu["lm_decoder"],
                         is_leaf=lambda x: isinstance(x, optax.MaskedNode))
        ) or isinstance(s_fused.mu["lm_decoder"]["kernel"], optax.MaskedNode)


def tiny_model():
    config = AslmConfig(
        projection_type="linear",
        audio_encoder_embeddings_seq_len=1,
        audio_encoder_hidden=32,
        lm_hidden=32,
        projection_hidden=48,
        pooling=PoolingConfig(hidden_dim=32, num_heads=4, num_layers=1,
                              ffn_dim=64, max_positions=16),
    )
    return AslmModel(config, hub.tiny_test_config(), llm.tiny_test_config())


def make_segmented_batch(rng, bs=2, n_seg=3, frames=400, text_len=6, vocab=100):
    return {
        "batched_segments": rng.normal(0, 0.3, (bs, n_seg, frames)).astype(np.float32),
        "segments_waveforms_mask": np.ones((bs, n_seg, frames), np.int32),
        "segments_boarders_attention_mask": np.ones((bs, n_seg), np.int32),
        "input_ids": rng.integers(1, vocab, (bs, text_len)),
        "attention_mask": np.ones((bs, text_len), np.int32),
        "input_ids_attention_mask": np.ones((bs, text_len), np.int32),
    }


@pytest.fixture(scope="module")
def trainer():
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))
    cfg = TrainingConfig(
        learning_rate=3e-3,
        warmup_steps=2,
        max_steps=200,
        gradient_accumulation_steps=1,
        train_audio_encoder=True,
        train_lm_decoder=True,
        compute_dtype="float32",
        logging_steps=1000,
        eval_steps=0,
        save_steps=0,
        output_dir="/tmp/aat_tpu_test_ckpt",
    )
    return AATTrainer(model, params, cfg)


@pytest.mark.slow
def test_overfit_tiny_batch(trainer):
    rng = np.random.default_rng(0)
    batch = make_segmented_batch(rng)
    first = None
    last = None
    for _ in range(25):
        metrics = trainer.training_step([batch])
        if first is None:
            first = metrics["train/loss"]
        last = metrics["train/loss"]
    assert last < first * 0.5, f"loss did not fall: {first} -> {last}"
    assert "debug/audio_embeddings_norm_mean" in metrics
    assert "train/audio_tokens_emb_grad" in metrics
    assert metrics["train/audio_encdoer_grad_norm"] > 0


@pytest.mark.slow
def test_bf16_mixed_precision_step():
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(1))
    cfg = TrainingConfig(
        learning_rate=1e-3, warmup_steps=2, max_steps=50,
        gradient_accumulation_steps=1, train_lm_decoder=True,
        compute_dtype="bfloat16", logging_steps=1000, eval_steps=0, save_steps=0,
        output_dir="/tmp/aat_tpu_bf16_ckpt",
    )
    t = AATTrainer(model, params, cfg)
    rng = np.random.default_rng(1)
    batch = make_segmented_batch(rng)
    first = last = None
    for _ in range(10):
        m = t.training_step([batch])
        first = first if first is not None else m["train/loss"]
        last = m["train/loss"]
    assert np.isfinite(last)
    assert last < first  # learns in bf16
    # master params stay float32
    assert t.state.params["adapter"]["projection"]["in"]["kernel"].dtype == jnp.float32


def test_checkpoint_roundtrip(tmp_path, trainer):
    path = str(tmp_path / "ckpt-1")
    trainer.save_checkpoint(path)
    before = jax.tree.map(np.asarray, trainer.state.params["adapter"])
    step_before = trainer.state.step

    # perturb, then restore
    trainer.state.params["adapter"] = jax.tree.map(
        lambda x: x + 1.0, trainer.state.params["adapter"]
    )
    trainer.restore_checkpoint(path)
    after = jax.tree.map(np.asarray, trainer.state.params["adapter"])
    jax.tree.map(np.testing.assert_array_equal, before, after)
    assert trainer.state.step == step_before


def test_encoder_remat_policy_validated():
    import pytest as _pytest

    from aat_tpu.training.config import TrainingConfig as TC

    with _pytest.raises(ValueError, match="encoder_remat_policy"):
        TC(encoder_remat=True, encoder_remat_policy="selective")
    cfg = TC(encoder_remat=True, encoder_remat_policy="dots")
    assert cfg.encoder_remat_policy == "dots"


def test_build_audio_encoder_applies_remat(monkeypatch):
    """TrainingConfig.encoder_remat/_policy must land on the built
    HubertConfig (the CLI's only route to whole-utterance remat)."""
    from aat_tpu.models import build as build_mod
    from aat_tpu.models import hubert as hub
    from aat_tpu.training.config import TrainingConfig as TC

    monkeypatch.setattr(build_mod.hub, "hubert_large_config",
                        hub.tiny_test_config)
    _, cfg = build_mod.build_audio_encoder(
        TC(encoder_remat=True, encoder_remat_policy="dots"),
        pretrained=False)
    assert cfg.remat and cfg.remat_policy == "dots"
    _, cfg = build_mod.build_audio_encoder(TC(), pretrained=False)
    assert not cfg.remat


@pytest.mark.slow
def test_remat_matches_non_remat():
    import dataclasses

    from aat_tpu.models import hubert as hub

    cfg = hub.tiny_test_config()
    params = hub.init_hubert_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(0, 0.5, (2, 1200)).astype(np.float32))
    mask = jnp.ones((2, 1200), jnp.int32)

    out_a, _ = hub.hubert_encode(params, cfg, wav, mask)
    cfg_r = dataclasses.replace(cfg, remat=True)
    out_b, _ = hub.hubert_encode(params, cfg_r, wav, mask)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    # 'dots' policy (matmul outputs saved, elementwise-only recompute) must
    # be value- and gradient-identical to full remat and to no remat
    cfg_d = dataclasses.replace(cfg, remat=True, remat_policy="dots")
    out_c, _ = hub.hubert_encode(params, cfg_d, wav, mask)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_c), atol=1e-6)

    def loss_with(cfg_x):
        def loss(p):
            out, _ = hub.hubert_encode(p, cfg_x, wav, mask)
            return jnp.sum(out ** 2)
        return loss

    g_plain = jax.grad(loss_with(cfg))(params)
    g_dots = jax.grad(loss_with(cfg_d))(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_dots)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    # gradients flow through the rematerialized layers
    g = jax.grad(loss_with(cfg_r))(params)
    norm = optim_lib.global_norm(g)
    assert np.isfinite(float(norm)) and float(norm) > 0


def test_guard_folded_clip_matches_optax():
    """guard_nonfinite(clip_norm=c) must reproduce an in-chain
    optax.clip_by_global_norm(c) exactly — the fold exists purely to share
    the guard's global-norm pass (one grad-tree read instead of two)."""
    import optax

    params = {
        "a": jnp.arange(12, dtype=jnp.float32).reshape(3, 4) / 10,
        "b": jnp.ones((5,), jnp.float32),
    }
    adam = optax.scale_by_adam()
    for scale in (1.0, 100.0):  # below / above the clip threshold
        grads = jax.tree.map(lambda p: (p + 0.3) * scale, params)
        folded = optim_lib.guard_nonfinite(adam, clip_norm=0.5)
        chained = optax.chain(optax.clip_by_global_norm(0.5), adam)
        u1, _ = folded.update(grads, folded.init(params), params)
        u2, _ = chained.update(grads, chained.init(params), params)
        for l1, l2 in zip(jax.tree.leaves(u1), jax.tree.leaves(u2)):
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                       rtol=1e-6, atol=0)
    # non-finite grads: zero update, inner state untouched, count bumped
    bad = jax.tree.map(lambda p: p * jnp.nan, params)
    folded = optim_lib.guard_nonfinite(adam, clip_norm=0.5)
    st = folded.init(params)
    u, st2 = folded.update(bad, st, params)
    assert all(np.all(np.asarray(l) == 0) for l in jax.tree.leaves(u))
    assert float(st2.total_notfinite) == 1.0
    for l1, l2 in zip(jax.tree.leaves(st.inner_state),
                      jax.tree.leaves(st2.inner_state)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


@pytest.mark.slow
def test_nonfinite_loss_guard():
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(2))
    # poison one adapter weight to produce NaN losses
    params["adapter"]["projection"]["in"]["kernel"] = (
        params["adapter"]["projection"]["in"]["kernel"] * np.nan
    )
    cfg = TrainingConfig(
        learning_rate=1e-3, warmup_steps=2, max_steps=10,
        gradient_accumulation_steps=1, compute_dtype="float32",
        logging_steps=1000, eval_steps=0, save_steps=0,
        output_dir="/tmp/aat_tpu_nan_ckpt",
    )
    t = AATTrainer(model, params, cfg)
    before = np.asarray(t.state.params["adapter"]["projection"]["out"]["kernel"])
    rng = np.random.default_rng(3)
    # non-logging step (no host fetch): the in-graph guard must still hold —
    # the old host-side check only covered logging steps (24/25 duty-cycle hole)
    m = t.training_step([make_segmented_batch(rng)], fetch_metrics=False)
    assert m == {}
    mid = np.asarray(t.state.params["adapter"]["projection"]["out"]["kernel"])
    np.testing.assert_array_equal(before, mid)
    m = t.training_step([make_segmented_batch(rng)])
    assert m["train/skipped_nonfinite_total"] == 2.0
    after = np.asarray(t.state.params["adapter"]["projection"]["out"]["kernel"])
    np.testing.assert_array_equal(before, after)  # update was dropped


@pytest.mark.slow
def test_unfreeze_preserves_optimizer_moments(tmp_path):
    """unfreeze_lm_decoder must carry over accumulated Adam moments for the
    already-training subtrees (torch optimizers keep per-param state across a
    requires_grad flip) and add fresh state for the decoder."""
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(11))
    cfg = TrainingConfig(
        learning_rate=1e-3, warmup_steps=1, max_steps=100,
        gradient_accumulation_steps=1, compute_dtype="float32",
        train_audio_encoder=True, train_lm_decoder=False,
        logging_steps=1000, eval_steps=0, save_steps=0,
        output_dir=str(tmp_path),
    )
    t = AATTrainer(model, params, cfg)
    rng = np.random.default_rng(11)
    for _ in range(3):
        t.training_step([make_segmented_batch(rng)], fetch_metrics=False)

    def flat(state):
        return {
            jax.tree_util.keystr(p): np.asarray(leaf)
            for p, leaf in jax.tree_util.tree_flatten_with_path(state)[0]
            if hasattr(leaf, "shape")
        }

    old = flat(t.state.opt_state)
    assert any("adapter" in k and "mu" in k for k in old)
    t.unfreeze_lm_decoder()
    new = flat(t.state.opt_state)
    # every pre-unfreeze state leaf survives bit-identically
    for k, v in old.items():
        assert k in new, f"opt-state leaf vanished: {k}"
        np.testing.assert_array_equal(v, new[k], err_msg=k)
    # ...and the decoder now has (fresh) moment state
    added = [k for k in new if k not in old]
    assert any("lm_decoder" in k for k in added)
    # training still works after the merge
    m = t.training_step([make_segmented_batch(rng)])
    assert np.isfinite(m["train/loss"])


def test_partial_adapter_checkpoint_restore(tmp_path):
    """Adapter-only checkpoints restore against fresh encoder/decoder trees
    (the reference's _keys_to_ignore_on_load_missing semantics,
    modeling_aslm.py:100); exercised via build_model(from_pretrained_adapter)."""
    import orbax.checkpoint as ocp

    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(5))
    adapter = jax.tree.map(lambda x: np.asarray(x) + 0.5, params["adapter"])

    path = str(tmp_path / "adapter-ckpt")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(f"{path}/state", {"params": {"adapter": adapter}, "step": 7})
    ckptr.wait_until_finished()

    cfg = TrainingConfig(
        learning_rate=1e-3, warmup_steps=2, max_steps=10,
        gradient_accumulation_steps=1, compute_dtype="float32",
        logging_steps=1000, eval_steps=0, save_steps=0,
        output_dir=str(tmp_path),
    )
    t = AATTrainer(model, params, cfg)
    before_encoder = np.asarray(
        t.state.params["audio_encoder"]["feature_projection"]["projection"]["kernel"]
    )
    t.restore_checkpoint(path, partial=True)
    # adapter restored from checkpoint...
    np.testing.assert_allclose(
        np.asarray(t.state.params["adapter"]["audio_tokens_embeddings"]["embedding"]),
        np.asarray(adapter["audio_tokens_embeddings"]["embedding"]),
    )
    # ...encoder untouched (fresh build), step taken from checkpoint
    np.testing.assert_array_equal(
        np.asarray(
            t.state.params["audio_encoder"]["feature_projection"]["projection"]["kernel"]
        ),
        before_encoder,
    )
    assert t.state.step == 7


@pytest.mark.slow
def test_resume_is_bitwise_identical(tmp_path):
    """Train N steps → checkpoint → resume in a FRESH trainer → the final
    params and optimizer state match an uninterrupted run bit-for-bit
    (full-fidelity resume: params + opt state + step/schedule position)."""
    def fresh_trainer(outdir):
        model = tiny_model()
        params = model.init_params(jax.random.PRNGKey(21))
        cfg = TrainingConfig(
            learning_rate=1e-3, warmup_steps=2, max_steps=100,
            gradient_accumulation_steps=1, compute_dtype="float32",
            train_audio_encoder=True, train_lm_decoder=False,
            logging_steps=1000, eval_steps=0, save_steps=0,
            output_dir=outdir,
        )
        return AATTrainer(model, params, cfg)

    batches = [
        make_segmented_batch(np.random.default_rng(100 + i)) for i in range(6)
    ]

    # uninterrupted
    ta = fresh_trainer(str(tmp_path / "a"))
    for b in batches:
        ta.training_step([b], fetch_metrics=False)

    # interrupted at step 3 + resumed in a fresh trainer
    tb = fresh_trainer(str(tmp_path / "b"))
    for b in batches[:3]:
        tb.training_step([b], fetch_metrics=False)
    ckpt = tb.save_checkpoint(str(tmp_path / "b" / "ckpt"))
    tc = fresh_trainer(str(tmp_path / "c"))
    tc.restore_checkpoint(ckpt)
    assert tc.state.step == 3
    for b in batches[3:]:
        tc.training_step([b], fetch_metrics=False)

    flat_a = jax.tree_util.tree_flatten_with_path(ta.state.params)[0]
    flat_c = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(tc.state.params)[0]
    }
    for p, v in flat_a:
        np.testing.assert_array_equal(
            np.asarray(v), flat_c[jax.tree_util.keystr(p)],
            err_msg=jax.tree_util.keystr(p),
        )
    # optimizer state matches too
    oa = jax.tree_util.tree_flatten_with_path(ta.state.opt_state)[0]
    oc = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(tc.state.opt_state)[0]
        if hasattr(v, "shape")
    }
    for p, v in oa:
        if hasattr(v, "shape"):
            np.testing.assert_array_equal(
                np.asarray(v), oc[jax.tree_util.keystr(p)],
                err_msg=jax.tree_util.keystr(p),
            )


def test_save_pretrained_filters_frozen_submodules(tmp_path):
    """save_pretrained omits frozen submodules (reference filtered
    save_pretrained, modeling_aslm.py:387-393); restore merges the saved
    subtrees against a fresh build."""
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(23))
    cfg = TrainingConfig(
        learning_rate=1e-3, warmup_steps=2, max_steps=10,
        gradient_accumulation_steps=1, compute_dtype="float32",
        train_audio_encoder=True, train_lm_decoder=False,
        logging_steps=1000, eval_steps=0, save_steps=0,
        output_dir=str(tmp_path),
    )
    t = AATTrainer(model, params, cfg)
    path = t.save_pretrained(str(tmp_path / "export"))

    import orbax.checkpoint as ocp

    saved = ocp.StandardCheckpointer().restore(f"{path}/state")
    assert set(saved["params"]) == {"adapter", "audio_encoder"}  # lm frozen

    # restoring into a fresh trainer keeps the fresh lm_decoder
    t2 = AATTrainer(model, model.init_params(jax.random.PRNGKey(24)), cfg)
    fresh_lm = np.asarray(
        t2.state.params["lm_decoder"]["layers"][0]["mlp"]["gate"]["kernel"]
    )
    t2.restore_checkpoint(path)
    np.testing.assert_array_equal(
        np.asarray(t2.state.params["lm_decoder"]["layers"][0]["mlp"]["gate"]["kernel"]),
        fresh_lm,
    )
    np.testing.assert_array_equal(
        np.asarray(t2.state.params["adapter"]["audio_tokens_embeddings"]["embedding"]),
        np.asarray(t.state.params["adapter"]["audio_tokens_embeddings"]["embedding"]),
    )


@pytest.mark.slow
def test_load_best_model_at_end(tmp_path):
    """finalize() reloads the checkpoint with the best tracked metric and
    never prunes it (reference load_best_model_at_end, trainer.py:63)."""
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(25))
    cfg = TrainingConfig(
        learning_rate=1e-3, warmup_steps=2, max_steps=10,
        gradient_accumulation_steps=1, compute_dtype="float32",
        logging_steps=1000, eval_steps=0, save_steps=0, save_total_limit=1,
        output_dir=str(tmp_path),
    )
    t = AATTrainer(model, params, cfg)
    rng = np.random.default_rng(25)
    t.training_step([make_segmented_batch(rng)], fetch_metrics=False)
    best_path = t.save_checkpoint(metric=0.5)
    t._track_best(best_path, 0.5)
    best_params = np.asarray(
        t.state.params["adapter"]["projection"]["out"]["kernel"]
    )
    t.training_step([make_segmented_batch(rng)], fetch_metrics=False)
    worse_path = t.save_checkpoint(metric=0.9)
    t._track_best(worse_path, 0.9)
    assert t._best_checkpoint == best_path
    import os

    assert os.path.isdir(best_path)  # protected from save_total_limit=1 pruning
    t.finalize()
    np.testing.assert_array_equal(
        np.asarray(t.state.params["adapter"]["projection"]["out"]["kernel"]),
        best_params,
    )
    assert t.state.step == 2  # step is kept; only weights roll back


def test_caption_cross_entropy_masks_padding():
    rng = np.random.default_rng(0)
    vocab = 11
    logits = jnp.asarray(rng.normal(0, 1, (2, 10, vocab)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, vocab, (2, 4)))
    full_mask = jnp.ones((2, 4), jnp.int32)
    pad_mask = full_mask.at[1, 2:].set(0)

    loss_full = caption_cross_entropy(logits, ids, full_mask)
    loss_pad = caption_cross_entropy(logits, ids, pad_mask)
    # padded variant ignores the padded targets → different loss in general
    assert not np.isclose(float(loss_full), float(loss_pad))

    # perfect logits → ~0 loss on the masked positions
    perfect = jnp.full((2, 10, vocab), -30.0)
    caption = np.asarray(ids)
    for b in range(2):
        for t in range(1, 4):
            perfect = perfect.at[b, 10 - 4 + t - 1, caption[b, t]].set(30.0)
    assert float(caption_cross_entropy(perfect, ids, full_mask)) < 1e-3


@pytest.mark.slow
def test_resume_fast_forward_position(tmp_path):
    """Resume data fast-forward with accum not dividing the epoch length:
    5 batches at accum=2 -> 2 steps/epoch, 4 microbatches consumed per
    epoch (the trailing partial group is discarded). A resume at step 2
    (= exactly one epoch) must skip ZERO microbatches of the new epoch —
    the old `consumed % len(batches)` formula skipped 4 of the 5."""
    model = tiny_model()
    cfg = TrainingConfig(
        learning_rate=1e-3, warmup_steps=2, max_steps=2,
        gradient_accumulation_steps=2, compute_dtype="float32",
        train_audio_encoder=True, train_lm_decoder=False,
        logging_steps=1000, eval_steps=0, save_steps=0,
        output_dir=str(tmp_path / "resume_pos"),
    )
    t = AATTrainer(model, model.init_params(jax.random.PRNGKey(30)), cfg)
    batches = [make_segmented_batch(np.random.default_rng(200 + i)) for i in range(5)]
    t.train(batches)
    assert t.state.step == 2
    ckpt = t.save_checkpoint(str(tmp_path / "resume_pos" / "ckpt"))

    t2 = AATTrainer(model, model.init_params(jax.random.PRNGKey(31)),
                    TrainingConfig(**{**cfg.__dict__, "max_steps": 4}))
    consumed = []

    real_step = t2.training_step

    def recording_step(micro, fetch_metrics=True):
        consumed.append(len(micro))
        return real_step(micro, fetch_metrics=fetch_metrics)

    t2.training_step = recording_step
    t2.train(batches, resume_from_checkpoint=ckpt)
    # the resumed epoch must see 2 full accumulation groups (batches 0-3),
    # i.e. it skipped nothing; with the old formula it would have seen none
    assert consumed == [2, 2], consumed
    assert t2.state.step == 4
