"""Multi-chip sharding: the driver's dryrun path must compile + execute a
full dp×fsdp×tp training step on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax

import __graft_entry__ as graft
from aat_tpu.parallel import mesh as mesh_lib


@pytest.mark.slow
def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    graft.dryrun_multichip(8)


def test_param_sharding_rules_cover_tp_and_fsdp():
    mesh = mesh_lib.make_mesh(dp=2, fsdp=2, tp=2)
    params = {
        "layers": [{
            "attention": {
                "q": {"kernel": np.zeros((32, 32)), "bias": np.zeros((32,))},
                "out": {"kernel": np.zeros((32, 32))},
            },
            "mlp": {
                "gate": {"kernel": np.zeros((32, 64))},
                "down": {"kernel": np.zeros((64, 32))},
            },
        }],
        "embed_tokens": {"embedding": np.zeros((128, 32))},
        "final_norm": {"scale": np.zeros((32,))},
    }
    sh = mesh_lib.shard_params(params, mesh)
    layer = sh["layers"][0]
    # column-parallel q: out axis on tp
    assert layer["attention"]["q"]["kernel"].spec[-1] == "tp"
    # row-parallel out: in axis on tp
    assert layer["attention"]["out"]["kernel"].spec[-2] == "tp"
    assert layer["mlp"]["gate"]["kernel"].spec[-1] == "tp"
    assert layer["mlp"]["down"]["kernel"].spec[-2] == "tp"
    # vocab-sharded embedding: tp + fsdp extend the SAME (vocab) axis so
    # the lookup cotangent only ever needs a batch→replicated all-gather
    # (hidden-axis fsdp triggers SPMD involuntary full rematerialization)
    assert sh["embed_tokens"]["embedding"].spec[0] == ("tp", "fsdp")
    # norm scale replicated
    assert all(s is None for s in sh["final_norm"]["scale"].spec)


def test_batch_sharding_runs_dp():
    mesh = mesh_lib.make_mesh(dp=4, fsdp=2, tp=1)
    x = np.ones((8, 16), np.float32)
    sharded = jax.device_put(x, mesh_lib.batch_sharding(mesh))
    total = jax.jit(lambda v: v.sum())(sharded)
    assert float(total) == 8 * 16


# ---------------------------------------------------------------------------
# multi-device EQUIVALENCE: a sharded step must reproduce the single-device
# step (same loss, same updated params) on the same global batch — SPMD
# partitioning must not change the math (reference ground: accelerate DDP
# gives identical global grads regardless of world size)
# ---------------------------------------------------------------------------


def _tiny_trainer(mesh, dp, fsdp, tp, seed=0, dropout=0.0, sp=1, pp=1):
    import dataclasses

    from aat_tpu.models import hubert as hub
    from aat_tpu.models import llama as llm
    from aat_tpu.models.aslm import AslmConfig, AslmModel
    from aat_tpu.training.config import TrainingConfig
    from aat_tpu.training.trainer import AATTrainer

    config = AslmConfig(projection_type="linear", audio_encoder_hidden=32,
                        lm_hidden=32, projection_hidden=48)
    audio_cfg = dataclasses.replace(
        hub.tiny_test_config(), hidden_dropout=dropout, attention_dropout=dropout
    )
    model = AslmModel(config, audio_cfg, llm.tiny_test_config())
    params = model.init_params(jax.random.PRNGKey(seed))
    tcfg = TrainingConfig(
        learning_rate=1e-3, warmup_steps=2, max_steps=10,
        gradient_accumulation_steps=1, train_audio_encoder=True,
        train_lm_decoder=True, compute_dtype="float32",
        mesh_dp=dp, mesh_fsdp=fsdp, mesh_tp=tp, mesh_sp=sp, mesh_pp=pp,
        eval_steps=0, save_steps=0, logging_steps=1000,
        output_dir="/tmp/aat_tpu_equiv",
    )
    return AATTrainer(model, params, tcfg, mesh=mesh)


def _equiv_batch(rows=8):
    rng = np.random.default_rng(7)
    return {
        "batched_segments": rng.normal(0, 0.3, (rows, 2, 400)).astype(np.float32),
        "segments_waveforms_mask": np.ones((rows, 2, 400), np.int32),
        "segments_boarders_attention_mask": np.ones((rows, 2), np.int32),
        "input_ids": rng.integers(1, 100, (rows, 6)),
        "attention_mask": np.ones((rows, 6), np.int32),
        "input_ids_attention_mask": np.ones((rows, 6), np.int32),
    }


def _run_steps(trainer, batch, n=2):
    from aat_tpu.parallel.pipeline import unstack_model_layers

    for _ in range(n):
        metrics = trainer.training_step([batch])
    # pp trainers hold stage-resident STACKED masters; normalize to the
    # interchange layout so tree-leaf comparisons line up positionally
    params = {
        k: unstack_model_layers(v) if isinstance(v, dict) else v
        for k, v in trainer.state.params.items()
    }
    return metrics["train/loss"], jax.device_get(params)


def _max_tree_diff(a, b):
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    return max(
        float(np.abs(np.asarray(x) - np.asarray(y)).max())
        for x, y in zip(leaves_a, leaves_b)
    )


@pytest.mark.slow
def test_dp8_matches_single_device():
    assert len(jax.devices()) >= 8
    batch = _equiv_batch()
    loss_1, params_1 = _run_steps(_tiny_trainer(mesh_lib.make_mesh(1, 1, 1), 1, 1, 1), batch)
    loss_8, params_8 = _run_steps(_tiny_trainer(mesh_lib.make_mesh(8, 1, 1), 8, 1, 1), batch)
    assert abs(loss_1 - loss_8) < 1e-5, (loss_1, loss_8)
    assert _max_tree_diff(params_1, params_8) < 1e-4


@pytest.mark.slow
def test_dp_fsdp_tp_matches_single_device():
    assert len(jax.devices()) >= 8
    batch = _equiv_batch()
    loss_1, params_1 = _run_steps(_tiny_trainer(mesh_lib.make_mesh(1, 1, 1), 1, 1, 1), batch)
    loss_m, params_m = _run_steps(_tiny_trainer(mesh_lib.make_mesh(2, 2, 2), 2, 2, 2), batch)
    assert abs(loss_1 - loss_m) < 1e-5, (loss_1, loss_m)
    assert _max_tree_diff(params_1, params_m) < 1e-4


def test_ulysses_attention_matches_plain():
    """Sequence-parallel attention (time-sharded → two all_to_alls →
    head-sharded full-T attention → back) must reproduce the plain path,
    including the T % sp != 0 padding case and ragged key masks."""
    from aat_tpu.ops.attention import attention_bthd
    from aat_tpu.parallel.sequence import ulysses_attention_bthd

    assert len(jax.devices()) >= 8
    mesh = mesh_lib.make_mesh(dp=2, fsdp=1, tp=1, sp=4)
    rng = np.random.default_rng(3)
    for t in (32, 37):  # 37: exercises the pad-to-multiple-of-sp path
        q, k, v = (
            np.asarray(rng.normal(0, 1, (4, t, 8, 16)), np.float32)
            for _ in range(3)
        )
        key_mask = np.ones((4, t), np.int32)
        key_mask[0, t - 5:] = 0  # ragged tail
        key_mask[3, :] = 0       # fully-masked row
        ref = attention_bthd(q, k, v, key_mask, sm_scale=0.25,
                             use_pallas=False)
        out = ulysses_attention_bthd(q, k, v, key_mask, mesh, sm_scale=0.25,
                                     use_pallas=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def _whole_utterance_batch(rows=8):
    rng = np.random.default_rng(9)
    return {
        "waveforms": rng.normal(0, 0.3, (rows, 400)).astype(np.float32),
        "waveforms_attention_mask": np.ones((rows, 400), np.int32),
        "input_ids": rng.integers(1, 100, (rows, 6)),
        "attention_mask": np.ones((rows, 6), np.int32),
        "input_ids_attention_mask": np.ones((rows, 6), np.int32),
    }


@pytest.mark.slow
def test_whole_utterance_sp_matches_single_device():
    """A dp=2 × sp=4 whole-utterance train step (Ulysses attention in the
    encoder) must reproduce the 1-device step. The tiny encoder's T=39
    exercises the sp padding path inside every attention call."""
    assert len(jax.devices()) >= 8
    batch = _whole_utterance_batch()
    loss_1, params_1 = _run_steps(
        _tiny_trainer(mesh_lib.make_mesh(1, 1, 1), 1, 1, 1), batch)
    loss_s, params_s = _run_steps(
        _tiny_trainer(mesh_lib.make_mesh(2, 1, 1, 4), 2, 1, 1, sp=4), batch)
    assert abs(loss_1 - loss_s) < 1e-5, (loss_1, loss_s)
    assert _max_tree_diff(params_1, params_s) < 1e-4


@pytest.mark.slow
def test_pipeline_pp_matches_single_device():
    """A dp=4 × pp=2 step (encoder layer stack GPipe'd over 2 stages,
    microbatched activations ring-passed via ppermute) must reproduce the
    1-device step on both batch layouts. The tiny encoder has 2 layers →
    1 layer per stage."""
    assert len(jax.devices()) >= 8
    for batch in (_equiv_batch(), _whole_utterance_batch()):
        loss_1, params_1 = _run_steps(
            _tiny_trainer(mesh_lib.make_mesh(1, 1, 1), 1, 1, 1), batch)
        loss_p, params_p = _run_steps(
            _tiny_trainer(mesh_lib.make_mesh(4, 1, 1, 1, 2), 4, 1, 1, pp=2),
            batch)
        assert abs(loss_1 - loss_p) < 1e-5, (loss_1, loss_p)
        assert _max_tree_diff(params_1, params_p) < 1e-4


def test_model_reuse_across_trainers_clears_stale_meshes():
    """A trainer OWNS the model configs' sp/pp routing: building a
    single-device trainer from a model previously used by a pp (or sp)
    trainer must clear the stale mesh — not keep routing the encoder/decoder
    through a dead 8-device shard_map."""
    from aat_tpu.training.trainer import AATTrainer

    assert len(jax.devices()) >= 8
    t_pp = _tiny_trainer(mesh_lib.make_mesh(4, 1, 1, 1, 2), 4, 1, 1, pp=2)
    model = t_pp.model
    assert model.audio_encoder_config.pp_mesh is not None
    assert model.lm_config.pp_mesh is not None

    t_1 = AATTrainer(model, model.init_params(jax.random.PRNGKey(1)),
                     t_pp.config.__class__(
                         learning_rate=1e-3, warmup_steps=2, max_steps=10,
                         gradient_accumulation_steps=1,
                         train_audio_encoder=True, train_lm_decoder=True,
                         compute_dtype="float32", eval_steps=0, save_steps=0,
                         logging_steps=1000, output_dir="/tmp/aat_tpu_reuse"),
                     mesh=mesh_lib.make_mesh(1, 1, 1))
    assert model.audio_encoder_config.pp_mesh is None
    assert model.lm_config.pp_mesh is None
    m = t_1.training_step([_equiv_batch(rows=2)])
    assert np.isfinite(m["train/loss"])


@pytest.mark.slow
def test_pipeline_layerdrop_matches_single_device():
    """LayerDrop draws key on the GLOBAL layer index in the pipelined
    encoder, so layer-skip decisions (one per layer per step, whole batch —
    torch semantics) match the 1-device run exactly even though per-element
    dropout is off here."""
    assert len(jax.devices()) >= 8
    import dataclasses

    def with_layerdrop(trainer):
        m = trainer.model
        m.audio_encoder_config = dataclasses.replace(
            m.audio_encoder_config, layerdrop=0.5)
        return trainer

    batch = _equiv_batch()
    loss_1, params_1 = _run_steps(
        with_layerdrop(_tiny_trainer(mesh_lib.make_mesh(1, 1, 1), 1, 1, 1)),
        batch)
    loss_p, params_p = _run_steps(
        with_layerdrop(_tiny_trainer(
            mesh_lib.make_mesh(4, 1, 1, 1, 2), 4, 1, 1, pp=2)), batch)
    assert abs(loss_1 - loss_p) < 1e-5, (loss_1, loss_p)
    assert _max_tree_diff(params_1, params_p) < 1e-4


def test_pp_masters_are_stage_resident():
    """pp>1 switches the pipelined stacks (encoder + decoder "layers") to
    the stacked [L, ...] layout with the leading dim sharded P('pp'): the
    MASTERS — and the optimizer moments initialized from them — live one
    layer-slice per stage, so gpipe_apply's in_specs match residency (zero
    per-step resharding) and per-stage weight+moment memory scales 1/pp."""
    from aat_tpu.parallel.pipeline import is_stacked

    assert len(jax.devices()) >= 8
    t = _tiny_trainer(mesh_lib.make_mesh(4, 1, 1, 1, 2), 4, 1, 1, pp=2)
    enc = t.state.params["audio_encoder"]["layers"]
    lm = t.state.params["lm_decoder"]["layers"]
    assert is_stacked(enc) and is_stacked(lm)
    for stacked in (enc, lm):
        for leaf in jax.tree.leaves(stacked):
            assert leaf.sharding.spec[0] == "pp", leaf.sharding
    # Adam moments inherit the stacked sharding (zeros_like at tx.init)
    pp_sharded_moments = [
        leaf for leaf in jax.tree.leaves(t.state.opt_state)
        if hasattr(leaf, "sharding") and getattr(leaf, "ndim", 0) >= 1
        and leaf.sharding.spec and leaf.sharding.spec[0] == "pp"
    ]
    assert pp_sharded_moments, "no pp-sharded optimizer moments found"
    # the adapter is NOT pipelined — its tree is untouched by the stacking
    pooling = t.state.params["adapter"].get("pooling")
    if pooling is not None:
        assert isinstance(pooling["layers"], list)


@pytest.mark.slow
def test_tp_inside_pipeline_matches_single_device():
    """dp=2 × tp=2 × pp=2: Megatron-style tensor parallelism INSIDE the
    GPipe body — width-sliced stacked masters (qkv/intermediate columns,
    out/down rows), psum'd row-parallel products, heads derived from kernel
    shapes — must reproduce the 1-device step bit-for-bit up to reduction
    order."""
    from jax.sharding import PartitionSpec as P

    assert len(jax.devices()) >= 8
    batch = _equiv_batch()
    loss_1, params_1 = _run_steps(
        _tiny_trainer(mesh_lib.make_mesh(1, 1, 1), 1, 1, 1), batch)
    t = _tiny_trainer(mesh_lib.make_mesh(2, 1, 2, 1, 2), 2, 1, 2, pp=2)
    # masters are genuinely width-sliced: columns for q, rows for out/down
    enc_q = t.state.params["audio_encoder"]["layers"]["attention"]["q"]
    lm_down = t.state.params["lm_decoder"]["layers"]["mlp"]["down"]
    assert enc_q["kernel"].sharding.spec == P("pp", None, "tp")
    assert enc_q["bias"].sharding.spec == P("pp", "tp")
    assert lm_down["kernel"].sharding.spec == P("pp", "tp", None)
    loss_m, params_m = _run_steps(t, batch)
    assert abs(loss_1 - loss_m) < 1e-5, (loss_1, loss_m)
    assert _max_tree_diff(params_1, params_m) < 1e-4


@pytest.mark.slow
def test_pp_cross_layout_checkpoint_restore(tmp_path):
    """A pp run must resume an interchange-layout (pp=1) checkpoint and
    vice versa: restore_checkpoint normalizes the per-layer-list ↔ stacked
    layouts before the structure-sensitive merge."""
    batch = _equiv_batch()

    t1 = _tiny_trainer(mesh_lib.make_mesh(1, 1, 1), 1, 1, 1)
    t1.training_step([batch])
    t1.config.output_dir = str(tmp_path / "from1")
    p1 = t1.save_checkpoint()

    # pp=2 trainer restores the pp=1 checkpoint (list → stacked)
    tp = _tiny_trainer(mesh_lib.make_mesh(4, 1, 1, 1, 2), 4, 1, 1, pp=2)
    tp.restore_checkpoint(p1, restore_opt_state=False)
    from aat_tpu.parallel.pipeline import unstack_model_layers

    got = {
        k: unstack_model_layers(v) if isinstance(v, dict) else v
        for k, v in tp.state.params.items()
    }
    assert _max_tree_diff(jax.device_get(got),
                          jax.device_get(t1.state.params)) == 0.0

    # and back: pp=2 checkpoint restores into a pp=1 trainer (stacked → list)
    tp.config.output_dir = str(tmp_path / "fromp")
    pp_ckpt = tp.save_checkpoint()
    t2 = _tiny_trainer(mesh_lib.make_mesh(1, 1, 1), 1, 1, 1, seed=3)
    t2.restore_checkpoint(pp_ckpt, restore_opt_state=False)
    assert _max_tree_diff(jax.device_get(t2.state.params),
                          jax.device_get(t1.state.params)) == 0.0


@pytest.mark.slow
def test_dp8_with_dropout_matches_single_device():
    """Train-mode dropout must be sharding-invariant: jax's partitionable
    threefry makes random bits a function of (key, position), independent
    of the mesh — so a dp=8 dropout-active step reproduces the 1-device
    step exactly like the deterministic case does."""
    assert len(jax.devices()) >= 8
    batch = _equiv_batch()
    loss_1, params_1 = _run_steps(
        _tiny_trainer(mesh_lib.make_mesh(1, 1, 1), 1, 1, 1, dropout=0.2), batch)
    loss_8, params_8 = _run_steps(
        _tiny_trainer(mesh_lib.make_mesh(8, 1, 1), 8, 1, 1, dropout=0.2), batch)
    assert abs(loss_1 - loss_8) < 1e-5, (loss_1, loss_8)
    assert _max_tree_diff(params_1, params_8) < 1e-4


@pytest.mark.slow
def test_fsdp_inside_pipeline_matches_single_device():
    """dp=2 × fsdp=2 × pp=2 (VERDICT r3 item 6): stacked masters' widest
    matrix axis additionally shards over 'fsdp' (ZeRO-3 residency);
    gpipe_apply all-gathers the stage weights once per step at body entry
    and the AD transpose reduce-scatters the grads back. The composed step
    must reproduce the 1-device step."""
    from jax.sharding import PartitionSpec as P

    assert len(jax.devices()) >= 8
    batch = _equiv_batch()
    loss_1, params_1 = _run_steps(
        _tiny_trainer(mesh_lib.make_mesh(1, 1, 1), 1, 1, 1), batch)
    t = _tiny_trainer(mesh_lib.make_mesh(2, 2, 1, 1, 2), 2, 2, 1, pp=2)
    # stacked matrices genuinely fsdp-sliced; stacked biases stay replicated
    enc_q = t.state.params["audio_encoder"]["layers"]["attention"]["q"]
    assert "fsdp" in tuple(enc_q["kernel"].sharding.spec)
    assert tuple(enc_q["bias"].sharding.spec) in ((("pp",)), ("pp", None))
    loss_m, params_m = _run_steps(t, batch)
    assert abs(loss_1 - loss_m) < 1e-5, (loss_1, loss_m)
    assert _max_tree_diff(params_1, params_m) < 1e-4
