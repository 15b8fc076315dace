"""Multi-chip sharding: the driver's dryrun path must compile + execute a
full dp×fsdp×tp training step on the 8-device virtual CPU mesh."""

import numpy as np

import jax

import __graft_entry__ as graft
from aat_tpu.parallel import mesh as mesh_lib


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
    # vocab-sharded embedding
    assert sh["embed_tokens"]["embedding"].spec[0] == "tp"
    # norm scale replicated
    assert all(s is None for s in sh["final_norm"]["scale"].spec)


def test_batch_sharding_runs_dp():
    mesh = mesh_lib.make_mesh(dp=4, fsdp=2, tp=1)
    x = np.ones((8, 16), np.float32)
    sharded = jax.device_put(x, mesh_lib.batch_sharding(mesh))
    total = jax.jit(lambda v: v.sum())(sharded)
    assert float(total) == 8 * 16
