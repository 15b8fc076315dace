"""Worker for the 2-process multihost equivalence test.

Usage: python tests/_mp_worker.py <coordinator_port> <process_id> <tmpdir>

Each of the two processes owns 2 virtual CPU devices (4 global). Exercises
every multihost code path for real: per-process dataset shards +
``make_array_from_process_local_data`` global-batch assembly, sharded train
steps, ``evaluate()``'s ragged allgather + global loss reduction, and
multihost orbax save/restore."""

import os
import sys

port, pid, tmpdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402

import _mp_common as mp  # noqa: E402

from aat_tpu.data.dataloaders import BatchIterator  # noqa: E402
from aat_tpu.parallel import mesh as mesh_lib  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 2
assert len(jax.devices()) == 4

mesh = mesh_lib.make_mesh(dp=4, fsdp=1, tp=1)
trainer = mp.build_trainer(mesh, 4, 1, 1, os.path.join(tmpdir, "mp_run"))

items = mp.make_items(4)
it = BatchIterator(items, mp.collate, batch_size=2, shuffle=False,
                   drop_last=True, prefetch=0,
                   shard_index=jax.process_index(), num_shards=2)
local_batches = list(it)
assert len(local_batches) == 1
local = local_batches[0]

# --- global batch assembly: the 2-process assembly must hold exactly the
# rows a single process sees (interleaved shard order: [0, 2] ++ [1, 3]) ---
sb = trainer._shard_batch(local)
replicate = jax.jit(lambda x: x, out_shardings=mesh_lib.replicated(mesh))
assembled = np.asarray(replicate(sb["input_ids"]))
expected = mp.collate([0, 2, 1, 3])["input_ids"]
np.testing.assert_array_equal(assembled, expected)

# --- sharded train steps (each process feeds its LOCAL shard) ---
losses = []
for _ in range(2):
    metrics = trainer.training_step([local])
    losses.append(metrics["train/loss"])

# --- evaluate: per-process eval shards; ragged allgather + global loss ---
eval_metrics = trainer.evaluate([local], with_generation=True)
assert np.isfinite(eval_metrics["eval/loss"])
assert "wer" in eval_metrics

# --- multihost orbax save / restore round trip ---
ckpt = trainer.save_checkpoint(os.path.join(tmpdir, "mp_ckpt"))
step_before = trainer.state.step
params_before = jax.tree.map(
    lambda x: np.asarray(replicate(x)), trainer.state.params
)
trainer.restore_checkpoint(ckpt)
assert trainer.state.step == step_before
params_after = jax.tree.map(
    lambda x: np.asarray(replicate(x)), trainer.state.params
)
for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(params_after)):
    np.testing.assert_array_equal(a, b)

if jax.process_index() == 0:
    flat = np.concatenate([
        np.asarray(x).ravel() for x in jax.tree.leaves(params_after)
    ])
    np.savez(
        os.path.join(tmpdir, "worker_result.npz"),
        loss=np.asarray(losses), eval_loss=eval_metrics["eval/loss"],
        wer=eval_metrics["wer"], params=flat,
    )

jax.distributed.shutdown()
print(f"worker {pid} OK")
