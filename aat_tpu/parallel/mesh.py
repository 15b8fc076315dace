"""Device mesh construction and sharding rules.

The reference delegates all distribution to HF accelerate (DDP/DeepSpeed/FSDP
pass-through, SURVEY §2 parallelism table; src/aat/training/trainer.py:286-304).
Here distribution is first-class and TPU-native: a ``jax.sharding.Mesh`` with
``(dp, fsdp, tp)`` axes, ``NamedSharding`` annotations on params and batches,
and XLA-inserted collectives riding ICI.

Sharding policy:
- batch axis        → ('dp', 'fsdp')  (data parallel over both axes)
- large param axes  → 'fsdp' (ZeRO-3 style; XLA all-gathers at use,
                      reduce-scatters grads)
- attention heads / mlp hidden → 'tp' (tensor parallel on matmul columns,
                      rows on the output projections)
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, fsdp: int = 1, tp: int = 1, sp: int = 1,
              pp: int = 1, devices=None) -> Mesh:
    """Build a (dp, fsdp, tp, sp, pp) mesh; total must match available
    devices.

    ``sp`` is the sequence-parallel axis (whole-utterance encoding at
    T≈1500: activations shard over time between layers, heads during
    attention — parallel/sequence.py). ``pp`` is the pipeline axis (layer
    stack GPipe'd across stages — parallel/pipeline.py)."""
    if devices is None:
        devices = jax.devices()
    n = dp * fsdp * tp * sp * pp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(dp, fsdp, tp, sp, pp)
    return Mesh(arr, axis_names=("dp", "fsdp", "tp", "sp", "pp"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, 1)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for batches."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for microbatches stacked on a leading accumulation axis
    [A, B, ...]: the batch axis (axis 1) is data-parallel, the
    accumulation axis is unsharded (it is scanned over in-graph)."""
    return NamedSharding(mesh, P(None, ("dp", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Parameter sharding rules
# ---------------------------------------------------------------------------


def _spec_for(path: str, shape, mesh: Mesh) -> P:
    """TP/FSDP spec by parameter role, FSDP fallback on the largest axis."""
    tp = mesh.shape.get("tp", 1)
    fsdp = mesh.shape.get("fsdp", 1)
    ndim = len(shape)

    spec = [None] * ndim

    if tp > 1 and ndim >= 2:
        # Column-parallel: qkv/gate/up/intermediate kernels [in, out] → shard out.
        if any(k in path for k in ("/q/", "/k/", "/v/", "/gate/", "/up/", "/intermediate/", "/in_proj/", "/l_in/", "/in/")):
            if shape[-1] % tp == 0:
                spec[-1] = "tp"
        # Row-parallel: out/down/output kernels → shard in (XLA adds psum).
        elif any(k in path for k in ("/out/", "/down/", "/output/", "/out_proj/", "/l_out/")):
            if ndim >= 2 and shape[-2] % tp == 0:
                spec[-2] = "tp"
        # Embeddings: shard vocab.
        elif "embedding" in path and shape[0] % tp == 0:
            spec[0] = "tp"

    if fsdp > 1 and ndim >= 2:
        if "embedding" in path:
            # Vocab-parallel embeddings extend fsdp along the SAME (vocab)
            # axis as tp instead of sharding hidden: the lookup cotangent
            # [B, T, H] then only needs a batch→replicated all-gather in
            # backward, which SPMD expresses natively. Putting fsdp on the
            # hidden axis forces a batch→hidden reshard the partitioner
            # cannot express and falls back to "involuntary full
            # rematerialization" (a full all-gather + re-slice per step).
            if spec[0] == "tp":
                if shape[0] % (tp * fsdp) == 0:
                    spec[0] = ("tp", "fsdp")
            elif shape[0] % fsdp == 0:
                spec[0] = "fsdp"
            return P(*spec)
        # ZeRO-3: shard the largest still-unsharded axis divisible by fsdp.
        # 1-D params (biases, norm scales) stay replicated — sharding them
        # buys nothing and forces tiny all-gathers.
        order = sorted(range(ndim), key=lambda i: -shape[i])
        for i in order:
            if spec[i] is None and shape[i] % fsdp == 0 and shape[i] >= fsdp:
                spec[i] = "fsdp"
                break

    return P(*spec)


def shard_params(params, mesh: Mesh, stacked_tp=None):
    """NamedSharding tree for a parameter pytree (dicts/lists of arrays).

    A dict-valued ``layers`` node is the STAGE-RESIDENT stacked layout
    (parallel/pipeline.py:stack_model_layers): every leaf under it is
    [L, ...] and gets P('pp') on the leading dim — the masters (and the
    optimizer moments initialized from them) live one layer-slice per
    pipeline stage, and gpipe_apply's in_specs match them exactly (no
    per-step resharding).

    ``stacked_tp`` maps top-level subtree keys ('audio_encoder',
    'lm_decoder') to True when that stack's widths are tp-partitionable
    (the models' ``tp_partitionable``): its stacked leaves then ALSO get
    Megatron-style 'tp' specs (pipeline.stacked_leaf_spec), matching the
    tp-aware pipeline bodies. Otherwise stacked leaves shard over 'pp'
    only (full-width redundant compute across tp)."""
    from aat_tpu.parallel.pipeline import stacked_leaf_spec

    pp = mesh.shape.get("pp", 1)
    tp = mesh.shape.get("tp", 1)
    fsdp = mesh.shape.get("fsdp", 1)
    stacked_tp = stacked_tp or {}

    def walk(node, path, top=None, stacked=False):
        if isinstance(node, dict):
            return {
                k: walk(v, f"{path}/{k}/", top if top is not None else k,
                        stacked or (k == "layers" and isinstance(v, dict)))
                for k, v in node.items()
            }
        if isinstance(node, (list, tuple)):
            t = [walk(v, f"{path}/{i}/", top, stacked)
                 for i, v in enumerate(node)]
            return type(node)(t) if not isinstance(node, tuple) else tuple(t)
        shape = np.shape(node)
        if len(shape) == 0:
            return NamedSharding(mesh, P())
        if stacked and pp > 1 and shape[0] % pp == 0:
            leaf_tp = tp if stacked_tp.get(top, False) else 1
            return NamedSharding(
                mesh, stacked_leaf_spec(path, shape, leaf_tp, fsdp=fsdp))
        return NamedSharding(mesh, _spec_for(path, shape, mesh))

    return walk(params, "/")


def place_params(params, mesh: Mesh, stacked_tp=None):
    """Device-put a param tree according to :func:`shard_params`.

    Multi-process: a host numpy leaf is the full (process-identical) array,
    so build the global jax.Array from each process's slice of it —
    ``make_array_from_process_local_data`` treats local data whose shape
    equals the global shape as the global array and carves out the
    addressable shards. ``jax.device_put`` alone cannot target
    non-addressable devices."""
    shardings = shard_params(params, mesh, stacked_tp)
    if jax.process_count() == 1:
        return jax.tree.map(jax.device_put, params, shardings)

    def put(x, sh):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x  # already a global array (e.g. restored checkpoint)
        arr = np.asarray(x)
        if arr.ndim == 0:
            # expand scalars: make_array_from_process_local_data needs a dim
            rep = NamedSharding(mesh, P(None))
            return jax.make_array_from_process_local_data(
                rep, arr[None], (1,)).reshape(())
        return jax.make_array_from_process_local_data(sh, arr, arr.shape)

    return jax.tree.map(put, params, shardings)
