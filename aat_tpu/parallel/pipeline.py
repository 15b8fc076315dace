"""Pipeline parallelism: a GPipe-style combinator over stacked layers.

The reference has no pipeline parallelism (SURVEY §2: its scale ceiling is
whatever HF accelerate gives). This is the TPU-native axis for models whose
layer stack exceeds one chip (the reference's Qwen-1.5-1.8B option, or
hubert-large at long T with fat activations):

* layer parameters stack on a leading [L] dim and shard over the mesh's
  ``pp`` axis — stage s holds layers [s·L/pp, (s+1)·L/pp);
* the batch splits into M microbatches; at tick t, stage s runs its layer
  slice on microbatch t−s and hands the activation to stage s+1 via
  ``lax.ppermute`` (a ring step over ICI);
* M + pp − 1 ticks drain the pipe — the classic GPipe bubble of
  (pp−1)/(M+pp−1); all stages execute every tick (SPMD — idle ticks chew
  garbage), so utilization, not correctness, depends on M ≫ pp;
* the whole schedule is a ``lax.scan``, so ``jax.grad`` differentiates it
  (the transpose of ppermute is the reverse ring) — no hand-written
  backward schedule.

Dropout note: microbatching slices the batch, so position-keyed dropout
masks are decorrelated from (not bit-identical to) a 1-device run; the
per-layer LayerDrop draw keys on the layer index only and stays
step-global, matching torch semantics. Equivalence tests run dropout-off.

Composition (tp × pp): with :func:`stacked_layer_specs` the stacked layer
params shard over BOTH axes — P('pp') on the layer dim plus Megatron-style
'tp' on the matmul widths — and the models' tp-aware layer bodies psum
their row-parallel products inside the shard_map, so tp contributes real
compute/memory scaling within pipelined stacks (each (pp, tp) member holds
an [L/pp]-layer, width-sliced shard). The masters live in the SAME layout
(stage-resident stacking, :func:`stack_model_layers` + mesh.shard_params),
so no per-step resharding occurs. fsdp members inside a pipelined stack
still hold full (width-sliced) layers — pp already provides the depth-wise
memory scaling fsdp would otherwise contribute.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from aat_tpu.parallel.sequence import shard_map


def stack_layers(layers: Sequence):
    """[{...}, {...}, ...] per-layer param trees → one tree of [L, ...]
    leaves (jit-free reshape when traced; a copy when eager)."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *layers)


def is_stacked(layers) -> bool:
    """True when ``layers`` is the stage-resident stacked layout (ONE tree
    of [L, ...] leaves, leading dim sharded over 'pp') rather than the
    interchange layout (a list of per-layer trees)."""
    return isinstance(layers, dict)


def layer_seq(layers, num_layers: int) -> list:
    """View ``layers`` as a per-layer sequence regardless of layout.

    Stacked leaves are sliced on the leading dim with static indices —
    under jit these are slices of the pp-sharded master (the cold
    non-pipelined paths, e.g. KV-cache decode during a pipelined training
    run, stay correct; XLA inserts the transfers they need)."""
    if not is_stacked(layers):
        return list(layers)
    return [jax.tree.map(lambda x, i=i: x[i], layers) for i in range(num_layers)]


def stack_model_layers(params: dict) -> dict:
    """Stage-resident layout switch: replace a model subtree's ``layers``
    list with one stacked tree of [L, ...] leaves.

    The trainer applies this to the pipelined stacks (HuBERT encoder /
    Llama decoder) when the mesh has a pp axis, so the MASTER params — and
    therefore the grads, optimizer moments, and checkpoints — live sharded
    over 'pp' (mesh.shard_params puts P('pp') on the leading dim).
    :func:`gpipe_apply` then consumes them with zero per-step resharding,
    and per-stage weight+moment memory scales 1/pp."""
    if "layers" in params and isinstance(params["layers"], (list, tuple)):
        params = dict(params)
        params["layers"] = stack_layers(params["layers"])
    return params


def stacked_leaf_spec(name: str, shape, tp: int, pp_axis: str = "pp",
                      tp_axis: str = "tp", fsdp: int = 1,
                      fsdp_axis: str = "fsdp") -> P:
    """Megatron-style partition spec for one stacked-layer leaf [L, ...].

    The leading (layer) dim is always ``pp``. With ``tp > 1`` the matmul
    weights additionally split across ``tp`` by role: column-parallel
    q/k/v/gate/up/intermediate shard their output dim (biases follow the
    columns); row-parallel out/down/output shard their input dim (the
    layer body psums their products; their biases stay replicated and are
    added once after the psum). Callers must have verified head/width
    divisibility — use the models' ``tp_partitionable``.

    With ``fsdp > 1`` the stacked MATRICES (≥ 2 non-layer dims) additionally
    shard their largest still-free axis over ``fsdp`` (ZeRO-3 residency for
    masters/grads/moments); ``gpipe_apply`` all-gathers them once per step
    at pipeline-body entry and the AD transpose reduce-scatters the grads
    back. Stacked biases/norm scales stay fsdp-replicated — sharding them
    buys nothing and forces tiny gathers."""
    rest = [None] * (len(shape) - 1)
    if tp > 1 and rest:
        col = any(k in name for k in
                  ("/q/", "/k/", "/v/", "/gate/", "/up/", "/intermediate/"))
        row = any(k in name for k in ("/out/", "/down/", "/output/"))
        if col and shape[-1] % tp == 0:
            rest[-1] = tp_axis
        elif row and len(shape) >= 3 and shape[1] % tp == 0:
            rest[0] = tp_axis
    if fsdp > 1 and len(shape) >= 3:
        order = sorted(range(1, len(shape)), key=lambda i: -shape[i])
        for i in order:
            if rest[i - 1] is None and shape[i] % fsdp == 0 and shape[i] >= fsdp:
                rest[i - 1] = fsdp_axis
                break
    return P(pp_axis, *rest)


def _leaf_path_str(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", getattr(p, "idx", None))
        parts.append(str(key))
    return "/" + "/".join(parts) + "/"


def stacked_layer_specs(stacked, tp: int, pp_axis: str = "pp",
                        tp_axis: str = "tp", fsdp: int = 1,
                        fsdp_axis: str = "fsdp"):
    """PartitionSpec tree for a stacked layer tree — shared by
    mesh.shard_params (master placement) and gpipe_apply's in_specs, so
    residency and the pipeline's view agree by construction."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: stacked_leaf_spec(
            _leaf_path_str(path), jnp.shape(leaf), tp, pp_axis, tp_axis,
            fsdp, fsdp_axis),
        stacked,
    )


def unstack_model_layers(params: dict) -> dict:
    """Inverse of :func:`stack_model_layers` (the interchange layout used
    by exports, ports, and pp=1 runs)."""
    if "layers" in params and is_stacked(params["layers"]):
        params = dict(params)
        stacked = params["layers"]
        num_layers = int(jax.tree.leaves(stacked)[0].shape[0])
        params["layers"] = layer_seq(stacked, num_layers)
    return params


def gpipe_apply(
    layer_fn: Callable,
    stacked_layers,
    x: jax.Array,
    batched_consts: tuple,
    shared_consts: tuple,
    mesh: Mesh,
    *,
    num_layers: int,
    microbatches: int,
    pp_axis: str = "pp",
    batch_axes=("dp", "fsdp"),
    layer_specs=None,
):
    """Run ``x`` through ``num_layers`` stacked layers, pipelined over the
    mesh's ``pp`` axis.

    ``layer_fn(h, layer_params, global_layer_idx, mb_idx, *batched_mb,
    *shared) -> h`` — a single layer application. ``batched_consts`` are
    [B, ...] arrays that follow ``x``'s microbatch split (e.g. the frame
    mask); ``shared_consts`` are replicated (e.g. a dropout key).
    Requires ``num_layers % pp == 0`` and ``B_local % microbatches == 0``.

    ``layer_specs`` — PartitionSpec tree for ``stacked_layers`` (default:
    P(pp) on every leaf). Pass :func:`stacked_layer_specs` with tp > 1 to
    run Megatron-style tensor parallelism INSIDE the pipeline body: each
    (pp, tp) member then holds a [L/pp]-layer, width-sliced shard, and
    ``layer_fn`` must psum its row-parallel products over the tp axis
    (the models' tp-aware bodies do — models/{hubert,llama}.py)."""
    pp = mesh.shape.get(pp_axis, 1)
    if pp == 1:
        def step(h, xs_):
            lp, i = xs_
            return layer_fn(h, lp, i, jnp.int32(0), *batched_consts,
                            *shared_consts), None

        h, _ = jax.lax.scan(
            step, x, (stacked_layers, jnp.arange(num_layers)))
        return h

    assert num_layers % pp == 0, (num_layers, pp)
    l_per = num_layers // pp
    # clamp to the largest feasible microbatch count: m must divide the
    # per-dp-shard batch
    b_local_total = x.shape[0]
    for ax in batch_axes:
        b_local_total //= mesh.shape.get(ax, 1)
    m = max(1, min(microbatches, b_local_total))
    while b_local_total % m:
        m -= 1

    def body(stacked_local, x_local, batched_local, shared):
        # ZeRO-3 × pp: leaves whose spec carries 'fsdp' arrive width-sliced
        # (master residency); gather the full stage weights ONCE here — the
        # AD transpose turns each gather into one reduce-scatter of the
        # microbatch-accumulated grads at body exit, the standard ZeRO flow.
        if any("fsdp" in ((ax,) if not isinstance(ax, tuple) else ax)
               for spec in jax.tree.leaves(
                   layer_specs, is_leaf=lambda s: isinstance(s, P))
               for ax in spec if ax is not None):
            flat, treedef = jax.tree.flatten(stacked_local)
            specs = treedef.flatten_up_to(layer_specs)
            gathered = []
            for leaf, spec in zip(flat, specs):
                for i, ax in enumerate(spec):
                    axes = (ax,) if not isinstance(ax, tuple) else ax
                    if "fsdp" in axes:
                        assert ax == "fsdp", spec
                        leaf = jax.lax.all_gather(leaf, "fsdp", axis=i,
                                                  tiled=True)
                        break
                gathered.append(leaf)
            stacked_local = jax.tree.unflatten(treedef, gathered)
        pp_idx = jax.lax.axis_index(pp_axis)
        b_local = x_local.shape[0]
        assert b_local % m == 0, (b_local, m)
        mb = b_local // m
        xs = x_local.reshape(m, mb, *x_local.shape[1:])
        bcs = tuple(c.reshape(m, mb, *c.shape[1:]) for c in batched_local)

        def apply_stage(h, mb_idx, bc_mb):
            def lstep(h, xs_):
                lp, li = xs_
                gidx = pp_idx * l_per + li
                return layer_fn(h, lp, gidx, mb_idx, *bc_mb, *shared), None

            h, _ = jax.lax.scan(lstep, h, (stacked_local, jnp.arange(l_per)))
            return h

        perm = [(i, (i + 1) % pp) for i in range(pp)]

        def tick(act, t):
            mb_idx = jnp.clip(t - pp_idx, 0, m - 1)  # this stage's mb id
            inp = xs[jnp.clip(t, 0, m - 1)]
            act = jnp.where(pp_idx == 0, inp, act)
            bc_mb = tuple(c[mb_idx] for c in bcs)
            out = apply_stage(act, mb_idx, bc_mb)
            nxt = jax.lax.ppermute(out, pp_axis, perm)
            return nxt, out

        _, outs = jax.lax.scan(
            tick, jnp.zeros_like(xs[0]), jnp.arange(m + pp - 1))
        # the LAST stage emitted microbatch j at tick (pp-1) + j
        y = jax.lax.dynamic_slice_in_dim(outs, pp - 1, m, axis=0)
        y = y.reshape(b_local, *y.shape[2:])
        # replicate the result across the pp axis (other stages hold bubble
        # garbage): zero-and-psum
        y = jnp.where(pp_idx == pp - 1, y, jnp.zeros_like(y))
        return jax.lax.psum(y, pp_axis)

    bspec = P(batch_axes)
    if layer_specs is None:
        layer_specs = jax.tree.map(lambda _: P(pp_axis), stacked_layers)
    batched_specs = tuple(P(batch_axes) for _ in batched_consts)
    shared_specs = tuple(P() for _ in shared_consts)
    return shard_map(
        body, mesh=mesh,
        in_specs=(layer_specs, bspec, batched_specs, shared_specs),
        out_specs=bspec,
        check_rep=False,
    )(stacked_layers, x, tuple(batched_consts), tuple(shared_consts))
