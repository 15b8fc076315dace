"""Sequence parallelism for whole-utterance encoding (Ulysses-style).

The reference has no sequence/context parallelism (SURVEY §2: sequence-
length scaling is algorithmic — adaptive segmentation). This module adds
the attention-level axis the TPU build needs once whole utterances
(T≈1500 HuBERT frames, 30 s audio) are trained across chips:

* Between layers, activations shard the TIME dimension over the mesh's
  ``sp`` axis — LayerNorm/FFN/projections are position-wise, so XLA keeps
  them sharded with zero communication.
* Attention needs every key: :func:`ulysses_attention_bthd` re-shards
  inside a ``shard_map`` with two ``all_to_all``s (time-sharded →
  head-sharded and back, the DeepSpeed-Ulysses recipe) so each device runs
  the FUSED Pallas flash kernel over the full sequence for its slice of
  heads. Communication per layer is 3 all_to_alls in + 1 out of
  [B, T, H, D] activations over ICI — O(B·T·H·D / sp) per device, vs the
  O(T²) attention compute it enables splitting.

Composes with the other mesh axes: batch stays data-parallel
(``dp``/``fsdp``), and tensor parallelism may also shard heads — inside
the shard_map each device sees H/(tp·sp) heads over the full T.
Requires ``num_heads % (tp * sp) == 0`` and ``T % sp == 0`` (padded
upstream by the caller).

Dropout note: the in-kernel position-hash attention dropout keys on the
KERNEL-LOCAL head index; a per-shard seed salt (axis_index × odd constant)
keeps every head group's masks DISTINCT across sp shards (without it all
shards would regenerate identical masks for their local head groups).
Masks are therefore valid and shard-unique but not bit-identical to a
1-chip run; equivalence tests run sp with attention dropout off (other
dropout sites key on absolute positions and match exactly).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map
    import inspect as _inspect

    if "check_vma" in _inspect.signature(_shard_map).parameters:
        # jax >= 0.8: check_vma replaces check_rep
        def shard_map(f, **kw):
            kw["check_vma"] = kw.pop("check_rep")
            return _shard_map(f, **kw)
    else:  # pragma: no cover — jax exposing shard_map with check_rep
        shard_map = _shard_map
except ImportError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map


def ulysses_attention_bthd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array,
    mesh: Mesh,
    *,
    sm_scale: Optional[float] = None,
    use_pallas: bool = True,
    dropout_rate: float = 0.0,
    dropout_seed=None,
    sp_axis: str = "sp",
    batch_axes=("dp", "fsdp"),
    head_axis: Optional[str] = "tp",
):
    """Sequence-parallel attention over [B, T, H, D] operands.

    Inputs are global arrays whose time dimension is (to be) sharded over
    ``sp_axis``; the result has the same global shape/sharding. Falls back
    to plain :func:`aat_tpu.ops.attention.attention_bthd` when the mesh has
    no sp extent.
    """
    from aat_tpu.ops.attention import attention_bthd

    sp = mesh.shape.get(sp_axis, 1)
    if sp == 1:
        return attention_bthd(
            q, k, v, key_mask, sm_scale=sm_scale, use_pallas=use_pallas,
            dropout_rate=dropout_rate, dropout_seed=dropout_seed)

    b, t, h, d = q.shape
    tp = mesh.shape.get(head_axis, 1) if head_axis else 1
    assert h % (sp * tp) == 0, f"H={h} not divisible by sp*tp={sp * tp}"
    # pad T to a multiple of sp: padded keys are masked out (bias -inf),
    # padded query rows are sliced off below
    tp_len = -(-t // sp) * sp
    if tp_len != t:
        widths = [(0, 0), (0, tp_len - t), (0, 0), (0, 0)]
        q, k, v = (jnp.pad(x, widths) for x in (q, k, v))
        key_mask = jnp.pad(key_mask, [(0, 0), (0, tp_len - t)])

    def body(q, k, v, m):
        # local: [B', T/sp, H', D] → all_to_all → [B', T, H'/sp, D]
        def to_heads(x):
            return jax.lax.all_to_all(
                x, sp_axis, split_axis=2, concat_axis=1, tiled=True)

        qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
        m_full = jax.lax.all_gather(m, sp_axis, axis=1, tiled=True)
        seed = dropout_seed
        if seed is not None and dropout_rate > 0.0:
            # the dropout hash keys on the KERNEL-LOCAL head index; without
            # a per-shard seed offset every sp shard would regenerate the
            # SAME masks for its local head group (duplicated, not
            # independent, regularization). Salting by the shard index makes
            # each head group's masks distinct (though not bit-identical to
            # a 1-device run — see the module docstring).
            seed = (jnp.asarray(seed, jnp.int32)
                    + jax.lax.axis_index(sp_axis) * jnp.int32(0x27D4EB2F))
        ctx = attention_bthd(
            qh, kh, vh, m_full, sm_scale=sm_scale, use_pallas=use_pallas,
            dropout_rate=dropout_rate, dropout_seed=seed)
        # [B', T, H'/sp, D] → [B', T/sp, H', D]
        return jax.lax.all_to_all(
            ctx, sp_axis, split_axis=1, concat_axis=2, tiled=True)

    spec4 = P(batch_axes, sp_axis, head_axis, None)
    spec2 = P(batch_axes, sp_axis)
    out = shard_map(
        body, mesh=mesh,
        in_specs=(spec4, spec4, spec4, spec2),
        out_specs=spec4,
        check_rep=False,
    )(q, k, v, key_mask)
    return out[:, :t] if tp_len != t else out
