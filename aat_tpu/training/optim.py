"""Optimizers.

Parity targets:
- AdamW with two weight-decay groups — wd=0.1 on every parameter that is not
  a bias and not a LayerNorm weight, wd=0.0 elsewhere (reference
  ``AATTrainer.create_optimizer``, src/aat/training/trainer.py:91-116).
- Adafactor — the reference vendors the fairseq implementation
  (src/aat/training/optimizers.py:6-208); optax.adafactor is the same
  algorithm (factored second moments, relative step sizes, RMS-scaled
  updates, update clipping).
- Freeze masks for the audio encoder / LM decoder
  (scripts/trainer_train.py:258-262): frozen subtrees receive zero updates
  and allocate no optimizer state.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def decay_mask(params) -> dict:
    """True where weight decay applies: ndim >= 2 kernels/embeddings, except
    LayerNorm/RMSNorm scales and biases (reference decay_parameters rule:
    non-bias, non-LayerNorm)."""

    def is_decay(path, leaf):
        name = _path_str(path).lower()
        if "bias" in name:
            return False
        if "norm" in name or "scale" in name:
            return False
        return jnp.ndim(leaf) >= 2

    return jax.tree_util.tree_map_with_path(is_decay, params)


def trainable_mask(
    params,
    train_audio_encoder: bool = True,
    train_lm_decoder: bool = False,
    frozen_prefixes: Sequence[str] = (),
) -> dict:
    """Freeze mask over the ASLM param tree layout
    {audio_encoder, adapter, lm_decoder}."""

    def is_trainable(path, _leaf):
        name = _path_str(path)
        if name.startswith("audio_encoder") and not train_audio_encoder:
            return False
        if name.startswith("lm_decoder") and not train_lm_decoder:
            return False
        return not any(name.startswith(p) for p in frozen_prefixes)

    return jax.tree_util.tree_map_with_path(is_trainable, params)


def adamw_grouped(
    learning_rate,
    params,
    weight_decay: float = 0.1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    grad_clip_norm: Optional[float] = None,
    freeze: Optional[dict] = None,
) -> optax.GradientTransformation:
    """AdamW with the reference's two-group weight decay and optional
    freeze mask / global-norm clipping."""
    mask = decay_mask(params)
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    chain.append(optax.add_decayed_weights(weight_decay, mask=mask))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    tx = optax.chain(*chain)
    if freeze is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", freeze),
        )
    return tx


def adafactor(
    learning_rate=None,
    weight_decay: float = 0.0,
    freeze: Optional[dict] = None,
) -> optax.GradientTransformation:
    """Fairseq-lineage Adafactor matching the reference's vendored variant
    (reference optimizers.py:6-208; same algorithm as
    ``transformers.optimization.Adafactor``, the parity oracle in
    tests/test_adafactor.py): relative-step schedule
    ``min(1e-2, 1/sqrt(t))`` when ``learning_rate`` is None, updates scaled
    by each parameter block's RMS (floor 1e-3), factored second moments for
    every >=2-D parameter (optax's default only factors dims >= 128), clip
    threshold 1.0, eps 1e-30.

    Known deviation: optax applies ``weight_decay_rate`` unscaled by the
    step size, fairseq scales decay by lr_t; the reference trains with
    weight_decay=0 for this optimizer so the paths agree there."""
    relative_step = learning_rate is None
    if relative_step:
        def learning_rate(step):
            return jnp.minimum(1e-2, jax.lax.rsqrt(step.astype(jnp.float32) + 1.0))

    tx = optax.adafactor(
        learning_rate=learning_rate,
        min_dim_size_to_factor=0,
        # HF Trainer's adafactor path (the way the reference actually runs
        # it) forces scale_parameter=False whenever an explicit lr is given;
        # fairseq's relative-step default keeps it on
        multiply_by_parameter_scale=relative_step,
        clipping_threshold=1.0,
        weight_decay_rate=weight_decay if weight_decay else None,
    )
    if freeze is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", freeze),
        )
    return tx


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


class GuardNonfiniteState(NamedTuple):
    total_notfinite: jnp.ndarray  # float32 scalar count of dropped steps
    inner_state: optax.OptState


def guard_nonfinite(inner: optax.GradientTransformation,
                    clip_norm: Optional[float] = None,
                    ) -> optax.GradientTransformation:
    """Non-finite-update guard with ``optax.apply_if_finite`` semantics
    (non-finite grads → zero update, inner state untouched, count bumped)
    but NONE of its cost structure.

    ``apply_if_finite`` measured 22.4 ms of an 89.5 ms flagship train step
    on v5e: a per-leaf isfinite-and-reduce over the whole grad tree
    (6.5 ms of is-finite_reduce fusions) plus a ``lax.cond`` wrapping the
    entire optimizer update, which forces XLA to copy params/opt-state
    buffers across the conditional boundary (~10 ms of copy ops) and blocks
    fusion. Here instead:

    * the predicate is ``isfinite(global_norm(grads))`` — ONE fused
      sum-of-squares reduce (inf/nan anywhere poisons the norm; a
      finite-but-1e20 grad overflows the square and also drops the step,
      which such a step deserves);
    * grads, the new inner state, and the updates are blended with the
      scalar predicate via ``jnp.where`` — XLA fuses a scalar select into
      the elementwise Adam kernels that already read both operands, so the
      no-cond path adds no memory traffic.

    ``clip_norm``: fold global-norm clipping into the SAME norm pass. A
    separate ``optax.clip_by_global_norm`` in the chain reads the whole
    grad tree once for its own norm and again for the scale multiply
    (~4 ms at flagship scale, 456M f32 grads); here the guard's norm is
    reused and the clip becomes one scalar factor — exact
    ``clip_by_global_norm`` semantics (scale = 1 if gn < clip else
    clip/gn) composed with the drop-to-zero on non-finite."""

    def init_fn(params):
        return GuardNonfiniteState(jnp.zeros((), jnp.float32),
                                   inner.init(params))

    def update_fn(updates, state, params=None):
        gn = optax.global_norm(updates)
        ok = jnp.isfinite(gn)
        if clip_norm is not None:
            scale = jnp.where(gn < clip_norm, 1.0, clip_norm / gn)
        else:
            scale = jnp.ones((), jnp.float32)
        # ok=False ⇒ factor 0 would leave NaN·0 = NaN, but every NaN lands
        # in state/updates that the ok-blends below discard; the explicit
        # where keeps the pre-Adam grads exactly zero on dropped steps.
        safe = jax.tree.map(
            lambda g: jnp.where(ok, g * scale.astype(g.dtype),
                                jnp.zeros((), g.dtype)), updates)
        new_updates, new_inner = inner.update(safe, state.inner_state, params)
        new_updates = jax.tree.map(
            lambda u: jnp.where(ok, u, jnp.zeros((), u.dtype)), new_updates)
        new_inner = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_inner, state.inner_state)
        return new_updates, GuardNonfiniteState(
            state.total_notfinite + (1.0 - ok.astype(jnp.float32)), new_inner)

    return optax.GradientTransformation(init_fn, update_fn)


class FusedGuardedAdamWState(NamedTuple):
    count: jnp.ndarray            # int32, number of APPLIED (finite) steps
    mu: optax.Updates             # first moments (MaskedNode on frozen leaves)
    nu: optax.Updates             # second moments
    total_notfinite: jnp.ndarray  # float32 count of dropped steps


def fused_guarded_adamw(
    learning_rate,
    params,
    weight_decay: float = 0.1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    clip_norm: Optional[float] = None,
    freeze: Optional[dict] = None,
) -> optax.GradientTransformation:
    """Single-pass AdamW with the non-finite guard and global-norm clip
    FUSED into the moment/update expressions.

    Produces the same values as ``guard_nonfinite(adamw_grouped(...),
    clip_norm=...)`` (tests/test_training.py pins the equivalence) but with
    one elementwise kernel per leaf instead of a transformation chain. The
    chain's cost structure at flagship scale (315M trained f32 params):
    optax stages materialize intermediate update trees between
    ``scale_by_adam`` / ``add_decayed_weights`` / ``scale_by_learning_rate``,
    and the guard's post-hoc ``where`` blends over updates + both moments
    re-read and re-write trees the Adam kernels just produced — measured
    14.5 ms (AdamW) + 9.6 ms (guard) of an 83 ms step on v5e. Here every
    leaf is one fused read(g, mu, nu, p) → write(mu', nu', update)
    expression (28 B/param of HBM traffic, the AdamW roofline) plus the
    single global-norm pass that the guard predicate and the folded clip
    share.

    Semantics (bit-matched to the chain):
    * moments: ``mu' = (1-b1)·g + b1·mu`` with ``g = where(ok, clip·grad, 0)``
      (optax ``update_moment`` expression order);
    * bias correction at ``count+1`` (``safe_increment``), learning rate
      evaluated at ``count`` — the pre-increment convention of
      ``scale_by_schedule``;
    * dropped steps (non-finite global grad norm): zero update, moments and
      count unchanged, ``total_notfinite`` bumped — ``apply_if_finite``
      drop semantics without its lax.cond;
    * weight decay ``+ wd·p`` on the reference's decay group only
      (non-bias, non-norm, ndim >= 2), applied before the lr scale;
    * frozen leaves (``freeze`` mask False): zero updates, ``MaskedNode``
      state (no memory), exactly like the ``multi_transform`` routing.

    Layout note (measured 2026-08-18, benchmarks/RESULTS.md): a flat-buffer
    variant — all trainable moments in one [n] f32 array, one monolithic
    update kernel — was built and A/B'd at flagship scale and lost by 17
    ms/step: XLA lowers the 390-leaf grad concatenate at 0.32 TB/s and
    pipelines the monolith worse than per-leaf fusions, while per-leaf
    small-kernel overhead is only ~0.2 ms/step. Per-leaf is the right
    layout on this compiler; don't re-flatten without re-measuring.
    """
    decay = decay_mask(params)
    is_node = lambda x: isinstance(x, optax.MaskedNode)  # noqa: E731
    train = (freeze if freeze is not None
             else jax.tree.map(lambda _: True, params))

    def init_fn(params):
        mu = jax.tree.map(
            lambda p, t: jnp.zeros_like(p) if t else optax.MaskedNode(),
            params, train)
        nu = jax.tree.map(
            lambda p, t: jnp.zeros_like(p) if t else optax.MaskedNode(),
            params, train)
        return FusedGuardedAdamWState(
            jnp.zeros((), jnp.int32), mu, nu, jnp.zeros((), jnp.float32))

    def update_fn(updates, state, params=None):
        gn = optax.global_norm(updates)
        ok = jnp.isfinite(gn)
        okf = ok.astype(jnp.float32)
        if clip_norm is not None:
            scale = jnp.where(gn < clip_norm, 1.0, clip_norm / gn)
        else:
            scale = jnp.ones((), jnp.float32)
        count_inc = optax.safe_increment(state.count)
        new_count = jnp.where(ok, count_inc, state.count)
        lr_t = (learning_rate(state.count) if callable(learning_rate)
                else jnp.asarray(learning_rate, jnp.float32))
        # optax.tree.bias_correction computes decay**count with the int32
        # count — keep the same expression for bit parity
        bc1 = 1.0 - b1 ** count_inc
        bc2 = 1.0 - b2 ** count_inc

        u_leaves, u_def = jax.tree.flatten(updates)
        mu_leaves = jax.tree.flatten(state.mu, is_leaf=is_node)[0]
        nu_leaves = jax.tree.flatten(state.nu, is_leaf=is_node)[0]
        p_leaves = jax.tree.flatten(params)[0]
        d_leaves = jax.tree.flatten(decay)[0]
        t_leaves = jax.tree.flatten(train)[0]

        new_u, new_mu, new_nu = [], [], []
        for g, m, v, p, d, t in zip(u_leaves, mu_leaves, nu_leaves,
                                    p_leaves, d_leaves, t_leaves):
            if not t:
                new_u.append(jnp.zeros_like(g))
                new_mu.append(optax.MaskedNode())
                new_nu.append(optax.MaskedNode())
                continue
            gs = jnp.where(ok, g * scale.astype(g.dtype),
                           jnp.zeros((), g.dtype))
            m_ok = (1.0 - b1) * gs + b1 * m
            v_ok = (1.0 - b2) * (gs ** 2) + b2 * v
            direction = (m_ok / bc1) / (jnp.sqrt(v_ok / bc2) + eps)
            if d:
                direction = direction + weight_decay * p
            upd = (-lr_t).astype(g.dtype) * direction
            new_u.append(jnp.where(ok, upd, jnp.zeros((), upd.dtype)))
            new_mu.append(jnp.where(ok, m_ok, m))
            new_nu.append(jnp.where(ok, v_ok, v))
        return u_def.unflatten(new_u), FusedGuardedAdamWState(
            new_count, u_def.unflatten(new_mu), u_def.unflatten(new_nu),
            state.total_notfinite + (1.0 - okf))

    return optax.GradientTransformation(init_fn, update_fn)


def merge_matching_state(old_state, new_state):
    """Carry optimizer-state leaves from ``old_state`` into ``new_state``
    wherever path, shape and dtype match.

    Used when the optimizer is rebuilt mid-run (e.g. unfreezing the LM
    decoder): previously-trainable subtrees keep their accumulated Adam
    moments; newly trainable leaves (absent from the old state — they were
    ``MaskedNode``s) start fresh. Matches the reference behavior where HF
    Trainer's torch optimizer keeps per-param state across a
    requires_grad flip and only lazily creates state for new params.
    (Shared scalars such as Adam's step count are carried over too, so the
    new group's bias correction starts at the current step rather than 0 —
    a deliberate simplification over torch's per-param step.)
    """
    old_leaves = {
        jax.tree_util.keystr(p): leaf
        for p, leaf in jax.tree_util.tree_flatten_with_path(old_state)[0]
    }

    def pick(path, new_leaf):
        old = old_leaves.get(jax.tree_util.keystr(path))
        if (
            old is not None
            and getattr(old, "shape", None) == getattr(new_leaf, "shape", None)
            and getattr(old, "dtype", None) == getattr(new_leaf, "dtype", None)
        ):
            return old
        return new_leaf

    return jax.tree_util.tree_map_with_path(pick, new_state)
