"""LR schedules.

Parity: ``WarmupLRScheduler`` (/root/reference/src/aat/lr_scheduler.py:6-61):
linear warmup to base LR over ``warmup_steps``, linear anneal down to
``start_lr_from`` at ``max_steps``, then hold at ``start_lr_from``.
Implemented as an optax-compatible scalar schedule (jit-friendly branchless
form).
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_linear_schedule(
    base_lr: float,
    warmup_steps: int,
    max_steps: int,
    start_lr_from: float = 1e-5,
):
    """step → lr, matching the reference's per-step piecewise rule.

    Note the reference's ``_step_count`` starts at 1 (torch semantics); we
    evaluate at ``step + 1`` to match its values step-for-step.
    """

    def schedule(step):
        s = jnp.asarray(step, jnp.float32) + 1.0
        warm = base_lr * s / max(warmup_steps, 1)
        anneal_total = max(max_steps - warmup_steps, 1)
        decrement = (base_lr - start_lr_from) / anneal_total
        anneal = base_lr - (s - warmup_steps) * decrement
        lr = jnp.where(
            s > max_steps,
            start_lr_from,
            jnp.where(s > warmup_steps, anneal, warm),
        )
        return lr

    return schedule
