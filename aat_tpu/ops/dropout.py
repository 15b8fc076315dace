"""Inverted dropout for the training path.

The reference trains torch modules in train mode, so HuBERT hidden /
activation / feature-projection dropout and the pooling head's
``nn.TransformerEncoderLayer`` dropout=0.1 all apply during training
(/root/reference/src/aslm/modeling_aslm.py:29-36, HF Hubert train mode).
Convention across the TPU build: dropout is active iff a PRNG key is passed
— eval paths simply never pass one, so they stay deterministic with no
mode flags to keep in sync.

Attention-probability dropout lives in the flash kernel instead
(aat_tpu.ops.attention: position-hash mask, regenerated in the backward).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _mix32(x):
    """murmur3 finalizer on int32 (same recipe as the flash kernel's
    position-hash dropout, ops/attention.py)."""
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * np.int32(-2048144789)  # 0x85ebca6b
    x = x ^ jax.lax.shift_right_logical(x, 13)
    x = x * np.int32(-1028477387)  # 0xc2b2ae35
    return x ^ jax.lax.shift_right_logical(x, 16)


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Train-mode inverted dropout (torch semantics: zero with probability
    ``rate``, scale survivors by 1/(1-rate)). Identity when ``rng`` is None
    or ``rate`` is 0.

    The keep mask hashes flat element positions with a murmur3 finalizer
    under one scalar seed drawn from ``rng`` — NOT jax.random.bernoulli:
    threefry mask generation measured ~20 ms of a 102 ms flagship train
    step (75 mask sites over [128·12, 1024] activations); the counter hash
    is a fraction of that, and being position-keyed it is invariant to
    sharding layout by construction (the multichip dropout-invariance test
    relies on this for the attention kernel's masks already)."""
    if rng is None or rate <= 0.0:
        return x
    seed = jax.random.bits(rng, dtype=jnp.uint32).astype(jnp.int32)  # scalar
    idx = jax.lax.iota(jnp.int32, x.size).reshape(x.shape)
    h = _mix32(idx ^ seed)
    u = jax.lax.shift_right_logical(h, 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.where(u >= rate, x * (1.0 / (1.0 - rate)), jnp.zeros((), x.dtype))


def attention_seed(rng: Optional[jax.Array]):
    """Derive an int32 seed for the flash kernel's position-hash dropout."""
    if rng is None:
        return None
    return jax.random.randint(rng, (), -(2 ** 31), 2 ** 31 - 1, dtype=jnp.int32)
