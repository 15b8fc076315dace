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


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Train-mode inverted dropout (torch semantics: zero with probability
    ``rate``, scale survivors by 1/(1-rate)). Identity when ``rng`` is None
    or ``rate`` is 0."""
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))


def attention_seed(rng: Optional[jax.Array]):
    """Derive an int32 seed for the flash kernel's position-hash dropout."""
    if rng is None:
        return None
    return jax.random.randint(rng, (), -(2 ** 31), 2 ** 31 - 1, dtype=jnp.int32)
