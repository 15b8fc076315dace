"""Nearest-codebook quantization of segment embeddings.

North-star component (BASELINE.json): "codebook quantization of segment
embeddings is a fused nearest-codebook argmin kernel". In the reference this
capability is only vestigial (``speechtokenizer`` imported but never used,
scripts/trainer_train.py:27); here it is a first-class op:

- :func:`nearest_codebook` — XLA path: one ``[N, D] @ [D, K]`` MXU GEMM plus
  norm terms, argmin over codes.
- :func:`nearest_codebook_pallas` — fused Pallas kernel: distance GEMM,
  running argmin over codebook tiles, and quantized-output gather stay in
  VMEM.
- :class:`VectorQuantizer` — straight-through estimator + commitment loss +
  EMA codebook updates for end-to-end training.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@jax.jit
def nearest_codebook(
    embeddings: jnp.ndarray, codebook: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (indices [N], quantized [N, D]).

    Squared-L2 nearest code: ||x-c||² = ||x||² - 2 x·c + ||c||²; the ||x||²
    term is argmin-invariant and dropped.
    """
    scores = jnp.einsum(
        "nd,kd->nk", embeddings, codebook, preferred_element_type=jnp.float32
    )
    dist = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)[None, :] - 2.0 * scores
    indices = jnp.argmin(dist, axis=-1)
    return indices, codebook[indices]


_TILE_N = 256
_TILE_K = 512


def _make_vq_kernel(num_codes: int):
    def kernel(x_ref, cb_ref, cbn_ref, idx_ref, dist_ref):
        """Grid: (N tiles, K tiles). Running min + first-match index across
        codebook tiles. Mosaic lowers jnp.argmin / int32 vector reductions
        ~250x slower than f32 ones (measured), so the index is recovered
        arithmetically in f32: min over (code_id where dist == row_min),
        code ids < 2^24 are exact in f32. Overhanging codebook columns are
        masked out.
        """
        kt = pl.program_id(1)
        big = jnp.float32(1e30)

        scores = jnp.dot(
            x_ref[:], cb_ref[:].T, preferred_element_type=jnp.float32
        )  # [TN, TK]
        dist = cbn_ref[:] - 2.0 * scores  # [TN, TK] (+||x||² dropped)
        code_ids = (kt * _TILE_K + jax.lax.broadcasted_iota(
            jnp.int32, dist.shape, dimension=1
        )).astype(jnp.float32)
        valid = code_ids < num_codes
        dist = jnp.where(valid, dist, big)
        local_min = jnp.min(dist, axis=-1)  # [TN]
        local_arg = jnp.min(
            jnp.where(dist <= local_min[:, None], code_ids, big), axis=-1
        )  # first matching code id, as f32

        @pl.when(kt == 0)
        def _():
            dist_ref[:] = local_min[:, None]
            idx_ref[:] = local_arg[:, None]

        @pl.when(kt > 0)
        def _():
            better = local_min < dist_ref[:, 0]
            dist_ref[:] = jnp.where(better, local_min, dist_ref[:, 0])[:, None]
            idx_ref[:] = jnp.where(better, local_arg, idx_ref[:, 0])[:, None]

    return kernel


@jax.jit
def nearest_codebook_pallas(
    embeddings: jnp.ndarray, codebook: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused Pallas nearest-codebook argmin (same contract as
    :func:`nearest_codebook`)."""
    n, d = embeddings.shape
    k = codebook.shape[0]
    cb_norms = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)[None, :]  # [1, K]

    grid = (pl.cdiv(n, _TILE_N), pl.cdiv(k, _TILE_K))
    idx, _dist = pl.pallas_call(
        _make_vq_kernel(k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_N, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_K, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_K), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE_N, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(embeddings, codebook, cb_norms)
    indices = idx[:, 0].astype(jnp.int32)
    return indices, codebook[indices]


class VQState(NamedTuple):
    codebook: jnp.ndarray  # [K, D]
    ema_counts: jnp.ndarray  # [K]
    ema_sums: jnp.ndarray  # [K, D]


def init_vq_state(rng, num_codes: int, dim: int) -> VQState:
    from aat_tpu.models.hubert import np_rng_from

    r = np_rng_from(rng)
    codebook = r.normal(0, 1.0, (num_codes, dim)).astype(np.float32)
    return VQState(
        jnp.asarray(codebook),
        jnp.ones((num_codes,), jnp.float32),
        jnp.asarray(codebook),
    )


@functools.partial(jax.jit, static_argnames=("beta",))
def vq_forward(
    state: VQState, embeddings: jnp.ndarray, beta: float = 0.25
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Straight-through VQ: → (quantized_st, indices, commitment_loss)."""
    indices, quantized = nearest_codebook(embeddings, state.codebook)
    commit = jnp.mean(jnp.sum((embeddings - jax.lax.stop_gradient(quantized)) ** 2, -1))
    codebook_loss = jnp.mean(
        jnp.sum((jax.lax.stop_gradient(embeddings) - quantized) ** 2, -1)
    )
    loss = codebook_loss + beta * commit
    quantized_st = embeddings + jax.lax.stop_gradient(quantized - embeddings)
    return quantized_st, indices, loss


@functools.partial(jax.jit, static_argnames=("decay",))
def vq_ema_update(
    state: VQState, embeddings: jnp.ndarray, indices: jnp.ndarray, decay: float = 0.99
) -> VQState:
    """EMA codebook update (k-means style), fully on-device scatter."""
    k = state.codebook.shape[0]
    one_hot = jax.nn.one_hot(indices, k, dtype=jnp.float32)  # [N, K]
    counts = one_hot.sum(0)
    sums = jnp.einsum("nk,nd->kd", one_hot, embeddings,
                      preferred_element_type=jnp.float32)
    new_counts = decay * state.ema_counts + (1 - decay) * counts
    new_sums = decay * state.ema_sums + (1 - decay) * sums
    new_codebook = new_sums / jnp.maximum(new_counts, 1e-5)[:, None]
    return VQState(new_codebook, new_counts, new_sums)
