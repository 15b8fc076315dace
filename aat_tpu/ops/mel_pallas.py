"""Fused Pallas TPU kernel for the mel frontend's post-framing pipeline.

One kernel computes, per tile of frames, entirely in VMEM:

    DFT GEMM  [TILE, 400] @ [400, 512]   (cos | sin windowed basis, lane-padded)
    power     re^2 + im^2                (VPU, fused)
    mel GEMM  [TILE, 256] @ [256, 128]   (bin/lane-padded slaney filters)
    log10                                 (VPU, fused)

avoiding the HBM round-trips between the two GEMMs. Lane dimensions are
padded to multiples of 128 so both matmuls tile cleanly onto the MXU:
201 DFT bins → 256 lanes per (cos, sin) half, 64 mel channels → 128 lanes
(the pad region multiplies against zero filters and is cropped on return).

Reference behavior being accelerated: ``get_melspec``
(/root/reference/src/aat/tokenizer.py:107-119).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aat_tpu.ops.mel import MEL_FLOOR

_FRAME_TILE = 256
_BIN_PAD = 256  # 201 rfft bins padded up
_MEL_PAD = 128  # 64 mel channels padded up


def _mel_kernel(frames_ref, basis_ref, mel_ref, out_ref):
    # precision=HIGHEST keeps the MXU in full-f32 passes (see ops/mel.py);
    # boundary parity downstream depends on it.
    frames = frames_ref[:]
    spec = jnp.dot(frames, basis_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    power = spec[:, :_BIN_PAD] ** 2 + spec[:, _BIN_PAD:] ** 2
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = jnp.log10(jnp.maximum(MEL_FLOOR, mel))


@functools.lru_cache(maxsize=4)
def _padded_constants(n_fft: int, bins: int, n_mels: int):
    """Build lane-padded basis/filters from the unpadded float32 constants."""
    from aat_tpu.ops.mel import _dft_mel_constants

    basis, mel_filters = _dft_mel_constants(n_fft, n_mels, 16000, 8000.0)
    cos, sin = basis[:, :bins], basis[:, bins:]
    basis_padded = np.zeros((n_fft, 2 * _BIN_PAD), dtype=np.float32)
    basis_padded[:, :bins] = cos
    basis_padded[:, _BIN_PAD : _BIN_PAD + bins] = sin
    mel_padded = np.zeros((_BIN_PAD, _MEL_PAD), dtype=np.float32)
    mel_padded[:bins, :n_mels] = mel_filters
    return basis_padded, mel_padded


def fused_melspec_pallas(
    frames: jnp.ndarray, basis: jnp.ndarray, mel_filters: jnp.ndarray
) -> jnp.ndarray:
    """frames ``[..., T, n_fft]`` → log-mel ``[..., T, n_mels]``.

    ``basis``/``mel_filters`` arguments define the (unpadded) shapes; the
    kernel uses cached lane-padded copies of the same constants.
    """
    n_fft = frames.shape[-1]
    bins = basis.shape[1] // 2
    n_mels = mel_filters.shape[1]
    basis_padded, mel_padded = _padded_constants(n_fft, bins, n_mels)

    lead = frames.shape[:-2]
    t = frames.shape[-2]
    flat = frames.reshape((-1, n_fft))
    total = flat.shape[0]

    grid = (pl.cdiv(total, _FRAME_TILE),)
    out = pl.pallas_call(
        _mel_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_FRAME_TILE, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, 2 * _BIN_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BIN_PAD, _MEL_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_FRAME_TILE, _MEL_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, _MEL_PAD), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * total * n_fft * 2 * _BIN_PAD + 2 * total * _BIN_PAD * _MEL_PAD,
            bytes_accessed=4 * (total * n_fft + n_fft * 2 * _BIN_PAD + total * _MEL_PAD),
            transcendentals=total * _MEL_PAD,
        ),
        interpret=jax.default_backend() != "tpu",
    )(flat, jnp.asarray(basis_padded), jnp.asarray(mel_padded))

    return out[:, :n_mels].reshape(lead + (t, n_mels))
