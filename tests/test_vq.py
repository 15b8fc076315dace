"""VQ kernel tests: XLA vs numpy oracle, Pallas vs XLA, straight-through
gradients, EMA updates."""

import numpy as np

import jax
import jax.numpy as jnp

from aat_tpu.ops import vq


def test_nearest_codebook_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (37, 16)).astype(np.float32)
    cb = rng.normal(0, 1, (50, 16)).astype(np.float32)
    idx, quant = vq.nearest_codebook(jnp.asarray(x), jnp.asarray(cb))
    ref = np.argmin(((x[:, None, :] - cb[None, :, :]) ** 2).sum(-1), axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), ref)
    np.testing.assert_array_equal(np.asarray(quant), cb[ref])


def test_nearest_codebook_pallas_matches_xla():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (300, 32)).astype(np.float32)
    cb = rng.normal(0, 1, (600, 32)).astype(np.float32)
    idx_x, _ = vq.nearest_codebook(jnp.asarray(x), jnp.asarray(cb))
    idx_p, _ = vq.nearest_codebook_pallas(jnp.asarray(x), jnp.asarray(cb))
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))


def test_vq_straight_through_gradient():
    state = vq.init_vq_state(0, 8, 4)
    x = jnp.asarray(np.random.default_rng(2).normal(0, 1, (5, 4)).astype(np.float32))

    def f(x):
        q, _, loss = vq.vq_forward(state, x)
        return jnp.sum(q * 2.0) + loss

    g = jax.grad(f)(x)
    # straight-through: the quantized term passes gradient 2.0 to x;
    # commitment adds beta * 2 * (x - q)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 1.0


def test_vq_ema_moves_codes_toward_data():
    state = vq.init_vq_state(0, 4, 2)
    data = jnp.asarray(np.full((64, 2), 3.0, np.float32))
    for _ in range(20):
        idx, _ = vq.nearest_codebook(data, state.codebook)
        state = vq.vq_ema_update(state, data, idx, decay=0.5)
    used = np.unique(np.asarray(idx))
    for u in used:
        np.testing.assert_allclose(np.asarray(state.codebook)[u], [3.0, 3.0], atol=0.2)
