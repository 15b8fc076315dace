"""Flash attention kernel: forward/grad parity vs XLA reference, causal and
padding masking, and model integration (hubert/llama with attention_impl=
'pallas' matching 'xla'). Pallas runs in interpret mode on CPU — keep
shapes tiny."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aat_tpu.ops.attention import _reference_attention, attention, flash_attention


def make_qkv(rng, b=2, h=2, t=8, s=8, d=8):
    q = rng.normal(0, 1, (b, h, t, d)).astype(np.float32)
    k = rng.normal(0, 1, (b, h, s, d)).astype(np.float32)
    v = rng.normal(0, 1, (b, h, s, d)).astype(np.float32)
    mask = np.ones((b, s), np.int32)
    mask[1, s // 2 :] = 0
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_reference(rng, causal):
    q, k, v, mask = make_qkv(np.random.default_rng(0))
    ours = np.asarray(flash_attention(q, k, v, mask, causal, None))
    ref = np.asarray(_reference_attention(q, k, v, mask, causal, q.shape[-1] ** -0.5))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_attention_bthd_matches_bhtd_layout(causal):
    """attention_bthd([B,T,H,D]) must equal attention([B,H,T,D]) bitwise-ish
    in every mode: plain, GQA, and position-hash dropout."""
    from aat_tpu.ops.attention import attention_bthd

    rng = np.random.default_rng(7)
    for kvh, seed in ((4, None), (2, None), (4, 123)):
        b, h, t, s, d = 2, 4, 8, 8, 8
        q = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, kvh, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, kvh, s, d)).astype(np.float32))
        mask = np.ones((b, s), np.int32)
        mask[1, s // 2:] = 0
        mask = jnp.asarray(mask)
        rate = 0.25 if seed is not None else 0.0
        ref = attention(q, k, v, mask, causal, None, use_pallas=False,
                        dropout_rate=rate, dropout_seed=seed)
        got = attention_bthd(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), mask, causal, None, use_pallas=False,
            dropout_rate=rate, dropout_seed=seed)
        np.testing.assert_allclose(
            np.asarray(got.transpose(0, 2, 1, 3)), np.asarray(ref),
            atol=1e-6, err_msg=f"kvh={kvh} seed={seed} causal={causal}")


def test_attention_bthd_pallas_route_matches_xla(monkeypatch):
    """Above MIN_PALLAS_SEQ_LEN the bthd wrapper transposes into the fused
    kernel; force the threshold down and check both routes agree."""
    import aat_tpu.ops.attention as att_mod
    from aat_tpu.ops.attention import attention_bthd

    monkeypatch.setattr(att_mod, "MIN_PALLAS_SEQ_LEN", 1)
    rng = np.random.default_rng(8)
    b, h, t, d = 2, 2, 8, 8
    q = jnp.asarray(rng.normal(0, 1, (b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (b, t, h, d)).astype(np.float32))
    mask = jnp.ones((b, t), jnp.int32)
    got = attention_bthd(q, k, v, mask, False, None, use_pallas=True)
    ref = attention_bthd(q, k, v, mask, False, None, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_flash_gradients_match_reference():
    q, k, v, mask = make_qkv(np.random.default_rng(1))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, False, None) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, mask, False, q.shape[-1] ** -0.5) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_hubert_pallas_attention_matches_xla(monkeypatch):
    import dataclasses

    import aat_tpu.ops.attention as attn_mod
    from aat_tpu.models import hubert as hub

    # tiny test sequences are below the production threshold; force the
    # kernel path so the integration is actually exercised
    monkeypatch.setattr(attn_mod, "MIN_PALLAS_SEQ_LEN", 1)

    cfg = hub.tiny_test_config()
    params = hub.init_hubert_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    wav = rng.normal(0, 0.5, (2, 900)).astype(np.float32)
    mask = np.ones((2, 900), np.int64)
    mask[1, 600:] = 0

    out_xla, fm = hub.hubert_encode(params, cfg, jnp.asarray(wav), jnp.asarray(mask))
    cfg_p = dataclasses.replace(cfg, attention_impl="pallas")
    out_pls, _ = hub.hubert_encode(params, cfg_p, jnp.asarray(wav), jnp.asarray(mask))
    fm = np.asarray(fm)
    diff = np.abs(np.asarray(out_xla) - np.asarray(out_pls))[fm]
    assert diff.max() < 1e-4


def test_llama_pallas_attention_matches_xla(monkeypatch):
    import dataclasses

    import aat_tpu.ops.attention as attn_mod
    from aat_tpu.models import llama as llm

    monkeypatch.setattr(attn_mod, "MIN_PALLAS_SEQ_LEN", 1)

    cfg = llm.tiny_test_config()
    params = llm.init_llama_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, (2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 9:] = 0

    out_xla, _ = llm.llama_forward(
        params, cfg, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask)
    )
    cfg_p = dataclasses.replace(cfg, attention_impl="pallas")
    out_pls, _ = llm.llama_forward(
        params, cfg_p, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask)
    )
    valid = mask.astype(bool)
    diff = np.abs(np.asarray(out_xla) - np.asarray(out_pls))[valid]
    assert diff.max() < 2e-4


@pytest.mark.parametrize("causal", [False, True])
def test_multiblock_online_softmax_matches_reference(monkeypatch, causal):
    """t=s=320 with 128-blocks: multiple k-tiles (online rescaling), multiple
    q-tiles, and non-divisible padding (320 → 384) — fwd and grads."""
    import aat_tpu.ops.attention as attn_mod

    monkeypatch.setattr(attn_mod, "_MAX_BLOCK", 128)   # forward tiles
    monkeypatch.setattr(attn_mod, "_BLOCK_Q", 128)     # backward tiles
    monkeypatch.setattr(attn_mod, "_BLOCK_K", 128)
    rng = np.random.default_rng(7)
    q, k, v, mask = make_qkv(rng, b=2, h=2, t=320, s=320, d=8)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, causal, None) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            _reference_attention(q, k, v, mask, causal, q.shape[-1] ** -0.5) ** 2
        )

    ours = np.asarray(flash_attention(q, k, v, mask, causal, None))
    ref = np.asarray(_reference_attention(q, k, v, mask, causal, q.shape[-1] ** -0.5))
    np.testing.assert_allclose(ours, ref, atol=2e-5)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("causal", [False, True])
def test_gqa_fewer_kv_heads(causal):
    """k/v with fewer heads than q (SmolLM: 9 q / 3 kv): the kernel maps
    shared kv blocks through the index map; grads reduce over the group."""
    rng = np.random.default_rng(8)
    b, h, kvh, t, d = 2, 4, 2, 16, 8
    q = jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (b, kvh, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (b, kvh, t, d)).astype(np.float32))
    mask = np.ones((b, t), np.int32)
    mask[1, t // 2 :] = 0
    mask = jnp.asarray(mask)

    ours = np.asarray(flash_attention(q, k, v, mask, causal, None))
    ref = np.asarray(_reference_attention(q, k, v, mask, causal, d ** -0.5))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, causal, None) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, mask, causal, d ** -0.5) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_fully_masked_batch_row_is_zero_and_grad_finite():
    """A batch row whose keys are all masked must produce zeros (not a
    garbage softmax) and finite, zero gradients for that row."""
    rng = np.random.default_rng(9)
    q, k, v, _ = make_qkv(rng, b=2, h=2, t=8, s=8, d=8)
    mask = np.ones((2, 8), np.int32)
    mask[1, :] = 0
    mask = jnp.asarray(mask)

    out = np.asarray(flash_attention(q, k, v, mask, False, None))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out[1], 0.0, atol=0)

    g = jax.grad(lambda q, k, v: jnp.sum(flash_attention(q, k, v, mask, False, None)),
                 argnums=(0, 1, 2))(q, k, v)
    for arr in g:
        arr = np.asarray(arr)
        assert np.all(np.isfinite(arr))
        np.testing.assert_allclose(arr[1], 0.0, atol=0)


def test_bf16_matches_f32_reference():
    rng = np.random.default_rng(10)
    q, k, v, mask = make_qkv(rng, b=2, h=2, t=16, s=16, d=8)
    out16 = np.asarray(
        flash_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                        v.astype(jnp.bfloat16), mask, False, None)
    ).astype(np.float32)
    ref = np.asarray(_reference_attention(q, k, v, mask, False, q.shape[-1] ** -0.5))
    np.testing.assert_allclose(out16, ref, atol=3e-2)


@pytest.mark.parametrize("causal", [False, True])
def test_attention_dropout_kernel_matches_xla_twin(monkeypatch, causal):
    """The kernel's in-kernel dropout and the XLA reference share the same
    position-hash keep-mask: with the same integer seed the two paths must
    drop the SAME probabilities — outputs and grads match exactly (up to
    matmul rounding). Small blocks force multi-tile mask regeneration."""
    import aat_tpu.ops.attention as attn_mod

    monkeypatch.setattr(attn_mod, "_MAX_BLOCK", 128)
    monkeypatch.setattr(attn_mod, "_BLOCK_Q", 128)
    monkeypatch.setattr(attn_mod, "_BLOCK_K", 128)
    rng = np.random.default_rng(11)
    q, k, v, mask = make_qkv(rng, b=2, h=2, t=160, s=160, d=8)
    rate, seed = 0.3, 1234

    ours = np.asarray(flash_attention(q, k, v, mask, causal, None, rate, seed))
    ref = np.asarray(_reference_attention(
        q, k, v, mask, causal, q.shape[-1] ** -0.5, rate, seed))
    np.testing.assert_allclose(ours, ref, atol=2e-5)

    gf = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, mask, causal, None, rate, seed) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(
        _reference_attention(q, k, v, mask, causal, q.shape[-1] ** -0.5,
                             rate, seed) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_attention_dropout_statistics_and_eval_mode():
    rng = np.random.default_rng(12)
    q, k, v, mask = make_qkv(rng, b=2, h=2, t=32, s=32, d=8)
    rate = 0.25

    # eval mode: no seed → deterministic, equals the no-dropout output
    base = np.asarray(flash_attention(q, k, v, mask, False, None))
    evalmode = np.asarray(flash_attention(q, k, v, mask, False, None, rate, None))
    np.testing.assert_array_equal(base, evalmode)

    # same seed → identical; different seeds → different
    a = np.asarray(flash_attention(q, k, v, mask, False, None, rate, 7))
    b = np.asarray(flash_attention(q, k, v, mask, False, None, rate, 7))
    c = np.asarray(flash_attention(q, k, v, mask, False, None, rate, 8))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-6

    # inverted dropout: the mean over many seeds approaches the base output
    acc = np.zeros_like(base)
    n = 64
    for s_ in range(n):
        acc += np.asarray(flash_attention(q, k, v, mask, False, None, rate, s_))
    mean = acc / n
    # tolerance ~ sigma/sqrt(n); attention outputs are O(1)
    assert np.abs(mean - base).mean() < 0.05

    # drop fraction on the probabilities: measure via the XLA twin's mask
    import aat_tpu.ops.attention as attn_mod
    head = jnp.arange(4, dtype=jnp.int32).reshape(2, 2, 1, 1)
    q_pos = jnp.arange(32, dtype=jnp.int32)[:, None]
    k_pos = jnp.arange(32, dtype=jnp.int32)[None, :]
    keep = np.asarray(attn_mod._keep_from_positions(
        jnp.int32(7) + head * attn_mod._GOLDEN, q_pos, k_pos, 32, rate))
    frac = 1.0 - keep.mean()
    assert abs(frac - rate) < 0.03


@pytest.mark.parametrize("causal", [False, True])
def test_fused_backward_accum_modes_match(monkeypatch, causal):
    """dk/dv scratch accumulation strategies (dynamic / static / parity —
    see ops/attention._BWD_ACCUM_MODES) are pure scheduling variants: grads
    must match the default bitwise. 128-blocks at t=s=320 force multiple
    k-blocks so the static unroll and parity double-buffering both engage."""
    import aat_tpu.ops.attention as attn_mod

    monkeypatch.setattr(attn_mod, "_FUSED_BLOCKS_CAUSAL", (128, 128))
    monkeypatch.setattr(attn_mod, "_FUSED_BLOCKS_DENSE", (128, 128))
    rng = np.random.default_rng(11)
    q, k, v, mask = make_qkv(rng, b=2, h=2, t=320, s=320, d=8)
    sm = q.shape[-1] ** -0.5
    out, lse, _ = attn_mod._flash_forward(q, k, v, mask, causal, sm)
    g = jnp.asarray(rng.normal(0, 1, out.shape).astype(np.float32))

    base = attn_mod._flash_backward(q, k, v, mask, out, lse, causal, sm, g,
                                    accum_mode="dynamic")
    # static unroll: same accumulation order -> bitwise identical
    alt = attn_mod._flash_backward(q, k, v, mask, out, lse, causal, sm, g,
                                   accum_mode="static")
    for a, b in zip(alt, base):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # parity double-buffer: (even-sum + odd-sum) reorders the f32 adds, so
    # equality is up to accumulation rounding (~1e-7 at these magnitudes)
    alt = attn_mod._flash_backward(q, k, v, mask, out, lse, causal, sm, g,
                                   accum_mode="parity")
    for a, b in zip(alt, base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
