"""Llama decoder parity vs torch (hermetic tiny random config).

Oracle: transformers LlamaForCausalLM — the reference's decoder class
(scripts/trainer_train.py:188)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

torch.backends.mkldnn.enabled = False

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aat_tpu.models import llama as llm  # noqa: E402
from aat_tpu.utils.port import port_llama  # noqa: E402


def build_torch_llama():
    cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def ported():
    tm = build_torch_llama()
    params, config = port_llama(tm)
    return tm, params, config


def test_qwen_style_attention_bias_parity():
    """Qwen1.5 runs through the Llama arch with attention biases
    (reference loads it via LlamaForCausalLM, config.py:72,98); check the
    attention_bias=True path against torch."""
    cfg = transformers.LlamaConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=128,
        tie_word_embeddings=False,
        attention_bias=True,
        rope_theta=1000000.0,
        attn_implementation="eager",
    )
    torch.manual_seed(2)
    tm = transformers.LlamaForCausalLM(cfg).eval()
    params, config = port_llama(tm)
    assert config.attention_bias
    assert "bias" in params["layers"][0]["attention"]["q"]

    rng = np.random.default_rng(5)
    ids = rng.integers(0, 96, (2, 9))
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids)).logits.numpy()
    ours, _ = llm.llama_forward(params, config, input_ids=jnp.asarray(ids))
    assert np.abs(np.asarray(ours) - ref).max() < 2e-4


def test_llama_logits_parity(ported):
    tm, params, config = ported
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 10))
    mask = np.ones((2, 10), dtype=np.int64)
    mask[1, 7:] = 0  # right padding

    with torch.no_grad():
        ref = tm(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).logits.numpy()

    ours, _ = llm.llama_forward(
        params, config, input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask)
    )
    ours = np.asarray(ours)
    valid = mask.astype(bool)
    diff = np.abs(ours - ref)[valid]
    assert diff.max() < 2e-4, f"max diff {diff.max()}"


def test_llama_inputs_embeds_parity(ported):
    """The ASLM path feeds inputs_embeds (reference modeling_aslm.py:371-379)."""
    tm, params, config = ported
    rng = np.random.default_rng(1)
    embeds = rng.normal(0, 0.02, (2, 6, 32)).astype(np.float32)
    mask = np.ones((2, 6), dtype=np.int64)

    with torch.no_grad():
        ref = tm(
            inputs_embeds=torch.from_numpy(embeds),
            attention_mask=torch.from_numpy(mask),
        ).logits.numpy()

    ours, _ = llm.llama_forward(
        params, config, inputs_embeds=jnp.asarray(embeds), attention_mask=jnp.asarray(mask)
    )
    assert np.abs(np.asarray(ours) - ref).max() < 2e-4


def test_kv_cache_decode_matches_full_forward(ported):
    _, params, config = ported
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 128, (2, 12))
    full_logits, _ = llm.llama_forward(params, config, input_ids=jnp.asarray(ids))

    # prefill on the first 8 tokens, then decode 4 steps
    max_len = 16
    caches = llm.init_kv_caches(config, 2, max_len)
    prefill_ids = jnp.asarray(ids[:, :8])
    cache_mask = np.zeros((2, max_len), dtype=np.int32)
    cache_mask[:, :8] = 1
    logits, caches = llm.llama_forward(
        params, config,
        input_ids=prefill_ids,
        attention_mask=jnp.asarray(cache_mask),  # mask spans the cache axis
        kv_caches=caches, cache_index=0,
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, :8]), atol=1e-4
    )

    for step in range(4):
        pos = 8 + step
        cache_mask[:, pos] = 1
        step_logits, caches = llm.llama_forward(
            params, config,
            input_ids=jnp.asarray(ids[:, pos : pos + 1]),
            attention_mask=jnp.asarray(cache_mask),
            kv_caches=caches, cache_index=pos,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, pos]), atol=1e-4
        )
