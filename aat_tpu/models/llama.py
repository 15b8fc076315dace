"""Llama-family causal LM decoder in pure JAX.

Capability parity with the reference's LM decoder: SmolLM-135M-Instruct /
Qwen1.5-1.8B loaded through ``LlamaForCausalLM``
(/root/reference/scripts/trainer_train.py:180-192,
src/aat/training/config.py:42,98). TPU-first design: functional modules
over parameter pytrees, RoPE in float32, GQA, static-shape KV cache for
generation (lax-friendly), matmuls with float32 accumulation so bf16
params/activations stay stable.

The ASLM wrapper feeds this decoder ``inputs_embeds`` (audio segment
embeddings concatenated with text embeddings) exactly like the reference's
``AslmModel.forward`` → ``lm_decoder.forward`` path
(src/aslm/modeling_aslm.py:371-379).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 49152
    hidden_size: int = 576
    intermediate_size: int = 1536
    num_hidden_layers: int = 30
    num_attention_heads: int = 9
    num_key_value_heads: int = 3
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 2048
    tie_word_embeddings: bool = True
    attention_bias: bool = False
    attention_impl: str = "xla"  # 'xla' | 'pallas' (fused flash kernel)
    remat: bool = False  # rematerialize decoder layers (training only)
    remat_policy: str = "full"  # 'full' | 'dots' (see HubertConfig)
    # Pipeline parallelism (training/no-cache forward only): a Mesh whose
    # 'pp' axis has extent > 1 GPipes the decoder layer stack
    # (parallel/pipeline.py) — the path for LMs that outgrow one chip
    # (the reference's Qwen-1.5-1.8B option). KV-cache decode keeps the
    # plain loop (a ring pipeline per emitted token is not worth it).
    pp_mesh: Optional[object] = dataclasses.field(
        default=None, compare=False, repr=False)
    pp_microbatches: int = 0  # 0 → 2 * pp

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def smollm_135m_config() -> LlamaConfig:
    """HuggingFaceTB/SmolLM-135M-Instruct (reference TrainConfig default).

    attention_impl='pallas' is the reference's flash_attention_2 request
    (trainer_train.py:185-186) — the dispatch self-gates to XLA below
    MIN_PALLAS_SEQ_LEN and for KV-cache decode, so only long prefill/
    training sequences (e.g. whole-utterance audio prefixes, T≈1500, where
    XLA attention traced at ~50 ms/step of fwd+activation-grad time) take
    the fused kernel."""
    return LlamaConfig(attention_impl="pallas")


def qwen15_18b_config() -> LlamaConfig:
    """Qwen/Qwen1.5-1.8B via the Llama architecture (attention biases on)."""
    return LlamaConfig(
        vocab_size=151936,
        hidden_size=2048,
        intermediate_size=5504,
        num_hidden_layers=24,
        num_attention_heads=16,
        num_key_value_heads=16,
        rope_theta=1000000.0,
        max_position_embeddings=32768,
        tie_word_embeddings=False,
        attention_bias=True,
        attention_impl="pallas",
    )


def tiny_test_config() -> LlamaConfig:
    return LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        tie_word_embeddings=False,
    )


def init_llama_params(rng, config: LlamaConfig, std: float = 0.02) -> dict:
    from aat_tpu.models.hubert import np_rng_from
    import numpy as np

    r = np_rng_from(rng)
    h, kvh = config.hidden_size, config.num_key_value_heads * config.head_dim

    def dense(din, dout, bias):
        p = {"kernel": r.normal(0.0, std, (din, dout)).astype(np.float32)}
        if bias:
            p["bias"] = np.zeros((dout,), np.float32)
        return p

    params = {
        "embed_tokens": {
            "embedding": r.normal(0.0, std, (config.vocab_size, h)).astype(np.float32)
        },
        "layers": [],
        "final_norm": {"scale": np.ones((h,), np.float32)},
    }
    for _ in range(config.num_hidden_layers):
        params["layers"].append({
            "input_norm": {"scale": np.ones((h,), np.float32)},
            "attention": {
                "q": dense(h, h, config.attention_bias),
                "k": dense(h, kvh, config.attention_bias),
                "v": dense(h, kvh, config.attention_bias),
                "out": dense(h, h, False),
            },
            "post_attention_norm": {"scale": np.ones((h,), np.float32)},
            "mlp": {
                "gate": dense(h, config.intermediate_size, False),
                "up": dense(h, config.intermediate_size, False),
                "down": dense(config.intermediate_size, h, False),
            },
        })
    if not config.tie_word_embeddings:
        params["lm_head"] = dense(h, config.vocab_size, False)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _rms_norm(x, p, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype) * p["scale"]


def _dense(x, p):
    y = jnp.einsum("...i,io->...o", x, p["kernel"],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"]
    return y


def _dense_row_parallel(x, p, tp_axis):
    """Row-parallel dense for manual tensor parallelism inside a pipeline
    body: the kernel's INPUT dim is tp-sliced, so local products are
    partial sums — psum over ``tp_axis``, then add the (replicated) bias
    exactly once. ``tp_axis=None`` degrades to :func:`_dense`."""
    if tp_axis is None:
        return _dense(x, p)
    y = jnp.einsum("...i,io->...o", x, p["kernel"],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = jax.lax.psum(y, tp_axis)
    if "bias" in p:
        y = y + p["bias"]
    return y


def tp_partitionable(config: LlamaConfig, tp: int) -> bool:
    """True when the decoder stack's widths split evenly across ``tp``
    (attention heads, GQA kv heads, and the MLP hidden must all divide) —
    the gate for Megatron-style tp inside the pipelined stack."""
    return (
        tp > 1
        and config.num_attention_heads % tp == 0
        and config.num_key_value_heads % tp == 0
        and config.intermediate_size % tp == 0
    )


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float):
    """positions [B, T] → cos/sin [B, T, head_dim] (float32, HF layout:
    the half-split rotate, inv_freq repeated twice)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_rope(q, k, cos, sin):
    # q/k: [B, H, T, D]; cos/sin: [B, T, D]
    cos = cos[:, None, :, :]
    sin = sin[:, None, :, :]
    q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = q32 * cos + _rotate_half(q32) * sin
    k_out = k32 * cos + _rotate_half(k32) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def _attention(p, config: LlamaConfig, x, cos, sin, mask_bias, kv_cache, cache_index,
               key_padding_mask=None, tp_axis=None, pack_len=None):
    b, t, h = x.shape
    if (pack_len is not None and kv_cache is None
            and key_padding_mask is not None and t != pack_len):
        # Sequence packing is EXACTLY block-diagonal, so attention gains
        # nothing from the packed layout (the win is the dense/vocab GEMMs'
        # weight-traffic amortization). Unfold the K packed utterances into
        # the batch dim — a contiguous [B, K·p, H] → [B·K, p, H] reshape —
        # and run plain causal attention at T=p: the packed full-T triangle
        # costs K× the needed score-block work (measured 35 ms of a 498 ms
        # pack=8 Qwen step vs ~5 ms unfolded; in-kernel pack_len masking
        # kept for the kernel-level API/tests).
        assert t % pack_len == 0, (t, pack_len)
        kq = t // pack_len
        am = key_padding_mask.reshape(b * kq, pack_len)
        out, _ = _attention(
            p, config,
            x.reshape(b * kq, pack_len, h),
            cos.reshape(b * kq, pack_len, cos.shape[-1]),
            sin.reshape(b * kq, pack_len, sin.shape[-1]),
            causal_mask_bias(am, pack_len, pack_len, 0),
            None, 0, key_padding_mask=am, tp_axis=tp_axis, pack_len=None,
        )
        return out.reshape(b, t, out.shape[-1]), None
    # head counts derive from the KERNEL shapes, not the config: inside a
    # tp-sliced pipeline body the q/k/v kernels hold nh/tp (nkv/tp) heads,
    # and outside they equal the config values
    hd = config.head_dim
    nh = p["q"]["kernel"].shape[-1] // hd
    nkv = p["k"]["kernel"].shape[-1] // hd
    q = _dense(x, p["q"]).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = _dense(x, p["k"]).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    v = _dense(x, p["v"]).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
    q, k = _apply_rope(q, k, cos, sin)

    new_cache = None
    if kv_cache is not None:
        ck, cv = kv_cache  # [B, nkv, L_cache, D]
        if jnp.ndim(cache_index) == 1:
            # per-row write offsets (continuous batching: every slot is at
            # its own decode position); single-token steps only
            assert t == 1, "vector cache_index requires single-token decode"
            bidx = jnp.arange(b)
            k = ck.at[bidx, :, cache_index, :].set(k[:, :, 0, :].astype(ck.dtype))
            v = cv.at[bidx, :, cache_index, :].set(v[:, :, 0, :].astype(cv.dtype))
        else:
            k = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, cache_index, 0))
            v = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, cache_index, 0))
        new_cache = (k, v)

    if nkv != nh:
        rep = nh // nkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    from aat_tpu.ops.attention import MIN_PALLAS_SEQ_LEN

    if (
        config.attention_impl == "pallas"
        and kv_cache is None
        and key_padding_mask is not None
        and t >= MIN_PALLAS_SEQ_LEN  # short-seq grid overhead: see ops.attention
    ):
        # fused flash path for prefill/training (q_len == kv_len, offset 0)
        from aat_tpu.ops.attention import flash_attention

        ctx = flash_attention(
            q, k, v, key_padding_mask, True, hd ** -0.5, pack_len=pack_len
        )
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        scores = scores + mask_bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
    return _dense_row_parallel(ctx, p["out"], tp_axis), new_cache


def _mlp(p, x, tp_axis=None):
    gate = jax.nn.silu(_dense(x, p["gate"]))
    return _dense_row_parallel(gate * _dense(x, p["up"]), p["down"], tp_axis)


def embed_tokens(params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
    """Token embedding lookup (the reference's ``encode_text``,
    src/aslm/modeling_aslm.py:381-382)."""
    return params["embed_tokens"]["embedding"][input_ids]


def causal_mask_bias(
    attention_mask: jnp.ndarray, q_len: int, kv_len: int, q_offset,
    pack_len: Optional[int] = None,
) -> jnp.ndarray:
    """Additive [B, 1, Q, K] bias combining causality and padding.

    ``attention_mask``: [B, kv_len] 1/0 padding mask over the key axis.
    ``q_offset``: position of query 0 in the kv axis (0 for prefill,
    cache_index for decode) — a scalar, or a per-row [B] vector when rows
    decode at different cache offsets (continuous batching,
    aat_tpu.serving.engine).
    """
    neg = jnp.finfo(jnp.float32).min
    k_pos = jnp.arange(kv_len)[None, :]
    if jnp.ndim(q_offset) == 1:
        q_pos = jnp.arange(q_len)[None, :, None] + q_offset[:, None, None]
        causal = k_pos[None] <= q_pos  # [B, Q, K]
    else:
        q_pos = jnp.arange(q_len)[:, None] + q_offset
        causal = (k_pos <= q_pos)[None, :, :]  # [1, Q, K]
    if pack_len is not None:
        # sequence packing: P equal-length utterances per row — attention
        # additionally stays within the utterance (q_offset must be 0)
        causal = causal & (q_pos // pack_len == k_pos // pack_len)
    allowed = causal & (attention_mask[:, None, :] > 0)
    return jnp.where(allowed, 0.0, neg)[:, None, :, :]


def llama_forward(
    params: dict,
    config: LlamaConfig,
    input_ids: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    kv_caches: Optional[list] = None,
    cache_index: int | jnp.ndarray = 0,
    pack_len: Optional[int] = None,
    logit_caption_len: Optional[int] = None,
) -> Tuple[jnp.ndarray, Optional[list]]:
    """Returns (logits [B, T, V], new_kv_caches).

    Prefill: pass embeds/ids and a [B, T] attention_mask.
    Decode: pass the next-token embeds, kv_caches, cache_index, and a
    [B, L_cache] attention_mask over the cache axis.
    ``pack_len``: rows are P packed equal-length utterances of that many
    tokens — attention is block-diagonal per utterance; pass per-utterance
    ``positions`` (restarting at 0) for matching rotary phases.
    ``logit_caption_len``: emit logits ONLY for the shifted-caption window
    (the last ``logit_caption_len`` positions of each utterance minus the
    final one — exactly the rows caption CE consumes). The hidden state is
    sliced BEFORE the final norm + lm_head, so the vocab-width GEMMs and
    the CE tensors shrink by t/(cl−1) (2.6× at the packed-Qwen shapes,
    where full-sequence f32 logits cost ~100 ms/step of HBM traffic and
    blocked pack=16 outright at 6.3 GB). Per-position math is unchanged:
    non-caption positions only reach the loss through attention, which
    backprops inside the transformer stack, never through final_norm.
    Returned logits are [B, K·(cl−1), V] with K = packed utterances/row.
    """
    if inputs_embeds is None:
        inputs_embeds = embed_tokens(params, input_ids)
    b, t, _ = inputs_embeds.shape

    kv_len = t if kv_caches is None else kv_caches[0][0].shape[2]
    if attention_mask is None:
        attention_mask = jnp.ones((b, kv_len), dtype=jnp.int32)
    if positions is None:
        if kv_caches is None:
            positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
        else:
            positions = cache_index + jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))

    cos, sin = rope_cos_sin(positions, config.head_dim, config.rope_theta)
    mask_bias = causal_mask_bias(
        attention_mask, t, kv_len, 0 if kv_caches is None else cache_index,
        pack_len=pack_len,
    )

    hidden = inputs_embeds
    new_caches = [] if kv_caches is not None else None

    def layer_step(hidden, layer, cache):
        attn_in = _rms_norm(hidden, layer["input_norm"], config.rms_norm_eps)
        attn_out, new_cache = _attention(
            layer["attention"], config, attn_in, cos, sin, mask_bias, cache,
            cache_index, key_padding_mask=attention_mask, pack_len=pack_len,
        )
        hidden = hidden + attn_out
        mlp_in = _rms_norm(hidden, layer["post_attention_norm"], config.rms_norm_eps)
        hidden = hidden + _mlp(layer["mlp"], mlp_in)
        return hidden, new_cache

    if config.remat and kv_caches is None:
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if config.remat_policy == "dots" else None)
        layer_step = jax.checkpoint(layer_step, static_argnums=(),
                                    policy=policy)
    pp_mesh = config.pp_mesh
    if (pp_mesh is not None and pp_mesh.shape.get("pp", 1) > 1
            and kv_caches is None):
        from aat_tpu.parallel.pipeline import (
            gpipe_apply, is_stacked, stack_layers, stacked_layer_specs)

        # Megatron-style tp INSIDE the pipeline body when the widths divide:
        # each (pp, tp) member holds [L/pp] width-sliced layers; the
        # row-parallel out/down products psum over 'tp'
        tp_n = pp_mesh.shape.get("tp", 1)
        tp_axis = "tp" if tp_partitionable(config, tp_n) else None

        def layer_fn(h, layer, gidx, mb_idx, cos_mb, sin_mb, bias_mb, am_mb):
            attn_in = _rms_norm(h, layer["input_norm"], config.rms_norm_eps)
            attn_out, _ = _attention(
                layer["attention"], config, attn_in, cos_mb, sin_mb,
                bias_mb, None, cache_index, key_padding_mask=am_mb,
                tp_axis=tp_axis, pack_len=pack_len,
            )
            h = h + attn_out
            mlp_in = _rms_norm(h, layer["post_attention_norm"],
                               config.rms_norm_eps)
            return h + _mlp(layer["mlp"], mlp_in, tp_axis=tp_axis)

        if config.remat:
            layer_fn = jax.checkpoint(
                layer_fn,
                policy=(jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                        if config.remat_policy == "dots" else None))
        bias_b = jnp.broadcast_to(
            mask_bias, (b,) + mask_bias.shape[1:])  # per-row for mb split
        stacked = (params["layers"] if is_stacked(params["layers"])
                   else stack_layers(params["layers"]))
        hidden = gpipe_apply(
            layer_fn, stacked, hidden,
            (cos, sin, bias_b, attention_mask), (), pp_mesh,
            num_layers=config.num_hidden_layers,
            microbatches=config.pp_microbatches or 2 * pp_mesh.shape["pp"],
            layer_specs=stacked_layer_specs(
                stacked, tp_n if tp_axis else 1,
                fsdp=pp_mesh.shape.get("fsdp", 1)),
        )
    else:
        from aat_tpu.parallel.pipeline import layer_seq

        for i, layer in enumerate(
                layer_seq(params["layers"], config.num_hidden_layers)):
            cache = kv_caches[i] if kv_caches is not None else None
            hidden, new_cache = layer_step(hidden, layer, cache)
            if new_caches is not None:
                new_caches.append(new_cache)

    if logit_caption_len is not None:
        assert kv_caches is None, "caption slicing is a training-path feature"
        cl = logit_caption_len
        p = pack_len or t
        k = t // p  # packed utterances per row (1 when unpacked)
        hidden = hidden.reshape(b, k, p, hidden.shape[-1])[:, :, p - cl : p - 1, :]
        hidden = hidden.reshape(b, k * (cl - 1), hidden.shape[-1])
    hidden = _rms_norm(hidden, params["final_norm"], config.rms_norm_eps)
    if config.tie_word_embeddings:
        logits = jnp.einsum("bth,vh->btv", hidden, params["embed_tokens"]["embedding"],
                            preferred_element_type=jnp.float32)
    else:
        logits = jnp.einsum("bth,hv->btv", hidden, params["lm_head"]["kernel"],
                            preferred_element_type=jnp.float32)
    return logits, new_caches


def init_kv_caches(config: LlamaConfig, batch_size: int, max_len: int, dtype=jnp.float32):
    """Static-shape per-layer (k, v) caches for decoding."""
    shape = (batch_size, config.num_key_value_heads, max_len, config.head_dim)
    return [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(config.num_hidden_layers)
    ]
