"""ASLM — Audio-Speech Language Model.

Capability parity with ``AslmModel`` (/root/reference/src/aslm/modeling_aslm.py):
compose an audio encoder (HuBERT/wav2vec2/EfficientNet), a segment projection
into the LM embedding space, learned audio-BOS/EOS embeddings, and a
Llama-family decoder. TPU-first: functional methods over parameter pytrees,
fixed shapes, bf16-friendly.

Projection types (reference configuration_aslm.py:34-37):
- ``linear``: zero masked frames, crop T to a multiple of
  ``audio_encoder_embeddings_seq_len`` = k, reshape ``[N, T/k, k*E]``,
  MLP(4096) → LM hidden (reference modeling_aslm.py:114-124,260-285).
- ``transformer_encoder``: prepend a learned CLS embedding, run a 4-layer
  pre-LN transformer (d=4096, 32 heads, ReLU FF 2048 — torch
  ``nn.TransformerEncoderLayer`` defaults), project the CLS position to LM
  hidden (reference modeling_aslm.py:12-60,108-112,238-256).
- ``mean``: masked mean over frames → Linear. (The reference declares this
  but raises NotImplementedError at modeling_aslm.py:258-259; here it is
  implemented.)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from aat_tpu.models import hubert as hub
from aat_tpu.models import llama as llm
from aat_tpu.ops.ragged import masked_mean


@dataclasses.dataclass(frozen=True)
class PoolingConfig:
    """AudioEmbeddingsEncoderPooling dims (reference modeling_aslm.py:14)."""

    hidden_dim: int = 4096
    num_heads: int = 32
    num_layers: int = 4
    ffn_dim: int = 2048  # torch TransformerEncoderLayer default
    max_positions: int = 64


@dataclasses.dataclass(frozen=True)
class AslmConfig:
    projection_type: str = "linear"  # linear | transformer_encoder | mean
    audio_encoder_embeddings_seq_len: int = 1
    audio_encoder_hidden: int = 1024
    lm_hidden: int = 576
    projection_hidden: int = 4096  # reference MLP hidden (modeling_aslm.py:121)
    pooling: PoolingConfig = PoolingConfig()
    # learned audio frame tokens (reference nn.Embedding(2, H): BOS id 0, EOS id 1)
    audio_bos_token_id: int = 0
    audio_eos_token_id: int = 1
    dropout: float = 0.1


def init_aslm_params(rng, config: AslmConfig, std: float = 0.02) -> dict:
    """Projection/pooling/audio-token parameters (the trainable adapter part;
    encoder and decoder params live in their own trees). Matches the
    reference ``reinitialize_weights`` normal(0, 0.02) init
    (modeling_aslm.py:140-163). Host-side numpy init (see hubert.np_rng_from)."""
    import numpy as np

    from aat_tpu.models.hubert import np_rng_from

    r = np_rng_from(rng)
    e, h_lm = config.audio_encoder_hidden, config.lm_hidden

    def normal(*shape):
        return r.normal(0.0, std, shape).astype(np.float32)

    def dense(din, dout):
        return {"kernel": normal(din, dout), "bias": np.zeros((dout,), np.float32)}

    def layernorm(d):
        return {"scale": np.ones((d,), np.float32), "bias": np.zeros((d,), np.float32)}

    params: dict = {
        "audio_tokens_embeddings": {"embedding": normal(2, h_lm)},
    }
    if config.projection_type == "linear":
        k = config.audio_encoder_embeddings_seq_len
        params["projection"] = {
            "in": dense(e * k, config.projection_hidden),
            "out": dense(config.projection_hidden, h_lm),
        }
    elif config.projection_type == "mean":
        params["projection"] = {"out": dense(e, h_lm)}
    elif config.projection_type == "transformer_encoder":
        p = config.pooling
        params["cls_token"] = {"embedding": normal(1, e)}
        pooling = {
            "l_in": dense(e, p.hidden_dim),
            "positional_embeddings": {"embedding": normal(p.max_positions, p.hidden_dim)},
            "l_out": dense(p.hidden_dim, h_lm),
            "layers": [],
        }
        for _ in range(p.num_layers):
            pooling["layers"].append({
                "attention": {
                    "in_proj": dense(p.hidden_dim, 3 * p.hidden_dim),
                    "out_proj": dense(p.hidden_dim, p.hidden_dim),
                },
                "norm1": layernorm(p.hidden_dim),
                "norm2": layernorm(p.hidden_dim),
                "linear1": dense(p.hidden_dim, p.ffn_dim),
                "linear2": dense(p.ffn_dim, p.hidden_dim),
            })
        params["pooling"] = pooling
    else:
        raise ValueError(f"unsupported projection_type: {config.projection_type}")
    return params


# ---------------------------------------------------------------------------
# Pooling encoder (torch nn.TransformerEncoder pre-LN semantics)
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
    return (out + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _dense(x, p):
    return jnp.einsum("...i,io->...o", x, p["kernel"],
                      preferred_element_type=jnp.float32).astype(x.dtype) + p["bias"]


def _pooling_mha(p, x, key_padding_mask, num_heads, dropout_rng=None,
                 dropout_rate=0.0):
    """torch nn.MultiheadAttention with packed qkv, batch_first (prob
    dropout included: the reference's TransformerEncoderLayer passes its
    dropout=0.1 into MHA)."""
    from aat_tpu.ops.dropout import dropout

    b, t, d = x.shape
    hd = d // num_heads
    qkv = _dense(x, p["in_proj"])  # [B, T, 3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(z):
        return z.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    neg = jnp.finfo(jnp.float32).min
    bias = jnp.where(key_padding_mask[:, None, None, :], neg, 0.0)
    probs = jax.nn.softmax(scores + bias, axis=-1).astype(x.dtype)
    if dropout_rng is not None:
        probs = dropout(dropout_rng, probs, dropout_rate)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, d)
    return _dense(ctx, p["out_proj"])


def pooling_forward(
    params: dict,
    config: PoolingConfig,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray,
    dropout_rng=None,
    dropout_rate: float = 0.0,
) -> jnp.ndarray:
    """AudioEmbeddingsEncoderPooling.forward parity
    (reference modeling_aslm.py:38-60): l_in → +pos → pre-LN transformer
    with key-padding mask → l_out on the CLS position → [N, 1, out_dim].

    ``dropout_rng`` enables torch TransformerEncoderLayer train-mode
    dropout (default 0.1, reference modeling_aslm.py:29-36): attention
    probs, both residual branches, and the FF activation."""
    from aat_tpu.ops.dropout import dropout

    h = _dense(inputs_embeds, params["l_in"])
    t = h.shape[1]
    max_positions = params["positional_embeddings"]["embedding"].shape[0]
    assert t <= max_positions, (
        f"pooling input has {t} positions (CLS + encoder frames) but the "
        f"positional table holds {max_positions}; set "
        f"PoolingConfig.max_positions >= encoder frames per segment + 1 "
        f"(reference contract, modeling_aslm.py:110-112)"
    )
    h = h + params["positional_embeddings"]["embedding"][:t, :]
    key_padding = attention_mask == 0

    for idx, layer in enumerate(params["layers"]):
        k_attn = k_res1 = k_ff = k_res2 = None
        if dropout_rng is not None:
            k_attn, k_res1, k_ff, k_res2 = jax.random.split(
                jax.random.fold_in(dropout_rng, idx), 4
            )
        attn_in = _layer_norm(h, layer["norm1"])
        attn_out = _pooling_mha(layer["attention"], attn_in, key_padding,
                                config.num_heads, k_attn, dropout_rate)
        if dropout_rng is not None:  # torch .dropout1
            attn_out = dropout(k_res1, attn_out, dropout_rate)
        h = h + attn_out
        ff_in = _layer_norm(h, layer["norm2"])
        y = jax.nn.relu(_dense(ff_in, layer["linear1"]))
        if dropout_rng is not None:  # torch ._ff_block inner dropout
            y = dropout(k_ff, y, dropout_rate)
        y = _dense(y, layer["linear2"])
        if dropout_rng is not None:  # torch .dropout2
            y = dropout(k_res2, y, dropout_rate)
        h = h + y

    return _dense(h[:, 0:1, :], params["l_out"])


# ---------------------------------------------------------------------------
# ASLM composition
# ---------------------------------------------------------------------------


class AslmModel:
    """Functional ASLM: methods take explicit parameter trees.

    ``params`` layout: {"audio_encoder": ..., "adapter": ..., "lm_decoder": ...}
    """

    def __init__(
        self,
        config: AslmConfig,
        audio_encoder_config,
        lm_config: llm.LlamaConfig,
        audio_encoder_type: str = "hubert",
    ):
        self.config = config
        self.audio_encoder_config = audio_encoder_config
        self.lm_config = lm_config
        self.audio_encoder_type = audio_encoder_type

    def init_params(self, rng: jax.Array) -> dict:
        k1, k2, k3 = jax.random.split(rng, 3)
        if self.audio_encoder_type == "efficient_net":
            from aat_tpu.models.efficientnet import init_efficientnet_params

            encoder = init_efficientnet_params()
        else:
            encoder = hub.init_hubert_params(k1, self.audio_encoder_config)
        return {
            "audio_encoder": encoder,
            "adapter": init_aslm_params(k2, self.config),
            "lm_decoder": llm.init_llama_params(k3, self.lm_config),
        }

    # ---- audio path (reference encode_audio, modeling_aslm.py:165-229) ----

    def encode_audio(
        self,
        params: dict,
        waveforms: jnp.ndarray,
        waveforms_mask: Optional[jnp.ndarray] = None,
        segments_mask: Optional[jnp.ndarray] = None,
        dropout_rng=None,
    ):
        """[N, F] segment waveforms → ([N, T, E] frames, [N, T] frame mask).

        ``segments_mask`` [N] marks real (non-padding) segments; frames of
        padded segments are masked out (reference :195-218 zeroes them via
        the segments-boarders mask).
        """
        frames, frame_mask = hub.hubert_encode(
            params["audio_encoder"], self.audio_encoder_config, waveforms,
            waveforms_mask, dropout_rng=dropout_rng,
        )
        if frame_mask is None:
            frame_mask = jnp.ones(frames.shape[:2], dtype=bool)
        if segments_mask is not None:
            frame_mask = frame_mask & segments_mask[:, None].astype(bool)
        return frames, frame_mask

    def encode_audio_melspec(
        self,
        params: dict,
        melspecs: jnp.ndarray,
        segments_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        """EfficientNet path: per-segment melspecs ``[N, n_mels, T]`` →
        ``([N, 1, 1280], [N, 1])`` (reference EfficientNetAudioEncdoerAdapter
        forward + all-ones feature mask, modeling_aslm.py:81-93).

        ``train=True`` runs torch train-mode batch norm and additionally
        returns the batch BN statistics for ``apply_bn_updates`` (the
        reference's HF Trainer keeps the model in ``.train()``, so BN uses
        batch stats and EMAs running stats during training)."""
        from aat_tpu.models.efficientnet import EfficientNetAudioEncoderAdapter

        adapter = EfficientNetAudioEncoderAdapter(self.audio_encoder_config)
        if train:
            frames, bn_stats = adapter(params["audio_encoder"], melspecs, train=True)
        else:
            frames = adapter(params["audio_encoder"], melspecs)
        frame_mask = jnp.ones(frames.shape[:2], dtype=bool)
        if segments_mask is not None:
            frame_mask = frame_mask & segments_mask[:, None].astype(bool)
        if train:
            return frames, frame_mask, bn_stats
        return frames, frame_mask

    # ---- projection (reference audio_embeddings_projection, :232-294) ----

    def project_audio_embeddings(
        self, params: dict, audio_embeds: jnp.ndarray, frame_mask: jnp.ndarray,
        dropout_rng=None,
    ):
        """[N, T, E] + [N, T] → ([N, P, H_lm], [N, P] mask)."""
        cfg = self.config
        adapter = params["adapter"]
        n = audio_embeds.shape[0]

        if cfg.projection_type == "transformer_encoder":
            cls = jnp.broadcast_to(
                adapter["cls_token"]["embedding"][0][None, None, :],
                (n, 1, audio_embeds.shape[-1]),
            ).astype(audio_embeds.dtype)
            with_cls = jnp.concatenate([cls, audio_embeds], axis=1)
            mask_with_cls = jnp.concatenate(
                [jnp.ones((n, 1), frame_mask.dtype), frame_mask], axis=1
            )
            projected = pooling_forward(
                adapter["pooling"], cfg.pooling, with_cls, mask_with_cls,
                dropout_rng=dropout_rng, dropout_rate=cfg.dropout,
            )  # [N, 1, H_lm]
            out_mask = jnp.any(frame_mask, axis=-1, keepdims=True)
            return projected, out_mask

        if cfg.projection_type == "linear":
            k = cfg.audio_encoder_embeddings_seq_len
            t = audio_embeds.shape[1]
            cropped_t = t - (t % k)
            reduced_t = cropped_t // k
            x = audio_embeds * frame_mask[..., None].astype(audio_embeds.dtype)
            x = x[:, :cropped_t, :].reshape(n, reduced_t, -1)
            y = _dense(jax.nn.relu(_dense(x, adapter["projection"]["in"])),
                       adapter["projection"]["out"])
            out_mask = jnp.any(
                frame_mask[:, :cropped_t].reshape(n, reduced_t, k), axis=-1
            )
            return y, out_mask

        if cfg.projection_type == "mean":
            pooled = masked_mean(audio_embeds, frame_mask)  # [N, E]
            y = _dense(pooled[:, None, :], adapter["projection"]["out"])
            out_mask = jnp.any(frame_mask, axis=-1, keepdims=True)
            return y, out_mask

        raise ValueError(f"unsupported projection_type: {cfg.projection_type}")

    # ---- input assembly (reference prepare_audio_inputs, :296-369) --------

    def prepare_audio_inputs(
        self,
        params: dict,
        audio_embeds: jnp.ndarray,
        frame_mask: jnp.ndarray,
        inputs_embeds: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        input_ids: Optional[jnp.ndarray] = None,
        segments_count: Optional[int] = None,
        dropout_rng=None,
    ) -> dict:
        """Project audio, wrap with audio BOS/EOS embeddings, concat text.

        When ``segments_count`` is given, audio_embeds is ``[B*S, ...]`` with
        one projected vector per segment; it is unflattened to ``[B, S, H]``
        (reference :317-322).
        """
        cfg = self.config
        if input_ids is not None:
            inputs_embeds = self.encode_text(params, input_ids)

        projected, proj_mask = self.project_audio_embeddings(
            params, audio_embeds, frame_mask, dropout_rng=dropout_rng
        )

        if segments_count is not None:
            # one projected vector per segment (reference :317-322 squeezes
            # dim 1; only P==1 projections are valid there). For P>1 we
            # generalize by flattening segments into the sequence axis.
            h = projected.shape[-1]
            p = projected.shape[1]
            projected = projected.reshape(-1, segments_count * p, h)
            proj_mask = proj_mask.reshape(-1, segments_count * p)

        batch_size = projected.shape[0]
        emb = params["adapter"]["audio_tokens_embeddings"]["embedding"]
        bos = jnp.broadcast_to(
            emb[cfg.audio_bos_token_id][None, None, :], (batch_size, 1, emb.shape[-1])
        ).astype(projected.dtype)
        eos = jnp.broadcast_to(
            emb[cfg.audio_eos_token_id][None, None, :], (batch_size, 1, emb.shape[-1])
        ).astype(projected.dtype)

        pieces = [bos, projected, eos]
        ones = jnp.ones((batch_size, 1), dtype=jnp.int32)
        mask_pieces = [ones, proj_mask.astype(jnp.int32), ones]
        if inputs_embeds is not None:
            pieces.append(inputs_embeds.astype(projected.dtype))
            if attention_mask is None:
                attention_mask = jnp.ones(inputs_embeds.shape[:2], dtype=jnp.int32)
            mask_pieces.append(attention_mask.astype(jnp.int32))

        return {
            "inputs_embeds": jnp.concatenate(pieces, axis=1),
            "attention_mask": jnp.concatenate(mask_pieces, axis=1),
            "audio_embeds": projected,
            "audio_embeds_attention_mask": proj_mask,
        }

    # ---- LM delegation ---------------------------------------------------

    def encode_text(self, params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
        return llm.embed_tokens(params["lm_decoder"], input_ids)

    def forward(
        self,
        params: dict,
        inputs_embeds: jnp.ndarray,
        attention_mask: jnp.ndarray,
        pack: int = 1,
        caption_len: Optional[int] = None,
    ) -> jnp.ndarray:
        """LM forward over assembled embeds → logits (reference :371-379).

        ``pack`` > 1 folds that many utterance rows into each LM row (a pure
        [B, T, H] → [B/pack, pack·T, H] reshape — rows are equal-length by
        construction, padding stays masked). Attention is block-diagonal per
        utterance and rotary positions restart per utterance, so logits are
        IDENTICAL to the unpacked call (tests pin this); the win is
        amortizing the decoder's weight traffic over pack× more tokens per
        step — the same reason the reference trains the big LM at batch 40
        (reference src/aat/training/trainer.py:50,79) but without the
        padding waste of ragged captions.

        ``caption_len``: return logits only for the shifted-caption window
        ([B, caption_len−1, V] — the rows caption CE reads), slicing the
        hidden state before the vocab GEMM (see llama_forward's
        ``logit_caption_len``)."""
        out_t = caption_len - 1 if caption_len is not None else None
        if pack > 1:
            b, t, h = inputs_embeds.shape
            assert b % pack == 0, (b, pack)
            packed = inputs_embeds.reshape(b // pack, pack * t, h)
            mask = attention_mask.reshape(b // pack, pack * t)
            positions = jnp.broadcast_to(
                jnp.tile(jnp.arange(t, dtype=jnp.int32), pack)[None, :],
                (b // pack, pack * t))
            logits, _ = llm.llama_forward(
                params["lm_decoder"], self.lm_config,
                inputs_embeds=packed, attention_mask=mask,
                positions=positions, pack_len=t,
                logit_caption_len=caption_len,
            )
            return logits.reshape(b, out_t or t, logits.shape[-1])
        logits, _ = llm.llama_forward(
            params["lm_decoder"], self.lm_config,
            inputs_embeds=inputs_embeds, attention_mask=attention_mask,
            logit_caption_len=caption_len,
        )
        return logits
