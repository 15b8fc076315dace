"""Torch → JAX parameter porting.

The reference consumes pretrained torch checkpoints
(facebook/hubert-large-ls960-ft, wav2vec2, SmolLM/Qwen Llama decoders —
scripts/trainer_train.py:180-225). This module converts live torch modules
(or state dicts) into the explicit parameter pytrees our functional models
use. torch stays a host-side, import-time-only dependency: nothing in the
compute path touches it.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _t(tensor) -> np.ndarray:
    return tensor.detach().cpu().numpy()


def _dense(module) -> dict:
    return {"kernel": _t(module.weight).T, "bias": _t(module.bias)}


def _layernorm(module) -> dict:
    return {"scale": _t(module.weight), "bias": _t(module.bias)}


def hubert_config_from_torch(torch_config) -> "HubertConfig":
    from aat_tpu.models.hubert import HubertConfig

    return HubertConfig(
        conv_dim=tuple(torch_config.conv_dim),
        conv_kernel=tuple(torch_config.conv_kernel),
        conv_stride=tuple(torch_config.conv_stride),
        conv_bias=torch_config.conv_bias,
        feat_extract_norm=torch_config.feat_extract_norm,
        hidden_size=torch_config.hidden_size,
        num_hidden_layers=torch_config.num_hidden_layers,
        num_attention_heads=torch_config.num_attention_heads,
        intermediate_size=torch_config.intermediate_size,
        layer_norm_eps=torch_config.layer_norm_eps,
        do_stable_layer_norm=torch_config.do_stable_layer_norm,
        num_conv_pos_embeddings=torch_config.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=torch_config.num_conv_pos_embedding_groups,
        # train-mode regularization rates come from the checkpoint config
        # (applied only when a dropout_rng is passed to hubert_encode)
        feature_projection_dropout=getattr(torch_config, "feat_proj_dropout", 0.0),
        hidden_dropout=getattr(torch_config, "hidden_dropout", 0.0),
        attention_dropout=getattr(torch_config, "attention_dropout", 0.0),
        activation_dropout=getattr(torch_config, "activation_dropout", 0.0),
        layerdrop=getattr(torch_config, "layerdrop", 0.0),
    )


def port_hubert(torch_model) -> Tuple[dict, "HubertConfig"]:
    """Port a transformers HubertModel / Wav2Vec2Model to our pytree.

    Conv kernels [out, in, k] → [k, in, out] (NHC); Linear weights are
    transposed; the weight-normed positional conv is materialized by reading
    ``.weight`` through torch's parametrization.
    """
    config = hubert_config_from_torch(torch_model.config)

    params: dict = {"feature_extractor": []}
    for i, conv_layer in enumerate(torch_model.feature_extractor.conv_layers):
        layer = {"conv": {"kernel": _t(conv_layer.conv.weight).transpose(2, 1, 0)}}
        if conv_layer.conv.bias is not None:
            layer["conv"]["bias"] = _t(conv_layer.conv.bias)
        if config.feat_extract_norm == "layer":
            layer["layer_norm"] = _layernorm(conv_layer.layer_norm)
        elif i == 0:
            layer["group_norm"] = _layernorm(conv_layer.layer_norm)
        params["feature_extractor"].append(layer)

    params["feature_projection"] = {
        "layer_norm": _layernorm(torch_model.feature_projection.layer_norm),
        "projection": _dense(torch_model.feature_projection.projection),
    }

    pos_conv = torch_model.encoder.pos_conv_embed.conv
    params["pos_conv"] = {
        "kernel": _t(pos_conv.weight).transpose(2, 1, 0),
        "bias": _t(pos_conv.bias),
    }

    params["layers"] = []
    for layer in torch_model.encoder.layers:
        params["layers"].append({
            "attention": {
                "q": _dense(layer.attention.q_proj),
                "k": _dense(layer.attention.k_proj),
                "v": _dense(layer.attention.v_proj),
                "out": _dense(layer.attention.out_proj),
            },
            "layer_norm": _layernorm(layer.layer_norm),
            "feed_forward": {
                "intermediate": _dense(layer.feed_forward.intermediate_dense),
                "output": _dense(layer.feed_forward.output_dense),
            },
            "final_layer_norm": _layernorm(layer.final_layer_norm),
        })
    params["encoder_layer_norm"] = _layernorm(torch_model.encoder.layer_norm)
    return params, config


def port_pooling_encoder(torch_module) -> dict:
    """Port a torch module shaped like the reference's
    ``AudioEmbeddingsEncoderPooling`` (modeling_aslm.py:12-60): ``l_in``,
    ``positional_embeddings``, ``transformer_encoder`` (nn.TransformerEncoder,
    pre-LN), ``l_out``."""
    params = {
        "l_in": _dense(torch_module.l_in),
        "positional_embeddings": {
            "embedding": _t(torch_module.positional_embeddings.weight)
        },
        "l_out": _dense(torch_module.l_out),
        "layers": [],
    }
    for layer in torch_module.transformer_encoder.layers:
        params["layers"].append({
            "attention": {
                "in_proj": {
                    "kernel": _t(layer.self_attn.in_proj_weight).T,
                    "bias": _t(layer.self_attn.in_proj_bias),
                },
                "out_proj": _dense(layer.self_attn.out_proj),
            },
            "norm1": _layernorm(layer.norm1),
            "norm2": _layernorm(layer.norm2),
            "linear1": _dense(layer.linear1),
            "linear2": _dense(layer.linear2),
        })
    return params


def llama_config_from_torch(torch_config) -> "LlamaConfig":
    from aat_tpu.models.llama import LlamaConfig

    return LlamaConfig(
        vocab_size=torch_config.vocab_size,
        hidden_size=torch_config.hidden_size,
        intermediate_size=torch_config.intermediate_size,
        num_hidden_layers=torch_config.num_hidden_layers,
        num_attention_heads=torch_config.num_attention_heads,
        num_key_value_heads=torch_config.num_key_value_heads,
        rms_norm_eps=torch_config.rms_norm_eps,
        rope_theta=torch_config.rope_theta,
        max_position_embeddings=torch_config.max_position_embeddings,
        tie_word_embeddings=torch_config.tie_word_embeddings,
        attention_bias=getattr(torch_config, "attention_bias", False),
    )


def port_llama(torch_model) -> Tuple[dict, "LlamaConfig"]:
    """Port a transformers LlamaForCausalLM (SmolLM-135M, Qwen1.5 via Llama
    arch — reference build_lm_decoder, scripts/trainer_train.py:180-192)."""
    config = llama_config_from_torch(torch_model.config)
    model = torch_model.model

    def maybe_bias_dense(module):
        if module.bias is not None:
            return {"kernel": _t(module.weight).T, "bias": _t(module.bias)}
        return {"kernel": _t(module.weight).T}

    params: dict = {
        "embed_tokens": {"embedding": _t(model.embed_tokens.weight)},
        "layers": [],
        "final_norm": {"scale": _t(model.norm.weight)},
    }
    for layer in model.layers:
        params["layers"].append({
            "input_norm": {"scale": _t(layer.input_layernorm.weight)},
            "attention": {
                "q": maybe_bias_dense(layer.self_attn.q_proj),
                "k": maybe_bias_dense(layer.self_attn.k_proj),
                "v": maybe_bias_dense(layer.self_attn.v_proj),
                "out": maybe_bias_dense(layer.self_attn.o_proj),
            },
            "post_attention_norm": {"scale": _t(layer.post_attention_layernorm.weight)},
            "mlp": {
                "gate": {"kernel": _t(layer.mlp.gate_proj.weight).T},
                "up": {"kernel": _t(layer.mlp.up_proj.weight).T},
                "down": {"kernel": _t(layer.mlp.down_proj.weight).T},
            },
        })
    if not config.tie_word_embeddings:
        params["lm_head"] = {"kernel": _t(torch_model.lm_head.weight).T}
    return params, config
