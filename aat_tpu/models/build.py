"""Model construction: pretrained checkpoints → JAX param trees.

Capability parity with the reference's build functions
(/root/reference/scripts/trainer_train.py:180-266): build the audio encoder
(HuBERT / wav2vec2 / EfficientNet), the Llama-family LM decoder, the
tokenizer (with the Qwen ``<|im_start|>/<|im_end|>`` BOS/EOS remap,
trainer_train.py:236-238), and the composed ASLM.

Torch/transformers are used host-side only, to read checkpoints; set
``pretrained=False`` to build random-initialized models offline.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax

from aat_tpu.models import hubert as hub
from aat_tpu.models import llama as llm
from aat_tpu.models.aslm import AslmConfig, AslmModel
from aat_tpu.training.config import TrainingConfig

logger = logging.getLogger(__name__)


def build_audio_encoder(config: TrainingConfig, pretrained: bool = True):
    """→ (params, HubertConfig). Reference build_audio_encoder
    (trainer_train.py:195-225)."""
    if config.audio_encoder_type in ("hubert", "wav2vec2"):
        import dataclasses

        def apply_remat(params, cfg):
            return params, dataclasses.replace(
                cfg, remat=config.encoder_remat,
                remat_policy=config.encoder_remat_policy)

        if pretrained:
            import transformers

            from aat_tpu.utils.port import port_hubert

            cls = (
                transformers.HubertModel
                if config.audio_encoder_type == "hubert"
                else transformers.Wav2Vec2Model
            )
            torch_model = cls.from_pretrained(
                config.audio_encoder_checkpoint, mask_time_prob=0.0
            ).eval()
            return apply_remat(*port_hubert(torch_model))
        cfg = (
            hub.hubert_large_config()
            if config.audio_encoder_type == "hubert"
            else hub.wav2vec2_large_config()
        )
        return apply_remat(hub.init_hubert_params(jax.random.PRNGKey(0), cfg), cfg)
    if config.audio_encoder_type == "efficient_net":
        from aat_tpu.models.efficientnet import (
            build_efficientnet_encoder,
        )

        return build_efficientnet_encoder(pretrained=pretrained)
    raise ValueError(f"unknown audio_encoder_type: {config.audio_encoder_type}")


def build_lm_decoder(config: TrainingConfig, pretrained: bool = True):
    """→ (params, LlamaConfig). Reference build_lm_decoder
    (trainer_train.py:180-192)."""
    if pretrained:
        import transformers

        from aat_tpu.utils.port import port_llama

        torch_model = transformers.LlamaForCausalLM.from_pretrained(
            config.lm_pretrained_model
        ).eval()
        return port_llama(torch_model)
    name = config.lm_pretrained_model.lower()
    cfg = llm.qwen15_18b_config() if "qwen" in name else llm.smollm_135m_config()
    return llm.init_llama_params(jax.random.PRNGKey(1), cfg), cfg


def build_tokenizer(config: TrainingConfig):
    """HF tokenizer with BOS/EOS handling incl. the Qwen remap
    (trainer_train.py:232-238)."""
    import transformers

    tokenizer = transformers.AutoTokenizer.from_pretrained(config.lm_pretrained_model)
    tokenizer.add_bos_token = True
    tokenizer.add_eos_token = True
    if "qwen" in config.lm_pretrained_model.lower():
        tokenizer.bos_token_id = tokenizer.encode("<|im_start|>")[0]
        tokenizer.eos_token_id = tokenizer.encode("<|im_end|>")[0]
    return tokenizer


def model_config_dict(model: AslmModel, config: TrainingConfig,
                      saved_subtrees) -> dict:
    """JSON-serializable description of an exported ASLM: every config
    needed to rebuild it plus the tokenizer id (the reference persists this
    as ``config.json`` through HF ``PreTrainedModel.save_pretrained``,
    modeling_aslm.py:387-393)."""
    import dataclasses

    return {
        "model_type": "aslm",
        "aslm": dataclasses.asdict(model.config),
        "audio_encoder_type": model.audio_encoder_type,
        "audio_encoder_config": dataclasses.asdict(model.audio_encoder_config),
        "lm_config": dataclasses.asdict(model.lm_config),
        "audio_encoder_checkpoint": config.audio_encoder_checkpoint,
        "lm_pretrained_model": config.lm_pretrained_model,
        "saved_subtrees": list(saved_subtrees),
    }


def load_pretrained(
    path: str, pretrained_missing: bool = False, seed: int = 0
) -> Tuple[AslmModel, dict]:
    """Rebuild an ASLM from a :meth:`AATTrainer.save_pretrained` export
    using only the export's own ``config.json`` — no hand-supplied configs.

    Subtrees absent from the export (they were frozen at save time) follow
    ``_keys_to_ignore_on_load_missing`` semantics (reference
    modeling_aslm.py:100): rebuilt from the recorded pretrained checkpoints
    when ``pretrained_missing`` (needs network/torch), else random-init."""
    import json
    import os

    import orbax.checkpoint as ocp

    from aat_tpu.models.aslm import PoolingConfig

    with open(os.path.join(os.path.abspath(path), "config.json")) as f:
        desc = json.load(f)

    aslm_kw = dict(desc["aslm"])
    aslm_kw["pooling"] = PoolingConfig(**aslm_kw["pooling"])
    aslm_cfg = AslmConfig(**aslm_kw)

    def detuple(d):  # JSON turns tuples into lists; configs expect tuples
        return {k: tuple(v) if isinstance(v, list) else v for k, v in d.items()}

    enc_type = desc["audio_encoder_type"]
    if enc_type == "efficient_net":
        from aat_tpu.models.efficientnet import EfficientNetConfig

        enc_cfg = EfficientNetConfig(**detuple(desc["audio_encoder_config"]))
    else:
        enc_cfg = hub.HubertConfig(**detuple(desc["audio_encoder_config"]))
    lm_cfg = llm.LlamaConfig(**detuple(desc["lm_config"]))

    model = AslmModel(aslm_cfg, enc_cfg, lm_cfg, audio_encoder_type=enc_type)

    saved = set(desc["saved_subtrees"])
    missing = {"audio_encoder", "adapter", "lm_decoder"} - saved
    if missing and pretrained_missing:
        tc = TrainingConfig(
            audio_encoder_type=enc_type,
            audio_encoder_checkpoint=desc["audio_encoder_checkpoint"],
            lm_pretrained_model=desc["lm_pretrained_model"],
        )
        params = {}
        if "audio_encoder" in missing:
            params["audio_encoder"], _ = build_audio_encoder(tc, pretrained=True)
        if "lm_decoder" in missing:
            params["lm_decoder"], _ = build_lm_decoder(tc, pretrained=True)
        fresh = model.init_params(jax.random.PRNGKey(seed))
        for k in ("audio_encoder", "adapter", "lm_decoder"):
            params.setdefault(k, fresh[k])
    else:
        if missing:
            logger.warning(
                "export %s lacks %s; using random init "
                "(pass pretrained_missing=True to port the recorded "
                "checkpoints)", path, sorted(missing),
            )
        params = model.init_params(jax.random.PRNGKey(seed))

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.join(os.path.abspath(path), "state"),
        target={"params": {k: params[k] for k in sorted(saved)}, "step": 0},
    )
    for k, subtree in restored["params"].items():
        params[k] = subtree
    logger.info("loaded pretrained ASLM from %s (saved subtrees: %s)",
                path, sorted(saved))
    return model, params


def build_model(
    config: TrainingConfig,
    pretrained: bool = True,
    from_pretrained_adapter: Optional[str] = None,
    seed: int = 0,
) -> Tuple[AslmModel, dict]:
    """Compose the ASLM (reference build_model, trainer_train.py:228-266).

    Freezing is handled by the trainer's freeze masks
    (aat_tpu.training.optim.trainable_mask), not by mutating params.
    """
    enc_params, enc_cfg = build_audio_encoder(config, pretrained)
    lm_params, lm_cfg = build_lm_decoder(config, pretrained)

    aslm_cfg = AslmConfig(
        projection_type=config.projection_type,
        audio_encoder_embeddings_seq_len=config.audio_encoder_embeddings_seq_len,
        audio_encoder_hidden=enc_cfg.hidden_size,
        lm_hidden=lm_cfg.hidden_size,
    )
    model = AslmModel(aslm_cfg, enc_cfg, lm_cfg)
    from aat_tpu.models.aslm import init_aslm_params

    adapter = init_aslm_params(jax.random.PRNGKey(seed), aslm_cfg)
    params = {"audio_encoder": enc_params, "adapter": adapter, "lm_decoder": lm_params}

    if from_pretrained_adapter is not None:
        # partial restore semantics (_keys_to_ignore_on_load_missing,
        # modeling_aslm.py:100): load the adapter against fresh enc/dec
        import os

        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            os.path.join(os.path.abspath(from_pretrained_adapter), "state"),
            target={"params": {"adapter": adapter}, "step": 0},
        )
        params["adapter"] = restored["params"]["adapter"]
        logger.info("loaded adapter from %s", from_pretrained_adapter)

    return model, params
