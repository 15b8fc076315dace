"""Shared fixtures for the 2-process multihost equivalence test: both the
worker processes and the single-process reference build EXACTLY this data
and model."""

import numpy as np


def make_items(n=4):
    return list(range(n))


def collate(items):
    """Deterministic segmented batch; row i is a pure function of item id."""
    rows = [int(i) for i in items]
    bs = len(rows)
    seg = np.stack([
        np.random.default_rng(100 + i).normal(0, 0.3, (2, 400)).astype(np.float32)
        for i in rows
    ])
    ids = np.stack([
        np.random.default_rng(200 + i).integers(1, 50, (6,)) for i in rows
    ])
    return {
        "batched_segments": seg,
        "segments_waveforms_mask": np.ones((bs, 2, 400), np.int32),
        "segments_boarders_attention_mask": np.ones((bs, 2), np.int32),
        "input_ids": ids,
        "attention_mask": np.ones((bs, 6), np.int32),
        "input_ids_attention_mask": np.ones((bs, 6), np.int32),
        "prefix_input_ids": ids[:, :2],
        "prefix_attention_mask": np.ones((bs, 2), np.int64),
    }


def build_trainer(mesh, dp, fsdp, tp, output_dir):
    import jax

    from aat_tpu.models import hubert as hub
    from aat_tpu.models import llama as llm
    from aat_tpu.models.aslm import AslmConfig, AslmModel
    from aat_tpu.training.config import TrainingConfig
    from aat_tpu.training.trainer import AATTrainer

    config = AslmConfig(projection_type="linear", audio_encoder_hidden=32,
                        lm_hidden=32, projection_hidden=48)
    model = AslmModel(config, hub.tiny_test_config(), llm.tiny_test_config())
    params = model.init_params(jax.random.PRNGKey(0))
    tcfg = TrainingConfig(
        learning_rate=1e-3, warmup_steps=2, max_steps=100,
        gradient_accumulation_steps=1, train_audio_encoder=True,
        train_lm_decoder=True, compute_dtype="float32",
        mesh_dp=dp, mesh_fsdp=fsdp, mesh_tp=tp,
        eval_steps=0, save_steps=0, logging_steps=1000,
        output_dir=output_dir,
    )
    from aat_tpu.training.generate import GenerationConfig

    class IdTokenizer:
        eos_token_id = 2
        bos_token_id = 1

        def batch_decode(self, ids_batch, skip_special_tokens=True):
            return [" ".join(str(int(i)) for i in ids if int(i) > 2)
                    for ids in ids_batch]

        def decode(self, ids):
            return " ".join(str(int(i)) for i in ids)

    from aat_tpu.training.metrics import ComputeMetrics

    return AATTrainer(
        model, params, tcfg, mesh=mesh,
        compute_metrics=ComputeMetrics(IdTokenizer()),
        tokenizer=IdTokenizer(),
        generation_config=GenerationConfig(num_beams=1),
    )
