"""Qwen-1.5-1.8B finetune: sequence-packing factor sweep + device trace.

The packed step folds P utterances per decoder row (block-diagonal
attention) so the 1.84B decoder's weights stream over P x more tokens per
step. Sweeps P to find where the fixed per-step cost (weight streaming
fwd+bwd + Adafactor update, ~independent of batch) stops dominating, and
optionally device-traces one packed step to attribute time.

    python benchmarks/ab_qwen_pack.py [--packs 1 8 16] [--trace]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from aat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--packs", type=int, nargs="+", default=[1, 8, 16])
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--remat", choices=["dots", "none"], default="dots",
                    help="LM remat policy: 'none' spends activation HBM "
                         "(~1 GB/1k tokens) to drop the backward's "
                         "recompute forward — 4x -> 3x forward-equivalents "
                         "of LM FLOPs per step")
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aat_tpu.models import hubert as hub
    from aat_tpu.models import llama as llm
    from aat_tpu.models.aslm import AslmConfig, AslmModel
    from aat_tpu.training.config import TrainingConfig
    from aat_tpu.training.trainer import AATTrainerSegmentation

    audio_cfg = dataclasses.replace(
        hub.hubert_large_config(),
        hidden_dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, layerdrop=0.0,
    )
    lm_cfg = dataclasses.replace(llm.qwen15_18b_config(),
                                 remat=args.remat != "none",
                                 remat_policy="dots")
    config = AslmConfig(
        projection_type="linear",
        audio_encoder_hidden=audio_cfg.hidden_size,
        lm_hidden=lm_cfg.hidden_size,
    )
    model = AslmModel(config, audio_cfg, lm_cfg)
    params0 = model.init_params(jax.random.PRNGKey(0))
    params0 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params0)

    bs, n_seg, frames, text_len = args.bs, 8, 4000, 64
    for pack in args.packs:
        tcfg = TrainingConfig(
            learning_rate=1e-5, warmup_steps=10, max_steps=1000,
            gradient_accumulation_steps=1,
            train_audio_encoder=False, train_lm_decoder=True,
            optimizer="adafactor", compute_dtype="bfloat16",
            lm_pack=pack,
            logging_steps=10**9, eval_steps=0, save_steps=0,
            output_dir="/tmp/aat_ab_qwen_pack",
        )
        trainer = AATTrainerSegmentation(model, params0, tcfg)
        bsp = bs * pack
        rng = np.random.default_rng(0)
        batch = trainer._shard_batch({
            "batched_segments": rng.normal(
                0, 0.3, (bsp, n_seg, frames)).astype(np.float32),
            "segments_waveforms_mask": np.ones((bsp, n_seg, frames), np.float32),
            "segments_boarders_attention_mask": np.ones((bsp, n_seg), np.int32),
            "input_ids": rng.integers(1, lm_cfg.vocab_size, (bsp, text_len)),
            "attention_mask": np.ones((bsp, text_len), np.int32),
            "input_ids_attention_mask": np.ones((bsp, text_len), np.int32),
        })
        audio_seconds = bsp * n_seg * frames / 16000
        try:
            trainer.training_step([batch])
            trainer.training_step([batch])
            m = trainer.training_step([batch], fetch_metrics=True)
            assert np.isfinite(m["train/loss"]), m
            iters = 3
            t0 = time.perf_counter()
            for i in range(iters):
                m = trainer.training_step([batch],
                                          fetch_metrics=(i == iters - 1))
            dt = (time.perf_counter() - t0) / iters
            print(json.dumps({
                "pack": pack, "rows": bsp, "bs": args.bs,
                "remat": args.remat, "ms": round(dt * 1e3, 1),
                "audio_s_per_s": round(audio_seconds / dt, 2),
                "per_utt_ms": round(dt * 1e3 / bsp, 2),
                "loss": round(float(m["train/loss"]), 3),
            }), flush=True)
            if args.trace:  # trace the largest pack that RAN (later packs
                # overwrite; a failed pack can't erase a recorded trace)
                logdir = f"/tmp/aat_trace_qwen_pack{pack}"
                jax.profiler.start_trace(logdir)
                for _ in range(2):
                    trainer.training_step([batch])
                m = trainer.training_step([batch], fetch_metrics=True)
                _ = float(m["train/loss"])
                jax.profiler.stop_trace()
                print(json.dumps({"trace": logdir, "steps": 3}), flush=True)
        except Exception as e:  # noqa: BLE001 — OOM rows shouldn't kill sweep
            print(json.dumps({"pack": pack, "rows": bsp,
                              "error": str(e)[:200]}), flush=True)
        del trainer, batch


if __name__ == "__main__":
    main()
