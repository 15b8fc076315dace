"""Flagship segmented-step batch sweep (VERDICT r4 item 7).

The flagship step (8x16 250 ms segments, hubert-large + SmolLM-135M,
train-mode dropout active) carries ~10 ms of fixed optimizer/dispatch
cost per step; the whole-utterance bs sweep showed +8% per-audio-second
from amortizing it. Probes 2x the batch (16x16 segments) with encoder
remat as the memory lever, measured the perf_suite way (double warmup for
donated layouts, best-of-3 windows, scalar-fetch completion).

    python benchmarks/ab_flagship_batch.py [--bs 8 16] [--remat none dots]

Reference ground: the reference trains at batch 40
(/root/reference/src/aat/training/trainer.py:50).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, nargs="+", default=[8, 16])
    ap.add_argument("--remat", nargs="+", default=["none", "dots"])
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    from aat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from aat_tpu.models import hubert as hub
    from aat_tpu.models import llama as llm
    from aat_tpu.models.aslm import AslmConfig, AslmModel
    from aat_tpu.training.config import TrainingConfig
    from aat_tpu.training.trainer import AATTrainerSegmentation
    from aat_tpu.utils.flops import aslm_train_step_flops, mfu

    n_seg, frames, text_len = 16, 4000, 48
    for remat_mode in args.remat:
        # perf_suite flagship config (train-mode dropout ACTIVE), with the
        # remat axis added as the memory lever for the larger batches
        audio_cfg = dataclasses.replace(
            hub.hubert_large_config(),
            remat=remat_mode != "none",
            remat_policy="dots" if remat_mode == "dots" else "full",
        )
        lm_cfg = llm.smollm_135m_config()
        config = AslmConfig(
            projection_type="linear",
            audio_encoder_hidden=audio_cfg.hidden_size,
            lm_hidden=lm_cfg.hidden_size,
        )
        model = AslmModel(config, audio_cfg, lm_cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        for bs in args.bs:
            tcfg = TrainingConfig(
                learning_rate=1e-4, warmup_steps=10, max_steps=1000,
                gradient_accumulation_steps=1,
                train_audio_encoder=True, train_lm_decoder=False,
                compute_dtype="bfloat16",
                logging_steps=10**9, eval_steps=0, save_steps=0,
                output_dir="/tmp/aat_ab_flagship_batch",
            )
            trainer = AATTrainerSegmentation(model, params, tcfg)
            rng = np.random.default_rng(0)
            batch = {
                "batched_segments": rng.normal(
                    0, 0.3, (bs, n_seg, frames)).astype(np.float32),
                "segments_waveforms_mask": np.ones(
                    (bs, n_seg, frames), np.float32),
                "segments_boarders_attention_mask": np.ones(
                    (bs, n_seg), np.int32),
                "input_ids": rng.integers(1, lm_cfg.vocab_size, (bs, text_len)),
                "attention_mask": np.ones((bs, text_len), np.int32),
                "input_ids_attention_mask": np.ones((bs, text_len), np.int32),
            }
            audio_seconds = bs * n_seg * frames / 16000
            try:
                sb = trainer._shard_batch(batch)
                trainer.training_step([sb])
                trainer.training_step([sb])  # donated-layout recompile
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    for i in range(args.iters):
                        trainer.training_step(
                            [sb], fetch_metrics=(i == args.iters - 1))
                    best = min(best, (time.perf_counter() - t0) / args.iters)
                fl = aslm_train_step_flops(
                    audio_cfg, lm_cfg, config, bs, n_seg, frames, text_len,
                    train_audio_encoder=True, train_lm_decoder=False)
                total = fl["total"] if isinstance(fl, dict) else fl
                print(json.dumps({
                    "bs": bs, "remat": remat_mode,
                    "ms": round(best * 1e3, 1),
                    "audio_s_per_s": round(audio_seconds / best, 1),
                    "mfu_pct": round(100 * mfu(total, best), 2),
                }), flush=True)
            except Exception as exc:  # noqa: BLE001 — OOM rows shouldn't kill sweep
                print(json.dumps({
                    "bs": bs, "remat": remat_mode,
                    "error": f"{type(exc).__name__}: {str(exc)[:200]}",
                }), flush=True)
            del trainer


if __name__ == "__main__":
    main()
