"""Whole-utterance batch-size sweep (VERDICT r3 item 1).

Finds the official batch size for the whole-utterance training row:
bs in {2, 4, 6, 8} x remat in {none, dots}, measured the perf_suite way
(double warmup for donated layouts, in-run best-of, scalar-fetch timing).

Run:  python benchmarks/ab_whole_batch.py [--bs 2 4 8] [--remat none dots]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, nargs="+", default=[2, 4, 6, 8])
    ap.add_argument("--remat", nargs="+", default=["none", "dots"])
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    from aat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from aat_tpu.models import hubert as hub
    from aat_tpu.models import llama as llm
    from aat_tpu.models.aslm import AslmConfig, AslmModel
    from aat_tpu.training.config import TrainingConfig
    from aat_tpu.training.trainer import AATTrainer
    from aat_tpu.utils.flops import aslm_train_step_flops, mfu

    text_len = 32
    for remat_mode in args.remat:
        audio_cfg = dataclasses.replace(
            hub.hubert_large_config(), attention_impl="pallas",
            remat=remat_mode != "none",
            remat_policy="dots" if remat_mode == "dots" else "full",
            hidden_dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, layerdrop=0.0,
        )
        lm_cfg = dataclasses.replace(
            llm.smollm_135m_config(), attention_impl="pallas")
        config = AslmConfig(
            projection_type="linear",
            audio_encoder_hidden=audio_cfg.hidden_size,
            lm_hidden=lm_cfg.hidden_size,
        )
        model = AslmModel(config, audio_cfg, lm_cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        for bs in args.bs:
            rng = np.random.default_rng(0)
            n = int(args.seconds * 16000)
            batch = {
                "waveforms": rng.normal(0, 0.3, (bs, n)).astype(np.float32),
                "waveforms_attention_mask": np.ones((bs, n), np.int32),
                "input_ids": rng.integers(1, lm_cfg.vocab_size, (bs, text_len)),
                "attention_mask": np.ones((bs, text_len), np.int32),
                "input_ids_attention_mask": np.ones((bs, text_len), np.int32),
            }
            audio_seconds = bs * args.seconds
            tcfg = TrainingConfig(
                learning_rate=1e-4, warmup_steps=10, max_steps=1000,
                gradient_accumulation_steps=1,
                train_audio_encoder=True, train_lm_decoder=False,
                compute_dtype="bfloat16",
                logging_steps=10**9, eval_steps=0, save_steps=0,
                output_dir="/tmp/aat_bench_whole",
            )
            trainer = AATTrainer(model, params, tcfg)
            try:
                sb = trainer._shard_batch(batch)
                trainer.training_step([sb])
                trainer.training_step([sb])  # second compile (donated layouts)
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    for i in range(args.iters):
                        trainer.training_step(
                            [sb], fetch_metrics=(i == args.iters - 1))
                    best = min(best,
                               (time.perf_counter() - t0) / args.iters)
                flops = aslm_train_step_flops(
                    audio_cfg, lm_cfg, config, bs, None, n, text_len,
                    train_audio_encoder=True, train_lm_decoder=False)
                total = flops["total"] if isinstance(flops, dict) else flops
                print(f"bs={bs} remat={remat_mode}: {best*1e3:.1f} ms, "
                      f"{audio_seconds/best:.1f} audio_s/s, "
                      f"MFU {mfu(total, best)*100:.1f}%", flush=True)
            except Exception as exc:  # OOM etc.
                print(f"bs={bs} remat={remat_mode}: FAILED "
                      f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)
            del trainer


if __name__ == "__main__":
    main()
