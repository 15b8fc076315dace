"""Flagship-scale overfit demonstration on the real TPU.

Drives the ``overfit_one_batch_config`` preset (the reference ships this
preset for exactly this purpose, /root/reference/src/aat/training/config.py:65-87)
at flagship shapes — hubert-large encoder + SmolLM-135M decoder, bf16,
on-device adaptive segmentation (north-star config 5) — on ONE fixed batch
until eval caption CE < 0.1, recording the loss curve.

Weights are random-initialized (zero egress: pretrained checkpoints cannot
download here); the demonstration is that the FRAMEWORK trains at scale —
optimizer, mixed precision, dropout/LayerDrop, donated fused step — not
that a pretrained model converges. The LM decoder is unfrozen so the full
~450M parameters train.

    python benchmarks/overfit_tpu.py [--tiny] [--max-steps N]

Writes benchmarks/overfit_curve.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_batch(bs, seconds, text_len, vocab, seed=0):
    """Speech-like waveforms (bursts separated by near-silence, so adaptive
    segmentation finds real boundaries) + fixed random captions."""
    rng = np.random.default_rng(seed)
    n = int(seconds * 16000)
    raw = np.zeros((bs, n), np.float32)
    for b in range(bs):
        t = np.arange(n) / 16000
        envelope = np.zeros(n)
        pos = 0
        while pos < n:
            burst = int(rng.uniform(0.15, 0.6) * 16000)
            gap = int(rng.uniform(0.05, 0.3) * 16000)
            envelope[pos:pos + burst] = np.hanning(max(burst, 2))[:burst][:max(n - pos, 0)]
            pos += burst + gap
        carrier = rng.normal(0, 1.0, n) * 0.5 + 0.3 * np.sin(2 * np.pi * (180 + 30 * b) * t)
        raw[b] = (envelope * carrier).astype(np.float32)
    ids = rng.integers(3, vocab, (bs, text_len))
    ids[:, 0] = 1
    ids[:, -1] = 2
    mask = np.ones((bs, text_len), np.int64)
    return {
        "raw_waveforms": raw,
        "raw_lengths": np.full((bs,), n, np.int32),
        "input_ids": ids,
        "attention_mask": mask,
        "input_ids_attention_mask": mask,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true",
                        help="tiny model smoke test (CPU-friendly)")
    parser.add_argument("--max-steps", type=int, default=600)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--target", type=float, default=0.1)
    args = parser.parse_args()

    from aat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from aat_tpu.models import hubert as hub
    from aat_tpu.models import llama as llm
    from aat_tpu.models.aslm import AslmConfig, AslmModel
    from aat_tpu.training.config import overfit_one_batch_config
    from aat_tpu.training.trainer import AATTrainerSegmentation

    if args.tiny:
        audio_cfg, lm_cfg = hub.tiny_test_config(), llm.tiny_test_config()
        bs, seconds, text_len = 2, 1.0, 8
    else:
        audio_cfg, lm_cfg = hub.hubert_large_config(), llm.smollm_135m_config()
        bs, seconds, text_len = 8, 6.0, 24

    config = AslmConfig(
        projection_type="linear",
        audio_encoder_hidden=audio_cfg.hidden_size,
        lm_hidden=lm_cfg.hidden_size,
    )
    model = AslmModel(config, audio_cfg, lm_cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree.leaves(params))

    # the reference's overfit preset, adapted: LM unfrozen (random weights —
    # the preset assumes a pretrained LM), max_steps/lr from flags
    tcfg = overfit_one_batch_config()
    tcfg.learning_rate = args.lr
    tcfg.warmup_steps = 20
    tcfg.max_steps = args.max_steps
    tcfg.gradient_accumulation_steps = 1
    tcfg.train_audio_encoder = True
    tcfg.train_lm_decoder = True
    tcfg.compute_dtype = "float32" if args.tiny else "bfloat16"
    tcfg.logging_steps = 10**9
    tcfg.eval_steps = 0
    tcfg.save_steps = 0
    tcfg.max_segment_frames = 4000
    tcfg.max_on_device_segments = 48
    tcfg.segmentation = "adaptive"
    tcfg.output_dir = "/tmp/aat_overfit"

    trainer = AATTrainerSegmentation(model, params, tcfg)
    batch = make_batch(bs, seconds, text_len, lm_cfg.vocab_size)
    sb = trainer._shard_batch(batch)

    print(json.dumps({"event": "start", "params": n_params,
                      "audio_s": bs * seconds}), flush=True)

    curve = []
    t_start = time.time()
    t_compile = None
    target_hit = None
    for step in range(1, args.max_steps + 1):
        fetch = step <= 2 or step % 10 == 0
        metrics = trainer.training_step([sb], fetch_metrics=fetch)
        if step == 1:
            t_compile = time.time() - t_start
        if fetch:
            # eval-mode CE (no dropout/LayerDrop) is the convergence metric
            eval_loss = float(trainer._eval_step(trainer.state.params, sb)[0])
            train_loss = metrics.get("train/loss")
            curve.append({"step": step, "train_loss": train_loss,
                          "eval_loss": eval_loss,
                          "wall_s": round(time.time() - t_start, 1)})
            print(json.dumps(curve[-1]), flush=True)
            if eval_loss < args.target:
                target_hit = step
                break

    result = {
        "event": "done",
        "params": n_params,
        "target": args.target,
        "target_hit_at_step": target_hit,
        "final_eval_loss": curve[-1]["eval_loss"] if curve else None,
        "compile_s": round(t_compile, 1) if t_compile else None,
        "total_wall_s": round(time.time() - t_start, 1),
        "curve": curve,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "overfit_curve.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "curve"}),
          flush=True)


if __name__ == "__main__":
    main()
