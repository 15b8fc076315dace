"""Parity harness: device pipeline vs host-exact reference numerics.

Covers BASELINE configs 1-3 end to end on synthetic (or provided) audio:
  1. mel spectrogram      — device f32 vs bit-exact host float64 path
  2. segment boundaries   — device table vs host-exact spans (bit-identical)
  3. segment embeddings   — bf16 vs f32 HuBERT segment means (MSE)

Usage:
    python scripts/parity_check.py [--clips 8] [--seconds 6] [--encoder-check]
Exit code 0 iff every boundary matches and MSE is under threshold.

Weights-injection runbook (full-scale checkpoint parity, BASELINE north star):
    python scripts/parity_check.py --weights <local HF HubertModel dir> \
        [--lm-weights <local HF LlamaForCausalLM dir>] [--cpu]
Ports the torch checkpoint through aat_tpu.utils.port and runs, on top of the
boundary checks above:
  4. frame-level port parity  — torch f32 forward vs JAX f32 (< 2e-4 max diff)
  5. pipeline segment means   — production bf16 path vs torch f32 oracle
                                (relative MSE < 1e-3, the reference's north
                                star: /root/reference/README.md benchmark)
  6. (with --lm-weights) full eval wiring: ported encoder + LM assembled into
     an ASLM, beam generation + WER/BLEU through the real trainer.evaluate.
The environment has zero egress so pretrained weights cannot download here;
point --weights at any locally saved `HubertModel.save_pretrained` directory
(e.g. facebook/hubert-large-ls960-ft) and the <1e-3 MSE check runs as-is.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_speechlike(rng, seconds, sr=16000):
    n = int(seconds * sr)
    t = np.arange(n) / sr
    env = np.zeros(n)
    pos = 0
    while pos < n:
        burst = int(rng.uniform(0.15, 0.6) * sr)
        gap = int(rng.uniform(0.05, 0.3) * sr)
        env[pos : pos + burst] = np.hanning(max(burst, 2))[:burst][: max(n - pos, 0)]
        pos += burst + gap
    w = env * (rng.normal(0, 1, n) * 0.5 + 0.3 * np.sin(2 * np.pi * 220 * t))
    return w + rng.normal(0, 1e-4, n)


class _WordTokenizer:
    """Minimal HF-tokenizer-shaped fallback (word-level) used only when the
    --lm-weights dir ships no tokenizer files; lets the WER wiring run."""

    bos_token_id = 1
    eos_token_id = 2

    def __init__(self):
        self.vocab = {"<pad>": 0, "<s>": 1, "</s>": 2}

    def _id(self, w):
        if w not in self.vocab:
            self.vocab[w] = len(self.vocab)
        return self.vocab[w]

    def decode(self, ids):
        rev = {v: k for k, v in self.vocab.items()}
        return " ".join(rev.get(int(i), "?") for i in ids)

    def batch_decode(self, ids_batch, skip_special_tokens=True):
        rev = {v: k for k, v in self.vocab.items()}
        out = []
        for ids in ids_batch:
            words = [rev.get(int(i), "") for i in ids]
            if skip_special_tokens:
                words = [w for w in words if w not in ("<s>", "</s>", "<pad>", "")]
            out.append(" ".join(words))
        return out

    def __call__(self, texts, padding=True):
        seqs = []
        for t in texts:
            t = t.replace("<s>", " <s> ").replace("</s>", " </s> ")
            seqs.append([self._id(w) for w in t.split()])
        max_len = max(len(s) for s in seqs)
        ids = np.zeros((len(seqs), max_len), np.int64)
        mask = np.zeros((len(seqs), max_len), np.int64)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def run_weights_parity(args, tok) -> int:
    """Port a LOCAL torch checkpoint through utils/port.py and run the
    full-scale parity checks the zero-egress environment otherwise blocks
    (reference weights: facebook/hubert-large-ls960-ft + SmolLM/Qwen,
    /root/reference/scripts/trainer_train.py:180-225). Returns #failures."""
    import jax
    import jax.numpy as jnp
    import torch
    import transformers

    from aat_tpu.models import hubert as hub
    from aat_tpu.ops.mel import normalize_waveform
    from aat_tpu.ops.ragged import masked_mean
    from aat_tpu.utils.port import port_hubert

    torch.backends.mkldnn.enabled = False  # oneDNN bf16 fastmath breaks oracles
    failures = 0

    cls = (transformers.Wav2Vec2Model if args.encoder_type == "wav2vec2"
           else transformers.HubertModel)
    tm = cls.from_pretrained(
        args.weights, mask_time_prob=0.0, local_files_only=True
    ).eval()
    params, cfg = port_hubert(tm)
    print(f"ported {args.weights}: hidden={cfg.hidden_size} "
          f"layers={cfg.num_hidden_layers} conv={cfg.conv_dim}")

    encode = jax.jit(
        lambda p, w, m: hub.hubert_encode(p, cfg, w, m)
    )

    # config 4: frame-level port parity, f32 vs torch f32 (on CPU so the
    # comparison is not polluted by TPU f32 matmul passes)
    rng = np.random.default_rng(0)
    wav = rng.normal(0, 0.5, (2, 6400)).astype(np.float32)
    mask = np.ones((2, 6400), np.int64)
    mask[1, 4000:] = 0
    with torch.no_grad():
        ref_frames = tm(torch.tensor(wav),
                        attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    with jax.default_device(jax.devices("cpu")[0]):
        ours, fm = encode(params, jnp.asarray(wav), jnp.asarray(mask))
        ours, fm = np.asarray(ours), np.asarray(fm).astype(bool)
    diff = float(np.abs(ours - ref_frames)[fm].max())
    ok = diff < args.port_threshold
    failures += not ok
    print(f"port parity (f32 frames): max |err| {diff:.2e} "
          f"({'OK' if ok else 'FAIL'} @ {args.port_threshold})")

    # config 5: production pipeline segment means — our bf16 device path vs
    # the torch f32 oracle on the SAME host-exact segment boundaries.
    # This is the reference's <1e-3 MSE north star (BASELINE.md config 3).
    segs = []
    for i in range(args.weights_clips):
        w = normalize_waveform(
            make_speechlike(np.random.default_rng(100 + i), args.seconds)
        ).astype(np.float32)
        spans, _ = tok.segment_spans(w)
        for start, end, out_len in spans:
            piece = np.zeros(out_len, np.float32)
            piece[: end - start] = w[start:end]
            segs.append(piece)
    max_len = max(s.size for s in segs)
    batch = np.zeros((len(segs), max_len), np.float32)
    smask = np.zeros((len(segs), max_len), np.int64)
    for i, s in enumerate(segs):
        batch[i, : s.size] = s
        smask[i, : s.size] = 1
    with torch.no_grad():
        tref = tm(torch.tensor(batch),
                  attention_mask=torch.tensor(smask)).last_hidden_state.numpy()
    params_bf16 = jax.device_put(
        jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    )
    frames16, fm16 = encode(params_bf16, jnp.asarray(batch),
                            jnp.asarray(smask))
    means16 = np.asarray(
        masked_mean(frames16.astype(jnp.float32), fm16), dtype=np.float64
    )
    fmask = np.asarray(fm16).astype(np.float64)
    ref_means = (tref * fmask[..., None]).sum(1) / fmask.sum(1, keepdims=True)
    rel_mse = float(np.mean((means16 - ref_means) ** 2) / np.mean(ref_means ** 2))
    ok = rel_mse < args.mse_threshold
    failures += not ok
    print(f"pipeline segment means ({len(segs)} segments, bf16 device path "
          f"vs torch f32): relative MSE {rel_mse:.2e} "
          f"({'OK' if ok else 'FAIL'} @ {args.mse_threshold})")

    if args.lm_weights:
        failures += run_eval_wiring(args, params, cfg)
    return failures


def run_eval_wiring(args, enc_params, enc_cfg) -> int:
    """Assemble ported encoder + ported LM into an ASLM and run the REAL
    eval loop (beam generation + WER/BLEU/METEOR) on synthetic items —
    proving the weights-injection path end to end. Metrics are meaningless
    without a trained adapter; what is checked is that the loop runs and
    returns finite numbers."""
    import jax
    import transformers

    from aat_tpu.data.collate import TokenizedAudioWaveformCollator
    from aat_tpu.data.dataloaders import BatchIterator
    from aat_tpu.models.aslm import AslmConfig, AslmModel, init_aslm_params
    from aat_tpu.tokenizer import AdaptiveAudioTokenizer
    from aat_tpu.training.config import TrainingConfig
    from aat_tpu.training.metrics import ComputeMetrics
    from aat_tpu.training.trainer import AATTrainerSegmentation
    from aat_tpu.utils.port import port_llama

    lm_torch = transformers.LlamaForCausalLM.from_pretrained(
        args.lm_weights, local_files_only=True
    ).eval()
    lm_params, lm_cfg = port_llama(lm_torch)
    del lm_torch
    print(f"ported {args.lm_weights}: hidden={lm_cfg.hidden_size} "
          f"layers={lm_cfg.num_hidden_layers} vocab={lm_cfg.vocab_size}")

    try:
        tokenizer = transformers.AutoTokenizer.from_pretrained(
            args.lm_weights, local_files_only=True
        )
        tokenizer.add_bos_token = True
        tokenizer.add_eos_token = True
    except Exception as exc:  # no tokenizer files shipped with the weights
        print(f"no tokenizer in {args.lm_weights} ({exc}); "
              "using word-level fallback for the wiring check")
        tokenizer = _WordTokenizer()

    tcfg = TrainingConfig(segmentation="adaptive", eval_steps=0, save_steps=0)
    aslm_cfg = AslmConfig(
        projection_type=tcfg.projection_type,
        audio_encoder_embeddings_seq_len=tcfg.audio_encoder_embeddings_seq_len,
        audio_encoder_hidden=enc_cfg.hidden_size,
        lm_hidden=lm_cfg.hidden_size,
    )
    model = AslmModel(aslm_cfg, enc_cfg, lm_cfg)
    params = {
        "audio_encoder": enc_params,
        "adapter": init_aslm_params(jax.random.PRNGKey(0), aslm_cfg),
        "lm_decoder": lm_params,
    }
    trainer = AATTrainerSegmentation(
        model, params, tcfg,
        compute_metrics=ComputeMetrics(tokenizer), tokenizer=tokenizer,
    )

    audio_tok = AdaptiveAudioTokenizer.create(
        min_segment_duration_milliseconds=500,
        max_segment_duration_milliseconds=(
            tcfg.max_segment_frames * 1000 // tcfg.sampling_rate
        ),
    )
    collate = TokenizedAudioWaveformCollator(
        tcfg.audio_encoder_type, tcfg.segmentation, audio_tok, tokenizer,
        uniform_segmentation_frames_per_segment=tcfg.max_segment_frames,
    )
    items = []
    for i in range(2):
        rng = np.random.default_rng(200 + i)
        w = make_speechlike(rng, 2.0)
        n_words = 6
        starts = np.linspace(0, 1.8, n_words)
        items.append({
            "id": f"parity-{i}",
            "audio": {"array": w, "sampling_rate": 16000},
            "words": [f"word{j}" for j in range(n_words)],
            "word_start": starts.tolist(),
            "word_end": (starts + 0.15).tolist(),
        })
    batches = BatchIterator(items, collate, 2, shuffle=False,
                            drop_last=False, is_validation=True)
    metrics = trainer.evaluate(batches)
    wer = metrics.get("eval/wer", metrics.get("wer"))
    ok = wer is not None and np.isfinite(float(wer))
    print(f"eval wiring (ported encoder+LM, beam generation): "
          f"{ {k: round(float(v), 4) for k, v in metrics.items()} } "
          f"({'OK' if ok else 'FAIL'})")
    return int(not ok)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--clips", type=int, default=8)
    parser.add_argument("--seconds", type=float, default=6.0)
    parser.add_argument("--mse-threshold", type=float, default=1e-3)
    parser.add_argument("--encoder-check", action="store_true",
                        help="also compare bf16 vs f32 HuBERT segment means")
    parser.add_argument("--weights", default=None,
                        help="local HF HubertModel/Wav2Vec2Model dir: port "
                             "through utils/port.py and run full-scale "
                             "checkpoint parity (frames + segment-mean MSE)")
    parser.add_argument("--lm-weights", default=None,
                        help="local HF LlamaForCausalLM dir: additionally "
                             "assemble the ASLM and run the WER eval wiring")
    parser.add_argument("--encoder-type", default="hubert",
                        choices=("hubert", "wav2vec2"))
    parser.add_argument("--port-threshold", type=float, default=2e-4)
    parser.add_argument("--weights-clips", type=int, default=2,
                        help="clips for the segment-mean MSE check")
    parser.add_argument("--cpu", action="store_true",
                        help="force the JAX CPU backend")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from aat_tpu.ops.mel import log_mel_spectrogram_exact, normalize_waveform
    from aat_tpu.tokenizer import AdaptiveAudioTokenizer
    from aat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    tok = AdaptiveAudioTokenizer()
    failures = 0

    for i in range(args.clips):
        w = normalize_waveform(
            make_speechlike(np.random.default_rng(i), args.seconds + i % 3)
        )
        # config 1: melspec (device f32 vs bit-exact host)
        exact = log_mel_spectrogram_exact(w)
        out = tok.tokenize_batch(
            w[None].astype(np.float32), np.array([w.size], np.int32)
        )
        t_valid = w.size // 160 + 1
        device_mel = np.asarray(out["melspec"])[0, :, :t_valid]
        mel_max_err = float(np.abs(device_mel - exact).max())

        # config 3: boundaries (must be bit-identical)
        host_spans = tok.segment_spans(w)[0]
        n = int(out["num_segments"][0])
        device_spans = [
            (int(out["starts"][0, j]), int(out["ends"][0, j]), int(out["out_lens"][0, j]))
            for j in range(n)
        ]
        boundaries_ok = device_spans == host_spans
        failures += not boundaries_ok
        print(f"clip {i}: boundaries {'OK' if boundaries_ok else 'MISMATCH'} "
              f"({n} segments), mel max |err| {mel_max_err:.2e}")

    if args.encoder_check:
        from aat_tpu.models import hubert as hub
        from aat_tpu.ops.ragged import masked_mean

        cfg = hub.hubert_large_config()
        params = jax.device_put(hub.init_hubert_params(0, cfg))
        params_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        rng = np.random.default_rng(0)
        seg = rng.normal(0, 0.5, (8, 4000)).astype(np.float32)
        mask = np.ones((8, 4000), np.int32)

        import functools

        @functools.partial(jax.jit, static_argnames=("dtype",))
        def means(p, w, m, dtype):
            frames, fm = hub.hubert_encode(p, cfg, w.astype(dtype), m)
            return masked_mean(frames.astype(jnp.float32), fm)

        m32 = np.asarray(means(params, jnp.asarray(seg), jnp.asarray(mask), dtype=jnp.float32))
        m16 = np.asarray(means(params_bf16, jnp.asarray(seg), jnp.asarray(mask), dtype=jnp.bfloat16))
        rel_mse = float(np.mean((m32 - m16) ** 2) / np.mean(m32 ** 2))
        ok = rel_mse < args.mse_threshold
        failures += not ok
        print(f"encoder bf16-vs-f32 segment-mean relative MSE: {rel_mse:.2e} "
              f"({'OK' if ok else 'FAIL'} @ {args.mse_threshold})")

    if args.weights:
        failures += run_weights_parity(args, tok)

    print("PARITY:", "PASS" if failures == 0 else f"FAIL ({failures})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
