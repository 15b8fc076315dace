"""Offline per-segment HuBERT frame embeddings.

The reference consumes ``data/audio_segments_embeddings/`` but the producer
script is absent from its snapshot (SURVEY §3.4); this provides that step:
adaptive-tokenize each utterance, encode every segment with HuBERT, save the
per-segment frame embeddings ``[n_segments] -> [T_i, E]`` per item.

TPU-native: segments are materialized on device and encoded in one batched
jit; ragged segment lengths ride a dense [S, max_frames] layout with masks.

Usage:
    python scripts/segment_embeddings.py --dataset <hub-name-or-dir> \
        --out data/audio_segments_embeddings [--encoder facebook/hubert-large-ls960-ft]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--out", default="data/audio_segments_embeddings")
    parser.add_argument("--encoder", default="facebook/hubert-large-ls960-ft")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--pretrained", action="store_true", default=True)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from aat_tpu.audio import AudioWaveform
    from aat_tpu.data.dataloaders import load_hf_dataset
    from aat_tpu.models import hubert as hub
    from aat_tpu.ops.mel import normalize_waveform
    from aat_tpu.tokenizer import AdaptiveAudioTokenizer
    from aat_tpu.training.config import TrainingConfig
    from aat_tpu.models.build import build_audio_encoder

    cfg = TrainingConfig(audio_encoder_checkpoint=args.encoder)
    params, enc_cfg = build_audio_encoder(cfg, pretrained=args.pretrained)
    params = jax.device_put(params)  # once — ported params start as host numpy

    tokenizer = AdaptiveAudioTokenizer()
    max_frames = tokenizer.max_segment_frames

    @jax.jit
    def encode(waveforms, mask):
        return hub.hubert_encode(params, enc_cfg, waveforms, mask)

    ds = load_hf_dataset(args.dataset, args.split)
    if args.limit:
        ds = ds.select(range(args.limit))
    os.makedirs(args.out, exist_ok=True)

    for item in ds:
        out_path = os.path.join(args.out, str(item["id"]) + ".npz")
        if os.path.exists(out_path):
            continue
        waveform = normalize_waveform(np.asarray(item["audio"]["array"]))
        segments, _ = tokenizer.tokenize(AudioWaveform(waveform, 16000))
        batch = np.zeros((len(segments), max_frames), np.float32)
        mask = np.zeros((len(segments), max_frames), np.int32)
        for i, seg in enumerate(segments):
            n = seg.waveform.shape[-1]
            batch[i, :n] = seg.waveform
            mask[i, :n] = 1
        frames, frame_mask = encode(jnp.asarray(batch), jnp.asarray(mask))
        frames = np.asarray(frames)
        frame_mask = np.asarray(frame_mask)
        arrays = {
            f"segment_{i}": frames[i, frame_mask[i].astype(bool)]
            for i in range(len(segments))
        }
        np.savez(out_path, **arrays)


if __name__ == "__main__":
    main()
