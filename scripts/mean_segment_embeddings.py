"""Mean-pooled segment embeddings.

Parity: /root/reference/scripts/mean_hubert_embeddings.py:7-23 — for each
saved per-segment frame-embedding file, mean over the frame dimension and
concatenate into ``[1, n_segments, E]``; save next to the input.

Usage:
    python scripts/mean_segment_embeddings.py \
        --embeddings data/audio_segments_embeddings \
        --out data/audio_embeddings_mean_tokenized
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--embeddings", default="data/audio_segments_embeddings")
    parser.add_argument("--out", default="data/audio_embeddings_mean_tokenized")
    args = parser.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for name in sorted(os.listdir(args.embeddings)):
        if not name.endswith(".npz"):
            continue
        out_path = os.path.join(args.out, name.replace(".npz", ".npy"))
        if os.path.exists(out_path):
            continue
        data = np.load(os.path.join(args.embeddings, name))
        keys = sorted(data.files, key=lambda k: int(k.split("_")[1]))
        means = [data[k].mean(axis=0, keepdims=True) for k in keys]  # [1, E] each
        pooled = np.concatenate([m[None, :, :] for m in means], axis=1)  # [1, S, E]
        np.save(out_path, pooled)


if __name__ == "__main__":
    main()
