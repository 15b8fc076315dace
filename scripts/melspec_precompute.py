"""Offline mel-spectrogram precompute.

Parity: /root/reference/scripts/audio_tokenization_melspec.py:26-43 — for
each dataset item, mean/std-normalize the waveform, compute the log-mel
spectrogram, save per-id, skip existing. Saved as ``.npy`` (the reference
pickles tensors with torch.save).

Usage:
    python scripts/melspec_precompute.py --dataset <hub-name-or-dir> \
        --out data/libris_melspectrograms [--limit N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from aat_tpu.ops.mel import log_mel_spectrogram_exact, normalize_waveform


def process_item(item, out_dir):
    path = os.path.join(out_dir, str(item["id"]) + ".npy")
    if os.path.exists(path):  # skip-if-exists (reference :30-31)
        return
    waveform = np.asarray(item["audio"]["array"])
    melspec = log_mel_spectrogram_exact(normalize_waveform(waveform))
    np.save(path, melspec)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--out", default="data/libris_melspectrograms")
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args()

    from aat_tpu.data.dataloaders import load_hf_dataset

    ds = load_hf_dataset(args.dataset, args.split)
    if args.limit:
        ds = ds.select(range(args.limit))
    os.makedirs(args.out, exist_ok=True)
    for item in ds:
        process_item(item, args.out)


if __name__ == "__main__":
    main()
