"""Segment-count statistics for a tokenized dataset.

Parity: /root/reference/scripts/dataset_info.py:1-15.

Usage: python scripts/dataset_info.py --dataset <dir>
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True)
    args = parser.parse_args()

    from aat_tpu.data.dataloaders import load_hf_dataset

    ds = load_hf_dataset(args.dataset)
    counts = np.array([len(item["segment_frames"]) for item in ds])
    print(f"items: {len(counts)}")
    print(f"segments/utt: mean {counts.mean():.2f} p50 {np.percentile(counts, 50):.0f} "
          f"p95 {np.percentile(counts, 95):.0f} max {counts.max()}")
    durations = np.array([sum(item["segment_frames"]) / 16000 for item in ds])
    print(f"duration_s: mean {durations.mean():.2f} total {durations.sum():.1f}")


if __name__ == "__main__":
    main()
