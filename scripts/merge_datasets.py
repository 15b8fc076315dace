"""Concatenate arrow dataset shards.

Parity: /root/reference/scripts/merge_datasets.py:1-11.

Usage:
    python scripts/merge_datasets.py --shards a.dataset b.dataset ... --out merged.dataset
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--shards", nargs="+", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    import datasets

    shards = [datasets.load_from_disk(p) for p in args.shards]
    datasets.concatenate_datasets(shards).save_to_disk(args.out)


if __name__ == "__main__":
    main()
