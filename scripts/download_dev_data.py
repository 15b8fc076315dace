"""Pull a small dev shard of the alignment dataset for local iteration.

Parity: /root/reference/scripts/download_dev_data.py:1-11.

Usage: python scripts/download_dev_data.py --out data/dev_1000.dataset
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="nguyenvulebinh/asr-alignment")
    parser.add_argument("--split", default="train")
    parser.add_argument("--items", type=int, default=1000)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    import datasets

    streamed = datasets.load_dataset(args.dataset, "libris", streaming=True)[args.split]
    items = list(streamed.take(args.items))
    datasets.Dataset.from_list(items).save_to_disk(args.out)


if __name__ == "__main__":
    main()
