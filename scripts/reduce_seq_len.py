"""Attach word alignments to a tokenized-segments dataset.

Parity: /root/reference/scripts/reduce_seq_len.py:5-25 — zip the
segment-annotated dataset with the streaming word-alignment columns
(words / word_start / word_end) so the collator can do word-aligned
``n_words`` crops, then save.

Usage:
    python scripts/reduce_seq_len.py --segments <dir> \
        --alignments nguyenvulebinh/asr-alignment --out <dir>
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--segments", required=True)
    parser.add_argument("--alignments", default="nguyenvulebinh/asr-alignment")
    parser.add_argument("--split", default="train")
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    import datasets

    from aat_tpu.data.dataloaders import load_hf_dataset

    segments_ds = load_hf_dataset(args.segments)
    aligned = datasets.load_dataset(args.alignments, "libris", streaming=True)[args.split]

    words, word_start, word_end = [], [], []
    for item, alignment in zip(segments_ds, aligned):
        assert item["id"] == alignment["id"], (item["id"], alignment["id"])
        words.append(alignment["words"])
        word_start.append(alignment["word_start"])
        word_end.append(alignment["word_end"])

    segments_ds = segments_ds.add_column("words", words)
    segments_ds = segments_ds.add_column("word_start", word_start)
    segments_ds = segments_ds.add_column("word_end", word_end)
    segments_ds.save_to_disk(args.out)


if __name__ == "__main__":
    main()
