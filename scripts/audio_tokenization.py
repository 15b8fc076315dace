"""Offline adaptive-tokenization precompute: per-item segment frame lengths.

Parity: /root/reference/scripts/audio_tokenization.py:25-42 — map the
tokenizer over a dataset, store each item's ``segment_frames`` list, save
the augmented dataset to disk. (The reference calls the pre-tuple tokenize
API — SURVEY §7 'known staleness'; this uses the current contract.)

Usage:
    python scripts/audio_tokenization.py --dataset <hub-name-or-dir> \
        --out data/libris_with_segments.dataset [--batch-device N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from aat_tpu.audio import AudioWaveform
from aat_tpu.ops.mel import normalize_waveform
from aat_tpu.tokenizer import AdaptiveAudioTokenizer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--out", required=True)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--device-batch", type=int, default=0,
                        help="if >0, run the batched on-TPU pipeline with this batch size")
    args = parser.parse_args()

    from aat_tpu.data.dataloaders import load_hf_dataset

    ds = load_hf_dataset(args.dataset, args.split)
    if args.limit:
        ds = ds.select(range(args.limit))

    tokenizer = AdaptiveAudioTokenizer()

    if args.device_batch > 0:
        # throughput path: batched on-device tokenization
        def add_segments_batched(items):
            waveforms = [
                normalize_waveform(np.asarray(a["array"])) for a in items["audio"]
            ]
            lengths = np.array([w.shape[-1] for w in waveforms], np.int32)
            batch = np.zeros((len(waveforms), int(lengths.max())), np.float32)
            for i, w in enumerate(waveforms):
                batch[i, : w.shape[-1]] = w
            out = tokenizer.tokenize_batch(batch, lengths)
            counts = np.asarray(out["num_segments"])
            lens = np.asarray(out["out_lens"])
            items["segment_frames"] = [
                lens[i, : counts[i]].tolist() for i in range(len(waveforms))
            ]
            return items

        ds = ds.map(add_segments_batched, batched=True, batch_size=args.device_batch)
    else:
        def add_segments(item):
            waveform = normalize_waveform(np.asarray(item["audio"]["array"]))
            segments, _ = tokenizer.tokenize(AudioWaveform(waveform, 16000))
            item["segment_frames"] = [s.waveform.shape[-1] for s in segments]
            return item

        ds = ds.map(add_segments)

    ds.save_to_disk(args.out)


if __name__ == "__main__":
    main()
