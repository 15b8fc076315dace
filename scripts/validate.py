"""Standalone validation: rebuild a model from a checkpoint, evaluate.

Parity: /root/reference/scripts/validation.py:20-53 (100 val items,
batch 20, metrics via trainer.evaluate).

Usage:
    python scripts/validate.py --checkpoint <dir> \
        [--dataset nguyenvulebinh/asr-alignment] [--items 100] [--batch 20]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--dataset", default="nguyenvulebinh/asr-alignment")
    parser.add_argument("--items", type=int, default=100)
    parser.add_argument("--batch", type=int, default=20)
    parser.add_argument("--segmentation", default="adaptive")
    parser.add_argument("--projection-type", default="linear")
    parser.add_argument("--pretrained", action=argparse.BooleanOptionalAction, default=True)
    args = parser.parse_args()

    from aat_tpu.data.collate import TokenizedAudioWaveformCollator
    from aat_tpu.data.dataloaders import BatchIterator, load_hf_dataset
    from aat_tpu.models.build import build_model, build_tokenizer
    from aat_tpu.tokenizer import AdaptiveAudioTokenizer
    from aat_tpu.training.config import TrainingConfig
    from aat_tpu.training.metrics import ComputeMetrics
    from aat_tpu.training.trainer import AATTrainerSegmentation

    config = TrainingConfig(
        segmentation=args.segmentation, projection_type=args.projection_type
    )
    model, params = build_model(
        config, pretrained=args.pretrained, from_pretrained_adapter=args.checkpoint
    )
    tokenizer = build_tokenizer(config)

    val = load_hf_dataset(args.dataset, "valid")
    val_items = list(val.select(range(min(args.items, len(val)))))

    audio_tokenizer = AdaptiveAudioTokenizer.create(
        min_segment_duration_milliseconds=500,
        max_segment_duration_milliseconds=(
            config.max_segment_frames * 1000 // config.sampling_rate
        ),
    )
    collate = TokenizedAudioWaveformCollator(
        config.audio_encoder_type, config.segmentation, audio_tokenizer, tokenizer,
        uniform_segmentation_frames_per_segment=config.max_segment_frames,
    )
    trainer = AATTrainerSegmentation(
        model, params, config,
        compute_metrics=ComputeMetrics(tokenizer), tokenizer=tokenizer,
    )
    batches = BatchIterator(
        val_items, collate, args.batch, shuffle=False, drop_last=False,
        is_validation=True,
    )
    metrics = trainer.evaluate(batches)
    print(metrics)


if __name__ == "__main__":
    main()
