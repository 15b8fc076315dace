"""ASLM training entry point.

Parity: /root/reference/scripts/trainer_train.py:54-362 — presets via
``-t/-f/-p`` flags plus dataclass-field CLI overrides, model build with
freeze flags, trainer selection by segmentation mode, wandb-style tracking
(JSONL tracker here), optional profiling.

Usage:
    python scripts/train.py [--test-run] [--finetune] [--profile] \
        [--segmentation adaptive] [--projection-type linear] \
        [--dataset <hub-name-or-dir>] [--pretrained/--no-pretrained] ...
"""

import argparse
import dataclasses
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logger = logging.getLogger(__name__)
logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")


def parse_args():
    from aat_tpu.training.config import TrainingConfig

    parser = argparse.ArgumentParser()
    parser.add_argument("-t", "--test-run", action="store_true", default=False)
    parser.add_argument("-f", "--finetune", action="store_true", default=False)
    parser.add_argument("-p", "--profile", action="store_true", default=False)
    parser.add_argument("--dataset", default="nguyenvulebinh/asr-alignment")
    parser.add_argument("--pretrained", action=argparse.BooleanOptionalAction, default=True)
    parser.add_argument("--resume-from-checkpoint", default=None)
    # expose every TrainingConfig field as a flag
    for field in dataclasses.fields(TrainingConfig):
        name = "--" + field.name.replace("_", "-")
        if field.type == "bool" or isinstance(field.default, bool):
            parser.add_argument(name, action=argparse.BooleanOptionalAction, default=None)
        else:
            parser.add_argument(name, default=None)
    return parser.parse_args()


def build_config(args):
    from aat_tpu.training.config import (
        TrainingConfig,
        finetuning_lm_config,
        overfit_one_batch_config,
        projection_training_config,
    )

    if args.finetune:
        config = finetuning_lm_config()
    elif args.profile:
        config = overfit_one_batch_config()
    else:
        config = projection_training_config()

    if args.test_run:
        config.few_train_samples = 100
        config.few_val_samples = 10
        config.per_device_train_batch_size = 10
        config.num_train_epochs = 2

    def cast_like(current, value):
        if isinstance(value, bool) or isinstance(current, bool):
            return bool(value)
        if current is not None:
            return type(current)(value)
        for caster in (int, float):  # None defaults: infer from the literal
            try:
                return caster(value)
            except (TypeError, ValueError):
                continue
        return value

    for field in dataclasses.fields(TrainingConfig):
        value = getattr(args, field.name, None)
        if value is not None:
            setattr(config, field.name, cast_like(getattr(config, field.name), value))

    # output dir suffix parity (trainer_train.py:318-323)
    config.output_dir = (
        f"{config.output_dir}_{config.audio_encoder_embeddings_seq_len}"
        f"_{config.projection_type}_{config.segmentation}"
    )
    return config


def main():
    from aat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args()
    config = build_config(args)

    from aat_tpu.data.collate import (
        NoSegmentationAudioWaveformCollator,
        TokenizedAudioWaveformCollator,
    )
    from aat_tpu.data.dataloaders import BatchIterator, load_hf_dataset
    from aat_tpu.models.build import build_model, build_tokenizer
    from aat_tpu.tokenizer import AdaptiveAudioTokenizer
    from aat_tpu.training.metrics import ComputeMetrics
    from aat_tpu.training.trainer import AATTrainer, AATTrainerSegmentation
    from aat_tpu.utils.tracking import JsonlTracker

    logger.info("building model (pretrained=%s)", args.pretrained)
    model, params = build_model(
        config,
        pretrained=args.pretrained,
        from_pretrained_adapter=config.model_projection_from_pretrained,
    )
    tokenizer = build_tokenizer(config)
    n_params = sum(x.size for x in __import__("jax").tree.leaves(params))
    logger.info("total model parameters: %d", n_params)

    dataset = load_hf_dataset(args.dataset, "train")
    val_dataset = load_hf_dataset(args.dataset, "valid")
    val_items = list(val_dataset.select(range(min(30, len(val_dataset)))))
    if config.few_train_samples is not None:
        dataset = dataset.select(range(config.few_train_samples))
    items = list(dataset.shuffle(seed=config.seed))

    if config.segmentation == "none":
        collate = NoSegmentationAudioWaveformCollator(
            tokenizer, add_prefix=config.add_prefix, noise_augmentation=True
        )
        trainer_cls = AATTrainer
    else:
        # adaptive training raises min segment duration to 500ms
        # (trainer_train.py:119-122); uniform caps segments at
        # max_segment_frames (:91-93)
        audio_tokenizer = AdaptiveAudioTokenizer.create(
            min_segment_duration_milliseconds=(
                500 if config.segmentation == "adaptive" else 125
            ),
            max_segment_duration_milliseconds=(
                config.max_segment_frames * 1000 // config.sampling_rate
            ),
        )
        collate = TokenizedAudioWaveformCollator(
            config.audio_encoder_type,
            config.segmentation,
            audio_tokenizer,
            tokenizer,
            n_words=config.n_words,
            uniform_segmentation_frames_per_segment=config.max_segment_frames,
            add_prefix=config.add_prefix,
        )
        trainer_cls = AATTrainerSegmentation

    tracker = JsonlTracker(os.path.join(config.output_dir, "metrics.jsonl"),
                           project="tokenized_speech_lm")
    trainer = trainer_cls(
        model, params, config,
        compute_metrics=ComputeMetrics(tokenizer),
        tokenizer=tokenizer,
        log_fn=tracker.log,
    )

    import jax

    shard = dict(shard_index=jax.process_index(), num_shards=jax.process_count())
    bucket_key = None
    if config.bucket_by_duration:
        def bucket_key(item):  # noqa: F811
            return len(item["audio"]["array"])

    train_iter = BatchIterator(
        items, collate, config.per_device_train_batch_size,
        shuffle=True, drop_last=True, seed=config.seed, **shard,
        bucket_key=bucket_key,
        bucket_pool_batches=config.bucket_pool_batches,
    )
    val_iter = lambda: BatchIterator(  # noqa: E731
        val_items, collate, min(len(val_items), 20),
        shuffle=False, drop_last=False, is_validation=True, **shard,
    )

    def run():
        # cross-epoch resume (HF resume_from_checkpoint semantics,
        # reference trainer_train.py:156-162): restore once up front, derive
        # the epoch position from the restored step, skip completed epochs
        # (still firing unfreeze_lm_at_epoch for them), and fast-forward the
        # within-epoch position of the interrupted epoch.
        start_epoch = 0
        resume = args.resume_from_checkpoint
        if resume:
            from aat_tpu.training.trainer import read_checkpoint_meta

            meta = read_checkpoint_meta(resume)
            if meta.get("train_lm_decoder") and not config.train_lm_decoder:
                # the interrupted run had already unfrozen the LM: rebuild
                # the optimizer template BEFORE restoring so Adam moments
                # restore instead of re-initializing
                trainer.unfreeze_lm_decoder()
            trainer.restore_checkpoint(resume)
            steps_per_epoch = len(train_iter) // max(
                1, config.gradient_accumulation_steps
            )
            if steps_per_epoch > 0:
                start_epoch = trainer.state.step // steps_per_epoch
        for epoch in range(int(config.num_train_epochs)):
            if (
                config.unfreeze_lm_at_epoch is not None
                and epoch == config.unfreeze_lm_at_epoch
                and not config.train_lm_decoder
            ):
                trainer.unfreeze_lm_decoder()
            if epoch < start_epoch:
                continue
            train_iter.set_epoch(epoch)
            trainer.train(
                train_iter, val_iter,
                fast_forward=bool(resume) and epoch == start_epoch,
            )
        trainer.finalize()  # load_best_model_at_end (reference trainer.py:63)
        trainer.save_checkpoint()

    if args.profile:
        import cProfile

        with cProfile.Profile() as pr:
            run()
        pr.dump_stats("train_profile.prof")
        logger.info("saved profile: train_profile.prof")
    else:
        run()


if __name__ == "__main__":
    main()
