"""Dataloader builders.

Capability parity with /root/reference/src/aat/training/dataloaders.py:18-111:
build train/val batch iterators over (a) the HF ``nguyenvulebinh/asr-alignment``
'libris' dataset, (b) an arrow dataset on disk, or (c) any in-memory sequence
of items — shuffling, few-sample trimming, drop-last.

Torch-free: batches are numpy dicts produced by the collators; device
placement happens inside the trainer. (The reference's multi-worker
``DataLoader`` exists to hide the collator's Python hot loop; here the
collator is vectorized and the heavy segment work runs on-device, so a
simple prefetching iterator suffices. A C++ prefetcher can be slotted in
via aat_tpu.runtime.)
"""

from __future__ import annotations

import logging
import threading
import queue as queue_mod
from typing import Callable, Iterator, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def load_hf_dataset(path_or_name: str, split: Optional[str] = None):
    """Load a HF dataset by hub name or from disk (arrow). Requires the
    ``datasets`` package and, for hub names, network access."""
    import datasets

    if path_or_name.endswith(".dataset") or path_or_name.endswith("/"):
        return datasets.load_from_disk(path_or_name)
    ds = datasets.load_dataset(path_or_name, "libris")
    return ds[split] if split else ds


class BatchIterator:
    """Shuffling, batching, optional background-thread prefetch."""

    def __init__(
        self,
        items: Sequence,
        collate_fn: Callable,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 42,
        prefetch: int = 2,
        is_validation: bool = False,
        shard_index: int = 0,
        num_shards: int = 1,
        bucket_key: Optional[Callable] = None,
        bucket_pool_batches: int = 50,
    ):
        self.items = items
        self.collate_fn = collate_fn
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.is_validation = is_validation
        # length bucketing (fairseq/t5x recipe): shuffle globally, cut the
        # permutation into pools of ``bucket_pool_batches`` batches, sort
        # each pool by ``bucket_key`` (e.g. waveform length), form batches
        # inside the pool, then shuffle the batch ORDER. Batches then pad to
        # near-uniform lengths — on TPU that means less wasted compute on
        # padding and fewer distinct compiled shapes when shapes are
        # bucket-rounded — while keeping epoch-level randomness. The
        # reference pads every batch to its longest member with no length
        # grouping (collate.py pad_waveforms).
        self.bucket_key = bucket_key
        self.bucket_pool_batches = bucket_pool_batches
        self._bucket_lengths: Optional[np.ndarray] = None
        # multihost data parallelism: each process iterates a distinct,
        # equal-size interleaved shard of the same seeded permutation
        # (accelerate/DistributedSampler semantics — every host must yield
        # the same number of batches so collective steps stay in lockstep)
        self.shard_index = shard_index
        self.num_shards = num_shards
        self._epoch = 0
        self._accepts_is_validation = None

    def set_epoch(self, epoch: int):
        """Pin the shuffle epoch (DistributedSampler.set_epoch semantics).
        Required for cross-epoch resume: a resumed run skips completed
        epochs without iterating them, so the auto-increment in ``__iter__``
        alone would replay epoch 0's shuffle order."""
        self._epoch = int(epoch)

    def __len__(self):
        n = len(self.items) // self.num_shards if self.num_shards > 1 else len(self.items)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self) -> List[np.ndarray]:
        idx = np.arange(len(self.items))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        if self.num_shards > 1:
            # truncate to a multiple of num_shards so every shard is equal
            usable = (len(idx) // self.num_shards) * self.num_shards
            idx = idx[self.shard_index:usable:self.num_shards]
        if self.bucket_key is not None:
            if self._bucket_lengths is None:
                self._bucket_lengths = np.asarray(
                    [self.bucket_key(it) for it in self.items], np.float64)
            pool = max(self.bucket_pool_batches, 1) * self.batch_size
            sorted_pools = [
                idx[i:i + pool][np.argsort(
                    self._bucket_lengths[idx[i:i + pool]], kind="stable")]
                for i in range(0, len(idx), pool)
            ]
            idx = np.concatenate(sorted_pools) if sorted_pools else idx
        batches = []
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i : i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            batches.append(chunk)
        if self.bucket_key is not None and self.shuffle and len(batches) > 1:
            # restore stochastic batch order (sorting made it length-ordered);
            # same seed on every shard keeps multihost iteration in lockstep
            order = np.random.default_rng(
                self.seed * 7919 + self._epoch + 1).permutation(len(batches))
            batches = [batches[int(i)] for i in order]
        return batches

    def _collate(self, chunk) -> dict:
        import inspect

        items = [self.items[int(i)] for i in chunk]
        if self._accepts_is_validation is None:
            try:
                sig = inspect.signature(self.collate_fn)
                self._accepts_is_validation = "is_validation" in sig.parameters
            except (TypeError, ValueError):
                self._accepts_is_validation = False
        if self._accepts_is_validation:
            return self.collate_fn(items, is_validation=self.is_validation)
        return self.collate_fn(items)

    def __iter__(self) -> Iterator[dict]:
        batches = self._index_batches()
        self._epoch += 1
        if self.prefetch <= 0:
            for chunk in batches:
                yield self._collate(chunk)
            return

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            # collate errors must surface in the consumer — a swallowed
            # exception here would silently truncate the epoch
            try:
                for chunk in batches:
                    q.put(self._collate(chunk))
                q.put(sentinel)
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                q.put(exc)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is sentinel:
                break
            if isinstance(batch, BaseException):
                raise batch
            yield batch


def build_dataloaders(
    train_items: Sequence,
    val_items: Sequence,
    collate_fn: Callable,
    val_collate_fn: Optional[Callable] = None,
    batch_size: int = 40,
    val_batch_size: Optional[int] = None,
    few_train_samples: Optional[int] = None,
    few_val_samples: Optional[int] = None,
    seed: int = 42,
    shard_index: Optional[int] = None,
    num_shards: Optional[int] = None,
    bucket_by_duration: bool = False,
    bucket_pool_batches: int = 50,
):
    """Train/val iterator pair (reference build_dataloaders,
    dataloaders.py:93-111).

    ``shard_index``/``num_shards`` default to the jax process topology when
    running multihost (each host feeds its own interleaved dataset shard;
    the trainer assembles the global batch from per-process shards)."""
    if shard_index is None or num_shards is None:
        try:
            import jax

            shard_index = jax.process_index() if shard_index is None else shard_index
            num_shards = jax.process_count() if num_shards is None else num_shards
        except Exception:
            shard_index, num_shards = 0, 1
    if few_train_samples is not None:
        train_items = train_items[:few_train_samples]
    if few_val_samples is not None:
        val_items = val_items[:few_val_samples]
    bucket_key = None
    if bucket_by_duration:
        def bucket_key(item):  # noqa: F811 — raw length proxies duration
            return len(item["audio"]["array"])

    train = BatchIterator(
        train_items, collate_fn, batch_size, shuffle=True, drop_last=True, seed=seed,
        shard_index=shard_index, num_shards=num_shards,
        bucket_key=bucket_key, bucket_pool_batches=bucket_pool_batches,
    )
    val = BatchIterator(
        val_items,
        val_collate_fn or collate_fn,
        val_batch_size or batch_size,
        shuffle=False,
        drop_last=False,
        is_validation=True,
        shard_index=shard_index,
        num_shards=num_shards,
    )
    return train, val
