"""Data utilities: batch iterators, precomputed-embedding dataset, JSONL
tracker, timing helpers."""

import json

import numpy as np

from aat_tpu.data.dataloaders import BatchIterator, build_dataloaders
from aat_tpu.data.datasets import SegmentedEmbeddingsDataset
from aat_tpu.utils.tracking import JsonlTracker


def collate_ids(items, is_validation=False):
    return {"ids": np.asarray(items), "val": is_validation}


def test_batch_iterator_shuffles_and_drops_last():
    it = BatchIterator(list(range(10)), collate_ids, batch_size=3,
                       shuffle=True, drop_last=True, seed=0, prefetch=0)
    batches = list(it)
    assert len(batches) == 3  # 10 // 3, last dropped
    seen = sorted(int(x) for b in batches for x in b["ids"])
    assert len(seen) == 9
    # next epoch reshuffles
    batches2 = list(it)
    assert any(
        not np.array_equal(a["ids"], b["ids"]) for a, b in zip(batches, batches2)
    )


def test_batch_iterator_prefetch_thread():
    it = BatchIterator(list(range(8)), collate_ids, batch_size=2,
                       shuffle=False, drop_last=False, prefetch=2)
    batches = list(it)
    assert len(batches) == 4
    np.testing.assert_array_equal(batches[0]["ids"], [0, 1])


def test_batch_iterator_prefetch_propagates_errors():
    """A collate error in the prefetch worker must surface in the consumer,
    not silently truncate the epoch."""
    import pytest

    def bad_collate(items):
        if 4 in items:
            raise ValueError("poisoned item")
        return {"ids": np.asarray(items)}

    it = BatchIterator(list(range(8)), bad_collate, batch_size=2,
                       shuffle=False, drop_last=False, prefetch=2)
    with pytest.raises(ValueError, match="poisoned item"):
        list(it)


def test_build_dataloaders_few_samples():
    train, val = build_dataloaders(
        list(range(100)), list(range(50)), collate_ids,
        batch_size=10, few_train_samples=30, few_val_samples=5,
    )
    assert len(train) == 3
    val_batches = list(val)
    assert sum(len(b["ids"]) for b in val_batches) == 5
    assert all(b["val"] for b in val_batches)  # is_validation=True


def test_segmented_embeddings_dataset(tmp_path):
    emb = np.random.default_rng(0).normal(0, 1, (3, 8)).astype(np.float32)
    path = tmp_path / "item0.npy"
    np.save(path, emb)
    ds = SegmentedEmbeddingsDataset([
        {"id": "a", "segments_embeddings_path": str(path)}
    ])
    assert len(ds) == 1
    item = ds[0]
    np.testing.assert_array_equal(item["segments_embeddings"], emb)


def test_jsonl_tracker(tmp_path, monkeypatch):
    monkeypatch.setenv("WANDB_MODE", "disabled")
    path = tmp_path / "m.jsonl"
    tracker = JsonlTracker(str(path), config={"lr": 0.1})
    tracker.log({"train/loss": 1.5})
    tracker.log({"train/loss": 1.0, "wer": 0.4})
    tracker.finish()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["_config"]["lr"] == 0.1
    assert lines[1]["train/loss"] == 1.5
    assert lines[2]["_step"] == 2 and lines[2]["wer"] == 0.4


def test_batch_iterator_process_sharding():
    """Multihost semantics: shards partition one seeded permutation into
    equal, disjoint, deterministic per-process streams (every host yields
    the same number of batches so collective steps stay in lockstep)."""
    from aat_tpu.data.dataloaders import BatchIterator

    items = list(range(103))
    collate = lambda batch: {"ids": np.asarray(batch)}  # noqa: E731
    shards = [
        BatchIterator(items, collate, batch_size=5, shuffle=True, seed=7,
                      prefetch=0, shard_index=i, num_shards=4)
        for i in range(4)
    ]
    outs = [[b["ids"] for b in it] for it in shards]
    lens = {len(o) for o in outs}
    assert lens == {len(shards[0])}  # equal batch counts across shards
    seen = [set(np.concatenate(o).tolist()) for o in outs]
    for i in range(4):
        for j in range(i + 1, 4):
            assert not (seen[i] & seen[j])  # disjoint
    union = set().union(*seen)
    assert union <= set(items)
    # equal shard sizes: 103 -> 100 usable -> 25 each -> 5 batches of 5
    assert all(len(s) == 25 for s in seen)
    # determinism per epoch counter
    again = BatchIterator(items, collate, batch_size=5, shuffle=True, seed=7,
                          prefetch=0, shard_index=2, num_shards=4)
    np.testing.assert_array_equal(
        np.concatenate([b["ids"] for b in again]), np.concatenate(outs[2]))


def test_batch_iterator_length_bucketing():
    """Pooled length bucketing: batches group similar lengths (padding waste
    drops), every item still appears exactly once per epoch, batch order is
    shuffled, and epochs are deterministic under set_epoch."""
    rng = np.random.default_rng(0)
    lengths = rng.integers(100, 10_000, size=64)
    items = [{"len": int(n)} for n in lengths]

    def collate(batch, is_validation=False):
        return {"lens": np.asarray([b["len"] for b in batch])}

    def key(item):
        return item["len"]

    def padding_waste(batches):
        padded = sum(b["lens"].max() * len(b["lens"]) for b in batches)
        real = sum(b["lens"].sum() for b in batches)
        return (padded - real) / padded

    plain = BatchIterator(items, collate, batch_size=8, shuffle=True,
                          drop_last=True, seed=1, prefetch=0)
    bucketed = BatchIterator(items, collate, batch_size=8, shuffle=True,
                             drop_last=True, seed=1, prefetch=0,
                             bucket_key=key, bucket_pool_batches=4)
    pb = list(plain)
    bb = list(bucketed)
    # same coverage: every item exactly once
    assert sorted(x for b in bb for x in b["lens"]) == sorted(lengths.tolist())
    assert padding_waste(bb) < padding_waste(pb) * 0.5
    # deterministic replay of the same epoch
    bucketed2 = BatchIterator(items, collate, batch_size=8, shuffle=True,
                              drop_last=True, seed=1, prefetch=0,
                              bucket_key=key, bucket_pool_batches=4)
    for a, b in zip(bb, list(bucketed2)):
        np.testing.assert_array_equal(a["lens"], b["lens"])
    # batch order is not globally length-sorted (the order shuffle ran)
    maxes = [b["lens"].max() for b in bb]
    assert maxes != sorted(maxes)


def test_batch_iterator_bucketing_shards_lockstep():
    """Multihost: bucketing must keep every shard's batch count equal and
    coverage disjoint/complete (DistributedSampler semantics)."""
    items = [{"len": int(n)} for n in
             np.random.default_rng(2).integers(100, 5000, size=48)]

    def collate(batch, is_validation=False):
        return {"lens": np.asarray([b["len"] for b in batch])}

    shards = [
        list(BatchIterator(items, collate, batch_size=4, shuffle=True,
                           drop_last=True, seed=3, prefetch=0,
                           bucket_key=lambda it: it["len"],
                           bucket_pool_batches=3,
                           shard_index=i, num_shards=2))
        for i in range(2)
    ]
    assert len(shards[0]) == len(shards[1]) == 6  # 48/2 items / 4 per batch
    all_lens = sorted(
        int(x) for sh in shards for b in sh for x in b["lens"])
    assert all_lens == sorted(it["len"] for it in items)
