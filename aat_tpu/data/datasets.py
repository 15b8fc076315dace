"""Precomputed-embedding datasets.

Capability parity with ``SegmentedHubertLibris``
(/root/reference/src/aat/datasets/hubert_libris.py:5-26): a dataset whose
items lazily load per-utterance precomputed segment embeddings from disk.
Stored as ``.npy`` (the reference uses ``torch.load`` pickles)."""

from __future__ import annotations

from typing import Sequence

import numpy as np


class SegmentedEmbeddingsDataset:
    """Items carry ``segments_embeddings_path``; loads arrays lazily."""

    def __init__(self, hf_dataset: Sequence):
        self.dataset = hf_dataset

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, idx: int) -> dict:
        item = dict(self.dataset[idx])
        path = item["segments_embeddings_path"]
        item["segments_embeddings"] = np.load(path)
        return item
