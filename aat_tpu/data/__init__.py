"""Data layer: collators, dataloader builders, precomputed-embedding
datasets."""
