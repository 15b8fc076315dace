"""Pallas/XLA kernels: mel frontend, boundary detection, ragged segment ops,
flash attention, nearest-codebook quantization."""
