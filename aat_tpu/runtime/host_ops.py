"""Numpy-facing wrappers over the native host kernels, with fallbacks.

Used by the collator (dense segment assembly, waveform normalization), the
host-exact tokenizer path (smoothed amplitude + minima), and WER.
"""

from __future__ import annotations

import ctypes
from typing import List, Tuple

import numpy as np

from aat_tpu.runtime import load_library


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def assemble_segments(
    waveform: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    out_lens: np.ndarray,
    max_frames: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """→ (segments [S, F] f32, mask [S, F] f32)."""
    lib = load_library()
    s = len(starts)
    waveform = np.ascontiguousarray(waveform, np.float32)
    starts = np.ascontiguousarray(starts, np.int64)
    ends = np.ascontiguousarray(ends, np.int64)
    out_lens = np.ascontiguousarray(out_lens, np.int64)
    if lib is not None:
        segments = np.empty((s, max_frames), np.float32)
        mask = np.empty((s, max_frames), np.float32)
        lib.assemble_segments(
            _f32p(waveform), waveform.shape[-1],
            _i64p(starts), _i64p(ends), _i64p(out_lens),
            s, max_frames, _f32p(segments), _f32p(mask),
        )
        return segments, mask
    # numpy fallback
    f = np.arange(max_frames)
    idx = np.clip(starts[:, None] + f[None, :], 0, waveform.shape[-1] - 1)
    in_data = f[None, :] < (ends - starts)[:, None]
    segments = np.where(in_data, waveform[idx], 0.0).astype(np.float32)
    mask = (f[None, :] < out_lens[:, None]).astype(np.float32)
    return segments, mask


def normalize_pad(waveforms: List[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row zero-mean/unit-var + right padding (HF processor semantics)."""
    lib = load_library()
    n = len(waveforms)
    max_len = max(w.shape[-1] for w in waveforms)
    rows = [np.ascontiguousarray(w, np.float64) for w in waveforms]
    if lib is not None:
        out = np.empty((n, max_len), np.float32)
        mask = np.empty((n, max_len), np.int64)
        ptrs = (ctypes.POINTER(ctypes.c_double) * n)(
            *[r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) for r in rows]
        )
        lengths = np.array([r.shape[-1] for r in rows], np.int64)
        lib.normalize_pad(ptrs, _i64p(lengths), n, max_len, _f32p(out), _i64p(mask))
        return out, mask
    from aat_tpu.data.collate import zero_mean_unit_var_pad

    return zero_mean_unit_var_pad(rows)


def smoothed_amplitude(amplitude_f32: np.ndarray, n_points: int) -> np.ndarray:
    """Sequential-f32-cumsum running mean (bit-faithful to numpy)."""
    lib = load_library()
    amplitude_f32 = np.ascontiguousarray(amplitude_f32, np.float32)
    t = amplitude_f32.shape[-1]
    out_len = max(t - n_points, 0)
    if lib is not None and out_len > 0:
        out = np.empty((out_len,), np.float32)
        lib.smoothed_amplitude(_f32p(amplitude_f32), t, n_points, _f32p(out))
        return out
    c = np.cumsum(amplitude_f32)
    return (c[n_points:] - c[:-n_points]) / float(n_points)


def find_minima(
    smoothed: np.ndarray, eps: float = 1e-5, threshold: float = 15.0
) -> np.ndarray:
    lib = load_library()
    smoothed = np.ascontiguousarray(smoothed, np.float32)
    t = smoothed.shape[-1]
    if lib is not None:
        out = np.empty((max(t, 1),), np.int64)
        n = lib.find_minima(
            _f32p(smoothed), t, ctypes.c_float(eps), ctypes.c_float(threshold),
            _i64p(out), out.shape[0],
        )
        return out[:n].copy()
    x = smoothed
    if t < 3:
        return np.zeros((0,), np.int64)
    interior = (x[1:-1] > x[2:] + np.float32(eps)) & (x[1:-1] > x[:-2] + np.float32(eps))
    idx = np.nonzero(interior)[0] + 1
    return idx[x[idx] > threshold]


def edit_distance(a: np.ndarray, b: np.ndarray) -> int:
    lib = load_library()
    a = np.ascontiguousarray(a, np.int64)
    b = np.ascontiguousarray(b, np.int64)
    if lib is not None:
        return int(lib.edit_distance(_i64p(a), len(a), _i64p(b), len(b)))
    # numpy fallback: delegate to the python implementation in metrics
    from aat_tpu.training.metrics import _edit_distance

    return _edit_distance(list(a), list(b))
