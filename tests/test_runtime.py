"""Native host runtime: C++ kernels must match the numpy fallbacks /
reference semantics bit-for-bit where bitwise parity matters."""

import numpy as np
import pytest

from aat_tpu.runtime import load_library
from aat_tpu.runtime import host_ops

pytestmark = pytest.mark.skipif(
    load_library() is None, reason="native toolchain unavailable"
)


def test_assemble_segments_matches_numpy(rng):
    waveform = rng.normal(0, 1, 5000).astype(np.float32)
    starts = np.array([0, 1200, 2000, 4900], np.int64)
    ends = np.array([1200, 2000, 4500, 5000], np.int64)
    out_lens = np.array([1200, 800, 2500, 2000], np.int64)  # tail padded
    segs, mask = host_ops.assemble_segments(waveform, starts, ends, out_lens, 2600)

    f = np.arange(2600)
    idx = np.clip(starts[:, None] + f[None, :], 0, 4999)
    in_data = f[None, :] < (ends - starts)[:, None]
    ref_segs = np.where(in_data, waveform[idx], 0.0)
    ref_mask = (f[None, :] < out_lens[:, None]).astype(np.float32)
    np.testing.assert_array_equal(segs, ref_segs.astype(np.float32))
    np.testing.assert_array_equal(mask, ref_mask)


def test_normalize_pad_matches_python(rng):
    waveforms = [rng.normal(3, 2, 1000), rng.normal(-1, 0.1, 700)]
    out, mask = host_ops.normalize_pad(waveforms)
    from aat_tpu.data.collate import zero_mean_unit_var_pad

    ref_out, ref_mask = zero_mean_unit_var_pad(waveforms)
    np.testing.assert_allclose(out, ref_out, atol=1e-6)
    np.testing.assert_array_equal(mask, ref_mask)


def test_smoothed_amplitude_bitwise_matches_numpy(rng):
    # the epsilon comparator can observe cumsum rounding: must be bitwise
    amp = (rng.normal(30, 20, 6000)).astype(np.float32)
    ours = host_ops.smoothed_amplitude(amp, 12)
    c = np.cumsum(amp)
    ref = (c[12:] - c[:-12]) / 12.0
    np.testing.assert_array_equal(ours, ref)


def test_find_minima_matches_scipy(rng):
    from scipy.signal import argrelextrema

    x = (np.sin(np.linspace(0, 60, 4000)) * 30 + rng.normal(0, 5, 4000)).astype(np.float32)
    ours = host_ops.find_minima(x, eps=1e-5, threshold=15.0)

    def greater_eps(a, b):
        return a > b + 1e-5

    ref = argrelextrema(x, greater_eps)[0]
    ref = ref[x[ref] > 15.0]
    np.testing.assert_array_equal(ours, ref)


def test_edit_distance_matches_python():
    from aat_tpu.training.metrics import _edit_distance

    rng = np.random.default_rng(0)
    for _ in range(20):
        a = rng.integers(0, 10, rng.integers(0, 30)).astype(np.int64)
        b = rng.integers(0, 10, rng.integers(1, 30)).astype(np.int64)
        assert host_ops.edit_distance(a, b) == _edit_distance(list(a), list(b))
