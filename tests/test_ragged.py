"""Ragged segment ops: gather materialization vs oracle, DMA Pallas kernel
parity, masked pooling."""

import numpy as np

import jax.numpy as jnp

from aat_tpu.ops.ragged import masked_mean, materialize_segments


def make_case(rng, b=2, s=8, l=4000, max_frames=512):
    waveforms = rng.normal(0, 1, (b, l)).astype(np.float32)
    starts = np.sort(rng.integers(0, l - 600, (b, s)), axis=1)
    lens = rng.integers(100, 500, (b, s))
    ends = np.minimum(starts + lens, l)
    out_lens = np.maximum(ends - starts, 128)  # some padded tails
    mask = np.ones((b, s), bool)
    mask[0, -2:] = False
    return waveforms, starts, ends, out_lens, mask, max_frames


def oracle(waveforms, starts, ends, out_lens, mask, max_frames):
    b, s = starts.shape
    segs = np.zeros((b, s, max_frames), np.float32)
    msk = np.zeros((b, s, max_frames), bool)
    for i in range(b):
        for j in range(s):
            if not mask[i, j]:
                continue
            n = ends[i, j] - starts[i, j]
            segs[i, j, :n] = waveforms[i, starts[i, j] : ends[i, j]]
            msk[i, j, : out_lens[i, j]] = True
    return segs, msk


def test_materialize_matches_oracle(rng):
    case = make_case(rng)
    segs, msk = materialize_segments(*[jnp.asarray(x) for x in case[:-1]], case[-1])
    ref_segs, ref_msk = oracle(*case)
    np.testing.assert_array_equal(np.asarray(segs), ref_segs)
    np.testing.assert_array_equal(np.asarray(msk), ref_msk)


def test_gather_slices_arbitrary_starts(rng):
    """Unaligned starts, including windows that extend past the row end —
    the batched dynamic-slice must not shift the valid prefix."""
    from aat_tpu.ops.ragged import gather_slices

    b, l, s, length = 3, 1000, 6, 256
    x = rng.normal(0, 1, (b, l)).astype(np.float32)
    starts = rng.integers(0, l - 1, (b, s)).astype(np.int32)
    starts[0, 0] = l - 17   # window extends 239 past the end
    starts[1, 0] = 0
    out = np.asarray(gather_slices(jnp.asarray(x), jnp.asarray(starts), length))
    for i in range(b):
        for j in range(s):
            st = starts[i, j]
            n = min(length, l - st)
            np.testing.assert_array_equal(out[i, j, :n], x[i, st : st + n])
            np.testing.assert_array_equal(out[i, j, n:], 0.0)


def test_materialize_unaligned_final_span_start(rng):
    """The adaptive min-shift rule emits start = length - min_frames with
    arbitrary alignment; materialization at start_granularity=1 must fetch
    the exact samples (regression: the block path floor-rounded starts)."""
    b, l, max_frames = 2, 4037, 512  # l deliberately not a multiple of 40
    waveforms = rng.normal(0, 1, (b, l)).astype(np.float32)
    min_f = 300
    starts = np.array([[160, l - min_f], [320, l - min_f]], np.int32)
    ends = np.array([[660, l], [820, l]], np.int32)
    out_lens = ends - starts
    mask = np.ones((b, 2), bool)
    segs, msk = materialize_segments(
        jnp.asarray(waveforms), jnp.asarray(starts), jnp.asarray(ends),
        jnp.asarray(out_lens), jnp.asarray(mask), max_frames,
        start_granularity=1,
    )
    ref_segs, ref_msk = oracle(waveforms, starts, ends, out_lens, mask, max_frames)
    np.testing.assert_array_equal(np.asarray(segs), ref_segs)
    np.testing.assert_array_equal(np.asarray(msk), ref_msk)


def test_masked_mean():
    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 4, 3))
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]])
    out = np.asarray(masked_mean(x, mask))
    np.testing.assert_allclose(out[0], x[0, :2].mean(0))
    np.testing.assert_allclose(out[1], x[1].mean(0))


def test_tokenize_dense_chunked_matches_flat(rng):
    """The batch-chunked lax.map pipeline (VMEM-residency fix, round 5) is
    bit-identical to the flat single-call pipeline."""
    from aat_tpu.ops.segmentation import TokenizerConfig
    from aat_tpu.tokenizer import tokenize_dense
    from tests.conftest import make_speechlike_waveform

    from aat_tpu.ops import mel as mel_ops

    b = 6
    config = TokenizerConfig(max_segments=32, max_minima=64)
    waveforms = np.stack([
        mel_ops.normalize_waveform(
            make_speechlike_waveform(np.random.default_rng(i), 2.0)
        )
        for i in range(b)
    ]).astype(np.float32)
    lengths = np.full((b,), waveforms.shape[1], np.int32)
    # batch_chunk=2 -> 3 chunks; batch_chunk=b -> flat reference
    t_c, seg_c, fm_c = tokenize_dense(waveforms, lengths, config, batch_chunk=2)
    t_f, seg_f, fm_f = tokenize_dense(waveforms, lengths, config, batch_chunk=b)
    np.testing.assert_array_equal(np.asarray(seg_c), np.asarray(seg_f))
    np.testing.assert_array_equal(np.asarray(fm_c), np.asarray(fm_f))
    for key in ("starts", "ends", "out_lens", "segment_mask", "num_segments"):
        np.testing.assert_array_equal(np.asarray(t_c[key]), np.asarray(t_f[key]))


def test_windowed_gather_chunked_matches_flat(rng):
    """windowed_gather's internal batch chunking (source VMEM residency)
    returns exactly the flat gather's values at odd/even batch sizes."""
    from aat_tpu.ops.ragged import _windowed_gather_flat, windowed_gather

    l, s, length, block = 4000, 8, 400, 40
    for b in (2, 3, 5, 8):
        x = jnp.asarray(rng.normal(0, 1, (b, l)).astype(np.float32))
        starts = jnp.asarray(
            (rng.integers(0, (l - length) // block, (b, s)) * block).astype(np.int32)
        )
        got = windowed_gather(x, starts, length, block)
        want = _windowed_gather_flat(x, starts, length, block)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
