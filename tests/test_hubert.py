"""HuBERT/wav2vec2 encoder parity vs torch (hermetic: tiny random configs,
no downloads). Oracle: transformers HubertModel in eval mode — the exact
module the reference uses as its audio encoder
(scripts/trainer_train.py:195-215)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

# This host's oneDNN build runs conv/matmul in bf16 fastmath (~8e-3 error),
# which would corrupt the oracle; force full-precision torch kernels.
torch.backends.mkldnn.enabled = False

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aat_tpu.models import hubert as hub  # noqa: E402
from aat_tpu.ops.ragged import masked_mean  # noqa: E402
from aat_tpu.utils.port import port_hubert  # noqa: E402


def build_torch_hubert(stable=True, norm="layer"):
    cfg = transformers.HubertConfig(
        vocab_size=32,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16, 16),
        conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3),
        conv_bias=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=stable,
        feat_extract_norm=norm,
        mask_time_prob=0.0,
        layerdrop=0.0,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        activation_dropout=0.0,
    )
    torch.manual_seed(0)
    model = transformers.HubertModel(cfg)
    model.eval()
    return model


@pytest.mark.parametrize("stable,norm", [(True, "layer"), (False, "group")])
def test_hubert_forward_parity(stable, norm):
    tm = build_torch_hubert(stable=stable, norm=norm)
    params, config = port_hubert(tm)
    assert config.do_stable_layer_norm == stable

    rng = np.random.default_rng(0)
    wav = rng.normal(0, 0.5, (2, 2000)).astype(np.float32)
    mask = np.ones((2, 2000), dtype=np.int64)
    mask[1, 1200:] = 0

    with torch.no_grad():
        ref = tm(
            input_values=torch.from_numpy(wav),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    ours, frame_mask = hub.hubert_encode(params, config, jnp.asarray(wav), jnp.asarray(mask))
    ours = np.asarray(ours)
    assert ours.shape == ref.shape

    fm = np.asarray(frame_mask)
    # compare only valid frames (padding rows differ where torch zeroes inputs)
    diff = np.abs(ours - ref)[fm]
    assert diff.max() < 2e-4, f"max diff {diff.max()}"


def test_wav2vec2_forward_parity():
    """The wav2vec2 family shares the inference graph; port + parity against
    torch Wav2Vec2Model (reference build_audio_encoder alt path,
    scripts/trainer_train.py:208-215)."""
    cfg = transformers.Wav2Vec2Config(
        vocab_size=32,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16, 16),
        conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3),
        conv_bias=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        mask_time_prob=0.0,
        layerdrop=0.0,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        activation_dropout=0.0,
    )
    torch.manual_seed(1)
    tm = transformers.Wav2Vec2Model(cfg).eval()
    params, config = port_hubert(tm)

    rng = np.random.default_rng(4)
    wav = rng.normal(0, 0.5, (2, 1600)).astype(np.float32)
    mask = np.ones((2, 1600), dtype=np.int64)
    mask[1, 1000:] = 0
    with torch.no_grad():
        ref = tm(
            input_values=torch.from_numpy(wav),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    ours, fm = hub.hubert_encode(params, config, jnp.asarray(wav), jnp.asarray(mask))
    diff = np.abs(np.asarray(ours) - ref)[np.asarray(fm)]
    assert diff.max() < 2e-4, f"max diff {diff.max()}"


def test_feature_lengths_match_torch():
    tm = build_torch_hubert()
    _, config = port_hubert(tm)
    lengths = np.array([2000, 1200, 37, 1999])
    ref = tm._get_feat_extract_output_lengths(torch.tensor(lengths)).numpy()
    ours = np.asarray(hub.feature_lengths(config, jnp.asarray(lengths)))
    np.testing.assert_array_equal(ours, ref)


def test_feature_vector_attention_mask_matches_torch():
    tm = build_torch_hubert()
    params, config = port_hubert(tm)
    mask = np.ones((3, 2000), dtype=np.int64)
    mask[1, 777:] = 0
    mask[2, 100:] = 0
    t = int(hub.feature_lengths(config, jnp.asarray([2000]))[0])
    ref = tm._get_feature_vector_attention_mask(t, torch.from_numpy(mask)).numpy()
    ours = np.asarray(
        hub.feature_vector_attention_mask(config, t, jnp.asarray(mask))
    ).astype(ref.dtype)
    np.testing.assert_array_equal(ours, ref)


def test_segment_mean_embedding_parity():
    """BASELINE config 2 analogue: mean-pooled segment embeddings must match
    the torch mean over valid frames (<1e-3 MSE north star; we hold <1e-6
    at tiny scale)."""
    tm = build_torch_hubert()
    params, config = port_hubert(tm)
    rng = np.random.default_rng(1)
    wav = rng.normal(0, 0.5, (3, 1600)).astype(np.float32)
    mask = np.ones((3, 1600), dtype=np.int64)
    mask[2, 800:] = 0

    with torch.no_grad():
        ref_frames = tm(
            input_values=torch.from_numpy(wav), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()
    t = ref_frames.shape[1]
    ref_fm = tm._get_feature_vector_attention_mask(t, torch.from_numpy(mask)).numpy()
    ref_mean = (ref_frames * ref_fm[..., None]).sum(1) / ref_fm.sum(1, keepdims=True)

    ours, fm = hub.hubert_encode(params, config, jnp.asarray(wav), jnp.asarray(mask))
    ours_mean = np.asarray(masked_mean(ours, fm))
    mse = np.mean((ours_mean - ref_mean) ** 2)
    assert mse < 1e-6, f"segment-mean MSE {mse}"


def test_chunked_feature_extractor_matches_unchunked():
    """Small-batch long waveforms run the conv stack CHUNKED (overlapping
    receptive-field windows, [B*K, L', C] rows for full sublane tiling) —
    VALID convolutions compose, so the result must be bit-identical to the
    unchunked stack, and gradients must flow identically."""
    import dataclasses

    # hubert-large conv geometry (the whole-utterance path), tiny widths
    cfg = dataclasses.replace(
        hub.tiny_test_config(),
        conv_dim=(16,) * 7,
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
    )
    params = hub.init_hubert_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    for b, sec in ((2, 3.0), (1, 2.17)):  # 2.17 s: frames_total % k != 0
        wav = jnp.asarray(rng.normal(0, 0.3, (b, int(sec * 16000))),
                          jnp.float32)
        chunked = hub.feature_extractor(params, cfg, wav)
        unchunked = hub._conv_stack(params, cfg, wav[..., None])
        assert chunked.shape == unchunked.shape
        np.testing.assert_array_equal(np.asarray(chunked),
                                      np.asarray(unchunked))

        g_c = jax.grad(lambda p: jnp.sum(
            hub.feature_extractor(p, cfg, wav) ** 2))(params)
        g_u = jax.grad(lambda p: jnp.sum(
            hub._conv_stack(p, cfg, wav[..., None]) ** 2))(params)
        # weight grads reduce over chunk rows in a different order than
        # over one long row — f32 reassociation only (measured rel ~3e-5)
        for a, c in zip(jax.tree.leaves(g_c), jax.tree.leaves(g_u)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-4, atol=1e-4)
    # large-batch segment rows keep the unchunked path (shape unchanged)
    wav = jnp.asarray(rng.normal(0, 0.3, (16, 4000)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(hub.feature_extractor(params, cfg, wav)),
        np.asarray(hub._conv_stack(params, cfg, wav[..., None])))


def test_encoder_prepad_matches_xla():
    """T=500 engages the one-shot encoder pre-pad to the flash block
    multiple (padded_seq_len(500)=512 ≤ 1.1·500): masked pad rows must not
    perturb real-row outputs vs the unpadded XLA encoder, with ragged
    per-row lengths exercising the mask path."""
    import dataclasses

    from aat_tpu.ops.attention import padded_seq_len

    assert padded_seq_len(100) == 100          # below the Pallas gate
    assert padded_seq_len(500) == 512          # block multiple
    assert padded_seq_len(512) == 512          # already aligned

    cfg = hub.tiny_test_config()
    params = hub.init_hubert_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(11)
    t = 500
    hidden = jnp.asarray(rng.normal(0, 0.5, (2, t, cfg.hidden_size)),
                         jnp.float32)
    fm = np.ones((2, t), np.int32)
    fm[1, 430:] = 0  # ragged: row 1 has real pad BEFORE the block pad
    fm = jnp.asarray(fm)

    cfg_p = dataclasses.replace(cfg, attention_impl="pallas")
    out_p = hub.encoder(params, cfg_p, hidden, fm, None)
    out_x = hub.encoder(params, cfg, hidden, fm, None)
    assert out_p.shape == out_x.shape == hidden.shape
    valid = np.asarray(fm).astype(bool)
    diff = np.abs(np.asarray(out_p) - np.asarray(out_x))[valid]
    assert diff.max() < 2e-4, diff.max()


def test_chunked_pos_conv_matches_unchunked():
    """The positional conv chunks along time the same way (stride-1, k−1
    halo per chunk) — output and gradients must match the plain padded conv
    bit-for-bit / to f32-reassociation tolerance."""
    import dataclasses

    def plain(params, cfg, hidden):
        k = cfg.num_conv_pos_embeddings
        pad = k // 2
        out = hub._conv1d(
            jnp.pad(hidden, ((0, 0), (pad, pad), (0, 0))),
            params["pos_conv"]["kernel"], params["pos_conv"]["bias"],
            groups=cfg.num_conv_pos_embedding_groups,
        )
        if k % 2 == 0:
            out = out[:, :-1, :]
        return jax.nn.gelu(out, approximate=False)

    rng = np.random.default_rng(3)
    for k, b, t in ((16, 2, 150), (15, 2, 97), (16, 1, 200), (16, 2, 31)):
        cfg = dataclasses.replace(hub.tiny_test_config(),
                                  num_conv_pos_embeddings=k)
        params = hub.init_hubert_params(jax.random.PRNGKey(k), cfg)
        hidden = jnp.asarray(
            rng.normal(0, 0.5, (b, t, cfg.hidden_size)), jnp.float32)
        got = hub._pos_conv_embedding(params, cfg, hidden)
        want = plain(params, cfg, hidden)
        assert got.shape == want.shape == hidden.shape
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

        g_c = jax.grad(lambda p: jnp.sum(
            hub._pos_conv_embedding(p, cfg, hidden) ** 2))(params)["pos_conv"]
        g_u = jax.grad(lambda p: jnp.sum(
            plain(p, cfg, hidden) ** 2))(params)["pos_conv"]
        for a, c in zip(jax.tree.leaves(g_c), jax.tree.leaves(g_u)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-4, atol=1e-4)
    # batch ≥ 8 rows keeps the single-conv path (still identical by def)
    cfg = hub.tiny_test_config()
    params = hub.init_hubert_params(jax.random.PRNGKey(0), cfg)
    hidden = jnp.asarray(rng.normal(0, 0.5, (8, 40, cfg.hidden_size)),
                         jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(hub._pos_conv_embedding(params, cfg, hidden)),
        np.asarray(plain(params, cfg, hidden)))


def test_conv1d_s2d_matches_conv1d():
    """The space-to-depth GEMM formulation of stride-2 convs (production
    conv-stack layers 2-7) must match lax.conv — values and weight/input
    grads (f32 reassociation tolerance only)."""
    rng = np.random.default_rng(0)
    for k in (2, 3):
        for t in (64, 65, 129):
            x = jnp.asarray(rng.normal(0, 1, (3, t, 128)), jnp.float32)
            w = jnp.asarray(rng.normal(0, 0.1, (k, 128, 128)), jnp.float32)
            bias = jnp.asarray(rng.normal(0, 0.1, (128,)), jnp.float32)
            ref = hub._conv1d(x, w, bias, stride=2)
            got = hub._conv1d_s2d(x, w, bias, stride=2)
            assert got.shape == ref.shape, (k, t)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)

            def loss(fn):
                return lambda xx, ww: jnp.sum(fn(xx, ww, bias, stride=2) ** 2)

            gx_r, gw_r = jax.grad(loss(hub._conv1d), argnums=(0, 1))(x, w)
            gx_s, gw_s = jax.grad(loss(hub._conv1d_s2d), argnums=(0, 1))(x, w)
            np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_r),
                                       rtol=1e-4, atol=1e-4)
