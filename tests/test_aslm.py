"""ASLM model tests: pooling parity vs a torch oracle built to the reference
architecture (modeling_aslm.py:12-60), projection semantics, input assembly
contract, and gradient flow through masks (reference
modeling_aslm_test.py:55-75 contract)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

torch.backends.mkldnn.enabled = False

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aat_tpu.models import aslm as aslm_mod  # noqa: E402
from aat_tpu.models import hubert as hub  # noqa: E402
from aat_tpu.models import llama as llm  # noqa: E402
from aat_tpu.models.aslm import AslmConfig, AslmModel, PoolingConfig  # noqa: E402
from aat_tpu.utils.port import port_pooling_encoder  # noqa: E402

E_DIM, H_DIM, OUT_DIM, N_HEAD, N_LAYERS, MAX_POS = 16, 32, 24, 4, 2, 10


class TorchPoolingOracle(torch.nn.Module):
    """The reference AudioEmbeddingsEncoderPooling architecture, rebuilt from
    its documented structure (l_in → +pos → pre-LN nn.TransformerEncoder with
    key-padding mask → l_out on CLS)."""

    def __init__(self):
        super().__init__()
        self.l_in = torch.nn.Linear(E_DIM, H_DIM)
        self.l_out = torch.nn.Linear(H_DIM, OUT_DIM)
        self.positional_embeddings = torch.nn.Embedding(MAX_POS, H_DIM)
        layer = torch.nn.TransformerEncoderLayer(
            d_model=H_DIM, nhead=N_HEAD, batch_first=True, norm_first=True
        )
        self.transformer_encoder = torch.nn.TransformerEncoder(layer, N_LAYERS)

    def forward(self, inputs_embeds, encoder_attention_mask):
        h = self.l_in(inputs_embeds)
        h = h + self.positional_embeddings.weight[: h.shape[1], :]
        h = self.transformer_encoder(
            src=h,
            src_key_padding_mask=(~encoder_attention_mask.bool()),
            is_causal=False,
        )
        return self.l_out(h[:, 0:1, :])


def test_pooling_forward_parity():
    torch.manual_seed(0)
    oracle = TorchPoolingOracle().eval()
    params = port_pooling_encoder(oracle)
    cfg = PoolingConfig(
        hidden_dim=H_DIM, num_heads=N_HEAD, num_layers=N_LAYERS,
        ffn_dim=2048, max_positions=MAX_POS,
    )
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1.0, (3, 8, E_DIM)).astype(np.float32)
    mask = np.ones((3, 8), dtype=np.int64)
    mask[1, 5:] = 0
    mask[2, 2:] = 0

    with torch.no_grad():
        ref = oracle(torch.from_numpy(x), torch.from_numpy(mask)).numpy()
    ours = np.asarray(
        aslm_mod.pooling_forward(params, cfg, jnp.asarray(x), jnp.asarray(mask))
    )
    assert ours.shape == ref.shape == (3, 1, OUT_DIM)
    assert np.abs(ours - ref).max() < 2e-4


def tiny_aslm():
    config = AslmConfig(
        projection_type="linear",
        audio_encoder_embeddings_seq_len=2,
        audio_encoder_hidden=32,
        lm_hidden=32,
        projection_hidden=48,
        pooling=PoolingConfig(hidden_dim=32, num_heads=4, num_layers=2,
                              ffn_dim=64, max_positions=16),
    )
    model = AslmModel(config, hub.tiny_test_config(), llm.tiny_test_config())
    return model


def test_aslm_end_to_end_shapes():
    model = tiny_aslm()
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    # un-segmented path (reference segmentation='none'): whole utterances,
    # audio batch == text batch
    bs, frames = 2, 800
    waveforms = rng.normal(0, 0.3, (bs, frames)).astype(np.float32)
    wf_mask = np.ones((bs, frames), np.int32)
    wf_mask[1, 600:] = 0

    audio_embeds, frame_mask = model.encode_audio(
        params, jnp.asarray(waveforms), jnp.asarray(wf_mask)
    )
    text_ids = rng.integers(0, 100, (bs, 5))
    text_mask = np.ones((bs, 5), np.int32)

    inputs = model.prepare_audio_inputs(
        params,
        audio_embeds=audio_embeds,
        frame_mask=frame_mask,
        input_ids=jnp.asarray(text_ids),
        attention_mask=jnp.asarray(text_mask),
        segments_count=None,
    )
    # linear projection with seq_len k=2 reduces T frames to T//2 positions
    t = audio_embeds.shape[1]
    p = (t - t % 2) // 2
    # audio BOS + P + audio EOS + text  (reference: +2 for audio bos/eos,
    # modeling_aslm_test.py:27-38 contract)
    assert inputs["inputs_embeds"].shape == (bs, 1 + p + 1 + 5, 32)

    logits = model.forward(params, inputs["inputs_embeds"], inputs["attention_mask"])
    assert logits.shape == (bs, 1 + p + 1 + 5, model.lm_config.vocab_size)


def test_aslm_segmented_unflatten():
    """transformer_encoder projection + segments_count unflattening → one
    audio token per segment (reference prepare_audio_inputs :317-322)."""
    config = AslmConfig(
        projection_type="transformer_encoder",
        audio_encoder_hidden=32,
        lm_hidden=32,
        pooling=PoolingConfig(hidden_dim=32, num_heads=4, num_layers=2,
                              ffn_dim=64, max_positions=64),
    )
    model = AslmModel(config, hub.tiny_test_config(), llm.tiny_test_config())
    params = model.init_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)

    bs, n_seg, frames = 2, 3, 800
    waveforms = rng.normal(0, 0.3, (bs * n_seg, frames)).astype(np.float32)
    seg_mask = np.array([1, 1, 0, 1, 1, 1], np.int32)

    audio_embeds, frame_mask = model.encode_audio(
        params, jnp.asarray(waveforms),
        jnp.asarray(np.ones((bs * n_seg, frames), np.int32)),
        jnp.asarray(seg_mask),
    )
    ids = rng.integers(0, 100, (bs, 4))
    inputs = model.prepare_audio_inputs(
        params,
        audio_embeds=audio_embeds,
        frame_mask=frame_mask,
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(np.ones((bs, 4), np.int32)),
        segments_count=n_seg,
    )
    assert inputs["inputs_embeds"].shape == (bs, 1 + n_seg + 1 + 4, 32)
    # padded segment's audio token must be masked out
    mask = np.asarray(inputs["attention_mask"])
    assert mask[0, 1 + 2] == 0  # segment 2 of batch row 0 was padding
    assert mask.sum() == (1 + n_seg + 1 + 4) * bs - 1


def test_gradient_flows_only_through_valid_frames():
    """Masked frames must not receive gradient (reference
    modeling_aslm_test.py:55-75)."""
    cfg = PoolingConfig(hidden_dim=32, num_heads=4, num_layers=2,
                        ffn_dim=64, max_positions=16)
    config = AslmConfig(
        projection_type="transformer_encoder", audio_encoder_hidden=16,
        lm_hidden=24, pooling=cfg,
    )
    params = aslm_mod.init_aslm_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 8, 16)).astype(np.float32)
    mask = np.ones((2, 8), np.int32)
    mask[0, 4:] = 0

    def loss_fn(inp):
        cls = jnp.broadcast_to(
            params["cls_token"]["embedding"][0][None, None, :], (2, 1, 16)
        )
        with_cls = jnp.concatenate([cls, inp], axis=1)
        m = jnp.concatenate([jnp.ones((2, 1), jnp.int32), jnp.asarray(mask)], axis=1)
        out = aslm_mod.pooling_forward(params["pooling"], cfg, with_cls, m)
        return jnp.sum(out ** 2)

    grads = np.asarray(jax.grad(loss_fn)(jnp.asarray(x)))
    assert np.abs(grads[0, :4]).max() > 0
    np.testing.assert_array_equal(grads[0, 4:], 0.0)
    assert np.abs(grads[1]).max() > 0
