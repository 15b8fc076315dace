"""Port-layer hardening at REAL architecture shapes.

The reference's value rides on facebook/hubert-large-ls960-ft and
SmolLM-135M checkpoints (reference scripts/trainer_train.py:180-225). The
zero-egress environment cannot download them, so these tests round-trip
randomly initialized torch models at the *actual* full configs (hubert-large
dims with all 24 layers; SmolLM-135M dims with all 30 layers, GQA 9/3 heads,
tied embeddings) through utils/port.py — layout bugs that only appear at
full config (head grouping, weight-norm pos conv at 1024 dims, vocab-tied
output heads) are excluded at tiny-batch/seq cost only.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

torch.backends.mkldnn.enabled = False

import jax.numpy as jnp  # noqa: E402

from aat_tpu.models import hubert as hub  # noqa: E402
from aat_tpu.models import llama as llm  # noqa: E402
from aat_tpu.utils.port import port_hubert, port_llama  # noqa: E402


@pytest.mark.slow
def test_hubert_large_shape_port_parity():
    """Random torch HubertModel at the full hubert-large config (24 layers,
    1024 hidden, 16 heads, 512-dim conv stack, 128-tap weight-norm pos
    conv) must port to <2e-4 max divergence."""
    cfg = transformers.HubertConfig(
        hidden_size=1024,
        num_hidden_layers=24,
        num_attention_heads=16,
        intermediate_size=4096,
        conv_dim=(512,) * 7,
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_bias=True,
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        mask_time_prob=0.0,
        layerdrop=0.0, hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, activation_dropout=0.0,
    )
    torch.manual_seed(0)
    tm = transformers.HubertModel(cfg).eval()
    params, config = port_hubert(tm)
    assert config.hidden_size == 1024 and config.num_hidden_layers == 24
    assert config.hidden_dropout == 0.0  # rates come from the config

    rng = np.random.default_rng(0)
    wav = rng.normal(0, 0.5, (2, 6400)).astype(np.float32)
    mask = np.ones((2, 6400), dtype=np.int64)
    mask[1, 4000:] = 0

    with torch.no_grad():
        ref = tm(torch.tensor(wav),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    ours, frame_mask = hub.hubert_encode(
        params, config, jnp.asarray(wav), jnp.asarray(mask)
    )
    ours = np.asarray(ours)
    fm = np.asarray(frame_mask).astype(bool)
    diff = np.abs(ours - ref)[fm].max()
    assert diff < 2e-4, f"hubert-large port diverges by {diff}"


@pytest.mark.slow
def test_smollm_135m_shape_port_parity():
    """Random torch LlamaForCausalLM at the full SmolLM-135M config
    (30 layers, 576 hidden, GQA 9 heads / 3 kv heads, vocab 49152, tied
    embeddings) must port to <2e-4 max logit divergence."""
    ref_cfg = llm.smollm_135m_config()
    cfg = transformers.LlamaConfig(
        vocab_size=ref_cfg.vocab_size,
        hidden_size=ref_cfg.hidden_size,
        intermediate_size=ref_cfg.intermediate_size,
        num_hidden_layers=ref_cfg.num_hidden_layers,
        num_attention_heads=ref_cfg.num_attention_heads,
        num_key_value_heads=ref_cfg.num_key_value_heads,
        max_position_embeddings=512,
        rms_norm_eps=ref_cfg.rms_norm_eps,
        rope_theta=ref_cfg.rope_theta,
        tie_word_embeddings=True,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    tm = transformers.LlamaForCausalLM(cfg).eval()
    params, config = port_llama(tm)
    assert config.num_hidden_layers == 30
    assert config.num_key_value_heads == 3 and config.num_attention_heads == 9
    assert config.tie_word_embeddings

    rng = np.random.default_rng(1)
    ids = rng.integers(1, cfg.vocab_size, (2, 10))
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0

    with torch.no_grad():
        ref = tm(torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    ours = np.asarray(llm.llama_forward(
        params, config,
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
    )[0])
    valid = mask.astype(bool)
    diff = np.abs(ours - ref)[valid].max()
    assert diff < 2e-4, f"smollm-135m port diverges by {diff}"


@pytest.mark.slow
def test_parity_check_weights_runbook(tmp_path):
    """The weights-injection runbook (VERDICT r3 item 7): save a random HF
    HubertModel + LlamaForCausalLM locally, then run
    ``scripts/parity_check.py --weights <dir> --lm-weights <dir>`` end to
    end in a subprocess. Proves the wiring so real checkpoints only need to
    be dropped in (zero-egress here)."""
    import os
    import subprocess
    import sys

    hcfg = transformers.HubertConfig(
        vocab_size=32, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_stride=(5, 2, 2), conv_kernel=(10, 3, 3),
        conv_bias=True, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=True,
        feat_extract_norm="layer", mask_time_prob=0.0,
        layerdrop=0.0, hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, activation_dropout=0.0,
    )
    torch.manual_seed(0)
    transformers.HubertModel(hcfg).eval().save_pretrained(tmp_path / "hubert")

    lcfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=True,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    transformers.LlamaForCausalLM(lcfg).eval().save_pretrained(tmp_path / "lm")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "parity_check.py"),
         "--cpu", "--clips", "1", "--seconds", "3", "--weights-clips", "1",
         "--weights", str(tmp_path / "hubert"),
         "--lm-weights", str(tmp_path / "lm")],
        capture_output=True, text=True, timeout=1200, cwd=repo,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "PARITY: PASS" in proc.stdout
    assert "port parity (f32 frames)" in proc.stdout
    assert "pipeline segment means" in proc.stdout
    assert "eval wiring" in proc.stdout
