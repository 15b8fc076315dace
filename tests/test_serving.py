"""Continuous-batching decode engine: token-for-token parity with the
batch greedy path, slot reuse, and staggered arrivals.

The engine shares the Llama KV-cache machinery with training/generate, so
its greedy outputs must equal ``greedy_generate``'s for the same prefixes
(same cache layout: padded prefix region + per-step slots, RoPE positions
from true lengths)."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from aat_tpu.models import llama as llm
from aat_tpu.serving import DecodeEngine, EngineConfig
from aat_tpu.training.generate import GenerationConfig, greedy_generate


def tiny_lm():
    cfg = llm.LlamaConfig(
        vocab_size=89, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    params = llm.init_llama_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def make_prefixes(cfg, lengths, p0, seed=0):
    rng = np.random.default_rng(seed)
    embeds = rng.normal(0, 0.5, (len(lengths), p0, cfg.hidden_size))
    mask = np.zeros((len(lengths), p0), np.int32)
    for i, n in enumerate(lengths):
        mask[i, :n] = 1
        embeds[i, n:] = 0.0
    return jnp.asarray(embeds, jnp.float32), jnp.asarray(mask)


def reference_greedy(cfg, params, embeds, mask, max_new, eos=2):
    gen = GenerationConfig(max_new_tokens=max_new, num_beams=1,
                           eos_token_id=eos, pad_token_id=0)
    return np.asarray(greedy_generate(params, cfg, embeds, mask, gen))


def test_engine_matches_batch_greedy():
    cfg, params = tiny_lm()
    p0, max_new = 12, 16
    lengths = [5, 12, 8]
    embeds, mask = make_prefixes(cfg, lengths, p0)
    want = reference_greedy(cfg, params, embeds, mask, max_new)

    eng = DecodeEngine(params, cfg, EngineConfig(
        max_slots=4, max_prefill_len=p0, max_new_tokens=max_new,
        eos_token_id=2, cache_dtype="float32"))
    slots = [eng.submit(embeds[i], mask[i]) for i in range(3)]
    assert slots == [0, 1, 2]
    got = eng.drain()
    for i, slot in enumerate(slots):
        np.testing.assert_array_equal(got[slot], want[i])


def test_engine_staggered_arrivals_and_slot_reuse():
    """Requests joining mid-decode must not perturb resident slots, and a
    freed slot must serve a new request correctly."""
    cfg, params = tiny_lm()
    p0, max_new = 10, 12
    lengths = [4, 7, 10, 6]
    embeds, mask = make_prefixes(cfg, lengths, p0, seed=3)
    want = reference_greedy(cfg, params, embeds, mask, max_new)

    eng = DecodeEngine(params, cfg, EngineConfig(
        max_slots=2, max_prefill_len=p0, max_new_tokens=max_new,
        eos_token_id=2, cache_dtype="float32"))
    s0 = eng.submit(embeds[0], mask[0])
    s1 = eng.submit(embeds[1], mask[1])
    assert eng.submit(embeds[2], mask[2]) is None  # pool full

    results = {}
    pending = [2, 3]
    req_of_slot = {s0: 0, s1: 1}
    for _ in range(200):
        for slot in eng.step():
            results[req_of_slot[slot]] = eng.result(slot)
            if pending:
                nxt = pending.pop(0)
                new_slot = eng.submit(embeds[nxt], mask[nxt])
                assert new_slot is not None
                req_of_slot[new_slot] = nxt
        if len(results) == 4:
            break
    assert len(results) == 4
    for req, ids in results.items():
        np.testing.assert_array_equal(ids, want[req])


def test_engine_repetition_penalty_diverges():
    cfg, params = tiny_lm()
    p0, max_new = 8, 12
    embeds, mask = make_prefixes(cfg, [8], p0, seed=5)
    base = DecodeEngine(params, cfg, EngineConfig(
        max_slots=1, max_prefill_len=p0, max_new_tokens=max_new,
        eos_token_id=-1, cache_dtype="float32"))
    pen = DecodeEngine(params, cfg, EngineConfig(
        max_slots=1, max_prefill_len=p0, max_new_tokens=max_new,
        eos_token_id=-1, repetition_penalty=2.5, cache_dtype="float32"))
    a = base.submit(embeds[0], mask[0]); b = pen.submit(embeds[0], mask[0])
    ra = base.drain()[a]
    rb = pen.drain()[b]
    # the penalized run must avoid immediate self-repeats the base commits
    assert not np.array_equal(ra, rb)


def test_engine_chunked_steps_match_stepwise():
    """run_steps(n) (one lax.scan dispatch) must produce exactly the
    stepwise results."""
    cfg, params = tiny_lm()
    p0, max_new = 10, 12
    lengths = [4, 9, 6]
    embeds, mask = make_prefixes(cfg, lengths, p0, seed=7)
    want = reference_greedy(cfg, params, embeds, mask, max_new)

    eng = DecodeEngine(params, cfg, EngineConfig(
        max_slots=4, max_prefill_len=p0, max_new_tokens=max_new,
        eos_token_id=2, cache_dtype="float32"))
    slots = [eng.submit(embeds[i], mask[i]) for i in range(3)]
    results = {}
    for _ in range(6):
        for slot in eng.run_steps(4):
            results[slot] = eng.result(slot)
        if len(results) == 3:
            break
    assert len(results) == 3
    for i, slot in enumerate(slots):
        np.testing.assert_array_equal(results[slot], want[i])


def test_serve_cli_smoke(tmp_path):
    """End-to-end: tiny export -> scripts/serve.py --random-demo drives the
    full speech path (on-device segmentation -> encoder -> engine decode)
    and prints one JSON line per utterance."""
    import io
    import json as json_mod
    import sys as sys_mod
    from contextlib import redirect_stdout

    from tests.test_training import tiny_model
    from aat_tpu.training.config import TrainingConfig
    from aat_tpu.training.trainer import AATTrainer

    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))
    cfg = TrainingConfig(
        learning_rate=1e-3, train_audio_encoder=True, train_lm_decoder=True,
        compute_dtype="float32", output_dir=str(tmp_path / "out"),
    )
    trainer = AATTrainer(model, params, cfg)
    export = str(tmp_path / "export")
    trainer.save_pretrained(export)

    sys_mod.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import serve

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = serve.main([
            "--model-dir", export, "--random-demo", "2", "--max-slots", "2",
            "--max-new-tokens", "6", "--max-segments", "8", "--chunk", "3",
        ])
    assert rc == 0
    lines = [json_mod.loads(x) for x in buf.getvalue().strip().splitlines()]
    assert len(lines) == 2
    for rec in lines:
        assert "ids" in rec or "text" in rec
        ids = rec.get("ids")
        if ids is not None:
            assert len(ids) == 6


def test_submit_many_matches_sequential():
    """Batched admission (one prefill dispatch for a burst) must produce
    exactly the outputs of sequential submits — including a PARTIAL burst
    (parked rows no-op on distinct free slots) and a mid-decode burst
    joining resident slots."""
    cfg, params = tiny_lm()
    p0, max_new = 12, 16
    lengths = [5, 12, 8, 3, 9]
    embeds, mask = make_prefixes(cfg, lengths, p0, seed=5)
    want = reference_greedy(cfg, params, embeds, mask, max_new)

    def engine():
        return DecodeEngine(params, cfg, EngineConfig(
            max_slots=6, max_prefill_len=p0, max_new_tokens=max_new,
            eos_token_id=2, cache_dtype="float32"))

    # full-burst admission
    eng = engine()
    slots = eng.submit_many([(embeds[i], mask[i]) for i in range(3)])
    assert slots == [0, 1, 2]
    got = eng.drain()
    for i, slot in enumerate(slots):
        np.testing.assert_array_equal(got[slot], want[i], err_msg=f"req {i}")

    # partial burst joining mid-decode: two residents + a 3-request burst
    eng = engine()
    s0 = eng.submit(embeds[0], mask[0])
    s1 = eng.submit(embeds[1], mask[1])
    for _ in range(4):
        eng.step()
    burst = eng.submit_many([(embeds[i], mask[i]) for i in (2, 3, 4)])
    results = dict(eng.drain())
    for i, slot in zip((0, 1), (s0, s1)):
        np.testing.assert_array_equal(results[slot], want[i], err_msg=f"res {i}")
    for i, slot in zip((2, 3, 4), burst):
        np.testing.assert_array_equal(results[slot], want[i], err_msg=f"burst {i}")
