"""Autoregressive generation for the ASLM eval path.

Capability parity with the reference's ``lm_decoder.generate`` call
(/root/reference/src/aat/training/trainer.py:568-597): beam search (beam=3),
repetition penalty 2.5, no-repeat-4-gram, ``max_new_tokens`` bounded by the
caption length, eos-terminated — driven from ``inputs_embeds`` (audio prefix
+ text prefix), exactly like ``update_eval_set_kwargs_containers``.

TPU-first: static shapes everywhere — fixed KV-cache slots, lax.scan over
decode steps, per-row ragged prompt lengths handled by RoPE positions +
attention masking (no re-packing). Greedy is the fast path; beam keeps the
reference's scoring semantics (length_penalty=1.0).

Notes vs HF semantics: the repetition penalty and n-gram ban consider the
*generated* tokens (HF additionally counts prompt input_ids when present;
the reference generates from inputs_embeds, so its prompt contributes no
ids either).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from aat_tpu.models import llama as llm

NEG_INF = jnp.float32(-1e9)


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 64
    num_beams: int = 1
    repetition_penalty: float = 1.0
    no_repeat_ngram_size: int = 0
    eos_token_id: int = 2
    pad_token_id: int = 0
    length_penalty: float = 1.0


def _apply_repetition_penalty(logits, generated, gen_mask, penalty):
    """CTRL-style: for tokens already generated, divide positive scores by
    ``penalty``, multiply negative ones."""
    if penalty == 1.0:
        return logits
    b, v = logits.shape
    seen = jnp.zeros((b, v), bool)
    one_hot = jax.nn.one_hot(generated, v, dtype=jnp.bool_)  # [B, L, V]
    seen = jnp.any(one_hot & gen_mask[..., None], axis=1)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _apply_no_repeat_ngram(logits, generated, step, n):
    """Ban tokens completing an n-gram already present in ``generated``.

    ``generated``: [B, L] buffer, positions >= step are unfilled. A token x
    is banned when the last n-1 generated tokens followed by x equal some
    window generated[i : i+n] with i + n <= step.
    """
    if n <= 0:
        return logits
    b, l = generated.shape
    v = logits.shape[-1]

    def banned_for_batch(gen):
        # prefix: last n-1 tokens before `step`
        prefix = jax.lax.dynamic_slice(gen, (jnp.maximum(step - (n - 1), 0),), (n - 1,))
        idx = jnp.arange(l - n + 1)
        windows = jnp.stack([gen[i : l - n + 1 + i] for i in range(n - 1)], axis=-1)
        match = jnp.all(windows == prefix[None, :], axis=-1)
        valid = idx + n <= step
        completions = gen[jnp.minimum(idx + n - 1, l - 1)]
        ban = jnp.zeros((v,), bool).at[completions].max(match & valid)
        return ban

    has_prefix = step >= n - 1
    banned = jax.vmap(banned_for_batch)(generated)
    banned = banned & has_prefix
    return jnp.where(banned, NEG_INF, logits)


def _process_logits(logits, generated, gen_mask, step, config: GenerationConfig):
    logits = _apply_repetition_penalty(
        logits, generated, gen_mask, config.repetition_penalty
    )
    logits = _apply_no_repeat_ngram(logits, generated, step, config.no_repeat_ngram_size)
    return logits


def _prefill(params, lm_config, inputs_embeds, attention_mask, cache_len):
    b, t0, _ = inputs_embeds.shape
    caches = llm.init_kv_caches(lm_config, b, cache_len, dtype=inputs_embeds.dtype)
    cache_mask = jnp.zeros((b, cache_len), jnp.int32)
    cache_mask = cache_mask.at[:, :t0].set(attention_mask.astype(jnp.int32))
    positions = jnp.clip(jnp.cumsum(attention_mask, axis=-1) - 1, 0)
    logits, caches = llm.llama_forward(
        params, lm_config,
        inputs_embeds=inputs_embeds,
        attention_mask=cache_mask,
        positions=positions,
        kv_caches=caches, cache_index=0,
    )
    lengths = jnp.sum(attention_mask, axis=-1).astype(jnp.int32)
    last_logits = jnp.take_along_axis(
        logits, (lengths - 1)[:, None, None], axis=1
    )[:, 0, :]
    return last_logits, caches, cache_mask, lengths


@functools.partial(
    jax.jit, static_argnames=("lm_config", "config")
)
def greedy_generate(
    params: dict,
    lm_config: llm.LlamaConfig,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray,
    config: GenerationConfig,
) -> jnp.ndarray:
    """Greedy decode → [B, max_new_tokens] ids (pad after eos)."""
    b, t0, _ = inputs_embeds.shape
    max_new = config.max_new_tokens
    cache_len = t0 + max_new

    last_logits, caches, cache_mask, lengths = _prefill(
        params, lm_config, inputs_embeds, attention_mask, cache_len
    )

    generated = jnp.full((b, max_new), config.pad_token_id, jnp.int32)
    finished = jnp.zeros((b,), bool)

    def step_fn(carry, step):
        last_logits, caches, cache_mask, generated, finished = carry
        gen_mask = jnp.arange(max_new)[None, :] < step
        logits = _process_logits(last_logits, generated, gen_mask, step, config)
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        token = jnp.where(finished, config.pad_token_id, token)
        generated = generated.at[:, step].set(token)
        finished = finished | (token == config.eos_token_id)

        slot = t0 + step
        cache_mask = cache_mask.at[:, slot].set(1)
        positions = (lengths + step)[:, None]
        embeds = llm.embed_tokens(params, token)[:, None, :].astype(inputs_embeds.dtype)
        logits_next, caches = llm.llama_forward(
            params, lm_config,
            inputs_embeds=embeds,
            attention_mask=cache_mask,
            positions=positions,
            kv_caches=caches, cache_index=slot,
        )
        return (logits_next[:, 0, :], caches, cache_mask, generated, finished), None

    carry = (last_logits, caches, cache_mask, generated, finished)
    carry, _ = jax.lax.scan(step_fn, carry, jnp.arange(max_new))
    return carry[3]


@functools.partial(jax.jit, static_argnames=("lm_config", "config"))
def beam_generate(
    params: dict,
    lm_config: llm.LlamaConfig,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray,
    config: GenerationConfig,
) -> jnp.ndarray:
    """Beam search → [B, max_new_tokens] ids of the best beam.

    Reference settings: num_beams=3, repetition_penalty=2.5,
    no_repeat_ngram_size=4 (trainer.py:568-580).
    """
    b, t0, _ = inputs_embeds.shape
    k = config.num_beams
    max_new = config.max_new_tokens
    cache_len = t0 + max_new

    last_logits, caches, cache_mask, lengths = _prefill(
        params, lm_config, inputs_embeds, attention_mask, cache_len
    )

    def tile(x):
        return jnp.repeat(x, k, axis=0)  # [B*K, ...] row-major beams per batch

    last_logits = tile(last_logits)
    caches = [(tile(c[0]), tile(c[1])) for c in caches]
    cache_mask = tile(cache_mask)
    lengths_k = tile(lengths)

    bk = b * k
    generated = jnp.full((bk, max_new), config.pad_token_id, jnp.int32)
    # beam scores: only beam 0 alive initially
    beam_scores = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)])[None, :], (b, 1)
    ).reshape(bk)
    # finished-hypothesis pool (HF BeamSearchScorer semantics with
    # num_return_sequences=1: eos candidates among the top 2K retire to the
    # pool; running beams continue with the best non-eos candidates)
    best_done_score = jnp.full((b,), NEG_INF)
    best_done_seq = jnp.full((b, max_new), config.pad_token_id, jnp.int32)

    def step_fn(carry, step):
        (last_logits, caches, cache_mask, generated, beam_scores,
         best_done_score, best_done_seq) = carry
        gen_mask = jnp.arange(max_new)[None, :] < step
        logits = _process_logits(last_logits, generated, gen_mask, step, config)
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # [BK, V]
        v = logprobs.shape[-1]

        cand = (beam_scores[:, None] + logprobs).reshape(b, k * v)
        top_scores, top_idx = jax.lax.top_k(cand, 2 * k)  # [B, 2K]
        src_beam = top_idx // v
        token = (top_idx % v).astype(jnp.int32)
        is_eos = token == config.eos_token_id

        # retire the best eos candidate into the pool (length_penalty 1.0:
        # raw cumulative log-prob; the eos token itself is not emitted)
        eos_scores = jnp.where(is_eos, top_scores, NEG_INF)
        best_eos = jnp.max(eos_scores, axis=-1)  # [B]
        best_eos_src = jnp.take_along_axis(
            src_beam, jnp.argmax(eos_scores, axis=-1)[:, None], axis=1
        )[:, 0]
        improved = best_eos > best_done_score
        done_seq_candidate = generated.reshape(b, k, max_new)[
            jnp.arange(b), best_eos_src
        ]
        best_done_seq = jnp.where(improved[:, None], done_seq_candidate, best_done_seq)
        best_done_score = jnp.maximum(best_done_score, best_eos)

        # continue with the top-K non-eos candidates
        cont_scores = jnp.where(is_eos, NEG_INF, top_scores)
        order = jnp.argsort(-cont_scores, axis=-1)[:, :k]  # [B, K]
        new_scores = jnp.take_along_axis(cont_scores, order, axis=1)
        new_token = jnp.take_along_axis(token, order, axis=1)
        new_src = jnp.take_along_axis(src_beam, order, axis=1)

        flat_src = (jnp.arange(b)[:, None] * k + new_src).reshape(bk)
        def reorder(x):
            return x[flat_src]

        generated = reorder(generated)
        cache_mask = reorder(cache_mask)
        caches = [(reorder(c[0]), reorder(c[1])) for c in caches]
        last_token = new_token.reshape(bk)
        generated = generated.at[:, step].set(last_token)
        beam_scores = new_scores.reshape(bk)

        slot = t0 + step
        cache_mask = cache_mask.at[:, slot].set(1)
        positions = (lengths_k + step)[:, None]
        embeds = llm.embed_tokens(params, last_token)[:, None, :].astype(inputs_embeds.dtype)
        logits_next, caches = llm.llama_forward(
            params, lm_config,
            inputs_embeds=embeds,
            attention_mask=cache_mask,
            positions=positions,
            kv_caches=caches, cache_index=slot,
        )
        return (
            logits_next[:, 0, :], caches, cache_mask, generated, beam_scores,
            best_done_score, best_done_seq,
        ), None

    carry = (last_logits, caches, cache_mask, generated, beam_scores,
             best_done_score, best_done_seq)
    carry, _ = jax.lax.scan(step_fn, carry, jnp.arange(max_new))
    generated, beam_scores = carry[3], carry[4]
    best_done_score, best_done_seq = carry[5], carry[6]

    # best of: finished pool vs best still-running beam (length_penalty 1.0)
    run_best = jnp.argmax(beam_scores.reshape(b, k), axis=-1)
    run_seq = generated.reshape(b, k, max_new)[jnp.arange(b), run_best]
    run_score = jnp.max(beam_scores.reshape(b, k), axis=-1)
    use_done = best_done_score >= run_score
    return jnp.where(use_done[:, None], best_done_seq, run_seq)


def generate(
    params: dict,
    lm_config: llm.LlamaConfig,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray,
    config: GenerationConfig,
) -> jnp.ndarray:
    if config.num_beams <= 1:
        return greedy_generate(params, lm_config, inputs_embeds, attention_mask, config)
    return beam_generate(params, lm_config, inputs_embeds, attention_mask, config)
