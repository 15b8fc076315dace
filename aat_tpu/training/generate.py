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
from typing import Optional

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
    # HF flags the reference generates with (trainer.py:568-580):
    # early_stopping=True freezes a batch's finished pool once full;
    # forced_eos_token_id forces eos as the final generated token.
    early_stopping: bool = False
    forced_eos_token_id: Optional[int] = None


def _apply_repetition_penalty(logits, seen, penalty):
    """CTRL-style: for tokens already generated, divide positive scores by
    ``penalty``, multiply negative ones.

    ``seen`` is a [B, V] bool mask carried in the decode scan (updated as
    each token is written, reordered with the beams) — reconstructing it
    per step via ``one_hot(generated, V)`` would materialize [B·K, L, V]
    (~233 MB at Qwen-1.5-1.8B vocab 151,936 with beam 3 × batch 8 × L 64).
    """
    if penalty == 1.0:
        return logits
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
    # HF NoRepeatNGramLogitsProcessor masks with -inf (not a large-negative
    # sentinel); mirrored so beam candidate arithmetic matches bit-for-bit
    return jnp.where(banned, -jnp.inf, logits)


def _process_logits(logits, generated, seen, step, config: GenerationConfig):
    logits = _apply_repetition_penalty(logits, seen, config.repetition_penalty)
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
    seen = jnp.zeros((b, last_logits.shape[-1]), bool)

    def step_fn(carry, step):
        last_logits, caches, cache_mask, generated, finished, seen = carry
        logits = _process_logits(last_logits, generated, seen, step, config)
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        token = jnp.where(finished, config.pad_token_id, token)
        generated = generated.at[:, step].set(token)
        seen = seen.at[jnp.arange(b), token].set(True)
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
        return (logits_next[:, 0, :], caches, cache_mask, generated, finished, seen), None

    carry = (last_logits, caches, cache_mask, generated, finished, seen)
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
    """Beam search → [B, max_new_tokens] ids of the best finished beam.

    Mirrors transformers' vectorized ``_beam_search`` (generation/utils.py,
    the refactored flax-style implementation) step for step, so the
    reference's exact ``gen_params`` (trainer.py:568-580: num_beams=3,
    repetition_penalty=2.5, no_repeat_ngram_size=4, early_stopping=True,
    pad=eos, forced_eos) reproduce HF's selected sequences:

    - processors apply to log-softmax scores (not raw logits) in beam mode;
    - per step, the top 2K accumulated candidates are split: candidates that
      hit a stopping criterion (eos, or reaching max length) AND rank < K
      retire into a K-slot finished pool scored by
      ``cum_logprob / len**length_penalty`` (length includes the eos token);
      the best K non-finished continue;
    - a batch stops accepting finished hypotheses once its pool is full
      (early_stopping=True) or once the best running beam provably cannot
      improve on the worst pooled score (the sticky heuristic HF applies for
      early_stopping=False);
    - the emitted sequence contains the eos token, then pad fill — exactly
      HF's output layout (minus HF's crop-to-longest, since shapes are
      static here).

    ``remove_invalid_values`` is a no-op for finite models and is omitted.
    """
    b, t0, _ = inputs_embeds.shape
    k = config.num_beams
    k2 = 2 * k  # HF: beams_to_keep = max(2, 1 + n_eos) * num_beams
    max_new = config.max_new_tokens
    lp = config.length_penalty
    es = bool(config.early_stopping)
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
    # HF quirk, mirrored: `output_fill_value = pad_token_id or eos_token_id`
    # — a pad id of 0 is falsy in Python, so HF pads beam outputs with EOS
    fill = config.pad_token_id if config.pad_token_id != 0 else (
        config.eos_token_id if config.eos_token_id >= 0 else -1
    )
    generated = jnp.full((bk, max_new), fill, jnp.int32)
    # running beam scores: only beam 0 alive initially (HF inits others -1e9)
    beam_scores = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)])[None, :], (b, 1)
    )  # [B, K] float32
    # K-slot finished pool (normalized scores), HF's `sequences`/`beam_scores`
    pool_seqs = jnp.full((b, k, max_new), fill, jnp.int32)
    pool_scores = jnp.full((b, k), NEG_INF, jnp.float32)
    pool_finished = jnp.zeros((b, k), bool)
    # sticky per-batch "running beams could still improve the pool" bit
    unsat = jnp.ones((b,), bool)
    # per-beam seen-token mask for the repetition penalty, carried (and
    # reordered) with the beams — O(B·K·V) instead of the O(B·K·L·V)
    # one-hot reconstruction
    seen = jnp.zeros((bk, last_logits.shape[-1]), bool)

    batch_idx = jnp.arange(b)

    def step_fn(carry, step):
        (last_logits, caches, cache_mask, generated, beam_scores,
         pool_seqs, pool_scores, pool_finished, unsat, seen) = carry

        # -- candidate scores: processors on log-probs (HF beam semantics) --
        logprobs = jax.nn.log_softmax(last_logits.astype(jnp.float32), axis=-1)
        logprobs = _process_logits(logprobs, generated, seen, step, config)
        if config.forced_eos_token_id is not None:
            # ForcedEOSTokenLogitsProcessor: at the final position, -inf
            # everywhere except forced eos -> 0
            forced = jnp.full(logprobs.shape, -jnp.inf, logprobs.dtype)
            forced = forced.at[:, config.forced_eos_token_id].set(0.0)
            logprobs = jnp.where(step == max_new - 1, forced, logprobs)
        v = logprobs.shape[-1]

        cand = (beam_scores.reshape(bk)[:, None] + logprobs).reshape(b, k * v)
        top_scores, top_idx = jax.lax.top_k(cand, k2)  # [B, 2K], sorted desc
        src_beam = top_idx // v
        token = (top_idx % v).astype(jnp.int32)
        # stopping criteria per candidate: eos, or the sequence reaching
        # max length (HF retires ALL top-K candidates at the final step)
        hits = (token == config.eos_token_id) | (step + 1 >= max_new)

        # candidate sequences [B, 2K, L]: parent tokens + new token at
        # `step`. (Only rank<K candidates can retire, but slicing to K here
        # measured SLOWER on the v5e — the full-width gather fuses with the
        # running-beam reorder; keep 2K.)
        parent = generated.reshape(b, k, max_new)[batch_idx[:, None], src_beam]
        cand_seqs = parent.at[:, :, step].set(token)

        # -- pool update (HF _update_finished_beams) --
        did_finish = hits & (jnp.arange(k2) < k)[None, :]
        norm = top_scores / ((step + 1).astype(jnp.float32) ** lp)
        pool_full = jnp.all(pool_finished, axis=1)  # [B]
        merge_scores = (
            norm
            + jnp.where(did_finish, 0.0, NEG_INF)
            + jnp.where((pool_full & es)[:, None], NEG_INF, 0.0)
            + jnp.where(unsat[:, None], 0.0, NEG_INF)
        )
        merged_scores = jnp.concatenate([pool_scores, merge_scores], axis=1)
        merged_finished = jnp.concatenate([pool_finished, did_finish], axis=1)
        merged_seqs = jnp.concatenate([pool_seqs, cand_seqs], axis=1)
        pool_scores, sel = jax.lax.top_k(merged_scores, k)
        pool_seqs = merged_seqs[batch_idx[:, None], sel]
        pool_finished = merged_finished[batch_idx[:, None], sel]

        # -- running beams: best K candidates that did not finish --
        run_scores = top_scores + jnp.where(hits, NEG_INF, 0.0)
        new_scores, order = jax.lax.top_k(run_scores, k)  # [B, K]
        new_token = jnp.take_along_axis(token, order, axis=1)
        new_src = jnp.take_along_axis(src_beam, order, axis=1)
        beam_scores = new_scores

        flat_src = (batch_idx[:, None] * k + new_src).reshape(bk)

        def reorder(x):
            return x[flat_src]

        generated = reorder(generated)
        cache_mask = reorder(cache_mask)
        caches = [(reorder(c[0]), reorder(c[1])) for c in caches]
        last_token = new_token.reshape(bk)
        generated = generated.at[:, step].set(last_token)
        seen = reorder(seen).at[jnp.arange(bk), last_token].set(True)

        # -- sticky early-stop heuristic (HF _check_early_stop_heuristic,
        # evaluated at cur_len = step + 1; early_stopping=True and the
        # default False both estimate with the current length) --
        best_possible = beam_scores[:, 0] / ((step + 1).astype(jnp.float32) ** lp)
        pool_full_now = jnp.all(pool_finished, axis=1)
        worst_pool = jnp.where(pool_full_now, jnp.min(pool_scores, axis=1), NEG_INF)
        unsat = unsat & (best_possible > worst_pool)

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
            pool_seqs, pool_scores, pool_finished, unsat, seen,
        ), None

    carry = (last_logits, caches, cache_mask, generated, beam_scores,
             pool_seqs, pool_scores, pool_finished, unsat, seen)
    carry, _ = jax.lax.scan(step_fn, carry, jnp.arange(max_new))
    # pool slot 0 is the best finished hypothesis (top_k keeps descending
    # order); at the final step every running beam retired, so the pool is
    # never empty — this matches HF's `sequences[:, :num_return_sequences]`
    return carry[5][:, 0, :]


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
