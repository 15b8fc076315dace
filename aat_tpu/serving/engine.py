"""Continuous-batching greedy decode engine.

TPU-first serving core around the existing Llama KV-cache machinery
(models/llama.py): a fixed pool of ``max_slots`` sequence slots shares ONE
static-shape KV cache; requests join a free slot via a single-dispatch
prefill+adopt, and every ``step()`` advances ALL active slots with one
fused program (per-row cache write offsets + per-row RoPE positions — see
``llama_forward``'s vector ``cache_index`` path). Requests of different
lengths and arrival times therefore decode together at full batch
efficiency, with no re-padding, no recompilation, and no per-request
dispatch beyond its prefill.

Cache layout per slot: positions [0, max_prefill_len) hold the (padded)
prefix, positions [max_prefill_len, max_prefill_len + max_new_tokens) the
generated tokens — fully static, exactly the layout
``training/generate.greedy_generate`` uses per batch. RoPE positions use
the TRUE prefix length, so padding never shifts rotary phases.

The engine is greedy with an optional CTRL repetition penalty over a
carried [S, V] seen-mask (the eval path's semantics, minus n-gram bans —
those need a per-slot step index and are an eval-only feature of
``training/generate``). With ``repetition_penalty=1.0`` the engine's
outputs match ``greedy_generate`` token for token (pinned by
tests/test_serving.py).

No reference counterpart: /root/reference has no serving layer (SURVEY §1).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aat_tpu.models import llama as llm


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    max_slots: int = 8
    max_prefill_len: int = 96      # audio prefix + prompt, padded
    max_new_tokens: int = 64
    eos_token_id: int = 2
    pad_token_id: int = 0
    repetition_penalty: float = 1.0
    cache_dtype: str = "bfloat16"
    # batched admission: submit_many prefills up to this many requests in
    # ONE dispatch (a static batch — bursts pad up to it); 0 → max_slots
    max_prefill_batch: int = 0

    @property
    def cache_len(self) -> int:
        return self.max_prefill_len + self.max_new_tokens


class EngineState(NamedTuple):
    caches: list                  # [(k, v)] per layer, [S, nkv, cache_len, D]
    cache_mask: jnp.ndarray       # [S, cache_len] int32
    lengths: jnp.ndarray          # [S] true prefix lengths
    n_gen: jnp.ndarray            # [S] tokens generated so far
    active: jnp.ndarray           # [S] bool
    pending_logits: jnp.ndarray   # [S, V] logits awaiting argmax
    generated: jnp.ndarray        # [S, max_new_tokens] int32
    seen: jnp.ndarray             # [S, V] repetition-penalty mask


class DecodeEngine:
    """Host-side coordinator over the jitted prefill/decode programs."""

    def __init__(self, params: dict, lm_config: llm.LlamaConfig,
                 config: EngineConfig):
        self.params = jax.device_put(params)  # once; numpy params would
        # re-transfer (or constant-fold) into every jitted call
        self.lm_config = lm_config
        self.config = config
        self._slot_free = list(range(config.max_slots))
        self._results: Dict[int, np.ndarray] = {}
        cdtype = jnp.bfloat16 if config.cache_dtype == "bfloat16" else jnp.float32
        s, v = config.max_slots, lm_config.vocab_size
        self.state = EngineState(
            caches=llm.init_kv_caches(lm_config, s, config.cache_len, cdtype),
            cache_mask=jnp.zeros((s, config.cache_len), jnp.int32),
            lengths=jnp.zeros((s,), jnp.int32),
            n_gen=jnp.zeros((s,), jnp.int32),
            active=jnp.zeros((s,), bool),
            pending_logits=jnp.zeros((s, v), jnp.float32),
            generated=jnp.full((s, config.max_new_tokens),
                               config.pad_token_id, jnp.int32),
            seen=jnp.zeros((s, v), bool),
        )
        self._submit_fn = jax.jit(self._make_submit(), donate_argnums=(1,))
        self._submit_many_fn = jax.jit(self._make_submit_many(),
                                       donate_argnums=(1,))
        self._step_fn = jax.jit(self._make_step(), donate_argnums=(1,))
        self._chunk_fns: Dict[int, callable] = {}

    # ------------------------------------------------------------------
    # jitted programs
    # ------------------------------------------------------------------

    def _make_submit(self):
        cfg, lm_cfg = self.config, self.lm_config
        p0 = cfg.max_prefill_len

        def submit(params, state: EngineState, slot, embeds, mask) -> EngineState:
            """Prefill one request ([1, P, H] padded embeds, [1, P] mask)
            and adopt it into ``slot`` — one dispatch."""
            row_caches = llm.init_kv_caches(
                lm_cfg, 1, cfg.cache_len, state.caches[0][0].dtype)
            row_mask = jnp.zeros((1, cfg.cache_len), jnp.int32)
            row_mask = row_mask.at[:, :p0].set(mask.astype(jnp.int32))
            positions = jnp.clip(jnp.cumsum(mask, axis=-1) - 1, 0)
            logits, row_caches = llm.llama_forward(
                params, lm_cfg, inputs_embeds=embeds,
                attention_mask=row_mask, positions=positions,
                kv_caches=row_caches, cache_index=0)
            length = jnp.sum(mask, axis=-1).astype(jnp.int32)[0]
            last = jnp.take_along_axis(
                logits, (length - 1)[None, None, None], axis=1)[0, 0, :]

            caches = [
                (ck.at[slot].set(rk[0]), cv.at[slot].set(rv[0]))
                for (ck, cv), (rk, rv) in zip(state.caches, row_caches)
            ]
            return EngineState(
                caches=caches,
                cache_mask=state.cache_mask.at[slot].set(row_mask[0]),
                lengths=state.lengths.at[slot].set(length),
                n_gen=state.n_gen.at[slot].set(0),
                active=state.active.at[slot].set(True),
                pending_logits=state.pending_logits.at[slot].set(
                    last.astype(jnp.float32)),
                generated=state.generated.at[slot].set(cfg.pad_token_id),
                seen=state.seen.at[slot].set(False),
            )

        return submit

    def _make_submit_many(self):
        cfg, lm_cfg = self.config, self.lm_config
        p0 = cfg.max_prefill_len

        def submit_many(params, state: EngineState, slots, embeds, mask,
                        valid) -> EngineState:
            """Prefill up to K requests in ONE dispatch and adopt them into
            ``slots`` ([K] int32, DISTINCT — padded rows park on arbitrary
            other slots so duplicate-scatter order never matters). ``valid``
            [K] bool gates padded rows to value-identical no-op writes, so
            parked rows may host live residents."""
            k = embeds.shape[0]
            row_caches = llm.init_kv_caches(
                lm_cfg, k, cfg.cache_len, state.caches[0][0].dtype)
            row_mask = jnp.zeros((k, cfg.cache_len), jnp.int32)
            row_mask = row_mask.at[:, :p0].set(mask.astype(jnp.int32))
            positions = jnp.clip(jnp.cumsum(mask, axis=-1) - 1, 0)
            logits, row_caches = llm.llama_forward(
                params, lm_cfg, inputs_embeds=embeds,
                attention_mask=row_mask, positions=positions,
                kv_caches=row_caches, cache_index=0)
            lengths = jnp.sum(mask, axis=-1).astype(jnp.int32)
            last = jnp.take_along_axis(
                logits, jnp.maximum(lengths - 1, 0)[:, None, None],
                axis=1)[:, 0, :]

            def put(pool, rows):
                cur = pool[slots]
                keep = valid.reshape((-1,) + (1,) * (cur.ndim - 1))
                return pool.at[slots].set(jnp.where(keep, rows, cur))

            caches = [
                (put(ck, rk), put(cv, rv))
                for (ck, cv), (rk, rv) in zip(state.caches, row_caches)
            ]
            zero_gen = jnp.full((k, cfg.max_new_tokens), cfg.pad_token_id,
                                jnp.int32)
            v = state.seen.shape[1]
            return EngineState(
                caches=caches,
                cache_mask=put(state.cache_mask, row_mask),
                lengths=put(state.lengths, lengths),
                n_gen=put(state.n_gen, jnp.zeros((k,), jnp.int32)),
                active=put(state.active, jnp.ones((k,), bool)),
                pending_logits=put(state.pending_logits,
                                   last.astype(jnp.float32)),
                generated=put(state.generated, zero_gen),
                seen=put(state.seen, jnp.zeros((k, v), bool)),
            )

        return submit_many

    def _make_step(self):
        cfg, lm_cfg = self.config, self.lm_config
        p0 = cfg.max_prefill_len
        s = cfg.max_slots

        def step(params, state: EngineState):
            bidx = jnp.arange(s)
            logits = state.pending_logits
            if cfg.repetition_penalty != 1.0:
                pen = jnp.where(logits > 0, logits / cfg.repetition_penalty,
                                logits * cfg.repetition_penalty)
                logits = jnp.where(state.seen, pen, logits)
            token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            token = jnp.where(state.active, token, cfg.pad_token_id)

            gen_idx = jnp.minimum(state.n_gen, cfg.max_new_tokens - 1)
            generated = state.generated.at[bidx, gen_idx].set(
                jnp.where(state.active, token,
                          state.generated[bidx, gen_idx]))
            seen = state.seen.at[bidx, token].set(
                state.seen[bidx, token] | state.active)
            n_gen = state.n_gen + state.active.astype(jnp.int32)
            finished = state.active & (
                (token == cfg.eos_token_id) | (n_gen >= cfg.max_new_tokens))
            active = state.active & ~finished

            # forward the just-selected token for every slot (inactive rows
            # compute into masked cache entries — static batch, no repack)
            write_pos = jnp.minimum(p0 + state.n_gen, cfg.cache_len - 1)
            cache_mask = state.cache_mask.at[bidx, write_pos].set(
                jnp.maximum(state.cache_mask[bidx, write_pos],
                            state.active.astype(jnp.int32)))
            positions = (state.lengths + state.n_gen)[:, None]
            embeds = llm.embed_tokens(params, token)[:, None, :].astype(
                state.caches[0][0].dtype)
            logits_next, caches = llm.llama_forward(
                params, lm_cfg, inputs_embeds=embeds,
                attention_mask=cache_mask, positions=positions,
                kv_caches=state.caches, cache_index=write_pos)

            new_state = EngineState(
                caches=caches, cache_mask=cache_mask, lengths=state.lengths,
                n_gen=n_gen, active=active,
                pending_logits=logits_next[:, 0, :].astype(jnp.float32),
                generated=generated, seen=seen)
            return new_state, (token, finished, generated)

        return step

    # ------------------------------------------------------------------
    # host API
    # ------------------------------------------------------------------

    @property
    def free_slots(self) -> int:
        return len(self._slot_free)

    def submit(self, inputs_embeds, attention_mask) -> Optional[int]:
        """Queue one request: ``inputs_embeds`` [P, H] (or [1, P, H]) and a
        [P] prefix mask, P <= max_prefill_len. Returns the slot id, or None
        when the pool is full (caller re-submits after a release)."""
        if not self._slot_free:
            return None
        embeds = jnp.asarray(inputs_embeds)
        if embeds.ndim == 2:
            embeds = embeds[None]
        mask = jnp.asarray(attention_mask).reshape(1, -1)
        p = embeds.shape[1]
        p0 = self.config.max_prefill_len
        assert p <= p0, (p, p0)
        if p < p0:
            embeds = jnp.pad(embeds, ((0, 0), (0, p0 - p), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, p0 - p)))
        slot = self._slot_free.pop(0)
        self.state = self._submit_fn(self.params, self.state, slot, embeds, mask)
        return slot

    def submit_many(self, requests: List[tuple]) -> List[int]:
        """Admit a burst of requests in ONE dispatch: ``requests`` is a list
        of (inputs_embeds [P, H], attention_mask [P]) pairs,
        len <= free_slots. The prefill batch is STATIC
        (config.max_prefill_batch, default max_slots) — bursts pad up to it
        and parked rows no-op, so any burst size reuses one compiled
        program. Returns the assigned slot ids in request order."""
        kmax = self.config.max_prefill_batch or self.config.max_slots
        assert requests and len(requests) <= min(kmax, len(self._slot_free)), (
            len(requests), kmax, len(self._slot_free))
        p0, h = self.config.max_prefill_len, None
        embeds, masks = [], []
        for e, m in requests:
            e = np.asarray(e)
            e = e[0] if e.ndim == 3 else e
            m = np.asarray(m).reshape(-1)
            assert e.shape[0] <= p0, (e.shape, p0)
            h = e.shape[1]
            embeds.append(np.pad(e, ((0, p0 - e.shape[0]), (0, 0))))
            masks.append(np.pad(m, (0, p0 - m.shape[0])))
        n_real = len(requests)
        slots = [self._slot_free.pop(0) for _ in range(n_real)]
        # parked rows ride ANY distinct slots not in the burst — their
        # writes are valid-gated no-ops (pool.at[slots].set(where(keep,
        # rows, cur)) writes the current value back), so occupied residents
        # are safe hosts; distinctness keeps the scatter order-independent
        park = [s for s in range(self.config.max_slots) if s not in slots]
        park = park[: kmax - n_real]
        assert len(park) == kmax - n_real, (
            f"max_prefill_batch={kmax} exceeds max_slots="
            f"{self.config.max_slots}")
        all_slots = np.asarray(slots + park, np.int32)
        valid = np.zeros((kmax,), bool)
        valid[:n_real] = True
        eb = np.zeros((kmax, p0, h), embeds[0].dtype)
        mb = np.zeros((kmax, p0), np.int32)
        eb[:n_real] = np.stack(embeds)
        mb[:n_real] = np.stack(masks)
        self.state = self._submit_many_fn(
            self.params, self.state, jnp.asarray(all_slots),
            jnp.asarray(eb), jnp.asarray(mb), jnp.asarray(valid))
        return slots

    def step(self) -> List[int]:
        """Advance every active slot by one token; returns slots that just
        finished (their results become available via ``result``)."""
        self.state, (token, finished, generated) = self._step_fn(self.params, self.state)
        done = np.nonzero(np.asarray(finished))[0]
        if len(done):
            gen_host = np.asarray(generated[done])
            for row, slot in enumerate(done):
                self._results[int(slot)] = gen_host[row]
        return [int(d) for d in done]

    def run_steps(self, n: int) -> List[int]:
        """Advance every active slot by up to ``n`` tokens in ONE dispatch
        (``lax.scan`` over the step body) — no per-token streaming, but on a
        remoted backend it amortizes the dispatch+fetch round trip across n
        tokens. Returns the slots that finished during the chunk."""
        if n not in self._chunk_fns:
            step = self._make_step()

            def chunk(params, state):
                def body(st, _):
                    st, _aux = step(params, st)
                    return st, None

                return jax.lax.scan(body, state, None, length=n)[0]

            self._chunk_fns[n] = jax.jit(chunk, donate_argnums=(1,))
        prev_active = np.asarray(self.state.active)
        self.state = self._chunk_fns[n](self.params, self.state)
        now_active = np.asarray(self.state.active)
        done = np.nonzero(prev_active & ~now_active)[0]
        if len(done):
            gen_host = np.asarray(self.state.generated[done])
            for row, slot in enumerate(done):
                self._results[int(slot)] = gen_host[row]
        return [int(d) for d in done]

    def result(self, slot: int, release: bool = True) -> np.ndarray:
        """Generated ids for a finished slot (eos included, pad after)."""
        ids = self._results.pop(slot) if release else self._results[slot]
        if release:
            self._slot_free.append(slot)
        return ids

    def drain(self, max_steps: Optional[int] = None) -> Dict[int, np.ndarray]:
        """Run until every active slot finishes; returns {slot: ids}."""
        out: Dict[int, np.ndarray] = {}
        steps = 0
        while bool(np.any(np.asarray(self.state.active))):
            for slot in self.step():
                out[slot] = self.result(slot)
            steps += 1
            if max_steps is not None and steps >= max_steps:
                break
        return out


def encode_speech_request(model, params, waveform_batch: dict):
    """Build the decode-engine prefix for ONE utterance: run the ASLM audio
    side (segment encoding + projection + audio BOS/EOS wrap + prompt
    embeds) exactly as the eval path does, returning (inputs_embeds [P, H],
    attention_mask [P]). ``waveform_batch`` is a collated batch of size 1
    (segmented or whole-utterance keys)."""
    seg = waveform_batch["batched_segments"]
    b, s, f = seg.shape
    assert b == 1, "one request at a time"
    audio_embeds, frame_mask = model.encode_audio(
        params, seg.reshape(b * s, f),
        waveform_batch["segments_waveforms_mask"].reshape(b * s, f),
        waveform_batch["segments_boarders_attention_mask"].reshape(b * s))
    inputs = model.prepare_audio_inputs(
        params, audio_embeds=audio_embeds, frame_mask=frame_mask,
        input_ids=waveform_batch.get("prefix_input_ids"),
        attention_mask=waveform_batch.get("prefix_attention_mask"),
        segments_count=s)
    return inputs["inputs_embeds"][0], inputs["attention_mask"][0]
