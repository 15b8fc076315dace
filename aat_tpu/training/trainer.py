"""ASLM trainer: pjit train/eval steps over a device mesh.

Capability parity with ``AATTrainer`` / ``AATTrainerSegmentation``
(/root/reference/src/aat/training/trainer.py:86-730), re-designed TPU-first:

- one jitted, buffer-donated ``grad_step`` computes audio encoding →
  projection → input assembly → caption cross-entropy in a single XLA
  program (the reference splits this across ``_prepare_inputs`` /
  ``compute_loss`` with host sync between);
- gradient accumulation by pytree accumulation across microbatches
  (reference: HF Trainer accumulation, trainer.py:51);
- caption-only shifted CE with pad masking (reference compute_loss
  :175-207);
- per-step debug metrics — sequence length, audio/text embedding norms and
  means, audio BOS/EOS stats (reference :209-238) — and encoder /
  audio-token-embedding grad norms (reference training_step :242-265),
  all computed inside the jitted step (no host round-trips);
- freeze masks for encoder/decoder (reference trainer_train.py:258-262);
- orbax checkpointing with partial-restore semantics mirroring
  ``_keys_to_ignore_on_load_missing = ["audio_encoder", "lm_decoder"]``
  (reference modeling_aslm.py:100);
- data-parallel (dp×fsdp×tp) sharding via aat_tpu.parallel.mesh.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import shutil
import time
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aat_tpu.models.aslm import AslmModel
from aat_tpu.parallel import mesh as mesh_lib
from aat_tpu.training import optim as optim_lib
from aat_tpu.training.config import TrainingConfig
from aat_tpu.training.lr_schedule import warmup_linear_schedule

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainState:
    step: int
    params: Any
    opt_state: Any


def _merge_bn_running_stats(new_params, ae_bn):
    """Overwrite the EfficientNet BN running-stat leaves of ``new_params``
    with the EMA'd tree ``ae_bn``; the optimizer owns every other
    audio_encoder leaf (running stats get zero grads, so the sets are
    disjoint)."""

    def pick(path, new_leaf, bn_leaf):
        keys = [str(p.key) for p in path if hasattr(p, "key")]
        if keys and keys[-1] in ("mean", "var") and any(
            k.endswith("bn") for k in keys
        ):
            return bn_leaf
        return new_leaf

    new_params = dict(new_params)
    new_params["audio_encoder"] = jax.tree_util.tree_map_with_path(
        pick, new_params["audio_encoder"], ae_bn
    )
    return new_params


def caption_cross_entropy(
    logits: jnp.ndarray,
    input_ids: jnp.ndarray,
    input_ids_attention_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Shifted caption CE over the trailing caption positions, pad-masked
    (reference compute_loss, trainer.py:187-207).

    Accepts either full-sequence logits [B, T, V] or caption-presliced
    logits [B, C−1, V] (the model's ``caption_len=`` fast path, which
    never materializes vocab-width logits for audio positions). The full
    sequence is always ≥ C+2 (audio_bos/eos + audio tokens precede the
    caption), so the shapes are unambiguous."""
    caption_len = input_ids.shape[1]
    if logits.shape[1] == caption_len - 1:
        pred = logits  # pre-sliced to the shifted caption window
    else:
        pred = logits[:, -caption_len:-1, :]  # [B, C-1, V]
    targets = input_ids[:, 1:]
    mask = input_ids_attention_mask[:, 1:].astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        pred.astype(jnp.float32), targets
    )
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class AATTrainer:
    """Audio-adaptive-tokenizer trainer (un-segmented + segmented paths)."""

    def __init__(
        self,
        model: AslmModel,
        params: Any,
        config: TrainingConfig,
        mesh=None,
        compute_metrics: Optional[Callable] = None,
        log_fn: Optional[Callable[[Dict[str, float]], None]] = None,
        tokenizer=None,
        generation_config=None,
    ):
        self.model = model
        self.config = config
        self.tokenizer = tokenizer
        self.generation_config = generation_config
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh(
            config.mesh_dp, config.mesh_fsdp, config.mesh_tp, config.mesh_sp,
            config.mesh_pp,
        )
        sp_n = self.mesh.shape.get("sp", 1)
        pp_n = self.mesh.shape.get("pp", 1)
        assert sp_n == 1 or pp_n == 1, \
            "mesh_sp and mesh_pp are mutually exclusive (nested shard_map)"
        # This trainer OWNS the model configs' sp/pp routing: set the mesh
        # when the axis is active and CLEAR any stale mesh a previous
        # trainer left behind (a model reused across trainers must not keep
        # routing through a dead mesh).
        aud_cfg = getattr(model, "audio_encoder_config", None)
        if hasattr(aud_cfg, "sp_mesh"):
            model.audio_encoder_config = aud_cfg = dataclasses.replace(
                aud_cfg, sp_mesh=self.mesh if sp_n > 1 else None)
        if hasattr(aud_cfg, "pp_mesh"):
            model.audio_encoder_config = dataclasses.replace(
                aud_cfg, pp_mesh=self.mesh if pp_n > 1 else None,
                pp_microbatches=config.pp_microbatches)
        lm_cfg_ = getattr(model, "lm_config", None)
        if hasattr(lm_cfg_, "pp_mesh"):
            # decoder stack too (training forward; decode keeps the plain
            # loop — models/llama.py)
            model.lm_config = dataclasses.replace(
                lm_cfg_, pp_mesh=self.mesh if pp_n > 1 else None,
                pp_microbatches=config.pp_microbatches)
        self._stacked_tp = None
        if pp_n > 1:
            # stage-resident masters: the pipelined stacks (encoder/decoder
            # "layers") switch to the stacked [L, ...] layout BEFORE the
            # freeze mask / optimizer / placement are built, so params,
            # grads, Adam moments, and checkpoints all live sharded P('pp')
            # (one layer-slice per stage — parallel/pipeline.py) and
            # gpipe_apply consumes them with zero per-step resharding.
            from aat_tpu.parallel.pipeline import stack_model_layers

            params = dict(params)
            if isinstance(params.get("audio_encoder"), dict):
                params["audio_encoder"] = stack_model_layers(
                    params["audio_encoder"])
            if isinstance(params.get("lm_decoder"), dict):
                params["lm_decoder"] = stack_model_layers(params["lm_decoder"])
            # tp × pp composition: stacks whose widths divide tp ALSO shard
            # Megatron-style over 'tp' (matching the models' tp-aware
            # pipeline bodies — the SAME predicates gate both sides)
            tp_n = self.mesh.shape.get("tp", 1)
            from aat_tpu.models import hubert as _hub
            from aat_tpu.models import llama as _llm

            self._stacked_tp = {
                "audio_encoder": (
                    hasattr(aud_cfg, "num_attention_heads")
                    and _hub.tp_partitionable(
                        model.audio_encoder_config, tp_n)),
                "lm_decoder": _llm.tp_partitionable(model.lm_config, tp_n),
            }
        self.compute_metrics = compute_metrics
        self.log_fn = log_fn or (lambda metrics: logger.info("metrics %s", metrics))

        # learning_rate=None → Adafactor relative-step mode (fairseq
        # default, reference optimizers.py:34-35): no external schedule
        self.schedule = None if config.learning_rate is None else warmup_linear_schedule(
            config.learning_rate,
            config.warmup_steps,
            config.max_steps or 100000,
            config.start_lr_from,
        )
        self.freeze = optim_lib.trainable_mask(
            params,
            train_audio_encoder=config.train_audio_encoder,
            train_lm_decoder=config.train_lm_decoder,
        )
        self.tx = self._build_tx(params)

        params = mesh_lib.place_params(params, self.mesh, self._stacked_tp)
        self.state = TrainState(0, params, self.tx.init(params))
        # load_best_model_at_end bookkeeping (reference trainer.py:63)
        self._best_metric: Optional[float] = None
        self._best_checkpoint: Optional[str] = None

        self._grad_step = jax.jit(self._make_grad_step())
        self._apply_step = jax.jit(self._make_apply_step(), donate_argnums=(0, 1))
        self._eval_step = jax.jit(self._make_eval_step())
        self._prefix_step = jax.jit(self._prefix_inputs)
        # fused path: grad-accum scan + optimizer update in ONE dispatch —
        # on a remoted TPU backend every jitted call pays a relay round
        # trip, so a step of A microbatches costs A+1 dispatches on the
        # loop path but 1 here (plus the per-microbatch eager fold_ins the
        # loop pays for dropout keys)
        self._fused_step = jax.jit(self._make_fused_step(), donate_argnums=(0, 1))
        self._fused_step1 = jax.jit(self._make_fused_step1(), donate_argnums=(0, 1))
        # train-mode dropout: one base key, folded with (step, microbatch)
        # per grad step; eval/generation never pass a key (deterministic)
        self._dropout_base = jax.random.PRNGKey(config.seed)
        # lazily jitted EfficientNet BN running-stat EMA fold (melspec path)
        self._bn_fold = None

    def _build_tx(self, params):
        cfg = self.config
        # When the guard is on, global-norm clipping folds into the guard's
        # own norm pass (one grad-tree read instead of two plus a scale
        # pass — optim.guard_nonfinite); frozen subtrees carry exactly-zero
        # grads (stop_gradient), so the full-tree norm equals the
        # trainable-only norm the in-chain clip would compute.
        fold_clip = cfg.skip_nonfinite_updates and cfg.optimizer == "adamw"
        if cfg.optimizer == "adamw" and cfg.skip_nonfinite_updates:
            # single-pass fused AdamW+guard: one elementwise kernel per leaf
            # (28 B/param HBM roofline) + one shared global-norm pass,
            # value-identical to the chain below (optim.fused_guarded_adamw;
            # the chain + guard blends measured 14.5 + 9.6 ms of an 83 ms
            # flagship step)
            return optim_lib.fused_guarded_adamw(
                self.schedule, params,
                weight_decay=cfg.weight_decay,
                clip_norm=cfg.grad_clip_norm,
                freeze=self.freeze,
            )
        if cfg.optimizer == "adamw":
            tx = optim_lib.adamw_grouped(
                self.schedule, params,
                weight_decay=cfg.weight_decay,
                grad_clip_norm=None if fold_clip else cfg.grad_clip_norm,
                freeze=self.freeze,
            )
        elif cfg.optimizer == "adafactor":
            tx = optim_lib.adafactor(self.schedule, freeze=self.freeze)
        else:
            raise ValueError(f"unknown optimizer {cfg.optimizer}")
        if cfg.skip_nonfinite_updates:
            # in-graph guard: a non-finite grad tree produces a zero update
            # and leaves inner optimizer state untouched — every step is
            # protected without a host fetch (the old host-side check only
            # covered logging steps). Cond-free variant: optax's
            # apply_if_finite cost 22 ms/step at flagship scale (see
            # optim.guard_nonfinite).
            tx = optim_lib.guard_nonfinite(
                tx, clip_norm=cfg.grad_clip_norm if fold_clip else None)
        return tx

    # ------------------------------------------------------------------
    # Forward assembly (segmented + whole-utterance), shared by train/eval
    # ------------------------------------------------------------------

    def _cast_for_compute(self, params):
        """Mixed precision: master params stay f32; forward/backward run with
        bf16 params+activations (grads flow back through the cast)."""
        if self.config.compute_dtype != "bfloat16":
            return params
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )

    def _segment_on_device(self, batch):
        """On-TPU datagen (north-star config 5): raw padded waveforms →
        adaptive segmentation → dense segment batch, all inside the step's
        jit — zero host round-trips (shared helper: data/ondevice.py)."""
        from aat_tpu.data.ondevice import segment_raw_batch

        return segment_raw_batch(
            batch,
            segmentation=self.config.segmentation,
            max_segment_frames=self.config.max_segment_frames,
            max_segments=self.config.max_on_device_segments,
            sampling_rate=self.config.sampling_rate,
            tokenizer_config=getattr(self, "tokenizer_config", None),
        )

    def _stop_grad_frozen(self, params):
        """Reference no_grad semantics for frozen submodules
        (trainer.py:118-125, trainer_train.py:258-262): stop_gradient makes
        XLA skip the frozen subtrees' parameter-gradient computation
        entirely (activation gradients still flow through them); the
        optimizer freeze mask remains the correctness guard."""
        p = dict(params)
        if not self.config.train_audio_encoder:
            p["audio_encoder"] = jax.lax.stop_gradient(params["audio_encoder"])
        if not self.config.train_lm_decoder:
            p["lm_decoder"] = jax.lax.stop_gradient(params["lm_decoder"])
        return p

    def _assemble_and_forward(self, params, batch, dropout_rng=None, train=False):
        """→ (logits, inputs, bn_stats). ``bn_stats`` is ``{}`` except on
        the EfficientNet path with ``train=True``, where it carries the
        batch BN statistics for the running-stat EMA (torch ``.train()``
        batch-norm semantics — the reference's HF Trainer keeps the model
        in train mode, so BN uses batch stats during training)."""
        model = self.model
        compute_dtype = jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32
        params = self._cast_for_compute(self._stop_grad_frozen(params))
        k_enc = k_proj = None
        if dropout_rng is not None:
            k_enc, k_proj = jax.random.split(dropout_rng)
        bn_stats = {}

        if "raw_waveforms" in batch:
            batch = self._segment_on_device(batch)

        if "batched_segments_melspectrograms" in batch:
            # EfficientNet path (reference AATTrainerSegmentation melspec
            # branch, trainer.py:676-683): [B, S, n_mels, T] → [B*S, ...]
            mels = batch["batched_segments_melspectrograms"]
            b, s = mels.shape[:2]
            seg_mask = batch["segments_boarders_attention_mask"].reshape(b * s)
            if train:
                audio_embeds, frame_mask, bn_stats = model.encode_audio_melspec(
                    params, mels.reshape(b * s, *mels.shape[2:]).astype(compute_dtype),
                    seg_mask, train=True,
                )
            else:
                audio_embeds, frame_mask = model.encode_audio_melspec(
                    params, mels.reshape(b * s, *mels.shape[2:]).astype(compute_dtype),
                    seg_mask,
                )
            segments_count = s
        elif "batched_segments" in batch:
            # segmented path (reference AATTrainerSegmentation :663-730):
            # flatten [B, S, F] → [B*S, F]
            seg = batch["batched_segments"]
            b, s, f = seg.shape
            waveforms = seg.reshape(b * s, f)
            wf_mask = batch["segments_waveforms_mask"].reshape(b * s, f)
            seg_mask = batch["segments_boarders_attention_mask"].reshape(b * s)
            segments_count = s
            audio_embeds, frame_mask = model.encode_audio(
                params, waveforms.astype(compute_dtype), wf_mask, seg_mask,
                dropout_rng=k_enc,
            )
        else:
            # whole-utterance path (reference AATTrainer :127-173)
            audio_embeds, frame_mask = model.encode_audio(
                params,
                batch["waveforms"].astype(compute_dtype),
                batch["waveforms_attention_mask"],
                None,
                dropout_rng=k_enc,
            )
            segments_count = None
        inputs = model.prepare_audio_inputs(
            params,
            audio_embeds=audio_embeds,
            frame_mask=frame_mask,
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            segments_count=segments_count,
            dropout_rng=k_proj,
        )
        logits = model.forward(params, inputs["inputs_embeds"],
                               inputs["attention_mask"],
                               pack=self.config.lm_pack,
                               caption_len=batch["input_ids"].shape[1])
        return logits, inputs, bn_stats

    def _debug_metrics(self, params, batch, inputs):
        """Reference compute_loss debug block (:209-238), in-graph."""
        embeds = inputs["inputs_embeds"]
        am = inputs["audio_embeds_attention_mask"]
        audio_len = am.shape[-1]
        flat_audio = inputs["audio_embeds"].reshape(-1, embeds.shape[-1])
        audio_m = am.reshape(-1).astype(jnp.float32)
        audio_norms = jnp.linalg.norm(flat_audio.astype(jnp.float32), axis=-1)
        denom_a = jnp.maximum(audio_m.sum(), 1.0)

        text_embeds = embeds[:, audio_len + 2 :, :].astype(jnp.float32)
        text_m = batch["attention_mask"].astype(jnp.float32)
        text_norms = jnp.linalg.norm(text_embeds, axis=-1)
        denom_t = jnp.maximum(text_m.sum(), 1.0)

        emb = params["adapter"]["audio_tokens_embeddings"]["embedding"].astype(jnp.float32)
        return {
            "debug/seq_len": jnp.asarray(inputs["attention_mask"].shape[-1], jnp.float32),
            "debug/audio_embeddings_norm_mean": jnp.sum(audio_norms * audio_m) / denom_a,
            "debug/audio_embeddings_mean": jnp.sum(
                jnp.mean(flat_audio.astype(jnp.float32), axis=-1) * audio_m
            ) / denom_a,
            "debug/text_embeddings_norm_mean": jnp.sum(text_norms * text_m) / denom_t,
            "debug/text_embeddings_mean": jnp.sum(
                jnp.mean(text_embeds, axis=-1) * text_m
            ) / denom_t,
            "debug/audio_bos_mean": emb[0].mean(),
            "debug/audio_bos_norm": jnp.linalg.norm(emb[0]),
            "debug/audio_eos_mean": emb[1].mean(),
            "debug/audio_eos_norm": jnp.linalg.norm(emb[1]),
        }

    # ------------------------------------------------------------------
    # Jitted steps
    # ------------------------------------------------------------------

    def _make_grad_step(self):
        def grad_step(params, batch, dropout_rng):
            def loss_fn(p):
                logits, inputs, bn_stats = self._assemble_and_forward(
                    p, batch, dropout_rng, train=True
                )
                loss = caption_cross_entropy(
                    logits, batch["input_ids"], batch["input_ids_attention_mask"]
                )
                return loss, (inputs, bn_stats)

            (loss, (inputs, bn_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            metrics = self._debug_metrics(params, batch, inputs)
            metrics["train/loss"] = loss
            # reference training_step grad norms (:242-265)
            metrics["train/audio_tokens_emb_grad"] = optim_lib.global_norm(
                grads["adapter"]["audio_tokens_embeddings"]
            )
            if self.config.train_audio_encoder and "feature_projection" in grads.get(
                "audio_encoder", {}
            ):
                metrics["train/audio_encdoer_grad_norm"] = optim_lib.global_norm(
                    grads["audio_encoder"]["feature_projection"]["projection"]
                )
            return loss, grads, metrics, bn_stats

        return grad_step

    def _make_apply_step(self):
        def apply_step(params, opt_state, grads):
            updates, new_opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt_state

        return apply_step

    def _make_fused_step(self):
        """One optimizer step as a single program: lax.scan over the
        stacked microbatches (grad accumulation), average, tx.update —
        everything the loop path does in A+1 dispatches, in one."""
        grad_step = self._make_grad_step()

        def fused_step(params, opt_state, stacked, step):
            a = jax.tree.leaves(stacked)[0].shape[0]
            has_melspec = "batched_segments_melspectrograms" in stacked
            step_rng = jax.random.fold_in(self._dropout_base, step)

            def one(idx, mb):
                rng = jax.random.fold_in(step_rng, idx)
                _, grads, metrics, bn_stats = grad_step(params, mb, rng)
                return grads, metrics, bn_stats

            def body(carry, xs):
                acc_grads, acc_metrics, ae_bn = carry
                idx, mb = xs
                grads, metrics, bn_stats = one(idx, mb)
                if has_melspec:
                    from aat_tpu.models.efficientnet import apply_bn_updates

                    ae_bn = apply_bn_updates(ae_bn, bn_stats)
                acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                acc_metrics = jax.tree.map(jnp.add, acc_metrics, metrics)
                return (acc_grads, acc_metrics, ae_bn), None

            zero_grads = jax.tree.map(jnp.zeros_like, params)
            # metrics structure (shapes/dtypes only) for the scan init tree
            metrics_shape = jax.eval_shape(
                lambda: one(jnp.int32(0), jax.tree.map(lambda x: x[0], stacked))[1]
            )
            zero_metrics = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), metrics_shape
            )
            bn_init = params["audio_encoder"] if has_melspec else jnp.zeros(())
            (acc_grads, acc_metrics, ae_bn), _ = jax.lax.scan(
                body,
                (zero_grads, zero_metrics, bn_init),
                (jnp.arange(a), stacked),
            )
            if a > 1:
                acc_grads = jax.tree.map(lambda g: g / a, acc_grads)
                acc_metrics = jax.tree.map(lambda m: m / a, acc_metrics)
            updates, new_opt_state = self.tx.update(acc_grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            if has_melspec:
                new_params = _merge_bn_running_stats(new_params, ae_bn)
            return new_params, new_opt_state, acc_metrics

        return fused_step

    def _make_fused_step1(self):
        """Single-microbatch fused step (the accum=1 fast path): no scan, no
        host-side stacking — device-resident batches stay device-resident
        and the whole optimizer step is one dispatch."""
        grad_step = self._make_grad_step()

        def fused_step1(params, opt_state, mb, step):
            rng = jax.random.fold_in(
                jax.random.fold_in(self._dropout_base, step), 0
            )
            _, grads, metrics, bn_stats = grad_step(params, mb, rng)
            updates, new_opt_state = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            if bn_stats:
                from aat_tpu.models.efficientnet import apply_bn_updates

                ae_bn = apply_bn_updates(params["audio_encoder"], bn_stats)
                new_params = _merge_bn_running_stats(new_params, ae_bn)
            return new_params, new_opt_state, metrics

        return fused_step1

    def _fold_bn_stats(self, ae_params, stats_seq):
        """EMA each microbatch's EfficientNet batch-norm statistics into the
        running estimates, in order (torch updates running stats once per
        train-mode forward). Jitted: ~100 per-channel EMAs per microbatch
        would otherwise each pay a dispatch round-trip."""
        if self._bn_fold is None:
            from aat_tpu.models.efficientnet import apply_bn_updates

            def fold(ae, seq):
                for s in seq:
                    ae = apply_bn_updates(ae, s)
                return ae

            self._bn_fold = jax.jit(fold)
        return self._bn_fold(ae_params, stats_seq)

    def _make_eval_step(self):
        def eval_step(params, batch):
            logits, inputs, _ = self._assemble_and_forward(params, batch)
            loss = caption_cross_entropy(
                logits, batch["input_ids"], batch["input_ids_attention_mask"]
            )
            return loss, logits

        return eval_step

    # ------------------------------------------------------------------
    # Loops
    # ------------------------------------------------------------------

    def _shard_batch(self, batch):
        sharding = mesh_lib.batch_sharding(self.mesh)
        multihost = jax.process_count() > 1
        out = {}
        for k, v in batch.items():
            if v is None or k == "segments_count":
                continue
            if isinstance(v, jax.Array):
                # already device-resident (steady-state pipelines pre-shard);
                # np.asarray here would round-trip through the host relay
                out[k] = v if v.ndim == 0 else jax.device_put(v, sharding)
                continue
            arr = np.asarray(v)
            if arr.ndim == 0:
                out[k] = arr
            elif multihost:
                # each process holds its LOCAL slice of the global batch
                # (the dataloader shards by process, data/dataloaders.py);
                # assemble the global array from per-process shards without
                # gathering through any single host
                out[k] = jax.make_array_from_process_local_data(sharding, arr)
            else:
                out[k] = jax.device_put(arr, sharding)
        return out

    def _stack_microbatches(self, microbatches):
        """[A microbatch dicts] → one stacked dict [A, ...] for the fused
        step, or None when keys/shapes are ragged across microbatches
        (falls back to the per-microbatch dispatch loop)."""
        cleaned = []
        for mb in microbatches:
            if any(isinstance(v, jax.Array) for v in mb.values()):
                # device-resident microbatches: stacking would round-trip
                # through the host; use the per-microbatch loop instead
                return None
            cleaned.append({
                k: np.asarray(v) for k, v in mb.items()
                if v is not None and k != "segments_count"
            })
        keys = set(cleaned[0])
        if any(set(d) != keys for d in cleaned):
            return None
        for k in keys:
            if len({d[k].shape for d in cleaned}) != 1:
                return None
        stacked_sh = mesh_lib.stacked_batch_sharding(self.mesh)
        repl = mesh_lib.replicated(self.mesh)
        multihost = jax.process_count() > 1
        out = {}
        for k in keys:
            arr = np.stack([d[k] for d in cleaned])
            sh = stacked_sh if arr.ndim > 1 else repl
            if multihost:
                # arr is this process's LOCAL slice of the global batch —
                # device_put would misread it as the global array
                out[k] = jax.make_array_from_process_local_data(sh, arr)
            else:
                out[k] = jax.device_put(arr, sh)
        return out

    def training_step(
        self, microbatches: List[dict], fetch_metrics: bool = True
    ) -> Dict[str, float]:
        """One optimizer step over ``gradient_accumulation_steps``
        microbatches. Returns host metrics when ``fetch_metrics`` (a device
        sync — pass False on non-logging steps to keep the device pipeline
        full). Non-finite grads are dropped in-graph on EVERY step via
        ``optim.guard_nonfinite`` (when ``skip_nonfinite_updates``).

        Uniform-shape microbatches take the fused path: the whole step
        (grad-accum scan + optimizer update) is one program and one
        dispatch. Ragged microbatches fall back to a per-microbatch loop.
        """
        if len(microbatches) == 1:
            mb = self._shard_batch(microbatches[0])
            new_params, new_opt, acc_metrics = self._fused_step1(
                self.state.params, self.state.opt_state, mb, self.state.step
            )
            self.state = TrainState(self.state.step + 1, new_params, new_opt)
            return self._finish_metrics(acc_metrics, fetch_metrics)

        stacked = self._stack_microbatches(microbatches)
        if stacked is not None:
            new_params, new_opt, acc_metrics = self._fused_step(
                self.state.params, self.state.opt_state, stacked, self.state.step
            )
            self.state = TrainState(self.state.step + 1, new_params, new_opt)
            return self._finish_metrics(acc_metrics, fetch_metrics)

        acc_grads = None
        acc_metrics = None
        bn_stats_seq = []
        for idx, mb in enumerate(microbatches):
            mb = self._shard_batch(mb)
            rng = jax.random.fold_in(
                jax.random.fold_in(self._dropout_base, self.state.step), idx
            )
            loss, grads, metrics, bn_stats = self._grad_step(self.state.params, mb, rng)
            if bn_stats:
                bn_stats_seq.append(bn_stats)
            if acc_grads is None:
                acc_grads, acc_metrics = grads, metrics
            else:
                acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                acc_metrics = jax.tree.map(jnp.add, acc_metrics, metrics)
        n = len(microbatches)
        if n > 1:
            acc_grads = jax.tree.map(lambda g: g / n, acc_grads)
            acc_metrics = jax.tree.map(lambda m: m / n, acc_metrics)
        new_params, new_opt = self._apply_step(
            self.state.params, self.state.opt_state, acc_grads
        )
        if bn_stats_seq:
            # torch BN updates running stats on every train-mode forward;
            # fold each microbatch's batch stats into the EMA in order
            new_params = dict(new_params)
            new_params["audio_encoder"] = self._fold_bn_stats(
                new_params["audio_encoder"], tuple(bn_stats_seq)
            )
        self.state = TrainState(self.state.step + 1, new_params, new_opt)
        return self._finish_metrics(acc_metrics, fetch_metrics)

    def _finish_metrics(self, acc_metrics, fetch_metrics: bool) -> Dict[str, float]:
        if not fetch_metrics:
            return {}
        # one bulk transfer: per-scalar fetches each pay a full round-trip
        # on remoted backends
        host_metrics = {k: float(v) for k, v in jax.device_get(acc_metrics).items()}
        if self.config.skip_nonfinite_updates:
            host_metrics["train/skipped_nonfinite_total"] = float(
                jax.device_get(self.state.opt_state.total_notfinite)
            )
            if not np.isfinite(host_metrics["train/loss"]):
                logger.warning(
                    "non-finite loss %s at step %d (update dropped in-graph)",
                    host_metrics["train/loss"], self.state.step,
                )
        return host_metrics

    def unfreeze_lm_decoder(self):
        """Enable LM decoder training mid-run (reference
        ``unfreeze_lm_at_epoch``, src/aat/training/config.py:44). Rebuilds
        the freeze mask, initializes optimizer state for the newly trainable
        subtree, and carries over accumulated moments for everything that was
        already training (torch optimizers keep per-param state across a
        requires_grad flip; re-initializing would silently reset Adam
        moments mid-run)."""
        self.config.train_lm_decoder = True
        self.freeze = optim_lib.trainable_mask(
            self.state.params,
            train_audio_encoder=self.config.train_audio_encoder,
            train_lm_decoder=True,
        )
        old_opt_state = self.state.opt_state
        self.tx = self._build_tx(self.state.params)
        fresh = self.tx.init(self.state.params)
        merged = optim_lib.merge_matching_state(old_opt_state, fresh)
        self.state = TrainState(self.state.step, self.state.params, merged)
        self._apply_step = jax.jit(self._make_apply_step(), donate_argnums=(0, 1))
        # the grad/fused steps closed over the old freeze config
        # (stop_gradient on the lm subtree) and the old tx; re-trace so
        # decoder grads flow
        self._grad_step = jax.jit(self._make_grad_step())
        self._fused_step = jax.jit(self._make_fused_step(), donate_argnums=(0, 1))
        self._fused_step1 = jax.jit(self._make_fused_step1(), donate_argnums=(0, 1))
        logger.info("lm decoder unfrozen at step %d", self.state.step)

    def train(
        self,
        train_batches: Iterable[dict],
        eval_batches: Optional[Callable[[], Iterable[dict]]] = None,
        resume_from_checkpoint: Optional[str] = None,
        fast_forward: bool = False,
    ):
        """Run one epoch over ``train_batches``. ``fast_forward`` skips the
        microbatches a checkpoint-restored step count implies were already
        consumed THIS epoch (the entry point handles whole completed epochs
        by skipping epoch iterations and setting the iterator's shuffle
        epoch — HF ``resume_from_checkpoint`` semantics,
        reference trainer_train.py:156-162). ``resume_from_checkpoint``
        restores in-place first, then fast-forwards."""
        cfg = self.config
        skip_micro = 0
        if resume_from_checkpoint:
            self.restore_checkpoint(resume_from_checkpoint)
            fast_forward = True
        if fast_forward:
            # fast-forward past already-consumed microbatches so the resumed
            # run sees the data a fresh run would at this step (HF Trainer's
            # ignore_data_skip=False semantics). Only the within-epoch
            # position is recoverable from step alone.
            if hasattr(train_batches, "__len__") and len(train_batches) > 0:
                # an epoch consumes steps_per_epoch * accum microbatches
                # (the trailing partial accumulation group is discarded), so
                # the within-epoch position is step % steps_per_epoch — a
                # plain consumed % len(batches) drifts whenever accum does
                # not divide the epoch length
                steps_per_epoch = len(train_batches) // cfg.gradient_accumulation_steps
                if steps_per_epoch > 0:
                    skip_micro = (
                        self.state.step % steps_per_epoch
                    ) * cfg.gradient_accumulation_steps
            logger.info("resume: skipping %d microbatches", skip_micro)
        early_stopping = (
            EarlyStopping(cfg.early_stopping_patience, cfg.early_stopping_threshold)
            if cfg.early_stopping_patience
            else None
        )

        micro: List[dict] = []
        last_eval_metric: Optional[float] = None
        last_eval_step: Optional[int] = None
        t_start = time.time()
        for batch in train_batches:
            if skip_micro > 0:
                skip_micro -= 1
                continue
            micro.append(batch)
            if len(micro) < cfg.gradient_accumulation_steps:
                continue
            will_log = (self.state.step + 1) % cfg.logging_steps == 0
            metrics = self.training_step(micro, fetch_metrics=will_log)
            micro = []
            step = self.state.step
            if step % cfg.logging_steps == 0:
                metrics["train/step_time"] = (time.time() - t_start) / cfg.logging_steps
                if self.schedule is not None:
                    metrics["train/lr"] = float(self.schedule(step))
                self.log_fn(metrics)
                t_start = time.time()
            if cfg.eval_steps and step % cfg.eval_steps == 0 and eval_batches is not None:
                eval_metrics = self.evaluate(eval_batches())
                self.log_fn(eval_metrics)
                last_eval_metric = eval_metrics.get(cfg.metric_for_best_model)
                last_eval_step = step
                if early_stopping is not None and early_stopping.should_stop(eval_metrics):
                    logger.info("early stopping at step %d", step)
                    break
            if cfg.save_steps and step % cfg.save_steps == 0:
                # best-model credit only when the metric was measured on
                # THESE weights: a stale metric from an earlier eval step
                # would credit a checkpoint that never achieved it (HF
                # requires save_steps to align with eval_steps for
                # load_best_model_at_end for the same reason)
                fresh_metric = last_eval_metric if last_eval_step == step else None
                path = self.save_checkpoint(metric=fresh_metric)
                self._track_best(path, fresh_metric)
            if cfg.max_steps is not None and step >= cfg.max_steps:
                break
        return self.state

    def _track_best(self, path: str, metric: Optional[float]):
        if metric is None:
            return
        better = self._best_metric is None or (
            metric > self._best_metric
            if self.config.greater_is_better
            else metric < self._best_metric
        )
        if better:
            self._best_metric = metric
            self._best_checkpoint = path

    def finalize(self):
        """End-of-training hook: reload the best checkpoint's params when
        ``load_best_model_at_end`` (reference trainer.py:63). Called by the
        entry point after the last epoch (``train()`` runs one epoch and
        must not reload mid-run). The current step is kept — only the model
        weights roll back, matching HF semantics."""
        if not (self.config.load_best_model_at_end and self._best_checkpoint):
            return
        step = self.state.step
        logger.info(
            "loading best model (%s=%s) from %s",
            self.config.metric_for_best_model, self._best_metric,
            self._best_checkpoint,
        )
        opt_state = self.state.opt_state
        self.restore_checkpoint(self._best_checkpoint, restore_opt_state=False)
        # weights-only rollback: keep the final step AND the final optimizer
        # state so a subsequent save_checkpoint() doesn't stamp mid-run
        # moments with the final step number
        self.state = TrainState(step, self.state.params, opt_state)

    def _prefix_inputs(self, params, batch):
        """Assemble [audio | prefix-text] embeds for generation (reference
        update_eval_set_kwargs_containers, trainer.py:556-566). Dispatched
        jitted (``_prefix_step``): eager HuBERT here would pay one relay
        round-trip per op on the remoted backend."""
        model = self.model
        if "raw_waveforms" in batch:
            # on-device datagen path (north-star config 5): evaluation uses
            # the same raw-waveform batches training consumes (the reference
            # evaluates the training collator's output, trainer.py:554-602)
            batch = self._segment_on_device(batch)
        if "batched_segments_melspectrograms" in batch:
            mels = batch["batched_segments_melspectrograms"]
            b, s = mels.shape[:2]
            audio_embeds, frame_mask = model.encode_audio_melspec(
                params, mels.reshape(b * s, *mels.shape[2:]),
                batch["segments_boarders_attention_mask"].reshape(b * s),
            )
            segments_count = s
        elif "batched_segments" in batch:
            seg = batch["batched_segments"]
            b, s, f = seg.shape
            audio_embeds, frame_mask = model.encode_audio(
                params, seg.reshape(b * s, f),
                batch["segments_waveforms_mask"].reshape(b * s, f),
                batch["segments_boarders_attention_mask"].reshape(b * s),
            )
            segments_count = s
        else:
            audio_embeds, frame_mask = model.encode_audio(
                params, batch["waveforms"], batch["waveforms_attention_mask"]
            )
            segments_count = None
        return model.prepare_audio_inputs(
            params,
            audio_embeds=audio_embeds,
            frame_mask=frame_mask,
            input_ids=batch["prefix_input_ids"],
            attention_mask=batch["prefix_attention_mask"],
            segments_count=segments_count,
        )

    def generate_for_batch(self, batch, max_new_tokens: Optional[int] = None,
                           fetch: bool = True):
        """Beam-3 generation with the reference's eval settings
        (trainer.py:568-597): repetition penalty 2.5, no-repeat-4-gram,
        max_new_tokens bounded by the caption length. ``fetch=False``
        returns the device array (evaluate() fetches all batches at once)."""
        from aat_tpu.training.generate import GenerationConfig, generate

        sb = self._shard_batch(batch)
        inputs = self._prefix_step(self.state.params, sb)
        if max_new_tokens is None:
            # bucket caption length to multiples of 16 to bound recompiles
            max_new_tokens = int(-(-batch["input_ids"].shape[1] // 16) * 16)
        base = self.generation_config
        eos = self.tokenizer.eos_token_id if self.tokenizer is not None else 2
        # reference gen_params (trainer.py:568-580): early_stopping=True,
        # pad_token_id=eos, forced_eos_token_id=eos
        gcfg = GenerationConfig(
            max_new_tokens=max_new_tokens,
            num_beams=base.num_beams if base else 3,
            repetition_penalty=base.repetition_penalty if base else 2.5,
            no_repeat_ngram_size=base.no_repeat_ngram_size if base else 4,
            eos_token_id=eos,
            pad_token_id=eos,
            early_stopping=base.early_stopping if base else True,
            forced_eos_token_id=eos,
        )
        out = generate(
            self.state.params["lm_decoder"], self.model.lm_config,
            inputs["inputs_embeds"], inputs["attention_mask"], gcfg,
        )
        return np.asarray(out) if fetch else out

    def evaluate(
        self, eval_batches: Iterable[dict], with_generation: Optional[bool] = None
    ) -> Dict[str, float]:
        if with_generation is None:
            with_generation = self.compute_metrics is not None
        device_losses = []  # device scalars: fetched ONCE after the loop —
        # a float() per batch would pay a full host sync per eval batch
        # (≥2N round trips on the ~35 ms-RTT remoted backend)
        generated: List[np.ndarray] = []
        references: List[np.ndarray] = []
        prefixes: List[np.ndarray] = []
        multihost = jax.process_count() > 1
        if multihost:
            # eval batches assemble GLOBALLY (each host contributes its
            # dataloader shard via make_array_from_process_local_data in
            # _shard_batch), so every host computes the same global loss and
            # generations — fetching them just needs replication (sharded
            # global arrays are not host-fetchable). No cross-host gather of
            # generations is needed; row alignment with references is by
            # construction. (The reference reaches the same end state via
            # accelerate's gather_for_metrics, trainer.py:365-383,425.)
            from jax.sharding import PartitionSpec

            from jax.sharding import NamedSharding

            _rep = jax.jit(
                lambda x: x,
                out_shardings=NamedSharding(self.mesh, PartitionSpec()),
            )
        for batch in eval_batches:
            sb = self._shard_batch(batch)
            loss, logits = self._eval_step(self.state.params, sb)
            device_losses.append(loss)
            if with_generation:
                gen = self.generate_for_batch(batch, fetch=False)
                if multihost:
                    generated.append(_rep(gen))
                    references.append(np.asarray(_rep(sb["input_ids"])))
                    prefixes.append(np.asarray(_rep(sb["prefix_input_ids"])))
                else:
                    generated.append(gen)
                    references.append(np.asarray(batch["input_ids"]))
                    prefixes.append(np.asarray(batch["prefix_input_ids"]))
        # ONE bulk host transfer for the whole eval pass (losses + all
        # generated ids) instead of ≥2 syncs per batch
        losses, generated = jax.device_get((device_losses, generated))
        losses = [float(x) for x in losses]
        generated = [np.asarray(g) for g in generated]
        metrics = {"eval/loss": float(np.mean(losses)) if losses else float("nan")}
        if multihost:
            # global eval/loss: every host contributes its (sum, count); the
            # reference inherits this reduction from accelerate's
            # gather_for_metrics (trainer.py:365-383,425). With globally
            # assembled batches the contributions are identical, so this is
            # also a cross-host agreement check.
            from jax.experimental.multihost_utils import process_allgather

            sums = process_allgather(
                np.array([np.sum(losses), len(losses)], np.float64)
            )
            total, count = float(sums[:, 0].sum()), float(sums[:, 1].sum())
            metrics["eval/loss"] = total / count if count else float("nan")
        if self.compute_metrics is not None and references:
            def pad_cat(arrays, pad=0):
                width = max(a.shape[1] for a in arrays)
                return np.concatenate([
                    np.pad(a, ((0, 0), (0, width - a.shape[1])), constant_values=pad)
                    for a in arrays
                ])

            gen, refs, prefs = pad_cat(generated), pad_cat(references), pad_cat(prefixes)
            metrics.update(self.compute_metrics(
                generated_ids=gen, inputs_ids=refs, prefix_ids=prefs,
            ))
        return metrics

    # ------------------------------------------------------------------
    # Checkpointing (orbax)
    # ------------------------------------------------------------------

    def _ckpt_dir(self, step: Optional[int] = None) -> str:
        step = self.state.step if step is None else step
        return os.path.join(self.config.output_dir, f"checkpoint-{step}")

    def save_checkpoint(self, path: Optional[str] = None,
                        metric: Optional[float] = None):
        """Full-fidelity checkpoint: params + optimizer state + step (the
        schedule is a pure function of step). The reference inherits this
        from HF Trainer (save_steps / resume_from_checkpoint,
        src/aat/training/trainer.py:58-64). ``metric`` records the latest
        eval metric for load_best_model_at_end bookkeeping."""
        import json

        import orbax.checkpoint as ocp

        path = path or self._ckpt_dir()
        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.join(path, "state"),
            {
                "params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": self.state.step,
            },
            force=True,
        )
        ckptr.wait_until_finished()
        # meta makes the checkpoint self-describing for resume: the freeze
        # flags let a resuming run unfreeze the LM BEFORE restoring, so the
        # optimizer-state template matches and Adam moments restore instead
        # of re-initializing (HF resume_from_checkpoint fidelity)
        meta = {
            "step": self.state.step,
            "train_lm_decoder": self.config.train_lm_decoder,
            "train_audio_encoder": self.config.train_audio_encoder,
        }
        if metric is not None:
            meta[self.config.metric_for_best_model] = metric
        if jax.process_index() == 0:  # single writer on multihost
            with open(os.path.join(path, "trainer_meta.json"), "w") as f:
                json.dump(meta, f)
        self._prune_checkpoints()
        logger.info("saved checkpoint %s", path)
        return path

    def save_pretrained(self, path: str):
        """Adapter/model export filtered by the train flags — frozen
        submodules are omitted, exactly like the reference's filtered
        ``save_pretrained`` (modeling_aslm.py:387-393): the adapter
        (projection + audio BOS/EOS embeddings) always saves; the audio
        encoder / LM decoder only when they were being trained.

        The export is self-describing: a ``config.json`` with the full
        Aslm/encoder/LM configs + tokenizer id is written alongside the
        weights (the reference's ``save_pretrained`` persists a config.json
        via HF ``PreTrainedModel``), so
        :func:`aat_tpu.models.build.load_pretrained` rebuilds the model
        without out-of-band knowledge. Missing (frozen) subtrees rebuild
        from the recorded pretrained checkpoints
        (``_keys_to_ignore_on_load_missing`` semantics)."""
        import json

        import orbax.checkpoint as ocp

        from aat_tpu.models.build import model_config_dict

        from aat_tpu.parallel.pipeline import unstack_model_layers

        keep = {"adapter": self.state.params["adapter"]}
        if self.config.train_audio_encoder:
            keep["audio_encoder"] = self.state.params["audio_encoder"]
        if self.config.train_lm_decoder:
            keep["lm_decoder"] = self.state.params["lm_decoder"]
        # exports always use the interchange layout (per-layer lists) so a
        # pp=1 consumer can load a pipelined run's adapter without knowing
        # about the stage-resident stacked layout
        keep = {k: unstack_model_layers(v) if isinstance(v, dict) else v
                for k, v in keep.items()}
        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.join(path, "state"),
            {"params": keep, "step": self.state.step},
            force=True,
        )
        ckptr.wait_until_finished()
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(
                model_config_dict(self.model, self.config, sorted(keep)), f, indent=2
            )
        logger.info("saved filtered model (%s) to %s", sorted(keep), path)
        return path

    def _prune_checkpoints(self):
        """save_total_limit parity (reference trainer.py:61); the best
        checkpoint is never pruned (HF protects it for
        load_best_model_at_end)."""
        limit = self.config.save_total_limit
        base = self.config.output_dir
        if not limit or not os.path.isdir(base) or jax.process_index() != 0:
            return
        protected = (
            os.path.basename(self._best_checkpoint) if self._best_checkpoint else None
        )
        ckpts = sorted(
            (d for d in os.listdir(base)
             if d.startswith("checkpoint-") and d != protected),
            key=lambda d: int(d.split("-")[-1]),
        )
        for stale in ckpts[:-limit]:
            shutil.rmtree(os.path.join(base, stale), ignore_errors=True)

    def restore_checkpoint(self, path: str, partial: bool = True,
                           restore_opt_state: bool = True):
        """Restore params + optimizer state + step. Falls back to
        params-only checkpoints (optimizer state re-initialized, loudly),
        then to adapter-only checkpoints (``partial=True`` mirrors
        ``_keys_to_ignore_on_load_missing``: restores against freshly built
        encoder/decoder trees)."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        state_path = os.path.join(path, "state")
        opt_state = None
        restored = None
        if restore_opt_state:
            # exact-template fast path: full-fidelity checkpoints restore
            # params + optimizer state with their current shardings/dtypes
            template = {
                "params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": self.state.step,
            }
            try:
                restored = ckptr.restore(state_path, target=template)
                opt_state = restored["opt_state"]
            except Exception:
                restored = None
        if restored is None:
            # structure-agnostic path: target-free restore returns whatever
            # subtree was saved (params-only, adapter-only, filtered
            # save_pretrained exports, or a run with different freeze flags
            # whose opt_state no longer matches). Present params merge into
            # the current tree; optimizer state re-initializes.
            raw = ckptr.restore(state_path)
            saved_params = raw.get("params", {})
            missing = set(self.state.params) - set(saved_params)
            if missing:
                if not partial:
                    raise ValueError(
                        f"checkpoint {path} lacks {sorted(missing)} and "
                        "partial restore is disabled"
                    )
                logger.info(
                    "partial restore: %s kept from the fresh build "
                    "(_keys_to_ignore_on_load_missing semantics)",
                    sorted(missing),
                )
            from aat_tpu.parallel.pipeline import (
                is_stacked, stack_model_layers, unstack_model_layers)

            merged = dict(self.state.params)
            for key, subtree in saved_params.items():
                if key not in merged:
                    raise ValueError(
                        f"checkpoint {path} has unknown param subtree {key!r}"
                    )
                # cross-layout restore: a pp run resuming an interchange
                # (per-layer list) checkpoint stacks it, and vice versa —
                # the merge below is structure-sensitive
                cur = merged[key]
                if (isinstance(cur, dict) and isinstance(subtree, dict)
                        and "layers" in cur and "layers" in subtree):
                    if is_stacked(cur["layers"]) and not is_stacked(
                            subtree["layers"]):
                        subtree = stack_model_layers(dict(subtree))
                    elif not is_stacked(cur["layers"]) and is_stacked(
                            subtree["layers"]):
                        subtree = unstack_model_layers(dict(subtree))
                merged[key] = jax.tree.map(
                    lambda saved, cur: np.asarray(saved).astype(cur.dtype),
                    subtree, merged[key],
                )
            if restore_opt_state:
                logger.warning(
                    "checkpoint %s: optimizer state not restorable; "
                    "re-initializing (Adam moments reset)", path,
                )
            restored = {"params": merged, "step": raw.get("step", 0)}
        params = mesh_lib.place_params(restored["params"], self.mesh,
                                       self._stacked_tp)
        self.state = TrainState(
            int(restored["step"]), params,
            opt_state if opt_state is not None else self.tx.init(params),
        )
        logger.info("restored checkpoint %s at step %d", path, self.state.step)


def read_checkpoint_meta(path: str) -> Dict[str, Any]:
    """Read a checkpoint's trainer_meta.json (step, freeze flags, metric).
    Returns {} for pre-meta checkpoints."""
    import json

    meta_path = os.path.join(os.path.abspath(path), "trainer_meta.json")
    if not os.path.exists(meta_path):
        return {}
    with open(meta_path) as f:
        return json.load(f)


class EarlyStopping:
    """Stop after ``patience`` evals without ``threshold`` improvement
    (the reference constructs HF's EarlyStoppingCallback with these
    semantics but leaves it commented out, trainer_train.py:69-72)."""

    def __init__(self, patience: int, threshold: float = 0.01,
                 metric: str = "eval/loss"):
        self.patience = patience
        self.threshold = threshold
        self.metric = metric
        self.best = float("inf")
        self.strikes = 0

    def should_stop(self, metrics: Dict[str, float]) -> bool:
        value = metrics.get(self.metric)
        if value is None:
            return False
        if value < self.best - self.threshold:
            self.best = value
            self.strikes = 0
        else:
            self.strikes += 1
        return self.strikes >= self.patience


class AATTrainerSegmentation(AATTrainer):
    """Name parity with the reference's segmented trainer
    (trainer.py:663-730); the segmented path is dispatched on batch keys in
    :meth:`AATTrainer._assemble_and_forward`."""
