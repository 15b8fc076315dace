"""Speech-to-text serving demo: continuous-batching ASLM decode.

Loads a self-describing export (AATTrainer.save_pretrained), segments each
utterance on-device (adaptive amplitude tokenizer), encodes segments with
the audio encoder, and decodes captions through the continuous-batching
engine — requests of different lengths share one static KV-cache pool.

    python scripts/serve.py --model-dir <export> --audio a.npy b.npy
    python scripts/serve.py --model-dir <export> --random-demo 4

Audio inputs: .npy (float waveform at 16 kHz) or .wav (PCM, scipy reader).
Without a readable tokenizer (zero-egress environments) transcripts print
as token ids. The reference has no serving entry point (SURVEY §1).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_waveform(path: str, sampling_rate: int) -> np.ndarray:
    if path.endswith(".npy"):
        w = np.load(path)
    elif path.endswith(".wav"):
        from scipy.io import wavfile

        sr, w = wavfile.read(path)
        assert sr == sampling_rate, (sr, sampling_rate)
        if w.dtype.kind == "i":
            w = w.astype(np.float32) / np.iinfo(w.dtype).max
    else:
        raise ValueError(f"unsupported audio format: {path}")
    return np.asarray(w, np.float32).reshape(-1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--audio", nargs="*", default=[])
    ap.add_argument("--random-demo", type=int, default=0,
                    help="serve N synthetic utterances (no audio files)")
    ap.add_argument("--max-slots", type=int, default=4)
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--max-segments", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=8,
                    help="decode steps per dispatch (run_steps)")
    ap.add_argument("--sampling-rate", type=int, default=16000)
    ap.add_argument("--max-segment-frames", type=int, default=4000,
                    help="250 ms at 16 kHz (reference max_segment_frames)")
    ap.add_argument("--eos-token-id", type=int, default=2,
                    help="fallback when the tokenizer is unreachable")
    args = ap.parse_args(argv)

    from aat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from aat_tpu.data.ondevice import segment_raw_batch
    from aat_tpu.models.build import load_pretrained
    from aat_tpu.serving import DecodeEngine, EngineConfig, encode_speech_request

    model, params = load_pretrained(args.model_dir)
    params = jax.device_put(params)
    with open(os.path.join(args.model_dir, "config.json")) as f:
        desc = json.load(f)

    tokenizer = None
    try:  # decode ids → text when the tokenizer is reachable
        from transformers import AutoTokenizer

        # local_files_only: a cached tokenizer loads instantly; a network
        # fetch in a zero-egress environment would spin through retries
        tokenizer = AutoTokenizer.from_pretrained(
            desc["lm_pretrained_model"], local_files_only=True)
    except Exception as exc:  # noqa: BLE001 — zero-egress: ids-only output
        print(f"# tokenizer unavailable ({type(exc).__name__}); printing ids",
              file=sys.stderr)

    if args.random_demo:
        rng = np.random.default_rng(0)
        waves = [
            rng.normal(0, 0.3, rng.integers(args.sampling_rate,
                                            3 * args.sampling_rate))
            .astype(np.float32)
            for _ in range(args.random_demo)
        ]
        names = [f"demo-{i}" for i in range(args.random_demo)]
    else:
        waves = [load_waveform(p, args.sampling_rate) for p in args.audio]
        names = list(args.audio)
    if not waves:
        ap.error("provide --audio files or --random-demo N")

    max_frames = args.max_segment_frames

    @jax.jit
    def build_prefix(params, waveform, length):
        # params as an ARGUMENT: captured device arrays would be inlined as
        # jit constants (a host round-trip per compile on this backend)
        batch = segment_raw_batch(
            {"raw_waveforms": waveform[None], "raw_lengths": length[None]},
            segmentation="adaptive",
            max_segment_frames=max_frames,
            max_segments=args.max_segments,
            sampling_rate=args.sampling_rate,
        )
        return encode_speech_request(model, params, batch)

    pad_to = max(w.size for w in waves)
    pad_to = -(-pad_to // 16000) * 16000  # whole-second padding buckets

    def prefix_for(i):
        w = np.zeros((pad_to,), np.float32)
        w[: waves[i].size] = waves[i]
        return build_prefix(
            params, jnp.asarray(w), jnp.asarray(waves[i].size, jnp.int32))

    # the prefix length is static (max_segments × encoder frames per
    # segment ÷ projection seq_len + audio BOS/EOS) but depends on the
    # encoder's frame rate — size the engine's slot layout from the first
    # built prefix instead of re-deriving the conv arithmetic here
    first = prefix_for(0)
    engine = DecodeEngine(params["lm_decoder"], model.lm_config, EngineConfig(
        max_slots=args.max_slots,
        max_prefill_len=int(first[0].shape[0]),
        max_new_tokens=args.max_new_tokens,
        eos_token_id=(tokenizer.eos_token_id if tokenizer is not None
                      else args.eos_token_id),
    ))

    pending = list(range(len(waves)))
    req_of_slot, results = {}, {}
    prefix_cache = {0: first}

    def submit_next():
        while pending and engine.free_slots:
            i = pending[0]
            embeds, mask = prefix_cache.pop(i, None) or prefix_for(i)
            slot = engine.submit(embeds, mask)
            req_of_slot[slot] = pending.pop(0)

    submit_next()
    while len(results) < len(waves):
        for slot in engine.run_steps(args.chunk):
            ids = engine.result(slot)
            results[req_of_slot.pop(slot)] = ids
            submit_next()

    for i, name in enumerate(names):
        ids = results[i].tolist()
        if tokenizer is not None:
            eos = tokenizer.eos_token_id
            ids_cut = ids[: ids.index(eos)] if eos in ids else ids
            text = tokenizer.decode(ids_cut, skip_special_tokens=True)
            print(json.dumps({"audio": name, "text": text}))
        else:
            print(json.dumps({"audio": name, "ids": ids}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
