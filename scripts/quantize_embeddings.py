"""Codebook quantization of segment embeddings (BASELINE config 4).

Learns a codebook over mean-pooled segment embeddings with on-device EMA
k-means (aat_tpu.ops.vq), then emits discrete audio-token ids per utterance.
The reference only gestures at this capability (speechtokenizer imported,
never used — scripts/trainer_train.py:27); here it is a working pipeline.

Usage:
    python scripts/quantize_embeddings.py --embeddings <dir of .npy [1,S,E]> \
        --out <dir> [--codes 1024] [--iters 50]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--embeddings", default="data/audio_embeddings_mean_tokenized")
    parser.add_argument("--out", default="data/audio_tokens")
    parser.add_argument("--codes", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--decay", type=float, default=0.8)
    parser.add_argument("--use-pallas", action="store_true", default=True)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from aat_tpu.ops import vq
    from aat_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    files = sorted(f for f in os.listdir(args.embeddings) if f.endswith(".npy"))
    if not files:
        raise SystemExit(f"no .npy embeddings under {args.embeddings}")
    per_file = []
    for name in files:
        emb = np.load(os.path.join(args.embeddings, name))  # [1, S, E]
        per_file.append(np.asarray(emb).reshape(-1, emb.shape[-1]))
    all_embeddings = jax.device_put(
        np.concatenate(per_file).astype(np.float32)
    )
    print(f"{len(files)} files, {all_embeddings.shape[0]} segment embeddings, "
          f"dim {all_embeddings.shape[1]}")

    # EMA k-means, codebook seeded from data
    n = all_embeddings.shape[0]
    seed_idx = np.random.default_rng(0).choice(n, size=min(args.codes, n), replace=False)
    codebook = jnp.asarray(np.asarray(all_embeddings)[seed_idx])
    if codebook.shape[0] < args.codes:
        pad = jnp.tile(codebook[:1], (args.codes - codebook.shape[0], 1))
        codebook = jnp.concatenate([codebook, pad])
    state = vq.VQState(codebook, jnp.ones((args.codes,)), codebook)

    assign = vq.nearest_codebook_pallas if args.use_pallas else vq.nearest_codebook
    for it in range(args.iters):
        idx, quant = assign(all_embeddings, state.codebook)
        state = vq.vq_ema_update(state, all_embeddings, idx, decay=args.decay)
        if (it + 1) % 10 == 0 or it == 0:
            mse = float(jnp.mean(jnp.sum((all_embeddings - quant) ** 2, -1)))
            used = int(jnp.sum(jnp.bincount(idx, length=args.codes) > 0))
            print(f"iter {it + 1}: reconstruction MSE {mse:.4f}, "
                  f"codes used {used}/{args.codes}")

    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "codebook.npy"), np.asarray(state.codebook))
    offset = 0
    for name, emb in zip(files, per_file):
        ids, _ = assign(jnp.asarray(emb), state.codebook)
        np.save(os.path.join(args.out, name.replace(".npy", ".tokens.npy")),
                np.asarray(ids, np.int32))
        offset += emb.shape[0]
    print(f"wrote codebook + {len(files)} token files to {args.out}")


if __name__ == "__main__":
    main()
