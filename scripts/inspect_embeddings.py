"""Print mean/norm of saved mean-pooled segment embeddings (debug).

Parity: /root/reference/scripts/inspect_hubert_embeddings.py:1-10 (minus its
breakpoint()).

Usage: python scripts/inspect_embeddings.py --embeddings <dir> [--limit N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--embeddings", default="data/audio_embeddings_mean_tokenized")
    parser.add_argument("--limit", type=int, default=10)
    args = parser.parse_args()

    for name in sorted(os.listdir(args.embeddings))[: args.limit]:
        emb = np.load(os.path.join(args.embeddings, name))
        print(f"{name}: shape {emb.shape} mean {emb.mean():.6f} "
              f"norm {np.linalg.norm(emb, axis=-1).mean():.4f}")


if __name__ == "__main__":
    main()
