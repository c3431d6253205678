"""Projection-dimension / rescore-depth recall sweep.

Produces the candidate-recall table that motivated the production defaults
(`DeviceVectorStore(projection_dim=768, rescore_depth=256)`). Run on CPU:

    JAX_PLATFORMS=cpu python benchmarks/sweep_projection.py

One JSON line per configuration:
  {"dims": d_p, "depth": C, "regime": flat|skew, "cand_recall_at_10": r}
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from verbatim_rag_tpu.ops.sparse_projected import project_rows, projection_matrix


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=8192)
    parser.add_argument("--vocab", type=int, default=30522)
    parser.add_argument("--nnz", type=int, default=64)
    parser.add_argument("--queries", type=int, default=32)
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    n, vocab, nnz = args.n, args.vocab, args.nnz
    ids = (rng.zipf(1.3, size=(n, nnz)) % (vocab - 1) + 1).astype(np.int32)

    for regime in ("flat", "skew"):
        weights = (
            (rng.random((n, nnz)) + 0.1).astype(np.float32)
            if regime == "flat"
            else (rng.pareto(2.0, size=(n, nnz)) + 0.05).astype(np.float32)
        )
        dense = np.zeros((n, vocab), np.float32)
        for i in range(n):
            np.add.at(dense[i], ids[i], weights[i])
        q = np.zeros((args.queries, vocab), np.float32)
        for b in range(args.queries):
            terms = (rng.zipf(1.3, size=24) % (vocab - 1) + 1).astype(np.int64)
            q[b, terms] = rng.pareto(2.0, size=24) + 0.1
        true_top = np.argsort(-(q @ dense.T), axis=1)[:, :10]

        for d_p in (256, 512, 768):
            proj = projection_matrix(vocab, d_p, seed=0)
            sketches = project_rows(ids, weights, proj)
            approx = (q @ proj) @ sketches.T
            for depth in (64, 128, 256):
                cand = np.argsort(-approx, axis=1)[:, :depth]
                recall = float(
                    np.mean(
                        [
                            len(set(true_top[b]) & set(cand[b])) / 10
                            for b in range(args.queries)
                        ]
                    )
                )
                print(
                    json.dumps(
                        {
                            "dims": d_p,
                            "depth": depth,
                            "regime": regime,
                            "cand_recall_at_10": round(recall, 4),
                        }
                    )
                )


if __name__ == "__main__":
    main()
