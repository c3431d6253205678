"""A/B the encode→search device handoff on the live index path.

`VerbatimIndex.query_batch` historically materialized query embeddings on
host between the provider forward and the store search — on a tunneled
backend that is one full round-trip (~31 ms) of pure latency per query
batch, and on any TPU an HBM→host→HBM copy for nothing. The handoff
(`JaxDenseProvider.embed_batch_device` + `JaxSpladeProvider.
embed_query_arrays_device` + array payloads in `DeviceVectorStore.
query_batch`) keeps the whole chain on device: the only host sync left is
the final [B, k] readback.

This benchmark measures single-query and small-batch latency through the
REAL index facade (tokenize → encode → search → materialize results),
handoff ON vs OFF, same process, same arrays, interleaved runs. Corpus
size is kept small on purpose: the device programs are then cheap, so the
delta isolates the sync structure — exactly what the handoff changes.

Run: python benchmarks/bench_handoff.py [--rows 5000 --iters 30]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    # Default matches the corpus size the recorded A/B actually ran at
    # (the old code built --rows//4 docs from a 20k default).
    parser.add_argument("--rows", type=int, default=5_000)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--batch", type=int, default=8)
    args = parser.parse_args()

    from verbatim_rag_tpu.engine.index import VerbatimIndex
    from verbatim_rag_tpu.models.config import minilm_config
    from verbatim_rag_tpu.models.providers import JaxDenseProvider, JaxSpladeProvider

    cfg = minilm_config()
    idx = VerbatimIndex(
        dense_provider=JaxDenseProvider(config=cfg, seed=1, batch_size=64),
        sparse_provider=JaxSpladeProvider(config=cfg, seed=2, batch_size=32),
    )

    rng = np.random.default_rng(7)
    words = [f"term{i}" for i in range(4000)]
    docs = [
        {
            "content": " ".join(rng.choice(words, size=60)),
            "title": f"doc {i}",
        }
        for i in range(args.rows)  # 60-word docs chunk 1:1 — rows == --rows
    ]
    t0 = time.perf_counter()
    idx.add_documents_bulk(docs)
    print(
        json.dumps(
            {
                "metric": "handoff_corpus_build_s",
                "value": round(time.perf_counter() - t0, 1),
                "rows": idx.store.count(),
            }
        ),
        flush=True,
    )

    queries = [" ".join(rng.choice(words, size=8)) for _ in range(args.iters + 5)]

    def run(handoff: bool, batch: int) -> dict:
        os.environ["VERBATIM_DEVICE_HANDOFF"] = "1" if handoff else "0"
        # Warm both compiled paths on queries not timed below.
        for q in queries[: 3 if batch == 1 else 1]:
            idx.query_batch([q] * batch, k=5)
        lats = []
        for i in range(args.iters):
            qs = [queries[5 + i]] * batch
            t0 = time.perf_counter()
            idx.query_batch(qs, k=5)
            lats.append((time.perf_counter() - t0) * 1000)
        return {
            "p50_ms": round(float(np.median(lats)), 2),
            "best_ms": round(float(np.min(lats)), 2),
        }

    for batch in (1, args.batch):
        # Interleave OFF/ON/OFF to expose environment drift inside the A/B.
        off1 = run(False, batch)
        on = run(True, batch)
        off2 = run(False, batch)
        print(
            json.dumps(
                {
                    "metric": f"query_e2e_b{batch}",
                    "unit": "ms",
                    "handoff_off": off1,
                    "handoff_on": on,
                    "handoff_off_again": off2,
                    "speedup_p50": round(
                        min(off1["p50_ms"], off2["p50_ms"]) / on["p50_ms"], 3
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
