"""Ingest throughput: chunk → neural encode (dense + SPLADE) → device index.

Uses the repository's own source/docs as a real-text corpus (no network).
Prints one JSON line per phase:

  {"metric": "ingest_chunks_per_s", ...}   full pipeline, neural providers
  {"metric": "encode_only_chunks_per_s", ...}

Run: python benchmarks/bench_ingest.py [--repeat 8]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--repeat", type=int, default=8, help="corpus multiplier")
    parser.add_argument("--max-length", type=int, default=256)
    args = parser.parse_args()

    from verbatim_rag_tpu.utils.jax_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    from verbatim_rag_tpu.engine.index import VerbatimIndex
    from verbatim_rag_tpu.ingestion.schema import DocumentSchema
    from verbatim_rag_tpu.models.providers import JaxDenseProvider, JaxSpladeProvider

    root = Path(__file__).parent.parent
    docs = []
    for i in range(args.repeat):
        for path in sorted(root.rglob("*.md")) + sorted(
            (root / "verbatim_rag_tpu").rglob("*.py")
        ):
            text = path.read_text(encoding="utf-8", errors="ignore")
            if text.strip():
                docs.append(
                    DocumentSchema(
                        content=text, title=f"{path.name}#{i}", source=str(path)
                    )
                )

    dense = JaxDenseProvider(max_length=args.max_length, batch_size=64)
    sparse = JaxSpladeProvider(max_length=args.max_length, batch_size=32, max_nnz=64)
    index = VerbatimIndex(dense_provider=dense, sparse_provider=sparse)

    # Warm the compiles with a tiny probe (excluded from timing).
    index.add_documents([{"content": "warmup text for the encoders", "title": "w"}])

    start = time.perf_counter()
    index.add_documents_bulk(docs, chunk_batch_size=2000)
    elapsed = time.perf_counter() - start
    n_chunks = index.inspect()["num_chunks"]
    print(
        json.dumps(
            {
                "metric": "ingest_chunks_per_s",
                "value": round(n_chunks / elapsed, 1),
                "unit": "chunks/s",
                "n_chunks": n_chunks,
                "n_docs": len(docs),
                "elapsed_s": round(elapsed, 1),
            }
        ),
        flush=True,
    )

    # Encode-only throughput on the same text (isolates the device share).
    # Tokenizer memo cleared first: steady-state encode pays tokenization.
    from verbatim_rag_tpu.models.tokenizer import HashTokenizer

    chunks = [h.enhanced_text for h in index.get_all_chunks(limit=2000)]
    HashTokenizer._text_cache.clear()
    start = time.perf_counter()
    dense.embed_batch(chunks)
    sparse.embed_batch(chunks)
    elapsed = time.perf_counter() - start
    print(
        json.dumps(
            {
                "metric": "encode_only_chunks_per_s",
                "value": round(len(chunks) / elapsed, 1),
                "unit": "chunks/s",
                "n_chunks": len(chunks),
            }
        ),
        flush=True,
    )

    # Steady-state e2e: a long-lived ingest service has every program warm
    # (in-memory jit cache) and pre-sizes its store. Honest accounting: the
    # tokenizer memo is cleared (new corpora are new text) and the timed
    # pass re-runs the FULL pipeline on a fresh index. The first pass above
    # stays as the cold number (it pays persistent-cache executable loads,
    # ~0.3 s apiece on this host, and geometric store growth).
    HashTokenizer._text_cache.clear()
    docs2 = [
        DocumentSchema(content=d.content, title=f"{d.title}~warm", source=d.source)
        for d in docs
    ]
    index2 = VerbatimIndex(dense_provider=dense, sparse_provider=sparse)
    index2.store.reserve(n_chunks + 8)
    # One probe doc warms the full-capacity flush shapes outside the timer.
    index2.add_documents([{"content": "warm probe", "title": "p"}])
    start = time.perf_counter()
    index2.add_documents_bulk(docs2, chunk_batch_size=2000)
    elapsed = time.perf_counter() - start
    n2 = index2.inspect()["num_chunks"] - 1
    print(
        json.dumps(
            {
                "metric": "ingest_chunks_per_s_warm",
                "value": round(n2 / elapsed, 1),
                "unit": "chunks/s",
                "n_chunks": n2,
                "elapsed_s": round(elapsed, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
