"""Bulk-ingest a directory of markdown files (+ optional JSON metadata
sidecars) into the device index — parity with the reference's
`examples/bulk_ingest_markdown.py` (sparse-capable, resumable via
`scripts/process_corpus.py` for the status-file pattern).

Usage: python examples/bulk_ingest_markdown.py DIR --db ./idx [--neural]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from verbatim_rag_tpu.engine import VerbatimIndex
from verbatim_rag_tpu.engine.embedding_providers import (
    HashedBowDenseProvider,
    HashedSparseProvider,
)
from verbatim_rag_tpu.ingestion.schema import DocumentSchema


def iter_documents(directory: Path):
    for md_path in sorted(directory.rglob("*.md")):
        meta_path = md_path.with_suffix(".json")
        metadata = {}
        if meta_path.exists():
            with open(meta_path) as f:
                metadata = json.load(f)
        yield DocumentSchema.from_file(str(md_path), metadata=metadata)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("directory")
    parser.add_argument("--db", default="./bulk_index")
    parser.add_argument("--neural", action="store_true")
    parser.add_argument("--chunk-batch", type=int, default=2000)
    args = parser.parse_args()

    if args.neural:
        from verbatim_rag_tpu.models.providers import JaxDenseProvider, JaxSpladeProvider

        dense, sparse = JaxDenseProvider(), JaxSpladeProvider()
    else:
        dense, sparse = HashedBowDenseProvider(), HashedSparseProvider()

    index = VerbatimIndex(dense_provider=dense, sparse_provider=sparse, db_path=args.db)
    ids = index.add_documents_bulk(
        iter_documents(Path(args.directory)), chunk_batch_size=args.chunk_batch
    )
    index.save(args.db)
    print(f"Ingested {len(ids)} documents → {args.db}")
    print(index.inspect())


if __name__ == "__main__":
    main()
