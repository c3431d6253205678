"""Bulk corpus ingestion with status-file resume.

Parity: reference `scripts/process_papers_schema.py` — long ingestion jobs
record per-document status to a JSON file so an interrupted run resumes
where it stopped instead of re-embedding everything.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path


def load_status(path: str) -> dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"done": {}, "failed": {}}


def save_status(path: str, status: dict) -> None:
    with open(path, "w") as f:
        json.dump(status, f, indent=2)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("directory")
    parser.add_argument("--db", default="./corpus_index")
    parser.add_argument("--status-file", default="./ingest_status.json")
    parser.add_argument("--sparse", action="store_true")
    parser.add_argument("--flush-every", type=int, default=50)
    args = parser.parse_args()

    from verbatim_rag_tpu.engine.embedding_providers import (
        HashedBowDenseProvider,
        HashedSparseProvider,
    )
    from verbatim_rag_tpu.engine.index import VerbatimIndex
    from verbatim_rag_tpu.ingestion.schema import DocumentSchema

    # Resume rule: an existing db is LOADED and appended to — building a
    # fresh index here and saving it at the end would overwrite every
    # previously ingested document while the status file still marks them
    # done (unrecoverable data loss on the second run).
    if os.path.exists(args.db + ".json"):
        index = VerbatimIndex.load(args.db)
        print(f"resuming into existing index at {args.db} ({index.store.count()} chunks)")
    else:
        index = VerbatimIndex(
            dense_provider=HashedBowDenseProvider(),
            sparse_provider=HashedSparseProvider() if args.sparse else None,
            db_path=args.db,
        )
    status = load_status(args.status_file)

    paths = [p for p in sorted(Path(args.directory).rglob("*")) if p.suffix in (".md", ".txt")]
    pending = [p for p in paths if str(p) not in status["done"]]
    print(f"{len(paths)} files, {len(pending)} pending")

    for i, path in enumerate(pending):
        try:
            doc_id = index.add_document(DocumentSchema.from_file(str(path)))
            status["done"][str(path)] = doc_id
        except Exception as exc:
            status["failed"][str(path)] = str(exc)
            print(f"FAILED {path}: {exc}")
        if (i + 1) % args.flush_every == 0:
            index.save(args.db)
            save_status(args.status_file, status)
            print(f"checkpoint: {i + 1}/{len(pending)}")

    index.save(args.db)
    save_status(args.status_file, status)
    print(f"done: {len(status['done'])} ok, {len(status['failed'])} failed")


if __name__ == "__main__":
    main()
