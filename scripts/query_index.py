"""Interactive query REPL over a saved index (parity:
reference `scripts/query_index.py`)."""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--db", default="./verbatim_index")
    parser.add_argument("-k", type=int, default=5)
    parser.add_argument(
        "--search-type", default=None, choices=[None, "dense", "sparse", "hybrid", "full_text"]
    )
    args = parser.parse_args()

    from verbatim_rag_tpu.engine.embedding_providers import (
        HashedBowDenseProvider,
        HashedSparseProvider,
    )
    from verbatim_rag_tpu.engine.index import VerbatimIndex
    from verbatim_rag_tpu.engine.store import DeviceVectorStore

    store = DeviceVectorStore.load(args.db)
    index = VerbatimIndex(store=store, db_path=args.db)
    index.load_documents(args.db)
    if store.dense_dim:
        index.dense_provider = HashedBowDenseProvider(dim=store.dense_dim)
    if store.sparse_vocab:
        index.sparse_provider = HashedSparseProvider(vocab_size=store.sparse_vocab)

    print(f"Loaded {index.inspect()['num_chunks']} chunks. Ctrl-D to exit.")
    while True:
        try:
            question = input("query> ").strip()
        except EOFError:
            break
        if not question:
            continue
        for i, hit in enumerate(index.query(question, k=args.k, search_type=args.search_type)):
            preview = hit.text[:120].replace("\n", " ")
            print(f"{i + 1}. [{hit.score:.4f}] ({hit.metadata.get('title', '')}) {preview}")


if __name__ == "__main__":
    main()
