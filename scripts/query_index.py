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

    from verbatim_rag_tpu.engine.index import VerbatimIndex

    # VerbatimIndex.load reconstructs the providers that BUILT the index
    # from <db>.providers.json (or warns loudly when it can't). Forcing
    # hashed providers here would embed queries in the wrong vector space
    # for any neural-built index — silently meaningless results.
    index = VerbatimIndex.load(args.db)

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
