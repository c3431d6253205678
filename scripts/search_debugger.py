"""Search debugging console: compare dense / sparse / full-text / hybrid
side by side with adjustable weights and optional reranking.

Parity: reference `scripts/test_index_streamlit.py` — a retrieval debugger
with per-method result views, hybrid weight sliders, and a cross-encoder
rerank toggle. Streamlit is not a baked-in dependency, so this is a
terminal tool: every method's top-k is printed in columns for one query.
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("question")
    parser.add_argument("--db", default="./verbatim_index")
    parser.add_argument("-k", type=int, default=5)
    parser.add_argument("--dense-weight", type=float, default=0.5)
    parser.add_argument("--sparse-weight", type=float, default=0.5)
    parser.add_argument("--rrf-k", type=int, default=60)
    parser.add_argument("--rerank", action="store_true", help="cross-encoder rerank")
    args = parser.parse_args()

    from verbatim_rag_tpu.engine.index import VerbatimIndex

    # Reconstruct the providers that BUILT the index (providers.json) —
    # forcing hashed providers onto a neural-built index would debug the
    # wrong vector space.
    index = VerbatimIndex.load(args.db)
    store = index.store

    def show(label: str, hits) -> None:
        print(f"\n=== {label} ===")
        for i, hit in enumerate(hits):
            preview = hit.text[:100].replace("\n", " ")
            print(f"{i + 1}. [{hit.score:.4f}] {preview}")

    if index.dense_provider:
        show("dense", index.query(args.question, k=args.k, search_type="dense"))
    if index.sparse_provider:
        show("sparse", index.query(args.question, k=args.k, search_type="sparse"))
    if store.enable_full_text:
        show("full_text", index.query(args.question, k=args.k, search_type="full_text"))
    if index.dense_provider and index.sparse_provider:
        hybrid = index.query(
            args.question,
            k=args.k,
            hybrid_weights={"dense": args.dense_weight, "sparse": args.sparse_weight},
            rrf_k=args.rrf_k,
        )
        show(f"hybrid (d={args.dense_weight} s={args.sparse_weight})", hybrid)
        if args.rerank:
            from verbatim_rag_tpu.rag.rerankers import JaxReranker

            show("hybrid + rerank", JaxReranker().rerank(args.question, hybrid))


if __name__ == "__main__":
    main()
