"""`verbatim-rag-tpu` CLI: index / template / query.

Parity: reference `verbatim_rag/cli.py:24-227` — subcommands to build an
index from files, manage template state, and run queries printing the answer
plus a citation breakdown (optionally dumping JSON). The default stack is
the fully offline TPU path: hashed providers (or JAX encoders with
``--neural``), device index, static templates, neural extractor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _build_index(args):
    from verbatim_rag_tpu.engine.embedding_providers import (
        HashedBowDenseProvider,
        HashedSparseProvider,
    )
    from verbatim_rag_tpu.engine.index import VerbatimIndex
    from verbatim_rag_tpu.ingestion.schema import DocumentSchema

    if args.neural:
        from verbatim_rag_tpu.models.providers import JaxDenseProvider, JaxSpladeProvider

        dense = JaxDenseProvider()
        sparse = JaxSpladeProvider() if args.sparse else None
    else:
        dense = HashedBowDenseProvider()
        sparse = HashedSparseProvider() if args.sparse else None

    index = VerbatimIndex(dense_provider=dense, sparse_provider=sparse, db_path=args.db)

    docs = []
    for path in args.files:
        if os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                for fname in sorted(files):
                    if fname.endswith((".md", ".txt")):
                        docs.append(DocumentSchema.from_file(os.path.join(root, fname)))
        else:
            docs.append(DocumentSchema.from_file(path))

    index.add_documents_bulk(docs)
    index.save(args.db)
    stats = index.inspect()
    print(f"Indexed {stats['num_documents']} documents / {stats['num_chunks']} chunks → {args.db}")
    return 0


def _load_index(db_path: str):
    # Reconstructs the providers that built the index from the persisted
    # identity (`<db>.providers.json`) — query vectors must live in the same
    # space as the indexed ones.
    from verbatim_rag_tpu.engine.index import VerbatimIndex

    return VerbatimIndex.load(db_path)


def _query(args):
    index = _load_index(args.db)

    from verbatim_rag_tpu.core.templates import TemplateManager
    from verbatim_rag_tpu.rag.core import VerbatimRAG

    llm_client = None
    if args.llm:
        from verbatim_rag_tpu.core.llm_client import LLMClient

        llm_client = LLMClient(model=args.model, api_base=args.api_base)

    tm = TemplateManager(llm_client=llm_client, default_mode="static")
    if args.templates and os.path.exists(args.templates):
        tm.load(args.templates)

    rag = VerbatimRAG(index, llm_client=llm_client, template_manager=tm, k=args.k)
    response = rag.query(args.question)

    print(response.answer)
    print()
    citations = response.structured_answer.citations
    if citations:
        print(f"--- {len(citations)} citations ---")
        for c in citations:
            preview = c.text[:80].replace("\n", " ")
            print(f"[{c.number}] ({c.type}) doc {c.doc_index}: {preview}")
    if args.json:
        with open(args.json, "w") as f:
            f.write(response.model_dump_json(indent=2))
        print(f"\nFull response written to {args.json}")
    return 0


def _template(args):
    from verbatim_rag_tpu.core.templates import TemplateManager

    tm = TemplateManager(llm_client=None)
    if args.show:
        if os.path.exists(args.templates):
            tm.load(args.templates)
        print(json.dumps(tm.info(), indent=2))
        return 0
    if args.set_static:
        tm.use_static_mode(template=args.set_static)
        tm.save(args.templates)
        print(f"Static template saved to {args.templates}")
        return 0
    print("Nothing to do (use --show or --set-static)", file=sys.stderr)
    return 1


def main(argv: list[str] | None = None) -> int:
    from verbatim_rag_tpu.utils.jax_cache import (
        enable_persistent_compilation_cache,
        pin_platform_from_env,
    )

    pin_platform_from_env()
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser(prog="verbatim-rag-tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_index = sub.add_parser("index", help="Build an index from files/directories")
    p_index.add_argument("files", nargs="+")
    p_index.add_argument("--db", default="./verbatim_index", help="Index path prefix")
    p_index.add_argument("--sparse", action="store_true", help="Also build sparse index")
    p_index.add_argument("--neural", action="store_true", help="Use JAX encoders")
    p_index.set_defaults(fn=_build_index)

    p_query = sub.add_parser("query", help="Query an index")
    p_query.add_argument("question")
    p_query.add_argument("--db", default="./verbatim_index")
    p_query.add_argument("-k", type=int, default=5)
    p_query.add_argument("--llm", action="store_true", help="Use LLM extraction/templating")
    p_query.add_argument("--model", default="gpt-4o-mini")
    p_query.add_argument("--api-base", default="https://api.openai.com/v1")
    p_query.add_argument("--templates", default="")
    p_query.add_argument("--json", help="Dump full QueryResponse JSON to this path")
    p_query.set_defaults(fn=_query)

    p_tmpl = sub.add_parser("template", help="Manage template state")
    p_tmpl.add_argument("--templates", default="./templates.json")
    p_tmpl.add_argument("--show", action="store_true")
    p_tmpl.add_argument("--set-static", help="Set a custom static template")
    p_tmpl.set_defaults(fn=_template)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
