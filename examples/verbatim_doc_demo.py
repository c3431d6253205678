"""VerbatimDOC demo: a report template with embedded retrieval queries
(parity with the reference's `examples/verbatim_doc_demo.py`).
"""

from _backend import use_cpu_unless_overridden  # noqa: E402

use_cpu_unless_overridden()


from pathlib import Path

from verbatim_rag_tpu.engine import VerbatimIndex
from verbatim_rag_tpu.engine.embedding_providers import HashedBowDenseProvider
from verbatim_rag_tpu.ingestion.schema import DocumentSchema
from verbatim_rag_tpu.rag import VerbatimRAG
from verbatim_rag_tpu.rag.verbatim_doc import VerbatimDOC

REPORT_TEMPLATE = """# Renewable Energy Briefing

## Solar

Key facts: [!query=how do solar panels work and how efficient are they|format=bullet]

## Wind

Summary: [!query=how do wind turbines generate electricity|format=short,max_length=200]
"""


def main() -> None:
    docs_dir = Path(__file__).parent / "example_docs"
    index = VerbatimIndex(dense_provider=HashedBowDenseProvider())
    index.add_documents(
        [DocumentSchema.from_file(str(p)) for p in sorted(docs_dir.glob("*.md"))]
    )
    rag = VerbatimRAG(index)

    result = VerbatimDOC(rag).process(REPORT_TEMPLATE)
    print(result.document)
    print("\n--- citations ---")
    for c in result.citations:
        print(f"[{c['number']}] ({c['doc_title']}) {c['text'][:70]}")


if __name__ == "__main__":
    main()
