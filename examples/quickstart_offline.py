"""Fully offline end-to-end quickstart: ingest → hybrid retrieve → extract →
cited answer. No API keys, no model downloads (mirrors the reference's
CPU-only quickstart, `README.md:41-44`, on the TPU-native stack).
"""

from _backend import use_cpu_unless_overridden  # noqa: E402

use_cpu_unless_overridden()


from pathlib import Path

from verbatim_rag_tpu.engine import VerbatimIndex
from verbatim_rag_tpu.engine.embedding_providers import (
    HashedBowDenseProvider,
    HashedSparseProvider,
)
from verbatim_rag_tpu.ingestion.schema import DocumentSchema
from verbatim_rag_tpu.rag import VerbatimRAG


def main() -> None:
    docs_dir = Path(__file__).parent / "example_docs"
    index = VerbatimIndex(
        dense_provider=HashedBowDenseProvider(),
        sparse_provider=HashedSparseProvider(),
    )
    index.add_documents(
        [DocumentSchema.from_file(str(p)) for p in sorted(docs_dir.glob("*.md"))]
    )
    print("index:", index.inspect())

    rag = VerbatimRAG(index)  # neural extractor + static template, all local
    response = rag.query("How efficient are solar panels?")
    print(response.answer)
    for i, doc in enumerate(response.documents):
        for h in doc.highlights:
            assert doc.content[h.start : h.end] == h.text
            print(f"  doc {i} [{h.start}:{h.end}] {h.text[:70]}")


if __name__ == "__main__":
    main()
