"""Metadata filtering three ways: Milvus-syntax strings, dict specs, and
callables — all compiled to device-side masks applied BEFORE top-k.

Parity demo for the reference's filter strings (`milvus_base.py:315-353`;
`index.py:734-739` emits `document_id == "..."` on Cloud and
`metadata["document_id"] == "..."` on Local): a client ported from the
reference can keep sending the same strings, and gets Milvus null
semantics (rows lacking a field match neither a comparison nor its
negation; `field == null` selects them explicitly).

Run: python examples/metadata_filters_demo.py   (CPU, a few seconds)
"""

from _backend import use_cpu_unless_overridden  # noqa: E402

use_cpu_unless_overridden()


from verbatim_rag_tpu.engine import VerbatimIndex
from verbatim_rag_tpu.engine.embedding_providers import (
    HashedBowDenseProvider,
    HashedSparseProvider,
)
from verbatim_rag_tpu.ingestion.document import Document


def main() -> None:
    index = VerbatimIndex(
        dense_provider=HashedBowDenseProvider(),
        sparse_provider=HashedSparseProvider(),
    )
    corpus = [
        ("solar", 2021, "Rooftop solar arrays feed the afternoon demand peak."),
        ("solar", 2024, "Perovskite solar cells reached record lab efficiency."),
        ("wind", 2019, "Offshore wind turbines run at higher capacity factors."),
        ("wind", None, "An undated note about gearbox maintenance schedules."),
    ]
    index.add_documents(
        [
            Document(
                title=f"{topic} {year or 'n.d.'}",
                content=text,
                metadata={"topic": topic, **({"year": year} if year else {})},
            )
            for topic, year, text in corpus
        ]
    )

    def show(label, filter_spec):
        hits = index.query("renewable energy output", k=10, filter=filter_spec)
        print(f"{label:46} -> {[h.metadata.get('title') for h in hits]}")

    # 1. Milvus-syntax strings — what a reference client sends over the API.
    show('topic == "solar"', 'topic == "solar"')
    show('topic == "solar" and year >= 2024', 'topic == "solar" and year >= 2024')
    show('year != 2019 (missing-year row excluded)', "year != 2019")
    show("year == null (selects the undated row)", "year == null")
    show('metadata["topic"] in ["wind"]', 'metadata["topic"] in ["wind"]')

    # 2. Dict spec — equality / membership per field.
    show("dict {'topic': 'wind'}", {"topic": "wind"})

    # 3. Callable — arbitrary host predicate (still masked before top-k).
    show("callable year>=2020", lambda m: (m.get("year") or 0) >= 2020)


if __name__ == "__main__":
    main()
