"""Chunkers + document schema: losslessness, heading paths, protected regions."""

import pytest

from verbatim_rag_tpu.ingestion.chunkers import (
    MarkdownChunkerProvider,
    SimpleChunkerProvider,
    _protected_units,
)
from verbatim_rag_tpu.ingestion.document import Document, DocumentType, infer_document_type
from verbatim_rag_tpu.ingestion.schema import DocumentSchema

SAMPLE_MD = """# Title

Intro paragraph.

## Section A

Content of A. More text here to make this section reasonably sized.

### Subsection A.1

Deep content.

## Section B

Content of B.

```python
# code with a fake heading
x = 1
```

Table 1: Example caption
| a | b |
|---|---|
| 1 | 2 |

Tail text.
"""


class TestMarkdownChunker:
    def test_lossless(self):
        chunker = MarkdownChunkerProvider(split_level=2)
        pairs = chunker.chunk(SAMPLE_MD)
        assert "".join(raw for raw, _ in pairs) == SAMPLE_MD

    def test_lossless_with_merge_and_split(self):
        chunker = MarkdownChunkerProvider(split_level=3, min_chunk_size=40, max_chunk_size=120)
        pairs = chunker.chunk(SAMPLE_MD)
        assert "".join(raw for raw, _ in pairs) == SAMPLE_MD

    def test_splits_on_h2(self):
        chunker = MarkdownChunkerProvider(split_level=2)
        raws = [raw for raw, _ in chunker.chunk(SAMPLE_MD)]
        assert any(raw.startswith("## Section A") for raw in raws)
        assert any(raw.startswith("## Section B") for raw in raws)

    def test_heading_not_split_inside_code_fence(self):
        text = "## Real\n\n```\n## Fake heading\n```\n\nmore\n"
        chunker = MarkdownChunkerProvider(split_level=2)
        pairs = chunker.chunk(text)
        assert len(pairs) == 1  # fake heading inside fence did not split

    def test_ancestor_heading_injection(self):
        chunker = MarkdownChunkerProvider(split_level=2)
        pairs = chunker.chunk_with_paths(SAMPLE_MD)
        section_a = next(p for p in pairs if p[0].startswith("## Section A"))
        assert section_a[2] == ["Title"]
        assert "Title" in section_a[1]  # breadcrumb in enhanced text

    def test_max_size_split_never_cuts_protected_regions(self):
        chunker = MarkdownChunkerProvider(split_level=2, max_chunk_size=60)
        pairs = chunker.chunk(SAMPLE_MD)
        joined = [raw for raw, _ in pairs]
        code_chunks = [raw for raw in joined if "```python" in raw]
        assert code_chunks and all("x = 1" in raw for raw in code_chunks)
        table_chunks = [raw for raw in joined if "| a | b |" in raw]
        assert table_chunks and all("| 1 | 2 |" in raw for raw in table_chunks)
        # Caption travels with its table.
        assert all("Table 1:" in raw for raw in table_chunks)

    def test_empty_input(self):
        assert MarkdownChunkerProvider().chunk("") == []


class TestProtectedUnits:
    def test_partition_is_lossless(self):
        units = _protected_units(SAMPLE_MD)
        assert "".join(units) == SAMPLE_MD

    def test_code_fence_atomic(self):
        units = _protected_units("para\n\n```\ncode\n```\nafter\n")
        code_units = [u for u in units if "code" in u]
        assert len(code_units) == 1
        assert code_units[0].startswith("```")


class TestSimpleChunker:
    def test_window_and_overlap(self):
        chunker = SimpleChunkerProvider(chunk_size=10, overlap=3)
        pairs = chunker.chunk("abcdefghijklmnopqrstuvwxyz")
        assert pairs[0][0] == "abcdefghij"
        assert pairs[1][0].startswith("hij")

    def test_bad_overlap(self):
        with pytest.raises(ValueError):
            SimpleChunkerProvider(chunk_size=10, overlap=10)


class TestDocumentSchema:
    def test_unknown_kwargs_routed_to_metadata(self):
        schema = DocumentSchema(content="x", author="me", year=2026)
        assert schema.metadata["author"] == "me"
        assert schema.metadata["year"] == 2026

    def test_to_document_flattens_metadata(self):
        schema = DocumentSchema(content="x", metadata={"a": {"b": 1}, "c": 2})
        doc = schema.to_document()
        assert doc.metadata == {"a.b": 1, "c": 2}

    def test_type_inference(self):
        assert infer_document_type("x.md") == DocumentType.MARKDOWN
        assert infer_document_type("http://a/b.pdf?dl=1") == DocumentType.PDF
        assert infer_document_type("noext") == DocumentType.OTHER

    def test_document_roundtrip(self):
        doc = Document.from_text("hello", title="T", source="s.md")
        data = doc.to_dict()
        again = Document.from_dict(data)
        assert again.content == "hello"
        assert again.doc_type == DocumentType.MARKDOWN


class TestChunkerFuzz:
    def test_losslessness_fuzz(self):
        """Random markdown-ish documents: concat of raw chunks == input,
        under every merge/split configuration."""
        import random

        rng = random.Random(17)
        pieces = [
            "# H1 title\n", "## Section {i}\n", "### Deep {i}\n",
            "plain paragraph {i} with words\n", "\n",
            "```\ncode {i}\n## fake heading\n```\n",
            "| a{i} | b |\n|---|---|\n| 1 | 2 |\n",
            "Table {i}: caption\n", "- bullet {i}\n", "   \n",
            "trailing text {i}", "#not-a-heading{i}\n", "#### H4 {i}\n",
        ]
        for trial in range(25):
            doc = "".join(
                rng.choice(pieces).replace("{i}", str(rng.randint(0, 99)))
                for _ in range(rng.randint(1, 30))
            )
            for kwargs in (
                {},
                {"split_level": 3},
                {"min_chunk_size": 20},
                {"max_chunk_size": 50},
                {"split_level": 4, "min_chunk_size": 15, "max_chunk_size": 80},
            ):
                chunker = MarkdownChunkerProvider(**kwargs)
                pairs = chunker.chunk(doc)
                assert "".join(raw for raw, _ in pairs) == doc, (trial, kwargs)
