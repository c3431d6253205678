"""Pydantic model validators (parity with reference tests/test_models.py)."""

import pytest
from pydantic import ValidationError

from verbatim_rag_tpu.core.models import (
    Citation,
    DocumentWithHighlights,
    Highlight,
    QueryResponse,
    StreamingResponse,
    StreamingResponseType,
    StructuredAnswer,
)


class TestHighlight:
    def test_valid(self):
        h = Highlight(text="abc", start=0, end=3)
        assert h.end == 3

    def test_end_must_exceed_start(self):
        with pytest.raises(ValidationError):
            Highlight(text="abc", start=3, end=3)
        with pytest.raises(ValidationError):
            Highlight(text="abc", start=5, end=2)

    def test_empty_text_rejected(self):
        with pytest.raises(ValidationError):
            Highlight(text="", start=0, end=1)

    def test_negative_start_rejected(self):
        with pytest.raises(ValidationError):
            Highlight(text="a", start=-1, end=1)


class TestCitation:
    def test_defaults(self):
        c = Citation(text="t", doc_index=0, highlight_index=0)
        assert c.number is None
        assert c.type is None

    def test_number_must_be_positive(self):
        with pytest.raises(ValidationError):
            Citation(text="t", doc_index=0, highlight_index=0, number=0)


class TestQueryResponse:
    def test_roundtrip(self):
        qr = QueryResponse(
            question="Q?",
            answer="A",
            structured_answer=StructuredAnswer(text="A"),
            documents=[DocumentWithHighlights(content="doc")],
        )
        data = qr.model_dump()
        assert data["documents"][0]["content"] == "doc"

    def test_empty_question_rejected(self):
        with pytest.raises(ValidationError):
            QueryResponse(question="", answer="A", structured_answer=StructuredAnswer(text="A"))


class TestStreamingResponse:
    def test_types(self):
        sr = StreamingResponse(type=StreamingResponseType.DOCUMENTS, data=[], done=False)
        assert sr.type.value == "documents"
        assert sr.done is False
