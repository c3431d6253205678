"""VerbatimTransform + UniversalDocument (parity with reference tests/test_transform.py)."""

from unittest.mock import MagicMock

import pytest

from verbatim_rag_tpu.core.templates import TemplateManager
from verbatim_rag_tpu.core.transform import VerbatimTransform, normalize_context
from verbatim_rag_tpu.core.universal_document import UniversalDocument


class TestCoerceContextToResults:
    def test_dict_with_content_key(self):
        results = normalize_context([{"content": "Hello world", "title": "Doc 1"}])
        assert results[0].text == "Hello world"
        assert results[0].metadata["title"] == "Doc 1"

    def test_dict_with_text_key(self):
        assert normalize_context([{"text": "Hello world"}])[0].text == "Hello world"

    def test_object_with_text_attribute(self):
        obj = MagicMock()
        obj.text = "Hello from object"
        obj.metadata = {"key": "val"}
        assert normalize_context([obj])[0].text == "Hello from object"

    def test_bad_input_raises(self):
        with pytest.raises(TypeError):
            normalize_context([42])

    def test_missing_content_raises(self):
        with pytest.raises(ValueError):
            normalize_context([{"title": "no content"}])

    def test_multiple_items_get_sequential_ids(self):
        results = normalize_context([{"content": "First"}, {"content": "Second"}])
        assert [r.id for r in results] == ["ctx_0", "ctx_1"]


class TestVerbatimTransform:
    def _make(self, span_map):
        extractor = MagicMock()
        extractor.extract_spans.return_value = span_map
        return VerbatimTransform(
            llm_client=MagicMock(),
            extractor=extractor,
            template_manager=TemplateManager(llm_client=None, default_mode="static"),
        )

    def test_transform_with_mocked_extractor(self):
        vt = self._make({"The study found X.": ["found X"]})
        response = vt.transform("What was found?", [{"content": "The study found X."}])
        assert response.question == "What was found?"
        assert "found X" in response.answer

    def test_transform_empty_spans(self):
        vt = self._make({})
        response = vt.transform("What?", [{"content": "No relevant info here."}])
        assert "No relevant information" in response.answer

    def test_display_citation_split(self):
        spans = {f"doc {i} body": [f"doc {i}"] for i in range(8)}
        extractor = MagicMock()
        extractor.extract_spans.return_value = spans
        vt = VerbatimTransform(
            llm_client=MagicMock(),
            extractor=extractor,
            template_manager=TemplateManager(llm_client=None, default_mode="static"),
            max_display_spans=5,
        )
        context = [{"content": f"doc {i} body"} for i in range(8)]
        response = vt.transform("Q?", context)
        types = [c.type for c in response.structured_answer.citations]
        assert types.count("display") == 5
        assert types.count("reference") == 3


class TestUniversalDocument:
    def test_from_text(self):
        doc = UniversalDocument.from_text("Hello", title="T", source="S")
        assert (doc.content, doc.title) == ("Hello", "T")

    def test_from_dict_both_keys(self):
        assert UniversalDocument.from_dict({"content": "Hello"}).content == "Hello"
        assert UniversalDocument.from_dict({"text": "Hello"}).content == "Hello"

    def test_from_dict_missing_content_raises(self):
        with pytest.raises(ValueError):
            UniversalDocument.from_dict({"title": "no content"})

    def test_from_dict_bad_type_raises(self):
        with pytest.raises(TypeError):
            UniversalDocument.from_dict("not a dict")

    def test_to_context_roundtrip(self):
        doc = UniversalDocument(content="Hello", title="T", source="S", metadata={"k": "v"})
        assert UniversalDocument.from_dict(doc.to_context()).content == "Hello"


class TestEnhanceDecorator:
    def test_enhance_tuple_return(self):
        from verbatim_rag_tpu.core.enhance import verbatim_enhance

        extractor = MagicMock()
        extractor.extract_spans.return_value = {"ctx text": ["ctx text"]}
        vt = VerbatimTransform(
            llm_client=MagicMock(),
            extractor=extractor,
            template_manager=TemplateManager(llm_client=None, default_mode="static"),
        )

        @verbatim_enhance(transform=vt)
        def my_rag(question):
            return "generated answer", [{"content": "ctx text"}]

        response = my_rag("Q?")
        assert "ctx text" in response.answer


class TestStringContext:
    def test_bare_strings_accepted(self):
        from verbatim_rag_tpu.core.transform import normalize_context

        items = normalize_context(["just some text", {"content": "more"}])
        assert items[0].text == "just some text"
        assert items[0].id == "ctx_0"
        assert items[1].text == "more"
