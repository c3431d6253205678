"""Span verification + LLMSpanExtractor (parity with reference tests/test_extractors.py)."""

from unittest.mock import MagicMock

from verbatim_rag_tpu.core.extractors import LLMSpanExtractor


class TestVerifySpans:
    def setup_method(self):
        self.extractor = LLMSpanExtractor(llm_client=MagicMock())

    def test_keeps_verbatim_spans(self):
        assert self.extractor._verify_spans(["cat", "mat"], "The cat sat on the mat.") == [
            "cat",
            "mat",
        ]

    def test_filters_non_verbatim_spans(self):
        assert self.extractor._verify_spans(["cat", "dog"], "The cat sat on the mat.") == ["cat"]

    def test_strips_whitespace(self):
        assert self.extractor._verify_spans(["  cat  "], "The cat sat.") == ["cat"]

    def test_empty_span_filtered(self):
        assert self.extractor._verify_spans(["", "  "], "Some text.") == []


class TestVerifySpansFuzzy:
    def setup_method(self):
        self.extractor = LLMSpanExtractor(llm_client=MagicMock(), span_match_mode="fuzzy")

    def test_fuzzy_match_preserves_document_token_boundaries(self):
        span = (
            "The art of the movement spanned visual, literary, and sound media, "
            "including collage, sound poetry, cut - up writing, and sculpture."
        )
        document = (
            "x The art of the movement spanned visual , literary , and sound media , "
            "including collage , sound poetry , cut - up writing , and sculpture . more"
        )
        assert self.extractor._verify_spans([span], document) == [
            "The art of the movement spanned visual , literary , and sound media , "
            "including collage , sound poetry , cut - up writing , and sculpture ."
        ]

    def test_fuzzy_match_normalizes_case_and_punctuation_spacing(self):
        result = self.extractor._verify_spans(
            ["THE CAT, SAT."],
            "Before the cat , sat . after",
        )
        assert result == ["the cat , sat ."]

    def test_fuzzy_rejects_unrelated_text(self):
        assert self.extractor._verify_spans(
            ["completely different content about planets"],
            "A short note on cooking pasta.",
        ) == []


class TestExtractSpans:
    def test_empty_results(self):
        extractor = LLMSpanExtractor(llm_client=MagicMock())
        assert extractor.extract_spans("What?", []) == {}

    def test_batch_mode(self, make_search_result):
        client = MagicMock()
        client.extract_spans.return_value = {"doc_0": ["cat sat on the mat"]}
        extractor = LLMSpanExtractor(llm_client=client, extraction_mode="batch", batch_size=5)
        result = extractor.extract_spans(
            "What animal?", [make_search_result("The cat sat on the mat.")]
        )
        assert result["The cat sat on the mat."] == ["cat sat on the mat"]

    def test_individual_mode(self, make_search_result):
        client = MagicMock()
        client.extract_relevant_spans.return_value = ["The cat"]
        extractor = LLMSpanExtractor(llm_client=client, extraction_mode="individual")
        result = extractor.extract_spans("What?", [make_search_result("The cat sat.")])
        assert result["The cat sat."] == ["The cat"]

    def test_auto_mode_selects_batch_for_small_input(self, make_search_result):
        client = MagicMock()
        client.extract_spans.return_value = {"doc_0": ["span"]}
        extractor = LLMSpanExtractor(llm_client=client, extraction_mode="auto", batch_size=5)
        extractor.extract_spans("Q?", [make_search_result("Some text with span inside.")])
        client.extract_spans.assert_called_once()

    def test_auto_mode_selects_individual_for_large_input(self, make_search_result):
        client = MagicMock()
        client.extract_relevant_spans.return_value = ["span"]
        extractor = LLMSpanExtractor(llm_client=client, extraction_mode="auto", batch_size=2)
        results = [make_search_result(f"Document {i} with span content.") for i in range(5)]
        extractor.extract_spans("Q?", results)
        assert client.extract_relevant_spans.call_count == 5

    def test_batch_fallback_on_error(self, make_search_result):
        client = MagicMock()
        client.extract_spans.side_effect = Exception("API error")
        client.extract_relevant_spans.return_value = ["fallback span"]
        extractor = LLMSpanExtractor(llm_client=client, extraction_mode="batch")
        result = extractor.extract_spans("Q?", [make_search_result("Text with fallback span.")])
        assert result["Text with fallback span."] == ["fallback span"]

    def test_batch_iterates_all_chunks(self, make_search_result):
        client = MagicMock()
        client.extract_spans.return_value = {"doc_0": []}
        extractor = LLMSpanExtractor(llm_client=client, extraction_mode="batch", batch_size=2)
        results = [make_search_result(f"text {i}") for i in range(5)]
        extractor.extract_spans("Q?", results)
        assert client.extract_spans.call_count == 3  # ceil(5/2)

    async def test_async_individual(self, make_search_result):
        async def fake_extract(question, text):
            return ["async span"]

        client = MagicMock()
        client.extract_relevant_spans_async = fake_extract
        extractor = LLMSpanExtractor(llm_client=client, extraction_mode="individual")
        result = await extractor.extract_spans_async(
            "Q?", [make_search_result("Text with async span inside.")]
        )
        assert result["Text with async span inside."] == ["async span"]
