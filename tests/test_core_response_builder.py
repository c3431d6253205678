"""ResponseBuilder (parity with reference tests/test_response_builder.py)."""

from verbatim_rag_tpu.core.response_builder import ResponseBuilder


class TestHighlights:
    def setup_method(self):
        self.builder = ResponseBuilder()

    def test_highlight_offsets(self):
        highlights = self.builder._create_highlights("The cat sat on the mat.", ["cat", "mat"])
        assert [(h.start, h.end) for h in highlights] == [(4, 7), (19, 22)]
        assert all(
            "The cat sat on the mat."[h.start : h.end] == h.text for h in highlights
        )

    def test_overlap_suppression_first_wins(self):
        highlights = self.builder._create_highlights("the big cat ran", ["big cat", "cat"])
        assert [h.text for h in highlights] == ["big cat"]

    def test_repeated_span_all_occurrences(self):
        highlights = self.builder._create_highlights("cat and cat", ["cat"])
        assert [(h.start, h.end) for h in highlights] == [(0, 3), (8, 11)]

    def test_has_overlap_geometry(self):
        regions = [(5, 10)]
        assert self.builder._has_overlap(4, 6, regions) is True
        assert self.builder._has_overlap(9, 12, regions) is True
        assert self.builder._has_overlap(5, 10, regions) is True
        assert self.builder._has_overlap(0, 5, regions) is False
        assert self.builder._has_overlap(10, 12, regions) is False


class TestBuildResponse:
    def test_full_response(self, make_search_result):
        builder = ResponseBuilder()
        results = [
            make_search_result("The cat sat on the mat.", title="Cats"),
            make_search_result("Dogs bark loudly.", title="Dogs"),
        ]
        response = builder.build_response(
            question="What do animals do?",
            answer="[1] cat sat [2] bark",
            search_results=results,
            relevant_spans={
                "The cat sat on the mat.": ["cat sat"],
                "Dogs bark loudly.": ["bark"],
            },
            display_span_count=1,
        )
        assert response.question == "What do animals do?"
        assert len(response.documents) == 2
        citations = response.structured_answer.citations
        assert [c.number for c in citations] == [1, 2]
        assert citations[0].type == "display"
        assert citations[1].type == "reference"
        assert response.documents[0].title == "Cats"

    def test_documents_without_spans_have_no_highlights(self, make_search_result):
        builder = ResponseBuilder()
        response = builder.build_response(
            question="Q?",
            answer="A",
            search_results=[make_search_result("nothing relevant")],
            relevant_spans={},
        )
        assert response.documents[0].highlights == []


class TestCleanAnswer:
    def setup_method(self):
        self.builder = ResponseBuilder()

    def test_strips_wrapping_quotes(self):
        assert self.builder.clean_answer('"hello"') == "hello"
        assert self.builder.clean_answer("'hello'") == "hello"

    def test_literal_newlines(self):
        assert self.builder.clean_answer("a\\nb") == "a\nb"

    def test_collapses_spaces_and_newlines(self):
        assert self.builder.clean_answer("a    b") == "a b"
        assert self.builder.clean_answer("a\n\n\n\nb") == "a\n\nb"

    def test_empty(self):
        assert self.builder.clean_answer("") == ""
