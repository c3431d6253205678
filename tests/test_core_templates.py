"""Template filler + strategies (parity with reference tests/test_templates.py)."""

import pytest

from verbatim_rag_tpu.core.templates import StaticTemplate, TemplateFiller, TemplateManager


class TestTemplateFiller:
    def setup_method(self):
        self.filler = TemplateFiller(citation_mode="inline")

    def test_aggregate_placeholder(self):
        result = self.filler.fill(
            "Here are findings:\n\n[DISPLAY_SPANS]",
            [{"text": "Span one."}, {"text": "Span two."}],
            [],
        )
        assert "[1] Span one." in result
        assert "[2] Span two." in result

    def test_relevant_sentences_alias(self):
        result = self.filler.fill("[RELEVANT_SENTENCES]", [{"text": "A."}], [])
        assert "[1] A." in result

    def test_per_fact_placeholders(self):
        result = self.filler.fill(
            "Finding: [FACT_1]\nAlso: [FACT_2]",
            [{"text": "Alpha."}, {"text": "Beta."}],
            [],
        )
        assert "[1] Alpha." in result
        assert "[2] Beta." in result

    def test_span_placeholder_out_of_range_is_dropped(self):
        result = self.filler.fill("[SPAN_1] [SPAN_9]", [{"text": "Only."}], [])
        assert "[1] Only." in result
        assert "SPAN_9" not in result

    def test_citation_refs(self):
        result = self.filler.fill(
            "[DISPLAY_SPANS]\n\nRefs: [CITATION_REFS]",
            [{"text": "Main point."}],
            [{"text": "Extra ref."}],
        )
        assert "[2]" in result

    def test_hidden_citation_mode(self):
        filler = TemplateFiller(citation_mode="hidden")
        result = filler.fill("[DISPLAY_SPANS]", [{"text": "No numbers here."}], [])
        assert "[1]" not in result
        assert "No numbers here." in result

    def test_linked_citation_refs_are_appended_to_display_spans(self):
        display = [{"text": "Synthesized point.", "citation_ids": ["v1", "v3"]}]
        citation = [
            {"text": "Source one.", "citation_id": "v1"},
            {"text": "Source two.", "citation_id": "v2"},
            {"text": "Source three.", "citation_id": "v3"},
        ]
        result = self.filler.fill("[DISPLAY_SPANS]", display, citation)
        assert "[1] Synthesized point. [2] [4]" in result

    def test_linked_citations_suppress_flat_citation_refs(self):
        display = [{"text": "Synthesized point.", "citation_ids": ["v1"]}]
        citation = [{"text": "Source one.", "citation_id": "v1"}]
        result = self.filler.fill("[DISPLAY_SPANS]\n\nRefs: [CITATION_REFS]", display, citation)
        assert "Refs:" in result
        assert "Refs: [2]" not in result

    def test_custom_citation_format_span_id(self):
        filler = TemplateFiller(citation_format="[{span_id}]")
        result = filler.fill("[DISPLAY_SPANS]", [{"text": "A.", "span_id": "cite1"}], [])
        assert "[cite1] A." in result

    def test_empty_template(self):
        assert self.filler.fill("", [], []) == ""

    def test_no_spans(self):
        assert "No relevant information" in self.filler.fill("[DISPLAY_SPANS]", [], [])

    def test_invalid_citation_mode(self):
        with pytest.raises(ValueError):
            TemplateFiller(citation_mode="bogus")

    def test_table_marker_on_own_line(self):
        table = "| Col A | Col B |\n|---|---|\n| v1 | v2 |"
        result = self.filler.fill("[DISPLAY_SPANS]", [{"text": table}], [])
        assert result.startswith("[1]\n\n|")


class TestIsTable:
    def test_table_detected(self):
        assert TemplateFiller._is_table("| A | B |\n|---|---|\n| 1 | 2 |") is True

    def test_non_table(self):
        assert TemplateFiller._is_table("Just a plain sentence.") is False

    def test_single_line_with_pipe(self):
        assert TemplateFiller._is_table("one | two") is False


class TestEnsurePlaceholder:
    def test_already_has_placeholder(self):
        t = "Hello [DISPLAY_SPANS]"
        assert TemplateFiller.ensure_placeholder(t) == t

    def test_adds_placeholder(self):
        assert "[DISPLAY_SPANS]" in TemplateFiller.ensure_placeholder("Hello world")

    def test_respects_fact_placeholder(self):
        t = "Hello [FACT_1]"
        assert TemplateFiller.ensure_placeholder(t) == t


class TestStaticTemplate:
    def test_default_template(self):
        assert "[DISPLAY_SPANS]" in StaticTemplate().generate("Any question", ["span1"])

    def test_custom_template(self):
        st = StaticTemplate(template="Custom: [DISPLAY_SPANS]")
        assert st.generate("Q", []) == "Custom: [DISPLAY_SPANS]"

    def test_invalid_template_rejected(self):
        with pytest.raises(ValueError):
            StaticTemplate(template="no placeholder here")

    def test_fill_delegates_to_filler(self):
        result = StaticTemplate().fill("Findings: [DISPLAY_SPANS]", [{"text": "A fact."}], [])
        assert "A fact." in result

    def test_save_load_state(self):
        st = StaticTemplate(template="Custom [DISPLAY_SPANS]")
        state = st.save_state()
        assert state["type"] == "static"
        st2 = StaticTemplate()
        st2.load_state(state)
        assert st2.template == "Custom [DISPLAY_SPANS]"

    def test_create_academic(self):
        assert "Literature" in StaticTemplate.create_academic().template

    def test_create_brief(self):
        assert "[DISPLAY_SPANS]" in StaticTemplate.create_brief().template


class TestTemplateManager:
    def test_default_mode_is_static(self):
        tm = TemplateManager(llm_client=None, default_mode="static")
        assert tm.get_current_mode() == "static"

    def test_available_modes_without_llm(self):
        modes = TemplateManager(llm_client=None).get_available_modes()
        assert "static" in modes
        assert "contextual" not in modes

    def test_contextual_falls_back_to_static_without_llm(self):
        tm = TemplateManager(llm_client=None, default_mode="contextual")
        assert tm.get_current_mode() == "static"

    def test_set_mode(self):
        tm = TemplateManager(llm_client=None)
        assert tm.set_mode("random") is True
        assert tm.get_current_mode() == "random"

    def test_set_unknown_mode(self):
        assert TemplateManager(llm_client=None).set_mode("nonexistent") is False

    def test_process_static(self):
        tm = TemplateManager(llm_client=None, default_mode="static")
        result = tm.process("What?", [{"text": "Answer here."}], [])
        assert "Answer here." in result

    def test_linked_citation_inputs_only_use_display_spans(self):
        tm = TemplateManager(llm_client=None, default_mode="static")
        all_spans, citation_count = tm._get_template_inputs(
            [{"text": "Synthesized point.", "citation_ids": ["v1"]}],
            [{"text": "Source one.", "citation_id": "v1"}],
        )
        assert all_spans == ["Synthesized point."]
        assert citation_count == 0

    def test_use_static_mode_custom_template(self):
        tm = TemplateManager(llm_client=None)
        tm.use_static_mode(template="Custom: [DISPLAY_SPANS]")
        result = tm.process("Q", [{"text": "Fact."}], [])
        assert "Custom:" in result
        assert "Fact." in result

    def test_save_load_roundtrip(self, tmp_path):
        tm = TemplateManager(llm_client=None)
        tm.use_static_mode(template="Persisted: [DISPLAY_SPANS]")
        path = str(tmp_path / "templates.json")
        tm.save(path)
        tm2 = TemplateManager(llm_client=None)
        assert tm2.load(path) is True
        assert tm2.get_current_mode() == "static"
        assert "Persisted:" in tm2.process("Q", [{"text": "F."}], [])


class TestStructuredTemplate:
    def test_fill_with_spans_global_numbering(self):
        from verbatim_rag_tpu.core.templates import StructuredTemplate

        st = StructuredTemplate(template="## M\n[METHODOLOGY]\n\n## R\n[RESULTS]")
        out = st.fill_with_spans(
            {
                "METHODOLOGY": ["method text", "more method"],
                "RESULTS": [{"text": "result text"}],
            }
        )
        assert "[1] method text" in out
        assert "[2] more method" in out
        assert "[3] result text" in out

    def test_empty_placeholder_rendering(self):
        from verbatim_rag_tpu.core.templates import StructuredTemplate

        st = StructuredTemplate(template="[METHODOLOGY]")
        assert "(no relevant information found)" in st.fill_with_spans({})

    def test_placeholder_hints(self):
        from verbatim_rag_tpu.core.templates import StructuredTemplate

        st = StructuredTemplate(template="[METHODOLOGY] [CUSTOM_THING] [DISPLAY_SPANS]")
        hints = st.get_placeholder_hints()
        assert hints["METHODOLOGY"] == "methodology or methods used"
        assert hints["CUSTOM_THING"] == "custom thing"
        assert "DISPLAY_SPANS" not in hints


class TestQuestionSpecificTemplate:
    def test_routing_by_similarity(self):
        from verbatim_rag_tpu.core.templates import QuestionSpecificTemplate

        qs = QuestionSpecificTemplate()
        qs.add_template(
            "Methods: [DISPLAY_SPANS]", ["what methodology was used", "describe the methods"]
        )
        qs.add_template(
            "Results: [DISPLAY_SPANS]", ["what were the results", "what did they find"]
        )
        assert qs.generate("what methods did the paper use", []) == "Methods: [DISPLAY_SPANS]"
        assert qs.generate("what results did they report", []) == "Results: [DISPLAY_SPANS]"

    def test_fallback_without_entries(self):
        from verbatim_rag_tpu.core.templates import QuestionSpecificTemplate

        qs = QuestionSpecificTemplate()
        assert "[DISPLAY_SPANS]" in qs.generate("anything", [])
