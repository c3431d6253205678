"""Coverage for less-exercised behaviors: contextual/random templates,
custom extraction prompts, streaming error events, VerbatimDOC variants,
sentence-mode semantic extractor."""

import asyncio
from unittest.mock import MagicMock

import pytest

pytest.importorskip("jax")

from verbatim_rag_tpu.core.extractors import LLMSpanExtractor
from verbatim_rag_tpu.core.templates import (
    ContextualTemplate,
    RandomTemplate,
    TemplateManager,
)


class TestContextualTemplate:
    def _client(self, template="Custom intro [DISPLAY_SPANS]"):
        client = MagicMock()
        client.generate_template.return_value = template
        return client

    def test_generates_and_caches(self):
        client = self._client()
        ct = ContextualTemplate(client)
        t1 = ct.generate("what is x?", ["span"], 0)
        t2 = ct.generate("what is x?", ["span"], 0)
        assert "[DISPLAY_SPANS]" in t1
        assert t1 == t2
        client.generate_template.assert_called_once()  # second hit cached

    def test_placeholder_repair(self):
        ct = ContextualTemplate(self._client(template="no placeholder here"))
        assert "[DISPLAY_SPANS]" in ct.generate("q", [], 0)

    def test_citation_refs_added_when_citations_exist(self):
        ct = ContextualTemplate(self._client())
        t = ct.generate("q", ["a"], citation_count=2)
        assert "[CITATION_REFS]" in t

    def test_fallback_on_error(self):
        client = MagicMock()
        client.generate_template.side_effect = RuntimeError("boom")
        ct = ContextualTemplate(client)
        t = ct.generate("q", ["a"], 0)
        assert "[DISPLAY_SPANS]" in t

    def test_cache_bounded(self):
        ct = ContextualTemplate(self._client())
        for i in range(150):
            ct.generate(f"question {i}", [], 0)
        assert len(ct._cache) <= 100

    def test_requires_llm(self):
        with pytest.raises(ValueError):
            ContextualTemplate(None)


class TestRandomTemplate:
    def test_pool_pick_is_valid(self):
        rt = RandomTemplate(seed=3)
        for _ in range(5):
            assert "[DISPLAY_SPANS]" in rt.generate("q", [])

    def test_generate_pool_from_llm(self):
        client = MagicMock()
        client.generate_template_pool.return_value = [
            "A: [DISPLAY_SPANS]",
            "bad template without placeholder gets repaired",
        ]
        rt = RandomTemplate(llm_client=client, seed=0)
        rt.generate_pool("energy", count=2)
        assert len(rt.templates) == 2
        assert all("[DISPLAY_SPANS]" in t for t in rt.templates)

    def test_pool_failure_keeps_existing(self):
        client = MagicMock()
        client.generate_template_pool.side_effect = RuntimeError("down")
        rt = RandomTemplate(llm_client=client)
        before = list(rt.templates)
        rt.generate_pool()
        assert rt.templates == before


class TestCitationFormatPropagation:
    def test_manager_propagates_format(self):
        tm = TemplateManager(llm_client=None, default_mode="static")
        tm.set_citation_format("<<{number}>>")
        out = tm.process("q", [{"text": "A fact."}], [])
        assert "<<1>> A fact." in out

    def test_manager_propagates_hidden_mode(self):
        tm = TemplateManager(llm_client=None, default_mode="static")
        tm.set_citation_mode("hidden")
        out = tm.process("q", [{"text": "A fact."}], [])
        assert "[1]" not in out and "A fact." in out


class TestCustomExtractionPrompt:
    def test_custom_prompt_renders_and_parses(self, make_search_result):
        client = MagicMock()
        client.complete.return_value = '{"doc_0": ["the span"]}'
        extractor = LLMSpanExtractor(
            llm_client=client,
            extraction_mode="batch",
            extraction_prompt="Q: {{ question }}\nDOCS:\n{{ documents }}\nJSON:",
            system_prompt="be literal",
        )
        result = extractor.extract_spans("why?", [make_search_result("has the span here")])
        assert result["has the span here"] == ["the span"]
        prompt = client.complete.call_args.args[0]
        assert "Q: why?" in prompt and "[doc_0]" in prompt
        assert client.complete.call_args.kwargs["system_prompt"] == "be literal"


class TestStreamingErrors:
    def test_retrieval_failure_emits_error_event(self):
        from verbatim_rag_tpu.core.templates import TemplateManager
        from verbatim_rag_tpu.rag.core import VerbatimRAG
        from verbatim_rag_tpu.rag.streaming import StreamingRAG

        index = MagicMock()
        index.query.side_effect = RuntimeError("index down")
        rag = VerbatimRAG(
            index,
            extractor=MagicMock(),
            template_manager=TemplateManager(llm_client=None, default_mode="static"),
        )
        events = StreamingRAG(rag).stream_query_sync("q?")
        assert events[-1]["type"] == "error"
        assert events[-1]["stage"] == "retrieval"

    def test_extraction_failure_emits_error_after_documents(self, make_search_result):
        from verbatim_rag_tpu.core.templates import TemplateManager
        from verbatim_rag_tpu.rag.core import VerbatimRAG
        from verbatim_rag_tpu.rag.streaming import StreamingRAG

        index = MagicMock()
        index.query.return_value = [make_search_result("some doc text")]
        extractor = MagicMock()

        async def boom(q, r):
            raise RuntimeError("extract fail")

        extractor.extract_spans_async = boom
        rag = VerbatimRAG(
            index,
            extractor=extractor,
            template_manager=TemplateManager(llm_client=None, default_mode="static"),
        )
        events = StreamingRAG(rag).stream_query_sync("q?")
        types = [e["type"] for e in events]
        assert types[0] == "documents"
        assert types[-1] == "error"
        assert events[-1]["stage"] == "extraction"


class TestVerbatimDocVariants:
    def _rag(self):
        from verbatim_rag_tpu.core.models import (
            DocumentWithHighlights,
            Highlight,
            QueryResponse,
            StructuredAnswer,
        )

        rag = MagicMock()
        rag.query.return_value = QueryResponse(
            question="q",
            answer="a",
            structured_answer=StructuredAnswer(text="a"),
            documents=[
                DocumentWithHighlights(
                    content="alpha beta gamma",
                    title="Doc",
                    highlights=[Highlight(text="alpha beta", start=0, end=10)],
                )
            ],
        )
        return rag

    def test_interactive_veto(self):
        from verbatim_rag_tpu.rag.verbatim_doc import VerbatimDOC

        doc = "x [!query=first] y [!query=second] z"
        vd = VerbatimDOC(self._rag())
        result = vd.process_interactive(doc, approve=lambda r: r.query.text == "first")
        assert "[!query=second]" in result.document  # vetoed stays in place
        assert "[!query=first]" not in result.document

    def test_stream_process_events(self):
        from verbatim_rag_tpu.rag.verbatim_doc import VerbatimDOC

        async def collect():
            events = []
            async for e in VerbatimDOC(self._rag()).stream_process("a [!query=only] b"):
                events.append(e)
            return events

        events = asyncio.run(collect())
        types = [e["type"] for e in events]
        assert types == ["start", "progress", "query_complete", "done"]
        assert "alpha beta" in events[-1]["document"]

    def test_citation_dedup_across_queries(self):
        from verbatim_rag_tpu.rag.verbatim_doc import VerbatimDOC

        doc = "first: [!query=a]\nsecond: [!query=b]"
        result = VerbatimDOC(self._rag()).process(doc)
        # Both queries surface the identical span → one global citation.
        assert len(result.citations) == 1
        assert result.document.count("[1]") == 2

    def _batch_rag(self):
        """A rag whose query_batch actually works, with call counters."""
        from verbatim_rag_tpu.core.models import (
            DocumentWithHighlights,
            Highlight,
            QueryResponse,
            StructuredAnswer,
        )

        def make_response(q):
            return QueryResponse(
                question=q,
                answer=f"answer to {q}",
                structured_answer=StructuredAnswer(text="a"),
                documents=[
                    DocumentWithHighlights(
                        content=f"context for {q}",
                        title="Doc",
                        highlights=[Highlight(text=f"span:{q}", start=0, end=6)],
                    )
                ],
            )

        class Rag:
            def __init__(self):
                self.batch_calls = []
                self.single_calls = []

            def query(self, question, k=5, **kw):
                self.single_calls.append(question)
                return make_response(question)

            def query_batch(self, questions, k=5, **kw):
                self.batch_calls.append(list(questions))
                return [make_response(q) for q in questions]

        return Rag()

    def test_process_batches_directives(self):
        from verbatim_rag_tpu.rag.verbatim_doc import VerbatimDOC

        rag = self._batch_rag()
        doc = "x [!query=first] y [!query=second] z [!query=third]"
        result = VerbatimDOC(rag).process(doc)
        # One batched retrieval for the whole document, no per-query calls.
        assert rag.batch_calls == [["first", "second", "third"]]
        assert rag.single_calls == []
        for q in ("first", "second", "third"):
            assert f"span:{q}" in result.document

    def test_per_directive_k_groups_batches(self):
        from verbatim_rag_tpu.rag.verbatim_doc import VerbatimDOC

        rag = self._batch_rag()
        doc = "[!query=a|k=3] [!query=b] [!query=c|k=3]"
        result = VerbatimDOC(rag).process(doc)
        # k=3 directives share one batch; the default-k one... is a batch
        # of one index group — still routed through run (len<=1 short path
        # only applies to whole-document batches) or batch; order restored.
        flat = sorted(q for call in rag.batch_calls for q in call) + sorted(
            rag.single_calls
        )
        assert flat == ["a", "b", "c"]
        assert result.document.index("span:a") < result.document.index("span:b")
        assert result.document.index("span:b") < result.document.index("span:c")

    def test_batch_failure_falls_back_sequential(self):
        from verbatim_rag_tpu.rag.verbatim_doc import VerbatimDOC

        rag = self._batch_rag()
        rag.query_batch = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom"))
        doc = "[!query=a] [!query=b]"
        result = VerbatimDOC(rag).process(doc)
        assert rag.single_calls == ["a", "b"]
        assert "span:a" in result.document and "span:b" in result.document

    def test_malformed_k_degrades_per_query(self):
        """A non-numeric k directive must not take down the document: that
        query alone degrades (error result via run's try), the rest batch."""
        from verbatim_rag_tpu.rag.verbatim_doc import VerbatimDOC

        rag = self._batch_rag()
        doc = "[!query=a|k=five] [!query=b] [!query=c]"
        result = VerbatimDOC(rag).process(doc)
        assert "span:b" in result.document and "span:c" in result.document
        # the malformed-k query went through the sequential path (and the
        # int() inside rag.query's caller may still fail there -> error
        # result, but never an exception out of process()).
        assert rag.batch_calls == [["b", "c"]]

    def test_right_length_garbage_falls_back(self):
        """query_batch returning right-length but wrong-shaped responses
        must degrade to sequential, not crash _collect."""
        from verbatim_rag_tpu.rag.verbatim_doc import VerbatimDOC

        rag = self._batch_rag()
        rag.query_batch = lambda questions, **kw: ["not a response"] * len(questions)
        doc = "[!query=a] [!query=b]"
        result = VerbatimDOC(rag).process(doc)
        assert rag.single_calls == ["a", "b"]
        assert "span:a" in result.document and "span:b" in result.document

    def test_mock_rag_still_works_via_fallback(self):
        """A rag whose query_batch returns garbage (e.g. a bare MagicMock)
        must degrade to per-query calls, not crash."""
        from verbatim_rag_tpu.rag.verbatim_doc import VerbatimDOC

        doc = "x [!query=first] y [!query=second] z"
        result = VerbatimDOC(self._rag()).process(doc)
        assert "alpha beta" in result.document


class TestSemanticSentenceMode:
    def test_sentence_mode_snaps_to_boundaries(self):
        from verbatim_rag_tpu.models.config import tiny_test_config
        from verbatim_rag_tpu.models.highlighter import SemanticHighlightExtractor
        from verbatim_rag_tpu.models.tokenizer import HashTokenizer

        config = tiny_test_config(max_position_embeddings=256)
        extractor = SemanticHighlightExtractor(
            config=config,
            tokenizer=HashTokenizer(vocab_size=config.vocab_size),
            mode="sentences",
            threshold=0.0,  # random weights accept everything
            min_span_chars=5,
            max_length=128,
            doc_stride=16,
        )
        text = "First sentence here. Second sentence there. Third one."
        spans = extractor.process("q?", text)
        assert spans
        for s, e in spans:
            # Sentence mode ends at boundaries (or text end).
            assert e == len(text) or text[e - 1 : e + 1] in (". ", ".") or text[e - 1] in ".!?\n"

    def test_invalid_mode_rejected(self):
        from verbatim_rag_tpu.models.highlighter import SemanticHighlightExtractor

        with pytest.raises(ValueError):
            SemanticHighlightExtractor(mode="bogus")


class TestVerbatimDocMalformedParams(TestVerbatimDocVariants):
    def test_malformed_max_length_degrades_not_crashes(self):
        """`[!query=x|max_length=20.5]` must render the query's spans with
        the directive ignored — not blow up the whole document (the int()
        lived outside run()'s per-query try)."""
        from verbatim_rag_tpu.rag.verbatim_doc import VerbatimDOC

        doc = "intro [!query=results|max_length=20.5] outro"
        vd = VerbatimDOC(self._rag())
        result = vd.process(doc)
        assert "alpha beta" in result.document
        assert "[!query" not in result.document

    def test_valid_max_length_still_truncates(self):
        from verbatim_rag_tpu.rag.verbatim_doc import VerbatimDOC

        doc = "intro [!query=results|max_length=4] outro"
        vd = VerbatimDOC(self._rag())
        result = vd.process(doc)
        assert "alph\u2026" in result.document or "alph…" in result.document



class TestEnhanceDecoratorShapes:
    def test_bare_two_item_list_is_context_not_answer_tuple(self):
        from verbatim_rag_tpu.core.enhance import verbatim_enhance

        @verbatim_enhance()
        def retrieve(question):
            return ["chunk about X marks the spot", "chunk about Y is here"]

        resp = retrieve("where is X?")
        contents = [d.content for d in resp.documents]
        assert any("X marks" in c for c in contents)  # first chunk kept
        assert len(contents) == 2

    def test_bound_method_self_not_used_as_question(self):
        from verbatim_rag_tpu.core.enhance import verbatim_enhance

        captured = {}

        class Pipeline:
            @verbatim_enhance()
            def run(self, question):
                captured["q_arg"] = question
                return {"context": ["some chunk text for the answer"]}

        resp = Pipeline().run("what is the answer?")
        assert resp.question == "what is the answer?"


class TestCliRecordIterBom:
    def test_json_array_with_leading_whitespace_and_bom(self, tmp_path):
        from verbatim_rag_tpu.core.cli import _iter_records

        p = tmp_path / "records.json"
        p.write_bytes("﻿\n [\n {\"question\": \"q1\", \"context\": [\"c\"]}\n ]\n".encode("utf-8"))
        records = list(_iter_records(str(p)))
        assert records == [{"question": "q1", "context": ["c"]}]

    def test_jsonl_still_works(self, tmp_path):
        from verbatim_rag_tpu.core.cli import _iter_records

        p = tmp_path / "records.jsonl"
        p.write_text('{"question": "q1"}\n\n{"question": "q2"}\n')
        assert [r["question"] for r in _iter_records(str(p))] == ["q1", "q2"]
