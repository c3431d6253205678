"""VerbatimRAG orchestration: the fully offline TPU end-to-end slice."""

from unittest.mock import MagicMock

import numpy as np
import pytest

pytest.importorskip("jax")

from verbatim_rag_tpu.core.templates import TemplateManager
from verbatim_rag_tpu.engine.embedding_providers import HashedBowDenseProvider
from verbatim_rag_tpu.engine.index import VerbatimIndex
from verbatim_rag_tpu.rag.core import VerbatimRAG
from verbatim_rag_tpu.rag.intent import IntentDecision, IntentSpec, LLMIntentDetector
from verbatim_rag_tpu.rag.rerankers import BaseReranker
from verbatim_rag_tpu.rag.streaming import StreamingRAG

DOC = {
    "content": (
        "# Solar Energy\n\nSolar panels convert sunlight into electricity. "
        "They are made of photovoltaic cells. Wind turbines are different machines."
    ),
    "title": "Solar",
    "source": "solar.md",
}


class SubstringExtractor:
    """Deterministic extractor: verbatim sentences containing a keyword."""

    def __init__(self, keyword="solar"):
        import re

        self.pattern = re.compile(rf"[^.\n#]*{keyword}[^.\n]*\.", re.IGNORECASE)

    def extract_spans(self, question, search_results):
        out = {}
        for r in search_results:
            text = getattr(r, "text", "")
            out[text] = [m.group(0).strip() for m in self.pattern.finditer(text)]
        return out

    async def extract_spans_async(self, question, search_results):
        return self.extract_spans(question, search_results)


@pytest.fixture()
def rag():
    index = VerbatimIndex(dense_provider=HashedBowDenseProvider(dim=64))
    index.add_documents([DOC])
    return VerbatimRAG(
        index,
        extractor=SubstringExtractor(),
        template_manager=TemplateManager(llm_client=None, default_mode="static"),
    )


class TestQuery:
    def test_end_to_end_offline(self, rag):
        response = rag.query("How do solar panels work?")
        assert response.question == "How do solar panels work?"
        assert "Solar panels convert sunlight into electricity" in response.answer
        assert response.structured_answer.citations
        doc = response.documents[0]
        for h in doc.highlights:
            assert doc.content[h.start : h.end] == h.text  # provenance exactness

    def test_intent_short_circuit(self, rag):
        detector = MagicMock()
        detector.detect.return_value = IntentDecision(
            intent="greeting", route="predefined", answer="Hello!"
        )
        rag.intent_detector = detector
        response = rag.query("hi there")
        assert response.answer == "Hello!"
        assert response.documents == []

    def test_reranker_failure_keeps_order(self, rag):
        reranker = MagicMock()
        reranker.rerank.side_effect = RuntimeError("boom")
        rag.reranker = reranker
        response = rag.query("How do solar panels work?")
        assert "Solar panels" in response.answer

    def test_reranker_reorders(self, rag):
        class ReverseReranker(BaseReranker):
            def score(self, question, texts):
                return list(range(len(texts)))  # later = higher

        rag.reranker = ReverseReranker()
        response = rag.query("How do solar panels work?")
        assert response.answer

    async def test_query_async(self, rag):
        response = await rag.query_async("How do solar panels work?")
        assert "Solar panels convert sunlight" in response.answer


class TestStreaming:
    def test_stages_in_order(self, rag):
        events = StreamingRAG(rag).stream_query_sync("How do solar panels work?")
        types = [e["type"] for e in events]
        assert types == ["documents", "progress", "highlights", "answer"]
        assert events[-1]["done"] is True
        highlights_docs = events[2]["data"]["documents"]
        assert any(d["highlights"] for d in highlights_docs)

    def test_intent_short_circuit_stream(self, rag):
        detector = MagicMock()

        async def detect_async(q):
            return IntentDecision(route="skip", answer="Blocked.")

        detector.detect_async = detect_async
        rag.intent_detector = detector
        events = StreamingRAG(rag).stream_query_sync("whatever")
        assert len(events) == 1
        assert events[0]["data"]["answer"] == "Blocked."


class TestIntentDetector:
    def test_llm_intent_routing(self):
        client = MagicMock()
        client.complete.return_value = (
            '{"intent": "greeting", "confidence": 0.9, "reason": "says hi"}'
        )
        detector = LLMIntentDetector(
            client,
            intents=[
                IntentSpec(
                    name="greeting", examples=["hi"], route="predefined", answer="Hey!"
                )
            ],
        )
        decision = detector.detect("hello there")
        assert decision.route == "predefined"
        assert decision.answer == "Hey!"

    def test_low_confidence_continues(self):
        client = MagicMock()
        client.complete.return_value = '{"intent": "greeting", "confidence": 0.2}'
        detector = LLMIntentDetector(
            client, intents=[IntentSpec(name="greeting", route="skip")]
        )
        assert detector.detect("hmm").route == "continue"

    def test_parse_failure_continues(self):
        client = MagicMock()
        client.complete.return_value = "not json"
        assert LLMIntentDetector(client).detect("q").route == "continue"


class TestNeuralExtractorPath:
    def test_model_span_extractor_returns_verbatim_substrings(self):
        from verbatim_rag_tpu.models.config import tiny_test_config
        from verbatim_rag_tpu.models.highlighter import ModelSpanExtractor

        extractor = ModelSpanExtractor(
            config=tiny_test_config(),
            threshold=0.0,  # random weights: accept everything
            min_span_chars=5,
            max_length=64,
            doc_stride=8,
        )
        text = "Solar panels convert sunlight into electricity for homes."
        result = MagicMock()
        result.text = text
        spans = extractor.extract_spans("how do panels work", [result])
        for span in spans[text]:
            assert span in text  # every span is verbatim

    def test_select_spans_postprocessing(self):
        from verbatim_rag_tpu.models.highlighter import select_spans_from_token_probs

        #                 0     1      2      3     4
        offsets = [(0, 10), (11, 20), (25, 35), (60, 70), (72, 80)]
        probs = np.array([0.9, 0.9, 0.9, 0.1, 0.9])
        # tokens 0-2 merge (gaps ≤ 20); token 4 region is too short (8 < 30)
        spans = select_spans_from_token_probs(
            probs, offsets, threshold=0.5, min_span_chars=30, merge_gap_chars=20
        )
        assert spans == [(0, 35)]

    def test_merge_gap(self):
        from verbatim_rag_tpu.models.highlighter import select_spans_from_token_probs

        offsets = [(0, 10), (15, 25)]
        probs = np.array([0.9, 0.9])
        spans = select_spans_from_token_probs(
            probs, offsets, threshold=0.5, min_span_chars=5, merge_gap_chars=4
        )
        assert spans == [(0, 10), (15, 25)]  # gap 5 > 4: no merge
        spans = select_spans_from_token_probs(
            probs, offsets, threshold=0.5, min_span_chars=5, merge_gap_chars=5
        )
        assert spans == [(0, 25)]


class TestQueryBatch:
    def test_batched_questions(self, rag):
        responses = rag.query_batch(
            ["How do solar panels work?", "what are photovoltaic cells?"]
        )
        assert len(responses) == 2
        assert "Solar panels convert sunlight" in responses[0].answer
        for r in responses:
            assert r.structured_answer is not None


class TestGoldenEndToEnd:
    def test_pinned_answer_text(self, rag):
        """Golden regression: deterministic providers + extractor must keep
        producing byte-identical answers across rounds."""
        answer = rag.query("How do solar panels work?").answer
        assert answer == (
            "## Response\n\n"
            "The following is an unordered list of verbatim excerpts from the "
            "source documents. No synthesis or ranking is implied:\n\n"
            "[1] Solar panels convert sunlight into electricity.\n\n"
            "---\n"
            "*These excerpts are taken verbatim from the source documents to "
            "ensure accuracy.*"
        )


class TestRoutingEmbeddings:
    def test_question_specific_routes_with_index_provider(self, mock_llm_client):
        from verbatim_rag_tpu.engine.embedding_providers import HashedBowDenseProvider
        from verbatim_rag_tpu.engine.index import VerbatimIndex
        from verbatim_rag_tpu.rag.core import VerbatimRAG

        index = VerbatimIndex(dense_provider=HashedBowDenseProvider(dim=32))
        rag = VerbatimRAG(index, llm_client=mock_llm_client)
        strategy = rag.template_manager.strategies["question_specific"]
        # The hashed-BoW template default was replaced by the index's provider.
        assert not strategy.uses_default_embed
        strategy.add_template("About solar: [DISPLAY_SPANS]", ["how do solar panels work?"])
        strategy.add_template("About wind: [DISPLAY_SPANS]", ["tell me about wind turbines"])
        assert "solar" in strategy.generate("solar panel efficiency?", [])
        assert "wind" in strategy.generate("offshore wind farms?", [])

    def test_explicit_embed_fn_wins(self, mock_llm_client):
        from verbatim_rag_tpu.core.templates import TemplateManager
        from verbatim_rag_tpu.core.templates.question_specific import (
            QuestionSpecificTemplate,
        )
        from verbatim_rag_tpu.engine.embedding_providers import HashedBowDenseProvider
        from verbatim_rag_tpu.engine.index import VerbatimIndex
        from verbatim_rag_tpu.rag.core import VerbatimRAG

        def custom(texts):
            return [[1.0, 0.0] for _ in texts]

        tm = TemplateManager(llm_client=mock_llm_client)
        tm.strategies["question_specific"] = QuestionSpecificTemplate(embed_fn=custom)
        index = VerbatimIndex(dense_provider=HashedBowDenseProvider(dim=32))
        rag = VerbatimRAG(index, llm_client=mock_llm_client, template_manager=tm)
        assert rag.template_manager.strategies["question_specific"].embed_fn is custom


class TestQueryBatchParity:
    """query_batch must behave like query per question (review finding)."""

    def test_intent_short_circuits_apply_in_batch(self, mock_llm_client):
        from verbatim_rag_tpu.engine.embedding_providers import HashedBowDenseProvider
        from verbatim_rag_tpu.engine.index import VerbatimIndex
        from verbatim_rag_tpu.rag.core import VerbatimRAG
        from verbatim_rag_tpu.rag.intent import IntentDecision, IntentDetector

        class Greeter(IntentDetector):
            def detect(self, question):
                if "hello" in question:
                    return IntentDecision(
                        intent="greeting", route="predefined", answer="Hi there!"
                    )
                return IntentDecision(intent="question", route="continue")

        index = VerbatimIndex(dense_provider=HashedBowDenseProvider(dim=32))
        index.add_documents([{"content": "solar panels convert light", "title": "t"}])
        rag = VerbatimRAG(index, llm_client=mock_llm_client, intent_detector=Greeter())
        out = rag.query_batch(["hello friend", "solar panels?", "hello again"])
        assert out[0].answer == "Hi there!"
        assert out[2].answer == "Hi there!"
        assert "Hi there" not in out[1].answer
        assert out[1].question == "solar panels?"


class TestJinaV3Reranker:
    """Local listwise reranker adapter (ref `rerankers.py:137-164`): the
    model's own `.rerank(query, texts, top_n)` drives the order."""

    class _FakeJinaModel:
        def rerank(self, query, texts, top_n):
            # Reverse order, and (like the real model with top_n) may
            # return fewer items than it was given.
            order = list(range(len(texts)))[::-1]
            return [{"index": i, "relevance_score": 1.0} for i in order[:top_n]]

    def _results(self, n):
        from types import SimpleNamespace

        return [SimpleNamespace(text=f"t{i}", enhanced_text=f"e{i}") for i in range(n)]

    def test_reorders_head_keeps_tail(self):
        from verbatim_rag_tpu.rag.rerankers import JinaV3Reranker

        rr = JinaV3Reranker(rerank_k=3, _model_obj=self._FakeJinaModel())
        out = rr.rerank("q", self._results(5))
        assert [r.text for r in out] == ["t2", "t1", "t0", "t3", "t4"]

    def test_partial_model_output_preserves_all_results(self):
        from verbatim_rag_tpu.rag.rerankers import JinaV3Reranker

        class Partial:
            def rerank(self, query, texts, top_n):
                return [{"index": 1}]  # model ranked only one item

        rr = JinaV3Reranker(rerank_k=4, _model_obj=Partial())
        out = rr.rerank("q", self._results(4))
        assert [r.text for r in out] == ["t1", "t0", "t2", "t3"]

    def test_empty_results_passthrough(self):
        from verbatim_rag_tpu.rag.rerankers import JinaV3Reranker

        rr = JinaV3Reranker(rerank_k=3, _model_obj=self._FakeJinaModel())
        assert rr.rerank("q", []) == []

    def test_text_field_selects_enhanced(self):
        from verbatim_rag_tpu.rag.rerankers import JinaV3Reranker

        seen = {}

        class Spy:
            def rerank(self, query, texts, top_n):
                seen["texts"] = texts
                return [{"index": i} for i in range(len(texts))]

        rr = JinaV3Reranker(rerank_k=3, text_field="enhanced_text", _model_obj=Spy())
        rr.rerank("q", self._results(2))
        assert seen["texts"] == ["e0", "e1"]


class TestBaseRerankerTextField:
    def test_score_receives_selected_field(self):
        from types import SimpleNamespace

        seen = {}

        class R(BaseReranker):
            def score(self, question, texts):
                seen["texts"] = list(texts)
                return [0.0] * len(texts)

        r = R(rerank_k=5, text_field="enhanced_text")
        r.rerank("q", [SimpleNamespace(text="t", enhanced_text="e")])
        assert seen["texts"] == ["e"]


class TestExtractorReviewFixes:
    """Regressions for the round-3 extraction-layer review findings."""

    def _extractor(self, **kwargs):
        from verbatim_rag_tpu.models.config import tiny_test_config
        from verbatim_rag_tpu.models.highlighter import ModelSpanExtractor

        defaults = dict(
            config=tiny_test_config(),
            threshold=0.0,
            min_span_chars=5,
            max_length=64,
            doc_stride=8,
        )
        defaults.update(kwargs)
        return ModelSpanExtractor(**defaults)

    def test_make_windows_terminates_when_budget_below_stride(self):
        from verbatim_rag_tpu.models.highlighter import ModelSpanExtractor

        # budget 16 <= stride 256: step would be negative — must terminate
        # and still cover all tokens.
        windows = ModelSpanExtractor._make_windows(100, 16, 256)
        assert windows[0][0] == 0
        covered = max(s + ln for s, ln in windows)
        assert covered >= 100
        assert len(windows) < 200  # advances at least one token per window

    def test_long_document_tokens_past_8192_are_scored(self):
        """bucket_length used to clamp at 8192, silently truncating the
        whole-document tokenize in _plan — spans after ~8k tokens could
        never be found."""
        extractor = self._extractor(threshold=-1.0, min_span_chars=3)
        # ~9000 words → > 8192 tokens; the unique needle lives at the END.
        context = "word " * 9000 + "needle."
        plan = extractor._plan("find the needle", context)
        assert plan["n_tokens"] > 8192
        # Tokens must reach the very end of the document (the final "." of
        # "needle." is the last char).
        assert plan["offsets"][-1][1] == len(context)
        assert "needle" in context[plan["offsets"][-2][0] : plan["offsets"][-2][1]]

    def test_bucket_length_grows_past_last_bucket(self):
        from verbatim_rag_tpu.models.tokenizer import bucket_length

        assert bucket_length(8192) == 8192
        assert bucket_length(8193) == 16384
        assert bucket_length(20000) == 24576

    def test_sentences_mode_applies_through_extract_spans(self):
        """mode='sentences' must act via the pipeline entry point
        (extract_spans → process_batch), not only via direct process()."""
        from verbatim_rag_tpu.models.config import tiny_test_config
        from verbatim_rag_tpu.models.highlighter import SemanticHighlightExtractor

        extractor = SemanticHighlightExtractor(
            config=tiny_test_config(),
            mode="sentences",
            threshold=0.0,
            min_span_chars=5,
            max_length=64,
            doc_stride=8,
        )
        text = "First sentence here. Second sentence follows. Third one ends."
        result = MagicMock()
        result.text = text
        spans = extractor.extract_spans("anything", [result])[text]
        assert spans  # random weights + threshold 0: something selected
        for s in spans:
            # Sentence snapping: every span starts at a sentence boundary.
            start = text.find(s)
            assert start == 0 or text[start - 1] in " \n"
            assert s.rstrip().endswith(".")

    def test_burst_batch_chunks_forward_and_matches_small_batches(self):
        """>512 window rows are scored in 512-row device slices (the
        round-5 serving OOM fix: a 512-deep request burst must not compile
        an unboundedly tall forward). Chunked results must equal the
        per-pair decode exactly — padding rows never leak across slices."""
        extractor = self._extractor(threshold=-1.0, min_span_chars=3)
        contexts = [f"document number {i} talks about topic {i % 7}." for i in range(600)]
        calls: list[int] = []
        orig = extractor._forward_probs

        def counting(ids, mask):
            calls.append(ids.shape[0])
            return orig(ids, mask)

        extractor._forward_probs = counting
        batched = extractor.process_batch("which topic?", contexts)
        assert len(calls) >= 2 and all(c <= 512 for c in calls)
        extractor._forward_probs = orig
        for i in (0, 511, 512, 599):
            assert batched[i] == extractor.process("which topic?", contexts[i])

    def test_structured_template_rejects_span_only_placeholders(self):
        from verbatim_rag_tpu.core.templates.structured import StructuredTemplate

        st = StructuredTemplate()
        with pytest.raises(ValueError):
            st.validate_template("Refs: [CITATION_REFS]")
        with pytest.raises(ValueError):
            st.validate_template("Only [SPAN_2] here")
        st.validate_template("[METHODOLOGY] and [DISPLAY_SPANS]")  # fine


class TestIntentDefaultRoute:
    def test_default_route_honored_for_low_confidence_and_unknown(self, mock_llm_client):
        from verbatim_rag_tpu.rag.intent import IntentSpec, LLMIntentDetector

        mock_llm_client.complete.return_value = (
            '{"intent": "greeting", "confidence": 0.3, "reason": "low"}'
        )
        det = LLMIntentDetector(
            mock_llm_client,
            intents=[IntentSpec(name="greeting", route="predefined", answer="hi")],
            min_confidence=0.5,
            default_route="skip",
        )
        assert det.detect("hello").route == "skip"  # below min_confidence

        mock_llm_client.complete.return_value = (
            '{"intent": "unknown_thing", "confidence": 0.9, "reason": "?"}'
        )
        assert det.detect("hello").route == "skip"  # intent not configured

    def test_default_default_route_is_continue(self, mock_llm_client):
        from verbatim_rag_tpu.rag.intent import LLMIntentDetector

        mock_llm_client.complete.return_value = (
            '{"intent": "x", "confidence": 0.1, "reason": ""}'
        )
        det = LLMIntentDetector(mock_llm_client, intents=[])
        assert det.detect("q").route == "continue"
