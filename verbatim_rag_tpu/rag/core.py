"""VerbatimRAG — the end-to-end orchestrator.

Parity: reference `verbatim_rag/core.py` — constructor dependency injection
(L58-108), intent short-circuit (L230-235), retrieval with
filter/hybrid_weights/rrf_k passthrough (L237-246), reranking with fallback
to the original order on failure (L125-143), structured-mode branch
(template-driven extraction, L279-303), standard extract →
`_rank_and_split_spans` (flatten preserving extractor order, first
``max_display_spans`` display, rest citation-only, L174-193) → template →
clean → build_response, plus the full async mirror (L305-400).

TPU-first defaults: the extractor defaults to the on-device
`ModelSpanExtractor` when no LLM client is configured — the fully offline
path mirroring the reference's CPU-only quickstart (`README.md:41-44`) —
and to `LLMSpanExtractor` when one is.
"""

from __future__ import annotations

import logging
from typing import Any, Mapping

from verbatim_rag_tpu.core.extractors import LLMSpanExtractor, SpanExtractor
from verbatim_rag_tpu.core.llm_client import LLMClient
from verbatim_rag_tpu.core.models import QueryResponse, StructuredAnswer
from verbatim_rag_tpu.core.response_builder import ResponseBuilder
from verbatim_rag_tpu.core.templates import TemplateManager

from .intent import IntentDetector
from .rerankers import Reranker

logger = logging.getLogger(__name__)


class VerbatimRAG:
    """question → retrieve → (rerank) → extract → template → cited answer."""

    def __init__(
        self,
        index,
        llm_client: LLMClient | None = None,
        extractor: SpanExtractor | None = None,
        template_manager: TemplateManager | None = None,
        response_builder: ResponseBuilder | None = None,
        intent_detector: IntentDetector | None = None,
        reranker: Reranker | None = None,
        k: int = 5,
        max_display_spans: int = 5,
        template_mode: str | None = None,
    ):
        self.index = index
        self.llm_client = llm_client
        self.k = k
        self.max_display_spans = max_display_spans

        if extractor is not None:
            self.extractor = extractor
        elif llm_client is not None:
            self.extractor = LLMSpanExtractor(llm_client=llm_client)
        else:
            from verbatim_rag_tpu.models.highlighter import ModelSpanExtractor

            self.extractor = ModelSpanExtractor()

        default_mode = template_mode or ("contextual" if llm_client else "static")
        self.template_manager = template_manager or TemplateManager(
            llm_client=llm_client, default_mode=default_mode
        )
        self.response_builder = response_builder or ResponseBuilder()
        self.intent_detector = intent_detector
        self.reranker = reranker
        self._wire_routing_embeddings()

    def _wire_routing_embeddings(self) -> None:
        """Route question-specific templates with the index's dense provider.

        The reference routes with a pretrained MiniLM
        (`templates/question_specific.py:140-187`); the equivalent here is
        whatever embedding space the index actually retrieves in — neural
        when the user configured one. Only replaces the model-free hashed
        default; an explicitly injected embed_fn wins.
        """
        strategy = self.template_manager.strategies.get("question_specific")
        provider = getattr(self.index, "dense_provider", None)
        if (
            strategy is None
            or provider is None
            or not getattr(strategy, "uses_default_embed", False)
        ):
            return

        def embed(texts):
            import numpy as np

            return np.asarray(provider.embed_batch(list(texts)), dtype=float).tolist()

        strategy.set_embed_fn(embed)

    # -- public sync ---------------------------------------------------------------

    def query(
        self,
        question: str,
        k: int | None = None,
        filter: Any = None,
        hybrid_weights: Mapping[str, float] | None = None,
        rrf_k: int = 60,
        search_params: Mapping[str, Any] | None = None,
        search_type: str | None = None,
        template_mode: str | None = None,
    ) -> QueryResponse:
        decision = self._detect_intent(question)
        if decision is not None and decision.route != "continue":
            return self._short_circuit_response(question, decision)

        results = self.index.query(
            question,
            k=k or self.k,
            filter=filter,
            search_type=search_type,
            hybrid_weights=hybrid_weights,
            rrf_k=rrf_k,
            search_params=search_params,
        )
        results = self._apply_reranker(question, results)

        if self.template_manager.resolve_mode(template_mode) == "structured":
            return self._query_structured(question, results)

        relevant_spans = self.extractor.extract_spans(question, results)
        display, citation = self._rank_and_split_spans(relevant_spans)
        answer = self.template_manager.process(
            question, display, citation, mode=template_mode
        )
        answer = self.response_builder.clean_answer(answer)
        return self.response_builder.build_response(
            question=question,
            answer=answer,
            search_results=results,
            relevant_spans=relevant_spans,
            display_span_count=len(display),
        )

    # -- public async ---------------------------------------------------------------

    async def query_async(
        self,
        question: str,
        k: int | None = None,
        filter: Any = None,
        hybrid_weights: Mapping[str, float] | None = None,
        rrf_k: int = 60,
        search_params: Mapping[str, Any] | None = None,
        search_type: str | None = None,
        template_mode: str | None = None,
    ) -> QueryResponse:
        import asyncio

        if self.intent_detector is not None:
            try:
                decision = await self.intent_detector.detect_async(question)
            except Exception as exc:
                logger.warning("Intent detection failed: %s", exc)
                decision = None
            if decision is not None and decision.route != "continue":
                return self._short_circuit_response(question, decision)

        results = await asyncio.to_thread(
            self.index.query,
            question,
            k or self.k,
            filter,
            search_type,
            hybrid_weights,
            rrf_k,
            search_params,
        )
        if self.reranker is not None:
            try:
                results = await self.reranker.rerank_async(question, results)
            except Exception as exc:
                logger.warning("Reranker failed; keeping retrieval order: %s", exc)

        if self.template_manager.resolve_mode(template_mode) == "structured":
            return await asyncio.to_thread(self._query_structured, question, results)

        relevant_spans = await self.extractor.extract_spans_async(question, results)
        display, citation = self._rank_and_split_spans(relevant_spans)
        answer = await self.template_manager.process_async(
            question, display, citation, mode=template_mode
        )
        answer = self.response_builder.clean_answer(answer)
        return self.response_builder.build_response(
            question=question,
            answer=answer,
            search_results=results,
            relevant_spans=relevant_spans,
            display_span_count=len(display),
        )

    def query_batch(
        self,
        questions: list[str],
        k: int | None = None,
        filter: Any = None,
        hybrid_weights: Mapping[str, float] | None = None,
        rrf_k: int = 60,
        search_params: Mapping[str, Any] | None = None,
        search_type: str | None = None,
        template_mode: str | None = None,
    ) -> list[QueryResponse]:
        """Serve many questions with ONE batched retrieval dispatch.

        Retrieval for the whole batch is a single device program
        (`VerbatimIndex.query_batch`); extraction/templating then run per
        question. Behavior matches :meth:`query` per question: intent
        short-circuits apply, and structured template mode (whose extraction
        is template-driven, not batchable) falls back to per-question
        queries. The batched-serving entry the reference lacks (its query
        path is strictly one-question, `core.py:210-277`).
        """
        if self.template_manager.resolve_mode(template_mode) == "structured":
            return [
                self.query(
                    q, k=k, filter=filter, hybrid_weights=hybrid_weights,
                    rrf_k=rrf_k, search_params=search_params,
                    search_type=search_type, template_mode=template_mode,
                )
                for q in questions
            ]

        short_circuits: dict[int, QueryResponse] = {}
        if self.intent_detector is not None:
            for i, q in enumerate(questions):
                decision = self._detect_intent(q)
                if decision is not None and decision.route != "continue":
                    short_circuits[i] = self._short_circuit_response(q, decision)
        live = [i for i in range(len(questions)) if i not in short_circuits]
        if not live:
            return [short_circuits[i] for i in range(len(questions))]
        live_questions = [questions[i] for i in live]

        results_per_q = self.index.query_batch(
            live_questions,
            k=k or self.k,
            filter=filter,
            search_type=search_type,
            hybrid_weights=hybrid_weights,
            rrf_k=rrf_k,
            search_params=search_params,
        )
        questions = live_questions
        reranked = [
            self._apply_reranker(q, r) for q, r in zip(questions, results_per_q)
        ]
        if hasattr(self.extractor, "extract_spans_multi"):
            # Neural extractor: all questions' windows in one device forward.
            spans_per_q = self.extractor.extract_spans_multi(
                list(zip(questions, reranked))
            )
        else:
            spans_per_q = [
                self.extractor.extract_spans(q, r) for q, r in zip(questions, reranked)
            ]

        responses = []
        for question, results, relevant_spans in zip(questions, reranked, spans_per_q):
            display, citation = self._rank_and_split_spans(relevant_spans)
            answer = self.template_manager.process(
                question, display, citation, mode=template_mode
            )
            answer = self.response_builder.clean_answer(answer)
            responses.append(
                self.response_builder.build_response(
                    question=question,
                    answer=answer,
                    search_results=results,
                    relevant_spans=relevant_spans,
                    display_span_count=len(display),
                )
            )
        if not short_circuits:
            return responses
        # Re-interleave intent short-circuits at their original positions.
        merged, live_iter = [], iter(responses)
        for i in range(len(short_circuits) + len(responses)):
            merged.append(short_circuits[i] if i in short_circuits else next(live_iter))
        return merged

    def warmup(self) -> None:
        """Trigger every jit compile the query path needs (serving startup).

        First-query latency on TPU is dominated by compilation; calling this
        once (e.g. from the API server's startup hook) moves that cost out of
        the first user request.
        """
        if self.index.inspect()["num_chunks"] == 0:
            logger.info("warmup skipped: empty index")
            return
        try:
            self.query("warmup query", k=1)
        except Exception as exc:
            logger.warning("warmup query failed: %s", exc)

    # -- ingest passthrough ------------------------------------------------------------

    def add_document(self, doc) -> str:
        return self.index.add_document(doc)

    def add_documents(self, docs) -> list[str]:
        return self.index.add_documents(docs)

    def add_documents_batch(self, docs, **kwargs) -> list[str]:
        return self.index.add_documents_bulk(docs, **kwargs)

    # -- internals ----------------------------------------------------------------------

    def _detect_intent(self, question: str):
        if self.intent_detector is None:
            return None
        try:
            return self.intent_detector.detect(question)
        except Exception as exc:
            logger.warning("Intent detection failed: %s", exc)
            return None

    def _short_circuit_response(self, question: str, decision) -> QueryResponse:
        answer = decision.answer or "I can't help with that request."
        return QueryResponse(
            question=question,
            answer=answer,
            structured_answer=StructuredAnswer(text=answer, citations=[]),
            documents=[],
        )

    def _apply_reranker(self, question: str, results: list[Any]) -> list[Any]:
        if self.reranker is None or not results:
            return results
        try:
            return self.reranker.rerank(question, results)
        except Exception as exc:
            logger.warning("Reranker failed; keeping retrieval order: %s", exc)
            return results

    def _rank_and_split_spans(
        self, relevant_spans: Mapping[str, list[str]]
    ) -> tuple[list[dict], list[dict]]:
        """Flatten spans preserving extractor order; head displays, tail cites."""
        flattened = [
            {"text": span, "doc_text": doc_text}
            for doc_text, spans in relevant_spans.items()
            for span in spans
        ]
        return flattened[: self.max_display_spans], flattened[self.max_display_spans :]

    def _query_structured(self, question: str, results: list[Any]) -> QueryResponse:
        """Template-driven extraction: the structured template's placeholders
        decide what gets extracted (parity: `core.py:279-303`)."""
        if self.llm_client is None:
            raise ValueError("Structured mode requires an LLM client")
        strategy = self.template_manager.strategies["structured"]
        hints = strategy.get_placeholder_hints()
        doc_texts = [getattr(r, "text", "") for r in results]
        span_map = self.llm_client.extract_structured(
            question, strategy.template, hints, doc_texts
        )

        # Verify each span against its attributed document (provenance).
        from verbatim_rag_tpu.core.span_verify import verify_spans

        verified_map: dict[str, list[dict]] = {}
        relevant_spans: dict[str, list[str]] = {t: [] for t in doc_texts}
        for name, items in span_map.items():
            kept = []
            for item in items:
                doc_idx = int(item.get("doc", 0))
                if not 0 <= doc_idx < len(doc_texts):
                    continue
                ok = verify_spans([item.get("text", "")], doc_texts[doc_idx])
                if ok:
                    kept.append({"text": ok[0], "doc": doc_idx})
                    relevant_spans[doc_texts[doc_idx]].append(ok[0])
            verified_map[name] = kept

        answer = strategy.fill_with_spans(verified_map)
        answer = self.response_builder.clean_answer(answer)
        return self.response_builder.build_response(
            question=question,
            answer=answer,
            search_results=results,
            relevant_spans=relevant_spans,
        )
