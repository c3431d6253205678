"""RAG-agnostic verbatim transform: context in, cited answer out.

Parity: reference `verbatim_core/transform.py` — coerce arbitrary context
items (dicts with content/text, or objects with a ``.text`` attribute) into
result views, extract + verify spans, split display vs citation, template,
and build the response.
"""

from __future__ import annotations

from typing import Any, Iterable

from .extractors import LLMSpanExtractor, SpanExtractor
from .llm_client import LLMClient
from .models import QueryResponse
from .providers import RAGProvider
from .response_builder import ResponseBuilder
from .templates import TemplateManager


class _ResultView:
    """Duck-typed search result: just enough surface for the extractors."""

    def __init__(
        self,
        text: str,
        metadata: dict[str, Any] | None = None,
        rid: str = "ctx",
        score: float = 1.0,
    ):
        self.id = rid
        self.text = text
        self.metadata = metadata or {}
        self.score = score


def _coerce_context_to_results(context: Iterable[Any]) -> list[_ResultView]:
    results: list[_ResultView] = []
    for i, item in enumerate(context):
        if hasattr(item, "text") and isinstance(getattr(item, "text"), str):
            results.append(
                _ResultView(
                    text=item.text,
                    metadata=getattr(item, "metadata", {}) or {},
                    rid=f"ctx_{i}",
                )
            )
            continue
        if not isinstance(item, dict):
            raise TypeError("Each context item must be a dict with 'content' (or 'text').")
        text = item.get("content") or item.get("text")
        if not text or not isinstance(text, str):
            raise ValueError("Context item missing 'content' (or 'text') string field.")
        metadata = {
            "title": item.get("title", ""),
            "source": item.get("source", ""),
            **(item.get("metadata") or {}),
        }
        results.append(_ResultView(text=text, metadata=metadata, rid=f"ctx_{i}"))
    return results


def _split_spans(
    relevant_spans: dict[str, list[str]], max_display: int
) -> tuple[list[dict], list[dict]]:
    """Flatten (preserving extractor order) and split display vs citation."""
    flattened = [
        {"text": span, "doc_text": doc_text}
        for doc_text, spans in relevant_spans.items()
        for span in spans
    ]
    return flattened[:max_display], flattened[max_display:]


class VerbatimTransform:
    """Apply verbatim extraction + templating to any retrieval context."""

    def __init__(
        self,
        llm_client: LLMClient | None = None,
        extractor: SpanExtractor | None = None,
        template_manager: TemplateManager | None = None,
        max_display_spans: int = 5,
        extraction_mode: str = "auto",
        template_mode: str = "contextual",
        span_match_mode: str = "exact",
        fuzzy_threshold: float = 0.8,
        extraction_prompt: str | None = None,
        system_prompt: str | None = None,
    ):
        self.llm_client = llm_client or LLMClient()
        self.extractor = extractor or LLMSpanExtractor(
            llm_client=self.llm_client,
            extraction_mode=extraction_mode,
            max_display_spans=max_display_spans,
            span_match_mode=span_match_mode,
            fuzzy_threshold=fuzzy_threshold,
            extraction_prompt=extraction_prompt,
            system_prompt=system_prompt,
        )
        self.template_manager = template_manager or TemplateManager(
            llm_client=self.llm_client, default_mode=template_mode
        )
        self.response_builder = ResponseBuilder()
        self.max_display_spans = max_display_spans

    def transform(
        self,
        question: str,
        context: Iterable[Any],
        answer: str | None = None,  # reserved; verbatim answer is derived from context
    ) -> QueryResponse:
        search_results = _coerce_context_to_results(list(context))
        relevant_spans = self.extractor.extract_spans(question, search_results)
        display, citation = _split_spans(relevant_spans, self.max_display_spans)
        answer_text = self.template_manager.process(question, display, citation)
        answer_text = self.response_builder.clean_answer(answer_text)
        return self.response_builder.build_response(
            question=question,
            answer=answer_text,
            search_results=search_results,
            relevant_spans=relevant_spans,
            display_span_count=len(display),
        )

    async def transform_async(
        self,
        question: str,
        context: Iterable[Any],
        answer: str | None = None,
    ) -> QueryResponse:
        search_results = _coerce_context_to_results(list(context))
        relevant_spans = await self.extractor.extract_spans_async(question, search_results)
        display, citation = _split_spans(relevant_spans, self.max_display_spans)
        answer_text = await self.template_manager.process_async(question, display, citation)
        answer_text = self.response_builder.clean_answer(answer_text)
        return self.response_builder.build_response(
            question=question,
            answer=answer_text,
            search_results=search_results,
            relevant_spans=relevant_spans,
            display_span_count=len(display),
        )


def verbatim_query(
    provider: RAGProvider,
    question: str,
    k: int = 5,
    filter: str | None = None,
    answer: str | None = None,
) -> QueryResponse:
    context = provider.retrieve(question, k=k, filter=filter)
    return VerbatimTransform().transform(question=question, context=context, answer=answer)


async def verbatim_query_async(
    provider: RAGProvider,
    question: str,
    k: int = 5,
    filter: str | None = None,
    answer: str | None = None,
) -> QueryResponse:
    context = await provider.retrieve_async(question, k=k, filter=filter)
    return await VerbatimTransform().transform_async(
        question=question, context=context, answer=answer
    )
