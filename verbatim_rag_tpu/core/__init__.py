"""verbatim_rag_tpu.core — device-free verbatim answering.

The RAG-agnostic half of the framework (parity with the reference's
`verbatim_core` package, `verbatim_core/__init__.py:12-24`): span extraction
contracts + prompted extractor, span verification, template strategies,
response building, and the LLM client. Importing this package never touches
JAX or any accelerator.
"""

from .enhance import verbatim_enhance
from .extractors import LLMSpanExtractor, SpanExtractor
from .llm_client import LLMClient
from .models import (
    Citation,
    DocumentWithHighlights,
    Highlight,
    QueryResponse,
    StreamingResponse,
    StreamingResponseType,
    StructuredAnswer,
)
from .response_builder import ResponseBuilder
from .span_verify import find_fuzzy_match, verify_spans
from .templates import (
    ContextualTemplate,
    QuestionSpecificTemplate,
    RandomTemplate,
    StaticTemplate,
    StructuredTemplate,
    TemplateFiller,
    TemplateManager,
    TemplateStrategy,
)
from .transform import VerbatimTransform, verbatim_query, verbatim_query_async
from .universal_document import UniversalDocument

__version__ = "0.5.2"

__all__ = [
    "Citation",
    "ContextualTemplate",
    "DocumentWithHighlights",
    "Highlight",
    "LLMClient",
    "LLMSpanExtractor",
    "QueryResponse",
    "QuestionSpecificTemplate",
    "RandomTemplate",
    "ResponseBuilder",
    "SpanExtractor",
    "StaticTemplate",
    "StreamingResponse",
    "StreamingResponseType",
    "StructuredAnswer",
    "StructuredTemplate",
    "TemplateFiller",
    "TemplateManager",
    "TemplateStrategy",
    "UniversalDocument",
    "VerbatimTransform",
    "find_fuzzy_match",
    "verbatim_enhance",
    "verbatim_query",
    "verbatim_query_async",
    "verify_spans",
]
