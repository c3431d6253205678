"""Three ways to use the RAG-agnostic core on top of YOUR retrieval stack
(parity with the reference's `examples/rag_agnostic_transform.py`).
"""

from _backend import use_cpu_unless_overridden  # noqa: E402

use_cpu_unless_overridden()


from verbatim_rag_tpu.core import LLMClient, VerbatimTransform, verbatim_enhance
from verbatim_rag_tpu.core.templates import TemplateManager

CONTEXT = [
    {
        "content": "The study found a 40 percent reduction in latency after the "
        "migration. Costs fell by 12 percent in the same period.",
        "title": "Migration report",
    }
]


def style_1_transform_object():
    """Direct: hand your retrieved context to VerbatimTransform."""
    vt = VerbatimTransform(
        llm_client=LLMClient(model="gpt-4o-mini"),
        template_mode="static",
    )
    return vt.transform("What did the study find?", CONTEXT)


def style_2_decorator():
    """Decorate an existing RAG function; its context is re-answered verbatim."""

    @verbatim_enhance(max_display_spans=3)
    def my_existing_rag(question):
        answer = "something generated"  # ignored: verbatim answer is derived
        return answer, CONTEXT

    return my_existing_rag("What did the study find?")


def style_3_offline():
    """No LLM at all: neural extractor + static template."""
    from verbatim_rag_tpu.models.highlighter import ModelSpanExtractor

    vt = VerbatimTransform(
        llm_client=None,
        extractor=ModelSpanExtractor(),
        template_manager=TemplateManager(llm_client=None, default_mode="static"),
    )
    return vt.transform("What did the study find?", CONTEXT)


if __name__ == "__main__":
    response = style_3_offline()
    print(response.answer)
