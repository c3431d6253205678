"""Shared fixtures.

JAX tests run on a virtual 8-device CPU mesh (SURVEY.md §4: the TPU-build
equivalent of the reference's dependency-free unit tier) — sharding logic is
validated without TPU hardware. The env vars must be set before jax imports.
"""

import os

# Hard override: the ambient environment pins JAX_PLATFORMS=axon (real TPU
# via tunnel); unit tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import asyncio
import inspect
from unittest.mock import MagicMock

import pytest

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except (ImportError, AttributeError):
    pass


def pytest_pyfunc_call(pyfuncitem):
    """Minimal asyncio auto-mode: pytest-asyncio is not in this image."""
    func = pyfuncitem.obj
    if inspect.iscoroutinefunction(func):
        kwargs = {
            name: pyfuncitem.funcargs[name]
            for name in inspect.signature(func).parameters
            if name in pyfuncitem.funcargs
        }
        asyncio.run(func(**kwargs))
        return True
    return None


class FakeSearchResult:
    """Duck-typed search result (extractors only need .text/.metadata)."""

    def __init__(self, text, title="", source="", score=1.0, rid="test_id"):
        self.text = text
        self.metadata = {"title": title, "source": source}
        self.id = rid
        self.score = score


@pytest.fixture
def make_search_result():
    def _make(text, title="", source="", score=1.0, rid="test_id"):
        return FakeSearchResult(text, title=title, source=source, score=score, rid=rid)

    return _make


@pytest.fixture
def sample_spans():
    display = [
        {"text": "The study found that X leads to Y.", "doc_text": "doc1"},
        {"text": "Results show Z is significant.", "doc_text": "doc2"},
    ]
    citation = [
        {"text": "Additional context about the methodology.", "doc_text": "doc3"},
    ]
    return display, citation


@pytest.fixture
def mock_llm_client():
    """A MagicMock standing in for LLMClient — no network, fully scriptable."""
    client = MagicMock()
    client.extract_spans.return_value = {}
    return client
