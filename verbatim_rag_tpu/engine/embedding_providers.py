"""Embedding providers: text → dense vectors / sparse term-weight dicts.

Parity: reference `verbatim_rag/embedding_providers.py:14-49` — the
`DenseEmbeddingProvider` / `SparseEmbeddingProvider` contracts
(`embed_text`, `embed_batch`, `get_dimension`). The reference backs these
with torch sentence-transformers; here the neural providers are batched JAX
forwards (`verbatim_rag_tpu.models`), and two deterministic, model-free
providers (hashed bag-of-words dense; hashed tf sparse) serve offline tests
and corpora where no checkpoint is available.
"""

from __future__ import annotations

import re
from abc import ABC, abstractmethod
from typing import Sequence

import numpy as np

from .filters import stable_hash64

_WORD_RE = re.compile(r"[a-z0-9]+")


class DenseEmbeddingProvider(ABC):
    @abstractmethod
    def embed_text(self, text: str) -> np.ndarray:
        """Embed one text → [d] float32."""

    def embed_batch(self, texts: Sequence[str]) -> np.ndarray:
        """Embed many texts → [n, d]; override for true batching."""
        return np.stack([self.embed_text(t) for t in texts])

    @abstractmethod
    def get_dimension(self) -> int: ...


class SparseEmbeddingProvider(ABC):
    @abstractmethod
    def embed_text(self, text: str) -> dict[int, float]:
        """Embed one text → {token_id: weight}."""

    def embed_batch(self, texts: Sequence[str]) -> list[dict[int, float]]:
        return [self.embed_text(t) for t in texts]

    @abstractmethod
    def get_dimension(self) -> int: ...


class HashedBowDenseProvider(DenseEmbeddingProvider):
    """Deterministic dense embeddings: L2-normalized hashed bag of words.

    No model, no weights — usable anywhere, and a meaningful lexical
    similarity signal for tests and cold-start corpora.
    """

    def __init__(self, dim: int = 384):
        self.dim = dim

    def embed_text(self, text: str) -> np.ndarray:
        vec = np.zeros(self.dim, np.float32)
        for tok in _WORD_RE.findall(text.lower()):
            h = int(stable_hash64(tok))
            vec[h % self.dim] += 1.0 if (h >> 32) % 2 else -1.0
        norm = np.linalg.norm(vec)
        return vec / norm if norm > 0 else vec

    def get_dimension(self) -> int:
        return self.dim


class HashedSparseProvider(SparseEmbeddingProvider):
    """Deterministic sparse embeddings: log-scaled hashed term frequencies."""

    def __init__(self, vocab_size: int = 30522):
        self.vocab_size = vocab_size

    def embed_text(self, text: str) -> dict[int, float]:
        counts: dict[int, int] = {}
        for tok in _WORD_RE.findall(text.lower()):
            slot = (int(stable_hash64(tok)) % (self.vocab_size - 1)) + 1
            counts[slot] = counts.get(slot, 0) + 1
        return {t: float(np.log1p(c)) for t, c in counts.items()}

    def get_dimension(self) -> int:
        return self.vocab_size


def __getattr__(name: str):
    # Lazy: the neural providers pull in JAX + tokenizers.
    if name in ("JaxDenseProvider", "JaxSpladeProvider"):
        from verbatim_rag_tpu.models import providers as model_providers

        return getattr(model_providers, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
