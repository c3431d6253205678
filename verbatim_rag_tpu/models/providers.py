"""JAX-backed embedding providers for the engine.

The neural implementations of the provider contracts
(`engine/embedding_providers.py`): batched, jitted, bucket-padded forwards —
the TPU equivalents of the torch `SentenceTransformersProvider` and
`SpladeProvider` (`verbatim_rag/embedding_providers.py:52-169`).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from verbatim_rag_tpu.engine.embedding_providers import (
    DenseEmbeddingProvider,
    SparseEmbeddingProvider,
)

from .config import EncoderConfig, minilm_config
from .encoder import embed_texts, init_encoder_params
from .splade import init_splade_params, splade_topk_terms
from .tokenizer import HashTokenizer, Tokenizer

Params = dict[str, Any]


class JaxDenseProvider(DenseEmbeddingProvider):
    """Dense sentence embeddings: encoder → masked mean-pool → L2 norm."""

    def __init__(
        self,
        params: Params | None = None,
        config: EncoderConfig | None = None,
        tokenizer: Tokenizer | None = None,
        max_length: int = 512,
        batch_size: int = 64,
        seed: int = 0,
    ):
        self.config = config or minilm_config()
        self.params = params or init_encoder_params(jax.random.PRNGKey(seed), self.config)
        self.tokenizer = tokenizer or HashTokenizer(vocab_size=self.config.vocab_size)
        self.max_length = max_length
        self.batch_size = batch_size

    def embed_text(self, text: str) -> np.ndarray:
        return self.embed_batch([text])[0]

    def embed_batch(self, texts: Sequence[str]) -> np.ndarray:
        """Pipelined batched encode: host tokenization of chunk i+1 overlaps
        the (async-dispatched) device forward of chunk i; results are only
        materialized at the end. Partial final chunks are padded to the full
        batch size — a fresh batch shape would trigger a recompile."""
        pending = []
        for start in range(0, len(texts), self.batch_size):
            chunk = list(texts[start : start + self.batch_size])
            real = len(chunk)
            if real < self.batch_size:
                chunk += [""] * (self.batch_size - real)
            enc = self.tokenizer.encode_batch(chunk, max_length=self.max_length)
            pending.append(
                (
                    embed_texts(
                        self.params,
                        self.config,
                        jnp.asarray(enc.input_ids),
                        jnp.asarray(enc.attention_mask),
                    ),
                    real,
                )
            )
        return np.concatenate([np.asarray(v)[:real] for v, real in pending], axis=0)

    def get_dimension(self) -> int:
        return self.config.hidden_size


class JaxSpladeProvider(SparseEmbeddingProvider):
    """SPLADE sparse embeddings with on-device top-k term selection."""

    def __init__(
        self,
        params: Params | None = None,
        config: EncoderConfig | None = None,
        tokenizer: Tokenizer | None = None,
        max_length: int = 512,
        batch_size: int = 32,
        max_nnz: int = 128,
        seed: int = 0,
    ):
        self.config = config or minilm_config()
        self.params = params or init_splade_params(jax.random.PRNGKey(seed), self.config)
        self.tokenizer = tokenizer or HashTokenizer(vocab_size=self.config.vocab_size)
        self.max_length = max_length
        self.batch_size = batch_size
        self.max_nnz = max_nnz

    def embed_text(self, text: str) -> dict[int, float]:
        return self.embed_batch([text])[0]

    def embed_batch(self, texts: Sequence[str]) -> list[dict[int, float]]:
        """Pipelined like the dense provider: dispatch every chunk's forward
        before materializing any of them."""
        pending = []
        for start in range(0, len(texts), self.batch_size):
            chunk = list(texts[start : start + self.batch_size])
            real = len(chunk)
            if real < self.batch_size:
                chunk += [""] * (self.batch_size - real)  # fixed batch shape
            enc = self.tokenizer.encode_batch(chunk, max_length=self.max_length)
            pending.append(
                (
                    splade_topk_terms(
                        self.params,
                        self.config,
                        jnp.asarray(enc.input_ids),
                        jnp.asarray(enc.attention_mask),
                        max_nnz=self.max_nnz,
                    ),
                    real,
                )
            )
        out: list[dict[int, float]] = []
        for (ids, weights), real in pending:
            ids_np, w_np = np.asarray(ids)[:real], np.asarray(weights)[:real]
            for row_ids, row_w in zip(ids_np, w_np):
                out.append(
                    {int(t): float(w) for t, w in zip(row_ids, row_w) if w > 0.0}
                )
        return out

    def get_dimension(self) -> int:
        return self.config.vocab_size
