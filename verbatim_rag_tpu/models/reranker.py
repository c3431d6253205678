"""Cross-encoder reranking on TPU.

TPU-native replacement for the reference's reranker family
(`verbatim_rag/rerankers.py`): the local CrossEncoder path
(`SentenceTransformersReranker`, L109-134) becomes a batched JAX forward —
(question, passage) pairs → CLS → linear score. The adapter pattern and
"rerank only the top `rerank_k`, keep the tail order" contract (L25-41) are
preserved in `verbatim_rag_tpu.rag.rerankers`; this module is the model.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import EncoderConfig, minilm_config
from .encoder import _dense, cls_pool, encoder_forward, init_encoder_params
from .tokenizer import HashTokenizer, Tokenizer

Params = dict[str, Any]


def init_cross_encoder_params(key: jax.Array, config: EncoderConfig) -> Params:
    k_enc, k_head = jax.random.split(key)
    params = init_encoder_params(k_enc, config)
    h = config.hidden_size
    params["pooler"] = {
        "kernel": jax.random.normal(k_head, (h, h), jnp.float32) * 0.02,
        "bias": jnp.zeros((h,), jnp.float32),
    }
    params["score"] = {
        "kernel": jax.random.normal(jax.random.fold_in(k_head, 1), (h, 1), jnp.float32) * 0.02,
        "bias": jnp.zeros((1,), jnp.float32),
    }
    return params


@partial(jax.jit, static_argnames=("config",))
def cross_encoder_scores(
    params: Params,
    config: EncoderConfig,
    input_ids: jax.Array,  # [B, S] packed (query, passage) pairs
    attention_mask: jax.Array,
) -> jax.Array:
    """Relevance score per pair — [B] float32."""
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    hidden = encoder_forward(params, config, input_ids, attention_mask)
    pooled = jnp.tanh(_dense(params["pooler"], cls_pool(hidden), dtype))
    return _dense(params["score"], pooled, dtype)[:, 0]


class JaxCrossEncoder:
    """Host-facing wrapper: (question, texts) → scores."""

    def __init__(
        self,
        params: Params | None = None,
        config: EncoderConfig | None = None,
        tokenizer: Tokenizer | None = None,
        max_length: int = 512,
        seed: int = 0,
    ):
        self.config = config or minilm_config()
        self.params = params or init_cross_encoder_params(jax.random.PRNGKey(seed), self.config)
        self.tokenizer = tokenizer or HashTokenizer(vocab_size=self.config.vocab_size)
        self.max_length = max_length

    def score(self, question: str, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros(0, np.float32)
        enc = self.tokenizer.encode_batch(
            [question] * len(texts), pair=list(texts), max_length=self.max_length
        )
        scores = cross_encoder_scores(
            self.params, self.config, jnp.asarray(enc.input_ids), jnp.asarray(enc.attention_mask)
        )
        return np.asarray(scores)
