"""Dense brute-force retrieval: tiled matmul + top-k.

TPU-native replacement for the reference's Milvus `IVF_FLAT` / COSINE index
(`vector_stores/milvus_local.py:111-117`). On TPU, exact brute-force over an
HBM-resident `[N, d]` matrix is a single MXU-bound matmul — at 1M×384 the
scan is HBM-bandwidth-bound (~1ms/batch on v5e) and *exact*, so recall@k
equals ground truth by construction (beats IVF_FLAT's approximate recall at
equal memory).

Design rules: corpus stored row-normalized in bfloat16 (cosine ≡ dot),
queries normalized at encode time, accumulation in float32
(`preferred_element_type`), static `k`, invalid rows masked to -inf before
`lax.top_k`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def normalize_rows(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along the last axis (float32 math)."""
    x = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


@partial(jax.jit, static_argnames=("k",))
def dense_topk(
    corpus: jax.Array,  # [N, d] row-normalized, bf16 or f32
    queries: jax.Array,  # [B, d] row-normalized
    k: int,
    mask: jax.Array | None = None,  # [N] bool — False rows never retrieved
) -> tuple[jax.Array, jax.Array]:
    """Exact cosine top-k: returns (scores [B, k], row indices [B, k]).

    One `[B, d] @ [d, N]` MXU matmul; masked rows score -inf. ``k`` is static
    so repeated queries hit the same executable.
    """
    scores = jnp.dot(
        queries.astype(corpus.dtype), corpus.T, preferred_element_type=jnp.float32
    )  # [B, N]
    if mask is not None:
        scores = jnp.where(mask[None, :], scores, NEG_INF)
    return jax.lax.top_k(scores, k)


@partial(jax.jit, static_argnames=("k",))
def dense_scores_topk_masked(
    corpus: jax.Array,
    queries: jax.Array,
    k: int,
    mask: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Alias of :func:`dense_topk` with a required mask (filtered search)."""
    return dense_topk(corpus, queries, k, mask)
