"""Fused hybrid query pipeline: dense + sparse + RRF in one jitted call.

The hot serving path (BASELINE.md: hybrid QPS at 1M chunks). Both scoring
passes and the weighted-RRF fusion happen in a single XLA program — no host
round-trips between methods, one device dispatch per query batch. This is
the TPU-native replacement for the reference's two Milvus RPCs + client-side
merge (`milvus_base.py:261-294`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .dense import NEG_INF
from .fusion import rrf_fuse_device
from .sparse import sparse_topk


@partial(jax.jit, static_argnames=("fetch_k", "depth", "exact_topk"))
def hybrid_candidates(
    dense_corpus: jax.Array,  # [N, d] row-normalized bf16
    sketch_corpus: jax.Array,  # [N, d_p] sparse sketches bf16
    dense_q: jax.Array,  # [B, d]
    sketch_q: jax.Array,  # [B, d_p]
    fetch_k: int,
    depth: int,
    mask: jax.Array | None = None,
    exact_topk: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Both hybrid candidate generations in ONE device program.

    Returns (dense candidate rows [B, fetch_k], sparse candidate rows
    [B, depth]; −1 where masked out). One dispatch + one host sync per query
    batch — on tunneled/remote backends the round-trip dominates, so fusing
    the two matmul top-ks halves the fixed cost.

    k-selection uses the TPU-native `approx_max_k` (the hardware MIPS top-k;
    recall target 0.99 per list) unless ``exact_topk`` — candidate lists feed
    RRF/rescoring, so per-list selection recall folds into the same knob as
    the sketch depth.
    """
    select = (
        jax.lax.top_k
        if exact_topk
        else partial(jax.lax.approx_max_k, recall_target=0.99)
    )
    d_scores = jnp.dot(
        dense_q.astype(dense_corpus.dtype), dense_corpus.T, preferred_element_type=jnp.float32
    )
    s_scores = jnp.dot(
        sketch_q.astype(sketch_corpus.dtype), sketch_corpus.T, preferred_element_type=jnp.float32
    )
    if mask is not None:
        d_scores = jnp.where(mask[None, :], d_scores, NEG_INF)
        s_scores = jnp.where(mask[None, :], s_scores, NEG_INF)
    d_top, d_rows = select(d_scores, k=fetch_k)
    s_top, s_rows = select(s_scores, k=depth)
    d_rows = jnp.where(d_top > NEG_INF / 2, d_rows, -1)
    s_rows = jnp.where(s_top > NEG_INF / 2, s_rows, -1)
    return d_rows, s_rows


@partial(jax.jit, static_argnames=("k", "rrf_k", "block"))
def hybrid_topk(
    dense_corpus: jax.Array,  # [N, d] row-normalized
    sp_ids: jax.Array,  # [N, m]
    sp_weights: jax.Array,  # [N, m]
    dense_q: jax.Array,  # [B, d] row-normalized
    sparse_q_dense: jax.Array,  # [B, V]
    k: int,
    mask: jax.Array | None = None,  # [N]
    dense_weight: float = 0.5,
    sparse_weight: float = 0.5,
    rrf_k: int = 60,
    block: int = 8192,
) -> tuple[jax.Array, jax.Array]:
    """Fused hybrid search → (fused scores [B, k], row indices [B, k]).

    Per-method candidate depth is ``2k`` (reference parity) before on-device
    weighted RRF.
    """
    fetch_k = min(2 * k, dense_corpus.shape[0])

    d_scores = jnp.dot(
        dense_q.astype(dense_corpus.dtype), dense_corpus.T, preferred_element_type=jnp.float32
    )
    if mask is not None:
        d_scores = jnp.where(mask[None, :], d_scores, NEG_INF)
    d_top_scores, d_rows = jax.lax.top_k(d_scores, fetch_k)

    s_top_scores, s_rows = sparse_topk(
        sp_ids, sp_weights, sparse_q_dense, fetch_k, mask, block=block
    )

    d_rows = jnp.where(d_top_scores > NEG_INF / 2, d_rows, -1)
    s_rows = jnp.where(s_top_scores > NEG_INF / 2, s_rows, -1)

    total = dense_weight + sparse_weight
    weights = jnp.asarray([dense_weight / total, sparse_weight / total], jnp.float32)
    stacked = jnp.stack([d_rows, s_rows])  # [2, B, fetch_k]
    return rrf_fuse_device(stacked, weights, k=min(k, fetch_k), rrf_k=rrf_k)
