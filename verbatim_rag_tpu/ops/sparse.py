"""Sparse retrieval: padded forward-index scan with on-chip gather.

TPU-native replacement for Milvus's `SPARSE_INVERTED_INDEX` + DAAT_MAXSCORE
(`vector_stores/milvus_local.py:119-125`). TPUs punish the scatter/pointer
-chasing of a classic inverted index, so the layout is inverted the other way:

- Each document's sparse vector (SPLADE term weights, or BM25-saturated term
  frequencies) is stored as a fixed-width row of a **padded forward index**:
  ``token_ids [N, m] int32`` + ``weights [N, m]`` with ``m = max_nnz``
  (pad slots: id 0 / weight 0).
- A query batch is densified to ``[B, V]`` (V = vocab, 30522 for BERT-family
  SPLADE — ~120 KB/query in f32, VMEM-resident).
- ``score[b, n] = Σ_j weights[n, j] · q[b, token_ids[n, j]]`` — a vectorized
  gather from the VMEM-resident query table followed by an FMA reduce. The
  scan streams the forward index from HBM once per batch, so (like the dense
  path) it is HBM-bandwidth-bound and amortizes over the query batch.

Exactness: this scans every document, so results equal ground-truth sparse
top-k (no DAAT pruning approximations).

BM25 (`milvus_cloud.py:157-197`) rides the same kernel: document-side
saturation ``tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))`` is precomputed into
`weights` at flush time, and the query side densifies ``indicator·idf``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .dense import NEG_INF


def densify_queries(
    token_ids: jax.Array,  # [B, qm] int32, pad = 0
    values: jax.Array,  # [B, qm] f32, pad = 0
    vocab_size: int,
) -> jax.Array:
    """Scatter padded query terms into dense [B, V] vectors.

    The q-side is tiny (tens of terms/query) so the scatter cost is noise;
    doing it on device keeps the whole query pipeline jittable.
    """
    batch = token_ids.shape[0]
    dense = jnp.zeros((batch, vocab_size), dtype=jnp.float32)
    rows = jnp.broadcast_to(jnp.arange(batch)[:, None], token_ids.shape)
    return dense.at[rows, token_ids].add(values)


@partial(jax.jit, static_argnames=("k", "block"))
def sparse_topk(
    token_ids: jax.Array,  # [N, m] int32 forward index (N multiple of block)
    weights: jax.Array,  # [N, m] f32/bf16 term weights
    q_dense: jax.Array,  # [B, V] densified queries
    k: int,
    mask: jax.Array | None = None,  # [N] bool
    block: int = 8192,
) -> tuple[jax.Array, jax.Array]:
    """Exact sparse top-k: (scores [B, k], row indices [B, k]).

    Blocked scan over the forward index bounds peak memory at
    ``block · m · B`` gathered floats per step while XLA pipelines the HBM
    streams of consecutive blocks.
    """
    n_rows, m = token_ids.shape
    n_blocks = n_rows // block
    q_table = q_dense.T.astype(jnp.float32)  # [V, B] — gather table

    ids_blocked = token_ids.reshape(n_blocks, block, m)
    w_blocked = weights.reshape(n_blocks, block, m).astype(jnp.float32)

    def score_block(args):
        ids_b, w_b = args  # [block, m]
        gathered = jnp.take(q_table, ids_b.reshape(-1), axis=0)  # [block·m, B]
        gathered = gathered.reshape(block, m, -1)  # [block, m, B]
        return jnp.einsum("nmb,nm->bn", gathered, w_b)  # [B, block]

    scores = jax.lax.map(score_block, (ids_blocked, w_blocked))  # [n_blocks, B, block]
    scores = jnp.moveaxis(scores, 0, 1).reshape(q_dense.shape[0], n_rows)  # [B, N]
    if mask is not None:
        scores = jnp.where(mask[None, :], scores, NEG_INF)
    top, rows = jax.lax.top_k(scores, k)
    # Zero score = no term overlap → not a hit: an inverted index never
    # surfaces non-matching docs (Milvus parity; term weights are
    # nonnegative), and downstream RRF must not credit rank to them.
    return top, jnp.where(top > 0.0, rows, -1)


def bm25_saturate(
    tf: jax.Array,  # [N, m] raw term frequencies (0 in pad slots)
    doc_len: jax.Array,  # [N] token counts
    avgdl: jax.Array,  # scalar
    k1: float = 1.2,
    b: float = 0.75,
) -> jax.Array:
    """Document-side BM25 saturation, precomputed into forward-index weights."""
    tf = tf.astype(jnp.float32)
    norm = k1 * (1.0 - b + b * doc_len.astype(jnp.float32)[:, None] / avgdl)
    return tf * (k1 + 1.0) / (tf + norm)


def bm25_idf(doc_freq: jax.Array, n_docs: jax.Array) -> jax.Array:
    """Lucene/Milvus-style BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5))."""
    df = doc_freq.astype(jnp.float32)
    n = n_docs.astype(jnp.float32)
    return jnp.log1p((n - df + 0.5) / (df + 0.5))
