"""Fused matmul + bucketed k-selection (Pallas).

The serving hot loop computes `q @ corpus.T` and immediately reduces each
query row to top-k candidates. Done as two XLA ops, the [B, N] f32 score
matrix round-trips HBM between the matmul and the k-selection — at
B=512, N=1M that is ~8 GB of score traffic per hybrid batch, >3× the
corpus bytes themselves. This kernel fuses the two: corpus blocks stream
through VMEM once, scores for each block are reduced to per-128-row
*bucket maxima* on the spot, and only [B, N/128] bucket (value, argmax)
pairs ever reach HBM (~16 MB). A tiny `lax.top_k` over the buckets then
yields candidates.

Grid layout: (corpus_blocks, query_blocks) — query blocks iterate in the
inner dimension, so each corpus block is DMA'd exactly once and reused for
every query tile; output tiles are [128 queries, 128 buckets], satisfying
the TPU (8, 128) tiling rules.

Selection semantics are the same family as `lax.approx_max_k` (one winner
per bucket): a true top-k element is lost only when it shares a 128-row
bucket with a better one — expected loss ≈ k²/(2·N/128), e.g. recall
≈0.998 for k=20 and ≈0.98 for k=256 at N=1M. Candidates feed exact rescore
+ RRF downstream, so this folds into the same quality knob as the sketch
depth (validated at the serving point by benchmarks/recall_1m.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

BUCKET = 128  # lane width — one winner per 128 corpus rows
BLOCK_ROWS = 16384  # corpus rows per grid step → 128 buckets per output tile
Q_BLOCK = 128  # query rows per grid step


def _bucket_max_kernel(q_ref, corpus_ref, mask_ref, val_ref, idx_ref):
    """One (query tile, corpus block): scores → per-bucket (max, argmax)."""
    q = q_ref[...]  # [qb, d]
    block = corpus_ref[...]  # [block_rows, d]
    scores = jax.lax.dot_general(
        q, block, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [qb, block_rows]
    mask = mask_ref[...]  # [1, block_rows] int8 (1 = live row)
    scores = jnp.where(mask != 0, scores, NEG_INF)

    qb, block_rows = scores.shape
    grouped = scores.reshape(qb, block_rows // BUCKET, BUCKET)
    vals = jnp.max(grouped, axis=-1)  # [qb, buckets]
    lane = jax.lax.broadcasted_iota(jnp.int32, grouped.shape, 2)
    # Argmax via masked-iota max; ties pick the highest lane (approx family).
    winner = jnp.max(jnp.where(grouped >= vals[..., None], lane, -1), axis=-1)
    val_ref[...] = vals
    idx_ref[...] = winner.astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def matmul_bucket_max(
    corpus: jax.Array,  # [N, d]; N ≤ BLOCK_ROWS, or N % BLOCK_ROWS == 0
    q: jax.Array,  # [B, d]
    mask: jax.Array,  # [N] bool
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused scores+bucket-reduce: returns (bucket max [B, N/128] f32,
    global argmax row ids [B, N/128] i32; masked-out buckets carry -inf)."""
    n, d = corpus.shape
    b = q.shape[0]
    if n % BUCKET != 0:
        # The kernel reduces over [*, n/128, 128] groups — no layout exists
        # for a ragged tail.
        raise ValueError(f"corpus rows ({n}) must be a multiple of {BUCKET}")
    if n <= BLOCK_ROWS:
        block_rows = n
    elif n % BLOCK_ROWS == 0:
        block_rows = BLOCK_ROWS
    else:
        raise ValueError(
            f"corpus rows ({n}) must be ≤ {BLOCK_ROWS} or a multiple of it "
            "(store capacities are powers of two of the block size)"
        )

    # Pad queries to a Q_BLOCK multiple (tiny [B, d] pad).
    qb = min(Q_BLOCK, b) if b % Q_BLOCK else Q_BLOCK
    if b % qb != 0:
        pad = qb - b % qb
        q = jnp.pad(q, ((0, pad), (0, 0)))
    b_padded = q.shape[0]

    n_blocks = n // block_rows
    buckets_per_block = block_rows // BUCKET
    mask_row = mask.astype(jnp.int8).reshape(1, n)

    vals, idx = pl.pallas_call(
        _bucket_max_kernel,
        # Query tiles innermost: each corpus block is DMA'd once and reused.
        grid=(n_blocks, b_padded // qb),
        in_specs=[
            pl.BlockSpec((qb, d), lambda j, i: (i, 0)),
            pl.BlockSpec((block_rows, d), lambda j, i: (j, 0)),
            pl.BlockSpec((1, block_rows), lambda j, i: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((qb, buckets_per_block), lambda j, i: (i, j)),
            pl.BlockSpec((qb, buckets_per_block), lambda j, i: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_padded, n // BUCKET), jnp.float32),
            jax.ShapeDtypeStruct((b_padded, n // BUCKET), jnp.int32),
        ],
        # Working set: double-buffered corpus block (bf16, up to 25 MB at
        # d=768) + the [qb, block_rows] f32 score tile and its reduction
        # temporaries; v5e has 128 MB physical VMEM.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q.astype(corpus.dtype), corpus, mask_row)

    # Globalize: bucket base + in-bucket winner lane.
    base = (jnp.arange(n // BUCKET, dtype=jnp.int32) * BUCKET)[None, :]
    return vals[:b], base + idx[:b]


@partial(jax.jit, static_argnames=("k", "interpret"))
def fused_candidate_topk(
    corpus: jax.Array,  # [N, d]
    q: jax.Array,  # [B, d]
    k: int,
    mask: jax.Array,  # [N] bool
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Candidate top-k without materializing [B, N] scores: fused bucket
    reduce, then `lax.top_k` over the 128× smaller bucket table.

    Returns (scores [B, k] f32, rows [B, k] i32; −1 where masked/absent).
    """
    vals, rows = matmul_bucket_max(corpus, q, mask, interpret=interpret)
    k = min(k, vals.shape[1])
    top_vals, pos = jax.lax.top_k(vals, k)
    top_rows = jnp.take_along_axis(rows, pos, axis=1)
    top_rows = jnp.where(top_vals > NEG_INF / 2, top_rows, -1)
    return top_vals, top_rows
