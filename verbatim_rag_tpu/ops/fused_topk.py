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

    # Pad queries to a Q_BLOCK multiple (tiny [B, d] pad). Keep the query
    # tile sublane-aligned: Mosaic cannot lay out the [qb, p, 128]
    # reduction views for qb < 8 (observed as a reshape lowering failure
    # at qb=1 on v5e), and sub-8-multiple tiles (qb=9, 12, ...) risk the
    # same constraint — round qb up to a full 8-row sublane multiple.
    qb = max(min(Q_BLOCK, b) if b % Q_BLOCK else Q_BLOCK, 8)
    qb = -(-qb // 8) * 8
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


# ---------------------------------------------------------------------------
# v2: strided buckets + mantissa-packed argmax.
#
# The v1 kernel's reduction is the expensive part: buckets are 128
# *consecutive* corpus rows, i.e. one full lane-tile of the [qb, block]
# score matrix, so the per-bucket max is a cross-lane reduction — and the
# argmax needs two more full passes (iota + masked max). v2 changes the
# bucket *membership* (legal: any 128-row partition gives the same
# one-winner-per-128-rows selection family): bucket(r) = r mod 128, the
# LANE id. Reshaped to [qb, pos, 128], the per-bucket max is a reduce over
# the second-minor axis — sublane-direction work the VPU does without lane
# shuffles. The argmax comes for free: before reducing, each score's low 7
# mantissa bits are overwritten with its `pos` (the f32 comparison order is
# preserved to within 127 ulp — candidates feed an exact rescore, and the
# inputs are bf16 with 8 mantissa bits anyway), so ONE maximum pass yields
# both the winning value and, in its low bits, the winning row.
# ---------------------------------------------------------------------------

_POS_BITS = 7  # low mantissa bits carrying the in-bucket position
_POS_MASK = (1 << _POS_BITS) - 1  # 0x7F

#: Smallest corpus block the v2 kernel will grid over — below this the
#: per-step MXU work is too small to amortize grid overhead.
MIN_BLOCK_ROWS = 2048


def choose_block_rows(n: int) -> int | None:
    """Largest kernel block size that tiles `n` corpus rows, or None.

    Store capacities are block-size multiples (default 8192), not
    necessarily 16384-multiples — a tight bulk-load capacity like
    123·8192 tiles with 8192-row blocks. Smaller blocks mean finer
    buckets (one winner per block_rows/128 rows → better recall) at more
    grid steps; every candidate is ≤ the 7-bit position pack by
    construction (block_rows ≤ 16384 → p ≤ 128)."""
    if n % BUCKET != 0:
        return None
    if n <= BLOCK_ROWS:
        return n
    bl = BLOCK_ROWS
    while bl >= MIN_BLOCK_ROWS:
        if n % bl == 0:
            return bl
        bl //= 2
    return None


def bucket_table_width(n: int) -> int | None:
    """Columns of the kernel's (value, row) bucket table for `n` rows —
    the maximum candidate count the kernel can supply — or None if the
    geometry is unsupported."""
    block_rows = choose_block_rows(n)
    if block_rows is None:
        return None
    return (n // block_rows) * BUCKET


def _pack_pos(scores: jax.Array, pos: jax.Array) -> jax.Array:
    """Overwrite the low 7 mantissa bits of f32 `scores` with `pos` (i32).

    Monotone within 127 ulp for same-sign floats (sign-magnitude layout);
    across signs the sign bit dominates. Ties inside the tolerance pick an
    arbitrary near-equal winner — the approx-selection family's contract.
    """
    bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
    packed = (bits & jnp.int32(~_POS_MASK)) | pos
    return jax.lax.bitcast_convert_type(packed, jnp.float32)


def _unpack(best: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(value with low bits cleared, pos) from a packed f32 array."""
    bits = jax.lax.bitcast_convert_type(best, jnp.int32)
    vals = jax.lax.bitcast_convert_type(bits & jnp.int32(~_POS_MASK), jnp.float32)
    return vals, bits & jnp.int32(_POS_MASK)


def _packed_chunk_max(s3, mask3, pos0):
    """[qb, p, 128] scores + [p, 128] live mask → packed running max [qb, 128]."""
    pos = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 1) + pos0
    packed = _pack_pos(s3, pos)
    packed = jnp.where(mask3[None, :, :] != 0, packed, NEG_INF)
    return jnp.max(packed, axis=1)


def _raw_dot(q, rows):
    """[qb, d] x [r, d] → [qb, r]; int8 operands take the MXU int8 path
    (raw ≤ 127·127·d < 2^24, so the later f32 cast is exact).

    No int4 arm: the 0.5.x in-kernel half-split unpack (two shifts + a
    lane concat) validated in interpret mode but NEVER compiled on v5e
    hardware (remote Mosaic helper exit 1 at every shape tried), and a
    native jnp.int4 operand crashes this toolchain's client before the
    kernel is even reached (round-5 probe, 2026-08-19) — so the arm was
    removed rather than shipped uncompilable (VERDICT r4 #9). int4 tiers
    serve through the XLA candidate path (ops/dense.py unpack_int4)."""
    acc = jnp.int32 if rows.dtype == jnp.int8 else jnp.float32
    out = jax.lax.dot_general(
        q, rows, (((1,), (1,)), ((), ())), preferred_element_type=acc
    )
    return out.astype(jnp.float32)


def _bucket_max_v2_onedot_kernel(*refs, has_scale: bool):
    """One MXU dot for the whole block, then a packed second-minor reduce.

    Scales (int8 mode) apply on the [qb, p, 128] view — the corpus
    scale arrives pre-laid-out [p, 128] (strided bucket geometry, like
    the mask), so no in-kernel relayout is needed."""
    if has_scale:
        q_ref, corpus_ref, mask_ref, qscale_ref, cscale_ref, val_ref, idx_ref = refs
    else:
        q_ref, corpus_ref, mask_ref, val_ref, idx_ref = refs
    q = q_ref[...]  # [qb, d]
    block = corpus_ref[...]  # [block_rows, d] (or [block_rows, d/2] packed)
    qb, block_rows = q.shape[0], block.shape[0]
    p = block_rows // BUCKET
    s3 = _raw_dot(q, block).reshape(qb, p, BUCKET)  # (query, pos, lane)
    if has_scale:
        s3 = s3 * qscale_ref[...][:, :, None] * cscale_ref[...][None, :, :]
    best = _packed_chunk_max(s3, mask_ref[...], 0)
    vals, winner = _unpack(best)
    val_ref[...] = vals
    idx_ref[...] = winner


def _bucket_max_v2_chunked_kernel(*refs, chunk_pos: int, has_scale: bool):
    """Chunked variant: the [qb, block] score matrix is never materialized —
    `chunk_pos` 128-row groups at a time go MXU → pack → reduce → running
    max, so live score state is [qb, chunk_pos·128] plus one [qb, 128]
    accumulator resident in VMEM registers."""
    if has_scale:
        q_ref, corpus_ref, mask_ref, qscale_ref, cscale_ref, val_ref, idx_ref = refs
    else:
        q_ref, corpus_ref, mask_ref, val_ref, idx_ref = refs
    q = q_ref[...]  # [qb, d]
    qb = q.shape[0]
    p_total = corpus_ref.shape[0] // BUCKET
    n_iter = p_total // chunk_pos
    rows_per_iter = chunk_pos * BUCKET

    def body(i, running):
        start = pl.multiple_of(i * rows_per_iter, rows_per_iter)
        rows = corpus_ref[pl.ds(start, rows_per_iter), :]  # [cp·128, d(/2)]
        p_start = pl.multiple_of(i * chunk_pos, chunk_pos)
        s3 = _raw_dot(q, rows).reshape(qb, chunk_pos, BUCKET)
        if has_scale:
            cs = cscale_ref[pl.ds(p_start, chunk_pos), :]  # [cp, 128]
            s3 = s3 * qscale_ref[...][:, :, None] * cs[None, :, :]
        m3 = mask_ref[pl.ds(p_start, chunk_pos), :]
        return jnp.maximum(running, _packed_chunk_max(s3, m3, i * chunk_pos))

    init = jnp.full((qb, BUCKET), NEG_INF, jnp.float32)
    best = jax.lax.fori_loop(0, n_iter, body, init)
    vals, winner = _unpack(best)
    val_ref[...] = vals
    idx_ref[...] = winner


@partial(jax.jit, static_argnames=("variant", "chunk_pos", "interpret", "q_block"))
def matmul_bucket_max_v2(
    corpus: jax.Array,  # [N, d]; N ≤ BLOCK_ROWS, or N % BLOCK_ROWS == 0
    q: jax.Array,  # [B, d]
    mask: jax.Array,  # [N] bool
    variant: str = "onedot",
    chunk_pos: int = 16,
    interpret: bool = False,
    scale: jax.Array | None = None,  # [N, 1] f32 — int8 corpus only
    q_block: int = Q_BLOCK,  # query rows per grid step (VMEM/tuning knob)
) -> tuple[jax.Array, jax.Array]:
    """Strided-bucket fused scores+reduce: returns (bucket max
    [B, n_blocks·128] f32 with the low 7 mantissa bits zeroed, global
    argmax rows i32). Bucket g = block·128 + lane holds the
    block_rows/128 rows {block·block_rows + pos·128 + lane}; at the
    serving block size (16384) that is one winner per 128 rows, the same
    granularity as v1/approx_max_k, and finer (better recall) below it.

    int4 corpora are NOT accepted: the in-kernel half-split unpack never
    compiled on v5e hardware and native int4 operands crash the client
    (see _raw_dot) — the arm was removed in 0.5.2 rather than shipped
    uncompilable; int4 tiers serve through the XLA candidate path."""
    from .dense import Int4Rows

    if isinstance(corpus, Int4Rows):
        raise ValueError(
            "matmul_bucket_max_v2 does not serve int4 corpora (the unpack "
            "arm never compiled on TPU hardware; removed in 0.5.2) — use "
            "the XLA candidate path (candidate_topk impl='xla')"
        )
    n, d = corpus.shape
    corpus_arr = corpus
    d_stored = d
    b = q.shape[0]
    block_rows = choose_block_rows(n)
    if block_rows is None:
        raise ValueError(
            f"corpus rows ({n}) must be ≤ {BLOCK_ROWS} (and a multiple of "
            f"{BUCKET}) or divisible by a block size ≥ {MIN_BLOCK_ROWS}"
        )
    p = block_rows // BUCKET
    has_scale = corpus_arr.dtype == jnp.int8
    if has_scale and scale is None:
        raise ValueError("quantized corpus requires scale")
    if variant == "chunked":
        if p % chunk_pos != 0:
            raise ValueError(f"chunk_pos ({chunk_pos}) must divide positions ({p})")
        kernel = partial(
            _bucket_max_v2_chunked_kernel,
            chunk_pos=chunk_pos, has_scale=has_scale,
        )
    elif variant == "onedot":
        kernel = partial(
            _bucket_max_v2_onedot_kernel, has_scale=has_scale
        )
    else:
        raise ValueError(f"unknown variant {variant!r}")

    if has_scale:
        from .dense import quantize_rows_int8

        q, q_scale = quantize_rows_int8(q)
    else:
        q = q.astype(corpus_arr.dtype)
        q_scale = None

    # Full 8-row sublane multiples of query rows per tile — see
    # matmul_bucket_max (Mosaic sublane rule).
    qb = max(min(q_block, b) if b % q_block else q_block, 8)
    qb = -(-qb // 8) * 8
    if b % qb != 0:
        pad = qb - b % qb
        q = jnp.pad(q, ((0, pad), (0, 0)))
        if q_scale is not None:
            q_scale = jnp.pad(q_scale, ((0, pad), (0, 0)))
    b_padded = q.shape[0]

    n_blocks = n // block_rows
    # Mask (and corpus scale) laid out [pos, lane] to mirror the strided
    # bucket geometry.
    mask2d = mask.astype(jnp.int8).reshape(n // BUCKET, BUCKET)

    in_specs = [
        pl.BlockSpec((qb, d), lambda j, i: (i, 0)),
        pl.BlockSpec((block_rows, d_stored), lambda j, i: (j, 0)),
        pl.BlockSpec((p, BUCKET), lambda j, i: (j, 0)),
    ]
    inputs = [q, corpus_arr, mask2d]
    if has_scale:
        in_specs += [
            pl.BlockSpec((qb, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((p, BUCKET), lambda j, i: (j, 0)),
        ]
        inputs += [q_scale, scale.reshape(n // BUCKET, BUCKET)]

    vals, idx = pl.pallas_call(
        kernel,
        grid=(n_blocks, b_padded // qb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((qb, BUCKET), lambda j, i: (i, j)),
            pl.BlockSpec((qb, BUCKET), lambda j, i: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_padded, n_blocks * BUCKET), jnp.float32),
            jax.ShapeDtypeStruct((b_padded, n_blocks * BUCKET), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)

    # Globalize: column c = block·128 + lane; row = block·block_rows +
    # pos·128 + lane. All-masked buckets decode NEG_INF's junk mantissa
    # bits as pos — their values filter out downstream (≈ -1e30), but the
    # row ids are clamped in-range so a direct gather can never go OOB.
    cols = jnp.arange(n_blocks * BUCKET, dtype=jnp.int32)
    block_base = (cols // BUCKET) * block_rows
    lane = cols % BUCKET
    rows = block_base[None, :] + idx[:b] * BUCKET + lane[None, :]
    return vals[:b], jnp.minimum(rows, n - 1)


@partial(
    jax.jit, static_argnames=("k", "variant", "chunk_pos", "interpret", "q_block")
)
def fused_candidate_topk_v2(
    corpus: jax.Array,  # [N, d]
    q: jax.Array,  # [B, d]
    k: int,
    mask: jax.Array,  # [N] bool
    variant: str = "onedot",
    chunk_pos: int = 16,
    interpret: bool = False,
    scale: jax.Array | None = None,  # [N, 1] f32 — int8 corpus only
    q_block: int = Q_BLOCK,
) -> tuple[jax.Array, jax.Array]:
    """v2 candidate top-k: packed strided-bucket reduce, then `lax.top_k`
    over the 128× smaller bucket table (same contract as v1)."""
    vals, rows = matmul_bucket_max_v2(
        corpus, q, mask, variant=variant, chunk_pos=chunk_pos,
        interpret=interpret, scale=scale, q_block=q_block,
    )
    k = min(k, vals.shape[1])
    top_vals, pos = jax.lax.top_k(vals, k)
    top_rows = jnp.take_along_axis(rows, pos, axis=1)
    top_rows = jnp.where(top_vals > NEG_INF / 2, top_rows, -1)
    return top_vals, top_rows
