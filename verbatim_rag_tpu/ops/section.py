"""Whole-candidate-section fused kernel: both hybrid matmuls + in-VMEM
bucket selection in ONE Pallas program.

Why this exists (ROADMAP #2, third design): the serving hybrid program's
only remaining HBM term above the corpus bytes is the two [B, N] f32 score
matrices XLA materializes between each matmul and its `approx_max_k`
(~12.6 ms of the measured 15.4 ms roofline at [512, 1M] bf16). Round-3
measurements proved per-stage Pallas kernels cannot win: a `pallas_call`
is an opaque custom call XLA cannot software-pipeline against the rest of
the program, so replacing EITHER candidate matmul forfeits more overlap
than the kernel's isolated gain (benchmarks/RESULTS.md, program matrix).
The conclusion recorded there: a winning kernel must fuse the WHOLE
candidate section — both matmuls and both selections — so there is
nothing left for XLA to overlap against. This module is that kernel.

Design rules (all measured, see benchmarks/bench_section.py):

* **Transposed corpus layout [d, N].** The MXU streams the contraction
  dim from rhs sublanes; a [N, d] row-major block forces Mosaic to
  relayout 12–24 MB of VMEM per grid step before every dot (the v1/v2
  bucket kernels' hidden cost — they ran 2.5–4x above their roofline).
  With [d, N] blocks the dot is layout-native: `q [qb, d] @ cT [d, cols]`.
* **No reshapes.** Scores are produced in [qb, dot_chunk] f32 tiles and
  reduced by STATIC 128-lane slices into a running max [qb, 128] — the
  v2 kernel's [qb, cols] -> [qb, p, 128] shape-cast is a sublane
  relayout of the whole score tile; slicing lanes at 128-aligned offsets
  is free.
* **One packed output table per arm.** Each score's low 7 mantissa bits
  are overwritten with its in-bucket position before the max (ordering
  preserved within 127 ulp — candidates feed an exact rescore, and the
  operands are bf16 anyway), so a single maximum yields value AND row;
  the kernel writes one [B, n_blocks*128] f32 table per arm and the
  (value, row) decode happens on the selected top-k only.
* **Both arms share the grid pass.** Dense [384, N] and sketch [768, N]
  blocks ride the same grid step, so the corpus is DMA'd exactly once
  per query tile and the MXU alternates arms while the next block
  streams in.

Selection semantics: within each corpus block of `block_cols` columns,
bucket(col) = col % 128 — one winner per block_cols/128 rows, the same
approximate-selection family as `lax.approx_max_k` (one winner per ~128
rows at block_cols=16384; FINER at the default 8192). Candidates feed the
exact rescore + RRF downstream, so selection recall folds into the same
quality knob as the sketch depth (validated at the 1M serving point by
benchmarks/recall_1m.py).

Reference capability replaced: the Milvus hybrid search RPC pair
(`/root/reference/verbatim_rag/vector_stores/milvus_local.py:111-125`,
`milvus_base.py:366-459`) — re-designed as one TPU program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

LANE = 128  # bucket width: one winner per lane column group

_POS_BITS = 7  # low mantissa bits carrying the in-bucket position
_POS_MASK = (1 << _POS_BITS) - 1

#: Corpus columns per grid step. 8192 keeps the two transposed blocks at
#: 12 + 24 MB bf16 (double-buffered: well inside v5e's VMEM) and gives
#: one winner per 64 rows — finer than approx_max_k's granularity.
BLOCK_COLS = 8192

#: Columns per MXU dot inside a block: the [qb, DOT_CHUNK] f32 score tile
#: stays small (1 MB at qb=128) and the per-dot work amortizes issue cost.
DOT_CHUNK = 2048

#: Queries per grid step. At 512 the whole serving batch rides one tile,
#: so each corpus block is DMA'd exactly once per batch.
Q_BLOCK = 512


def _pack_pos_const(scores: jax.Array, pos: int, clear: bool = True) -> jax.Array:
    """Overwrite the low 7 mantissa bits of f32 `scores` with the STATIC
    in-block position `pos` (monotone within 127 ulp, sign-magnitude).

    The clearing AND is required for a correct decode — an OR-only pack
    leaves the score's own low bits in the pos field (measured: row decode
    collapses to ~2% match). Exception: scores upcast from a bf16 MXU
    epilogue have their low 16 mantissa bits ZERO by construction, so
    ``clear=False`` legally drops the AND (this chain runs once per score
    element — each op is ~0.5 ms at the [512, 1M] serving point)."""
    bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
    if clear:
        bits = bits & jnp.int32(~_POS_MASK)
    return jax.lax.bitcast_convert_type(bits | jnp.int32(pos), jnp.float32)


def unpack_table(best: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(value with low mantissa bits cleared, in-block position) from a
    packed table slice — applied to the SELECTED top-k, not the table."""
    bits = jax.lax.bitcast_convert_type(best, jnp.int32)
    vals = jax.lax.bitcast_convert_type(bits & jnp.int32(~_POS_MASK), jnp.float32)
    return vals, bits & jnp.int32(_POS_MASK)


def _make_section_kernel(n_arms: int, block_cols: int, dot_chunk: int,
                         quantized: tuple[bool, ...],
                         score_bf16: bool = False,
                         has_mask: bool = True,
                         pack: bool = True,
                         reduce: bool = True,
                         q_sub: int = 0):
    """Build the kernel body for `n_arms` corpora sharing one grid pass.

    Ref order: [q_0..q_{A-1}, cT_0..cT_{A-1}, mask,
    (qscale_a, cscale_a for each quantized arm a)] then one packed-table
    output ref per arm. Fully static unroll: block_cols/dot_chunk dots per
    arm, dot_chunk/128 pack+max slices per dot.

    ``q_sub`` (0 = whole tile) splits the query tile into q_sub-row
    sub-dots so each sub-tile's running max ([q_sub, 128] f32 — 16 vregs
    at 128) can live in vector registers across a chunk instead of
    bouncing a [qb, 128] accumulator (64+ vregs: larger than the VREG
    file) through VMEM on every lane-slice maximum. 128 keeps the MXU's
    M dimension full.
    """
    n_chunks = block_cols // dot_chunk
    slices = dot_chunk // LANE

    def kernel(*refs):
        q_refs = refs[:n_arms]
        c_refs = refs[n_arms : 2 * n_arms]
        if has_mask:
            mask_ref = refs[2 * n_arms]
            rest0 = 2 * n_arms + 1
        else:
            mask_ref = None
            rest0 = 2 * n_arms
        scale_refs = refs[rest0 : rest0 + 2 * sum(quantized)]
        out_refs = refs[-n_arms:]

        qs = [q_refs[a][...] for a in range(n_arms)]
        qb = qs[0].shape[0]
        qsub = q_sub if q_sub and qb % q_sub == 0 else qb
        n_sub = qb // qsub
        # accs[a][t]: running max of query sub-tile t, arm a.
        accs = [
            [jnp.full((qsub, LANE), NEG_INF, jnp.float32) for _ in range(n_sub)]
            for _ in range(n_arms)
        ]
        si = 0
        qscales = []
        cscale_refs = []
        for a in range(n_arms):
            if quantized[a]:
                qscales.append(scale_refs[si][...])  # [qb, 1] f32
                cscale_refs.append(scale_refs[si + 1])  # [1, block_cols] f32
                si += 2
            else:
                qscales.append(None)
                cscale_refs.append(None)

        for ci in range(n_chunks):
            col0 = ci * dot_chunk
            for a in range(n_arms):
                acc_t = jnp.int32 if quantized[a] else jnp.float32
                for t in range(n_sub):
                    r0 = t * qsub
                    s = jax.lax.dot_general(
                        qs[a][r0 : r0 + qsub],
                        c_refs[a][:, pl.ds(col0, dot_chunk)],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=acc_t,
                    )  # [qsub, dot_chunk]
                    if not reduce:
                        # Bench-only MXU/DMA floor probe: touch ONE lane
                        # slice per chunk so the dot stays live but the VPU
                        # never reads the other 15/16ths of the score tile.
                        accs[a][t] = jnp.maximum(
                            accs[a][t], s[:, :LANE].astype(jnp.float32)
                        )
                        continue
                    if quantized[a]:
                        cs = cscale_refs[a][:, pl.ds(col0, dot_chunk)]  # [1, dc]
                        s = s.astype(jnp.float32) * qscales[a][r0 : r0 + qsub] * cs
                    elif score_bf16:
                        # bf16 score epilogue: halves the [qsub, dot_chunk]
                        # score temp's VMEM traffic (Mosaic's matmul acc must
                        # stay 32-bit, so the narrowing is a cast on the way
                        # out); selection precision drops to bf16 — same
                        # approximate family, candidates feed the exact
                        # rescore.
                        s = s.astype(jnp.bfloat16)
                    # bf16 upcast guarantees zero low mantissa bits -> OR-only.
                    clear = not (score_bf16 and not quantized[a])
                    for g in range(slices):
                        pos = ci * slices + g
                        sl = s[:, g * LANE : (g + 1) * LANE]  # [qsub, 128]
                        if sl.dtype != jnp.float32:
                            sl = sl.astype(jnp.float32)
                        # pack=False: bench-only skeleton probe (values
                        # right, row decode meaningless) — measures the
                        # dot+max floor.
                        packed = _pack_pos_const(sl, pos, clear=clear) if pack else sl
                        if mask_ref is not None:
                            # Mask arrives ADDITIVE f32 ({0, NEG_INF} per
                            # column): x + 0.0 == x bit-exactly, x + NEG_INF
                            # ≈ NEG_INF — one VPU add vs compare+select.
                            packed = packed + mask_ref[:, pl.ds(col0 + g * LANE, LANE)]
                        accs[a][t] = jnp.maximum(accs[a][t], packed)
        for a in range(n_arms):
            if len(accs[a]) == 1:
                out_refs[a][...] = accs[a][0]
            else:
                out_refs[a][...] = jnp.concatenate(accs[a], axis=0)

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "block_cols", "dot_chunk", "q_block", "vmem_mb", "score_bf16",
        "pack", "reduce", "q_sub", "interpret"
    ),
)
def section_bucket_tables(
    corpora_t: tuple,  # per arm: [d_a, N] bf16/f32, or int8
    queries: tuple,  # per arm: [B, d_a]
    mask: jax.Array | None,  # [N] bool; None = every row live (saves one
    #   VPU add per score element — the common no-tombstone serving case)
    scales: tuple = (),  # per arm: [N, 1] f32 for int8 arms, else None
    block_cols: int = BLOCK_COLS,
    dot_chunk: int = DOT_CHUNK,
    q_block: int = Q_BLOCK,
    vmem_mb: int = 100,
    score_bf16: bool = False,
    pack: bool = True,
    reduce: bool = True,
    q_sub: int = 128,
    interpret: bool = False,
) -> tuple:
    """One grid pass over TRANSPOSED corpora -> one packed bucket table
    [B, (N/block_cols)*128] f32 per arm.

    Table column c covers block j = c // 128, lane l = c % 128; its value
    is the masked max over positions p of score(row = j*block_cols +
    p*128 + l), with the winning p packed in the low 7 mantissa bits.
    Decode selected entries with `unpack_table` + `table_rows`.
    """
    n_arms = len(corpora_t)
    if not scales:
        scales = (None,) * n_arms
    n = corpora_t[0].shape[1]
    b = queries[0].shape[0]
    if n % block_cols:
        raise ValueError(f"corpus cols ({n}) must be a {block_cols}-multiple")
    if block_cols % dot_chunk or dot_chunk % LANE:
        raise ValueError("block_cols % dot_chunk == 0 == dot_chunk % 128 required")
    if block_cols // LANE > (1 << _POS_BITS):
        raise ValueError(f"block_cols ({block_cols}) overflows the 7-bit pos pack")

    quantized = tuple(c.dtype == jnp.int8 for c in corpora_t)
    qs, qscales = [], []
    for a in range(n_arms):
        if quantized[a]:
            if scales[a] is None:
                raise ValueError("int8 arm requires its per-row scale")
            from .dense import quantize_rows_int8

            qi, qsc = quantize_rows_int8(queries[a])
            qs.append(qi)
            qscales.append(qsc)
        else:
            qs.append(queries[a].astype(corpora_t[a].dtype))
            qscales.append(None)

    # Sublane-aligned query tile (Mosaic cannot lay out sub-8-row tiles).
    qb = max(min(q_block, b) if b % q_block else q_block, 8)
    qb = -(-qb // 8) * 8
    if b % qb:
        pad = qb - b % qb
        qs = [jnp.pad(q, ((0, pad), (0, 0))) for q in qs]
        qscales = [
            None if s is None else jnp.pad(s, ((0, pad), (0, 0))) for s in qscales
        ]
    b_padded = qs[0].shape[0]

    n_blocks = n // block_cols
    # Additive mask: 0.0 keeps a score bit-exactly, NEG_INF drowns it —
    # one VPU add per element inside the kernel (vs compare+select).
    mask_row = (
        None
        if mask is None
        else jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32).reshape(1, n)
    )

    # Grid: query tiles innermost -> each corpus block is DMA'd once and
    # reused across the whole batch (one tile at the serving qb=512).
    in_specs = []
    inputs = []
    for a in range(n_arms):
        d = corpora_t[a].shape[0]
        in_specs.append(pl.BlockSpec((qb, d), lambda j, i: (i, 0)))
        inputs.append(qs[a])
    for a in range(n_arms):
        d = corpora_t[a].shape[0]
        in_specs.append(pl.BlockSpec((d, block_cols), lambda j, i: (0, j)))
        inputs.append(corpora_t[a])
    if mask_row is not None:
        in_specs.append(pl.BlockSpec((1, block_cols), lambda j, i: (0, j)))
        inputs.append(mask_row)
    for a in range(n_arms):
        if quantized[a]:
            in_specs.append(pl.BlockSpec((qb, 1), lambda j, i: (i, 0)))
            inputs.append(qscales[a])
            in_specs.append(pl.BlockSpec((1, block_cols), lambda j, i: (0, j)))
            inputs.append(scales[a].reshape(1, n))

    kernel = _make_section_kernel(
        n_arms, block_cols, dot_chunk, quantized, score_bf16=score_bf16,
        has_mask=mask_row is not None, pack=pack, reduce=reduce,
        q_sub=q_sub,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, b_padded // qb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((qb, LANE), lambda j, i: (i, j)) for _ in range(n_arms)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_padded, n_blocks * LANE), jnp.float32)
            for _ in range(n_arms)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)
    return tuple(t[:b] for t in out)


@partial(
    jax.jit,
    static_argnames=(
        "k", "fetch_k", "depth", "rrf_k", "rescore_impl", "table_select",
        "block_cols", "dot_chunk", "q_block", "vmem_mb", "interpret",
    ),
)
def hybrid_section_topk(
    dense_t: jax.Array,  # [d, N] TRANSPOSED row-normalized corpus
    sketch_t: jax.Array,  # [d_p, N] TRANSPOSED sparse sketches
    sp_ids: jax.Array,  # [N, m] forward index
    sp_w: jax.Array,  # [N, m]
    dense_q: jax.Array,  # [B, d] row-normalized
    sketch_q: jax.Array,  # [B, d_p]
    q_ids: jax.Array,  # [B, qm] padded query terms
    q_w: jax.Array,  # [B, qm]
    k: int,
    fetch_k: int,
    depth: int,
    mask: jax.Array | None,  # [N] bool; None = every row live
    dense_weight: jax.Array | float = 0.5,
    sparse_weight: jax.Array | float = 0.5,
    rrf_k: int = 60,
    dense_scale: jax.Array | None = None,  # [N, 1] — int8 dense corpus only
    sketch_scale: jax.Array | None = None,  # [N, 1] — int8 sketches only
    rescore_impl: str = "pallas",
    table_select: str = "approx",
    block_cols: int = BLOCK_COLS,
    dot_chunk: int = DOT_CHUNK,
    q_block: int = Q_BLOCK,
    vmem_mb: int = 100,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """The full hybrid query with the SECTION KERNEL as its candidate
    stage: one Pallas program for both matmuls + in-VMEM selection (the
    [B, N] score matrices never touch HBM), then the tiny bucket-table
    top-ks, the exact forward-index rescore, and weighted RRF — still one
    jitted program, one sync. Drop-in contract of
    `ops/hybrid.py::hybrid_fused_topk` with TRANSPOSED corpora.

    Returns (fused RRF scores [B, k], row indices [B, k]; −1 pads).
    """
    from .hybrid import rescore_fn
    from .fusion import rrf_fuse_device

    n = dense_t.shape[1]
    scales = ()
    if dense_scale is not None or sketch_scale is not None:
        scales = (dense_scale, sketch_scale)
    td, ts = section_bucket_tables(
        (dense_t, sketch_t), (dense_q, sketch_q), mask, scales=scales,
        block_cols=block_cols, dot_chunk=dot_chunk, q_block=q_block,
        vmem_mb=vmem_mb, interpret=interpret,
    )
    _, d_rows = table_topk(td, fetch_k, block_cols, n, select_impl=table_select)
    if d_rows.shape[1] < fetch_k:  # narrow table (tiny capacity)
        d_rows = jnp.pad(d_rows, ((0, 0), (0, fetch_k - d_rows.shape[1])),
                         constant_values=-1)

    s_rows = _section_projected_arm(
        ts, sp_ids, sp_w, q_ids, q_w, fetch_k, depth, block_cols, n,
        rescore_impl, table_select,
    )

    total = dense_weight + sparse_weight
    weights = jnp.stack(
        [jnp.asarray(dense_weight, jnp.float32), jnp.asarray(sparse_weight, jnp.float32)]
    ) / jnp.asarray(total, jnp.float32)
    stacked = jnp.stack([d_rows, s_rows])  # [2, B, fetch_k]
    return rrf_fuse_device(stacked, weights, k=min(k, fetch_k), rrf_k=rrf_k)


def _section_projected_arm(
    table: jax.Array,  # [B, W] packed bucket table of a sketch arm
    sp_ids: jax.Array,
    sp_w: jax.Array,
    q_ids: jax.Array,
    q_w: jax.Array,
    fetch_k: int,
    depth: int,
    block_cols: int,
    n: int,
    rescore_impl: str,
    table_select: str,
) -> jax.Array:
    """Sketch-arm post-processing shared by the 2- and 3-way section
    programs: table top-`depth` candidates → exact forward-index rescore →
    top-`fetch_k` rows ([B, fetch_k] i32; −1 pads). Mirrors
    `ops/hybrid.py::_projected_arm` with the bucket table replacing the
    score-matrix candidate stage."""
    from .hybrid import rescore_fn

    _, cand = table_topk(table, depth, block_cols, n, select_impl=table_select)
    exact = rescore_fn(rescore_impl)(cand, sp_ids, sp_w, q_ids, q_w)
    # cand can be narrower than depth when the bucket table itself is
    # narrow (tiny capacities: width = (N/block_cols)*128).
    r_top, r_pos = jax.lax.top_k(exact, min(fetch_k, depth, exact.shape[1]))
    rows = jnp.take_along_axis(cand, r_pos, axis=1)
    # Zero exact score = no term overlap → not a hit (Milvus parity, same
    # rule as ops/hybrid.py `_projected_arm`).
    rows = jnp.where(r_top > 0.0, rows, -1)
    if rows.shape[1] < fetch_k:
        rows = jnp.pad(rows, ((0, 0), (0, fetch_k - rows.shape[1])),
                       constant_values=-1)
    return rows


@partial(
    jax.jit,
    static_argnames=(
        "k", "fetch_k", "depth", "rrf_k", "rescore_impl", "table_select",
        "block_cols", "dot_chunk", "q_block", "vmem_mb", "interpret",
    ),
)
def hybrid_section_topk_3way(
    dense_t: jax.Array,  # [d, N] TRANSPOSED row-normalized corpus
    sketch_t: jax.Array,  # [d_p, N] TRANSPOSED SPLADE sketches
    sp_ids: jax.Array,  # [N, m] SPLADE forward index
    sp_w: jax.Array,  # [N, m]
    ft_sketch_t: jax.Array,  # [d_p, N] TRANSPOSED BM25 sketches
    ft_ids: jax.Array,  # [N, fm] BM25 forward index
    ft_w: jax.Array,  # [N, fm] BM25-saturated weights
    dense_q: jax.Array,  # [B, d] row-normalized
    sketch_q: jax.Array,  # [B, d_p]
    q_ids: jax.Array,  # [B, qm] padded SPLADE query terms
    q_w: jax.Array,  # [B, qm]
    ft_q_proj: jax.Array,  # [B, d_p] BM25 query sketches
    ft_q_ids: jax.Array,  # [B, fqm] padded BM25 query terms
    ft_q_w: jax.Array,  # [B, fqm] idf weights
    k: int,
    fetch_k: int,
    depth: int,
    mask: jax.Array | None,  # [N] bool; None = every row live
    dense_weight: jax.Array | float = 1.0,
    sparse_weight: jax.Array | float = 1.0,
    ft_weight: jax.Array | float = 1.0,
    rrf_k: int = 60,
    dense_scale: jax.Array | None = None,  # [N, 1] — int8 dense corpus only
    sketch_scale: jax.Array | None = None,  # [N, 1] — int8 sketches only
    ft_scale: jax.Array | None = None,  # [N, 1] — int8 BM25 sketches only
    rescore_impl: str = "pallas",
    table_select: str = "approx",
    block_cols: int = BLOCK_COLS,
    dot_chunk: int = DOT_CHUNK,
    q_block: int = Q_BLOCK,
    vmem_mb: int = 100,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """The 3-way hybrid (dense + SPLADE + BM25 full text) with the SECTION
    KERNEL as its candidate stage: all THREE matmuls + selections ride one
    grid pass (the corpus blocks of every arm stream while the MXU
    alternates arms), then two exact forward-index rescores and 3-way
    weighted RRF — the `enable_full_text` configuration keeps the
    single-program design on the section path too. Drop-in contract of
    `ops/hybrid.py::hybrid_fused_topk_3way` with TRANSPOSED corpora.
    Reference: the 3-way weighted hybrid of `milvus_base.py:366-459`.

    Returns (fused RRF scores [B, k], row indices [B, k]; −1 pads).
    """
    from .fusion import rrf_fuse_device

    n = dense_t.shape[1]
    scales = ()
    if any(s is not None for s in (dense_scale, sketch_scale, ft_scale)):
        scales = (dense_scale, sketch_scale, ft_scale)
    td, ts, tf = section_bucket_tables(
        (dense_t, sketch_t, ft_sketch_t),
        (dense_q, sketch_q, ft_q_proj),
        mask,
        scales=scales,
        block_cols=block_cols, dot_chunk=dot_chunk, q_block=q_block,
        vmem_mb=vmem_mb, interpret=interpret,
    )
    _, d_rows = table_topk(td, fetch_k, block_cols, n, select_impl=table_select)
    if d_rows.shape[1] < fetch_k:  # narrow table (tiny capacity)
        d_rows = jnp.pad(d_rows, ((0, 0), (0, fetch_k - d_rows.shape[1])),
                         constant_values=-1)

    s_rows = _section_projected_arm(
        ts, sp_ids, sp_w, q_ids, q_w, fetch_k, depth, block_cols, n,
        rescore_impl, table_select,
    )
    f_rows = _section_projected_arm(
        tf, ft_ids, ft_w, ft_q_ids, ft_q_w, fetch_k, depth, block_cols, n,
        rescore_impl, table_select,
    )

    total = dense_weight + sparse_weight + ft_weight
    weights = jnp.stack(
        [
            jnp.asarray(dense_weight, jnp.float32),
            jnp.asarray(sparse_weight, jnp.float32),
            jnp.asarray(ft_weight, jnp.float32),
        ]
    ) / jnp.asarray(total, jnp.float32)
    stacked = jnp.stack([d_rows, s_rows, f_rows])  # [3, B, fetch_k]
    return rrf_fuse_device(stacked, weights, k=min(k, fetch_k), rrf_k=rrf_k)


def table_topk(
    table: jax.Array,  # [B, W] packed bucket table
    k: int,
    block_cols: int,
    n: int,
    select_impl: str = "exact",
) -> tuple[jax.Array, jax.Array]:
    """Top-k over a packed table -> (values [B, k] f32, global rows [B, k]
    i32; -1 where masked/absent). The packed low bits perturb ordering by
    <=127 ulp — the approx-selection family's contract — so the top-k runs
    directly on the packed values and only the k winners are decoded.

    select_impl="approx" uses `lax.approx_max_k` (recall 0.99, aggregated
    to an exact top-k of the survivors) — the table is already an
    approximate selection, so the extra approximation layer composes
    inside the same quality knob; measured A/B in bench_section.py.
    "approx95" drops recall_target to 0.95: at the serving point
    (k=depth=256 over a [B, 15616/7808] table) the 0.99 target forbids
    PartialReduce from reducing at all, so XLA lowers a FULL SORT of the
    table (3.6 ms at width 15616, the composed program's largest
    post-kernel op per the round-5 device trace); 0.95 re-enables the
    reduction. Candidate-set overlap vs exact 0.9918 measured at that
    shape (probe_table_select.py) — downstream of the exact rescore the
    final-list effect folds into the same quality knob.
    (`reduction_input_size_override` — the honest fix, since the table
    already summarizes the original N rows — crashes this toolchain's
    remote TPU compiler: tpu_compile_helper exit 1, 6/6 attempts,
    2026-08-19.)"""
    k = min(k, table.shape[1])
    if select_impl in ("approx", "approx95"):
        top_packed, cols = jax.lax.approx_max_k(
            table, k,
            recall_target=0.95 if select_impl == "approx95" else 0.99,
            aggregate_to_topk=True,
        )
    else:
        top_packed, cols = jax.lax.top_k(table, k)
    vals, pos = unpack_table(top_packed)
    rows = (cols // LANE) * block_cols + pos * LANE + (cols % LANE)
    rows = jnp.minimum(rows, n - 1)  # all-masked buckets decode junk pos
    rows = jnp.where(top_packed > NEG_INF / 2, rows, -1)
    return vals, rows
