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

from .dense import NEG_INF, candidate_topk, dense_scores
from .fusion import rrf_fuse_device
from .sparse import sparse_topk


def validate_candidate_impl(impl: str) -> str:
    """Per-stage candidate-impl knob: "xla" (matmul + `approx_max_k`) or
    "bucket" (the fused Pallas matmul+bucket-max, kept as the measured A/B
    instrument — the round-3 program matrix showed it losing in composition
    on every tier). The round-3 per-stage comma-pair spec ("dense,sketch")
    was retired with the round-4 whole-section kernel (VERDICT r3 #9):
    "section" is a whole-program impl dispatched by the store and never
    reaches these per-stage programs.
    """
    if impl not in ("xla", "bucket"):
        raise ValueError(f"candidate_impl must be 'xla' or 'bucket', got {impl!r}")
    return impl


@partial(jax.jit, static_argnames=("fetch_k", "depth", "exact_topk", "candidate_impl"))
def hybrid_candidates(
    dense_corpus: jax.Array,  # [N, d] row-normalized bf16
    sketch_corpus: jax.Array,  # [N, d_p] sparse sketches bf16 (or int8)
    dense_q: jax.Array,  # [B, d]
    sketch_q: jax.Array,  # [B, d_p]
    fetch_k: int,
    depth: int,
    mask: jax.Array | None = None,
    exact_topk: bool = True,
    dense_scale: jax.Array | None = None,  # [N, 1] — int8 dense corpus only
    sketch_scale: jax.Array | None = None,  # [N, 1] — int8 sketches only
    candidate_impl: str = "xla",
) -> tuple[jax.Array, jax.Array]:
    """Both hybrid candidate generations in ONE device program.

    Returns (dense candidate rows [B, fetch_k], sparse candidate rows
    [B, depth]; −1 where masked out). One dispatch + one host sync per query
    batch — on tunneled/remote backends the round-trip dominates, so fusing
    the two matmul top-ks halves the fixed cost.

    k-selection uses the TPU-native `approx_max_k` (the hardware MIPS
    top-k) unless ``exact_topk`` — candidate lists feed RRF/rescoring, so
    per-list selection recall folds into the same knob as the sketch depth.
    ``candidate_impl`` picks the strategy like the other fused programs
    ("xla" or "bucket").
    """
    impl = validate_candidate_impl(candidate_impl)
    d_top, d_rows = candidate_topk(
        dense_corpus, dense_q, fetch_k, mask, dense_scale, exact_topk, impl
    )
    s_top, s_rows = candidate_topk(
        sketch_corpus, sketch_q, depth, mask, sketch_scale, exact_topk, impl
    )
    d_rows = jnp.where(d_top > NEG_INF / 2, d_rows, -1)
    s_rows = jnp.where(s_top > NEG_INF / 2, s_rows, -1)
    return d_rows, s_rows


def exact_rescore_device(
    cand_rows: jax.Array,  # [B, C] candidate row indices (−1 = missing)
    sp_ids: jax.Array,  # [N, m] forward index term ids (0 = pad)
    sp_w: jax.Array,  # [N, m] term weights (0 in pad slots)
    q_ids: jax.Array,  # [B, qm] query term ids (0 = pad)
    q_w: jax.Array,  # [B, qm] query term weights (0 in pad slots)
) -> jax.Array:
    """Exact sparse scores for each (query, candidate) — on device, [B, C] f32.

    TPU-native formulation: instead of gathering from a [B, V] dense query
    table (random vocab-gathers don't vectorize on TPU), match candidate term
    ids against the query's own (tiny) term list with broadcast compares —
    a `lax.scan` over query terms of [B, C, m] VPU elementwise work. Doc rows
    have unique term ids, so each match hits at most one slot; pad slots
    carry weight 0 on both sides and contribute nothing.

    Row gather `sp_ids[cand]` is a contiguous-row gather (512 B rows), which
    the TPU memory system handles at near-streaming rate.
    """
    safe = jnp.maximum(cand_rows, 0)
    flat = safe.reshape(-1)
    m = sp_ids.shape[1]
    # astype int32: the stored ids may be int16 (capacity knob) — the HBM
    # read stays narrow, comparisons run at the query ids' width.
    cand_ids = (
        jnp.take(sp_ids, flat, axis=0).reshape(*cand_rows.shape, m).astype(jnp.int32)
    )
    cand_w = jnp.take(sp_w, flat, axis=0).reshape(*cand_rows.shape, m).astype(jnp.float32)

    def per_term(acc, term):
        t_id, t_w = term  # each [B]
        match = cand_ids == t_id[:, None, None]  # [B, C, m]
        hit = jnp.sum(jnp.where(match, cand_w, 0.0), axis=-1)  # [B, C]
        return acc + t_w[:, None] * hit, None

    init = jnp.zeros(cand_rows.shape, jnp.float32)
    scores, _ = jax.lax.scan(
        per_term, init, (q_ids.T.astype(jnp.int32), q_w.T.astype(jnp.float32))
    )
    return jnp.where(cand_rows >= 0, scores, NEG_INF)


def rescore_fn(impl: str):
    """Exact-rescore strategy: the scan reference, the one-shot XLA
    broadcast reduction, or the VMEM-resident Pallas kernel (all
    differential-tested equal; the scan re-reads the gathered candidate
    arrays per query term — ~8.6 GB HBM traffic at the serving point)."""
    if impl == "scan":
        return exact_rescore_device
    if impl == "oneshot":
        from .rescore import exact_rescore_oneshot

        return exact_rescore_oneshot
    if impl == "pallas":
        from .rescore import exact_rescore_dispatch

        return exact_rescore_dispatch
    raise ValueError(f"unknown rescore impl {impl!r}")


@partial(
    jax.jit,
    static_argnames=("k", "depth", "exact_topk", "rescore_impl", "candidate_impl"),
)
def projected_sparse_topk(
    sketch_corpus: jax.Array,  # [N, d_p] sparse sketches (float or int8)
    sp_ids: jax.Array,  # [N, m] forward index
    sp_w: jax.Array,  # [N, m]
    sketch_q: jax.Array,  # [B, d_p] query sketches
    q_ids: jax.Array,  # [B, qm] padded query terms
    q_w: jax.Array,  # [B, qm]
    k: int,
    depth: int,
    mask: jax.Array | None = None,
    exact_topk: bool = True,
    sketch_scale: jax.Array | None = None,  # [N, 1] — int8 sketches only
    rescore_impl: str = "scan",
    candidate_impl: str = "xla",
) -> tuple[jax.Array, jax.Array]:
    """Projected sparse search entirely on device: sketch-matmul candidates,
    exact forward-index rescore, final top-k. One program, one sync.

    Returns (exact scores [B, k], rows [B, k]; −1/−inf where missing).
    """
    impl = validate_candidate_impl(candidate_impl)
    c_top, cand = candidate_topk(
        sketch_corpus, sketch_q, depth, mask, sketch_scale, exact_topk, impl
    )
    cand = jnp.where(c_top > NEG_INF / 2, cand, -1)

    exact = rescore_fn(rescore_impl)(cand, sp_ids, sp_w, q_ids, q_w)
    top_scores, pos = jax.lax.top_k(exact, k)
    rows = jnp.take_along_axis(cand, pos, axis=1)
    # Zero exact score = no term overlap → not a hit (Milvus parity; see
    # `_projected_arm`).
    rows = jnp.where(top_scores > 0.0, rows, -1)
    return top_scores, rows


def _projected_arm(
    sketch_corpus,
    sp_ids,
    sp_w,
    sketch_q,
    q_ids,
    q_w,
    fetch_k: int,
    depth: int,
    mask,
    exact_topk: bool,
    sketch_scale,
    rescore_impl: str,
    sketch_impl: str,
) -> jax.Array:
    """One projected-sparse arm of a fused hybrid program: sketch-matmul
    candidates → exact forward-index rescore → top-`fetch_k` rows
    ([B, fetch_k] i32; −1 pads). Shared by the sparse and full-text arms —
    BM25 full text is the same machinery over the BM25-saturated forward
    index and idf query weights."""
    c_top, cand = candidate_topk(
        sketch_corpus, sketch_q, depth, mask, sketch_scale, exact_topk, sketch_impl
    )
    cand = jnp.where(c_top > NEG_INF / 2, cand, -1)
    exact = rescore_fn(rescore_impl)(cand, sp_ids, sp_w, q_ids, q_w)
    r_top, r_pos = jax.lax.top_k(exact, fetch_k)
    rows = jnp.take_along_axis(cand, r_pos, axis=1)
    # Zero exact score = no term overlap: an inverted index never surfaces
    # such docs (Milvus parity), and crediting them RRF rank would let an
    # arbitrary zero-score tail distort the fusion (term weights are
    # nonnegative — SPLADE activations and BM25 are ≥ 0 by construction).
    return jnp.where(r_top > 0.0, rows, -1)


@partial(
    jax.jit,
    static_argnames=(
        "k",
        "fetch_k",
        "depth",
        "rrf_k",
        "exact_topk",
        "rescore_impl",
        "candidate_impl",
    ),
)
def hybrid_fused_topk(
    dense_corpus: jax.Array,  # [N, d] row-normalized
    sketch_corpus: jax.Array,  # [N, d_p] sparse sketches
    sp_ids: jax.Array,  # [N, m] forward index
    sp_w: jax.Array,  # [N, m]
    dense_q: jax.Array,  # [B, d] row-normalized
    sketch_q: jax.Array,  # [B, d_p]
    q_ids: jax.Array,  # [B, qm] padded query terms
    q_w: jax.Array,  # [B, qm]
    k: int,
    fetch_k: int,
    depth: int,
    mask: jax.Array | None = None,
    dense_weight: jax.Array | float = 0.5,
    sparse_weight: jax.Array | float = 0.5,
    rrf_k: int = 60,
    exact_topk: bool = True,
    dense_scale: jax.Array | None = None,  # [N, 1] — int8 dense corpus only
    sketch_scale: jax.Array | None = None,  # [N, 1] — int8 sketches only
    rescore_impl: str = "scan",
    candidate_impl: str = "xla",
) -> tuple[jax.Array, jax.Array]:
    """The full hybrid query as ONE device program: both candidate matmuls,
    exact sparse rescore of the top-`depth` sketch candidates, and weighted
    RRF fusion — no host phase at all (replaces the round-1 design where
    rescore + RRF synced to the host per batch, `milvus_base.py:261-294`
    being the behavioral contract).

    Returns (fused RRF scores [B, k], row indices [B, k]; −1 pads).
    """
    impl = validate_candidate_impl(candidate_impl)
    d_top, d_rows = candidate_topk(
        dense_corpus, dense_q, fetch_k, mask, dense_scale, exact_topk, impl
    )
    d_rows = jnp.where(d_top > NEG_INF / 2, d_rows, -1)

    s_rows = _projected_arm(
        sketch_corpus, sp_ids, sp_w, sketch_q, q_ids, q_w, fetch_k, depth,
        mask, exact_topk, sketch_scale, rescore_impl, impl,
    )

    total = dense_weight + sparse_weight
    weights = jnp.stack(
        [jnp.asarray(dense_weight, jnp.float32), jnp.asarray(sparse_weight, jnp.float32)]
    ) / jnp.asarray(total, jnp.float32)
    stacked = jnp.stack([d_rows, s_rows])  # [2, B, fetch_k]
    return rrf_fuse_device(stacked, weights, k=min(k, fetch_k), rrf_k=rrf_k)


@partial(
    jax.jit,
    static_argnames=(
        "k",
        "fetch_k",
        "depth",
        "rrf_k",
        "exact_topk",
        "rescore_impl",
        "candidate_impl",
    ),
)
def hybrid_fused_topk_3way(
    dense_corpus: jax.Array,  # [N, d] row-normalized
    sketch_corpus: jax.Array,  # [N, d_p] SPLADE sketches
    sp_ids: jax.Array,  # [N, m] SPLADE forward index
    sp_w: jax.Array,  # [N, m]
    ft_sketch: jax.Array,  # [N, d_p] BM25 sketches
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
    mask: jax.Array | None = None,
    dense_weight: jax.Array | float = 1.0,
    sparse_weight: jax.Array | float = 1.0,
    ft_weight: jax.Array | float = 1.0,
    rrf_k: int = 60,
    exact_topk: bool = True,
    dense_scale: jax.Array | None = None,  # [N, 1] — int8 dense corpus only
    sketch_scale: jax.Array | None = None,  # [N, 1] — int8 sketches only
    ft_scale: jax.Array | None = None,  # [N, 1] — int8 BM25 sketches only
    rescore_impl: str = "scan",
    candidate_impl: str = "xla",
) -> tuple[jax.Array, jax.Array]:
    """The 3-way hybrid (dense + SPLADE + BM25 full text) as ONE device
    program: three candidate generations, two exact forward-index rescores,
    3-way weighted RRF — the `enable_full_text` serving configuration keeps
    the single-sync design instead of dropping to three dispatches + host
    fusion. Reference contract: the 3-way weighted hybrid of
    `milvus_base.py:366-459` (three Milvus sub-searches + client merge).

    Returns (fused RRF scores [B, k], row indices [B, k]; −1 pads).
    """
    impl = validate_candidate_impl(candidate_impl)
    d_top, d_rows = candidate_topk(
        dense_corpus, dense_q, fetch_k, mask, dense_scale, exact_topk, impl
    )
    d_rows = jnp.where(d_top > NEG_INF / 2, d_rows, -1)

    s_rows = _projected_arm(
        sketch_corpus, sp_ids, sp_w, sketch_q, q_ids, q_w, fetch_k, depth,
        mask, exact_topk, sketch_scale, rescore_impl, impl,
    )
    f_rows = _projected_arm(
        ft_sketch, ft_ids, ft_w, ft_q_proj, ft_q_ids, ft_q_w, fetch_k, depth,
        mask, exact_topk, ft_scale, rescore_impl, impl,
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
    dense_scale: jax.Array | None = None,  # [N, 1] — int8 dense corpus only
) -> tuple[jax.Array, jax.Array]:
    """Fused hybrid search → (fused scores [B, k], row indices [B, k]).

    Per-method candidate depth is ``2k`` (reference parity) before on-device
    weighted RRF.
    """
    fetch_k = min(2 * k, dense_corpus.shape[0])

    d_scores = dense_scores(dense_corpus, dense_q, dense_scale)
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
