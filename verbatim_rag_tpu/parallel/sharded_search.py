"""Distributed retrieval: row-sharded index, per-shard top-k, ICI merge.

TPU-native replacement for Milvus's distributed search (SURVEY.md §2.9
"Distributed comm backend"): the corpus lives as mesh-sharded device arrays;
each device scores only its row shard and selects a local top-k; the k-way
merge is an `all_gather` of (score, global-row) pairs over ICI followed by a
final top-k — O(devices·k) traffic instead of shipping score vectors.

Implemented with `shard_map` so the same code runs on a real TPU pod slice
or the virtual CPU mesh used in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from verbatim_rag_tpu.ops.dense import NEG_INF, candidate_select, dense_scores


def shard_rows(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a [N, ...] array row-sharded over the whole mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(("dp", "tp"))))


def replicate(x: jax.Array, mesh: Mesh) -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, P()))


@partial(jax.jit, static_argnames=("k", "mesh", "exact_topk"))
def sharded_dense_topk(
    corpus: jax.Array,  # [N, d] row-sharded over ('dp','tp')
    queries: jax.Array,  # [B, d] replicated
    k: int,
    mask: jax.Array,  # [N] row-sharded
    mesh: Mesh,
    exact_topk: bool = True,
    corpus_scale: jax.Array | None = None,  # [N, 1] row-sharded — int8 corpus
) -> tuple[jax.Array, jax.Array]:
    """Exact distributed top-k: (scores [B, k], global row indices [B, k])."""
    axis = ("dp", "tp")
    n_total = corpus.shape[0]

    def local_search(corpus_shard, queries_rep, mask_shard, scale_shard=None):
        # corpus_shard: [N/devs, d] — local scores on the MXU.
        scores = dense_scores(corpus_shard, queries_rep, scale_shard)
        scores = jnp.where(mask_shard[None, :], scores, NEG_INF)
        local_k = min(k, corpus_shard.shape[0])
        top_scores, top_idx = candidate_select(exact_topk)(scores, k=local_k)

        # Globalize indices: shard offset = shard_index * rows_per_shard.
        shard_index = jax.lax.axis_index(axis)
        top_idx = top_idx + shard_index * corpus_shard.shape[0]

        # ICI merge: gather every shard's candidates, re-select top-k.
        all_scores = jax.lax.all_gather(top_scores, axis, axis=1)  # [B, devs, k]
        all_idx = jax.lax.all_gather(top_idx, axis, axis=1)
        flat_scores = all_scores.reshape(all_scores.shape[0], -1)
        flat_idx = all_idx.reshape(all_idx.shape[0], -1)
        final_scores, pos = jax.lax.top_k(flat_scores, k)
        final_idx = jnp.take_along_axis(flat_idx, pos, axis=1)
        return final_scores, final_idx

    from jax import shard_map

    in_specs = (P(axis), P(), P(axis))
    args = (corpus, queries, mask)
    if corpus_scale is not None:
        in_specs += (P(axis),)
        args += (corpus_scale,)
    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    del n_total
    return fn(*args)


def _pad_cols(x: jax.Array, width: int, fill) -> jax.Array:
    """Right-pad the last axis to ``width`` with ``fill`` (no-op if wide enough)."""
    short = width - x.shape[-1]
    if short <= 0:
        return x
    pad = jnp.full((*x.shape[:-1], short), fill, x.dtype)
    return jnp.concatenate([x, pad], axis=-1)


@partial(
    jax.jit,
    static_argnames=(
        "k", "depth", "mesh", "exact_topk", "rescore_impl", "candidate_impl",
    ),
)
def sharded_projected_sparse_topk(
    sketch_corpus: jax.Array,  # [N, d_p] row-sharded
    sp_ids: jax.Array,  # [N, m] row-sharded forward index
    sp_w: jax.Array,  # [N, m] row-sharded
    sketch_q: jax.Array,  # [B, d_p] replicated
    q_ids: jax.Array,  # [B, qm] replicated
    q_w: jax.Array,  # [B, qm] replicated
    k: int,
    depth: int,
    mask: jax.Array,  # [N] row-sharded
    mesh: Mesh,
    exact_topk: bool = True,
    sketch_scale: jax.Array | None = None,  # [N, 1] row-sharded — int8 sketches
    rescore_impl: str = "scan",
    candidate_impl: str = "xla",
) -> tuple[jax.Array, jax.Array]:
    """Distributed projected sparse search: per-shard sketch candidates +
    per-shard exact rescore, ICI merge of (exact score, global row) pairs.

    Exact scores are shard-independent, so the global merge is exact over the
    union of per-shard candidates — per-shard candidate depth means sharded
    recall is ≥ the single-device store's at equal ``depth``. The kernel
    impl knobs (ops/hybrid.py rescore_fn, ops/dense.py candidate_topk)
    apply per shard inside the shard_map body.
    """
    from verbatim_rag_tpu.ops.dense import candidate_topk
    from verbatim_rag_tpu.ops.hybrid import rescore_fn, validate_candidate_impl

    sketch_impl = validate_candidate_impl(candidate_impl)
    axis = ("dp", "tp")
    has_sscale = sketch_scale is not None

    def local(sketch_s, ids_s, w_s, mask_s, qproj, qids, qw, *scales):
        n_local = sketch_s.shape[0]
        offset = jax.lax.axis_index(axis) * n_local
        local_depth = min(depth, n_local)
        c_top, cand = candidate_topk(
            sketch_s, qproj, local_depth, mask_s,
            scales[0] if has_sscale else None, exact_topk, sketch_impl,
        )
        cand = jnp.where(c_top > NEG_INF / 2, cand, -1)
        exact = rescore_fn(rescore_impl)(cand, ids_s, w_s, qids, qw)
        local_k = min(k, local_depth)
        r_top, r_pos = jax.lax.top_k(exact, local_k)
        idx = jnp.take_along_axis(cand, r_pos, axis=1)
        idx = jnp.where(r_top > NEG_INF / 2, idx + offset, -1)

        all_scores = jax.lax.all_gather(r_top, axis, axis=1)
        all_idx = jax.lax.all_gather(idx, axis, axis=1)
        flat_scores = all_scores.reshape(all_scores.shape[0], -1)
        flat_idx = all_idx.reshape(all_idx.shape[0], -1)
        gk = min(k, flat_scores.shape[1])
        final_scores, pos = jax.lax.top_k(flat_scores, gk)
        final_idx = jnp.take_along_axis(flat_idx, pos, axis=1)
        # Zero exact score = no term overlap → not a hit (Milvus parity;
        # see ops/hybrid.py `_projected_arm`).
        final_idx = jnp.where(final_scores > 0.0, final_idx, -1)
        return _pad_cols(final_scores, k, NEG_INF), _pad_cols(final_idx, k, -1)

    from jax import shard_map

    in_specs = (P(axis), P(axis), P(axis), P(axis), P(), P(), P())
    args = (sketch_corpus, sp_ids, sp_w, mask, sketch_q, q_ids, q_w)
    if has_sscale:
        in_specs += (P(axis),)
        args += (sketch_scale,)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(*args)


@partial(
    jax.jit,
    static_argnames=(
        "k", "fetch_k", "depth", "rrf_k", "mesh", "exact_topk",
        "rescore_impl", "candidate_impl",
    ),
)
def sharded_hybrid_topk(
    dense_corpus: jax.Array,  # [N, d] row-sharded
    sketch_corpus: jax.Array,  # [N, d_p] row-sharded
    sp_ids: jax.Array,  # [N, m] row-sharded
    sp_w: jax.Array,  # [N, m] row-sharded
    dense_q: jax.Array,  # [B, d] replicated
    sketch_q: jax.Array,  # [B, d_p] replicated
    q_ids: jax.Array,  # [B, qm] replicated
    q_w: jax.Array,  # [B, qm] replicated
    k: int,
    fetch_k: int,
    depth: int,
    mask: jax.Array,  # [N] row-sharded
    mesh: Mesh,
    dense_weight: jax.Array | float = 0.5,
    sparse_weight: jax.Array | float = 0.5,
    rrf_k: int = 60,
    exact_topk: bool = True,
    dense_scale: jax.Array | None = None,  # [N, 1] row-sharded — int8 corpus
    sketch_scale: jax.Array | None = None,  # [N, 1] row-sharded — int8 sketches
    rescore_impl: str = "scan",
    candidate_impl: str = "xla",
    ft_arm: tuple | None = None,  # (ft_sketch, ft_ids, ft_w [row-sharded],
    #  ft_q_proj, ft_q_ids, ft_q_w [replicated], ft_weight, ft_scale|None)
) -> tuple[jax.Array, jax.Array]:
    """The full hybrid query distributed over the mesh, still ONE program:
    per-shard dense + sketch candidates, per-shard exact sparse rescore,
    ICI all_gather merges (O(devices·k) traffic), on-device weighted RRF.

    This is the multi-chip serving path of `DeviceVectorStore` — the scaling
    story Milvus delegates to its cluster (`milvus_base.py:189-313`). The
    kernel impl knobs apply per shard inside the shard_map body. With
    ``ft_arm`` the BM25 full-text method rides the same program as a third
    projected arm (3-way weighted RRF, `milvus_base.py:366-459`).
    """
    from verbatim_rag_tpu.ops.dense import candidate_topk
    from verbatim_rag_tpu.ops.fusion import rrf_fuse_device
    from verbatim_rag_tpu.ops.hybrid import rescore_fn, validate_candidate_impl

    dense_impl = sketch_impl = validate_candidate_impl(candidate_impl)
    axis = ("dp", "tp")
    has_dscale = dense_scale is not None
    has_sscale = sketch_scale is not None
    has_ft = ft_arm is not None
    if has_ft:
        ft_sketch, ft_ids, ft_w, ft_qproj, ft_qids, ft_qw, ft_weight, ft_scale = ft_arm
        has_fscale = ft_scale is not None
    else:
        ft_weight, ft_scale, has_fscale = 0.0, None, False

    def projected_arm_merged(
        sketch_s, ids_s, w_s, mask_s, qproj, qids, qw, sscale_s, offset
    ):
        """Local sketch candidates → local exact rescore → ICI merge by
        exact score → global top-fetch_k rows."""
        n_local = sketch_s.shape[0]
        local_depth = min(depth, n_local)
        c_top, cand = candidate_topk(
            sketch_s, qproj, local_depth, mask_s, sscale_s, exact_topk, sketch_impl
        )
        cand = jnp.where(c_top > NEG_INF / 2, cand, -1)
        exact = rescore_fn(rescore_impl)(cand, ids_s, w_s, qids, qw)
        lrk = min(fetch_k, local_depth)
        r_top, r_pos = jax.lax.top_k(exact, lrk)
        s_idx = jnp.take_along_axis(cand, r_pos, axis=1)
        s_idx = jnp.where(r_top > NEG_INF / 2, s_idx + offset, -1)
        s_all_s = jax.lax.all_gather(r_top, axis, axis=1).reshape(r_top.shape[0], -1)
        s_all_i = jax.lax.all_gather(s_idx, axis, axis=1).reshape(s_idx.shape[0], -1)
        sgk = min(fetch_k, s_all_s.shape[1])
        s_gs, s_pos = jax.lax.top_k(s_all_s, sgk)
        s_rows = jnp.take_along_axis(s_all_i, s_pos, axis=1)
        # Zero exact score = no term overlap → not a hit (Milvus parity;
        # see ops/hybrid.py `_projected_arm`).
        return jnp.where(s_gs > 0.0, s_rows, -1)

    def local(dense_s, sketch_s, ids_s, w_s, mask_s, dq, qproj, qids, qw, *rest):
        rest = list(rest)
        ft_s = ft_i = ft_v = fqp = fqi = fqw = None
        if has_ft:
            ft_s, ft_i, ft_v, fqp, fqi, fqw = rest[:6]
            rest = rest[6:]
        scale_s = rest.pop(0) if has_dscale else None
        sscale_s = rest.pop(0) if has_sscale else None
        fscale_s = rest.pop(0) if has_fscale else None
        n_local = dense_s.shape[0]
        offset = jax.lax.axis_index(axis) * n_local

        # Dense: local exact top-fetch_k; global merge is exact.
        lk = min(fetch_k, n_local)
        d_top, d_idx = candidate_topk(
            dense_s, dq, lk, mask_s, scale_s, exact_topk, dense_impl
        )
        d_idx = jnp.where(d_top > NEG_INF / 2, d_idx + offset, -1)
        d_all_s = jax.lax.all_gather(d_top, axis, axis=1).reshape(d_top.shape[0], -1)
        d_all_i = jax.lax.all_gather(d_idx, axis, axis=1).reshape(d_top.shape[0], -1)
        gk = min(fetch_k, d_all_s.shape[1])
        d_gs, d_pos = jax.lax.top_k(d_all_s, gk)
        d_rows = jnp.take_along_axis(d_all_i, d_pos, axis=1)
        d_rows = jnp.where(d_gs > NEG_INF / 2, d_rows, -1)

        s_rows = projected_arm_merged(
            sketch_s, ids_s, w_s, mask_s, qproj, qids, qw, sscale_s, offset
        )
        arms = [d_rows, s_rows]
        raw_weights = [dense_weight, sparse_weight]
        if has_ft:
            arms.append(
                projected_arm_merged(
                    ft_s, ft_i, ft_v, mask_s, fqp, fqi, fqw, fscale_s, offset
                )
            )
            raw_weights.append(ft_weight)

        width = max(a.shape[1] for a in arms)
        stacked = jnp.stack([_pad_cols(a, width, -1) for a in arms])
        total = sum(raw_weights)
        weights = jnp.stack(
            [jnp.asarray(w, jnp.float32) for w in raw_weights]
        ) / jnp.asarray(total, jnp.float32)
        return rrf_fuse_device(stacked, weights, k=min(k, width), rrf_k=rrf_k)

    from jax import shard_map

    in_specs = (P(axis), P(axis), P(axis), P(axis), P(axis), P(), P(), P(), P())
    args = (dense_corpus, sketch_corpus, sp_ids, sp_w, mask, dense_q, sketch_q, q_ids, q_w)
    if has_ft:
        in_specs += (P(axis), P(axis), P(axis), P(), P(), P())
        args += (ft_sketch, ft_ids, ft_w, ft_qproj, ft_qids, ft_qw)
    if dense_scale is not None:
        in_specs += (P(axis),)
        args += (dense_scale,)
    if sketch_scale is not None:
        in_specs += (P(axis),)
        args += (sketch_scale,)
    if has_fscale:
        in_specs += (P(axis),)
        args += (ft_scale,)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    scores, rows = fn(*args)
    if rows.shape[1] < k:
        scores = _pad_cols(scores, k, 0.0)
        rows = _pad_cols(rows, k, -1)
    return scores, rows


@partial(
    jax.jit,
    static_argnames=(
        "k", "fetch_k", "depth", "rrf_k", "mesh", "rescore_impl",
        "table_select", "block_cols", "dot_chunk", "interpret",
    ),
)
def sharded_hybrid_section_topk(
    dense_t: jax.Array,  # [d, N] TRANSPOSED corpus, column-sharded
    sketch_t: jax.Array,  # [d_p, N] TRANSPOSED sketches, column-sharded
    sp_ids: jax.Array,  # [N, m] row-sharded forward index
    sp_w: jax.Array,  # [N, m] row-sharded
    dense_q: jax.Array,  # [B, d] replicated
    sketch_q: jax.Array,  # [B, d_p] replicated
    q_ids: jax.Array,  # [B, qm] replicated
    q_w: jax.Array,  # [B, qm] replicated
    k: int,
    fetch_k: int,
    depth: int,
    mask: jax.Array,  # [N] row-sharded
    mesh: Mesh,
    dense_weight: jax.Array | float = 0.5,
    sparse_weight: jax.Array | float = 0.5,
    rrf_k: int = 60,
    dense_scale: jax.Array | None = None,  # [N, 1] row-sharded — int8 corpus
    sketch_scale: jax.Array | None = None,  # [N, 1] row-sharded — int8 sketches
    rescore_impl: str = "pallas",
    table_select: str = "approx",
    ft_arm: tuple | None = None,  # (ft_sketch_t [d_p, N] column-sharded,
    #  ft_ids, ft_w [row-sharded], ft_q_proj, ft_q_ids, ft_q_w [replicated],
    #  ft_weight, ft_scale [row-sharded]|None)
    block_cols: int = 8192,
    dot_chunk: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """The mesh-sharded hybrid query with the SECTION KERNEL as its
    per-shard candidate stage (VERDICT r4 #6): each shard is exactly the
    single-device section problem — one Pallas grid pass over the shard's
    transposed corpus blocks producing packed bucket tables, then the
    shard-local table top-ks + exact forward-index rescore — and the ICI
    merge is unchanged from `sharded_hybrid_topk` (all_gather of
    (score, global-row) pairs, O(devices·fetch_k) traffic). Per-shard
    candidate depth means sharded recall ≥ the single-device store's at
    equal ``depth``, same argument as the XLA path.

    Geometry: each shard's column count must be a ``block_cols`` multiple
    (the store's `_section_serves` gate checks capacity % (devices·8192)).
    Reference capability: Milvus's distributed hybrid search
    (`milvus_base.py:189-313`) — re-designed as one mesh program.

    Returns (fused RRF scores [B, k], row indices [B, k]; −1 pads).
    """
    from verbatim_rag_tpu.ops.fusion import rrf_fuse_device
    from verbatim_rag_tpu.ops.section import section_bucket_tables, table_topk

    axis = ("dp", "tp")
    has_dscale = dense_scale is not None
    has_sscale = sketch_scale is not None
    has_ft = ft_arm is not None
    if has_ft:
        ft_t, ft_ids, ft_w, ft_qproj, ft_qids, ft_qw, ft_weight, ft_scale = ft_arm
        has_fscale = ft_scale is not None
    else:
        ft_weight, ft_scale, has_fscale = 0.0, None, False

    def _merge_rows(scores_l, rows_l, width):
        """ICI merge of local (score, global-row) pairs → top-``width``."""
        all_s = jax.lax.all_gather(scores_l, axis, axis=1)
        all_i = jax.lax.all_gather(rows_l, axis, axis=1)
        flat_s = all_s.reshape(all_s.shape[0], -1)
        flat_i = all_i.reshape(all_i.shape[0], -1)
        gk = min(width, flat_s.shape[1])
        g_s, pos = jax.lax.top_k(flat_s, gk)
        return g_s, jnp.take_along_axis(flat_i, pos, axis=1)

    def local(dense_t_s, sketch_t_s, ids_s, w_s, mask_s, dq, qproj, qids, qw, *rest):
        rest = list(rest)
        ft_t_s = ft_i_s = ft_w_s = fqp = fqi = fqw = None
        if has_ft:
            ft_t_s, ft_i_s, ft_w_s, fqp, fqi, fqw = rest[:6]
            rest = rest[6:]
        dscale_s = rest.pop(0) if has_dscale else None
        sscale_s = rest.pop(0) if has_sscale else None
        fscale_s = rest.pop(0) if has_fscale else None
        n_local = dense_t_s.shape[1]
        offset = jax.lax.axis_index(axis) * n_local

        corpora = [dense_t_s, sketch_t_s]
        queries = [dq, qproj]
        scale_list = [dscale_s, sscale_s]
        if has_ft:
            corpora.append(ft_t_s)
            queries.append(fqp)
            scale_list.append(fscale_s)
        scales = (
            tuple(scale_list) if any(s is not None for s in scale_list) else ()
        )
        tables = section_bucket_tables(
            tuple(corpora), tuple(queries), mask_s, scales=scales,
            block_cols=block_cols, dot_chunk=dot_chunk or min(2048, block_cols),
            interpret=interpret,
        )

        # Dense arm: shard-local table top-k, merged by (packed) value —
        # the packed low bits perturb ordering ≤127 ulp across shards
        # identically, the same contract as the single-device table_topk.
        lk = min(fetch_k, tables[0].shape[1])
        d_vals, d_rows = table_topk(
            tables[0], lk, block_cols, n_local, select_impl=table_select
        )
        d_rows = jnp.where(d_rows >= 0, d_rows + offset, -1)
        d_gs, d_rows = _merge_rows(d_vals, d_rows, fetch_k)
        d_rows = jnp.where(d_gs > NEG_INF / 2, d_rows, -1)
        d_rows = _pad_cols(d_rows, fetch_k, -1)

        def projected_arm(table, ids_a, w_a, qi, qv):
            """Shard-local table top-depth → exact rescore → ICI merge by
            exact score (shard-independent, so the merge is exact over the
            union of per-shard candidates)."""
            local_depth = min(depth, table.shape[1])
            _, cand = table_topk(
                table, local_depth, block_cols, n_local, select_impl=table_select
            )
            from verbatim_rag_tpu.ops.hybrid import rescore_fn

            exact = rescore_fn(rescore_impl)(cand, ids_a, w_a, qi, qv)
            lrk = min(fetch_k, local_depth)
            r_top, r_pos = jax.lax.top_k(exact, lrk)
            rows_l = jnp.take_along_axis(cand, r_pos, axis=1)
            rows_l = jnp.where(r_top > NEG_INF / 2, rows_l + offset, -1)
            g_s, rows = _merge_rows(r_top, rows_l, fetch_k)
            # Zero exact score = no term overlap → not a hit (Milvus
            # parity; see ops/hybrid.py `_projected_arm`).
            return _pad_cols(jnp.where(g_s > 0.0, rows, -1), fetch_k, -1)

        arms = [d_rows, projected_arm(tables[1], ids_s, w_s, qids, qw)]
        raw_weights = [dense_weight, sparse_weight]
        if has_ft:
            arms.append(projected_arm(tables[2], ft_i_s, ft_w_s, fqi, fqw))
            raw_weights.append(ft_weight)

        stacked = jnp.stack(arms)
        total = sum(raw_weights)
        weights = jnp.stack(
            [jnp.asarray(w, jnp.float32) for w in raw_weights]
        ) / jnp.asarray(total, jnp.float32)
        return rrf_fuse_device(stacked, weights, k=min(k, fetch_k), rrf_k=rrf_k)

    from jax import shard_map

    col = P(None, axis)
    in_specs = [col, col, P(axis), P(axis), P(axis), P(), P(), P(), P()]
    args = [dense_t, sketch_t, sp_ids, sp_w, mask, dense_q, sketch_q, q_ids, q_w]
    if has_ft:
        in_specs += [col, P(axis), P(axis), P(), P(), P()]
        args += [ft_t, ft_ids, ft_w, ft_qproj, ft_qids, ft_qw]
    for scale, present in (
        (dense_scale, has_dscale), (sketch_scale, has_sscale), (ft_scale, has_fscale),
    ):
        if present:
            in_specs.append(P(axis))
            args.append(scale)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    scores, rows = fn(*args)
    if rows.shape[1] < k:
        scores = _pad_cols(scores, k, 0.0)
        rows = _pad_cols(rows, k, -1)
    return scores, rows


@partial(jax.jit, static_argnames=("k", "mesh", "block"))
def sharded_sparse_topk(
    token_ids: jax.Array,  # [N, m] row-sharded
    weights: jax.Array,  # [N, m] row-sharded
    q_dense: jax.Array,  # [B, V] replicated
    k: int,
    mask: jax.Array,  # [N] row-sharded
    mesh: Mesh,
    block: int = 8192,
) -> tuple[jax.Array, jax.Array]:
    """Distributed sparse forward-index top-k with ICI merge."""
    axis = ("dp", "tp")

    def local_search(ids_shard, w_shard, q_rep, mask_shard):
        import math

        n_rows, m = ids_shard.shape
        # Largest block that tiles the shard exactly — never drop rows.
        blk = math.gcd(min(block, n_rows), n_rows)
        n_blocks = n_rows // blk
        q_table = q_rep.T.astype(jnp.float32)

        ids_b = ids_shard[: n_blocks * blk].reshape(n_blocks, blk, m)
        w_b = w_shard[: n_blocks * blk].reshape(n_blocks, blk, m).astype(jnp.float32)

        def score_block(args):
            ids_x, w_x = args
            gathered = jnp.take(q_table, ids_x.reshape(-1), axis=0).reshape(blk, m, -1)
            return jnp.einsum("nmb,nm->bn", gathered, w_x)

        scores = jax.lax.map(score_block, (ids_b, w_b))
        scores = jnp.moveaxis(scores, 0, 1).reshape(q_rep.shape[0], n_blocks * blk)
        scores = jnp.where(mask_shard[None, : n_blocks * blk], scores, NEG_INF)
        local_k = min(k, scores.shape[1])
        top_scores, top_idx = jax.lax.top_k(scores, local_k)

        shard_index = jax.lax.axis_index(axis)
        top_idx = top_idx + shard_index * n_rows

        all_scores = jax.lax.all_gather(top_scores, axis, axis=1)
        all_idx = jax.lax.all_gather(top_idx, axis, axis=1)
        flat_scores = all_scores.reshape(all_scores.shape[0], -1)
        flat_idx = all_idx.reshape(all_idx.shape[0], -1)
        final_scores, pos = jax.lax.top_k(flat_scores, k)
        final_idx = jnp.take_along_axis(flat_idx, pos, axis=1)
        # Zero score = no term overlap → not a hit (ops/sparse.py parity).
        return final_scores, jnp.where(final_scores > 0.0, final_idx, -1)

    from jax import shard_map

    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(token_ids, weights, q_dense, mask)
