"""Recall@10 at 1M chunks, measured at the serving operating point.

VERDICT.md round-1 #4: round 1 measured projected-sparse candidate recall at
64k docs while serving 1M with rescore_depth=96 — this measures the real
thing, with SPLADE-like statistics:

- term ids Zipf-distributed over the 30522 vocab (SPLADE mass concentrates
  on few thousand active terms), doc nnz ~ 96±32, weights lognormal;
- queries share the same Zipfian vocabulary, 32 terms each.

Reports, against exact ground truth on the same arrays:
  1. sparse recall@10 — projected sketch candidates (depth=96) + exact
     rescore, with exact `lax.top_k` candidate selection;
  2. same with `approx_max_k` (recall_target 0.99) candidate selection —
     the TPU-native hardware top-k the serving default uses;
  3. dense candidate recall@20 of approx vs exact selection;
  4. end-to-end hybrid RRF top-10 overlap: approx pipeline vs exact pipeline.

Run: python benchmarks/recall_1m.py  (on the TPU; ~5 min with cold compiles)
"""

from __future__ import annotations

import json
import sys

import numpy as np

N, VOCAB, M, DIM, PROJ = 1_000_000, 30522, 128, 384, 768
QB, QNNZ, DEPTH, K = 64, 32, 96, 10
GT_BLOCK = 15_625  # exact-scan block for ground truth (divides N)


def zipf_ids(rng, size, vocab=VOCAB) -> np.ndarray:
    """Zipf-ish term ids in [1, vocab): p(rank) ∝ 1/(rank+10)."""
    ranks = np.arange(1, vocab)
    p = 1.0 / (ranks + 10.0)
    p /= p.sum()
    return rng.choice(ranks, size=size, p=p).astype(np.int32)


def main() -> None:
    import jax

    from verbatim_rag_tpu.utils.jax_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    import jax.numpy as jnp

    from verbatim_rag_tpu.ops.fusion import rrf_fuse_np
    from verbatim_rag_tpu.ops.hybrid import hybrid_fused_topk, projected_sparse_topk
    from verbatim_rag_tpu.ops.sparse import densify_queries, sparse_topk
    from verbatim_rag_tpu.ops.sparse_projected import projection_matrix

    rng = np.random.default_rng(0)

    # --- corpus (built on host in blocks, shipped once) ---
    sp_ids = zipf_ids(rng, (N, M))
    # Unique ids per row are the SPLADE contract; duplicates within a row are
    # rare under Zipf at m=128 but do occur — zero their weight (pad slots).
    sp_w = rng.lognormal(mean=-0.5, sigma=0.7, size=(N, M)).astype(np.float32)
    sort_idx = np.argsort(sp_ids, axis=1)
    sp_ids = np.take_along_axis(sp_ids, sort_idx, axis=1)
    sp_w = np.take_along_axis(sp_w, sort_idx, axis=1)
    dup = np.zeros_like(sp_ids, dtype=bool)
    dup[:, 1:] = sp_ids[:, 1:] == sp_ids[:, :-1]
    sp_w[dup] = 0.0
    sp_ids[dup] = 0
    # Variable nnz: drop a random tail per row.
    nnz = np.clip(rng.normal(96, 32, size=N), 16, M).astype(np.int32)
    tail = np.arange(M)[None, :] >= nnz[:, None]
    # Mid-row pad slots are fine: weight 0 / id 0 contribute nothing, so no
    # reorder is needed (a stable argsort over [1M, 128] cost seconds of
    # 1-vCPU host time for an array that was never applied).
    sp_w[tail] = 0.0
    sp_ids[tail] = 0

    proj = projection_matrix(VOCAB, PROJ, seed=0)
    from verbatim_rag_tpu.ops.sparse_projected import project_rows

    sketches = np.empty((N, PROJ), np.float32)
    for start in range(0, N, 100_000):
        end = min(start + 100_000, N)
        sketches[start:end] = project_rows(sp_ids[start:end], sp_w[start:end], proj)

    dense = rng.normal(size=(N, DIM)).astype(np.float32)
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)

    d_sp_ids = jnp.asarray(sp_ids)
    d_sp_w = jnp.asarray(sp_w)
    d_sketch = jnp.asarray(sketches, jnp.bfloat16)
    d_dense = jnp.asarray(dense, jnp.bfloat16)
    mask = jnp.ones((N,), bool)

    # --- queries ---
    q_ids = zipf_ids(rng, (QB, QNNZ))
    for b in range(QB):  # unique terms per query
        seen: set[int] = set()
        for j in range(QNNZ):
            while int(q_ids[b, j]) in seen:
                q_ids[b, j] = zipf_ids(rng, ())
            seen.add(int(q_ids[b, j]))
    q_w = rng.lognormal(mean=0.0, sigma=0.5, size=(QB, QNNZ)).astype(np.float32)
    q_sketch = np.zeros((QB, PROJ), np.float32)
    for b in range(QB):
        q_sketch[b] = (q_w[b][:, None] * proj[q_ids[b]]).sum(0)
    dq = rng.normal(size=(QB, DIM)).astype(np.float32)
    dq /= np.linalg.norm(dq, axis=1, keepdims=True)

    jq_ids, jq_w = jnp.asarray(q_ids), jnp.asarray(q_w)
    jq_sketch, jdq = jnp.asarray(q_sketch), jnp.asarray(dq)

    # --- 1+2: sparse recall@10, exact vs approx candidate selection ---
    q_dense = np.asarray(densify_queries(jq_ids, jq_w, VOCAB))
    gt_scores, gt_rows = sparse_topk(
        d_sp_ids, d_sp_w, jnp.asarray(q_dense), K, mask, block=GT_BLOCK
    )
    gt_rows = np.asarray(gt_rows)

    results = {}
    for label, exact in (("sparse_recall@10_exact_sel", True),
                         ("sparse_recall@10_approx_sel", False)):
        _s, rows = projected_sparse_topk(
            d_sketch, d_sp_ids, d_sp_w, jq_sketch, jq_ids, jq_w,
            k=K, depth=DEPTH, mask=mask, exact_topk=exact,
        )
        rows = np.asarray(rows)
        hit = np.mean([
            len(set(rows[b]) & set(gt_rows[b])) / K for b in range(QB)
        ])
        results[label] = round(float(hit), 4)

    # --- 3: dense candidate recall@20, approx vs exact ---
    from verbatim_rag_tpu.ops.dense import dense_topk

    _s, d_gt = dense_topk(d_dense, jdq, 20, mask)
    d_gt = np.asarray(d_gt)
    sc = jnp.dot(jdq.astype(d_dense.dtype), d_dense.T, preferred_element_type=jnp.float32)
    _s2, d_ap = jax.lax.approx_max_k(sc, 20, recall_target=0.99)
    d_ap = np.asarray(d_ap)
    results["dense_recall@20_approx_sel"] = round(
        float(np.mean([len(set(d_ap[b]) & set(d_gt[b])) / 20 for b in range(QB)])), 4
    )

    # --- 4: end-to-end hybrid top-10 overlap, approx vs exact pipeline ---
    overlap = {}
    for label, exact in (("exact", True), ("approx", False)):
        _s, rows = hybrid_fused_topk(
            d_dense, d_sketch, d_sp_ids, d_sp_w, jdq, jq_sketch, jq_ids, jq_w,
            k=K, fetch_k=2 * K, depth=DEPTH, mask=mask, exact_topk=exact,
        )
        overlap[label] = np.asarray(rows)
    results["hybrid_top10_overlap_approx_vs_exact"] = round(
        float(np.mean([
            len(set(overlap["approx"][b]) & set(overlap["exact"][b])) / K
            for b in range(QB)
        ])), 4
    )
    # Hybrid vs RRF-of-ground-truth (exact dense fetch + exact sparse scan).
    d_gt20 = d_gt
    gt_fetch_scores, gt_fetch_rows = sparse_topk(
        d_sp_ids, d_sp_w, jnp.asarray(q_dense), 2 * K, mask, block=GT_BLOCK
    )
    _fs, gt_hybrid = rrf_fuse_np(
        np.stack([d_gt20, np.asarray(gt_fetch_rows)]),
        np.asarray([0.5, 0.5], np.float32), k=K,
    )
    for label in ("exact", "approx"):
        results[f"hybrid_recall@10_{label}_vs_groundtruth"] = round(
            float(np.mean([
                len(set(overlap[label][b]) & set(gt_hybrid[b])) / K
                for b in range(QB)
            ])), 4
        )

    def _flag_value(name: str) -> str | None:
        """Value following `name` in argv (None if absent) — a bare substring
        test would let one flag's 'int8' trigger the other section."""
        if name in sys.argv[:-1]:
            return sys.argv[sys.argv.index(name) + 1]
        return None

    # --- 5b (optional): int4 capacity tier at the same operating point ---
    if _flag_value("--dense-dtype") == "int4":
        from verbatim_rag_tpu.ops.dense import quantize_rows_int4

        dq4 = quantize_rows_int4(jnp.asarray(dense))
        _s, rows4 = hybrid_fused_topk(
            dq4, d_sketch, d_sp_ids, d_sp_w, jdq, jq_sketch, jq_ids, jq_w,
            k=K, fetch_k=2 * K, depth=DEPTH, mask=mask, exact_topk=False,
        )
        rows4 = np.asarray(rows4)
        results["hybrid_top10_overlap_int4_vs_bf16"] = round(
            float(np.mean([
                len(set(rows4[b]) & set(overlap["approx"][b])) / K for b in range(QB)
            ])), 4
        )
        _s, d_i4 = dense_topk(dq4, jdq, K, mask, exact_topk=False)
        d_i4 = np.asarray(d_i4)
        results["dense_recall@10_int4_vs_exact"] = round(
            float(np.mean([
                len(set(d_i4[b]) & set(d_gt[b][:K])) / K for b in range(QB)
            ])), 4
        )

    if _flag_value("--sketch-dtype") == "int4":
        from verbatim_rag_tpu.ops.dense import quantize_rows_int4

        sk4 = quantize_rows_int4(jnp.asarray(sketches))
        _s, rows_s4 = hybrid_fused_topk(
            d_dense, sk4, d_sp_ids, d_sp_w, jdq, jq_sketch, jq_ids, jq_w,
            k=K, fetch_k=2 * K, depth=DEPTH, mask=mask, exact_topk=False,
        )
        rows_s4 = np.asarray(rows_s4)
        results["hybrid_top10_overlap_int4sketch_vs_bf16"] = round(
            float(np.mean([
                len(set(rows_s4[b]) & set(overlap["approx"][b])) / K
                for b in range(QB)
            ])), 4
        )
        _s, sp4 = projected_sparse_topk(
            sk4, d_sp_ids, d_sp_w, jq_sketch, jq_ids, jq_w,
            k=K, depth=DEPTH, mask=mask, exact_topk=False,
        )
        sp4 = np.asarray(sp4)
        results["sparse_recall@10_int4sketch_vs_groundtruth"] = round(
            float(np.mean([
                len(set(sp4[b]) & set(gt_rows[b])) / K for b in range(QB)
            ])), 4
        )

    # --- 5 (optional): int8 capacity mode at the same operating point ---
    if _flag_value("--dense-dtype") == "int8":
        from verbatim_rag_tpu.ops.dense import quantize_rows_int8

        dq8, dscale = quantize_rows_int8(jnp.asarray(dense))
        _s, rows8 = hybrid_fused_topk(
            dq8, d_sketch, d_sp_ids, d_sp_w, jdq, jq_sketch, jq_ids, jq_w,
            k=K, fetch_k=2 * K, depth=DEPTH, mask=mask, exact_topk=False,
            dense_scale=dscale,
        )
        rows8 = np.asarray(rows8)
        results["hybrid_top10_overlap_int8_vs_bf16"] = round(
            float(np.mean([
                len(set(rows8[b]) & set(overlap["approx"][b])) / K for b in range(QB)
            ])), 4
        )
        _s, d_i8 = dense_topk(dq8, jdq, K, mask, exact_topk=False, corpus_scale=dscale)
        d_i8 = np.asarray(d_i8)
        results["dense_recall@10_int8_vs_exact"] = round(
            float(np.mean([
                len(set(d_i8[b]) & set(d_gt[b][:K])) / K for b in range(QB)
            ])), 4
        )

    # --- 6 (optional): int8 SKETCHES at the same operating point ---
    if _flag_value("--sketch-dtype") == "int8":
        from verbatim_rag_tpu.ops.dense import quantize_rows_int8

        sk8, sscale = quantize_rows_int8(jnp.asarray(sketches))
        _s, rows_s8 = hybrid_fused_topk(
            d_dense, sk8, d_sp_ids, d_sp_w, jdq, jq_sketch, jq_ids, jq_w,
            k=K, fetch_k=2 * K, depth=DEPTH, mask=mask, exact_topk=False,
            sketch_scale=sscale,
        )
        rows_s8 = np.asarray(rows_s8)
        results["hybrid_top10_overlap_int8sketch_vs_bf16"] = round(
            float(np.mean([
                len(set(rows_s8[b]) & set(overlap["approx"][b])) / K
                for b in range(QB)
            ])), 4
        )
        _s, sp8 = projected_sparse_topk(
            sk8, d_sp_ids, d_sp_w, jq_sketch, jq_ids, jq_w,
            k=K, depth=DEPTH, mask=mask, exact_topk=False, sketch_scale=sscale,
        )
        sp8 = np.asarray(sp8)
        results["sparse_recall@10_int8sketch_vs_groundtruth"] = round(
            float(np.mean([
                len(set(sp8[b]) & set(gt_rows[b])) / K for b in range(QB)
            ])), 4
        )

    # --- 7 (optional): bucket-max candidate kernel at the same point ---
    # The kernel is the same one-winner-per-128-rows family as approx_max_k;
    # this measures its end-to-end hybrid/sparse quality at 1M. N here is
    # not a kernel-block multiple, so the corpus pads with masked rows (the
    # serving store's capacities are block multiples already).
    if _flag_value("--candidate-impl") == "bucket":
        from verbatim_rag_tpu.ops.fused_topk import BLOCK_ROWS

        pad_n = -(-N // BLOCK_ROWS) * BLOCK_ROWS
        pad = pad_n - N
        d_dense_p = jnp.pad(d_dense, ((0, pad), (0, 0)))
        d_sketch_p = jnp.pad(d_sketch, ((0, pad), (0, 0)))
        d_sp_ids_p = jnp.pad(d_sp_ids, ((0, pad), (0, 0)))
        d_sp_w_p = jnp.pad(d_sp_w, ((0, pad), (0, 0)))
        mask_p = jnp.concatenate([mask, jnp.zeros(pad, bool)])
        _s, rows_bk = hybrid_fused_topk(
            d_dense_p, d_sketch_p, d_sp_ids_p, d_sp_w_p,
            jdq, jq_sketch, jq_ids, jq_w,
            k=K, fetch_k=2 * K, depth=DEPTH, mask=mask_p, exact_topk=False,
            candidate_impl="bucket",
        )
        rows_bk = np.asarray(rows_bk)
        assert (rows_bk < N).all(), "masked pad rows must never surface"
        results["hybrid_top10_overlap_bucket_vs_approx"] = round(
            float(np.mean([
                len(set(rows_bk[b]) & set(overlap["approx"][b])) / K
                for b in range(QB)
            ])), 4
        )
        results["hybrid_recall@10_bucket_vs_groundtruth"] = round(
            float(np.mean([
                len(set(rows_bk[b]) & set(gt_hybrid[b])) / K for b in range(QB)
            ])), 4
        )
        _s, sp_bk = projected_sparse_topk(
            d_sketch_p, d_sp_ids_p, d_sp_w_p, jq_sketch, jq_ids, jq_w,
            k=K, depth=DEPTH, mask=mask_p, exact_topk=False,
            candidate_impl="bucket",
        )
        sp_bk = np.asarray(sp_bk)
        results["sparse_recall@10_bucket_vs_groundtruth"] = round(
            float(np.mean([
                len(set(sp_bk[b]) & set(gt_rows[b])) / K for b in range(QB)
            ])), 4
        )

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
