"""Retrieval ops vs numpy ground truth (dense, sparse, RRF fusion)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from verbatim_rag_tpu.ops.dense import dense_topk, normalize_rows  # noqa: E402
from verbatim_rag_tpu.ops.fusion import rrf_fuse_device, rrf_merge_host  # noqa: E402
from verbatim_rag_tpu.ops.sparse import (  # noqa: E402
    bm25_idf,
    bm25_saturate,
    densify_queries,
    sparse_topk,
)

RNG = np.random.default_rng(0)


class TestDense:
    def test_matches_numpy_bruteforce(self):
        corpus = RNG.normal(size=(256, 64)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        queries = RNG.normal(size=(4, 64)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)

        scores, idx = dense_topk(jnp.asarray(corpus), jnp.asarray(queries), k=10)
        full = queries.astype(np.float64) @ corpus.astype(np.float64).T
        expected_scores = -np.sort(-full, axis=1)[:, :10]
        np.testing.assert_allclose(np.asarray(scores), expected_scores, rtol=5e-3, atol=1e-3)
        # Returned indices must map back to their returned scores.
        gathered = np.take_along_axis(full, np.asarray(idx), axis=1)
        np.testing.assert_allclose(np.asarray(scores), gathered, rtol=5e-3, atol=1e-3)

    def test_mask_excludes_rows(self):
        corpus = np.eye(8, dtype=np.float32)
        queries = np.eye(8, dtype=np.float32)[:2]
        mask = np.ones(8, bool)
        mask[0] = False
        _, idx = dense_topk(jnp.asarray(corpus), jnp.asarray(queries), k=3, mask=jnp.asarray(mask))
        assert 0 not in np.asarray(idx)[0]

    def test_normalize_rows(self):
        x = RNG.normal(size=(5, 7)).astype(np.float32) * 10
        normed = np.asarray(normalize_rows(jnp.asarray(x)))
        np.testing.assert_allclose(np.linalg.norm(normed, axis=1), 1.0, rtol=1e-5)


class TestSparse:
    def _random_forward_index(self, n=64, m=8, vocab=100):
        ids = RNG.integers(1, vocab, size=(n, m)).astype(np.int32)
        weights = RNG.random(size=(n, m)).astype(np.float32)
        # Zero out some slots as padding.
        pad = RNG.random(size=(n, m)) < 0.3
        ids[pad] = 0
        weights[pad] = 0.0
        return ids, weights

    def test_matches_numpy(self):
        vocab = 100
        ids, weights = self._random_forward_index(vocab=vocab)
        q = np.zeros((2, vocab), np.float32)
        q[0, [3, 7, 20]] = [1.0, 0.5, 2.0]
        q[1, [1, 50]] = [1.5, 0.2]

        # numpy ground truth
        expected_scores = np.zeros((2, 64))
        for b in range(2):
            for n in range(64):
                expected_scores[b, n] = np.sum(weights[n] * q[b, ids[n]])

        scores, idx = sparse_topk(
            jnp.asarray(ids), jnp.asarray(weights), jnp.asarray(q), k=5, block=16
        )
        expected_idx = np.argsort(-expected_scores, axis=1)[:, :5]
        top_expected = np.take_along_axis(expected_scores, expected_idx, axis=1)
        np.testing.assert_allclose(np.asarray(scores), top_expected, rtol=1e-5)

    def test_densify_queries(self):
        ids = jnp.asarray([[1, 3, 0], [2, 0, 0]], jnp.int32)
        vals = jnp.asarray([[1.0, 2.0, 0.0], [5.0, 0.0, 0.0]], jnp.float32)
        dense = np.asarray(densify_queries(ids, vals, vocab_size=6))
        assert dense[0, 1] == 1.0 and dense[0, 3] == 2.0
        assert dense[1, 2] == 5.0

    def test_bm25_formulas(self):
        tf = jnp.asarray([[2, 0], [1, 5]], jnp.int32)
        dl = jnp.asarray([10.0, 20.0])
        sat = np.asarray(bm25_saturate(tf, dl, jnp.float32(15.0)))
        assert sat[0, 1] == 0.0
        assert 0 < sat[0, 0] < 2.2  # bounded by (k1+1)
        idf = np.asarray(bm25_idf(jnp.asarray([1, 100]), jnp.int32(100)))
        assert idf[0] > idf[1] > 0


class TestRRF:
    def test_host_merge_matches_reference_semantics(self):
        dense_hits = [{"id": "a"}, {"id": "b"}, {"id": "c"}]
        sparse_hits = [{"id": "b"}, {"id": "d"}]
        merged = rrf_merge_host(
            {"dense": dense_hits, "sparse": sparse_hits},
            top_k=3,
            weights={"dense": 0.5, "sparse": 0.5},
            rrf_k=60,
        )
        # b appears rank 1 dense + rank 0 sparse → highest fused score.
        assert merged[0]["id"] == "b"
        assert merged[0]["distance"] == pytest.approx(
            1.0 - (0.5 / 62 + 0.5 / 61)
        )

    def test_device_fusion_matches_host(self):
        # Methods return row indices; compare device fusion vs host merge.
        dense_rows = np.array([[5, 2, 9, 1]])
        sparse_rows = np.array([[2, 7, 5, -1]])
        method_idx = jnp.asarray(np.stack([dense_rows, sparse_rows]))  # [2, 1, 4]
        scores, rows = rrf_fuse_device(
            method_idx, jnp.asarray([0.5, 0.5], jnp.float32), k=4, rrf_k=60
        )
        host = rrf_merge_host(
            {
                "dense": [{"id": r} for r in dense_rows[0]],
                "sparse": [{"id": r} for r in sparse_rows[0] if r >= 0],
            },
            top_k=4,
            weights={"dense": 0.5, "sparse": 0.5},
        )
        host_ids = [h["id"] for h in host]
        assert list(np.asarray(rows)[0]) == host_ids
        host_scores = [1.0 - h["distance"] for h in host]
        np.testing.assert_allclose(np.asarray(scores)[0], host_scores, rtol=1e-6)

    def test_device_fusion_fewer_candidates_than_k(self):
        method_idx = jnp.asarray(np.array([[[3, -1, -1]]]))
        scores, rows = rrf_fuse_device(method_idx, jnp.asarray([1.0]), k=3)
        rows = np.asarray(rows)[0]
        assert rows[0] == 3
        assert set(rows[1:]) == {-1}

    def test_shiftsum_matches_scatter_reference(self):
        """The serving fuse (shifted masked adds) vs the scatter segment-sum
        formulation: same math including ties, randomized over 2- and 3-way
        fusions with duplicates across methods and -1 pads."""
        from verbatim_rag_tpu.ops.fusion import _rrf_fuse_scatter

        rng = np.random.default_rng(17)
        for trial in range(8):
            m = 2 if trial % 2 == 0 else 3
            b, km, k = 5, 16, 8
            # Per-method ranked lists without intra-method duplicates; a
            # narrow id range forces heavy cross-method overlap.
            idx = np.full((m, b, km), -1, np.int32)
            for mi in range(m):
                for bi in range(b):
                    n_hits = rng.integers(km // 2, km + 1)
                    idx[mi, bi, :n_hits] = rng.choice(24, size=n_hits, replace=False)
            w = rng.random(m).astype(np.float32) + 0.1
            w /= w.sum()
            s_new, r_new = rrf_fuse_device(jnp.asarray(idx), jnp.asarray(w), k=k)
            s_ref, r_ref = _rrf_fuse_scatter(jnp.asarray(idx), jnp.asarray(w), k=k)
            np.testing.assert_array_equal(np.asarray(r_new), np.asarray(r_ref))
            np.testing.assert_allclose(
                np.asarray(s_new), np.asarray(s_ref), rtol=1e-6, atol=1e-7
            )


class TestHybridOps:
    def test_hybrid_topk_fused_pipeline(self):
        n, d, dp, b = 64, 16, 8, 2
        corpus = RNG.normal(size=(n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        sp_ids = RNG.integers(1, 50, size=(n, 4)).astype(np.int32)
        sp_w = RNG.random((n, 4)).astype(np.float32)
        dq = corpus[:b].copy()  # queries identical to first rows
        q_dense = np.zeros((b, 50), np.float32)
        for i in range(b):
            q_dense[i, sp_ids[i]] = sp_w[i]

        from verbatim_rag_tpu.ops.hybrid import hybrid_topk

        scores, rows = hybrid_topk(
            jnp.asarray(corpus),
            jnp.asarray(sp_ids),
            jnp.asarray(sp_w),
            jnp.asarray(dq),
            jnp.asarray(q_dense),
            k=5,
            mask=jnp.ones(n, bool),
            block=16,
        )
        rows = np.asarray(rows)
        # Query i matches row i exactly in BOTH methods → fused rank 1.
        for i in range(b):
            assert rows[i, 0] == i

    def test_hybrid_candidates_shapes_and_mask(self):
        from verbatim_rag_tpu.ops.hybrid import hybrid_candidates

        n = 32
        dense = jnp.asarray(RNG.normal(size=(n, 8)), jnp.float32)
        sketch = jnp.asarray(RNG.normal(size=(n, 8)), jnp.float32)
        dq = jnp.asarray(RNG.normal(size=(2, 8)), jnp.float32)
        qp = jnp.asarray(RNG.normal(size=(2, 8)), jnp.float32)
        mask = np.ones(n, bool)
        mask[:16] = False
        d_rows, s_rows = hybrid_candidates(
            dense, sketch, dq, qp, fetch_k=4, depth=6, mask=jnp.asarray(mask)
        )
        assert d_rows.shape == (2, 4) and s_rows.shape == (2, 6)
        assert (np.asarray(d_rows) >= 16).all()  # masked rows excluded
        assert (np.asarray(s_rows) >= 16).all()


class TestTwoStageTopK:
    def test_exactness_vs_full_topk(self):
        from verbatim_rag_tpu.ops.dense import two_stage_topk

        scores = jnp.asarray(RNG.normal(size=(3, 20000)).astype(np.float32))
        ref_s, ref_i = jax.lax.top_k(scores, 17)
        got_s, got_i = two_stage_topk(scores, 17)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-6)
        # Indices may differ on exact ties; scores must match exactly.
        gathered = np.take_along_axis(np.asarray(scores), np.asarray(got_i), axis=1)
        np.testing.assert_allclose(gathered, np.asarray(ref_s), rtol=1e-6)

    def test_ragged_tail_included(self):
        from verbatim_rag_tpu.ops.dense import TOPK_BLOCK, two_stage_topk

        n = 3 * TOPK_BLOCK + 123
        scores = np.zeros((1, n), np.float32)
        scores[0, n - 5] = 7.0  # winner lives in the ragged tail
        got_s, got_i = two_stage_topk(jnp.asarray(scores), 3)
        assert np.asarray(got_i)[0, 0] == n - 5
        assert np.asarray(got_s)[0, 0] == 7.0

    def test_small_n_fallback(self):
        from verbatim_rag_tpu.ops.dense import two_stage_topk

        scores = jnp.asarray(RNG.normal(size=(2, 100)).astype(np.float32))
        got_s, _ = two_stage_topk(scores, 5)
        ref_s, _ = jax.lax.top_k(scores, 5)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s))


class TestFusedHybridDevice:
    """The round-2 fully-on-device hybrid pipeline vs the host reference."""

    def _corpus(self, n=512, d=32, d_p=64, m=8, vocab=200):
        dense = RNG.normal(size=(n, d)).astype(np.float32)
        dense /= np.linalg.norm(dense, axis=1, keepdims=True)
        ids = RNG.integers(1, vocab, size=(n, m)).astype(np.int32)
        w = RNG.random(size=(n, m)).astype(np.float32)
        pad = RNG.random(size=(n, m)) < 0.3
        ids[pad] = 0
        w[pad] = 0.0
        # Unique term ids per row (SPLADE contract) — collide dupes into pad.
        for r in range(n):
            seen = set()
            for j in range(m):
                if ids[r, j] in seen:
                    ids[r, j] = 0
                    w[r, j] = 0.0
                elif ids[r, j] != 0:
                    seen.add(int(ids[r, j]))
        from verbatim_rag_tpu.ops.sparse_projected import projection_matrix, project_rows

        proj = projection_matrix(vocab, d_p, seed=1)
        sketches = project_rows(ids, w, proj)
        return dense, ids, w, sketches, proj, vocab

    def _queries(self, b=3, d=32, vocab=200, qnnz=6):
        dq = RNG.normal(size=(b, d)).astype(np.float32)
        dq /= np.linalg.norm(dq, axis=1, keepdims=True)
        q_ids = np.zeros((b, 16), np.int32)
        q_w = np.zeros((b, 16), np.float32)
        for i in range(b):
            terms = RNG.choice(np.arange(1, vocab), size=qnnz, replace=False)
            q_ids[i, :qnnz] = terms
            q_w[i, :qnnz] = RNG.random(qnnz).astype(np.float32)
        return dq, q_ids, q_w

    def test_exact_rescore_device_matches_host(self):
        from verbatim_rag_tpu.ops.hybrid import exact_rescore_device
        from verbatim_rag_tpu.ops.sparse_projected import exact_rescore

        dense, ids, w, _sk, _p, vocab = self._corpus()
        _dq, q_ids, q_w = self._queries(vocab=vocab)
        cand = RNG.integers(-1, dense.shape[0], size=(3, 20)).astype(np.int64)

        q_dense = np.zeros((3, vocab), np.float32)
        for i in range(3):
            for t, v in zip(q_ids[i], q_w[i]):
                if t:
                    q_dense[i, t] += v
        host = exact_rescore(cand, ids, w, q_dense)

        dev = np.asarray(
            exact_rescore_device(
                jnp.asarray(cand, jnp.int32), jnp.asarray(ids), jnp.asarray(w),
                jnp.asarray(q_ids), jnp.asarray(q_w),
            )
        )
        valid = cand >= 0
        np.testing.assert_allclose(dev[valid], host[valid], rtol=1e-5, atol=1e-5)
        assert (dev[~valid] < -1e29).all() and (host[~valid] == -np.inf).all()

    def test_projected_sparse_topk_matches_exact_scan(self):
        from verbatim_rag_tpu.ops.hybrid import projected_sparse_topk
        from verbatim_rag_tpu.ops.sparse import sparse_topk as exact_scan

        dense, ids, w, sketches, proj, vocab = self._corpus()
        _dq, q_ids, q_w = self._queries(vocab=vocab)
        q_dense = np.zeros((3, vocab), np.float32)
        for i in range(3):
            q_dense[i, q_ids[i]] += q_w[i]
            q_dense[i, 0] = 0.0
        q_proj = (q_dense @ proj).astype(np.float32)
        mask = jnp.ones(dense.shape[0], bool)

        # Full-depth rescore == exact scan (approximation only prunes candidates).
        scores, rows = projected_sparse_topk(
            jnp.asarray(sketches), jnp.asarray(ids), jnp.asarray(w),
            jnp.asarray(q_proj), jnp.asarray(q_ids), jnp.asarray(q_w),
            k=5, depth=dense.shape[0], mask=mask,
        )
        ref_scores, _ref_rows = exact_scan(
            jnp.asarray(ids), jnp.asarray(w), jnp.asarray(q_dense), 5,
            jnp.ones(dense.shape[0], bool), block=dense.shape[0],
        )
        np.testing.assert_allclose(
            np.asarray(scores), np.asarray(ref_scores), rtol=1e-4, atol=1e-4
        )

    def test_hybrid_fused_matches_host_pipeline(self):
        from verbatim_rag_tpu.ops.fusion import rrf_fuse_np
        from verbatim_rag_tpu.ops.hybrid import hybrid_fused_topk
        from verbatim_rag_tpu.ops.sparse_projected import exact_rescore

        dense, ids, w, sketches, proj, vocab = self._corpus()
        dq, q_ids, q_w = self._queries(vocab=vocab)
        q_dense = np.zeros((3, vocab), np.float32)
        for i in range(3):
            q_dense[i, q_ids[i]] += q_w[i]
            q_dense[i, 0] = 0.0
        q_proj = (q_dense @ proj).astype(np.float32)
        mask = np.ones(dense.shape[0], bool)
        mask[7] = False
        k, fetch_k, depth, rrf_k = 6, 12, 48, 60

        f_scores, f_rows = hybrid_fused_topk(
            jnp.asarray(dense), jnp.asarray(sketches), jnp.asarray(ids),
            jnp.asarray(w), jnp.asarray(dq), jnp.asarray(q_proj),
            jnp.asarray(q_ids), jnp.asarray(q_w),
            k=k, fetch_k=fetch_k, depth=depth, mask=jnp.asarray(mask),
        )

        # Host reference: same candidates, host rescore + host RRF.
        d_scores = dq @ dense.T
        d_scores[:, ~mask] = -np.inf
        d_rows = np.argsort(-d_scores, axis=1)[:, :fetch_k]
        s_approx = q_proj @ sketches.T
        s_approx[:, ~mask] = -np.inf
        s_cand = np.argsort(-s_approx, axis=1)[:, :depth]
        exact = exact_rescore(s_cand.astype(np.int64), ids, w, q_dense)
        order = np.argsort(-exact, axis=1)[:, :fetch_k]
        s_rows = np.take_along_axis(s_cand, order, axis=1)
        ref_scores, ref_rows = rrf_fuse_np(
            np.stack([d_rows, s_rows]), np.asarray([0.5, 0.5], np.float32),
            k=k, rrf_k=rrf_k,
        )
        np.testing.assert_allclose(
            np.asarray(f_scores), ref_scores, rtol=1e-5, atol=1e-6
        )
        assert 7 not in np.asarray(f_rows)


class TestInt8Dense:
    def test_quantize_roundtrip_error_small(self):
        import jax.numpy as jnp

        from verbatim_rag_tpu.ops.dense import normalize_rows, quantize_rows_int8

        rng = np.random.default_rng(0)
        x = np.asarray(normalize_rows(jnp.asarray(rng.normal(size=(64, 48)), jnp.float32)))
        q, scale = quantize_rows_int8(x)
        assert q.dtype == np.int8 and scale.shape == (64, 1)
        back = q.astype(np.float32) * scale
        # per-row max quantization step is scale/2 ≈ max|x|/254
        assert np.max(np.abs(back - x)) <= np.max(scale) / 2 + 1e-6

    def test_int8_topk_ranking_matches_f32(self):
        import jax.numpy as jnp

        from verbatim_rag_tpu.ops.dense import (
            dense_topk,
            normalize_rows,
            quantize_rows_int8,
        )

        rng = np.random.default_rng(1)
        corpus = np.asarray(
            normalize_rows(jnp.asarray(rng.normal(size=(500, 32)), jnp.float32))
        )
        # queries = noisy copies of specific rows → unambiguous top-1
        rows = [7, 99, 431]
        q = corpus[rows] + 0.01 * rng.normal(size=(3, 32)).astype(np.float32)
        q = np.asarray(normalize_rows(jnp.asarray(q)))
        cq, scale = quantize_rows_int8(jnp.asarray(corpus))
        s8, r8 = dense_topk(cq, jnp.asarray(q), 5, corpus_scale=scale)
        s32, r32 = dense_topk(jnp.asarray(corpus), jnp.asarray(q), 5)
        assert list(np.asarray(r8)[:, 0]) == rows == list(np.asarray(r32)[:, 0])
        np.testing.assert_allclose(np.asarray(s8), np.asarray(s32), atol=0.02)

    def test_int8_requires_scale(self):
        import jax.numpy as jnp
        import pytest as _pytest

        from verbatim_rag_tpu.ops.dense import dense_scores

        with _pytest.raises(ValueError):
            dense_scores(jnp.zeros((4, 8), jnp.int8), jnp.zeros((2, 8), jnp.float32))


class TestRrfMergeFalsyIds:
    def test_integer_id_zero_participates(self):
        from verbatim_rag_tpu.ops.fusion import rrf_merge_host

        merged = rrf_merge_host(
            {
                "dense": [{"id": 0, "score": 0.9}, {"id": 1, "score": 0.5}],
                "sparse": [{"id": 0, "score": 0.8}],
            },
            5,
            {"dense": 0.5, "sparse": 0.5},
        )
        ids = [h["id"] for h in merged]
        assert 0 in ids
        assert ids[0] == 0  # rank-1 in both methods → fused first
