"""Fused matmul+bucket-max kernels (ops/fused_topk.py), interpret mode.

Both kernel generations implement the one-winner-per-128-rows selection
family (same contract as `lax.approx_max_k`, ref serving uses Milvus HNSW —
candidates feed exact rescore downstream either way):

  v1  consecutive-row buckets, iota argmax        (lane-direction reduce)
  v2  strided (lane) buckets, mantissa-packed pos (second-minor reduce)

The oracle recomputes bucket maxima from the kernel's own bucket geometry
with plain jnp math at the kernel's dtypes. v2's packing clears the low 7
mantissa bits, so value assertions allow 127 ulp (rtol ~2e-5).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from verbatim_rag_tpu.ops.fused_topk import (
    BUCKET,
    NEG_INF,
    fused_candidate_topk,
    fused_candidate_topk_v2,
    matmul_bucket_max,
    matmul_bucket_max_v2,
)

PACK_TOL = 3e-5  # 127 ulp of f32 ≈ 1.5e-5 relative; headroom for bf16 dots


def _scores(corpus, q, mask):
    """Oracle scores at the kernel's precision: bf16 operands, f32 accum."""
    s = jnp.dot(
        q.astype(corpus.dtype), corpus.T, preferred_element_type=jnp.float32
    )
    return np.where(np.asarray(mask)[None, :], np.asarray(s), NEG_INF)


def _make(n, d, b, seed=0, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    corpus = jax.random.normal(k1, (n, d), dtype)
    q = jax.random.normal(k2, (b, d), jnp.float32)
    return corpus, q


class TestBucketMaxV1:
    def test_consecutive_bucket_maxima(self):
        corpus, q = _make(1024, 64, 4)
        mask = jnp.ones(1024, bool)
        vals, rows = jax.device_get(
            matmul_bucket_max(corpus, q, mask, interpret=True)
        )
        oracle = _scores(corpus, q, mask)
        grouped = oracle.reshape(4, 1024 // BUCKET, BUCKET)
        np.testing.assert_allclose(vals, grouped.max(-1), rtol=1e-6)
        # Winner rows live in their bucket and carry the bucket max.
        for qi in range(4):
            for bi in range(1024 // BUCKET):
                r = rows[qi, bi]
                assert r // BUCKET == bi
                assert oracle[qi, r] == pytest.approx(vals[qi, bi], rel=1e-6)

    def test_mask_excludes_rows(self):
        corpus, q = _make(512, 32, 2)
        mask = np.ones(512, bool)
        mask[:BUCKET] = False  # whole first bucket dead
        mask[200] = False
        vals, rows = jax.device_get(
            matmul_bucket_max(corpus, q, jnp.asarray(mask), interpret=True)
        )
        assert (vals[:, 0] <= NEG_INF / 2).all()
        assert (rows != 200).all()


class TestBucketMaxV2:
    @pytest.mark.parametrize("variant", ["onedot", "chunked"])
    def test_strided_bucket_maxima(self, variant):
        n, d, b = 2048, 64, 4
        corpus, q = _make(n, d, b)
        mask = jnp.ones(n, bool)
        vals, rows = jax.device_get(
            matmul_bucket_max_v2(
                corpus, q, mask, variant=variant, chunk_pos=4, interpret=True
            )
        )
        oracle = _scores(corpus, q, mask)
        # Strided geometry: bucket lane = row % 128 (single block here).
        grouped = oracle.reshape(b, n // BUCKET, BUCKET)  # (q, pos, lane)
        expect = grouped.max(axis=1)  # [b, 128 lanes]
        assert vals.shape == (b, BUCKET)  # single block → 128 lane buckets
        np.testing.assert_allclose(vals, expect, rtol=PACK_TOL, atol=1e-6)
        for qi in range(b):
            for lane in range(BUCKET):
                r = rows[qi, lane]
                assert r % BUCKET == lane
                # The returned row's true score is the bucket max (within
                # the 127-ulp packing tolerance).
                assert oracle[qi, r] == pytest.approx(
                    expect[qi, lane], rel=PACK_TOL, abs=1e-6
                )

    def test_variants_agree_exactly(self):
        corpus, q = _make(2048, 128, 8, seed=3)
        mask = np.ones(2048, bool)
        mask[::7] = False
        mask = jnp.asarray(mask)
        v1 = jax.device_get(
            matmul_bucket_max_v2(corpus, q, mask, variant="onedot", interpret=True)
        )
        v2 = jax.device_get(
            matmul_bucket_max_v2(
                corpus, q, mask, variant="chunked", chunk_pos=4, interpret=True
            )
        )
        np.testing.assert_array_equal(v1[0], v2[0])
        np.testing.assert_array_equal(v1[1], v2[1])

    def test_multi_block_global_rows(self):
        # Two 16384-row blocks: global row ids must offset by the block.
        from verbatim_rag_tpu.ops import fused_topk as ft

        n, d, b = 2 * ft.BLOCK_ROWS, 16, 2
        corpus, q = _make(n, d, b, seed=1)
        mask = jnp.ones(n, bool)
        vals, rows = jax.device_get(
            matmul_bucket_max_v2(corpus, q, mask, interpret=True)
        )
        assert vals.shape == (b, n // BUCKET)
        oracle = _scores(corpus, q, mask)
        # Block 1's buckets index rows ≥ BLOCK_ROWS.
        second = rows[:, ft.BLOCK_ROWS // BUCKET :]
        assert (second >= ft.BLOCK_ROWS).all() and (second < n).all()
        # Spot-check bucket maxima in both blocks.
        rng = np.random.default_rng(0)
        for col in rng.choice(n // BUCKET, size=16, replace=False):
            block, lane = col // BUCKET, col % BUCKET
            members = block * ft.BLOCK_ROWS + np.arange(128) * BUCKET + lane
            for qi in range(b):
                assert vals[qi, col] == pytest.approx(
                    oracle[qi, members].max(), rel=PACK_TOL, abs=1e-6
                )

    def test_mask_and_dead_bucket(self):
        n = 1024
        corpus, q = _make(n, 32, 2, seed=2)
        mask = np.ones(n, bool)
        # Kill lane 5's whole bucket: rows r with r % 128 == 5.
        mask[np.arange(n) % BUCKET == 5] = False
        mask[777] = False
        vals, rows = jax.device_get(
            matmul_bucket_max_v2(corpus, q, jnp.asarray(mask), interpret=True)
        )
        assert (vals[:, 5] <= NEG_INF / 2).all()
        live = vals > NEG_INF / 2
        assert (rows[live] != 777).all()

    def test_negative_scores_pack_correctly(self):
        # All-negative similarity regime: packing flips the low-bit
        # direction for negatives; winners must still be bucket maxima.
        n, d, b = 512, 32, 4
        key = jax.random.PRNGKey(9)
        corpus = -jnp.abs(jax.random.normal(key, (n, d), jnp.bfloat16)) - 0.5
        q = jnp.abs(jax.random.normal(jax.random.PRNGKey(10), (b, d), jnp.float32))
        mask = jnp.ones(n, bool)
        vals, rows = jax.device_get(
            matmul_bucket_max_v2(corpus, q, mask, interpret=True)
        )
        oracle = _scores(corpus, q, mask)
        expect = oracle.reshape(b, n // BUCKET, BUCKET).max(axis=1)
        np.testing.assert_allclose(vals, expect, rtol=PACK_TOL)

    def test_batch_not_multiple_of_qblock(self):
        corpus, q = _make(512, 32, 5, seed=4)
        mask = jnp.ones(512, bool)
        vals, rows = jax.device_get(
            matmul_bucket_max_v2(corpus, q, mask, interpret=True)
        )
        assert vals.shape == (5, BUCKET)
        oracle = _scores(corpus, q, mask)
        expect = oracle.reshape(5, 4, BUCKET).max(axis=1)
        np.testing.assert_allclose(vals, expect, rtol=PACK_TOL)


class TestFusedCandidateTopK:
    @pytest.mark.parametrize(
        "fn",
        [fused_candidate_topk, fused_candidate_topk_v2],
        ids=["v1", "v2"],
    )
    def test_planted_winners_retrieved(self, fn):
        """Rows planted in distinct buckets of BOTH geometries must all
        surface in the candidate top-k."""
        n, d, b, k = 2048, 64, 2, 16
        rng = np.random.default_rng(5)
        corpus = rng.normal(size=(n, d)).astype(np.float32) * 0.01
        q = rng.normal(size=(b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        # Distinct consecutive-buckets (r // 128) AND lanes (r % 128):
        # r = i*128 + i stays unique in both partitions for i < 16.
        planted = np.array([i * BUCKET + i for i in range(k)])
        corpus[planted] = q[0] * np.linspace(5, 3, k)[:, None]
        corpus_j = jnp.asarray(corpus, jnp.bfloat16)
        mask = jnp.ones(n, bool)
        _, rows = jax.device_get(
            fn(corpus_j, jnp.asarray(q), k, mask, interpret=True)
        )
        assert set(planted) <= set(rows[0].tolist())

    def test_masked_rows_never_candidates(self):
        n, d, b, k = 1024, 32, 2, 8
        corpus, q = _make(n, d, b, seed=6)
        mask = np.ones(n, bool)
        mask[100:300] = False
        _, rows = jax.device_get(
            fused_candidate_topk_v2(
                corpus, q, k, jnp.asarray(mask), interpret=True
            )
        )
        live = rows[rows >= 0]
        assert not np.isin(live, np.arange(100, 300)).any()


class TestCandidateImplDispatch:
    """ops/dense.py candidate_topk: the serving entry that picks between
    the XLA pipeline and the bucket kernel, with automatic fallback."""

    def test_bucket_path_runs_kernel(self):
        from verbatim_rag_tpu.ops.dense import candidate_topk

        n, d, b, k = 1024, 32, 2, 8
        corpus, q = _make(n, d, b, seed=8)
        mask = jnp.ones(n, bool)
        vals_b, rows_b = jax.device_get(
            candidate_topk(corpus, q, k, mask, impl="bucket", interpret=True)
        )
        ref = jax.device_get(
            fused_candidate_topk_v2(corpus, q, k, mask, interpret=True)
        )
        np.testing.assert_array_equal(rows_b, ref[1])

    def test_block_geometry_choices(self):
        """choose_block_rows covers store capacities: 16384-multiples take
        the big block, 8192-multiples (tight bulk-load capacities like
        123*8192) the half block, non-128-multiples are unsupported."""
        from verbatim_rag_tpu.ops.fused_topk import (
            BLOCK_ROWS,
            bucket_table_width,
            choose_block_rows,
        )

        assert choose_block_rows(999_424) == BLOCK_ROWS  # 61 * 16384
        assert choose_block_rows(123 * 8192) == 8192
        assert choose_block_rows(8192) == 8192  # single block
        assert choose_block_rows(384) == 384
        assert choose_block_rows(960) is None
        assert choose_block_rows(2048 * 3) == 2048 * 3  # single block fits
        assert choose_block_rows(2048 * 17) == 2048  # 34816: odd 2048-mult
        assert bucket_table_width(999_424) == 61 * 128
        assert bucket_table_width(123 * 8192) == 123 * 128
        assert bucket_table_width(8192) == 128

    def test_fallback_when_k_exceeds_bucket_table(self):
        """A single-block corpus has a 128-wide bucket table; k beyond it
        must take the XLA path instead of silently truncating (the crash
        the table-width check prevents shows up downstream as top_k over a
        too-narrow candidate list)."""
        from verbatim_rag_tpu.ops.dense import candidate_topk

        n = 1024
        corpus, q = _make(n, 32, 2, seed=21)
        mask = jnp.ones(n, bool)
        got = jax.device_get(
            candidate_topk(corpus, q, 200, mask, impl="bucket", interpret=True)
        )
        ref = jax.device_get(
            candidate_topk(corpus, q, 200, mask, impl="xla", interpret=True)
        )
        assert got[1].shape == (2, 200)
        np.testing.assert_array_equal(got[1], ref[1])

    def test_exact_topk_request_never_uses_bucket(self):
        """exact_topk=True is an exactness guarantee; the bucket kernel is
        an approximate family, so the dispatch must take the exact path."""
        from verbatim_rag_tpu.ops.dense import candidate_topk, dense_scores

        n = 1024
        corpus, q = _make(n, 32, 2, seed=22)
        mask = jnp.ones(n, bool)
        got = jax.device_get(
            candidate_topk(
                corpus, q, 8, mask, exact_topk=True, impl="bucket", interpret=True
            )
        )
        scores = np.asarray(dense_scores(corpus, q.astype(jnp.float32)))
        expect_rows = np.argsort(-scores, axis=1)[:, :8]
        np.testing.assert_array_equal(got[1], expect_rows)

    def test_int4_corpus_is_refused_and_routed_to_xla(self):
        """The int4 bucket arm was REMOVED in 0.5.2 (it never compiled on
        TPU hardware; native int4 operands crash the client — VERDICT r4
        #9): the kernel refuses Int4Rows loudly, the support gate routes
        int4 to the XLA path, and candidate_topk(impl='bucket') on an
        int4 corpus still returns correct (XLA-path) results."""
        from verbatim_rag_tpu.ops.dense import (
            Int4Rows,
            bucket_kernel_supported,
            candidate_topk,
            dense_scores,
            quantize_rows_int4,
        )

        n, d, b = 512, 32, 4
        corpus_f, q = _make(n, d, b, seed=31, dtype=jnp.float32)
        rows4 = quantize_rows_int4(corpus_f)
        carrier = Int4Rows(jnp.asarray(rows4.packed), jnp.asarray(rows4.scale))
        mask = jnp.ones(n, bool)
        with pytest.raises(ValueError, match="int4"):
            matmul_bucket_max_v2(carrier, q, mask, interpret=True)
        assert not bucket_kernel_supported(carrier, None, interpret=True)
        got = jax.device_get(
            candidate_topk(
                carrier, q, 8, mask, exact_topk=True, impl="bucket", interpret=True
            )
        )
        scores = np.asarray(dense_scores(carrier, q.astype(jnp.float32)))
        expect_rows = np.argsort(-scores, axis=1)[:, :8]
        np.testing.assert_array_equal(got[1], expect_rows)

    def test_fallback_to_xla_on_bad_geometry(self):
        from verbatim_rag_tpu.ops.dense import candidate_topk

        n = 960  # 960 % 128 ≠ 0 — outside the kernel's block geometry
        corpus, q = _make(n, 32, 2, seed=9, dtype=jnp.float32)
        mask = jnp.ones(n, bool)
        got = jax.device_get(
            candidate_topk(corpus, q, 8, mask, impl="bucket", interpret=True)
        )
        ref = jax.device_get(
            candidate_topk(corpus, q, 8, mask, impl="xla", interpret=True)
        )
        np.testing.assert_array_equal(got[1], ref[1])
        np.testing.assert_allclose(got[0], ref[0], rtol=1e-6)

    def test_int8_corpus_runs_kernel_with_rescale(self):
        """int8 + per-row scale: the kernel's in-block rescale must match
        the XLA int8 scoring path (ops/dense.dense_scores) — bucket maxima
        of the same quantized scores, within the 127-ulp pack tolerance."""
        from verbatim_rag_tpu.ops.dense import (
            candidate_topk,
            dense_scores,
            quantize_rows_int8,
        )

        n, d, b = 512, 32, 4
        corpus_f, q = _make(n, d, b, seed=13, dtype=jnp.float32)
        corpus, scale = quantize_rows_int8(corpus_f)
        mask = jnp.ones(n, bool)
        vals, rows = jax.device_get(
            matmul_bucket_max_v2(corpus, q, mask, interpret=True, scale=scale)
        )
        oracle = np.asarray(dense_scores(corpus, q, scale))
        expect = oracle.reshape(b, n // BUCKET, BUCKET).max(axis=1)
        np.testing.assert_allclose(vals, expect, rtol=PACK_TOL, atol=1e-6)
        for qi in range(b):
            for lane in range(BUCKET):
                assert rows[qi, lane] % BUCKET == lane
        # And through the dispatch entry:
        _, rows_d = jax.device_get(
            candidate_topk(corpus, q, 8, mask, scale, impl="bucket", interpret=True)
        )
        _, rows_x = jax.device_get(
            candidate_topk(corpus, q, 8, mask, scale, impl="xla", exact_topk=True)
        )
        overlap = np.mean([
            len(set(rows_d[i]) & set(rows_x[i])) / 8 for i in range(b)
        ])
        assert overlap >= 0.5  # same selection family at tiny n

    def test_hybrid_program_with_bucket_impl(self):
        """hybrid_fused_topk(candidate_impl='bucket') on CPU falls back to
        the XLA path — results must match the default program exactly."""
        from verbatim_rag_tpu.ops.hybrid import hybrid_fused_topk

        rng = np.random.default_rng(12)
        n, d, dp, m, qm = 256, 16, 32, 8, 4
        dense = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        sketch = jnp.asarray(rng.normal(size=(n, dp)).astype(np.float32))
        sp_ids = jnp.asarray(rng.integers(1, 99, size=(n, m)), jnp.int32)
        sp_w = jnp.asarray(rng.random(size=(n, m)), jnp.float32)
        dq = jnp.asarray(rng.normal(size=(3, d)).astype(np.float32))
        sq = jnp.asarray(rng.normal(size=(3, dp)).astype(np.float32))
        q_ids = jnp.asarray(rng.integers(1, 99, size=(3, qm)), jnp.int32)
        q_w = jnp.asarray(rng.random(size=(3, qm)), jnp.float32)
        kwargs = dict(k=5, fetch_k=10, depth=16, exact_topk=True)
        ref = hybrid_fused_topk(
            dense, sketch, sp_ids, sp_w, dq, sq, q_ids, q_w, **kwargs
        )
        got = hybrid_fused_topk(
            dense, sketch, sp_ids, sp_w, dq, sq, q_ids, q_w,
            candidate_impl="bucket", **kwargs
        )
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-6)
