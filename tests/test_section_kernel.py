"""Section kernel (ops/section.py) — interpret-mode correctness.

Hardware perf lives in benchmarks/bench_section.py; these tests pin the
SEMANTICS on the CPU interpreter: bucket membership (col % 128 within each
block), the mantissa pos pack/decode, masking, int8 arms, the bf16-epilogue
variant, and the full hybrid_section_topk program against the serving
hybrid_fused_topk at an exact operating point.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from verbatim_rag_tpu.ops.dense import quantize_rows_int8  # noqa: E402
from verbatim_rag_tpu.ops.section import (  # noqa: E402
    LANE,
    section_bucket_tables,
    table_topk,
    unpack_table,
)

RNG = np.random.default_rng(3)


def _bucket_reference(scores: np.ndarray, mask: np.ndarray, block_cols: int):
    """(vals, rows) of the one-winner-per-(block, lane) family."""
    b, n = scores.shape
    scores = np.where(mask[None, :], scores, -1e30)
    n_blocks = n // block_cols
    p = block_cols // LANE
    vals = np.full((b, n_blocks * LANE), -1e30, np.float32)
    rows = np.zeros((b, n_blocks * LANE), np.int64)
    for j in range(n_blocks):
        blk = scores[:, j * block_cols : (j + 1) * block_cols].reshape(b, p, LANE)
        best_p = blk.argmax(axis=1)
        vals[:, j * LANE : (j + 1) * LANE] = blk.max(axis=1)
        rows[:, j * LANE : (j + 1) * LANE] = (
            j * block_cols + best_p * LANE + np.arange(LANE)[None, :]
        )
    return vals, rows


class TestSectionTables:
    def _check_arm(self, c, q, table, mask, block_cols):
        scores = q @ c.T
        ref_vals, ref_rows = _bucket_reference(scores, mask, block_cols)
        got = np.asarray(table)
        vals, pos = (np.asarray(x) for x in unpack_table(jnp.asarray(got)))
        w = got.shape[1]
        cols = np.arange(w)
        rows = (cols[None, :] // LANE) * block_cols + pos * LANE + (cols[None, :] % LANE)
        live = ref_vals > -1e29
        np.testing.assert_allclose(vals[live], ref_vals[live], rtol=1e-4, atol=1e-4)
        assert ((rows == ref_rows) | ~live).mean() > 0.999
        assert np.all(vals[~live] < -1e29)

    def test_two_arm_tables_match_reference(self):
        n, d1, d2, b, bc = 1024, 32, 64, 16, 512
        c1 = RNG.normal(size=(n, d1)).astype(np.float32)
        c2 = RNG.normal(size=(n, d2)).astype(np.float32)
        q1 = RNG.normal(size=(b, d1)).astype(np.float32)
        q2 = RNG.normal(size=(b, d2)).astype(np.float32)
        mask = np.ones(n, bool)
        mask[7] = False
        mask[500:600] = False
        t1, t2 = section_bucket_tables(
            (jnp.asarray(c1.T), jnp.asarray(c2.T)),
            (jnp.asarray(q1), jnp.asarray(q2)),
            jnp.asarray(mask),
            block_cols=bc, dot_chunk=256, q_block=8, interpret=True,
        )
        self._check_arm(c1, q1, t1, mask, bc)
        self._check_arm(c2, q2, t2, mask, bc)

    def test_query_subtiling_matches_whole_tile(self):
        """q_sub splits the query tile into register-resident sub-dots;
        the packed tables must be bit-identical to the whole-tile path."""
        n, d, b, bc = 1024, 32, 16, 512
        c = RNG.normal(size=(n, d)).astype(np.float32)
        q = RNG.normal(size=(b, d)).astype(np.float32)
        mask = np.ones(n, bool)
        mask[100:160] = False
        args = ((jnp.asarray(c.T),), (jnp.asarray(q),), jnp.asarray(mask))
        kw = dict(block_cols=bc, dot_chunk=256, q_block=16, interpret=True)
        (whole,) = section_bucket_tables(*args, q_sub=0, **kw)
        (sub,) = section_bucket_tables(*args, q_sub=8, **kw)
        np.testing.assert_array_equal(np.asarray(whole), np.asarray(sub))

    def test_bf16_score_epilogue(self):
        n, d, b, bc = 512, 32, 8, 256
        c = RNG.normal(size=(n, d)).astype(np.float32)
        q = RNG.normal(size=(b, d)).astype(np.float32)
        mask = np.ones(n, bool)
        (t,) = section_bucket_tables(
            (jnp.asarray(c.T),), (jnp.asarray(q),), jnp.asarray(mask),
            block_cols=bc, dot_chunk=256, q_block=8,
            score_bf16=True, interpret=True,
        )
        _, rows = table_topk(t, 10, bc, n)
        exact = np.argsort(-(q @ c.T), axis=1)[:, :10]
        rows = np.asarray(rows)
        overlap = np.mean(
            [len(set(rows[i]) & set(exact[i])) / 10 for i in range(b)]
        )
        assert overlap > 0.9  # bf16 selection: same approx family

    def test_maskless_and_or_only_pack_decode(self):
        """mask=None (no-tombstone serving) + score_bf16 (OR-only pack):
        the decoded rows must still be exact — the bf16 upcast's zero low
        mantissa bits are what make dropping the AND legal."""
        n, d, b, bc = 512, 32, 8, 256
        c = RNG.normal(size=(n, d)).astype(np.float32)
        q = RNG.normal(size=(b, d)).astype(np.float32)
        (t,) = section_bucket_tables(
            (jnp.asarray(c.T),), (jnp.asarray(q),), None,
            block_cols=bc, dot_chunk=256, q_block=8,
            score_bf16=True, interpret=True,
        )
        # Reference at bf16 score precision (the epilogue's selection dtype).
        scores = (q @ c.T).astype(np.float32)
        scores_bf16 = jnp.asarray(scores).astype(jnp.bfloat16).astype(jnp.float32)
        ref_vals, ref_rows = _bucket_reference(
            np.asarray(scores_bf16), np.ones(n, bool), bc
        )
        got = np.asarray(t)
        vals, pos = (np.asarray(x) for x in unpack_table(jnp.asarray(got)))
        cols = np.arange(got.shape[1])
        rows = (cols[None, :] // LANE) * bc + pos * LANE + (cols[None, :] % LANE)
        # Ties at bf16 precision may pick either row; demand near-total match.
        assert (rows == ref_rows).mean() > 0.99
        np.testing.assert_allclose(vals, ref_vals, rtol=1e-2, atol=1e-2)

    def test_int8_arm(self):
        n, d, b, bc = 1024, 64, 16, 512
        c = RNG.normal(size=(n, d)).astype(np.float32)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        q = RNG.normal(size=(b, d)).astype(np.float32)
        ci, cs = quantize_rows_int8(c)
        (t,) = section_bucket_tables(
            (jnp.asarray(ci.T),), (jnp.asarray(q),), jnp.ones(n, bool),
            scales=(jnp.asarray(cs),),
            block_cols=bc, dot_chunk=256, q_block=8, interpret=True,
        )
        _, rows = table_topk(t, 10, bc, n)
        exact = np.argsort(-(q @ c.T), axis=1)[:, :10]
        rows = np.asarray(rows)
        overlap = np.mean(
            [len(set(rows[i]) & set(exact[i])) / 10 for i in range(b)]
        )
        assert overlap > 0.9

    def test_table_topk_select_impls_agree(self):
        """select_impl='approx' must decode the same (value, row) contract
        as the exact path. On CPU approx_max_k lowers to an exact top-k,
        so this pins the decode plumbing; the recall trade is measured on
        hardware (bench_section.py --table-select)."""
        n, d, b, bc = 512, 16, 4, 128
        c = RNG.normal(size=(n, d)).astype(np.float32)
        q = RNG.normal(size=(b, d)).astype(np.float32)
        (t,) = section_bucket_tables(
            (jnp.asarray(c.T.copy()),), (jnp.asarray(q),),
            jnp.ones(n, bool), block_cols=bc, dot_chunk=128, q_block=8,
            interpret=True,
        )
        ve, re_ = table_topk(t, 10, bc, n, select_impl="exact")
        va, ra = table_topk(t, 10, bc, n, select_impl="approx")
        np.testing.assert_allclose(np.asarray(va), np.asarray(ve), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(ra), np.asarray(re_))

    def test_geometry_validation(self):
        c = jnp.zeros((16, 300))
        q = jnp.zeros((4, 16))
        with pytest.raises(ValueError, match="multiple"):
            section_bucket_tables((c,), (q,), jnp.ones(300, bool), block_cols=256)
        with pytest.raises(ValueError, match="pos pack"):
            section_bucket_tables(
                (jnp.zeros((16, 32768)),), (q,), jnp.ones(32768, bool),
                block_cols=32768,
            )


class TestHybridSectionProgram:
    def test_matches_hybrid_fused_topk_at_exact_depth(self):
        """At depth >= N with an exhaustive bucket table (block_cols = 128,
        one row per bucket) the section program must reproduce the serving
        hybrid program's fused ranking exactly."""
        from verbatim_rag_tpu.ops.hybrid import hybrid_fused_topk
        from verbatim_rag_tpu.ops.section import hybrid_section_topk

        n, d, dp, b, m, qm, vocab = 256, 16, 32, 4, 8, 6, 64
        dense = RNG.normal(size=(n, d)).astype(np.float32)
        dense /= np.linalg.norm(dense, axis=1, keepdims=True)
        sketch = RNG.normal(size=(n, dp)).astype(np.float32)
        sp_ids = np.stack(
            [RNG.choice(np.arange(1, vocab), m, replace=False) for _ in range(n)]
        ).astype(np.int32)
        sp_w = (RNG.random((n, m)) + 0.1).astype(np.float32)
        dq = RNG.normal(size=(b, d)).astype(np.float32)
        dq /= np.linalg.norm(dq, axis=1, keepdims=True)
        sq = RNG.normal(size=(b, dp)).astype(np.float32)
        q_ids = np.stack(
            [RNG.choice(np.arange(1, vocab), qm, replace=False) for _ in range(b)]
        ).astype(np.int32)
        q_w = (RNG.random((b, qm)) + 0.1).astype(np.float32)
        mask = np.ones(n, bool)
        mask[100:110] = False

        kw = dict(k=10, fetch_k=20, depth=n, dense_weight=0.6, sparse_weight=0.4)
        ref_s, ref_r = hybrid_fused_topk(
            jnp.asarray(dense), jnp.asarray(sketch), jnp.asarray(sp_ids),
            jnp.asarray(sp_w), jnp.asarray(dq), jnp.asarray(sq),
            jnp.asarray(q_ids), jnp.asarray(q_w), mask=jnp.asarray(mask),
            exact_topk=True, **kw,
        )
        got_s, got_r = hybrid_section_topk(
            jnp.asarray(dense.T.copy()), jnp.asarray(sketch.T.copy()),
            jnp.asarray(sp_ids), jnp.asarray(sp_w), jnp.asarray(dq),
            jnp.asarray(sq), jnp.asarray(q_ids), jnp.asarray(q_w),
            mask=jnp.asarray(mask),
            block_cols=128, dot_chunk=128, q_block=8, interpret=True, **kw,
        )
        np.testing.assert_allclose(
            np.asarray(got_s), np.asarray(ref_s), rtol=1e-5, atol=1e-7
        )
        ref_r, got_r = np.asarray(ref_r), np.asarray(got_r)
        # Rows equal wherever the fused score is unique (ties may permute).
        for i in range(b):
            s = np.asarray(ref_s)[i]
            uniq = np.concatenate([[True], np.abs(np.diff(s)) > 1e-9])
            uniq &= np.concatenate([np.abs(np.diff(s)) > 1e-9, [True]])
            np.testing.assert_array_equal(got_r[i][uniq], ref_r[i][uniq])
