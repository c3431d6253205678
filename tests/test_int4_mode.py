"""int4 capacity mode: packed 4-bit rows (ops/dense.py Int4Rows).

The deepest quantization tier — 4× fewer resident HBM bytes than bf16,
2× below int8 (ROADMAP #10's stated next step). Dense scoring quality is
approximate (codes in [-7, 7]); sketch int4 only picks rescore candidates,
so with depth covering the corpus the sparse results are EXACTLY the
f32-sketch store's — that equivalence is the strongest test here.
"""

from __future__ import annotations

import numpy as np
import pytest

pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from verbatim_rag_tpu.engine.store import DeviceVectorStore  # noqa: E402
from verbatim_rag_tpu.ops.dense import (  # noqa: E402
    Int4Rows,
    dense_scores,
    quantize_rows_int4,
    unpack_int4,
)


class TestQuantizeInt4:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(16, 24)).astype(np.float32)
        q = quantize_rows_int4(x)
        assert q.packed.shape == (16, 12) and q.packed.dtype == np.int8
        codes = np.asarray(unpack_int4(jnp.asarray(q.packed)))
        assert codes.shape == x.shape
        assert codes.min() >= -7 and codes.max() <= 7
        # Dequantized values within half a quantization step per element.
        deq = codes.astype(np.float32) * q.scale
        np.testing.assert_allclose(deq, x, atol=(q.scale.max() / 2) + 1e-6)

    def test_requantization_is_stable(self):
        """Dequantize → requantize must reproduce identical codes (the
        save/load legacy fallback depends on it)."""
        rng = np.random.default_rng(5)
        x = rng.normal(size=(8, 16)).astype(np.float32)
        q1 = quantize_rows_int4(x)
        deq = (
            np.asarray(unpack_int4(jnp.asarray(q1.packed))).astype(np.float32)
            * q1.scale
        )
        q2 = quantize_rows_int4(deq)
        np.testing.assert_array_equal(q1.packed, q2.packed)
        np.testing.assert_allclose(q1.scale, q2.scale, rtol=1e-6)

    def test_odd_width_rejected(self):
        with pytest.raises(ValueError, match="even"):
            quantize_rows_int4(np.zeros((2, 7), np.float32))

    def test_dense_scores_match_manual(self):
        rng = np.random.default_rng(7)
        corpus = rng.normal(size=(32, 16)).astype(np.float32)
        q = rng.normal(size=(4, 16)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        rows = quantize_rows_int4(corpus)
        got = np.asarray(
            dense_scores(Int4Rows(jnp.asarray(rows.packed), jnp.asarray(rows.scale)), jnp.asarray(q))
        )
        # Manual: int8-quantized queries x unpacked int4 codes x scales.
        from verbatim_rag_tpu.ops.dense import quantize_rows_int8

        qi, qs = quantize_rows_int8(q)
        codes = np.asarray(unpack_int4(jnp.asarray(rows.packed))).astype(np.int32)
        raw = np.asarray(qi, np.int32) @ codes.T
        want = raw.astype(np.float32) * np.asarray(qs) * rows.scale.T
        np.testing.assert_allclose(got, want, rtol=1e-6)


DIM, VOCAB, NNZ = 16, 64, 4


def _records(n=48, seed=13):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        terms = rng.choice(np.arange(1, VOCAB), size=NNZ, replace=False)
        recs.append(
            {
                "id": f"r{i}",
                "text": f"text {i}",
                "metadata": {},
                "dense": rng.normal(size=DIM).astype(np.float32),
                "sparse": {int(t): float(rng.random() + 0.05) for t in terms},
            }
        )
    return recs


def _store(**kwargs):
    s = DeviceVectorStore(
        dense_dim=DIM, sparse_vocab=VOCAB, sparse_max_nnz=NNZ, block=16,
        rescore_depth=64, **kwargs,
    )
    s.add_vectors(_records())
    s.flush()
    return s


class TestInt4Store:
    def test_int4_sketches_exact_parity_at_full_depth(self):
        """depth covers the corpus → candidate selection can lose nothing
        and the exact rescore fixes every score: int4 sketches must return
        IDENTICAL sparse results to the default store."""
        ref = _store()
        alt = _store(sketch_dtype="int4")
        # Full vocab coverage → every row's exact score is a continuous
        # random sum, so rank ties (ordered by candidate order, which DOES
        # differ between sketch dtypes) are measure-zero.
        rng = np.random.default_rng(31)
        qs = [
            {int(t): float(rng.random() + 0.1) for t in range(1, VOCAB)}
            for _ in range(2)
        ]
        r_ref = ref.query_batch(sparse_queries=qs, top_k=8)
        r_alt = alt.query_batch(sparse_queries=qs, top_k=8)
        for a, b in zip(r_ref, r_alt):
            assert [h.id for h in a] == [h.id for h in b]
            np.testing.assert_allclose(
                [h.score for h in a], [h.score for h in b], rtol=1e-6
            )

    def test_int4_dense_matches_quantized_oracle(self):
        store = _store(dense_dtype="int4")
        rng = np.random.default_rng(17)
        q = rng.normal(size=(2, DIM)).astype(np.float32)
        res = store.query_batch(dense_queries=q, top_k=5)
        # Oracle: same quantized math over the raw vectors.
        from verbatim_rag_tpu.ops.dense import normalize_rows, quantize_rows_int8

        dense = np.asarray(
            normalize_rows(jnp.asarray(np.stack([r["dense"] for r in _records()])))
        )  # the store normalizes rows at flush before quantizing
        rows4 = quantize_rows_int4(dense)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        qi, qs_ = quantize_rows_int8(qn)
        codes = np.asarray(unpack_int4(jnp.asarray(rows4.packed))).astype(np.int32)
        scores = (np.asarray(qi, np.int32) @ codes.T).astype(np.float32)
        scores *= np.asarray(qs_) * rows4.scale.T
        for b, hits in enumerate(res):
            want = np.argsort(-scores[b])[:5]
            assert [int(h.id[1:]) for h in hits] == [int(i) for i in want]

    def test_int4_hybrid_smoke(self):
        store = _store(dense_dtype="int4", sketch_dtype="int4")
        rng = np.random.default_rng(19)
        q = rng.normal(size=(2, DIM)).astype(np.float32)
        qs = [{3: 1.0, 9: 0.5}, {40: 2.0}]
        res = store.query_batch(dense_queries=q, sparse_queries=qs, top_k=5)
        assert len(res) == 2 and all(len(r) == 5 for r in res)
        assert all(h.score > 0 for r in res for h in r)

    def test_save_load_roundtrip_bit_exact(self, tmp_path):
        store = _store(dense_dtype="int4", sketch_dtype="int4")
        rng = np.random.default_rng(23)
        q = rng.normal(size=(2, DIM)).astype(np.float32)
        before = store.query_batch(dense_queries=q, top_k=6)
        path = str(tmp_path / "idx4")
        store.save(path)
        loaded = DeviceVectorStore.load(path)
        assert loaded.dense_dtype == "int4" and loaded.sketch_dtype == "int4"
        after = loaded.query_batch(dense_queries=q, top_k=6)
        for a, b in zip(before, after):
            assert [h.id for h in a] == [h.id for h in b]
            np.testing.assert_allclose(
                [h.score for h in a], [h.score for h in b], rtol=1e-6
            )

    def test_delete_and_compact_int4(self):
        store = _store(dense_dtype="int4", sketch_dtype="int4")
        store.delete([f"r{i}" for i in range(0, 48, 5)])
        store.compact()
        rng = np.random.default_rng(29)
        q = rng.normal(size=(1, DIM)).astype(np.float32)
        res = store.query_batch(dense_queries=q, top_k=5)[0]
        assert len(res) == 5
        assert not any(int(h.id[1:]) % 5 == 0 for h in res)

    def test_f16_forward_weights_exact_vs_prerounded(self):
        """sparse_weight_dtype='float16' must return IDENTICAL results to
        an f32 store built from pre-rounded (f16→f32) weights — the rescore
        runs f32 math over numerically identical stored values."""
        recs = _records()
        rounded = [
            {
                **r,
                "sparse": {
                    t: float(np.float16(w)) for t, w in r["sparse"].items()
                },
            }
            for r in recs
        ]
        f16 = DeviceVectorStore(
            dense_dim=DIM, sparse_vocab=VOCAB, sparse_max_nnz=NNZ, block=16,
            rescore_depth=64, sparse_weight_dtype="float16",
        )
        f16.add_vectors([dict(r) for r in recs])
        f16.flush()
        ref = DeviceVectorStore(
            dense_dim=DIM, sparse_vocab=VOCAB, sparse_max_nnz=NNZ, block=16,
            rescore_depth=64,
        )
        ref.add_vectors(rounded)
        ref.flush()
        rng = np.random.default_rng(37)
        qs = [
            {int(t): float(rng.random() + 0.1) for t in range(1, VOCAB)}
            for _ in range(2)
        ]
        r16 = f16.query_batch(sparse_queries=qs, top_k=8)
        rr = ref.query_batch(sparse_queries=qs, top_k=8)
        for a, b in zip(r16, rr):
            assert [h.id for h in a] == [h.id for h in b]
            np.testing.assert_allclose(
                [h.score for h in a], [h.score for h in b], rtol=1e-5
            )

    def test_f16_weights_save_load_roundtrip(self, tmp_path):
        store = DeviceVectorStore(
            dense_dim=DIM, sparse_vocab=VOCAB, sparse_max_nnz=NNZ, block=16,
            rescore_depth=64, sparse_weight_dtype="float16",
        )
        store.add_vectors(_records())
        store.flush()
        rng = np.random.default_rng(41)
        qs = [{int(t): float(rng.random() + 0.1) for t in range(1, VOCAB)}]
        before = store.query_batch(sparse_queries=qs, top_k=6)
        path = str(tmp_path / "f16idx")
        store.save(path)
        loaded = DeviceVectorStore.load(path)
        assert loaded.sparse_weight_dtype == "float16"
        after = loaded.query_batch(sparse_queries=qs, top_k=6)
        for a, b in zip(before, after):
            assert [h.id for h in a] == [h.id for h in b]
            np.testing.assert_allclose(
                [h.score for h in a], [h.score for h in b], rtol=1e-6
            )

    def test_invalid_sparse_weight_dtype(self):
        with pytest.raises(ValueError, match="sparse_weight_dtype"):
            DeviceVectorStore(dense_dim=DIM, sparse_weight_dtype="int8")

    @pytest.mark.parametrize("sparse_mode", ["projected", "exact"])
    def test_int16_ids_bit_identical(self, sparse_mode):
        """Term ids are exact integers: an int16-id store must return
        results IDENTICAL to the int32 store, in both sparse modes."""
        ref = DeviceVectorStore(
            dense_dim=DIM, sparse_vocab=VOCAB, sparse_max_nnz=NNZ, block=16,
            rescore_depth=64, sparse_mode=sparse_mode,
        )
        alt = DeviceVectorStore(
            dense_dim=DIM, sparse_vocab=VOCAB, sparse_max_nnz=NNZ, block=16,
            rescore_depth=64, sparse_mode=sparse_mode, sparse_ids_dtype="int16",
        )
        for s in (ref, alt):
            s.add_vectors(_records())
            s.flush()
        rng = np.random.default_rng(43)
        qs = [
            {int(t): float(rng.random() + 0.1) for t in range(1, VOCAB)}
            for _ in range(2)
        ]
        r_ref = ref.query_batch(sparse_queries=qs, top_k=8)
        r_alt = alt.query_batch(sparse_queries=qs, top_k=8)
        for a, b in zip(r_ref, r_alt):
            assert [h.id for h in a] == [h.id for h in b]
            np.testing.assert_array_equal(
                [h.score for h in a], [h.score for h in b]
            )

    def test_int16_ids_vocab_bound(self):
        with pytest.raises(ValueError, match="int16"):
            DeviceVectorStore(
                dense_dim=DIM, sparse_vocab=100_000, sparse_ids_dtype="int16"
            )

    def test_int16_ids_save_load(self, tmp_path):
        store = DeviceVectorStore(
            dense_dim=DIM, sparse_vocab=VOCAB, sparse_max_nnz=NNZ, block=16,
            rescore_depth=64, sparse_ids_dtype="int16",
            sparse_weight_dtype="float16",
        )
        store.add_vectors(_records())
        store.flush()
        rng = np.random.default_rng(47)
        qs = [{int(t): float(rng.random() + 0.1) for t in range(1, VOCAB)}]
        before = store.query_batch(sparse_queries=qs, top_k=6)
        path = str(tmp_path / "i16idx")
        store.save(path)
        loaded = DeviceVectorStore.load(path)
        assert loaded.sparse_ids_dtype == "int16"
        after = loaded.query_batch(sparse_queries=qs, top_k=6)
        for a, b in zip(before, after):
            assert [h.id for h in a] == [h.id for h in b]
            np.testing.assert_allclose(
                [h.score for h in a], [h.score for h in b], rtol=1e-6
            )

    def test_odd_dims_rejected(self):
        with pytest.raises(ValueError, match="even dense_dim"):
            DeviceVectorStore(dense_dim=7, dense_dtype="int4")
        with pytest.raises(ValueError, match="even projection_dim"):
            DeviceVectorStore(
                dense_dim=8, sparse_vocab=16, projection_dim=9, sketch_dtype="int4"
            )
