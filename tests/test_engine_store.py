"""DeviceVectorStore: ingest, search dispatch, filters, deletes, persistence."""

import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("jax")

from verbatim_rag_tpu.engine.store import DeviceVectorStore, _analyze, _pad_sparse


def _unit(i, dim=8):
    v = np.zeros(dim, np.float32)
    v[i % dim] = 1.0
    return v


def make_store(**kwargs):
    defaults = dict(dense_dim=8, sparse_vocab=50, sparse_max_nnz=4, block=16)
    defaults.update(kwargs)
    return DeviceVectorStore(**defaults)


def fill(store, n=10):
    records = []
    for i in range(n):
        records.append(
            {
                "id": f"c{i}",
                "text": f"chunk {i} text about topic{i % 3}",
                "enhanced_text": f"enhanced {i}",
                "metadata": {"document_id": f"d{i % 2}", "position": i},
                "dense": _unit(i),
                "sparse": {i % 50: 1.0, (i + 1) % 50: 0.5},
            }
        )
    store.add_vectors(records)
    store.flush()
    return store


class TestIngest:
    def test_count_and_flush(self):
        store = fill(make_store())
        assert store.count() == 10
        assert store._capacity == 16  # padded to block

    def test_duplicate_id_rejected(self):
        store = fill(make_store())
        with pytest.raises(ValueError):
            store.add_vectors([{"id": "c0", "text": "", "metadata": {}}])

    def test_incremental_append(self):
        store = fill(make_store(), n=10)
        store.add_vectors(
            [{"id": "late", "text": "late", "metadata": {}, "dense": _unit(3)}]
        )
        store.flush()
        assert store.count() == 11
        hits = store.query(dense_query=_unit(3), top_k=3)
        assert any(h.id == "late" for h in hits)


class TestIngestFastPathTruncation:
    def test_unsorted_provider_rows_keep_heaviest_terms(self):
        """sparse_arrays rows wider than sparse_max_nnz are truncated by
        |weight|, not provider row order (advisor r2 finding)."""
        store = make_store()  # sparse_max_nnz=4
        ids = np.array([10, 11, 12, 13, 14, 15], np.int32)
        w = np.array([0.1, 0.2, 5.0, 0.3, 4.0, 3.0], np.float32)  # unsorted
        store.add_vectors(
            [{"id": "x", "text": "t", "metadata": {}, "sparse_arrays": (ids, w)}]
        )
        store.flush()
        kept = set(np.asarray(store._sp_ids[0]).tolist())
        assert {12, 14, 15} <= kept  # the three heaviest survived
        assert 10 not in kept and 11 not in kept


class TestRescoreDepthQuantization:
    def test_override_bucketed_and_clamped(self):
        """Client rescore_depth values are bucketed to powers of two in
        [64, 4096] so hostile depth-cycling cannot force compile churn."""
        store = fill(make_store())
        for raw in (1, 100, 129, 10**9):
            hits = store.query_batch(
                dense_queries=_unit(2)[None],
                top_k=3,
                search_params={"rescore_depth": raw},
            )
            assert hits[0] and hits[0][0].id in ("c2", "c10")


class TestSearch:
    def test_dense_exact_neighbor(self):
        store = fill(make_store())
        hits = store.query(dense_query=_unit(2), top_k=3)
        assert hits[0].id in ("c2", "c10")  # rows with the same unit vector
        assert hits[0].score == pytest.approx(1.0, rel=1e-2)

    def test_sparse_search(self):
        store = fill(make_store())
        hits = store.query(sparse_query={3: 1.0}, top_k=3)
        assert hits[0].id == "c3"  # weight 1.0 on term 3

    def test_hybrid_fuses_methods(self):
        store = fill(make_store())
        hits = store.query(dense_query=_unit(2), sparse_query={2: 1.0}, top_k=5)
        assert hits[0].id == "c2"  # top in both methods

    def test_hybrid_weights_dispatch(self):
        store = fill(make_store())
        hits = store.query(
            dense_query=_unit(2),
            sparse_query={3: 1.0},
            hybrid_weights={"dense": 0.9, "sparse": 0.1},
            top_k=2,
        )
        assert hits[0].id == "c2"

    def test_filter_restricts_results(self):
        store = fill(make_store())
        hits = store.query(dense_query=_unit(2), top_k=5, filter={"document_id": "d1"})
        assert all(h.metadata["document_id"] == "d1" for h in hits)

    def test_callable_filter(self):
        store = fill(make_store())
        hits = store.query(
            dense_query=_unit(2), top_k=5, filter=lambda m: m.get("position", 0) > 7
        )
        assert {h.id for h in hits} <= {"c8", "c9"}

    def test_filter_only_query(self):
        store = fill(make_store())
        hits = store.query(top_k=100, filter={"document_id": "d0"})
        assert len(hits) == 5

    def test_batched_queries(self):
        store = fill(make_store())
        results = store.query_batch(
            dense_queries=np.stack([_unit(1), _unit(4)]), top_k=2
        )
        assert results[0][0].id == "c1"
        assert results[1][0].id == "c4"

    def test_empty_store(self):
        store = make_store()
        assert store.query(dense_query=_unit(0), top_k=3) == []


class TestFullText:
    def test_bm25_ranks_matching_doc_first(self):
        store = make_store(enable_full_text=True, full_text_vocab=1 << 12)
        store.add_vectors(
            [
                {"id": "a", "text": "the quick brown fox jumps", "metadata": {}},
                {"id": "b", "text": "lazy dogs sleep all day long", "metadata": {}},
                {"id": "c", "text": "foxes and dogs are animals", "metadata": {}},
            ]
        )
        store.flush()
        hits = store.query(text_query="quick brown fox", top_k=2)
        assert hits[0].id == "a"

    def test_analyzer(self):
        ids, tfs, dl = _analyze("Hello hello WORLD", 1 << 10)
        assert dl == 3
        assert sorted(tfs.tolist()) == [1, 2]
        assert (ids > 0).all()


class TestDelete:
    def test_delete_hides_rows(self):
        store = fill(make_store())
        store.delete(["c2"])
        hits = store.query(dense_query=_unit(2), top_k=5)
        assert all(h.id != "c2" for h in hits)
        assert store.count() == 9

    def test_delete_document(self):
        store = fill(make_store())
        store.delete_document("d0")
        assert store.count() == 5
        assert store.get("c0") is None
        assert store.get("c1") is not None


class TestPersistence:
    def test_save_load_roundtrip(self, tmp_path):
        store = fill(make_store())
        store.delete(["c5"])
        path = str(tmp_path / "index")
        store.save(path)
        loaded = DeviceVectorStore.load(path)
        assert loaded.count() == 9
        hits = loaded.query(dense_query=_unit(2), top_k=1)
        assert hits[0].id == "c2"
        assert loaded.get("c5") is None


class TestPadSparse:
    def test_keeps_heaviest(self):
        ids, weights = _pad_sparse({1: 0.1, 2: 0.9, 3: 0.5, 4: 0.7, 5: 0.2}, max_nnz=3)
        kept = {int(t) for t, w in zip(ids, weights) if w != 0}
        assert kept == {2, 3, 4}

    def test_pads_with_zeros(self):
        ids, weights = _pad_sparse({7: 1.0}, max_nnz=4)
        assert ids[0] == 7 and weights[0] == 1.0
        assert (weights[1:] == 0).all()


class TestCompaction:
    def test_compact_reclaims_tombstones(self):
        store = fill(make_store())
        store.delete(["c1", "c3", "c5"])
        reclaimed = store.compact()
        assert reclaimed == 3
        assert store.count() == 7
        assert store.get("c1") is None
        hits = store.query(dense_query=_unit(2), top_k=3)
        assert hits[0].id == "c2"
        # Sparse still works after rebuild.
        hits = store.query(sparse_query={4: 1.0}, top_k=2)
        assert hits[0].id == "c4"

    def test_compact_noop_below_threshold(self):
        store = fill(make_store())
        store.delete(["c1"])
        assert store.compact(min_dead_fraction=0.5) == 0
        assert store.count() == 9


class TestAnalyzerParity:
    def test_native_and_python_agree(self):
        from verbatim_rag_tpu.engine import native
        from verbatim_rag_tpu.engine.store import _analyze, _fnv1a
        import numpy as np

        text = "The Quick brown FOX fox jumps over 42 lazy dogs! dogs dogs."
        vocab = 1 << 12

        # Python reference path (force fallback).
        import re as _re
        tokens = _re.findall(r"[a-z0-9]+", text.lower())
        py_ids = np.array(sorted({(_fnv1a(t) % (vocab - 1)) + 1 for t in tokens}))

        if not native.available():
            pytest.skip("native lib unavailable")
        got = native.analyze_text_native(text, vocab)
        assert got is not None
        ids, tfs, dl = got
        assert dl == len(tokens)
        np.testing.assert_array_equal(np.sort(ids), py_ids)
        # And the store-level dispatch agrees with itself.
        ids2, tfs2, dl2 = _analyze(text, vocab)
        np.testing.assert_array_equal(np.sort(ids2), np.sort(ids))
        assert dl2 == dl


class TestFullTextHybrid:
    def test_three_way_weighted_hybrid(self):
        store = make_store(enable_full_text=True, full_text_vocab=1 << 12)
        records = []
        for i in range(8):
            topic = "solar panels" if i % 2 == 0 else "wind turbines"
            records.append(
                {
                    "id": f"h{i}",
                    "text": f"Document {i} all about {topic} and energy systems.",
                    "metadata": {},
                    "dense": _unit(i),
                    "sparse": {i % 50: 1.0},
                }
            )
        store.add_vectors(records)
        store.flush()
        hits = store.query_batch(
            dense_queries=np.stack([_unit(0)]),
            sparse_queries=[{0: 1.0}],
            text_queries=["solar panels"],
            hybrid_weights={"dense": 0.2, "sparse": 0.2, "full_text": 0.6},
            top_k=4,
        )[0]
        assert hits
        # The full-text-dominant weighting should surface a solar doc first.
        assert "solar" in hits[0].text


class TestHybridFastPathConsistency:
    def test_fused_fast_path_matches_generic_hybrid(self):
        """The one-device-call projected fast path must rank like the
        generic per-method + host-RRF path."""
        store = fill(make_store(), n=10)
        dense_q = _unit(2)
        sparse_q = {3: 1.0, 2: 0.4}

        fast = store.query(dense_query=dense_q, sparse_query=sparse_q, top_k=5)

        # Generic path: run methods separately and fuse on host.
        import jax.numpy as jnp
        from verbatim_rag_tpu.ops.fusion import rrf_fuse_np

        mask = store._build_mask(None)
        d_scores, d_rows = store._run_method("dense", dense_q[None, :], 10, mask)
        s_scores, s_rows = store._run_method("sparse", [sparse_q], 10, mask)
        _, rows = rrf_fuse_np(
            np.stack([
                np.where(d_scores > -1e29, d_rows, -1),
                np.where(s_scores > -1e29, s_rows, -1),
            ]),
            np.asarray([0.5, 0.5], np.float32),
            k=5,
        )
        expected_ids = [store._ids[r] for r in rows[0] if r >= 0]
        assert [h.id for h in fast] == expected_ids
        del jnp


class TestThreeWayFusedFastPath:
    def test_3way_fused_program_matches_host_fusion(self):
        """With enable_full_text the serving path runs the 3-way fused
        device program (hybrid_fused_topk_3way); it must rank exactly like
        the generic per-method + host-RRF path it replaced."""
        store = make_store(enable_full_text=True, full_text_vocab=1 << 12)
        records = []
        for i in range(12):
            topic = ["solar panels", "wind turbines", "hydro dams"][i % 3]
            records.append(
                {
                    "id": f"t{i}",
                    "text": f"Document {i} about {topic} and energy grids.",
                    "metadata": {},
                    "dense": _unit(i),
                    "sparse": {i % 50: 1.0, (i + 7) % 50: 0.3},
                }
            )
        store.add_vectors(records)
        store.flush()

        dense_q = _unit(4)
        sparse_q = {4: 1.0, 11: 0.4}
        text_q = "solar panels energy"
        weights = {"dense": 0.3, "sparse": 0.3, "full_text": 0.4}

        fused = store.query(
            dense_query=dense_q, sparse_query=sparse_q, text_query=text_q,
            hybrid_weights=weights, top_k=5,
        )

        from verbatim_rag_tpu.ops.fusion import rrf_fuse_np

        mask = store._build_mask(None)
        arms = []
        for name, payload in (
            ("dense", dense_q[None, :]),
            ("sparse", [sparse_q]),
            ("full_text", [text_q]),
        ):
            scores, rows = store._run_method(name, payload, 10, mask)
            arms.append(np.where(scores > -1e29, rows, -1))
        _, rows = rrf_fuse_np(
            np.stack(arms),
            np.asarray([0.3, 0.3, 0.4], np.float32),
            k=5,
        )
        expected_ids = [store._ids[r] for r in rows[0] if r >= 0]
        assert [h.id for h in fused] == expected_ids

    def test_3way_fused_program_int8_sketches(self):
        """The 3-way arm carries the int8 sketch scales through the fused
        program (all three corpora quantized)."""
        store = make_store(
            enable_full_text=True, full_text_vocab=1 << 12,
            dense_dtype="int8", sketch_dtype="int8",
        )
        records = []
        for i in range(10):
            records.append(
                {
                    "id": f"q{i}",
                    "text": f"Row {i} mentions topic{i % 4} repeatedly topic{i % 4}.",
                    "metadata": {},
                    "dense": _unit(i),
                    "sparse": {i % 50: 1.0},
                }
            )
        store.add_vectors(records)
        store.flush()
        hits = store.query(
            dense_query=_unit(2), sparse_query={2: 1.0},
            text_query="topic2", top_k=4,
        )
        assert hits and any("topic2" in h.text for h in hits)


class TestPendingDuplicates:
    def test_duplicate_id_in_pending_buffer_rejected(self):
        from verbatim_rag_tpu.engine.store import DeviceVectorStore

        store = DeviceVectorStore(dense_dim=4, sparse_vocab=None, block=8)
        store.add_vectors([{"id": "a", "text": "x", "dense": [1, 0, 0, 0]}])
        # Not flushed yet — the dup must still be caught.
        with pytest.raises(ValueError, match="Duplicate id"):
            store.add_vectors([{"id": "a", "text": "y", "dense": [0, 1, 0, 0]}])
        store.flush()
        assert store.count() == 1


class TestGeometricGrowth:
    def test_capacity_doubles_and_queries_stay_correct(self):
        import numpy as np

        from verbatim_rag_tpu.engine.store import DeviceVectorStore

        rng = np.random.default_rng(0)
        store = DeviceVectorStore(dense_dim=8, sparse_vocab=None, block=8)
        caps = []
        for wave in range(6):
            store.add_vectors(
                [
                    {
                        "id": f"w{wave}_{i}",
                        "text": f"t{wave}_{i}",
                        "dense": rng.normal(size=8).astype(np.float32),
                    }
                    for i in range(5)
                ]
            )
            store.flush()
            caps.append(store._capacity)
        # Geometric: few distinct capacities, each a doubling of block.
        assert len(set(caps)) <= 4
        assert all(c % 8 == 0 and (c & (c - 1)) == 0 for c in caps)
        # All 30 rows retrievable exactly.
        probe = np.asarray(store._dense[17], np.float32)
        hits = store.query(dense_query=probe, top_k=1)
        assert hits[0].id == store._ids[17]
        assert store.count() == 30


class TestReserveAndAutoCompact:
    def test_reserve_presizes_then_queries_work(self):
        import numpy as np

        from verbatim_rag_tpu.engine.store import DeviceVectorStore

        rng = np.random.default_rng(1)
        store = DeviceVectorStore(dense_dim=8, sparse_vocab=32, sparse_max_nnz=4, block=16)
        store.reserve(100)
        cap0 = store._capacity
        assert cap0 >= 100
        store.add_vectors(
            [
                {
                    "id": f"r{i}",
                    "text": f"t{i}",
                    "dense": rng.normal(size=8).astype(np.float32),
                    "sparse": {int(1 + i % 30): 1.0 + i},
                }
                for i in range(60)
            ]
        )
        store.flush()
        assert store._capacity == cap0  # no growth copies happened
        probe = np.asarray(store._dense[13], np.float32)
        assert store.query(dense_query=probe, top_k=1)[0].id == "r13"

    def test_auto_compact_on_delete(self):
        import numpy as np

        from verbatim_rag_tpu.engine.store import DeviceVectorStore

        rng = np.random.default_rng(2)
        store = DeviceVectorStore(
            dense_dim=8, sparse_vocab=None, block=8, auto_compact_threshold=0.5
        )
        store.add_vectors(
            [
                {"id": f"r{i}", "text": f"t{i}", "dense": rng.normal(size=8).astype(np.float32)}
                for i in range(20)
            ]
        )
        store.flush()
        store.delete([f"r{i}" for i in range(12)])  # 60% dead → auto-compact
        assert store.count() == 8
        assert len(store._ids) == 8  # rows physically reclaimed
        assert store.query(dense_query=np.asarray(store._dense[0], np.float32), top_k=1)[0]


class TestInt8DenseMode:
    """dense_dtype='int8': the capacity mode — per-row quantized dense matrix
    (ops/dense.quantize_rows_int8), scores rescaled inside the kernels."""

    def test_rejects_unknown_dtype(self):
        with pytest.raises(ValueError):
            make_store(dense_dtype="fp4")

    def test_dense_search_matches_bf16_on_separable_data(self):
        a = fill(make_store())
        b = fill(make_store(dense_dtype="int8"))
        for i in (0, 3, 7):
            ra = a.query(dense_query=_unit(i), top_k=3)
            rb = b.query(dense_query=_unit(i), top_k=3)
            assert [h.id for h in ra] == [h.id for h in rb]
            # int8 dequantized scores approximate cosine
            assert abs(ra[0].score - rb[0].score) < 0.02

    def test_hybrid_fused_path(self):
        store = fill(make_store(dense_dtype="int8"))
        hits = store.query(dense_query=_unit(2), sparse_query={2: 1.0}, top_k=3)
        assert hits and hits[0].id == "c2"

    def test_save_load_roundtrip(self, tmp_path):
        store = fill(make_store(dense_dtype="int8"))
        path = str(tmp_path / "idx")
        store.save(path)
        loaded = DeviceVectorStore.load(path)
        assert loaded.dense_dtype == "int8"
        orig = store.query(dense_query=_unit(4), top_k=3)
        back = loaded.query(dense_query=_unit(4), top_k=3)
        assert [h.id for h in orig] == [h.id for h in back]

    def test_delete_and_compact(self):
        store = fill(make_store(dense_dtype="int8"))
        store.delete(["c1"])
        assert store.compact() > 0
        hits = store.query(dense_query=_unit(1), top_k=2)
        assert all(h.id != "c1" for h in hits)

    def test_save_load_codes_roundtrip_stable(self, tmp_path):
        """int8 codes + scales persist verbatim: repeated save/load cycles
        must not drift quantization (advisor r2 finding)."""
        store = fill(make_store(dense_dtype="int8"))
        p1 = str(tmp_path / "a")
        store.save(p1)
        loaded = DeviceVectorStore.load(p1)
        n = len(store._ids)
        np.testing.assert_array_equal(
            np.asarray(store._dense[:n]), np.asarray(loaded._dense[:n])
        )
        np.testing.assert_array_equal(
            np.asarray(store._dense_scale[:n]), np.asarray(loaded._dense_scale[:n])
        )
        # Second cycle: still byte-identical.
        p2 = str(tmp_path / "b")
        loaded.save(p2)
        again = DeviceVectorStore.load(p2)
        np.testing.assert_array_equal(
            np.asarray(loaded._dense[:n]), np.asarray(again._dense[:n])
        )

    def test_load_with_dead_rows_keeps_codes_verbatim(self, tmp_path):
        """load() must not auto-compact while replaying tombstones: compact()
        rebuilds from dequantized f32 rows and re-quantizes, which would undo
        the verbatim code restoration on the very same load() call."""
        store = fill(make_store(dense_dtype="int8", auto_compact_threshold=0.2))
        store.auto_compact_threshold = None  # tombstone without compacting
        store.delete(["c1", "c2", "c3"])  # 30% dead > threshold
        store.auto_compact_threshold = 0.2
        n = len(store._ids)
        codes = np.asarray(store._dense[:n])
        path = str(tmp_path / "idx")
        store.save(path)
        loaded = DeviceVectorStore.load(path)
        assert len(loaded._ids) == n, "load() compacted despite verbatim codes"
        np.testing.assert_array_equal(np.asarray(loaded._dense[:n]), codes)
        assert loaded.auto_compact_threshold == 0.2  # policy survives the load
        # The next real mutation re-applies the policy.
        loaded.delete(["c4"])
        assert len(loaded._ids) < n


class TestInt8SketchMode:
    """sketch_dtype='int8': per-row quantized sketch matrices — at serving
    scale the sketches are the LARGEST device array (1M×768 bf16 = 1.5 GB),
    so this is the other half of the capacity story. Sketches only select
    rescore candidates; exact forward-index rescore fixes every reported
    score, so sparse results should match the float-sketch store on
    separable data and scores must stay EXACT."""

    def test_rejects_unknown_dtype(self):
        with pytest.raises(ValueError):
            make_store(sketch_dtype="fp4")

    def test_sparse_search_matches_float_sketches(self):
        a = fill(make_store())
        b = fill(make_store(sketch_dtype="int8"))
        assert b._sp_proj is not None and b._sp_proj.dtype == jnp.int8
        assert b._sp_proj_scale is not None
        for i in (0, 3, 7):
            ra = a.query(sparse_query={i % 50: 1.0}, top_k=3)
            rb = b.query(sparse_query={i % 50: 1.0}, top_k=3)
            assert [h.id for h in ra] == [h.id for h in rb]
            # reported scores are exact dots in BOTH stores (rescore)
            for ha, hb in zip(ra, rb):
                assert ha.score == pytest.approx(hb.score, abs=1e-6)

    def test_hybrid_and_full_text(self):
        store = fill(
            make_store(sketch_dtype="int8", enable_full_text=True, full_text_vocab=128)
        )
        hits = store.query(dense_query=_unit(2), sparse_query={2: 1.0}, top_k=3)
        assert hits and hits[0].id == "c2"
        ft = store.query_batch(text_queries=["chunk 3 text about topic0"], top_k=3)[0]
        assert ft and store._ft_proj.dtype == jnp.int8

    def test_combined_with_int8_dense(self):
        store = fill(make_store(dense_dtype="int8", sketch_dtype="int8"))
        hits = store.query(dense_query=_unit(2), sparse_query={2: 1.0}, top_k=3)
        assert hits and hits[0].id == "c2"

    def test_save_load_roundtrip(self, tmp_path):
        store = fill(make_store(sketch_dtype="int8"))
        path = str(tmp_path / "idx8")
        store.save(path)
        loaded = DeviceVectorStore.load(path)
        assert loaded.sketch_dtype == "int8"
        assert loaded._sp_proj.dtype == jnp.int8
        orig = store.query(sparse_query={4: 1.0}, top_k=3)
        back = loaded.query(sparse_query={4: 1.0}, top_k=3)
        assert [h.id for h in orig] == [h.id for h in back]

    def test_reserve_delete_compact(self):
        store = make_store(sketch_dtype="int8")
        store.reserve(64)
        fill(store)
        assert store._sp_proj_scale.shape[0] == store._capacity
        store.delete(["c1"])
        assert store.compact() > 0
        assert store.sketch_dtype == "int8"
        hits = store.query(sparse_query={2: 1.0}, top_k=2)
        assert all(h.id != "c1" for h in hits)


class TestExactScanRefusal:
    """VERDICT r2 weak #4: the exact XLA-gather scan must refuse to serve at
    scale instead of limping orders-of-magnitude slow."""

    def test_refuses_above_threshold(self, monkeypatch):
        monkeypatch.setattr(DeviceVectorStore, "EXACT_SCAN_MAX_ROWS", 5)
        store = fill(make_store(sparse_mode="exact"))  # 10 rows > 5
        with pytest.raises(RuntimeError, match="allow_exact_at_scale"):
            store.query(sparse_query={3: 1.0}, top_k=3)

    def test_opt_in_allows_it(self, monkeypatch):
        monkeypatch.setattr(DeviceVectorStore, "EXACT_SCAN_MAX_ROWS", 5)
        store = fill(make_store(sparse_mode="exact", allow_exact_at_scale=True))
        hits = store.query(sparse_query={3: 1.0}, top_k=3)
        assert hits and hits[0].id == "c3"

    def test_small_corpus_unaffected(self):
        store = fill(make_store(sparse_mode="exact"))
        hits = store.query(sparse_query={3: 1.0}, top_k=3)
        assert hits and hits[0].id == "c3"

    def test_flag_survives_save_load(self, tmp_path, monkeypatch):
        store = fill(make_store(sparse_mode="exact", allow_exact_at_scale=True))
        path = str(tmp_path / "idx")
        store.save(path)
        loaded = DeviceVectorStore.load(path)
        assert loaded.allow_exact_at_scale is True


class TestDeviceQueryHandoff:
    """query_batch accepts device arrays (jax dense, (ids, w) sparse pairs) —
    the encode→search handoff — and returns results identical to the legacy
    host-dict path."""

    @staticmethod
    def _queries(n_q=3, m=4):
        dense = np.stack([_unit(i + 1) for i in range(n_q)])
        dicts = [{(i + 3) % 50: 1.0, (i + 4) % 50: 0.5} for i in range(n_q)]
        ids = np.zeros((n_q, m), np.int32)
        w = np.zeros((n_q, m), np.float32)
        for i, row in enumerate(dicts):
            ids[i], w[i] = _pad_sparse(row, m)
        return dense, dicts, ids, w

    @staticmethod
    def _flat(results):
        return [[(h.id, round(h.score, 5)) for h in hits] for hits in results]

    def test_hybrid_arrays_match_dicts(self):
        store = fill(make_store())
        dense, dicts, ids, w = self._queries()
        host = store.query_batch(dense_queries=dense, sparse_queries=dicts, top_k=4)
        dev = store.query_batch(
            dense_queries=jnp.asarray(dense),
            sparse_queries=(jnp.asarray(ids), jnp.asarray(w)),
            top_k=4,
        )
        assert self._flat(host) == self._flat(dev)

    def test_sparse_only_arrays_match_dicts(self):
        store = fill(make_store())
        _, dicts, ids, w = self._queries()
        host = store.query_batch(sparse_queries=dicts, top_k=4, search_type="sparse")
        dev = store.query_batch(
            sparse_queries=(jnp.asarray(ids), jnp.asarray(w)),
            top_k=4,
            search_type="sparse",
        )
        assert self._flat(host) == self._flat(dev)

    def test_exact_mode_converts_arrays(self):
        store = fill(make_store(sparse_mode="exact"))
        _, dicts, ids, w = self._queries()
        host = store.query_batch(sparse_queries=dicts, top_k=4, search_type="sparse")
        dev = store.query_batch(
            sparse_queries=(ids, w), top_k=4, search_type="sparse"
        )
        assert self._flat(host) == self._flat(dev)

    def test_batch_size_with_array_pair(self):
        _, _, ids, w = self._queries(n_q=3)
        assert DeviceVectorStore._batch_size(None, (ids, w), None) == 3

    def test_nway_hybrid_with_arrays(self):
        store = fill(make_store(enable_full_text=True))
        dense, dicts, ids, w = self._queries()
        texts = [f"chunk {i} text" for i in range(3)]
        host = store.query_batch(
            dense_queries=dense, sparse_queries=dicts, text_queries=texts,
            top_k=4, hybrid_weights={"dense": 0.4, "sparse": 0.3, "full_text": 0.3},
        )
        dev = store.query_batch(
            dense_queries=jnp.asarray(dense),
            sparse_queries=(jnp.asarray(ids), jnp.asarray(w)),
            text_queries=texts,
            top_k=4, hybrid_weights={"dense": 0.4, "sparse": 0.3, "full_text": 0.3},
        )
        assert self._flat(host) == self._flat(dev)

    def test_int8_modes_accept_arrays(self):
        store = fill(make_store(dense_dtype="int8", sketch_dtype="int8"))
        dense, dicts, ids, w = self._queries()
        host = store.query_batch(dense_queries=dense, sparse_queries=dicts, top_k=4)
        dev = store.query_batch(
            dense_queries=jnp.asarray(dense),
            sparse_queries=(jnp.asarray(ids), jnp.asarray(w)),
            top_k=4,
        )
        assert self._flat(host) == self._flat(dev)


class TestReviewRound3Fixes:
    """Regressions for the round-3 serving-path review findings."""

    def test_batch_with_mid_batch_duplicate_queues_nothing(self):
        store = fill(make_store())
        batch = [
            {"id": "new1", "text": "a", "metadata": {}, "dense": _unit(1)},
            {"id": "c0", "text": "dup", "metadata": {}, "dense": _unit(2)},
            {"id": "new2", "text": "b", "metadata": {}, "dense": _unit(3)},
        ]
        with pytest.raises(ValueError, match="Duplicate id"):
            store.add_vectors(batch)
        # Atomicity: NOTHING from the rejected batch may have been queued.
        store.flush()
        assert store.count() == 10
        assert "new1" not in store._row_of

    def test_in_batch_duplicate_rejected(self):
        store = make_store()
        batch = [
            {"id": "x", "text": "a", "metadata": {}, "dense": _unit(1)},
            {"id": "x", "text": "b", "metadata": {}, "dense": _unit(2)},
        ]
        with pytest.raises(ValueError, match="Duplicate id"):
            store.add_vectors(batch)
        assert store.count() == 0

    def test_unavailable_search_type_raises(self):
        store = fill(make_store())  # no full_text index
        with pytest.raises(ValueError, match="full_text"):
            store.query(text_query="topic", search_type="full_text")

    def test_query_against_missing_index_raises_not_browses(self):
        # Dense-only store, sparse query: must raise, not return arbitrary
        # rows with score 0.0 dressed up as results.
        store = DeviceVectorStore(dense_dim=8, sparse_vocab=None, block=16)
        store.add_vectors(
            [{"id": f"r{i}", "text": "t", "metadata": {}, "dense": _unit(i)} for i in range(4)]
        )
        with pytest.raises(ValueError, match="no matching"):
            store.query(sparse_query={1: 1.0})

    def test_unknown_search_type_raises(self):
        store = fill(make_store())
        with pytest.raises(ValueError, match="fulltext"):
            store.query(search_type="fulltext")  # typo'd name

    def test_filter_only_browse_still_works(self):
        store = fill(make_store())
        hits = store.query(filter={"document_id": "d1"}, top_k=5)
        assert hits and all(h.metadata["document_id"] == "d1" for h in hits)

    def test_save_empty_full_text_store(self, tmp_path):
        store = DeviceVectorStore(
            dense_dim=8, sparse_vocab=None, enable_full_text=True, block=16
        )
        path = str(tmp_path / "empty_ft")
        store.save(path)  # must not crash on the never-flushed ft arrays
        loaded = DeviceVectorStore.load(path)
        assert loaded.count() == 0

    def test_promoted_none_dict_filter_matches_missing_field(self):
        store = make_store()
        store.add_vectors(
            [
                {"id": "with", "text": "t", "metadata": {"document_id": "d9"},
                 "dense": _unit(0)},
                {"id": "without", "text": "t", "metadata": {}, "dense": _unit(1)},
            ]
        )
        store.flush()
        hits = store.query(filter={"document_id": None}, top_k=5)
        assert [h.id for h in hits] == ["without"]

    def test_bm25_idf_stable_under_delete(self):
        """df/N must track live rows: idf after delete == idf after compact."""
        store = DeviceVectorStore(
            dense_dim=None, sparse_vocab=None, enable_full_text=True, block=16
        )
        recs = [
            {"id": "a", "text": "apple banana", "metadata": {}},
            {"id": "b", "text": "apple cherry", "metadata": {}},
            {"id": "c", "text": "banana cherry durian", "metadata": {}},
        ]
        store.add_vectors(recs)
        store.flush()
        store.delete(["b"])
        idf_tombstoned = store._bm25_query_sparse(["apple banana cherry durian"])[0]
        store.compact()
        idf_compacted = store._bm25_query_sparse(["apple banana cherry durian"])[0]
        assert idf_tombstoned.keys() == idf_compacted.keys()
        for t in idf_tombstoned:
            assert idf_tombstoned[t] == pytest.approx(idf_compacted[t], rel=1e-6)

    def test_bm25_delete_is_idempotent_on_stats(self):
        store = DeviceVectorStore(
            dense_dim=None, sparse_vocab=None, enable_full_text=True, block=16
        )
        store.add_vectors(
            [
                {"id": "a", "text": "apple banana", "metadata": {}},
                {"id": "b", "text": "apple", "metadata": {}},
            ]
        )
        store.flush()
        store.delete(["a"])
        df_after = store._doc_freq.copy()
        store.delete(["a"])  # second delete of the same id: no double-decrement
        np.testing.assert_array_equal(store._doc_freq, df_after)
        assert (store._doc_freq >= 0).all()

    def test_unfiltered_mask_reuses_device_validity(self):
        store = fill(make_store())
        mask = store._build_mask(None)
        assert mask is store._valid_dev  # no per-query host rebuild/upload
        store.delete(["c3"])
        hits = store.query(dense_query=_unit(3), top_k=3)
        assert all(h.id != "c3" for h in hits)

    def test_filtered_mask_still_excludes_tombstones(self):
        store = fill(make_store())
        store.delete(["c1"])  # c1 has document_id d1
        hits = store.query(filter={"document_id": "d1"}, top_k=10)
        assert hits and all(h.id != "c1" for h in hits)


class TestAnalyzerSaturation:
    def test_many_unique_terms_not_truncated(self):
        """The C analyzer's 4096-unique-term buffer must not silently cap
        an index that the Python fallback would build fully: on saturation
        the native call returns None and the Python path runs."""
        text = " ".join(f"uniqword{i}" for i in range(5000))
        terms, tfs, dl = _analyze(text, 1 << 20)
        assert dl == 5000
        assert len(terms) > 4096  # hash collisions may merge a few
