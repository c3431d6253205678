"""Sharded search + param sharding on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from verbatim_rag_tpu.parallel.mesh import (  # noqa: E402
    encoder_param_specs,
    make_mesh,
    shard_params,
)
from verbatim_rag_tpu.parallel.sharded_search import (  # noqa: E402
    replicate,
    shard_rows,
    sharded_dense_topk,
    sharded_sparse_topk,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=4, tp=2)


class TestShardedDense:
    def test_matches_single_device(self, mesh):
        n, d, b, k = 1024, 64, 4, 10
        corpus = RNG.normal(size=(n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        queries = RNG.normal(size=(b, d)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        mask = np.ones(n, bool)
        mask[::17] = False

        corpus_sharded = shard_rows(jnp.asarray(corpus), mesh)
        queries_rep = replicate(jnp.asarray(queries), mesh)
        mask_sharded = shard_rows(jnp.asarray(mask), mesh)

        scores, idx = sharded_dense_topk(corpus_sharded, queries_rep, k, mask_sharded, mesh)
        scores, idx = np.asarray(scores), np.asarray(idx)

        full = queries @ corpus.T
        full[:, ~mask] = -np.inf
        expected_scores = -np.sort(-full, axis=1)[:, :k]
        np.testing.assert_allclose(scores, expected_scores, rtol=5e-3, atol=1e-3)
        # Indices consistent with their scores.
        gathered = np.take_along_axis(full, idx, axis=1)
        np.testing.assert_allclose(scores, gathered, rtol=5e-3, atol=1e-3)
        assert not np.isin(idx, np.flatnonzero(~mask)).any()


class TestShardedSparse:
    def test_matches_single_device(self, mesh):
        n, m, vocab, b, k = 512, 8, 64, 2, 8
        ids = RNG.integers(1, vocab, size=(n, m)).astype(np.int32)
        weights = RNG.random(size=(n, m)).astype(np.float32)
        q = np.zeros((b, vocab), np.float32)
        q[0, [3, 9]] = [1.0, 2.0]
        q[1, [5]] = [1.5]
        mask = np.ones(n, bool)

        scores, idx = sharded_sparse_topk(
            shard_rows(jnp.asarray(ids), mesh),
            shard_rows(jnp.asarray(weights), mesh),
            replicate(jnp.asarray(q), mesh),
            k,
            shard_rows(jnp.asarray(mask), mesh),
            mesh,
            block=64,
        )
        scores = np.asarray(scores)

        expected = np.zeros((b, n))
        for bi in range(b):
            for ni in range(n):
                expected[bi, ni] = np.sum(weights[ni] * q[bi, ids[ni]])
        expected_top = -np.sort(-expected, axis=1)[:, :k]
        np.testing.assert_allclose(scores, expected_top, rtol=1e-4)


class TestParamSharding:
    def test_specs_cover_tree(self):
        from verbatim_rag_tpu.models.config import tiny_test_config
        from verbatim_rag_tpu.models.encoder import init_encoder_params

        config = tiny_test_config()
        params = init_encoder_params(jax.random.PRNGKey(0), config)
        specs = encoder_param_specs(params)
        assert jax.tree.structure(specs) == jax.tree.structure(params)

    def test_shard_params_places_on_mesh(self, mesh):
        from verbatim_rag_tpu.models.config import tiny_test_config
        from verbatim_rag_tpu.models.encoder import encoder_forward, init_encoder_params

        config = tiny_test_config(num_heads=2, intermediate_size=64)
        params = init_encoder_params(jax.random.PRNGKey(0), config)
        sharded = shard_params(params, mesh)

        # TP-sharded kernel really is distributed over tp axis.
        wi = sharded["layers"]["mlp"]["wi"]["kernel"]
        assert len(wi.sharding.device_set) >= 2

        # Forward still gives identical numerics.
        ids = jnp.asarray(RNG.integers(3, config.vocab_size, size=(2, 16)), jnp.int32)
        mask = jnp.ones((2, 16), jnp.int32)
        ref = np.asarray(encoder_forward(params, config, ids, mask))
        got = np.asarray(encoder_forward(sharded, config, ids, mask))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


class TestDistributedHelpers:
    def test_single_process_noop(self):
        from verbatim_rag_tpu.parallel.distributed import (
            initialize,
            process_local_batch_slice,
        )

        assert initialize() is False  # no coordinator configured
        assert process_local_batch_slice(32) == slice(0, 32)


class TestMeshStore:
    """`DeviceVectorStore(mesh=...)`: the serving store sharded over the mesh
    must return the same results as the single-device store (VERDICT.md #1)."""

    def _records(self, n=300, d=16, vocab=64, nnz=6):
        rng = np.random.default_rng(11)
        records = []
        for i in range(n):
            vec = rng.normal(size=d).astype(np.float32)
            terms = rng.choice(np.arange(1, vocab), size=nnz, replace=False)
            sparse = {int(t): float(rng.random() + 0.05) for t in terms}
            records.append(
                {
                    "id": f"r{i}",
                    "text": f"document number {i} about topic {i % 7}",
                    "enhanced_text": f"enhanced {i}",
                    "metadata": {"document_id": f"doc{i % 10}", "topic": i % 7},
                    "dense": vec,
                    "sparse": sparse,
                }
            )
        return records

    def _stores(self, mesh, **kwargs):
        from verbatim_rag_tpu.engine.store import DeviceVectorStore

        common = dict(
            dense_dim=16, sparse_vocab=64, sparse_max_nnz=8, block=64,
            projection_dim=32, rescore_depth=512, **kwargs,
        )
        plain = DeviceVectorStore(**common)
        sharded = DeviceVectorStore(mesh=mesh, **common)
        records = self._records()
        plain.add_vectors(records)
        sharded.add_vectors([dict(r) for r in records])
        plain.flush()
        sharded.flush()
        return plain, sharded

    @staticmethod
    def _assert_same(res_a, res_b):
        for hits_a, hits_b in zip(res_a, res_b):
            assert [h.id for h in hits_a] == [h.id for h in hits_b]
            np.testing.assert_allclose(
                [h.score for h in hits_a], [h.score for h in hits_b],
                rtol=1e-4, atol=1e-5,
            )

    def test_dense_parity(self, mesh):
        plain, sharded = self._stores(mesh)
        rng = np.random.default_rng(3)
        q = rng.normal(size=(4, 16)).astype(np.float32)
        self._assert_same(
            plain.query_batch(dense_queries=q, top_k=10),
            sharded.query_batch(dense_queries=q, top_k=10),
        )

    def test_sparse_projected_parity(self, mesh):
        # rescore_depth covers the corpus → exact → identical to plain.
        plain, sharded = self._stores(mesh)
        qs = [{3: 1.0, 9: 0.5, 17: 0.25}, {40: 2.0, 5: 0.1}]
        self._assert_same(
            plain.query_batch(sparse_queries=qs, top_k=8),
            sharded.query_batch(sparse_queries=qs, top_k=8),
        )

    def test_sparse_exact_mode_parity(self, mesh):
        plain, sharded = self._stores(mesh, sparse_mode="exact")
        qs = [{3: 1.0, 9: 0.5, 17: 0.25}]
        self._assert_same(
            plain.query_batch(sparse_queries=qs, top_k=8),
            sharded.query_batch(sparse_queries=qs, top_k=8),
        )

    def test_hybrid_parity(self, mesh):
        plain, sharded = self._stores(mesh)
        rng = np.random.default_rng(5)
        q = rng.normal(size=(3, 16)).astype(np.float32)
        qs = [{3: 1.0, 9: 0.5}, {40: 2.0, 5: 0.1}, {1: 1.0, 2: 1.0, 4: 1.0}]
        self._assert_same(
            plain.query_batch(dense_queries=q, sparse_queries=qs, top_k=6),
            sharded.query_batch(dense_queries=q, sparse_queries=qs, top_k=6),
        )

    def test_hybrid_parity_kernel_impls(self, mesh):
        """Mesh store with the round-3 kernel knobs: per-shard rescore and
        candidate impls must preserve plain-vs-sharded parity (on CPU both
        dispatch to their XLA fallbacks — the routing is what's tested)."""
        plain, sharded = self._stores(
            mesh, rescore_impl="pallas", candidate_impl="bucket"
        )
        rng = np.random.default_rng(5)
        q = rng.normal(size=(3, 16)).astype(np.float32)
        qs = [{3: 1.0, 9: 0.5}, {40: 2.0, 5: 0.1}, {1: 1.0, 2: 1.0, 4: 1.0}]
        self._assert_same(
            plain.query_batch(dense_queries=q, sparse_queries=qs, top_k=6),
            sharded.query_batch(dense_queries=q, sparse_queries=qs, top_k=6),
        )
        self._assert_same(
            plain.query_batch(sparse_queries=qs, top_k=8),
            sharded.query_batch(sparse_queries=qs, top_k=8),
        )

    def test_int8_dense_parity(self, mesh):
        """int8 capacity mode: sharded quantized scoring must equal the
        single-device quantized scoring exactly (same q, same scales)."""
        plain, sharded = self._stores(mesh, dense_dtype="int8")
        rng = np.random.default_rng(7)
        q = rng.normal(size=(3, 16)).astype(np.float32)
        qs = [{3: 1.0, 9: 0.5}, {40: 2.0}, {1: 1.0, 4: 1.0}]
        self._assert_same(
            plain.query_batch(dense_queries=q, top_k=8),
            sharded.query_batch(dense_queries=q, top_k=8),
        )
        self._assert_same(
            plain.query_batch(dense_queries=q, sparse_queries=qs, top_k=6),
            sharded.query_batch(dense_queries=q, sparse_queries=qs, top_k=6),
        )

    def test_int8_sketch_parity(self, mesh):
        """int8 sketches: sharded quantized candidate generation + exact
        rescore must equal the single-device int8-sketch store exactly
        (reported scores are exact dots in both)."""
        plain, sharded = self._stores(mesh, sketch_dtype="int8")
        rng = np.random.default_rng(11)
        q = rng.normal(size=(3, 16)).astype(np.float32)
        qs = [{3: 1.0, 9: 0.5}, {40: 2.0}, {1: 1.0, 4: 1.0}]
        self._assert_same(
            plain.query_batch(sparse_queries=qs, top_k=8),
            sharded.query_batch(sparse_queries=qs, top_k=8),
        )
        self._assert_same(
            plain.query_batch(dense_queries=q, sparse_queries=qs, top_k=6),
            sharded.query_batch(dense_queries=q, sparse_queries=qs, top_k=6),
        )

    def test_int4_modes_parity(self, mesh):
        """int4 capacity mode on the mesh: the Int4Rows pytree flows
        through the shard_map specs (prefix rule shards both leaves by
        rows); plain-vs-sharded results must match exactly — dense codes
        and scales are identical on both, and sparse scores are exact."""
        plain, sharded = self._stores(mesh, dense_dtype="int4", sketch_dtype="int4")
        rng = np.random.default_rng(11)
        q = rng.normal(size=(3, 16)).astype(np.float32)
        qs = [{3: 1.0, 9: 0.5}, {40: 2.0}, {1: 1.0, 4: 1.0}]
        self._assert_same(
            plain.query_batch(dense_queries=q, top_k=10),
            sharded.query_batch(dense_queries=q, top_k=10),
        )
        self._assert_same(
            plain.query_batch(sparse_queries=qs, top_k=8),
            sharded.query_batch(sparse_queries=qs, top_k=8),
        )
        self._assert_same(
            plain.query_batch(dense_queries=q, sparse_queries=qs, top_k=6),
            sharded.query_batch(dense_queries=q, sparse_queries=qs, top_k=6),
        )

    def test_filter_and_delete_parity(self, mesh):
        plain, sharded = self._stores(mesh)
        for store in (plain, sharded):
            store.delete([f"r{i}" for i in range(0, 50)])
        rng = np.random.default_rng(9)
        q = rng.normal(size=(2, 16)).astype(np.float32)
        filt = {"topic": 3}
        res_p = plain.query_batch(dense_queries=q, top_k=10, filter=filt)
        res_s = sharded.query_batch(dense_queries=q, top_k=10, filter=filt)
        self._assert_same(res_p, res_s)
        for hits in res_s:
            assert hits and all(h.metadata["topic"] == 3 for h in hits)
            assert all(int(h.id[1:]) >= 50 for h in hits)

    def test_index_query_parity(self, mesh):
        """VerbatimIndex.query end to end: sharded 8-device store ==
        single-device store (the VERDICT.md round-1 'done' criterion)."""
        from verbatim_rag_tpu.engine.embedding_providers import (
            HashedBowDenseProvider,
            HashedSparseProvider,
        )
        from verbatim_rag_tpu.engine.index import VerbatimIndex

        # Tied raw scores make top-k order ambiguous (rank ties resolve
        # differently across merge strategies, exactly as across Milvus
        # segment counts), so parity is asserted on tie-free data: every doc
        # carries the query terms with a unique multiplicity, making all
        # dense/sparse scores strictly distinct.
        words = [f"w{j}" for j in range(400)]
        doc_rng = np.random.default_rng(21)
        docs = [
            {
                "content": f"Paragraph {i}: "
                           + "solar " * (i + 1)
                           + "wind " * ((i * 7) % 40 + 1)
                           + " ".join(doc_rng.choice(words, size=12, replace=False)),
                "title": f"d{i}",
            }
            for i in range(40)
        ]
        def build(mesh_arg):
            idx = VerbatimIndex(
                dense_provider=HashedBowDenseProvider(dim=64),
                sparse_provider=HashedSparseProvider(vocab_size=128),
                mesh=mesh_arg,
            )
            idx.store.block = 64
            idx.add_documents(list(docs))
            return idx

        plain, sharded = build(None), build(mesh)
        for question in ("solar panel efficiency", "wind turbine storage"):
            hits_p = plain.query(question, k=5)
            hits_s = sharded.query(question, k=5)
            # Chunk ids are fresh uuids per build — compare content + scores.
            assert [h.text for h in hits_p] == [h.text for h in hits_s]
            np.testing.assert_allclose(
                [h.score for h in hits_p], [h.score for h in hits_s],
                rtol=1e-4, atol=1e-5,
            )

    def test_3way_fused_hybrid_parity(self, mesh):
        """dense+sparse+full_text on a mesh store rides the sharded 3-way
        fused program (ft_arm of sharded_hybrid_topk); it must rank like
        the single-device 3-way fused program."""
        from verbatim_rag_tpu.engine.store import DeviceVectorStore

        def build(mesh_arg):
            store = DeviceVectorStore(
                dense_dim=16, sparse_vocab=64, sparse_max_nnz=8, block=64,
                projection_dim=32, rescore_depth=512,
                enable_full_text=True, full_text_vocab=256,
                full_text_max_nnz=16, mesh=mesh_arg,
            )
            rng = np.random.default_rng(11)
            store.add_vectors(
                [
                    {
                        "id": f"d{i}",
                        "text": "solar " * (i % 7 + 1) + f"grid unique{i} "
                        + "turbine " * (i // 7 + 1),
                        "dense": rng.normal(size=16).astype(np.float32),
                        "sparse": {int(i % 60) + 1: 1.0 + 0.01 * i},
                    }
                    for i in range(64)
                ]
            )
            store.flush()
            return store

        plain, sharded = build(None), build(mesh)
        rng = np.random.default_rng(12)
        q = rng.normal(size=(2, 16)).astype(np.float32)
        qs = [{3: 1.0, 9: 0.5}, {40: 2.0, 5: 0.1}]
        texts = ["solar grid", "turbine unique3"]
        weights = {"dense": 0.4, "sparse": 0.3, "full_text": 0.3}
        res_p = plain.query_batch(
            dense_queries=q, sparse_queries=qs, text_queries=texts,
            hybrid_weights=weights, top_k=6,
        )
        res_s = sharded.query_batch(
            dense_queries=q, sparse_queries=qs, text_queries=texts,
            hybrid_weights=weights, top_k=6,
        )
        # RRF produces exact score ties (docs appearing in a single arm at
        # the same rank score identically); tie members may permute between
        # the single-device and merged orderings — compare scores exactly
        # and ids per tie GROUP.
        for hits_p, hits_s in zip(res_p, res_s):
            np.testing.assert_allclose(
                [h.score for h in hits_p], [h.score for h in hits_s],
                rtol=1e-5, atol=1e-7,
            )
            groups_p, groups_s = {}, {}
            for h in hits_p:
                groups_p.setdefault(round(h.score, 6), set()).add(h.id)
            for h in hits_s:
                groups_s.setdefault(round(h.score, 6), set()).add(h.id)
            assert groups_p.keys() == groups_s.keys()
            for score, ids_p in groups_p.items():
                ids_s = groups_s[score]
                assert len(ids_p) == len(ids_s)
                if len(ids_p) == 1:
                    assert ids_p == ids_s, f"non-tied rank differs at {score}"

    def test_full_text_parity(self, mesh):
        from verbatim_rag_tpu.engine.store import DeviceVectorStore

        def build(mesh_arg):
            store = DeviceVectorStore(
                dense_dim=None, sparse_vocab=None, enable_full_text=True,
                full_text_vocab=256, full_text_max_nnz=16, block=64,
                projection_dim=32, rescore_depth=512, mesh=mesh_arg,
            )
            # Unique (solar_tf, storage_tf) per doc — tied BM25 scores make
            # top-k order ambiguous across merge strategies.
            store.add_vectors(
                [
                    {
                        "id": f"d{i}",
                        "text": "solar " * (i % 9 + 1)
                        + f"panel grid w{i} "
                        + "storage " * (i // 9 + 1),
                    }
                    for i in range(80)
                ]
            )
            store.flush()
            return store

        plain, sharded = build(None), build(mesh)
        for query in ("solar storage", "panel w3"):
            hp = plain.query_batch(text_queries=[query], top_k=6)[0]
            hs = sharded.query_batch(text_queries=[query], top_k=6)[0]
            np.testing.assert_allclose(
                [h.score for h in hp], [h.score for h in hs], rtol=1e-4, atol=1e-5
            )
            # Exact ties (symmetric term-count docs score identically under
            # BM25) may permute within a tie group, and a group truncated at
            # top_k may keep DIFFERENT members on each side — both answers
            # are correct. Validate against the full tie sets instead: every
            # returned group must be the same size on both sides and a
            # subset of the corpus-wide tie group at that score.
            full = {}
            for h in plain.query_batch(text_queries=[query], top_k=80)[0]:
                full.setdefault(round(h.score, 4), set()).add(h.id)
            groups_p, groups_s = {}, {}
            for h in hp:
                groups_p.setdefault(round(h.score, 4), set()).add(h.id)
            for h in hs:
                groups_s.setdefault(round(h.score, 4), set()).add(h.id)
            assert groups_p.keys() == groups_s.keys()
            for score, ids_p in groups_p.items():
                ids_s = groups_s[score]
                assert len(ids_p) == len(ids_s)
                assert ids_p <= full[score] and ids_s <= full[score]


class TestMeshStoreLifecycle:
    """Lifecycle ops under a mesh (VERDICT r2 weak #5): delete→compact
    rebuild, reserve(), auto-compact, and save→load(mesh) round-trips must
    all preserve parity with the single-device store."""

    _records = TestMeshStore._records
    _stores = TestMeshStore._stores
    _assert_same = staticmethod(TestMeshStore._assert_same)

    def test_delete_compact_query_parity(self, mesh):
        plain, sharded = self._stores(mesh)
        dead = [f"r{i}" for i in range(0, 120, 2)]
        for store in (plain, sharded):
            store.delete(dead)
            assert store.compact() == len(dead)
            assert len(store._ids) == 300 - len(dead)
        assert sharded.mesh is mesh  # rebuild kept the mesh placement
        rng = np.random.default_rng(13)
        q = rng.normal(size=(3, 16)).astype(np.float32)
        qs = [{3: 1.0, 9: 0.5}, {40: 2.0}, {1: 1.0, 4: 1.0}]
        res_p = plain.query_batch(dense_queries=q, sparse_queries=qs, top_k=8)
        res_s = sharded.query_batch(dense_queries=q, sparse_queries=qs, top_k=8)
        self._assert_same(res_p, res_s)
        for hits in res_s:
            assert all(int(h.id[1:]) % 2 == 1 or int(h.id[1:]) >= 120 for h in hits)

    def test_compact_int8_modes_parity(self, mesh):
        plain, sharded = self._stores(mesh, dense_dtype="int8", sketch_dtype="int8")
        for store in (plain, sharded):
            store.delete([f"r{i}" for i in range(50)])
            assert store.compact() == 50
        rng = np.random.default_rng(17)
        q = rng.normal(size=(2, 16)).astype(np.float32)
        self._assert_same(
            plain.query_batch(dense_queries=q, top_k=8),
            sharded.query_batch(dense_queries=q, top_k=8),
        )

    def test_reserve_on_mesh(self, mesh):
        from verbatim_rag_tpu.engine.store import DeviceVectorStore

        common = dict(
            dense_dim=16, sparse_vocab=64, sparse_max_nnz=8, block=64,
            projection_dim=32, rescore_depth=512,
        )
        plain = DeviceVectorStore(**common)
        sharded = DeviceVectorStore(mesh=mesh, **common)
        records = self._records()
        for store in (plain, sharded):
            store.reserve(512)
            assert store._capacity == 512
            store.add_vectors([dict(r) for r in records])
            store.flush()
            assert store._capacity == 512  # no growth copies during ingest
        rng = np.random.default_rng(19)
        q = rng.normal(size=(2, 16)).astype(np.float32)
        self._assert_same(
            plain.query_batch(dense_queries=q, top_k=10),
            sharded.query_batch(dense_queries=q, top_k=10),
        )

    def test_auto_compact_under_mesh(self, mesh):
        from verbatim_rag_tpu.engine.store import DeviceVectorStore

        store = DeviceVectorStore(
            mesh=mesh, dense_dim=16, sparse_vocab=64, sparse_max_nnz=8,
            block=64, projection_dim=32, auto_compact_threshold=0.3,
        )
        store.add_vectors(self._records(n=200))
        store.flush()
        store.delete([f"r{i}" for i in range(100)])
        store.flush()
        assert len(store._ids) == 100  # threshold crossed → auto rebuild
        hits = store.query_batch(
            dense_queries=np.random.default_rng(23).normal(size=(1, 16)).astype(np.float32),
            top_k=5,
        )[0]
        assert hits and all(int(h.id[1:]) >= 100 for h in hits)

    @pytest.mark.parametrize("modes", [{}, {"dense_dtype": "int8", "sketch_dtype": "int8"}])
    def test_save_then_load_onto_mesh(self, mesh, tmp_path, modes):
        """Persistence is placement-free: save from a sharded store, load
        onto a mesh AND onto a single device — all three agree."""
        from verbatim_rag_tpu.engine.store import DeviceVectorStore

        _, sharded = self._stores(mesh, **modes)
        path = str(tmp_path / "idx")
        sharded.save(path)
        back_mesh = DeviceVectorStore.load(path, mesh=mesh)
        back_single = DeviceVectorStore.load(path)
        assert back_mesh.mesh is mesh and back_single.mesh is None
        rng = np.random.default_rng(29)
        q = rng.normal(size=(2, 16)).astype(np.float32)
        qs = [{3: 1.0, 9: 0.5}, {40: 2.0}]
        want = sharded.query_batch(dense_queries=q, sparse_queries=qs, top_k=8)
        self._assert_same(want, back_mesh.query_batch(dense_queries=q, sparse_queries=qs, top_k=8))
        self._assert_same(want, back_single.query_batch(dense_queries=q, sparse_queries=qs, top_k=8))


class TestMeshDeviceHandoff:
    """Array-pair query payloads (the encode→search device handoff) through
    the mesh-sharded store must match both the plain store and the dict
    payload path."""

    def test_hybrid_array_queries_parity(self, mesh):
        import jax.numpy as jnp

        from verbatim_rag_tpu.engine.store import _pad_sparse

        helper = TestMeshStore()
        plain, sharded = helper._stores(mesh)
        rng = np.random.default_rng(5)
        q = rng.normal(size=(3, 16)).astype(np.float32)
        qs = [{3: 1.0, 9: 0.5}, {40: 2.0, 5: 0.1}, {1: 1.0, 2: 1.0, 4: 1.0}]
        m = 4
        ids = np.zeros((3, m), np.int32)
        w = np.zeros((3, m), np.float32)
        for i, row in enumerate(qs):
            ids[i], w[i] = _pad_sparse(row, m)
        TestMeshStore._assert_same(
            plain.query_batch(dense_queries=q, sparse_queries=qs, top_k=6),
            sharded.query_batch(
                dense_queries=jnp.asarray(q),
                sparse_queries=(jnp.asarray(ids), jnp.asarray(w)),
                top_k=6,
            ),
        )


class TestFilteredShardCandidates:
    def test_filter_matching_one_row_returns_only_it(self, mesh):
        """A filter leaving shards with fewer live rows than the candidate
        depth must yield NO phantom rows: missing (-1) candidates carry
        NEG_INF exact scores through the rescore and the offset globalize
        (`exact_rescore_device` masks cand<0; `idx+offset` is guarded)."""
        import numpy as np

        from verbatim_rag_tpu.engine.store import DeviceVectorStore

        store = DeviceVectorStore(
            dense_dim=8, sparse_vocab=64, sparse_max_nnz=4, block=16, mesh=mesh
        )
        recs = []
        for i in range(32):
            v = np.zeros(8, np.float32)
            v[i % 8] = 1.0
            recs.append(
                {
                    "id": f"c{i}", "text": f"t{i}",
                    "metadata": {"document_id": f"d{i}"},
                    "dense": v, "sparse": {i % 64: 1.0, (i + 3) % 64: 0.5},
                }
            )
        store.add_vectors(recs)
        store.flush()
        hits = store.query(
            sparse_query={30 % 64: 1.0}, filter={"document_id": "d30"}, top_k=5
        )
        assert [h.id for h in hits] == ["c30"]
        hits = store.query(
            dense_query=np.eye(8, dtype=np.float32)[30 % 8],
            sparse_query={30 % 64: 1.0},
            filter={"document_id": "d30"},
            top_k=5,
        )
        assert [h.id for h in hits] == ["c30"]


class TestDistributedGuards:
    def test_batch_slice_rejects_non_divisible(self, monkeypatch):
        import jax

        from verbatim_rag_tpu.parallel import distributed

        monkeypatch.setattr(jax, "process_count", lambda: 4)
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        with pytest.raises(ValueError, match="divide evenly"):
            distributed.process_local_batch_slice(10)
        assert distributed.process_local_batch_slice(12) == slice(3, 6)


class TestShardedSection:
    """Mesh-sharded section-kernel hybrid (sharded_hybrid_section_topk) vs
    the single-device section program on the SAME table semantics: shards
    are block_cols multiples, so the single-device bucket table is exactly
    the concatenation of the per-shard tables (with row offsets) — at
    depth ≥ table width and exact table select the two programs rank the
    identical candidate union and must return the same rows."""

    def _data(self, n=2048, d=32, dp=64, m=8, b=4, qm=4):
        rng = np.random.default_rng(11)
        dense = rng.normal(size=(n, d)).astype(np.float32)
        dense /= np.linalg.norm(dense, axis=1, keepdims=True)
        sketch = rng.normal(size=(n, dp)).astype(np.float32)
        sp_ids = rng.integers(1, 500, size=(n, m)).astype(np.int32)
        sp_w = rng.random(size=(n, m)).astype(np.float32)
        dq = rng.normal(size=(b, d)).astype(np.float32)
        dq /= np.linalg.norm(dq, axis=1, keepdims=True)
        sq = rng.normal(size=(b, dp)).astype(np.float32)
        q_ids = rng.integers(1, 500, size=(b, qm)).astype(np.int32)
        q_w = rng.random(size=(b, qm)).astype(np.float32)
        mask = np.ones(n, bool)
        mask[::13] = False
        return dense, sketch, sp_ids, sp_w, dq, sq, q_ids, q_w, mask

    def test_matches_single_device_section(self, mesh):
        from verbatim_rag_tpu.ops.section import hybrid_section_topk
        from verbatim_rag_tpu.parallel.sharded_search import (
            sharded_hybrid_section_topk,
        )

        dense, sketch, sp_ids, sp_w, dq, sq, q_ids, q_w, mask = self._data()
        n = dense.shape[0]
        bc = 256
        depth = (n // bc) * 128  # full table width: both paths rescore
        # every bucket winner, so the candidate unions are identical
        k, fetch_k = 6, 16

        single = hybrid_section_topk(
            jnp.asarray(dense.T), jnp.asarray(sketch.T),
            jnp.asarray(sp_ids), jnp.asarray(sp_w),
            jnp.asarray(dq), jnp.asarray(sq), jnp.asarray(q_ids),
            jnp.asarray(q_w), k=k, fetch_k=fetch_k, depth=depth,
            mask=jnp.asarray(mask), rescore_impl="oneshot",
            table_select="exact", block_cols=bc, dot_chunk=bc, q_block=8,
            interpret=True,
        )

        col = lambda x: jax.device_put(
            jnp.asarray(x),
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, ("dp", "tp"))
            ),
        )
        sharded = sharded_hybrid_section_topk(
            col(dense.T), col(sketch.T),
            shard_rows(jnp.asarray(sp_ids), mesh),
            shard_rows(jnp.asarray(sp_w), mesh),
            replicate(jnp.asarray(dq), mesh), replicate(jnp.asarray(sq), mesh),
            replicate(jnp.asarray(q_ids), mesh), replicate(jnp.asarray(q_w), mesh),
            k=k, fetch_k=fetch_k, depth=depth,
            mask=shard_rows(jnp.asarray(mask), mesh), mesh=mesh,
            rescore_impl="oneshot", table_select="exact",
            block_cols=bc, interpret=True,
        )

        s_scores, s_rows = np.asarray(single[0]), np.asarray(single[1])
        m_scores, m_rows = np.asarray(sharded[0]), np.asarray(sharded[1])
        np.testing.assert_allclose(m_scores, s_scores, rtol=1e-5)
        np.testing.assert_array_equal(m_rows, s_rows)

    def test_three_way_full_text_arm(self, mesh):
        """3-way (dense + SPLADE + BM25) mesh section program vs the
        single-device hybrid_section_topk_3way at full-table depth."""
        from verbatim_rag_tpu.ops.section import hybrid_section_topk_3way
        from verbatim_rag_tpu.parallel.sharded_search import (
            sharded_hybrid_section_topk,
        )

        dense, sketch, sp_ids, sp_w, dq, sq, q_ids, q_w, mask = self._data()
        rng = np.random.default_rng(12)
        n, dp = dense.shape[0], sketch.shape[1]
        b, fm, fqm = dq.shape[0], 8, 4
        ft_sketch = rng.normal(size=(n, dp)).astype(np.float32)
        ft_ids = rng.integers(1, 300, size=(n, fm)).astype(np.int32)
        ft_w = rng.random(size=(n, fm)).astype(np.float32)
        ft_qproj = rng.normal(size=(b, dp)).astype(np.float32)
        ft_qids = rng.integers(1, 300, size=(b, fqm)).astype(np.int32)
        ft_qw = rng.random(size=(b, fqm)).astype(np.float32)
        bc = 256
        depth = (n // bc) * 128
        k, fetch_k = 6, 16

        single = hybrid_section_topk_3way(
            jnp.asarray(dense.T), jnp.asarray(sketch.T),
            jnp.asarray(sp_ids), jnp.asarray(sp_w),
            jnp.asarray(ft_sketch.T), jnp.asarray(ft_ids), jnp.asarray(ft_w),
            jnp.asarray(dq), jnp.asarray(sq),
            jnp.asarray(q_ids), jnp.asarray(q_w),
            jnp.asarray(ft_qproj), jnp.asarray(ft_qids), jnp.asarray(ft_qw),
            k=k, fetch_k=fetch_k, depth=depth, mask=jnp.asarray(mask),
            rescore_impl="oneshot", table_select="exact",
            block_cols=bc, dot_chunk=bc, q_block=8, interpret=True,
        )

        col = lambda x: jax.device_put(
            jnp.asarray(x),
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, ("dp", "tp"))
            ),
        )
        ft_arm = (
            col(ft_sketch.T),
            shard_rows(jnp.asarray(ft_ids), mesh),
            shard_rows(jnp.asarray(ft_w), mesh),
            replicate(jnp.asarray(ft_qproj), mesh),
            replicate(jnp.asarray(ft_qids), mesh),
            replicate(jnp.asarray(ft_qw), mesh),
            1.0,
            None,
        )
        sharded = sharded_hybrid_section_topk(
            col(dense.T), col(sketch.T),
            shard_rows(jnp.asarray(sp_ids), mesh),
            shard_rows(jnp.asarray(sp_w), mesh),
            replicate(jnp.asarray(dq), mesh), replicate(jnp.asarray(sq), mesh),
            replicate(jnp.asarray(q_ids), mesh), replicate(jnp.asarray(q_w), mesh),
            k=k, fetch_k=fetch_k, depth=depth,
            mask=shard_rows(jnp.asarray(mask), mesh), mesh=mesh,
            dense_weight=1.0, sparse_weight=1.0,
            rescore_impl="oneshot", table_select="exact",
            ft_arm=ft_arm, block_cols=bc, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(sharded[0]), np.asarray(single[0]), rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(sharded[1]), np.asarray(single[1]))


class TestMeshSectionStore:
    """DeviceVectorStore(mesh=..., candidate_impl='section'): hybrid queries
    ride the per-shard section kernel (interpret mode forced via env) and
    agree with the single-device section store on the same corpus. The live
    rows land in shard 0's first block, so both stores build the identical
    bucket structure over the populated region."""

    def _store(self, mesh, rng, records, **kwargs):
        from verbatim_rag_tpu.engine.store import DeviceVectorStore

        block = 8192 if mesh is None else mesh.size * 8192
        s = DeviceVectorStore(
            dense_dim=16, sparse_vocab=64, sparse_max_nnz=8, block=block,
            projection_dim=32, candidate_impl="section", mesh=mesh, **kwargs,
        )
        s.add_vectors([dict(r) for r in records])
        s.flush()
        return s

    def test_mesh_store_section_parity(self, mesh, monkeypatch):
        monkeypatch.setenv("VERBATIM_SECTION_INTERPRET", "1")
        rng = np.random.default_rng(11)
        records = TestMeshStore._records(TestMeshStore(), n=200)
        plain = self._store(None, rng, records)
        sharded = self._store(mesh, rng, records)
        assert sharded.candidate_impl == "section"

        import verbatim_rag_tpu.parallel.sharded_search as ss

        calls = {"n": 0}
        real = ss.sharded_hybrid_section_topk

        def spy(*a, **kw):
            calls["n"] += 1
            return real(*a, **kw)

        monkeypatch.setattr(ss, "sharded_hybrid_section_topk", spy)

        q = rng.normal(size=(2, 16)).astype(np.float32)
        qs = [{3: 1.0, 9: 0.5}, {40: 2.0, 5: 0.1}]
        r_plain = plain.query_batch(dense_queries=q, sparse_queries=qs, top_k=6)
        r_mesh = sharded.query_batch(dense_queries=q, sparse_queries=qs, top_k=6)
        assert calls["n"] == 1, "mesh store must dispatch the sharded section program"
        for hits_p, hits_m in zip(r_plain, r_mesh):
            assert hits_p and hits_m
            assert hits_p[0].id == hits_m[0].id
            overlap = len({h.id for h in hits_p} & {h.id for h in hits_m})
            assert overlap >= 4, (hits_p, hits_m)

    def test_mesh_store_exact_request_falls_back(self, mesh, monkeypatch):
        """approx_topk=False on a mesh section store serves through the XLA
        sharded program (same exactness contract as single-device)."""
        monkeypatch.setenv("VERBATIM_SECTION_INTERPRET", "1")
        rng = np.random.default_rng(11)
        records = TestMeshStore._records(TestMeshStore(), n=64)
        store = self._store(mesh, rng, records, approx_topk=False)

        import verbatim_rag_tpu.parallel.sharded_search as ss

        def boom(*a, **kw):  # pragma: no cover - must not be reached
            raise AssertionError("exact request must not ride the bucket table")

        monkeypatch.setattr(ss, "sharded_hybrid_section_topk", boom)
        q = rng.normal(size=(1, 16)).astype(np.float32)
        out = store.query_batch(dense_queries=q, sparse_queries=[{3: 1.0}], top_k=4)
        assert out and out[0]
