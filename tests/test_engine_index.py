"""VerbatimIndex end-to-end: ingest → hybrid retrieve → browse."""

import pytest

pytest.importorskip("jax")

from verbatim_rag_tpu.engine.embedding_providers import (
    HashedBowDenseProvider,
    HashedSparseProvider,
)
from verbatim_rag_tpu.engine.index import VerbatimIndex
from verbatim_rag_tpu.ingestion.schema import DocumentSchema

DOCS = [
    DocumentSchema(
        content=(
            "# Solar Power\n\nSolar panels convert sunlight into electricity. "
            "Photovoltaic cells are the core technology of solar panels."
        ),
        title="Solar",
        source="solar.md",
        topic="energy",
    ),
    DocumentSchema(
        content=(
            "# Wind Power\n\nWind turbines convert kinetic wind energy into "
            "electricity using large rotating blades."
        ),
        title="Wind",
        source="wind.md",
        topic="energy",
    ),
    DocumentSchema(
        content=(
            "# Pasta Cooking\n\nBoil water with salt, add pasta, and cook until "
            "al dente. Drain and serve with sauce."
        ),
        title="Pasta",
        source="pasta.md",
        topic="cooking",
    ),
]


@pytest.fixture(scope="module")
def index():
    idx = VerbatimIndex(
        dense_provider=HashedBowDenseProvider(dim=128),
        sparse_provider=HashedSparseProvider(vocab_size=1024),
    )
    idx.add_documents(DOCS)
    return idx


class TestIngestAndQuery:
    def test_inspect(self, index):
        stats = index.inspect()
        assert stats["num_documents"] == 3
        assert stats["num_chunks"] >= 3
        assert stats["dense"] and stats["sparse"]

    def test_hybrid_query_finds_relevant_doc(self, index):
        hits = index.query("solar panels sunlight electricity", k=2)
        assert "solar" in hits[0].text.lower()

    def test_dense_only(self, index):
        hits = index.query("wind turbines blades", k=2, search_type="dense")
        assert "wind" in hits[0].text.lower()

    def test_sparse_only(self, index):
        hits = index.query("pasta al dente sauce", k=2, search_type="sparse")
        assert "pasta" in hits[0].text.lower()

    def test_filter_by_metadata(self, index):
        hits = index.query("electricity", k=5, filter={"topic": "cooking"})
        assert all(h.metadata["topic"] == "cooking" for h in hits)

    def test_filter_only_browse(self, index):
        hits = index.query_batch(None, k=10, filter={"topic": "energy"})
        assert all(h.metadata["topic"] == "energy" for h in hits[0])
        assert len(hits[0]) >= 2

    def test_enhanced_text_carries_context(self, index):
        hits = index.query("solar panels", k=1)
        assert "Document: Solar" in hits[0].enhanced_text
        assert hits[0].text in DOCS[0].content  # raw text is a verbatim slice

    def test_get_chunks_by_document(self, index):
        doc_id = index.get_all_documents()[0]["id"]
        chunks = index.get_chunks_by_document(doc_id)
        assert chunks
        assert all(c.metadata["document_id"] == doc_id for c in chunks)

    def test_hybrid_weights(self, index):
        hits = index.query(
            "solar panels", k=2, hybrid_weights={"dense": 0.3, "sparse": 0.7}
        )
        assert hits


class TestBulkIngest:
    def test_bulk_matches_perdoc(self):
        idx = VerbatimIndex(dense_provider=HashedBowDenseProvider(dim=64))
        idx.add_documents_bulk(iter(DOCS), chunk_batch_size=2, doc_batch_size=2)
        assert idx.inspect()["num_documents"] == 3
        hits = idx.query("wind turbines", k=1)
        assert "wind" in hits[0].text.lower()

    def test_delete_document(self):
        idx = VerbatimIndex(dense_provider=HashedBowDenseProvider(dim=64))
        ids = idx.add_documents(DOCS)
        idx.delete_document(ids[0])
        assert idx.inspect()["num_documents"] == 2
        hits = idx.query("solar panels sunlight", k=3)
        assert all(h.metadata["document_id"] != ids[0] for h in hits)


class TestProviderIdentity:
    """ADVICE round 1 (high): an index must reload into the SAME vector
    space — provider identity is persisted and reconstructed."""

    def test_save_load_roundtrip_reconstructs_providers(self, tmp_path):
        from verbatim_rag_tpu.engine.embedding_providers import (
            HashedBowDenseProvider,
            HashedSparseProvider,
        )
        from verbatim_rag_tpu.engine.index import VerbatimIndex

        idx = VerbatimIndex(
            dense_provider=HashedBowDenseProvider(dim=48),
            sparse_provider=HashedSparseProvider(vocab_size=96),
        )
        idx.add_documents([{"content": "solar panels convert sunlight", "title": "t"}])
        path = str(tmp_path / "idx")
        idx.save(path)

        loaded = VerbatimIndex.load(path)
        assert type(loaded.dense_provider).__name__ == "HashedBowDenseProvider"
        assert loaded.dense_provider.dim == 48
        assert type(loaded.sparse_provider).__name__ == "HashedSparseProvider"
        assert loaded.sparse_provider.vocab_size == 96
        # Same vector space → the query reproduces the original results.
        a = idx.query("solar panels", k=1)
        b = loaded.query("solar panels", k=1)
        assert a and b and a[0].id == b[0].id and abs(a[0].score - b[0].score) < 1e-5

    def test_jax_provider_identity_roundtrip(self, tmp_path):
        pytest.importorskip("jax")
        from verbatim_rag_tpu.engine.embedding_providers import provider_from_config
        from verbatim_rag_tpu.models.config import tiny_test_config
        from verbatim_rag_tpu.models.providers import JaxDenseProvider

        provider = JaxDenseProvider(config=tiny_test_config(), seed=3)
        rebuilt = provider_from_config(provider.describe())
        import numpy as np

        np.testing.assert_allclose(
            provider.embed_batch(["hello world"]),
            rebuilt.embed_batch(["hello world"]),
            rtol=1e-5,
        )

    def test_adhoc_params_refuse_reconstruction(self):
        pytest.importorskip("jax")
        from verbatim_rag_tpu.engine.embedding_providers import provider_from_config
        from verbatim_rag_tpu.models.config import tiny_test_config
        from verbatim_rag_tpu.models.providers import JaxDenseProvider
        import jax

        from verbatim_rag_tpu.models.encoder import init_encoder_params

        cfg = tiny_test_config()
        provider = JaxDenseProvider(
            params=init_encoder_params(jax.random.PRNGKey(9), cfg), config=cfg
        )
        ident = provider.describe()
        assert ident["reconstructible"] is False
        with pytest.raises(ValueError, match="cannot be reconstructed"):
            provider_from_config(ident)

    def test_legacy_index_without_identity_warns_and_falls_back(self, tmp_path, caplog):
        import logging
        import os

        from verbatim_rag_tpu.engine.embedding_providers import HashedBowDenseProvider
        from verbatim_rag_tpu.engine.index import VerbatimIndex

        idx = VerbatimIndex(dense_provider=HashedBowDenseProvider(dim=32))
        idx.add_documents([{"content": "wind turbines", "title": "t"}])
        path = str(tmp_path / "legacy")
        idx.save(path)
        os.remove(path + ".providers.json")  # simulate a round-1 save

        with caplog.at_level(logging.WARNING):
            loaded = VerbatimIndex.load(path)
        assert "no provider identity" in caplog.text
        assert loaded.dense_provider.dim == 32


class TestSearchParams:
    def test_rescore_depth_and_approx_forwarded(self):
        from verbatim_rag_tpu.engine.embedding_providers import (
            HashedBowDenseProvider,
            HashedSparseProvider,
        )
        from verbatim_rag_tpu.engine.index import VerbatimIndex

        idx = VerbatimIndex(
            dense_provider=HashedBowDenseProvider(dim=32),
            sparse_provider=HashedSparseProvider(vocab_size=64),
        )
        idx.add_documents(
            [{"content": f"doc about {w}", "title": w} for w in ("sun", "wind", "sea")]
        )
        base = idx.query("sun", k=2)
        tuned = idx.query(
            "sun", k=2, search_params={"rescore_depth": 4, "approx_topk": False}
        )
        assert [h.id for h in base] == [h.id for h in tuned]

    def test_unknown_search_params_warn_not_crash(self, caplog):
        import logging

        from verbatim_rag_tpu.engine.embedding_providers import HashedBowDenseProvider
        from verbatim_rag_tpu.engine.index import VerbatimIndex

        idx = VerbatimIndex(dense_provider=HashedBowDenseProvider(dim=32))
        idx.add_documents([{"content": "solar", "title": "t"}])
        with caplog.at_level(logging.WARNING):
            hits = idx.query("solar", k=1, search_params={"nprobe": 7})
        assert hits
        assert "nprobe" in caplog.text


class TestDeviceHandoff:
    """Encode→search device handoff: JAX providers return device arrays and
    the index passes them to the store with no host materialization; results
    must match the legacy host path exactly."""

    @staticmethod
    def _jax_index():
        pytest.importorskip("jax")
        from verbatim_rag_tpu.engine.index import VerbatimIndex
        from verbatim_rag_tpu.models.config import tiny_test_config
        from verbatim_rag_tpu.models.providers import (
            JaxDenseProvider,
            JaxSpladeProvider,
        )

        cfg = tiny_test_config()
        idx = VerbatimIndex(
            dense_provider=JaxDenseProvider(config=cfg, seed=1, batch_size=4),
            sparse_provider=JaxSpladeProvider(
                config=cfg, seed=2, batch_size=4, max_nnz=8
            ),
        )
        idx.add_documents(
            [
                {"content": "solar panels convert sunlight", "title": "solar"},
                {"content": "wind turbines spin in the breeze", "title": "wind"},
                {"content": "rivers carve deltas to the sea", "title": "rivers"},
            ]
        )
        return idx

    def test_provider_device_methods_match_host(self):
        import numpy as np

        idx = self._jax_index()
        texts = ["sunlight on panels", "turbine blades", "estuary"]
        np.testing.assert_allclose(
            np.asarray(idx.dense_provider.embed_batch_device(texts)),
            idx.dense_provider.embed_batch(texts),
            rtol=1e-5,
            atol=1e-6,
        )
        ids_d, w_d = idx.sparse_provider.embed_query_arrays_device(texts)
        ids_h, w_h = idx.sparse_provider.embed_batch_arrays(texts)
        np.testing.assert_array_equal(np.asarray(ids_d), ids_h)
        np.testing.assert_allclose(np.asarray(w_d), w_h, rtol=1e-5, atol=1e-6)

    def test_query_results_match_host_path(self, monkeypatch):
        idx = self._jax_index()
        queries = ["what converts sunlight?", "spinning blades"]
        dev = idx.query_batch(queries, k=3)
        monkeypatch.setenv("VERBATIM_DEVICE_HANDOFF", "0")
        host = idx.query_batch(queries, k=3)
        assert [[(h.id, round(h.score, 5)) for h in hits] for hits in dev] == [
            [(h.id, round(h.score, 5)) for h in hits] for hits in host
        ]

    def test_single_query_uses_handoff(self):
        idx = self._jax_index()
        hits = idx.query("sunlight", k=2)
        assert hits and all(h.score != 0 for h in hits)


class TestDocsJsonSafety:
    def test_save_with_non_json_metadata_survives(self, tmp_path):
        """Document metadata with datetime/enum/set must not crash docs.json
        (the store had already been written — a crash there leaves partial
        state on disk)."""
        import datetime
        import enum

        class Kind(enum.Enum):
            REPORT = "report"

        idx = VerbatimIndex(
            dense_provider=HashedBowDenseProvider(dim=64),
            sparse_provider=None,
        )
        idx.add_documents(
            [
                DocumentSchema(
                    content="# T\n\nSome content body for chunking purposes.",
                    title="T",
                    source="t.md",
                    created=datetime.datetime(2026, 8, 17, 12, 0, 0),
                    kind=Kind.REPORT,
                    tags={"a", "b"},
                )
            ]
        )
        path = str(tmp_path / "idx")
        idx.save(path)
        import json as _json

        with open(path + ".docs.json") as f:
            docs = _json.load(f)
        assert docs  # round-trips as plain JSON


class TestMetadataShadowing:
    def test_user_document_id_cannot_orphan_chunks(self):
        """User metadata carrying its own 'document_id' must not shadow the
        system identity — shadowed ids made chunks undeletable orphans."""
        idx = VerbatimIndex(dense_provider=HashedBowDenseProvider(dim=64))
        idx.add_documents(
            [
                DocumentSchema(
                    content="# T\n\nBody content for the chunker to work with.",
                    title="T",
                    source="t.md",
                    document_id="ext-123",  # upstream system's own id field
                )
            ]
        )
        doc_id = next(iter(idx.documents))
        chunks = idx.get_chunks_by_document(doc_id)
        assert chunks, "chunks must be keyed by the Document uuid"
        # The user's value survives in the doc-level metadata.
        assert idx.documents[doc_id]["metadata"]["document_id"] == "ext-123"
        idx.delete_document(doc_id)
        assert idx.get_chunks_by_document(doc_id) == []


class TestExplicitHybridValidation:
    def test_hybrid_search_type_without_sparse_raises(self):
        idx = VerbatimIndex(dense_provider=HashedBowDenseProvider(dim=64))
        idx.add_documents(
            [DocumentSchema(content="# A\n\nSome chunkable body.", title="A")]
        )
        with pytest.raises(ValueError, match="sparse"):
            idx.query("anything", search_type="hybrid")

    def test_hybrid_weights_naming_missing_method_raises(self):
        idx = VerbatimIndex(dense_provider=HashedBowDenseProvider(dim=64))
        idx.add_documents(
            [DocumentSchema(content="# A\n\nSome chunkable body.", title="A")]
        )
        with pytest.raises(ValueError, match="full_text"):
            idx.query("anything", hybrid_weights={"dense": 0.5, "full_text": 0.5})

    def test_auto_resolution_still_degrades_gracefully(self):
        # No explicit request: a dense-only index auto-resolves to dense.
        idx = VerbatimIndex(dense_provider=HashedBowDenseProvider(dim=64))
        idx.add_documents(
            [DocumentSchema(content="# A\n\nSome chunkable body here.", title="A")]
        )
        assert idx.query("body") is not None


def test_int8_tier_facade_resolves_section_kernel():
    """The facade's dtype tier rides through to the store's
    candidate_impl='auto' policy: an int8/int8 index gets the
    whole-section kernel, the bf16 default stays on the XLA program
    (benchmarks/RESULTS.md round-4 composition A/B)."""
    idx8 = VerbatimIndex(
        dense_provider=HashedBowDenseProvider(dim=64),
        dense_dtype="int8",
        sketch_dtype="int8",
    )
    assert idx8.store.candidate_impl == "section"
    idx16 = VerbatimIndex(dense_provider=HashedBowDenseProvider(dim=64))
    assert idx16.store.candidate_impl == "xla"
