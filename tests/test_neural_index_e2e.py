"""Neural providers through the full index: encode → device store → hybrid."""

import pytest

pytest.importorskip("jax")

from verbatim_rag_tpu.engine.index import VerbatimIndex
from verbatim_rag_tpu.models.config import tiny_test_config
from verbatim_rag_tpu.models.providers import JaxDenseProvider, JaxSpladeProvider

DOCS = [
    {"content": "Solar panels convert sunlight into electricity.", "title": "Solar"},
    {"content": "Wind turbines convert wind into electricity.", "title": "Wind"},
    {"content": "Pasta is cooked in boiling salted water.", "title": "Pasta"},
]


@pytest.fixture(scope="module")
def index():
    config = tiny_test_config()
    idx = VerbatimIndex(
        dense_provider=JaxDenseProvider(config=config, max_length=64),
        sparse_provider=JaxSpladeProvider(config=config, max_length=64, max_nnz=16),
    )
    idx.add_documents(DOCS)
    return idx


class TestSparseArrayFastPath:
    def test_array_and_dict_ingest_agree(self):
        """The provider→store array fast path (no per-chunk dict round-trip)
        must index the same forward rows as the dict path: identical query
        results with identical exact scores."""
        config = tiny_test_config()
        sparse = JaxSpladeProvider(config=config, max_length=64, max_nnz=16)

        fast = VerbatimIndex(sparse_provider=sparse)
        assert fast.store.accepts_sparse_arrays
        fast.add_documents(DOCS)

        slow = VerbatimIndex(sparse_provider=sparse)
        slow.store.accepts_sparse_arrays = False  # force the dict path
        slow.add_documents(DOCS)

        for q in ("solar electricity", "wind turbines", "boiling pasta"):
            hf = fast.query(q, k=3, search_type="sparse")
            hs = slow.query(q, k=3, search_type="sparse")
            assert [h.text for h in hf] == [h.text for h in hs]
            assert [h.score for h in hf] == pytest.approx(
                [h.score for h in hs], abs=1e-6
            )

    def test_mesh_int8_sketch_fast_path_integration(self):
        """Everything at once through the facade: neural providers feeding
        the array fast path into a mesh-sharded, int8-sketch store — results
        must match the plain bf16 single-device index (same provider seed)."""
        from verbatim_rag_tpu.parallel.mesh import make_mesh

        config = tiny_test_config()

        def build(**kw):
            idx = VerbatimIndex(
                dense_provider=JaxDenseProvider(config=config, max_length=64),
                sparse_provider=JaxSpladeProvider(
                    config=config, max_length=64, max_nnz=16
                ),
                **kw,
            )
            idx.add_documents(DOCS)
            return idx

        plain = build()
        sharded = build(mesh=make_mesh(dp=4, tp=2), sketch_dtype="int8")
        for q in ("solar electricity", "wind turbines"):
            hp = plain.query(q, k=3)
            hs = sharded.query(q, k=3)
            assert [h.text for h in hp] == [h.text for h in hs]

    def test_provider_arrays_match_dicts(self):
        config = tiny_test_config()
        sparse = JaxSpladeProvider(config=config, max_length=64, max_nnz=16)
        texts = [d["content"] for d in DOCS] + [""]
        ids, w = sparse.embed_batch_arrays(texts)
        dicts = sparse.embed_batch(texts)
        assert ids.shape == (len(texts), 16) and w.shape == ids.shape
        for row_ids, row_w, d in zip(ids, w, dicts):
            got = {int(t): float(x) for t, x in zip(row_ids, row_w) if x > 0.0}
            assert got == pytest.approx(d)
            # pad slots are sanitized to id 0
            assert (row_ids[row_w == 0.0] == 0).all()


class TestNeuralEndToEnd:
    def test_hybrid_query_runs(self, index):
        hits = index.query("solar electricity", k=2)
        assert len(hits) == 2
        assert all(h.text for h in hits)

    def test_deterministic_self_retrieval(self, index):
        """A chunk's own enhanced text must retrieve that chunk first (dense)."""
        chunks = index.get_all_chunks()
        target = chunks[0]
        hits = index.query(target.enhanced_text, k=1, search_type="dense")
        assert hits[0].id == target.id

    def test_sparse_path_with_neural_terms(self, index):
        hits = index.query("wind turbines", k=3, search_type="sparse")
        assert hits

    def test_full_rag_loop(self, index):
        from verbatim_rag_tpu.core.templates import TemplateManager
        from verbatim_rag_tpu.models.highlighter import ModelSpanExtractor
        from verbatim_rag_tpu.models.tokenizer import HashTokenizer
        from verbatim_rag_tpu.rag.core import VerbatimRAG

        config = tiny_test_config(max_position_embeddings=256)
        rag = VerbatimRAG(
            index,
            extractor=ModelSpanExtractor(
                config=config,
                tokenizer=HashTokenizer(vocab_size=config.vocab_size),
                threshold=0.0,
                min_span_chars=5,
                max_length=128,
                doc_stride=16,
            ),
            template_manager=TemplateManager(llm_client=None, default_mode="static"),
        )
        response = rag.query("how do solar panels work?")
        assert response.answer
        for doc in response.documents:
            for h in doc.highlights:
                assert doc.content[h.start : h.end] == h.text


class TestMultiQuestionBatching:
    def test_extract_spans_multi_matches_per_question(self, index):
        from verbatim_rag_tpu.models.config import tiny_test_config
        from verbatim_rag_tpu.models.highlighter import ModelSpanExtractor
        from verbatim_rag_tpu.models.tokenizer import HashTokenizer

        config = tiny_test_config(max_position_embeddings=256)
        extractor = ModelSpanExtractor(
            config=config,
            tokenizer=HashTokenizer(vocab_size=config.vocab_size),
            threshold=0.3,
            min_span_chars=5,
            max_length=128,
            doc_stride=16,
        )
        q1_results = index.query("solar electricity", k=2)
        q2_results = index.query("pasta cooking", k=2)

        multi = extractor.extract_spans_multi(
            [("solar?", q1_results), ("pasta?", q2_results)]
        )
        single_1 = extractor.extract_spans("solar?", q1_results)
        single_2 = extractor.extract_spans("pasta?", q2_results)
        assert multi[0] == single_1
        assert multi[1] == single_2

    def test_rag_query_batch_uses_multi(self, index):
        from verbatim_rag_tpu.core.templates import TemplateManager
        from verbatim_rag_tpu.models.config import tiny_test_config
        from verbatim_rag_tpu.models.highlighter import ModelSpanExtractor
        from verbatim_rag_tpu.models.tokenizer import HashTokenizer
        from verbatim_rag_tpu.rag.core import VerbatimRAG

        config = tiny_test_config(max_position_embeddings=256)
        rag = VerbatimRAG(
            index,
            extractor=ModelSpanExtractor(
                config=config,
                tokenizer=HashTokenizer(vocab_size=config.vocab_size),
                threshold=0.0,
                min_span_chars=5,
                max_length=128,
                doc_stride=16,
            ),
            template_manager=TemplateManager(llm_client=None, default_mode="static"),
        )
        responses = rag.query_batch(["solar?", "wind power?"], k=2)
        assert len(responses) == 2
        for r in responses:
            for d in r.documents:
                for h in d.highlights:
                    assert d.content[h.start : h.end] == h.text
