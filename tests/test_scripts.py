"""Operational scripts: resume semantics and provider-identity loading."""

import json
import os
import subprocess
import sys

import pytest

pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "PYTHONPATH": REPO,
}


def _run(args, cwd, input_text=None):
    return subprocess.run(
        [sys.executable, *args],
        cwd=cwd,
        env=ENV,
        input=input_text,
        capture_output=True,
        text=True,
        timeout=240,
    )


class TestProcessCorpusResume:
    def test_second_run_appends_instead_of_overwriting(self, tmp_path):
        """An interrupted ingest must RESUME: run once over half the corpus,
        then again over the full corpus — the first half's chunks must
        survive (previously the second run rebuilt an empty index and the
        final save destroyed them)."""
        corpus = tmp_path / "corpus"
        corpus.mkdir()
        (corpus / "a.md").write_text("# A\n\nAlpha document body text for chunking.")
        db = str(tmp_path / "idx")
        status = str(tmp_path / "status.json")
        script = os.path.join(REPO, "scripts", "process_corpus.py")

        r1 = _run([script, str(corpus), "--db", db, "--status-file", status], tmp_path)
        assert r1.returncode == 0, r1.stderr

        (corpus / "b.md").write_text("# B\n\nBeta document body text for chunking.")
        r2 = _run([script, str(corpus), "--db", db, "--status-file", status], tmp_path)
        assert r2.returncode == 0, r2.stderr
        assert "resuming into existing index" in r2.stdout

        from verbatim_rag_tpu.engine.index import VerbatimIndex

        idx = VerbatimIndex.load(db)
        titles = {d["title"] for d in idx.get_all_documents()}
        assert titles == {"a.md", "b.md"}  # a.md survived the second run
        st = json.loads(open(status).read())
        assert len(st["done"]) == 2


class TestQueryIndexProviderIdentity:
    def test_repl_uses_persisted_providers(self, tmp_path):
        from verbatim_rag_tpu.engine.embedding_providers import HashedBowDenseProvider
        from verbatim_rag_tpu.engine.index import VerbatimIndex
        from verbatim_rag_tpu.ingestion.schema import DocumentSchema

        db = str(tmp_path / "idx")
        idx = VerbatimIndex(dense_provider=HashedBowDenseProvider(dim=64), db_path=db)
        idx.add_documents(
            [DocumentSchema(content="# S\n\nSolar panels convert sunlight.", title="S")]
        )
        idx.save(db)

        script = os.path.join(REPO, "scripts", "query_index.py")
        r = _run([script, "--db", db], tmp_path, input_text="solar panels\n")
        assert r.returncode == 0, r.stderr
        assert "Solar panels convert sunlight" in r.stdout
