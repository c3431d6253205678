"""CLI round trips: index build → save → query; template management."""

import json

import pytest

pytest.importorskip("jax")

from verbatim_rag_tpu.rag.cli import main as rag_cli
from verbatim_rag_tpu.core.cli import main as enhance_cli


class TestRagCli:
    def test_index_then_query(self, tmp_path, capsys):
        docs = tmp_path / "docs"
        docs.mkdir()
        (docs / "solar.md").write_text(
            "# Solar\n\nSolar panels convert sunlight into electricity.\n"
        )
        (docs / "pasta.md").write_text("# Pasta\n\nBoil water and add salt.\n")
        db = str(tmp_path / "idx")

        assert rag_cli(["index", str(docs), "--db", db, "--sparse"]) == 0
        out = capsys.readouterr().out
        assert "Indexed 2 documents" in out

        json_out = str(tmp_path / "resp.json")
        assert (
            rag_cli(
                ["query", "how do solar panels work", "--db", db, "--json", json_out]
            )
            == 0
        )
        with open(json_out) as f:
            response = json.load(f)
        assert response["question"] == "how do solar panels work"
        assert response["answer"]

    def test_template_set_and_show(self, tmp_path, capsys):
        path = str(tmp_path / "templates.json")
        assert rag_cli(["template", "--templates", path, "--set-static",
                        "Custom: [DISPLAY_SPANS]"]) == 0
        assert rag_cli(["template", "--templates", path, "--show"]) == 0
        out = capsys.readouterr().out
        assert "static" in out


class TestEnhanceCli:
    def test_jsonl_roundtrip(self, tmp_path, capsys, monkeypatch):
        from unittest.mock import MagicMock

        import verbatim_rag_tpu.core.cli as cli_mod

        records = tmp_path / "in.jsonl"
        records.write_text(
            json.dumps(
                {
                    "question": "what was found?",
                    "context": [{"content": "The study found X improves Y."}],
                }
            )
            + "\n"
        )
        out_path = tmp_path / "out.jsonl"

        # Patch the transform to avoid network: static template + substring extractor.
        from verbatim_rag_tpu.core.templates import TemplateManager
        from verbatim_rag_tpu.core.transform import VerbatimTransform

        extractor = MagicMock()
        extractor.extract_spans.return_value = {
            "The study found X improves Y.": ["The study found X improves Y."]
        }
        vt = VerbatimTransform(
            llm_client=MagicMock(),
            extractor=extractor,
            template_manager=TemplateManager(llm_client=None, default_mode="static"),
        )
        monkeypatch.setattr(cli_mod, "VerbatimTransform", lambda **kw: vt)

        assert enhance_cli([str(records), "-o", str(out_path)]) == 0
        lines = out_path.read_text().strip().splitlines()
        assert len(lines) == 1
        response = json.loads(lines[0])
        assert "The study found X improves Y." in response["answer"]
