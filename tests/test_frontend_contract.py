"""Scripted UI session against the live server — browser-free.

No browser binary or JS engine exists in this image, so the reference's
browser-driven flow (query → stream → highlight-click → doc-jump) is
verified at the protocol layer: this test drives the EXACT HTTP/NDJSON
sequence `frontend/index.html`'s script performs, re-implements its two
load-bearing client computations (offset span slicing in `renderDocument`,
citation→mark id resolution in `flashHighlight`), and asserts the
invariants the DOM rendering depends on. A wire-shape or offset regression
that would break the UI breaks this test.
"""

import json

import pytest

pytest.importorskip("jax")
pytest.importorskip("aiohttp")

from tests.test_api import KeywordExtractor  # reuse the deterministic extractor
from verbatim_rag_tpu.api import dependencies as deps
from verbatim_rag_tpu.api.app import create_app
from verbatim_rag_tpu.core.templates import TemplateManager
from verbatim_rag_tpu.engine.embedding_providers import HashedBowDenseProvider
from verbatim_rag_tpu.engine.index import VerbatimIndex
from verbatim_rag_tpu.rag.core import VerbatimRAG


@pytest.fixture()
def app():
    deps.reset()
    index = VerbatimIndex(dense_provider=HashedBowDenseProvider(dim=64))
    index.add_documents(
        [
            {
                "content": "Solar panels convert sunlight into electricity. "
                "They power homes and satellites.",
                "title": "Solar",
            },
            {
                "content": "Wind turbines capture kinetic energy. "
                "Solar panels convert sunlight into electricity.",
                "title": "Wind+Solar",
            },
        ]
    )
    rag = VerbatimRAG(
        index,
        extractor=KeywordExtractor(),
        template_manager=TemplateManager(llm_client=None, default_mode="static"),
    )
    deps.set_rag(rag)
    from pathlib import Path

    frontend = Path(__file__).resolve().parent.parent / "frontend"
    yield create_app(static_dir=str(frontend))
    deps.reset()


async def _session(app):
    from aiohttp.test_utils import TestClient, TestServer

    client = TestClient(TestServer(app))
    await client.start_server()
    return client


class TestScriptedUISession:
    async def test_full_session_query_stream_highlight_jump(self, app):
        client = await _session(app)
        try:
            # -- page load: markup served, then the browser pulls the
            #    stylesheet and the ES-module graph (src/main.js imports the
            #    component modules) — each must come back 200 with a
            #    JS/CSS content type or the module load fails silently.
            page = await client.get("/index.html")
            assert page.status == 200
            html = await page.text()
            assert 'id="view-facts"' in html
            assert 'type="module" src="src/main.js"' in html
            css = await client.get("/styles.css")
            assert css.status == 200 and "css" in css.content_type
            for mod in ("src/main.js", "src/api.js", "src/state.js",
                        "src/components/chat.js", "src/components/facts.js",
                        "src/components/documents.js",
                        "src/components/options.js",
                        "src/components/statusbar.js"):
                r = await client.get(f"/{mod}")
                assert r.status == 200, mod
                assert "javascript" in r.content_type, (mod, r.content_type)
            facts_src = await (await client.get("/src/components/facts.js")).text()
            assert "renderFactsView" in facts_src

            # -- boot sequence: the script fires /api/status + /api/documents
            status = await (await client.get("/api/status")).json()
            assert status["status"] == "ok" and status["num_documents"] == 2
            corpus = await (await client.get("/api/documents")).json()
            assert [d["title"] for d in corpus["documents"]] == ["Solar", "Wind+Solar"]

            # -- submit(): POST /api/query/stream, consume NDJSON like the JS
            resp = await client.post(
                "/api/query/stream",
                json={"question": "how do solar panels work", "k": 2},
            )
            assert resp.status == 200
            events = [
                json.loads(ln)
                for ln in (await resp.text()).splitlines()
                if ln.strip()
            ]
            types = [e["type"] for e in events]
            # Stage order the progress bar keys off (streaming.py staged events).
            assert types[0] == "documents" and types[-1] == "answer"
            assert "highlights" in types
            prog = [e for e in events if e["type"] == "progress"]
            assert prog and all(
                ("elapsed_ms" in e) or ("elapsed_ms" in e.get("data", {})) for e in prog
            )

            final = events[-1]["data"]
            answer, docs = final["answer"], final["documents"]
            citations = final["structured_answer"]["citations"]
            assert docs and citations

            # -- renderDocument invariant: every highlight slices cleanly and
            #    the <mark> text equals the span text (verbatim provenance).
            for d in docs:
                for h in d.get("highlights", []):
                    assert 0 <= h["start"] < h["end"] <= len(d["content"])
                    assert d["content"][h["start"] : h["end"]] == h["text"]

            # -- citation chips: every [n] in the answer resolves to a citation
            import re

            for n in {int(m) for m in re.findall(r"\[(\d+)\]", answer)}:
                assert any(c["number"] == n for c in citations), f"[{n}] dangling"

            # -- flashHighlight (highlight-click → doc-jump): each citation's
            #    (doc_index, highlight_index) must address a real mark target.
            for c in citations:
                d = docs[c["doc_index"]]
                h = d["highlights"][c["highlight_index"]]
                assert h["text"] == c["text"]  # the jump lands on the cited span

            # -- facts view: the card list the fact-click path iterates.
            assert all(c["text"] in docs[c["doc_index"]]["content"] for c in citations)

            # -- citation-click → span-flash: renderDocument emits one mark
            #    per highlight with id `hl-{answer}-{doc}-{idx}`; clicking a
            #    [n] chip calls flashHighlight which getElementById's that
            #    exact id. Re-build the emitted id set and assert every
            #    citation's flash target exists (a drifting id scheme on
            #    either side would break the flash silently).
            answer_idx = 0
            mark_ids = {
                f"hl-{answer_idx}-{di}-{hi}"
                for di, d in enumerate(docs)
                for hi in range(len(d.get("highlights", [])))
            }
            for c in citations:
                target = f"hl-{answer_idx}-{c['doc_index']}-{c['highlight_index']}"
                assert target in mark_ids, f"flash target {target} unrendered"
        finally:
            await client.close()

    async def test_options_panel_template_mode_and_search_type(self, app):
        """The ⚙ panel's template-mode and search-type selects ride the
        wire end to end (per-query override, graceful fallback, 400 on a
        typo'd search_type)."""
        client = await _session(app)
        try:
            t = await (await client.get("/api/templates")).json()
            assert t["current_mode"] == "static"
            assert "random" in t["available_modes"]

            q = {"question": "how do solar panels work", "k": 2}
            r1 = await (await client.post("/api/query", json=q)).json()
            assert r1["answer"].startswith("## Response")  # static default

            r2 = await (
                await client.post("/api/query", json={**q, "template_mode": "random"})
            ).json()
            assert r2["answer"] and not r2["answer"].startswith("## Response")

            # Unknown template mode falls back to the default — never a 500.
            r3 = await (
                await client.post("/api/query", json={**q, "template_mode": "nope"})
            ).json()
            assert r3["answer"].startswith("## Response")

            r4 = await client.post("/api/query", json={**q, "search_type": "dense"})
            assert r4.status == 200

            r5 = await client.post("/api/query", json={**q, "search_type": "cosine"})
            assert r5.status == 400
            assert "search_type" in (await r5.json())["detail"]

            # The stream route accepts the same knobs (template override
            # visible in the final answer event) and 400s BEFORE streaming.
            r6 = await client.post(
                "/api/query/stream",
                json={**q, "template_mode": "random", "search_type": "dense"},
            )
            assert r6.status == 200
            events = [
                json.loads(ln) for ln in (await r6.text()).splitlines() if ln.strip()
            ]
            assert events[-1]["type"] == "answer"
            assert not events[-1]["data"]["answer"].startswith("## Response")

            r7 = await client.post(
                "/api/query/stream", json={**q, "search_type": "fuzzy"}
            )
            assert r7.status == 400
        finally:
            await client.close()

    async def test_error_path_feeds_retry_ux(self, app):
        """failAssistantMessage shows resp detail: a 400 must carry a JSON
        `detail` the catch block can display next to the Retry button."""
        client = await _session(app)
        try:
            resp = await client.post("/api/query/stream", json={"question": ""})
            assert resp.status == 400
            assert "detail" in await resp.json()
        finally:
            await client.close()

    async def test_multi_question_session_keeps_answer_history(self, app):
        """The UI keeps one state.answers entry per query; both answers'
        documents must stay valid after the second stream completes."""
        client = await _session(app)
        try:
            finals = []
            for q in ("how do solar panels work", "what about wind turbines"):
                resp = await client.post("/api/query/stream", json={"question": q})
                events = [
                    json.loads(ln)
                    for ln in (await resp.text()).splitlines()
                    if ln.strip()
                ]
                finals.append(events[-1]["data"])
            for final in finals:
                for d in final["documents"]:
                    for h in d.get("highlights", []):
                        assert d["content"][h["start"] : h["end"]] == h["text"]
        finally:
            await client.close()


class TestOptionsPanelContract:
    async def test_full_options_body_streams(self, app):
        """The exact body shape queryOptions() builds — search_type, filter
        string, hybrid_weights, rrf_k — must stream successfully."""
        client = await _session(app)
        try:
            resp = await client.post(
                "/api/query/stream",
                json={
                    "question": "how do solar panels work",
                    "k": 2,
                    "search_type": "dense",
                    "filter": 'title == "Solar"',
                    "rrf_k": 30,
                },
            )
            assert resp.status == 200
            events = [
                json.loads(ln)
                for ln in (await resp.text()).splitlines()
                if ln.strip()
            ]
            assert events[0]["type"] == "documents"
            docs = events[0]["data"]["documents"]
            assert docs and all(d["title"] == "Solar" for d in docs)
            assert events[-1]["type"] == "answer"
        finally:
            await client.close()

    async def test_bad_filter_from_options_panel_is_400(self, app):
        client = await _session(app)
        try:
            resp = await client.post(
                "/api/query/stream",
                json={"question": "x", "filter": "title ~~ broken"},
            )
            assert resp.status == 400
        finally:
            await client.close()
