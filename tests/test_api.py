"""API service: route contract + NDJSON streaming (aiohttp test client)."""

import json

import pytest

pytest.importorskip("jax")
aiohttp = pytest.importorskip("aiohttp")

from verbatim_rag_tpu.api import dependencies as deps
from verbatim_rag_tpu.api.app import create_app
from verbatim_rag_tpu.core.templates import TemplateManager
from verbatim_rag_tpu.engine.embedding_providers import HashedBowDenseProvider
from verbatim_rag_tpu.engine.index import VerbatimIndex
from verbatim_rag_tpu.rag.core import VerbatimRAG


class KeywordExtractor:
    def extract_spans(self, question, search_results):
        out = {}
        for r in search_results:
            text = getattr(r, "text", "")
            out[text] = ["Solar panels convert sunlight into electricity."] if (
                "Solar panels convert sunlight into electricity." in text
            ) else []
        return out

    async def extract_spans_async(self, question, search_results):
        return self.extract_spans(question, search_results)


@pytest.fixture()
def client_factory():
    deps.reset()
    index = VerbatimIndex(dense_provider=HashedBowDenseProvider(dim=64))
    index.add_documents(
        [
            {
                "content": "Solar panels convert sunlight into electricity. "
                "They power homes and satellites.",
                "title": "Solar",
            }
        ]
    )
    rag = VerbatimRAG(
        index,
        extractor=KeywordExtractor(),
        template_manager=TemplateManager(llm_client=None, default_mode="static"),
    )
    deps.set_rag(rag)
    yield lambda loop=None: create_app()
    deps.reset()


async def _request(app, method, path, json_body=None):
    from aiohttp.test_utils import TestClient, TestServer

    async with TestClient(TestServer(app)) as client:
        resp = await client.request(method, path, json=json_body)
        body = await resp.text()
        return resp.status, body, resp.headers


class TestRoutes:
    async def test_status(self, client_factory):
        status, body, _ = await _request(client_factory(), "GET", "/api/status")
        assert status == 200
        data = json.loads(body)
        assert data["status"] == "ok"
        assert data["num_chunks"] >= 1

    async def test_documents(self, client_factory):
        status, body, _ = await _request(client_factory(), "GET", "/api/documents")
        assert status == 200
        assert json.loads(body)["documents"][0]["title"] == "Solar"

    async def test_templates(self, client_factory):
        status, body, _ = await _request(client_factory(), "GET", "/api/templates")
        assert json.loads(body)["current_mode"] == "static"

    async def test_debug_trace_gated_and_brackets(self, client_factory, monkeypatch, tmp_path):
        """/api/debug/trace: 403 without API_DEBUG_TRACE=1; with it, a
        start/stop bracket returns a logdir (module wall may be null on
        backends without the xplane parser)."""
        app = client_factory()
        status, _, _ = await _request(
            app, "POST", "/api/debug/trace", {"action": "start"}
        )
        assert status == 403

        monkeypatch.setenv("API_DEBUG_TRACE", "1")
        status, body, _ = await _request(
            app, "POST", "/api/debug/trace",
            {"action": "start", "logdir": str(tmp_path / "tr")},
        )
        assert status == 200 and json.loads(body)["status"] == "tracing"
        status, body, _ = await _request(
            app, "POST", "/api/debug/trace", {"action": "stop"}
        )
        assert status == 200
        stopped = json.loads(body)
        assert stopped["status"] == "stopped" and stopped["logdir"]
        status, _, _ = await _request(
            app, "POST", "/api/debug/trace", {"action": "bogus"}
        )
        assert status == 400

    async def test_query(self, client_factory):
        status, body, _ = await _request(
            client_factory(), "POST", "/api/query", {"question": "how do panels work"}
        )
        assert status == 200
        data = json.loads(body)
        assert "Solar panels convert sunlight" in data["answer"]
        assert data["structured_answer"]["citations"]

    async def test_query_validation(self, client_factory):
        status, _, _ = await _request(client_factory(), "POST", "/api/query", {"question": ""})
        assert status == 400
        status, _, _ = await _request(
            client_factory(), "POST", "/api/query", {"question": "x" * 2000}
        )
        assert status == 400

    async def test_query_search_params_forwarded(self, client_factory):
        """Per-query engine knobs (rescore_depth/approx_topk) ride the wire
        to the store on every route (reference forwards search_params;
        VERDICT round-1 weak #7)."""
        payload = {
            "question": "how do panels work",
            "search_params": {"approx_topk": False, "rescore_depth": 32},
        }
        status, body, _ = await _request(client_factory(), "POST", "/api/query", payload)
        assert status == 200
        assert "Solar panels convert sunlight" in json.loads(body)["answer"]
        status, _, _ = await _request(
            client_factory(), "POST", "/api/query/async", payload
        )
        assert status == 200
        status, body, _ = await _request(
            client_factory(), "POST", "/api/query/stream", payload
        )
        assert status == 200
        types = [json.loads(ln)["type"] for ln in body.splitlines() if ln.strip()]
        assert types[-1] == "answer"

    async def test_query_string_filter(self, client_factory):
        """Milvus filter-string syntax rides the wire (reference parity:
        `index.py:734-739` emits 'document_id == "..."' strings)."""
        status, body, _ = await _request(
            client_factory(),
            "POST",
            "/api/query",
            {"question": "how do panels work", "filter": 'title == "Solar"'},
        )
        assert status == 200
        assert "Solar panels convert sunlight" in json.loads(body)["answer"]

    async def test_query_bad_filter_string_is_400(self, client_factory):
        status, body, _ = await _request(
            client_factory(),
            "POST",
            "/api/query",
            {"question": "how do panels work", "filter": 'title === "Solar"'},
        )
        assert status == 400
        assert "filter" in json.loads(body)["detail"]

    async def test_stream_bad_filter_string_is_400(self, client_factory):
        """A bad filter must fail BEFORE the stream starts — same 400 as the
        non-streaming routes, not a mid-stream error event."""
        status, body, _ = await _request(
            client_factory(),
            "POST",
            "/api/query/stream",
            {"question": "how do panels work", "filter": 'title === "Solar"'},
        )
        assert status == 400
        assert "filter" in json.loads(body)["detail"]

    async def test_query_async_alias(self, client_factory):
        status, body, _ = await _request(
            client_factory(), "POST", "/api/query/async", {"question": "panels?"}
        )
        assert status == 200

    async def test_stream_ndjson_stages(self, client_factory):
        status, body, headers = await _request(
            client_factory(), "POST", "/api/query/stream", {"question": "how do panels work"}
        )
        assert status == 200
        assert headers["Content-Type"].startswith("application/x-ndjson")
        events = [json.loads(line) for line in body.strip().splitlines()]
        types = [e["type"] for e in events]
        assert types == ["documents", "progress", "highlights", "answer"]
        assert events[-1]["done"] is True

    async def test_cors_headers(self, client_factory):
        _, _, headers = await _request(client_factory(), "GET", "/api/status")
        assert "Access-Control-Allow-Origin" in headers


class TestVerbatimDoc:
    def test_process_document(self, client_factory):
        from verbatim_rag_tpu.rag.verbatim_doc import VerbatimDOC

        rag = deps.get_rag()
        doc = (
            "# Report\n\n## Energy\n\n"
            "Summary: [!query=how do solar panels work|format=bullet]\n"
        )
        result = VerbatimDOC(rag).process(doc)
        assert "[!query=" not in result.document
        assert "Solar panels convert sunlight" in result.document
        assert result.citations
        assert result.citations[0]["number"] == 1

    def test_parser_params(self):
        from verbatim_rag_tpu.rag.verbatim_doc import Parser

        doc = "x [!query=what results|format=short,max_length=100,flag=true] y"
        [q] = Parser.parse(doc)
        assert q.text == "what results"
        assert q.params == {"format": "short", "max_length": 100, "flag": True}

    def test_section_context(self):
        from verbatim_rag_tpu.rag.verbatim_doc import Parser

        doc = "## Methods\n\n[!query=describe approach]"
        [q] = Parser.parse(doc)
        assert q.section == "Methods"


class TestAPIService:
    async def test_validation_and_query(self, client_factory):
        from verbatim_rag_tpu.api.service import APIService, ValidationError

        service = APIService(deps.get_rag(), max_question_length=50)
        with pytest.raises(ValidationError):
            service.validate_question("")
        with pytest.raises(ValidationError):
            service.validate_question("x" * 51)
        result = await service.query("how do panels work")
        assert "Solar panels convert sunlight" in result["answer"]

    def test_health_check(self, client_factory):
        from verbatim_rag_tpu.api.service import APIService

        health = APIService(deps.get_rag()).health_check()
        assert health["status"] == "ok"
        assert health["num_chunks"] >= 1


class TestCorsDetails:
    async def test_error_responses_carry_cors(self, client_factory):
        # 404 (unknown route) must still carry CORS headers or browsers
        # mask the real status from JS clients.
        status, _, headers = await _request(client_factory(), "GET", "/api/nope")
        assert status == 404
        assert "Access-Control-Allow-Origin" in headers

    async def test_origin_echoed_when_allowlisted(self, client_factory):
        from aiohttp.test_utils import TestClient, TestServer

        from verbatim_rag_tpu.api import dependencies as deps

        config = deps.get_config()
        old = config.cors_origins
        config.cors_origins = ["http://a.example", "http://b.example"]
        try:
            async with TestClient(TestServer(client_factory())) as client:
                resp = await client.request(
                    "GET", "/api/status", headers={"Origin": "http://b.example"}
                )
                assert (
                    resp.headers["Access-Control-Allow-Origin"] == "http://b.example"
                )
        finally:
            config.cors_origins = old


class TestStreamTimings:
    async def test_answer_event_carries_stage_breakdown(self, client_factory):
        import json as _json

        status, body, _ = await _request(
            client_factory(), "POST", "/api/query/stream", {"question": "solar?"}
        )
        assert status == 200
        events = [_json.loads(line) for line in body.strip().splitlines()]
        final = events[-1]
        assert final["type"] == "answer" and final["done"]
        stages = [t["stage"] for t in final.get("timings", [])]
        assert "retrieve" in stages and "extract" in stages and "template" in stages


class TestMicroBatching:
    """Concurrent /api/query requests coalesce into one batched dispatch."""

    async def test_concurrent_requests_batch_into_one_call(self, client_factory):
        import asyncio as aio

        from aiohttp.test_utils import TestClient, TestServer

        from verbatim_rag_tpu.api import dependencies as deps

        rag = deps.get_rag()
        calls = []
        original = rag.query_batch

        def counting(questions, **kwargs):
            calls.append(list(questions))
            return original(questions, **kwargs)

        rag.query_batch = counting
        try:
            async with TestClient(TestServer(client_factory())) as client:
                async def ask(q):
                    resp = await client.post("/api/query", json={"question": q, "k": 2})
                    assert resp.status == 200
                    return await resp.json()

                answers = await aio.gather(*[ask(f"solar question {i}") for i in range(6)])
            # All six went through query_batch, in few (ideally one) batches.
            assert sum(len(c) for c in calls) == 6
            assert len(calls) <= 2
            for i, ans in enumerate(answers):
                assert ans["question"] == f"solar question {i}"
        finally:
            rag.query_batch = original

    async def test_different_params_do_not_mix(self, client_factory):
        import asyncio as aio

        from aiohttp.test_utils import TestClient, TestServer

        from verbatim_rag_tpu.api import dependencies as deps

        rag = deps.get_rag()
        calls = []
        original = rag.query_batch

        def counting(questions, **kwargs):
            calls.append((list(questions), kwargs.get("k")))
            return original(questions, **kwargs)

        rag.query_batch = counting
        try:
            async with TestClient(TestServer(client_factory())) as client:
                a, b = await aio.gather(
                    client.post("/api/query", json={"question": "about solar", "k": 1}),
                    client.post("/api/query", json={"question": "about wind", "k": 3}),
                )
                assert a.status == 200 and b.status == 200
            ks = sorted(k for _qs, k in calls)
            assert ks == [1, 3]  # two separate batches — params differ
        finally:
            rag.query_batch = original

    async def test_batch_error_propagates_to_every_request(self, client_factory):
        import asyncio as aio

        from aiohttp.test_utils import TestClient, TestServer

        from verbatim_rag_tpu.api import dependencies as deps

        rag = deps.get_rag()
        original = rag.query_batch

        def boom(questions, **kwargs):
            raise RuntimeError("device on fire")

        rag.query_batch = boom
        try:
            async with TestClient(TestServer(client_factory())) as client:
                responses = await aio.gather(
                    *[client.post("/api/query", json={"question": f"q{i}"}) for i in range(3)]
                )
                assert all(r.status == 500 for r in responses)
        finally:
            rag.query_batch = original

    async def test_status_reports_batching_stats(self, client_factory):
        from aiohttp.test_utils import TestClient, TestServer

        async with TestClient(TestServer(client_factory())) as client:
            await client.post("/api/query", json={"question": "warm"})
            status = await (await client.get("/api/status")).json()
        assert status["micro_batching"]["requests"] >= 1


class TestBatcherWorkerDeath:
    async def test_dead_worker_does_not_strand_later_submits(self):
        import asyncio as aio

        from verbatim_rag_tpu.api.batching import MicroBatcher

        class Hard(BaseException):  # not an Exception — escapes _run_one
            pass

        calls = {"n": 0}

        def run_batch(questions, params):
            calls["n"] += 1
            if calls["n"] == 1:
                raise Hard
            return [q for q in questions]

        b = MicroBatcher(run_batch, max_batch=4, max_wait_ms=2)
        with pytest.raises(BaseException):
            await aio.wait_for(b.submit("first", {"k": 1}), timeout=5)
        # Worker died — but deregistered, so a later submit spawns a new one.
        result = await aio.wait_for(b.submit("second", {"k": 1}), timeout=5)
        assert result == "second"


class TestReviewRound3ApiFixes:
    """Regressions for the round-3 extraction/serving-layer review."""

    async def test_stream_response_carries_cors_headers(self, client_factory):
        """CORS must be on the NDJSON stream's ACTUAL headers — the
        middleware's post-handler update is a no-op once the stream is
        prepared, so a cross-origin frontend would block the body."""
        from aiohttp.test_utils import TestClient, TestServer

        async with TestClient(TestServer(client_factory())) as client:
            resp = await client.post(
                "/api/query/stream",
                json={"question": "how do panels work"},
                headers={"Origin": "https://example.com"},
            )
            assert resp.status == 200
            assert resp.headers.get("Access-Control-Allow-Origin") == "*"
            await resp.text()

    async def test_transform_empty_context_text_is_not_500(self, client_factory):
        status, body, _ = await _request(
            client_factory(),
            "POST",
            "/api/transform/verbatim",
            {"question": "x", "context": [""]},
        )
        assert status == 200, body

    def test_transform_pipeline_is_cached(self, client_factory):
        from verbatim_rag_tpu.api import app as app_mod

        client_factory()
        app_mod._transform_cache = None
        first = app_mod._get_transform()
        second = app_mod._get_transform()
        assert first is second

    def test_cors_origins_env_strips_whitespace(self, monkeypatch):
        from verbatim_rag_tpu.api.config import APIConfig

        monkeypatch.setenv("CORS_ORIGINS", "https://a.com, https://b.com")
        cfg = APIConfig.from_env()
        assert cfg.cors_origins == ["https://a.com", "https://b.com"]
