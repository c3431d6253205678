"""LLMClient over a mocked httpx transport (parity with reference tests/test_llm_client.py)."""

import json

import httpx
import pytest

from verbatim_rag_tpu.core.llm_client import LLMClient


def _chat_response(content: str) -> dict:
    return {"choices": [{"message": {"role": "assistant", "content": content}}]}


def make_client(responder) -> LLMClient:
    """LLMClient whose HTTP layer is a httpx MockTransport."""
    client = LLMClient(model="test-model", api_key="test-key")
    transport = httpx.MockTransport(responder)
    client._client = httpx.Client(transport=transport)
    client._async_client = httpx.AsyncClient(transport=transport)
    return client


class TestComplete:
    def test_basic_completion_and_auth_header(self):
        seen = {}

        def responder(request: httpx.Request) -> httpx.Response:
            seen["auth"] = request.headers["authorization"]
            seen["payload"] = json.loads(request.content)
            return httpx.Response(200, json=_chat_response("hello"))

        client = make_client(responder)
        assert client.complete("hi") == "hello"
        assert seen["auth"] == "Bearer test-key"
        assert seen["payload"]["model"] == "test-model"

    def test_json_mode_request_shape(self):
        seen = {}

        def responder(request):
            seen["payload"] = json.loads(request.content)
            return httpx.Response(200, json=_chat_response("{}"))

        make_client(responder).complete("hi", json_mode=True)
        assert seen["payload"]["response_format"] == {"type": "json_object"}

    def test_temperature_override(self):
        seen = {}

        def responder(request):
            seen["payload"] = json.loads(request.content)
            return httpx.Response(200, json=_chat_response("x"))

        make_client(responder).complete("hi", temperature=0.1)
        assert seen["payload"]["temperature"] == 0.1

    def test_system_prompt_prepended(self):
        seen = {}

        def responder(request):
            seen["payload"] = json.loads(request.content)
            return httpx.Response(200, json=_chat_response("x"))

        make_client(responder).complete("hi", system_prompt="be brief")
        messages = seen["payload"]["messages"]
        assert messages[0] == {"role": "system", "content": "be brief"}

    def test_empty_choices_raises(self):
        client = make_client(lambda r: httpx.Response(200, json={"choices": []}))
        with pytest.raises(ValueError):
            client.complete("hi")

    async def test_async_completion(self):
        client = make_client(lambda r: httpx.Response(200, json=_chat_response("async hello")))
        assert await client.complete_async("hi") == "async hello"


class TestExtractSpans:
    def test_json_roundtrip(self):
        payload = {"doc_0": ["span a"], "doc_1": []}
        client = make_client(
            lambda r: httpx.Response(200, json=_chat_response(json.dumps(payload)))
        )
        assert client.extract_spans("Q?", {"doc_0": "a", "doc_1": "b"}) == payload

    def test_bad_json_returns_empty_per_doc(self):
        client = make_client(lambda r: httpx.Response(200, json=_chat_response("not json")))
        assert client.extract_spans("Q?", {"doc_0": "a"}) == {"doc_0": []}


class TestTemplateGeneration:
    def test_per_fact_prompt_for_few_spans(self):
        seen = {}

        def responder(request):
            seen["payload"] = json.loads(request.content)
            return httpx.Response(200, json=_chat_response("T [SPAN_1]"))

        result = make_client(responder).generate_template("Q?", ["one span"], 0)
        assert result == "T [SPAN_1]"
        assert "[SPAN_1]" in seen["payload"]["messages"][-1]["content"]

    def test_aggregate_prompt_for_many_spans(self):
        seen = {}

        def responder(request):
            seen["payload"] = json.loads(request.content)
            return httpx.Response(200, json=_chat_response("T [DISPLAY_SPANS]"))

        make_client(responder).generate_template("Q?", [f"s{i}" for i in range(9)], 0)
        assert "[DISPLAY_SPANS]" in seen["payload"]["messages"][-1]["content"]

    def test_fallback_on_transport_error(self):
        def responder(request):
            raise httpx.ConnectError("boom")

        client = make_client(responder)
        client.max_retries = 0
        template = client.generate_template("Q?", ["s"], 1)
        assert "[DISPLAY_SPANS]" in template


class TestPromptBank:
    def test_list_prompts(self):
        from verbatim_rag_tpu.core.prompts import list_prompts

        names = list_prompts()
        assert "extraction/default" in names
        assert "template/aggregate" in names

    def test_render_prompt_conditionals(self):
        from verbatim_rag_tpu.core.prompts import load_prompt

        with_refs = load_prompt("template/fallback", has_citations=True)
        without = load_prompt("template/fallback", has_citations=False)
        assert "[CITATION_REFS]" in with_refs
        assert "[CITATION_REFS]" not in without


class TestRetryPolicy:
    def test_4xx_fails_immediately(self):
        calls = {"n": 0}

        def responder(request: httpx.Request) -> httpx.Response:
            calls["n"] += 1
            return httpx.Response(401, json={"error": "bad key"})

        client = make_client(responder)
        with pytest.raises(httpx.HTTPStatusError):
            client.complete("hi")
        assert calls["n"] == 1  # non-retryable: one doomed request, not N

    def test_5xx_and_429_retry(self):
        calls = {"n": 0}

        def responder(request: httpx.Request) -> httpx.Response:
            calls["n"] += 1
            if calls["n"] == 1:
                return httpx.Response(503, json={})
            if calls["n"] == 2:
                return httpx.Response(429, json={})
            return httpx.Response(200, json=_chat_response("recovered"))

        client = make_client(responder)
        assert client.complete("hi") == "recovered"
        assert calls["n"] == 3

    async def test_async_4xx_fails_immediately(self):
        calls = {"n": 0}

        def responder(request: httpx.Request) -> httpx.Response:
            calls["n"] += 1
            return httpx.Response(422, json={})

        client = make_client(responder)
        with pytest.raises(httpx.HTTPStatusError):
            await client.complete_async("hi")
        assert calls["n"] == 1


class TestNonDictJsonResponses:
    def test_top_level_array_degrades_to_empty_spans(self):
        client = make_client(
            lambda req: httpx.Response(200, json=_chat_response('["a", "b"]'))
        )
        out = client.extract_spans("q", {"doc": "text"})
        assert out == {"doc": []}
        # The single-doc convenience path must not crash either.
        assert client.extract_relevant_spans("q", "text") == []

    def test_structured_top_level_array_degrades(self):
        client = make_client(
            lambda req: httpx.Response(200, json=_chat_response("[1, 2]"))
        )
        out = client.extract_structured("q", "[X]", {"X": "hint"}, ["doc"])
        assert out == {"X": []}

    def test_structured_non_list_placeholder_value_ignored(self):
        client = make_client(
            lambda req: httpx.Response(
                200, json=_chat_response('{"X": "not-a-list"}')
            )
        )
        out = client.extract_structured("q", "[X]", {"X": "hint"}, ["doc"])
        assert out == {"X": []}


class TestRetryBackoff:
    def test_retry_after_header_honored(self):
        from verbatim_rag_tpu.core.llm_client import _retry_delay_s

        exc = httpx.HTTPStatusError(
            "429",
            request=httpx.Request("POST", "http://x"),
            response=httpx.Response(429, headers={"Retry-After": "3"}),
        )
        assert _retry_delay_s(0, exc) == 3.0

    def test_exponential_growth_and_cap(self):
        from verbatim_rag_tpu.core.llm_client import _retry_delay_s

        exc = httpx.TransportError("boom")
        delays = [_retry_delay_s(a, exc) for a in range(8)]
        assert delays[0] == 0.5
        assert delays[1] == 1.0
        assert all(b >= a for a, b in zip(delays, delays[1:]))
        assert max(delays) <= 16.0

    def test_retries_sleep_between_attempts(self, monkeypatch):
        import verbatim_rag_tpu.core.llm_client as mod

        slept = []
        monkeypatch.setattr(mod.time, "sleep", lambda s: slept.append(s))
        calls = {"n": 0}

        def responder(req):
            calls["n"] += 1
            if calls["n"] < 3:
                return httpx.Response(429, headers={"Retry-After": "0.01"})
            return httpx.Response(200, json=_chat_response("ok"))

        client = make_client(responder)
        client.max_retries = 3
        assert client.complete("hi") == "ok"
        assert slept == [0.01, 0.01]
