"""Static sanity for the no-build frontend (frontend/index.html).

There is no JS runtime in CI (or this image), so a syntax error in the
single-file UI would otherwise only surface when a human loads the page.
This test tokenizes the inline script — respecting strings, template
literals with nested ``${}`` interpolation, regex literals and comments —
and checks bracket balance, plus that every DOM id the script references
exists in the markup.
"""

import re
from pathlib import Path

import pytest

HTML = Path(__file__).resolve().parent.parent / "frontend" / "index.html"

_REGEX_PRECEDERS = set("=([{,;:!&|?+-*%~^<>")


def _strip_js(src: str) -> str:
    """Return only the structural characters of ``src`` (everything outside
    strings/comments/regex bodies), with template-literal interpolations kept.
    """
    out = []
    i, n = len(src) and 0, len(src)
    # template-literal nesting: stack entries are '`' (inside template text)
    # or '{' (inside an interpolation's braces)
    tmpl_stack: list[str] = []
    last_sig = ""  # last significant char emitted (for regex-literal detection)

    def significant(ch: str) -> bool:
        return not ch.isspace()

    while i < n:
        ch = src[i]
        if tmpl_stack and tmpl_stack[-1] == "`":
            # inside template text: watch for end, escape, or ${
            if ch == "\\":
                i += 2
                continue
            if ch == "`":
                tmpl_stack.pop()
                i += 1
                continue
            if ch == "$" and i + 1 < n and src[i + 1] == "{":
                tmpl_stack.append("{")
                out.append("(")  # interpolation opens a balanced region
                i += 2
                continue
            i += 1
            continue
        # normal code (possibly inside an interpolation)
        if ch == "/" and i + 1 < n and src[i + 1] == "/":
            i = src.find("\n", i)
            if i < 0:
                break
            continue
        if ch == "/" and i + 1 < n and src[i + 1] == "*":
            i = src.find("*/", i) + 2
            if i < 2:
                break
            continue
        if ch in "'\"":
            quote = ch
            i += 1
            while i < n and src[i] != quote:
                i += 2 if src[i] == "\\" else 1
            i += 1
            last_sig = '"'
            continue
        if ch == "`":
            tmpl_stack.append("`")
            i += 1
            last_sig = '"'
            continue
        if ch == "}" and tmpl_stack and tmpl_stack[-1] == "{":
            tmpl_stack.pop()
            out.append(")")  # close the interpolation region
            i += 1
            continue
        if ch == "/" and (not last_sig or last_sig in _REGEX_PRECEDERS):
            # regex literal: skip to unescaped / outside a char class
            i += 1
            in_class = False
            while i < n:
                c = src[i]
                if c == "\\":
                    i += 2
                    continue
                if c == "[":
                    in_class = True
                elif c == "]":
                    in_class = False
                elif c == "/" and not in_class:
                    break
                elif c == "\n":
                    break  # not a regex after all; bail
                i += 1
            i += 1
            last_sig = '"'
            continue
        out.append(ch)
        if significant(ch):
            last_sig = ch
        i += 1
    return "".join(out)


@pytest.fixture(scope="module")
def html() -> str:
    return HTML.read_text()


@pytest.fixture(scope="module")
def script(html: str) -> str:
    return html[html.index("<script>") + 8 : html.index("</script>")]


def test_brackets_balanced(script):
    clean = _strip_js(script)
    for opener, closer in (("{", "}"), ("(", ")"), ("[", "]")):
        assert clean.count(opener) == clean.count(closer), (
            f"unbalanced {opener}{closer}: "
            f"{clean.count(opener)} vs {clean.count(closer)}"
        )


def test_no_unterminated_template_literal(script):
    # an odd structural backtick count means a template literal never closed
    clean_no_tmpl = _strip_js(script)
    assert "`" not in clean_no_tmpl


def test_referenced_dom_ids_exist(html, script):
    ids = set(re.findall(r'id="([^"]+)"', html))
    refs = set(re.findall(r'el\("([^"]+)"\)', script))
    refs |= set(re.findall(r'getElementById\(\s*"([^"]+)"', script))
    assert refs <= ids, f"script references missing ids: {refs - ids}"


def test_stream_event_types_covered(script):
    """The NDJSON consumer must handle every stage the server emits
    (documents/progress/highlights/answer/error — rag/streaming.py)."""
    for event in ("documents", "progress", "highlights", "answer", "error"):
        assert f'"{event}"' in script, f"stream consumer ignores {event!r} events"


def test_new_interactions_wired(html, script):
    """Round-3 surface (CleanFactInterface facts view, retry UX, stream
    progress): the elements exist AND the script binds them."""
    for el_id in ("view-chat", "view-facts", "facts-list"):
        assert f'id="{el_id}"' in html, f"missing element #{el_id}"
    for fn in ("renderFactsView", "setView", "setProgress", "failAssistantMessage"):
        assert f"function {fn}" in script, f"missing function {fn}"
    assert 'el("view-facts").addEventListener' in script
    assert 'class="retry"' in script and ".retry" in script
    assert "progress-fill" in script


def test_only_real_api_endpoints_referenced(script):
    """Every fetch() target in the UI must be a route the server registers
    (api/app.py) — a renamed route would silently 404 in the browser."""
    import re as _re

    from verbatim_rag_tpu.api.app import create_app

    app = create_app()
    routes = {r.resource.canonical for r in app.router.routes() if r.resource}
    fetched = set(_re.findall(r'fetch\("(/api/[^"]+)"', script))
    assert fetched, "no API calls found in the script?"
    for path in fetched:
        assert path in routes, f"UI fetches {path} but server routes are {sorted(routes)}"


def test_citation_chips_skip_code_blocks(script):
    """renderAnswer must split out <pre>/<code> segments before chipping
    [n] — `arr[0]` inside a code block is code, not a citation."""
    assert r"(<pre>[\s\S]*?<\/pre>|<code>[\s\S]*?<\/code>)" in script
    fn = script[script.index("function renderAnswer"):]
    fn = fn[: fn.index("\nfunction ")]
    assert ".split(" in fn and "startsWith(\"<pre>\")" in fn


def test_query_options_panel_wired(html, script):
    """The ⚙ options panel must exist and feed the stream body."""
    for dom_id in ("options-toggle", "options-row", "search-type",
                   "filter-expr", "w-dense", "w-sparse", "rrf-k"):
        assert f'id="{dom_id}"' in html, dom_id
    assert "queryOptions" in script
    assert "opts.search_type" in script and "opts.filter" in script
    assert "opts.hybrid_weights" in script and "opts.rrf_k" in script
    # The stream request spreads the options into the body.
    assert "{ question, ...opts }" in script
