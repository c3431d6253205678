"""Static sanity for the no-build frontend (frontend/).

The UI is markup (index.html) + styles.css + native ES modules under
frontend/src/ (one module per component, mirroring the reference React
app's src/components + src/contexts split) — no bundler, no node. There
is no JS runtime in CI (or this image), so a syntax error or a broken
import would otherwise only surface when a human loads the page. These
tests tokenize every module — respecting strings, template literals with
nested ``${}`` interpolation, regex literals and comments — and check
bracket balance, that every DOM id the scripts reference exists in the
markup, and that the ES-module import graph resolves (every imported
path exists and every imported name is exported by its target).
"""

import re
from pathlib import Path

import pytest

FRONTEND = Path(__file__).resolve().parent.parent / "frontend"
HTML = FRONTEND / "index.html"
MODULES = sorted(FRONTEND.glob("src/**/*.js"))

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
def script() -> str:
    """All component modules concatenated — the full client codebase."""
    assert MODULES, "no ES modules found under frontend/src/"
    return "\n".join(p.read_text() for p in MODULES)


@pytest.mark.parametrize("module", MODULES, ids=lambda p: p.name)
def test_brackets_balanced(module):
    clean = _strip_js(module.read_text())
    for opener, closer in (("{", "}"), ("(", ")"), ("[", "]")):
        assert clean.count(opener) == clean.count(closer), (
            f"{module.name}: unbalanced {opener}{closer}: "
            f"{clean.count(opener)} vs {clean.count(closer)}"
        )


@pytest.mark.parametrize("module", MODULES, ids=lambda p: p.name)
def test_no_unterminated_template_literal(module):
    # an odd structural backtick count means a template literal never closed
    clean_no_tmpl = _strip_js(module.read_text())
    assert "`" not in clean_no_tmpl


def _exports(src: str) -> set[str]:
    names = set(re.findall(
        r"^export\s+(?:async\s+)?(?:function|const|let|class)\s+(\w+)", src, re.M
    ))
    for group in re.findall(r"^export\s*\{([^}]*)\}", src, re.M):
        names |= {n.strip().split(" as ")[-1] for n in group.split(",") if n.strip()}
    return names


def test_import_graph_resolves():
    """Without a JS runtime, a typo'd import path or name 404s/throws only
    in the browser — resolve the whole module graph statically instead."""
    for module in MODULES:
        src = module.read_text()
        for names, rel in re.findall(
            r'^import\s*\{([^}]*)\}\s*from\s*"([^"]+)"', src, re.M
        ):
            target = (module.parent / rel).resolve()
            assert target.is_file(), f"{module.name} imports missing file {rel}"
            exported = _exports(target.read_text())
            for name in (n.strip().split(" as ")[0] for n in names.split(",")):
                if name:
                    assert name in exported, (
                        f"{module.name} imports {name!r} but {target.name} "
                        f"exports {sorted(exported)}"
                    )


def test_entry_module_wired_in_markup(html):
    """index.html must load the entry module; styles.css must exist and be
    linked (the markup/styles/modules split only works if all three are
    actually served)."""
    assert '<script type="module" src="src/main.js"></script>' in html
    assert (FRONTEND / "src" / "main.js").is_file()
    assert 'href="styles.css"' in html and (FRONTEND / "styles.css").is_file()
    # Markup-only file: no inline script remains.
    assert "<script>" not in html


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
    fn = fn[: fn.index("\nexport function ")]
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
