/* API client — protocol only, no DOM. The analog of the reference's
   ApiContext.jsx (/root/reference/frontend/src/contexts/ApiContext.jsx):
   status/templates/documents fetchers plus the NDJSON stream consumer.
   streamQuery() parses the staged events (documents → progress →
   highlights → answer, rag/streaming.py order) and hands each to the
   caller's handler; rendering stays in the component modules. */
"use strict";

export async function fetchStatus() {
  const r = await fetch("/api/status");
  return r.json();
}

export async function fetchTemplates() {
  const r = await fetch("/api/templates");
  return r.json();
}

export async function fetchCorpus() {
  const r = await fetch("/api/documents");
  return r.json();
}

/* POST the question + options, consume the NDJSON stream line by line,
   calling onEvent(event) per stage. Returns the final answer payload;
   throws with the server's `detail` on HTTP errors and on `error`
   events (the retry UX keys off the thrown message). */
export async function streamQuery(question, opts, onEvent) {
  const body = { question, ...opts };
  const resp = await fetch("/api/query/stream", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify(body),
  });
  if (!resp.ok) {
    let detail = `HTTP ${resp.status}`;
    try { detail = (await resp.json()).detail || detail; } catch (e) { /* keep */ }
    throw new Error(detail);
  }
  const reader = resp.body.getReader();
  const decoder = new TextDecoder();
  let buf = "", final = null;
  const handle = (event) => {
    if (event.type === "error") throw new Error(event.message || "stream error");
    if (event.type === "answer") final = event.data;
    onEvent(event);
  };
  for (;;) {
    const { value, done } = await reader.read();
    if (done) break;
    buf += decoder.decode(value, { stream: true });
    let nl;
    while ((nl = buf.indexOf("\n")) >= 0) {
      const line = buf.slice(0, nl).trim();
      buf = buf.slice(nl + 1);
      if (line) handle(JSON.parse(line));
    }
  }
  if (buf.trim()) handle(JSON.parse(buf.trim()));
  if (!final) throw new Error("stream ended without an answer");
  return final;
}
