/* Chat panel — the analog of the reference's ChatPanel / ChatMessage /
   ChatInput (/root/reference/frontend/src/components): streamed stages
   (documents → progress → highlights → answer) drive a progress fill,
   answers render as markdown with clickable [n] citation chips, and
   failures surface a Retry button that replays the question. */
"use strict";

import { streamQuery } from "../api.js";
import { el, escapeHtml } from "../dom.js";
import { renderMarkdown } from "../markdown.js";
import { state } from "../state.js";
import { jumpToCitation, renderDocPanel, selectAnswer } from "./documents.js";
import { renderFactsView } from "./facts.js";
import { queryOptions } from "./options.js";

const messagesEl = el("messages");

export function addUserMessage(text) {
  const div = document.createElement("div");
  div.className = "msg user";
  div.innerHTML = `<div class="bubble">${escapeHtml(text)}</div>`;
  messagesEl.appendChild(div);
  messagesEl.scrollTop = messagesEl.scrollHeight;
}

export function addAssistantShell() {
  const div = document.createElement("div");
  div.className = "msg assistant";
  div.innerHTML = `<div class="bubble"><span class="stage">retrieving…</span>
                   <div class="progress-track"><div class="progress-fill"></div></div></div>
                   <div class="meta"></div>`;
  messagesEl.appendChild(div);
  messagesEl.scrollTop = messagesEl.scrollHeight;
  return div;
}

/* Stage → progress-bar position (parity: the reference surfaces stream
   stages in ChatPanel; here they also drive a visible progress fill). */
export function setProgress(shell, fraction) {
  const fill = shell.querySelector(".progress-fill");
  if (fill) fill.style.width = `${Math.round(fraction * 100)}%`;
}

/* Answer text → markdown html with [n] linkified to citation chips carrying
   a hover preview of the cited span (parity: InlineCitation + Tooltip). */
export function renderAnswer(answer, answerIdx) {
  const ans = state.answers[answerIdx] || {};
  const html = renderMarkdown(escapeHtml(answer));
  const chip = (m, n) => {
    const cit = (ans.citations || []).find((c) => c.number === +n);
    const preview = cit ? cit.text.slice(0, 160) + (cit.text.length > 160 ? "…" : "")
                        : `go to citation ${n}`;
    const kind = cit && cit.type === "reference" ? " ref" : "";
    return `<span class="cite${kind}" data-answer="${answerIdx}" data-number="${n}" ` +
           `title="${escapeHtml(preview)}">${n}</span>`;
  };
  // Never rewrite [n] inside <pre>/<code>: `arr[0]` in a code snippet is
  // code, not a citation — split on those segments and chip only prose.
  return html
    .split(/(<pre>[\s\S]*?<\/pre>|<code>[\s\S]*?<\/code>)/)
    .map((part) =>
      part.startsWith("<pre>") || part.startsWith("<code>")
        ? part
        : part.replace(/\[(\d+)\]/g, chip)
    )
    .join("");
}

export function finishAssistantMessage(shell, data, answerIdx, elapsedMs) {
  shell.querySelector(".bubble").innerHTML = renderAnswer(data.answer || "", answerIdx);
  const nDocs = (data.documents || []).length;
  const nHl = (data.documents || []).reduce((a, d) => a + (d.highlights || []).length, 0);
  shell.querySelector(".meta").textContent =
    `${nDocs} documents · ${nHl} verbatim spans` +
    (elapsedMs ? ` · ${Math.round(elapsedMs)} ms` : "");
  shell.querySelector(".bubble").addEventListener("click", (ev) => {
    const chip = ev.target.closest(".cite");
    if (chip) jumpToCitation(+chip.dataset.answer, +chip.dataset.number);
  });
}

export function failAssistantMessage(shell, message, question) {
  shell.querySelector(".bubble").outerHTML =
    `<div class="error-bubble">${escapeHtml(message)}` +
    `<button class="retry" title="resend this question">Retry</button></div>`;
  // Retry UX (parity: the reference surfaces `error` from ApiContext and
  // lets the user resubmit): replay the same question through submit().
  shell.querySelector(".retry").addEventListener("click", () => {
    shell.remove();
    el("question").value = question || "";
    submit();
  });
}

/* One full streamed exchange: push a state.answers entry, feed each NDJSON
   stage into the UI (api.streamQuery handles the wire), finish or fail. */
async function runQuery(question, opts, shell) {
  const answerIdx = state.answers.length;
  state.answers.push({ documents: [], citations: [] });
  const stageEl = shell.querySelector(".stage");
  let elapsed = 0;

  const final = await streamQuery(question, opts, (event) => {
    if (event.type === "documents") {
      state.answers[answerIdx].documents = event.data.documents || [];
      if (stageEl) stageEl.textContent =
        `retrieved ${state.answers[answerIdx].documents.length} documents — extracting…`;
      setProgress(shell, 0.3);
      selectAnswer(answerIdx, 0);
    } else if (event.type === "progress") {
      elapsed = event.elapsed_ms || event.data?.elapsed_ms || 0;
      if (stageEl) stageEl.textContent = `extraction done (${Math.round(elapsed)} ms) — templating…`;
      setProgress(shell, 0.65);
    } else if (event.type === "highlights") {
      state.answers[answerIdx].documents = event.data.documents || [];
      setProgress(shell, 0.85);
      if (state.activeAnswer === answerIdx) renderDocPanel();
    } else if (event.type === "answer") {
      const data = event.data;
      Object.assign(state.answers[answerIdx], {
        documents: data.documents || [],
        citations: (data.structured_answer && data.structured_answer.citations) ||
                   data.citations || [],
        answer: data.answer,
      });
    }
  });

  finishAssistantMessage(shell, final, answerIdx, elapsed);
  selectAnswer(answerIdx, 0);
  state.selectedFact = -1;
  if (state.view === "facts") renderFactsView();
}

export async function submit() {
  const input = el("question");
  const question = input.value.trim();
  if (!question || state.busy) return;
  state.busy = true;
  el("send").disabled = true;
  input.value = "";
  if (messagesEl.querySelector(".empty")) messagesEl.innerHTML = "";
  addUserMessage(question);
  const shell = addAssistantShell();
  try {
    await runQuery(question, queryOptions(), shell);
  } catch (err) {
    failAssistantMessage(shell, String(err.message || err), question);
  } finally {
    state.busy = false;
    el("send").disabled = false;
    messagesEl.scrollTop = messagesEl.scrollHeight;
    input.focus();
  }
}
