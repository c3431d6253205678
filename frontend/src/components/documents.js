/* Document panel — the analog of the reference's DocumentPanel /
   DocumentSelector / DocumentViewer / HighlightedText / RelevantSentences
   (/root/reference/frontend/src/components): tabbed retrieved-chunk
   viewer with offset-accurate highlight rendering (display vs reference
   colors), a cited-spans list, and citation-click → span-flash. */
"use strict";

import { el, escapeHtml } from "../dom.js";
import { state } from "../state.js";

const docTabsEl = el("doc-tabs"), docViewEl = el("doc-view"),
      sentencesEl = el("sentences");

export function selectAnswer(answerIdx, docIdx = 0) {
  state.activeAnswer = answerIdx;
  state.activeDoc = docIdx;
  renderDocPanel();
}

export function renderDocPanel() {
  const ans = state.answers[state.activeAnswer];
  if (!ans || !(ans.documents || []).length) {
    docTabsEl.innerHTML = "";
    docViewEl.innerHTML = '<div class="empty">No documents.</div>';
    sentencesEl.hidden = true;
    return;
  }
  const docs = ans.documents;
  docTabsEl.innerHTML = docs.map((d, i) => {
    const label = escapeHtml(d.title || `doc ${i + 1}`);
    const n = (d.highlights || []).length;
    return `<div class="doc-tab ${i === state.activeDoc ? "active" : ""}" data-i="${i}">` +
           `${label}${n ? `<span class="hl-count">${n}</span>` : ""}</div>`;
  }).join("");
  docTabsEl.querySelectorAll(".doc-tab").forEach((tab) =>
    tab.addEventListener("click", () => { state.activeDoc = +tab.dataset.i; renderDocPanel(); }));

  renderDocument(docs[state.activeDoc], ans, state.activeDoc);
  renderSentences(ans);
}

/* Offset-accurate highlight rendering: split content on sorted span
   boundaries; each <mark> carries doc/highlight indexes for citation jump. */
export function renderDocument(doc, ans, docIdx) {
  const content = doc.content || "";
  const spans = (doc.highlights || [])
    .map((h, i) => ({ ...h, i }))
    .filter((h) => h.start >= 0 && h.end <= content.length && h.end > h.start)
    .sort((a, b) => a.start - b.start);

  const type_of = {};
  (ans.citations || []).forEach((c) => {
    if (c.doc_index === docIdx) type_of[c.highlight_index] = c.type || "display";
  });

  let html = "", pos = 0;
  for (const h of spans) {
    const start = Math.max(h.start, pos);
    if (start > pos) html += escapeHtml(content.slice(pos, start));
    if (h.end > start) {
      const cls = type_of[h.i] === "reference" ? "reference" : "display";
      html += `<mark class="${cls}" id="hl-${state.activeAnswer}-${docIdx}-${h.i}"` +
              ` title="verbatim span">` +
              escapeHtml(content.slice(start, h.end)) + `</mark>`;
      pos = h.end;
    }
  }
  html += escapeHtml(content.slice(pos));
  const meta = [doc.title, doc.source].filter(Boolean).map(escapeHtml).join(" · ");
  docViewEl.innerHTML = (meta ? `<div class="doc-meta">${meta}</div>` : "") + html;
}

export function renderSentences(ans) {
  const rows = [];
  (ans.citations || []).forEach((c, ci) => {
    const doc = (ans.documents || [])[c.doc_index];
    if (!doc) return;
    rows.push(
      `<div class="sentence" data-ci="${ci}" title="jump to source">` +
      `“${escapeHtml(c.text)}” ` +
      `<span class="from">— ${escapeHtml(doc.title || "doc " + (c.doc_index + 1))}` +
      `${c.number ? ` · [${c.number}]` : ""}</span></div>`);
  });
  if (!rows.length) { sentencesEl.hidden = true; return; }
  sentencesEl.hidden = false;
  sentencesEl.innerHTML = `<h3>Cited spans — click to jump to the source</h3>` + rows.join("");
  // Click-to-source (parity: CleanFactInterface handleFactClick).
  sentencesEl.querySelectorAll(".sentence").forEach((row) =>
    row.addEventListener("click", () => {
      const cit = (ans.citations || [])[+row.dataset.ci];
      if (cit) flashHighlight(state.activeAnswer, cit);
    }));
}

export function flashHighlight(answerIdx, cit) {
  selectAnswer(answerIdx, cit.doc_index);
  requestAnimationFrame(() => {
    const mark = document.getElementById(
      `hl-${answerIdx}-${cit.doc_index}-${cit.highlight_index}`);
    if (mark) {
      mark.scrollIntoView({ behavior: "smooth", block: "center" });
      mark.classList.add("flash");
      setTimeout(() => mark.classList.remove("flash"), 1200);
    }
  });
}

export function jumpToCitation(answerIdx, number) {
  const ans = state.answers[answerIdx];
  if (!ans) return;
  const cit = (ans.citations || []).find((c) => c.number === number) ||
              (ans.citations || [])[number - 1];
  if (cit) flashHighlight(answerIdx, cit);
}
