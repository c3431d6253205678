/* Facts view — the analog of the reference's CleanFactInterface.jsx
   (/root/reference/frontend/src/components/CleanFactInterface.jsx):
   one card per citation, click selects the card and flashes the exact
   source span in the document panel. setView toggles chat ↔ facts. */
"use strict";

import { el, escapeHtml } from "../dom.js";
import { state } from "../state.js";
import { flashHighlight } from "./documents.js";

export function renderFactsView() {
  const factsEl = el("facts-list");
  const ans = state.answers[state.activeAnswer];
  const citations = (ans && ans.citations) || [];
  if (!citations.length) {
    factsEl.innerHTML =
      '<div class="empty">No extracted facts yet — ask a question first.</div>';
    return;
  }
  factsEl.innerHTML = citations.map((c, ci) => {
    const doc = (ans.documents || [])[c.doc_index] || {};
    const kind = c.type === "reference" ? " reference" : "";
    const sel = ci === state.selectedFact ? " selected" : "";
    return `<div class="fact-card${kind}${sel}" data-ci="${ci}">` +
           `${c.number ? `<span class="fact-num">${c.number}</span>` : ""}` +
           `${escapeHtml(c.text)}` +
           `<div class="fact-src">${escapeHtml(doc.title || "doc " + (c.doc_index + 1))}` +
           `${c.type === "reference" ? " · reference" : ""}</div></div>`;
  }).join("");
  factsEl.querySelectorAll(".fact-card").forEach((card) =>
    card.addEventListener("click", () => {
      state.selectedFact = +card.dataset.ci;
      const cit = citations[state.selectedFact];
      renderFactsView();
      if (cit) flashHighlight(state.activeAnswer, cit);
    }));
}

export function setView(view) {
  state.view = view;
  el("view-chat").classList.toggle("active", view === "chat");
  el("view-facts").classList.toggle("active", view === "facts");
  el("messages").hidden = view !== "chat";
  el("facts-list").hidden = view !== "facts";
  if (view === "facts") renderFactsView();
}
