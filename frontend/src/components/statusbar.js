/* Header status dot + corpus drawer — the analog of the reference's
   system-status display and DocumentsContext corpus listing
   (/root/reference/frontend/src/contexts/DocumentsContext.jsx). */
"use strict";

import { fetchCorpus, fetchStatus } from "../api.js";
import { el, escapeHtml } from "../dom.js";

export async function refreshStatus() {
  const s = el("status");
  try {
    const data = await fetchStatus();
    if (data.status === "ok") {
      s.className = "ok";
      s.innerHTML = `<span class="dot"></span>ready · ${data.num_documents} docs · ` +
                    `${data.num_chunks} chunks` +
                    (data.sparse ? " · hybrid" : " · dense");
    } else {
      s.className = "err";
      s.innerHTML = `<span class="dot"></span>${escapeHtml(data.detail || "not ready")}`;
    }
  } catch (e) {
    s.className = "err";
    s.innerHTML = `<span class="dot"></span>offline`;
  }
}

export async function refreshCorpus() {
  const list = el("corpus-list");
  try {
    const data = await fetchCorpus();
    const docs = data.documents || [];
    if (!docs.length) { list.innerHTML = '<div class="empty">index is empty</div>'; return; }
    list.innerHTML = docs.map((d) => `
      <div class="corpus-doc">
        <div class="title">${escapeHtml(d.title || d.id)}</div>
        <div class="sub">${escapeHtml(d.source || "")}</div>
        <div class="sub">${d.num_chunks ?? "?"} chunks</div>
      </div>`).join("");
  } catch (e) {
    list.innerHTML = '<div class="empty">failed to load corpus</div>';
  }
}
