/* Query options panel (⚙) — the analog of the reference search
   debugger's knobs (/root/reference/scripts/test_index_streamlit.py:
   search-type, hybrid-weight sliders, reranker) plus the per-query
   template-mode select. Only non-default values go on the wire. */
"use strict";

import { fetchTemplates } from "../api.js";
import { el } from "../dom.js";

export function queryOptions() {
  const opts = {};
  const k = el("k-select").value;
  if (k) opts.k = +k;
  if (el("options-row").hidden) return opts;
  const st = el("search-type").value;
  if (st) opts.search_type = st;
  const filt = el("filter-expr").value.trim();
  if (filt) opts.filter = filt;
  const wd = +el("w-dense").value, ws = +el("w-sparse").value;
  if ((wd !== 50 || ws !== 50) && wd + ws > 0) {
    opts.hybrid_weights = { dense: wd / 100, sparse: ws / 100 };
  }
  const rrf = +el("rrf-k").value;
  if (rrf && rrf !== 60) opts.rrf_k = rrf;
  const tmode = el("template-mode").value;
  if (tmode) opts.template_mode = tmode;
  return opts;
}

export async function refreshTemplates() {
  // Populate the template-mode select from the server's available
  // strategies (GET /api/templates → {current_mode, available_modes}).
  try {
    const data = await fetchTemplates();
    const sel = el("template-mode");
    (data.available_modes || []).forEach((mode) => {
      const opt = document.createElement("option");
      opt.value = mode;
      opt.textContent = mode === data.current_mode ? `${mode} (default)` : mode;
      sel.appendChild(opt);
    });
  } catch (e) { /* panel keeps only "server default" */ }
}

export function wireOptionsPanel() {
  el("options-toggle").addEventListener("click", () => {
    const row = el("options-row");
    row.hidden = !row.hidden;
    el("options-toggle").classList.toggle("active", !row.hidden);
  });
  for (const id of ["w-dense", "w-sparse"]) {
    el(id).addEventListener("input", () => {
      el(`${id}-val`).textContent = el(id).value;
    });
  }
}
