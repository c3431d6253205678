/* Minimal GFM-ish markdown for answer bubbles (parity: the reference
   renders answers with ReactMarkdown+remarkGfm — structured templates
   emit headers, lists and tables). Input must already be HTML-escaped. */
"use strict";

const inline = (s) => s
  .replace(/`([^`]+)`/g, "<code>$1</code>")
  .replace(/\*\*([^*]+)\*\*/g, "<strong>$1</strong>")
  .replace(/\*([^*]+)\*/g, "<em>$1</em>");

export function renderMarkdown(safe) {
  const lines = safe.split("\n");
  const out = [];
  let list = null, table = null, code = false;
  const closeAll = () => {
    if (list) { out.push(`</${list}>`); list = null; }
    if (table) { out.push("</table>"); table = null; }
  };
  for (const raw of lines) {
    const line = raw.replace(/\s+$/, "");
    if (line.startsWith("```")) { closeAll(); code = !code; out.push(code ? "<pre>" : "</pre>"); continue; }
    if (code) { out.push(raw + "\n"); continue; }
    let m;
    if ((m = line.match(/^(#{1,4})\s+(.*)$/))) {
      closeAll();
      out.push(`<div class="md-h${m[1].length}">${inline(m[2])}</div>`);
    } else if (/^\s*\|.*\|\s*$/.test(line)) {
      if (/^\s*\|[\s:|-]+\|\s*$/.test(line)) continue; // separator row
      const cells = line.trim().slice(1, -1).split("|").map((c) => inline(c.trim()));
      if (!table) { closeAll(); table = true; out.push('<table class="md-table">'); }
      out.push("<tr>" + cells.map((c) => `<td>${c}</td>`).join("") + "</tr>");
    } else if ((m = line.match(/^\s*[-*]\s+(.*)$/))) {
      if (table) { out.push("</table>"); table = null; }
      if (list !== "ul") { if (list) out.push(`</${list}>`); list = "ul"; out.push("<ul>"); }
      out.push(`<li>${inline(m[1])}</li>`);
    } else if ((m = line.match(/^\s*\d+\.\s+(.*)$/))) {
      if (table) { out.push("</table>"); table = null; }
      if (list !== "ol") { if (list) out.push(`</${list}>`); list = "ol"; out.push("<ol>"); }
      out.push(`<li>${inline(m[1])}</li>`);
    } else if ((m = line.match(/^&gt;\s?(.*)$/))) {
      closeAll();
      out.push(`<div class="md-quote">${inline(m[1])}</div>`);
    } else if (!line.trim()) {
      closeAll();
      out.push("<div class='md-gap'></div>");
    } else {
      closeAll();
      out.push(`<div>${inline(line)}</div>`);
    }
  }
  closeAll();
  if (code) out.push("</pre>");
  return out.join("");
}
