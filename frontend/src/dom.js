/* Tiny DOM helpers shared by every component module. */
"use strict";

export const el = (id) => document.getElementById(id);

export function escapeHtml(s) {
  return s.replace(/&/g, "&amp;").replace(/</g, "&lt;").replace(/>/g, "&gt;")
          .replace(/"/g, "&quot;");
}
