/* Shared UI state — the analog of the reference's React contexts
   (ApiContext holds streaming answers, DocumentsContext the active
   document selection; /root/reference/frontend/src/contexts). Plain
   mutable store: components read fields directly and re-render
   themselves on their own events, so no framework is needed. */
"use strict";

export const state = {
  answers: [],          // one entry per completed/streaming answer
  activeAnswer: -1,     // which answer the doc panel shows
  activeDoc: 0,
  busy: false,
  view: "chat",         // "chat" | "facts" (CleanFactInterface parity)
  selectedFact: -1,
};
