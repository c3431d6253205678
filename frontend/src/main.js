/* Boot — wires the components to the markup (the analog of the
   reference's App.jsx mounting the panels inside the context providers).
   Served as a native ES module: no build step, no toolchain, the module
   graph under frontend/src/ IS the component structure. */
"use strict";

import { submit } from "./components/chat.js";
import { setView } from "./components/facts.js";
import { refreshTemplates, wireOptionsPanel } from "./components/options.js";
import { refreshCorpus, refreshStatus } from "./components/statusbar.js";
import { el } from "./dom.js";

el("send").addEventListener("click", submit);
el("question").addEventListener("keydown", (e) => { if (e.key === "Enter") submit(); });
el("view-chat").addEventListener("click", () => setView("chat"));
el("view-facts").addEventListener("click", () => setView("facts"));
wireOptionsPanel();

refreshStatus();
refreshCorpus();
refreshTemplates();
setInterval(refreshStatus, 15000);
