"""The bundled dashboard page: the reference's web UI over this engine.

The reference serves a three-tab single-page app at ``GET /``
(controllers/DefaultController.java:15-18, templates/index.html,
static/assets/js/scripts.js:1520-1660):

* **Dashboard** — ``GET /api/statistics`` rendered as total sites / pages /
  lemmas tiles plus one expandable block per site (status, pages, lemmas).
* **Management** — a start/stop-indexing toggle (``GET /api/startIndexing``
  / ``stopIndexing``) whose state follows ``statistics.total.isIndexing``,
  and an add/update-page form (``POST /api/indexPage?url=``).
* **Search** — a site dropdown populated from ``statistics.detailed``, a
  query box, and a result list (title link, snippet, relevance) with a
  client-side "Show more" pager (the reference server ignores the
  offset/limit params its UI sends — pagination is client-side there too,
  scripts.js:1537-1562; we mirror that by over-fetching once and slicing).

This module is an ORIGINAL vanilla-JS/CSS implementation of that behavior —
no jQuery, no external assets (the container has no network), ~10 KB served
from memory by :mod:`rayindex.http_api`.  It talks only to the five public
JSON endpoints, so it exercises exactly the surface a reference client uses.
"""

from __future__ import annotations

INDEX_HTML = r"""<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8"/>
<meta name="viewport" content="width=device-width, initial-scale=1"/>
<title>rayindex — search engine dashboard</title>
<style>
:root { --accent:#2962ff; --bg:#f5f6fa; --card:#fff; --ink:#1a1c23;
        --muted:#6b7280; --ok:#14863a; --err:#c0392b; }
* { box-sizing:border-box; }
body { margin:0; font:15px/1.5 system-ui,sans-serif; background:var(--bg);
       color:var(--ink); }
header { background:var(--card); border-bottom:1px solid #e5e7eb;
         padding:12px 24px; display:flex; gap:24px; align-items:baseline; }
header h1 { font-size:18px; margin:0; }
nav a { margin-right:16px; text-decoration:none; color:var(--muted);
        padding:6px 2px; border-bottom:2px solid transparent; }
nav a.active { color:var(--accent); border-bottom-color:var(--accent); }
main { max-width:880px; margin:24px auto; padding:0 16px; }
.tab { display:none; } .tab.active { display:block; }
.tiles { display:flex; gap:16px; margin-bottom:24px; }
.tile { flex:1; background:var(--card); border-radius:8px; padding:16px;
        text-align:center; box-shadow:0 1px 3px rgba(0,0,0,.08); }
.tile b { display:block; font-size:28px; }
.tile span { color:var(--muted); }
.site { background:var(--card); border-radius:8px; padding:12px 16px;
        margin-bottom:8px; box-shadow:0 1px 3px rgba(0,0,0,.08); }
.site summary { cursor:pointer; font-weight:600; }
.site .status { font-size:12px; padding:2px 8px; border-radius:10px;
                background:#e8f5ec; color:var(--ok); margin-left:8px; }
.site dl { display:grid; grid-template-columns:auto 1fr; gap:2px 12px;
           margin:8px 0 0; color:var(--muted); }
.site dd { margin:0; color:var(--ink); }
button { background:var(--accent); color:#fff; border:0; border-radius:6px;
         padding:9px 18px; font-size:15px; cursor:pointer; }
button.stop { background:var(--err); }
button:disabled { opacity:.5; cursor:default; }
input, select { padding:8px 10px; border:1px solid #d1d5db; border-radius:6px;
                font-size:15px; }
.row { display:flex; gap:8px; margin:12px 0; }
.row input { flex:1; }
#results .hit { background:var(--card); border-radius:8px; padding:12px 16px;
                margin-bottom:8px; box-shadow:0 1px 3px rgba(0,0,0,.08); }
.hit a { color:var(--accent); font-weight:600; text-decoration:none; }
.hit .url { color:var(--ok); font-size:13px; word-break:break-all; }
.hit .rel { float:right; color:var(--muted); font-size:13px; }
.hit p { margin:6px 0 0; }
#msg { color:var(--err); min-height:1.2em; }
.muted { color:var(--muted); }
</style>
</head>
<body>
<header>
  <h1>rayindex</h1>
  <nav>
    <a href="#dashboard" class="active">Dashboard</a>
    <a href="#management">Management</a>
    <a href="#search">Search</a>
  </nav>
</header>
<main>
  <section id="dashboard" class="tab active">
    <div class="tiles">
      <div class="tile"><b id="totalSites">–</b><span>sites</span></div>
      <div class="tile"><b id="totalPages">–</b><span>pages</span></div>
      <div class="tile"><b id="totalLemmas">–</b><span>lemmas</span></div>
    </div>
    <div id="sites" class="muted">loading…</div>
  </section>

  <section id="management" class="tab">
    <p><button id="toggleIndexing">Start indexing</button>
       <span id="indexingState" class="muted"></span></p>
    <h3>Add/update page</h3>
    <form id="pageForm" class="row">
      <input id="pageUrl" type="text" placeholder="https://site/path"/>
      <button type="submit">Add/update</button>
    </form>
    <div id="msg"></div>
  </section>

  <section id="search" class="tab">
    <form id="searchForm">
      <p><select id="siteSelect"><option value="">All sites</option></select></p>
      <div class="row">
        <input id="query" type="text" placeholder="Query"/>
        <button type="submit">Search</button>
      </div>
    </form>
    <p id="found" class="muted"></p>
    <div id="results"></div>
    <p><button id="more" hidden>Show more <span id="remain"></span></button></p>
  </section>
</main>
<script>
"use strict";
const $ = (s) => document.querySelector(s);
const api = (path) => fetch(path).then((r) => r.json());
const esc = (s) => String(s ?? "").replace(/[&<>"]/g,
  (c) => ({"&":"&amp;","<":"&lt;",">":"&gt;",'"':"&quot;"}[c]));
// snippets carry ONLY the builder's <b> bolding as markup; everything else
// in them is page-derived text and must not reach innerHTML unescaped
const snip = (s) => esc(s).replace(/&lt;(\/?)b&gt;/g, "<$1b>");
// corpus-derived URLs go into href: allow-list web schemes so an indexed
// javascript:/data: url can never become click-to-execute markup
const safeUrl = (u) => /^https?:\/\//i.test(u || "") ? u : "#";

// --- tabs (hash-routed like the reference) ---------------------------------
function showTab(id) {
  // unknown/stale anchors fall back to the dashboard instead of hiding
  // every tab (a blank page until the user clicks a nav link)
  if (!id || !document.getElementById(id) ||
      !document.getElementById(id).classList.contains("tab"))
    id = "dashboard";
  document.querySelectorAll(".tab").forEach((t) =>
    t.classList.toggle("active", t.id === id));
  document.querySelectorAll("nav a").forEach((a) =>
    a.classList.toggle("active", a.hash === "#" + id));
}
window.addEventListener("hashchange", () =>
  showTab(location.hash.slice(1) || "dashboard"));
if (location.hash) showTab(location.hash.slice(1));

// --- dashboard + site dropdown ---------------------------------------------
let indexing = false;
function setIndexing(b) {
  indexing = !!b;
  $("#toggleIndexing").textContent = indexing ? "Stop indexing" : "Start indexing";
  $("#toggleIndexing").classList.toggle("stop", indexing);
  $("#indexingState").textContent = indexing ? "indexing…" : "";
}
function renderStats(st) {
  $("#totalSites").textContent = st.total.sites;
  $("#totalPages").textContent = st.total.pages;
  $("#totalLemmas").textContent = st.total.lemmas;
  setIndexing(st.total.isIndexing ?? st.total.indexing);
  $("#sites").innerHTML = (st.detailed || []).map((s) => `
    <details class="site"><summary>${esc(s.name)}
      <span class="status">${esc(s.status)}</span></summary>
      <dl><dt>url</dt><dd>${esc(s.url)}</dd>
          <dt>pages</dt><dd>${s.pages}</dd>
          <dt>lemmas</dt><dd>${s.lemmas}</dd></dl>
    </details>`).join("") || '<p class="muted">no sites indexed yet</p>';
  const sel = $("#siteSelect"), cur = sel.value;
  sel.length = 1;
  for (const s of st.detailed || []) sel.add(new Option(s.name, s.url));
  sel.value = cur;
}
function refreshStats() {
  api("/api/statistics").then((r) => {
    if (r.result && r.statistics) renderStats(r.statistics);
    else {
      $("#sites").textContent = r.error || "index is not built yet";
      // before the FIRST build commits anything servable, the not-built
      // response still carries isIndexing — keep the stop toggle live
      if ("isIndexing" in r) setIndexing(r.isIndexing);
    }
  }).catch(() => {});
}
refreshStats();
setInterval(refreshStats, 5000);

// --- management --------------------------------------------------------------
$("#toggleIndexing").addEventListener("click", () => {
  api(indexing ? "/api/stopIndexing" : "/api/startIndexing").then((r) => {
    $("#msg").textContent = r.error || "";
    refreshStats();
  });
});
$("#pageForm").addEventListener("submit", (e) => {
  e.preventDefault();
  const url = $("#pageUrl").value.trim();
  if (!url) return;
  fetch("/api/indexPage", { method: "POST",
    headers: {"Content-Type": "application/x-www-form-urlencoded"},
    body: "url=" + encodeURIComponent(url),
  }).then((r) => r.json()).then((r) => {
    $("#msg").textContent = r.result ? "page re-indexed" : (r.error || "failed");
    refreshStats();
  });
});

// --- search with client-side "Show more" (reference behavior) ----------------
const PAGE = 10, FETCH_K = 200;
let hits = [], total = 0, shown = 0;
function renderMore() {
  const next = hits.slice(shown, shown + PAGE);
  $("#results").insertAdjacentHTML("beforeend", next.map((h) => `
    <div class="hit">
      <span class="rel">relevance ${Number(h.relevance).toFixed(3)}</span>
      <a href="${esc(safeUrl(h.url || h.site))}">${esc(h.title || h.url || ("doc " + h.doc_id))}</a>
      <div class="url">${esc(h.url || "")}</div>
      <p>${snip(h.snippet || "")}</p>
    </div>`).join(""));
  shown += next.length;
  const remain = Math.max(total - shown, 0);
  $("#more").hidden = shown >= hits.length;
  $("#remain").textContent = remain ? "(" + remain + ")" : "";
}
$("#searchForm").addEventListener("submit", (e) => {
  e.preventDefault();
  const q = $("#query").value.trim();
  if (!q) { $("#found").textContent = "empty query"; return; }
  const site = $("#siteSelect").value;
  const u = "/api/search?query=" + encodeURIComponent(q) +
    (site ? "&site=" + encodeURIComponent(site) : "") + "&limit=" + FETCH_K;
  $("#results").innerHTML = ""; $("#found").textContent = "searching…";
  hits = []; total = 0; shown = 0; $("#more").hidden = true;
  api(u).then((r) => {
    if (!r.result) { $("#found").textContent = r.error || "search failed"; return; }
    hits = r.data || []; total = r.count || hits.length;
    $("#found").textContent = "Found " + total + " results";
    renderMore();
  });
});
$("#more").addEventListener("click", renderMore);
</script>
</body>
</html>
"""
