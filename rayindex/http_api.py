"""HTTP surface parity: the reference's ``/api`` endpoints over this engine.

The reference IS an HTTP service (controllers/ApiController.java:35-58):
``GET /api/statistics``, ``GET /api/startIndexing``, ``GET
/api/stopIndexing``, ``POST /api/indexPage?url=``, ``GET
/api/search?query=&site=``.  Rounds 1-3 exposed the same capabilities as a
Python API; this adapter closes the last surface gap so a reference user
can point their existing client at the Ray-native engine unchanged.

Design (stdlib only — no web framework in the container):

* ``ThreadingHTTPServer`` on localhost; every response is the reference's
  JSON shape (``{"result": ..., "error"?: ..., ...}``,
  dto/search/SearchingResponse.java / dto/statistics/StatisticsResponse.java).
* ``startIndexing`` launches the build as a SUBPROCESS of
  ``tools/build_cli.py`` (its own Ray driver, exactly how a real cluster
  job is submitted); ``stopIndexing`` terminates it.  A killed build is
  RESUMABLE — the idempotent per-phase manifests (rayindex/segments.py)
  mean the next startIndexing continues where the stop landed, which is
  this engine's honest version of the reference's thread-interrupt stop
  (services/IndexingServiceImpl.java:33-60).
* ``indexPage`` filters the configured pages source to one url and runs
  the registered-delta incremental update (rayindex/incremental.py) —
  the single-page re-index analog of IndexingPageServiceImpl.java.
* The serving engine is swapped AFTER a build/indexPage completes (the
  generation bump below); in a real deployment the same role is played by
  ``SearchService.sync`` over a published versions root.

The server thread holds ONE QueryEngine (queries are read-only; the GIL
interleaves handler threads safely for numpy work).  For a multi-replica
tier put ``SearchService`` behind this handler instead — the routes do not
change.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class ApiServer:
    """The reference's ``/api`` HTTP service over a built index.

    ``pages_dir`` (the configured crawl corpus in input_hint schema) is
    required only for the indexing endpoints; a search-only deployment can
    omit it.
    """

    def __init__(self, index_dir: str, analyzer_spec: dict, *,
                 pages_dir: str | None = None, host: str = "127.0.0.1",
                 port: int = 0, k: int = 10, codec: str | None = None,
                 build_num_cpus: int | None = None):
        self.index_dir = index_dir
        self.analyzer_spec = analyzer_spec
        self.pages_dir = pages_dir
        self.k = k
        self.codec = codec
        self.build_num_cpus = build_num_cpus
        self._engine = None
        self._engine_gen = 0  # bumped when the on-disk index changed
        self._loaded_gen = -1
        self._lock = threading.Lock()
        self._build_proc: subprocess.Popen | None = None
        handler = _make_handler(self)
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> "ApiServer":
        self._thread.start()
        return self

    def close(self) -> None:
        if self._build_proc is not None and self._build_proc.poll() is None:
            self._build_proc.terminate()
            self._build_proc.wait()
        self._httpd.shutdown()
        self._httpd.server_close()

    @property
    def address(self) -> str:
        h, p = self._httpd.server_address[:2]
        return f"http://{h}:{p}"

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.close()

    # -- engine generation ---------------------------------------------------
    def engine(self):
        """The serving QueryEngine; reloaded when the index generation moved
        (a finished build or indexPage) — the single-process analog of the
        replica swap in serve.SearchService."""
        from .query import QueryEngine

        with self._lock:
            self._reap_build()
            if self._engine is None or self._loaded_gen != self._engine_gen:
                self._engine = QueryEngine(self.index_dir, self.analyzer_spec)
                self._loaded_gen = self._engine_gen
            return self._engine

    def _reap_build(self) -> None:
        """Notice a finished build subprocess (bumps the generation)."""
        if self._build_proc is not None and self._build_proc.poll() is not None:
            self._build_proc = None
            self._engine_gen += 1

    def _index_num_shards(self) -> int:
        """Shard count of the EXISTING on-disk tree (1 for a fresh/unbuilt
        index).  The indexing endpoints must PRESERVE it: rebuilding shard 0
        over the whole url space while other shards survive would duplicate
        every surviving shard's docs in the merged engine view."""
        from .segments import list_shards

        try:
            shards = list_shards(self.index_dir)
        except FileNotFoundError:
            return 1
        return max(len(shards), 1)

    # -- endpoint bodies (reference semantics) -------------------------------
    def statistics(self) -> tuple[int, dict]:
        try:
            out = self.engine().statistics()
        except FileNotFoundError:
            # isIndexing must still be reported, or the dashboard's toggle
            # can never show (or stop) an in-flight INITIAL build — nothing
            # is servable until it commits shard=0
            with self._lock:
                self._reap_build()
                busy = self._build_proc is not None
            return 200, {"result": False, "error": "index is not built yet",
                         "isIndexing": busy}
        # the dashboard's start/stop toggle follows total.isIndexing
        # (scripts.js:1651); here that state is the live build subprocess
        with self._lock:
            self._reap_build()
            busy = self._build_proc is not None
        total = out.get("statistics", {}).get("total")
        if isinstance(total, dict):
            total["isIndexing"] = busy
        return 200, out

    def search(self, query: str | None, site: str | None,
               limit: int | None) -> tuple[int, dict]:
        if not (query or "").strip():
            # SearchingServiceImpl rejects an empty query with this error
            return 400, {"result": False,
                         "error": "Задан пустой поисковый запрос"}
        try:
            eng = self.engine()
        except FileNotFoundError:
            return 200, {"result": False, "error": "index is not built yet"}
        if site:
            # the reference UI sends the site's URL (its dropdown values are
            # site.url, scripts.js:1524-1536); the engine keys sites by bare
            # host, so accept both forms
            site = site.split("://", 1)[-1].rstrip("/")
        return 200, eng.search(query, site=site or None,
                               k=limit or self.k, with_snippets=True)

    def start_indexing(self) -> tuple[int, dict]:
        with self._lock:
            self._reap_build()
            if self._build_proc is not None:
                # IndexingServiceImpl: already-running start is an error
                return 200, {"result": False,
                             "error": "Индексация уже запущена"}
            if not self.pages_dir:
                return 200, {"result": False,
                             "error": "no pages source configured"}
            os.makedirs(self.index_dir, exist_ok=True)
            spec_path = os.path.join(self.index_dir, "_http_analyzer.json")
            with open(spec_path, "w") as f:
                json.dump(self.analyzer_spec, f)
            cmd = [sys.executable,
                   os.path.join(_REPO_ROOT, "tools", "build_cli.py"),
                   "--pages", self.pages_dir, "--out", self.index_dir,
                   "--analyzer-spec-json", spec_path]
            n_shards = self._index_num_shards()
            if n_shards > 1:
                # a rebuild of an existing sharded tree must keep its url-hash
                # partitioning (build_cli defaults to one whole-space shard)
                cmd += ["--num-shards", str(n_shards)]
            if self.codec:
                cmd += ["--codec", self.codec]
            if self.build_num_cpus:
                cmd += ["--num-cpus", str(self.build_num_cpus)]
            self._build_proc = subprocess.Popen(
                cmd, cwd=_REPO_ROOT,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            return 200, {"result": True}

    def stop_indexing(self) -> tuple[int, dict]:
        with self._lock:
            self._reap_build()
            if self._build_proc is None:
                return 200, {"result": False,
                             "error": "Индексация не запущена"}
            self._build_proc.terminate()
            self._build_proc.wait()
            self._build_proc = None
            # idempotent phase manifests make the partial state resumable;
            # whatever committed is servable
            self._engine_gen += 1
            return 200, {"result": True}

    def index_page(self, url: str | None) -> tuple[int, dict]:
        if not url:
            return 400, {"result": False, "error": "url parameter required"}
        if not self.pages_dir:
            return 200, {"result": False,
                         "error": "no pages source configured"}
        import pyarrow.dataset as pads
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from .incremental import incremental_update

        t = pads.dataset(self.pages_dir, format="parquet").to_table(
            filter=pc.equal(pc.field("url"), url))
        if t.num_rows == 0:
            # IndexingPageServiceImpl.java:95 — page outside configured sites
            return 200, {"result": False,
                         "error": "Данная страница находится за пределами "
                                  "сайтов, указанных в конфигурационном файле"}
        with self._lock:
            gen = self._engine_gen + 1
            delta = os.path.join(self.index_dir, f"_delta_http_{gen}")
            os.makedirs(delta, exist_ok=True)
            pq.write_table(t, os.path.join(delta, "pages.parquet"))
            incremental_update(self.index_dir, self.pages_dir, delta,
                               self.analyzer_spec,
                               num_shards=self._index_num_shards())
            self._engine_gen = gen
        return 200, {"result": True}


def _make_handler(api: ApiServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet: the server is a test/ops tool
            pass

        def _reply(self, status: int, body: dict) -> None:
            data = json.dumps(body, ensure_ascii=False).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _send_page(self, html: str) -> None:
            data = html.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _route(self, method: str) -> None:
            u = urllib.parse.urlsplit(self.path)
            q = urllib.parse.parse_qs(u.query)
            if method == "POST":
                n = int(self.headers.get("Content-Length") or 0)
                if n:
                    q.update(urllib.parse.parse_qs(self.rfile.read(n).decode()))
            one = lambda k: (q.get(k) or [None])[0]
            try:
                if u.path in ("/", "/index.html") and method == "GET":
                    # the bundled dashboard (DefaultController.java:15-18)
                    from rayindex.webui import INDEX_HTML

                    self._send_page(INDEX_HTML)
                elif u.path == "/api/statistics" and method == "GET":
                    self._reply(*api.statistics())
                elif u.path == "/api/search" and method == "GET":
                    lim = one("limit")
                    self._reply(*api.search(one("query"), one("site"),
                                            int(lim) if lim else None))
                elif u.path == "/api/startIndexing" and method == "GET":
                    self._reply(*api.start_indexing())
                elif u.path == "/api/stopIndexing" and method == "GET":
                    self._reply(*api.stop_indexing())
                elif u.path == "/api/indexPage" and method == "POST":
                    self._reply(*api.index_page(one("url")))
                else:
                    self._reply(404, {"result": False, "error": "not found"})
            except Exception as exc:  # surface, don't kill the thread
                self._reply(500, {"result": False, "error": repr(exc)})

        def do_GET(self):
            self._route("GET")

        def do_POST(self):
            self._route("POST")

    return Handler
