"""Regressions for the second round-4 self-review (session 2026-08-19):

1. The HTTP indexing endpoints must PRESERVE an existing tree's shard count
   (startIndexing passing --num-shards, indexPage passing num_shards to the
   incremental update) — a single-shard rebuild over a 2-shard tree would
   duplicate every surviving shard's docs.
2. statistics() must report isIndexing even while nothing is servable yet,
   or the dashboard can never show/stop the initial build.
3. Corpus-derived URLs are scheme-allow-listed before reaching href
   (javascript: is click-to-execute XSS otherwise).
4. A FAILED swap_index must not commit the new index's locator refs (they
   would pin unused tables for the service lifetime) nor drop the serving
   ones.
5. batch_search accepts precomputed share_locators refs so repeated jobs
   reuse one object-store copy.
6. QueryEngine.statistics() memoizes the lemma counts (the dashboard polls
   every 5 s; the scan fallback must not re-run per poll).
7. Full-range multi-shard build_cli jobs write the root site_lemmas_global
   sidecar (outside the timed build wall).
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _FakeProc:
    """Popen stand-in: records the cmd, stays 'running' until terminated."""

    def __init__(self, cmd, **kwargs):
        self.cmd = cmd
        self._rc = None

    def poll(self):
        return self._rc

    def terminate(self):
        self._rc = 0

    def wait(self, timeout=None):
        self._rc = 0 if self._rc is None else self._rc
        return self._rc


@pytest.fixture(scope="module")
def sharded_index(ray_session, built_index, fixture_corpus, tmp_path_factory):
    """One 2-shard build_all tree shared by the multi-shard HTTP tests."""
    from rayindex.build import build_all

    root = str(tmp_path_factory.mktemp("r4b") / "sharded")
    build_all(built_index["pages_dir"], root, fixture_corpus.analyzer_spec,
              num_shards=2, num_buckets=8, lemma_batch_size=64)
    return root


def test_start_indexing_preserves_shard_count(sharded_index, built_index,
                                              fixture_corpus, tmp_path,
                                              monkeypatch):
    """startIndexing over a 2-shard tree must pass --num-shards 2 to the
    build job; over a single-shard tree it must not add the flag."""
    from rayindex import http_api
    from rayindex.http_api import ApiServer

    captured: list[list[str]] = []

    def fake_popen(cmd, **kwargs):
        p = _FakeProc(cmd, **kwargs)
        captured.append(list(cmd))
        return p

    monkeypatch.setattr(http_api.subprocess, "Popen", fake_popen)

    two = str(tmp_path / "two")
    shutil.copytree(sharded_index, two)
    srv = ApiServer(two, fixture_corpus.analyzer_spec,
                    pages_dir=built_index["pages_dir"])
    assert srv._index_num_shards() == 2
    st, body = srv.start_indexing()
    assert body["result"] is True
    i = captured[-1].index("--num-shards")
    assert captured[-1][i + 1] == "2"
    srv._build_proc.terminate()
    srv._build_proc = None

    one = str(tmp_path / "one")
    shutil.copytree(built_index["out_dir"], one)
    srv1 = ApiServer(one, fixture_corpus.analyzer_spec,
                     pages_dir=built_index["pages_dir"])
    assert srv1._index_num_shards() == 1
    st, body = srv1.start_indexing()
    assert body["result"] is True
    assert "--num-shards" not in captured[-1]
    srv1._build_proc.terminate()
    srv1._build_proc = None
    srv._httpd.server_close()
    srv1._httpd.server_close()


def test_index_page_multishard_no_duplication(ray_session, sharded_index,
                                              built_index, fixture_corpus,
                                              tmp_path):
    """indexPage on a 2-shard tree re-indexes through the SAME sharding; a
    single-shard rebuild would leave the other shard's docs duplicated in
    the merged engine view (pages count would grow)."""
    from rayindex.http_api import ApiServer
    from rayindex.query import QueryEngine

    idx = str(tmp_path / "idx")
    shutil.copytree(sharded_index, idx)
    srv = ApiServer(idx, fixture_corpus.analyzer_spec,
                    pages_dir=built_index["pages_dir"])
    url = None
    eng0 = QueryEngine(idx, fixture_corpus.analyzer_spec)
    pages_before = eng0.statistics()["statistics"]["total"]["pages"]
    q = next(
        q["query"] for q in fixture_corpus.queries
        if eng0.search(q["query"], k=None, with_snippets=False)["count"] > 0
    )
    before = eng0.search(q, k=10, with_snippets=False)
    # pick a url that hashes into shard 1 (the shard a num_shards=1 rebuild
    # would NOT touch — the duplication scenario)
    import pyarrow.dataset as pads

    import numpy as np

    from rayindex.schema import hash64_strings

    urls = pads.dataset(built_index["pages_dir"]).to_table(
        columns=["url"]).column("url").to_pylist()
    for u in urls:
        # np.uint64 % python-int promotes to float64 and loses precision —
        # mirror the build's exact expression (uint64 modulus)
        if int(hash64_strings(np.array([u], dtype=object))[0]
               % np.uint64(2)) == 1:
            url = u
            break
    assert url is not None
    st, body = srv.index_page(url)
    assert body["result"] is True, body
    eng1 = QueryEngine(idx, fixture_corpus.analyzer_spec)
    assert len(eng1.shard_dirs) == 2  # still sharded, no whole-space shard 0
    # the rebuilt shard must keep the TREE's bucket count (an incremental
    # rebuild under the default count would vanish from bucket-pruned
    # lookups — the engine now also refuses mixed-layout trees outright)
    for d in eng1.shard_dirs:
        assert json.load(open(os.path.join(d, "stats.json")))["num_buckets"] == 8
    assert eng1.statistics()["statistics"]["total"]["pages"] == pages_before
    assert eng1.search(q, k=10, with_snippets=False) == before
    srv._httpd.server_close()


def test_statistics_not_built_reports_isindexing(built_index, fixture_corpus,
                                                 tmp_path, monkeypatch):
    """Before the first build commits shard=0, /api/statistics must still
    carry isIndexing so the dashboard toggle can show/stop the build."""
    from rayindex import http_api
    from rayindex.http_api import ApiServer

    monkeypatch.setattr(http_api.subprocess, "Popen",
                        lambda cmd, **kw: _FakeProc(cmd))
    empty = str(tmp_path / "fresh")
    srv = ApiServer(empty, fixture_corpus.analyzer_spec,
                    pages_dir=built_index["pages_dir"])
    st, body = srv.statistics()
    assert body["result"] is False and body["isIndexing"] is False
    st, body = srv.start_indexing()
    srv._httpd.server_close()
    assert body["result"] is True
    st, body = srv.statistics()
    assert body["result"] is False, body
    assert body["isIndexing"] is True
    st, body = srv.stop_indexing()
    assert body["result"] is True
    st, body = srv.statistics()
    assert body["result"] is False and body["isIndexing"] is False


def test_dashboard_url_scheme_allowlist_and_helpers():
    """The pure JS helpers: safeUrl neutralizes non-http(s) schemes (XSS via
    href), esc/snip keep only the builder's <b> bolding.  Run under node
    (skipped where absent) against the EXACT helper source served to
    browsers."""
    import re
    import shutil as _sh

    if not _sh.which("node"):
        pytest.skip("node not available")
    from rayindex.webui import INDEX_HTML

    script = re.search(r"<script>(.*?)</script>", INDEX_HTML, re.S).group(1)
    lines = script.splitlines()
    starts = [i for i, ln in enumerate(lines)
              if ln.startswith(("const esc", "const snip", "const safeUrl"))]
    assert len(starts) == 3, "helper definitions moved — update the test"
    # esc spans two lines; snip and safeUrl are single-line
    defs = "\n".join(lines[starts[0]:starts[0] + 2]
                     + [lines[starts[1]], lines[starts[2]]])
    code = defs + """
const assert = require('assert');
assert.strictEqual(safeUrl('javascript:alert(1)'), '#');
assert.strictEqual(safeUrl('data:text/html,x'), '#');
assert.strictEqual(safeUrl('vbscript:x'), '#');
assert.strictEqual(safeUrl(''), '#');
assert.strictEqual(safeUrl(null), '#');
assert.strictEqual(safeUrl(undefined), '#');
assert.strictEqual(safeUrl('https://a/b?c=1'), 'https://a/b?c=1');
assert.strictEqual(safeUrl('HTTP://a'), 'HTTP://a');
assert.strictEqual(esc('<img src=x onerror=y>'),
                   '&lt;img src=x onerror=y&gt;');
assert.strictEqual(snip('<b>hit</b> & <i>x</i>'),
                   '<b>hit</b> &amp; &lt;i&gt;x&lt;/i&gt;');
console.log('JS_HELPERS_OK');
"""
    p = subprocess.run(["node", "-"], input=code, capture_output=True,
                       text=True, timeout=60)
    assert p.returncode == 0, p.stderr
    assert "JS_HELPERS_OK" in p.stdout
    # the tab router must fall back to the dashboard on unknown anchors
    assert 'id = "dashboard"' in script


def test_failed_swap_keeps_serving_locator_refs(ray_session, built_index,
                                                fixture_corpus):
    """A swap that cannot schedule its replacement set must leave
    _locator_refs (the service-held pins of the SERVING index's shared
    locator tables) untouched; a successful swap commits fresh refs."""
    from rayindex.serve import SearchService

    fx = fixture_corpus
    svc = SearchService(built_index["out_dir"], fx.analyzer_spec,
                        num_replicas=1, num_cpus=0.5)
    try:
        assert svc._locator_refs  # share_locator default on
        refs_before = svc._locator_refs
        q = fx.forms[fx.lemmas[0]][0]
        before = svc.search(q).num_rows
        svc._num_cpus = 10_000
        with pytest.raises(RuntimeError, match="2x capacity"):
            svc.swap_index(built_index["out_dir"], ready_timeout_s=2.0)
        assert svc._locator_refs is refs_before  # failed swap: no commit
        assert svc.search(q).num_rows == before
        svc._num_cpus = 0.5
        svc.swap_index(built_index["out_dir"], ready_timeout_s=60.0)
        assert svc._locator_refs is not refs_before  # success: committed
        assert svc.search(q).num_rows == before
    finally:
        svc.shutdown()


def test_batch_search_accepts_precomputed_locator_refs(
        ray_session, built_index, fixture_corpus):
    """Repeated batch jobs can reuse ONE share_locators() load."""
    import pandas as pd

    from rayindex.serve import batch_search, share_locators

    fx = fixture_corpus
    qs = [fx.forms[fx.lemmas[i]][0] for i in range(6)]
    refs = share_locators(built_index["out_dir"])

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    base = batch_search(built_index["out_dir"], fx.analyzer_spec, qs,
                        batch_size=3, concurrency=(1, 2)).to_pandas()
    reused = batch_search(built_index["out_dir"], fx.analyzer_spec, qs,
                          batch_size=3, concurrency=(1, 2),
                          shared_locators=refs).to_pandas()
    assert len(base) > 0
    pd.testing.assert_frame_equal(canon(base), canon(reused))


def test_statistics_memoized_per_engine(built_index, fixture_corpus):
    """The dashboard polls statistics every 5 s — the sidecar read (or worse,
    the fallback dictionary scan) must run at most once per engine."""
    from rayindex.query import QueryEngine

    e = QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec)
    first = e.statistics()

    def boom(*a, **k):
        raise AssertionError("statistics() re-read the index on a re-poll")

    e._site_lemmas_sidecar = boom
    e._scan_term_stats = boom
    assert e.statistics() == first
    # callers annotate the response in place (http_api adds isIndexing):
    # the returned dict must be fresh per call, not the cached object
    first["statistics"]["total"]["isIndexing"] = True
    assert "isIndexing" not in e.statistics()["statistics"]["total"]


def test_build_cli_full_range_writes_global_sidecar(built_index,
                                                    fixture_corpus, tmp_path):
    """A full-range multi-shard build_cli job (the HTTP startIndexing path
    for sharded trees) must write site_lemmas_global, timed OUTSIDE
    build_wall_sec so the N-level scaling job is not biased."""
    out = str(tmp_path / "cli_sharded")
    spec_path = str(tmp_path / "spec.json")
    with open(spec_path, "w") as f:
        json.dump(fixture_corpus.analyzer_spec, f)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "build_cli.py"),
         "--pages", built_index["pages_dir"], "--out", out,
         "--analyzer-spec-json", spec_path, "--num-shards", "2",
         "--num-buckets", "8", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert p.returncode == 0, p.stderr[-2000:]
    done = json.loads(p.stdout.strip().splitlines()[-1])
    assert done["done"] is True and done["shards"] == [0, 1]
    assert "site_lemmas_global_sec" in done
    assert os.path.exists(
        os.path.join(out, "site_lemmas_global", "site_lemmas.parquet"))
    # the engine over the CLI-built tree takes the sidecar path
    from rayindex.query import QueryEngine

    e = QueryEngine(out, fixture_corpus.analyzer_spec)
    assert e._site_lemmas_sidecar() is not None
    single = QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec)
    assert e.statistics() == single.statistics()
