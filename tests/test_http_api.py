"""HTTP surface parity (rayindex/http_api.py): the reference's /api
endpoints (controllers/ApiController.java:35-58) served over the Ray-native
engine — response shapes, error semantics, single-page re-index, and the
subprocess start/stop indexing lifecycle."""

from __future__ import annotations

import json
import shutil
import time
import urllib.error
import urllib.parse
import urllib.request

import pytest


def _call(srv, path, method="GET", **params):
    url = srv.address + path
    data = None
    if method == "POST":
        data = urllib.parse.urlencode(params).encode()
    elif params:
        url += "?" + urllib.parse.urlencode(params)
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def api(ray_session, built_index, fixture_corpus, tmp_path):
    from rayindex.http_api import ApiServer

    # own copy: the indexing endpoints mutate the index in place
    idx = str(tmp_path / "idx")
    shutil.copytree(built_index["out_dir"], idx)
    srv = ApiServer(idx, fixture_corpus.analyzer_spec,
                    pages_dir=built_index["pages_dir"], build_num_cpus=2)
    with srv:
        yield srv


def test_search_and_statistics_shapes(api, fixture_corpus):
    q = next(
        q["query"] for q in fixture_corpus.queries
        if api.engine().search(q["query"], k=None, with_snippets=False)["count"] > 0
    )
    st, body = _call(api, "/api/search", query=q, limit=5)
    assert st == 200 and body["result"] is True
    want = api.engine().search(q, k=5, with_snippets=True)
    assert body["count"] == want["count"]
    assert [r["url"] for r in body["data"]] == [r["url"] for r in want["data"]]
    assert all("snippet" in r and "title" in r for r in body["data"])

    st, body = _call(api, "/api/search", query="   ")
    assert st == 400 and body["result"] is False  # empty-query error

    st, body = _call(api, "/api/statistics")
    assert st == 200 and body["result"] is True
    assert body["statistics"]["total"]["pages"] == len(fixture_corpus.pages)

    st, body = _call(api, "/api/nope")
    assert st == 404


def test_index_page_delta(api, fixture_corpus):
    url = fixture_corpus.pages.column("url")[0].as_py()
    q = next(
        q["query"] for q in fixture_corpus.queries
        if api.engine().search(q["query"], k=None, with_snippets=False)["count"] > 0
    )
    before = api.engine().search(q, k=10, with_snippets=False)

    st, body = _call(api, "/api/indexPage", method="POST", url=url)
    assert st == 200 and body["result"] is True, body
    # same page content re-indexed -> identical results through a fresh engine
    after = api.engine().search(q, k=10, with_snippets=False)
    assert after == before

    st, body = _call(api, "/api/indexPage", method="POST",
                     url="https://nowhere.invalid/x")
    assert st == 200 and body["result"] is False
    assert "за пределами" in body["error"]  # IndexingPageServiceImpl.java:95


def test_start_stop_indexing_lifecycle(api, fixture_corpus):
    # stop while idle: the reference's not-running error
    st, body = _call(api, "/api/stopIndexing")
    assert st == 200 and body["result"] is False

    st, body = _call(api, "/api/startIndexing")
    assert st == 200 and body["result"] is True
    # either we catch it running (second start rejected) or the resume-skip
    # build already finished; both are legal states
    st, again = _call(api, "/api/startIndexing")
    if again["result"] is False:
        assert "запущена" in again["error"]
        st, body = _call(api, "/api/stopIndexing")
        assert body["result"] is True  # terminate is resumable by design
    else:
        _call(api, "/api/stopIndexing")

    # whatever the stop landed on, committed phases keep the index servable
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        st, body = _call(api, "/api/statistics")
        if st == 200 and body.get("result") is True:
            break
        time.sleep(1)
    assert body["result"] is True
    q = fixture_corpus.queries[0]["query"]
    st, body = _call(api, "/api/search", query=q)
    assert st == 200 and body["result"] is True

def test_dashboard_page(api):
    """GET / serves the bundled dashboard (DefaultController.java:15-18,
    templates/index.html) — self-contained HTML that drives the five JSON
    endpoints; statistics gains the total.isIndexing field its toggle reads
    (scripts.js:1651)."""
    with urllib.request.urlopen(api.address + "/", timeout=30) as r:
        assert r.status == 200
        assert r.headers.get_content_type() == "text/html"
        html = r.read().decode()
    # the three tabs and every endpoint the page drives
    for needle in ("#dashboard", "#management", "#search",
                   "/api/statistics", "/api/search", "/api/startIndexing",
                   "/api/stopIndexing", "/api/indexPage",
                   "totalSites", "totalPages", "totalLemmas"):
        assert needle in html, needle
    # no external assets: the container is offline
    assert "<script src" not in html and "<link" not in html
    assert 'src="http' not in html and 'href="http' not in html

    st, body = _call(api, "/api/statistics")
    assert st == 200 and body["statistics"]["total"]["isIndexing"] is False


def test_dashboard_script_parses():
    """The dashboard's inline JS must be syntactically valid — no browser in
    the container, so `node --check` is the parser of record (skipped where
    node is absent)."""
    import re
    import subprocess
    import shutil as _sh

    if not _sh.which("node"):
        pytest.skip("node not available")
    from rayindex.webui import INDEX_HTML

    scripts = re.findall(r"<script>(.*?)</script>", INDEX_HTML, re.S)
    assert scripts, "dashboard page has no inline script"
    for body in scripts:
        p = subprocess.run(["node", "--check", "--input-type=module", "-"],
                           input=body, capture_output=True, text=True)
        if p.returncode != 0:
            # older node: --check needs a file, not stdin
            import tempfile

            with tempfile.NamedTemporaryFile("w", suffix=".js", delete=False) as f:
                f.write(body)
            p = subprocess.run(["node", "--check", f.name],
                               capture_output=True, text=True)
        assert p.returncode == 0, p.stderr


def test_search_site_accepts_url_form(api, fixture_corpus):
    """The dashboard's site dropdown sends the site URL (scripts.js values
    are site.url); the endpoint must treat it like the bare host."""
    q = next(
        q["query"] for q in fixture_corpus.queries
        if api.engine().search(q["query"], k=None, with_snippets=False)["count"] > 0
    )
    _, by_name = _call(api, "/api/search", query=q, site="fixture.example")
    _, by_url = _call(api, "/api/search", query=q, site="https://fixture.example")
    assert by_name["count"] > 0
    assert by_url["count"] == by_name["count"]
    assert [r["url"] for r in by_url["data"]] == [r["url"] for r in by_name["data"]]
