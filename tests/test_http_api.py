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
