"""Distributed query serving (rayindex.serve): the actor-pool replica tier
must emit exactly the rows the single-process engine does — independent of
batch boundaries and pool size."""

import pandas as pd
import pytest
import ray

from rayindex.query import QueryEngine
from rayindex.serve import batch_search


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(list(df.columns))
        .reset_index(drop=True)
        .astype({"score": "int64", "relevance": "float64"})
    )


def _sequential(eng, queries, site=None, k=None) -> pd.DataFrame:
    rows = []
    for q in queries:
        res = eng.search(q, site=site, k=k, with_snippets=False)
        meta = eng.doc_meta([r["doc_id"] for r in res["data"]])
        for r in res["data"]:
            rows.append(
                {
                    "query": q,
                    "url": meta[r["doc_id"]]["url"],
                    "score": int(r["abs"]),
                    "relevance": float(r["relevance"]),
                }
            )
    return pd.DataFrame(rows, columns=["query", "url", "score", "relevance"])


@pytest.fixture(scope="module")
def query_log(fixture_corpus):
    fx = fixture_corpus
    # single terms, conjunctions, an unknown word, and a repeated query —
    # enough to span several batches at batch_size=4
    qs = []
    for i in range(0, 40, 3):
        qs.append(fx.forms[fx.lemmas[i % len(fx.lemmas)]][0])
    for i in range(0, 24, 4):
        qs.append(
            fx.forms[fx.lemmas[i]][0] + " " + fx.forms[fx.lemmas[i + 1]][0]
        )
    qs.append("xyzzynotaword")
    qs.append(qs[0])
    return qs


def test_batch_search_equals_sequential(ray_session, built_index, fixture_corpus, query_log):
    eng = QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec)
    want = _sequential(eng, query_log)
    got = batch_search(
        built_index["out_dir"],
        fixture_corpus.analyzer_spec,
        query_log,
        batch_size=4,
        concurrency=(1, 3),
    ).to_pandas()
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_batch_search_topk_and_site(ray_session, built_index, fixture_corpus, query_log):
    eng = QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec)
    site = eng.statistics()["statistics"]["detailed"][0]["name"]
    want = _sequential(eng, query_log[:8], site=site, k=5)
    got = batch_search(
        built_index["out_dir"],
        fixture_corpus.analyzer_spec,
        query_log[:8],
        site=site,
        k=5,
        batch_size=3,
    ).to_pandas()
    assert len(got) == len(want)
    # k truncates per query by rank; rank ties share identical (score,
    # relevance), so set-of-rows equality per query still holds
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_batch_search_snippets(ray_session, built_index, fixture_corpus, query_log):
    """with_snippets=True: the full SearchingResponse presentation columns
    (title + F1-F4 snippet) come out of the replicas byte-identical to the
    single-process engine."""
    eng = QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec)
    qs = query_log[:6]
    rows = []
    for q in qs:
        for r in eng.search(q, k=5, with_snippets=True)["data"]:
            rows.append(
                {
                    "query": q,
                    "url": r["url"],
                    "score": int(r["abs"]),
                    "relevance": float(r["relevance"]),
                    "title": r["title"],
                    "snippet": r["snippet"],
                }
            )
    want = pd.DataFrame(
        rows, columns=["query", "url", "score", "relevance", "title", "snippet"]
    )
    got = batch_search(
        built_index["out_dir"], fixture_corpus.analyzer_spec, qs,
        k=5, with_snippets=True, batch_size=2,
    ).to_pandas()
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_batch_search_dataset_input_and_bm25(ray_session, built_index, fixture_corpus, query_log):
    import ray.data as rd

    eng = QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec)
    qs = query_log[:6]
    log = rd.from_items([{"query": q} for q in qs])
    got = batch_search(
        built_index["out_dir"], fixture_corpus.analyzer_spec, log,
        scorer="bm25", k=7, batch_size=2,
    ).to_pandas()
    rows = []
    for q in qs:
        hits = eng.bm25_topk(q, k=7)
        meta = eng.doc_meta([d for d, _ in hits])
        for doc_id, s in hits:
            rows.append({"query": q, "url": meta[doc_id]["url"],
                         "score": 0, "relevance": float(s)})
    want = pd.DataFrame(rows, columns=["query", "url", "score", "relevance"])
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


# ---------------------------------------------------------------------------
# Always-on serving tier (SearchService)


def test_service_equals_sequential(ray_session, built_index, fixture_corpus, query_log):
    from rayindex.serve import SearchService

    eng = QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec)
    want = _sequential(eng, query_log)
    svc = SearchService(
        built_index["out_dir"], fixture_corpus.analyzer_spec, num_replicas=3
    )
    try:
        got = svc.search_many(query_log, chunk_size=4).to_pandas()
        assert len(got) == len(want) > 0
        pd.testing.assert_frame_equal(_canon(got), _canon(want))
        # single-query path agrees with the pooled path
        one = svc.search(query_log[0]).to_pandas()
        pd.testing.assert_frame_equal(
            _canon(one), _canon(want[want["query"] == query_log[0]])
        )
    finally:
        svc.shutdown()


def test_service_round_robin_and_warm_latency(
    ray_session, built_index, fixture_corpus, query_log
):
    import time

    from rayindex.serve import SearchService

    svc = SearchService(
        built_index["out_dir"], fixture_corpus.analyzer_spec, num_replicas=3
    )
    try:
        svc.warmup(query_log[:6])
        st = svc.stats()
        assert st["num_replicas"] == 3
        # warmup hits EVERY replica
        assert all(c >= 6 for c in st["served_per_replica"])
        svc.search_many(query_log, chunk_size=2)
        st2 = svc.stats()
        # round-robin spread the chunks across all replicas
        assert all(
            b > a for a, b in zip(st["served_per_replica"], st2["served_per_replica"])
        )
        # warm repeat of one query is fast (caches held across calls)
        svc.search(query_log[0])
        t0 = time.monotonic()
        svc.search(query_log[0])
        assert time.monotonic() - t0 < 0.5
    finally:
        svc.shutdown()


def test_service_swap_index_zero_downtime(ray_session, built_index, fixture_corpus, tmp_path):
    """swap_index routes new queries to the new index while in-flight refs
    against the old replicas still resolve."""
    from rayindex.build import build_index
    from rayindex.fixtures import write_pages
    from rayindex.query import QueryEngine
    from rayindex.serve import SearchService

    fx = fixture_corpus
    # second index over HALF the corpus: results visibly differ
    pdir = str(tmp_path / "pages_half")
    half_dir = str(tmp_path / "idx_half")
    write_pages(fx.pages.slice(0, 100), pdir, n_fragments=2)
    build_index(pdir, half_dir, fx.analyzer_spec, num_buckets=4)

    # pick a term that survives the 80% cutoff on BOTH indexes and whose
    # match count differs between them (the swap must be observable)
    full_eng = QueryEngine(built_index["out_dir"], fx.analyzer_spec)
    half_eng = QueryEngine(half_dir, fx.analyzer_spec)
    q = want = full_rows = None
    for lem in fx.lemmas:
        cand = fx.forms[lem][0]
        n_full = len(full_eng.search(cand, k=None)["data"])
        n_half = len(half_eng.search(cand, k=None)["data"])
        if n_full > 0 and n_half > 0 and n_full != n_half:
            q, want, full_rows = cand, n_half, n_full
            break
    assert q is not None, "fixture corpus yielded no distinguishing term"
    svc = SearchService(built_index["out_dir"], fx.analyzer_spec, num_replicas=2)
    try:
        assert svc.search(q).num_rows == full_rows
        inflight = svc.submit(q)  # issued against the OLD replicas
        svc.swap_index(half_dir, warmup_queries=[q])
        assert ray.get(inflight).num_rows == full_rows  # old ref still resolves
        got = svc.search(q)
        assert got.num_rows == want != full_rows
    finally:
        svc.shutdown()


def test_publish_and_sync(ray_session, built_index, fixture_corpus, tmp_path):
    """publish_index flips an atomic CURRENT pointer after validation;
    SearchService.sync swaps only when the pointer moved."""
    from rayindex.build import build_index
    from rayindex.fixtures import write_pages
    from rayindex.publish import current_record, publish_index, resolve_current
    from rayindex.serve import SearchService

    fx = fixture_corpus
    root = str(tmp_path / "versions")
    # a half-written index (no manifests) must be rejected BEFORE the flip
    bogus = str(tmp_path / "bogus" / "shard=0")
    import os as _os
    _os.makedirs(bogus)
    with pytest.raises(ValueError):
        publish_index(root, str(tmp_path / "bogus"))
    assert not _os.path.exists(_os.path.join(root, "CURRENT"))

    publish_index(root, built_index["out_dir"], version="v1")
    assert resolve_current(root) == _os.path.abspath(built_index["out_dir"])
    assert current_record(root)["version"] == "v1"

    svc = SearchService(built_index["out_dir"], fx.analyzer_spec, num_replicas=2)
    try:
        assert svc.sync(root) is False  # already serving CURRENT

        pdir = str(tmp_path / "pages_half")
        half = str(tmp_path / "idx_half")
        write_pages(fx.pages.slice(0, 100), pdir, n_fragments=2)
        build_index(pdir, half, fx.analyzer_spec, num_buckets=4)
        publish_index(root, half, version="v2")
        assert svc.sync(root) is True
        assert svc.sync(root) is False  # idempotent
        # rollback: republish v1, sync follows
        publish_index(root, built_index["out_dir"], version="v1")
        assert svc.sync(root) is True
    finally:
        svc.shutdown()


def test_sync_detects_same_path_republish(ray_session, built_index, fixture_corpus, tmp_path):
    """A rebuild republished INTO THE SAME directory must still trigger a
    swap — replica caches hold pre-rebuild bytes; comparing the served path
    alone misses it."""
    from rayindex.publish import publish_index
    from rayindex.serve import SearchService

    root = str(tmp_path / "versions")
    publish_index(root, built_index["out_dir"], version="v1")
    svc = SearchService(built_index["out_dir"], fixture_corpus.analyzer_spec,
                        num_replicas=2)
    try:
        assert svc.sync(root) is False  # first sync adopts the record
        old = set(id(r) for r in svc._replicas)
        # simulate an in-place rebuild: republish the SAME path, new record
        publish_index(root, built_index["out_dir"], version="v1-rebuilt")
        assert svc.sync(root) is True
        assert set(id(r) for r in svc._replicas) != old  # fresh replica set
        assert svc.sync(root) is False
    finally:
        svc.shutdown()


def test_swap_index_capacity_timeout(ray_session, built_index, fixture_corpus):
    """When the cluster cannot schedule the replacement replica set, the
    swap raises instead of hanging forever, and the OLD set keeps serving."""
    import pytest as _pytest

    from rayindex.serve import SearchService

    fx = fixture_corpus
    svc = SearchService(built_index["out_dir"], fx.analyzer_spec,
                        num_replicas=2, num_cpus=0.5)
    try:
        q = fx.forms[fx.lemmas[0]][0]
        before = svc.search(q).num_rows
        svc._num_cpus = 10_000  # replacement set can never schedule
        with _pytest.raises(RuntimeError, match="2x capacity"):
            svc.swap_index(built_index["out_dir"], ready_timeout_s=2.0)
        svc._num_cpus = 0.5
        assert svc.search(q).num_rows == before  # old replicas intact
    finally:
        svc.shutdown()


def test_service_result_cache_identical_and_counted(
    ray_session, built_index, fixture_corpus, query_log
):
    """The per-replica FIFO result cache must be invisible in the output:
    cached, uncached and duplicate-in-chunk serves are byte-identical to the
    no-cache service, hits are counted, and the cap evicts FIFO."""
    from rayindex.serve import SearchService

    # duplicates WITHIN a chunk and across calls
    qs = query_log[:4] + [query_log[0], query_log[1], query_log[0]]
    svc_off = SearchService(
        built_index["out_dir"], fixture_corpus.analyzer_spec,
        num_replicas=1, result_cache_entries=0,
    )
    svc_on = SearchService(
        built_index["out_dir"], fixture_corpus.analyzer_spec,
        num_replicas=1, result_cache_entries=3,
    )
    try:
        want = svc_off.search_many(qs, chunk_size=len(qs)).to_pandas()
        got1 = svc_on.search_many(qs, chunk_size=len(qs)).to_pandas()
        # one chunk, one replica → row order must match exactly
        pd.testing.assert_frame_equal(got1, want)
        st = svc_on.stats()
        # the three duplicate occurrences were cache hits
        assert st["result_cache_hits"] == [3]
        assert svc_off.stats()["result_cache_hits"] == [0]
        # repeat serve: every cached query hits; evicted ones recompute —
        # output identical either way
        got2 = svc_on.search_many(qs, chunk_size=len(qs)).to_pandas()
        pd.testing.assert_frame_equal(got2, want)
        assert svc_on.stats()["result_cache_hits"][0] > 3
    finally:
        svc_off.shutdown()
        svc_on.shutdown()
