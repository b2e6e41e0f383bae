"""Impact-ordered head-term prelists (r4 VERDICT #4): build-time artifact
serving single-dense-term BM25 top-k in O(k), rank-identical to the
exhaustive scorer, with honest fallbacks when the artifact can't answer."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def prelisted(built_index, fixture_corpus):
    from rayindex.prelists import build_prelists
    from rayindex.query import QueryEngine

    summary = build_prelists(
        built_index["out_dir"], df_threshold=40, n_top=64
    )
    eng = QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec)
    return eng, summary


def test_build_summary_and_meta(prelisted):
    from rayindex.prelists import load_meta

    eng, summary = prelisted
    assert summary["n_terms"] >= 1  # the fixture salts head terms at df≥40
    meta = load_meta(eng.index_root)
    assert meta["n_docs"] == eng.n_docs
    assert meta["k1"] == eng.k1 and meta["b"] == eng.b


def test_prelist_order_matches_exhaustive(prelisted):
    """For every prelisted term the stored prefix must equal the exhaustive
    single-term top-k — rank AND score identical."""
    from rayindex.prelists import head_terms

    eng, _ = prelisted
    heads = head_terms(eng.index_root, 40)
    assert len(heads)
    for term in heads["term"]:
        served = eng._bm25_prelist_single(term, 10)
        assert served is not None, term
        exact = eng.bm25_exhaustive(term, 10)
        assert [d for d, _ in served] == [d for d, _ in exact], term
        assert np.allclose([s for _, s in served], [s for _, s in exact],
                           rtol=0, atol=0), term


def test_auto_routes_single_dense_term_to_prelist(prelisted, monkeypatch):
    from rayindex.prelists import head_terms

    eng, _ = prelisted
    term = head_terms(eng.index_root, 40)["term"].iloc[0]
    calls = {"full": 0}
    orig = eng._decoded

    def counting(t):
        calls["full"] += 1
        return orig(t)

    monkeypatch.setattr(eng, "_decoded", counting)
    got = eng.bm25_topk(term, k=10)
    assert len(got) == 10
    assert calls["full"] == 0  # never decoded the full posting list


def test_truncated_below_k_falls_back(built_index, fixture_corpus):
    """k larger than the stored prefix (for a truncated list) must refuse
    the artifact, not return a silently short/wrong answer."""
    from rayindex.prelists import build_prelists, head_terms, read_prelist
    from rayindex.query import QueryEngine

    import shutil
    import os

    root = built_index["out_dir"]
    heads = head_terms(root, 40)
    term = heads["term"].iloc[0]
    df = int(heads["df"].iloc[0])
    assert df > 8
    # rebuild the artifact with a tiny prefix into a COPY of the tree
    tmp = root + "_tiny_prelists"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    shutil.copytree(root, tmp)
    shutil.rmtree(os.path.join(tmp, "prelists"), ignore_errors=True)
    build_prelists(tmp, df_threshold=40, n_top=8)
    eng = QueryEngine(tmp, fixture_corpus.analyzer_spec)
    stored = read_prelist(tmp, term)
    assert len(stored[0]) == 8
    assert eng._bm25_prelist_single(term, 20) is None  # truncated below k
    # the k ≤ prefix case still serves and matches exhaustive
    served = eng._bm25_prelist_single(term, 5)
    exact = eng.bm25_exhaustive(term, 5)
    assert [d for d, _ in served] == [d for d, _ in exact]
    shutil.rmtree(tmp, ignore_errors=True)


def test_param_drift_invalidates(prelisted, fixture_corpus):
    from rayindex.query import QueryEngine

    eng, _ = prelisted
    other = QueryEngine(eng.index_root, fixture_corpus.analyzer_spec, k1=0.9)
    assert not other._prelists_valid()
    # and the query still answers correctly through the full path
    from rayindex.prelists import head_terms

    term = head_terms(eng.index_root, 40)["term"].iloc[0]
    got = other.bm25_topk(term, k=5)
    exact = other.bm25_exhaustive(term, k=5)
    assert got == exact


def test_empty_head_set_writes_meta_and_serves(built_index, fixture_corpus,
                                               tmp_path):
    """A threshold above every df yields zero prelisted terms: meta is still
    written, the engine honors the (empty) artifact, and every query routes
    through the full path."""
    import os
    import shutil

    from rayindex.prelists import build_prelists, head_terms, load_meta
    from rayindex.query import QueryEngine

    root = built_index["out_dir"]
    tmp = str(tmp_path / "idx_empty_heads")
    shutil.copytree(root, tmp)
    shutil.rmtree(os.path.join(tmp, "prelists"), ignore_errors=True)
    s = build_prelists(tmp, df_threshold=10**9)
    assert s["n_terms"] == 0
    assert load_meta(tmp) is not None
    assert len(head_terms(tmp, 10**9)) == 0
    eng = QueryEngine(tmp, fixture_corpus.analyzer_spec)
    assert eng._prelists_valid()
    assert eng._bm25_prelist_single("anything", 5) is None
    got = eng.bm25_topk("anything", k=5)
    assert got == eng.bm25_exhaustive("anything", k=5)


def test_audit_flags_stale_prelists(prelisted, tmp_path):
    """fsck surfaces the same staleness gate the engine enforces: a healthy
    prelisted tree audits clean; tampered artifact stats are flagged."""
    import json
    import os
    import shutil

    from rayindex.audit import audit_index

    eng, _ = prelisted
    vio = audit_index(eng.index_root, check_df=False)
    assert not (vio["check"].astype(str).str.startswith("prelists")).any()

    tmp = str(tmp_path / "idx_stale_prelists")
    shutil.copytree(eng.index_root, tmp)
    mp = os.path.join(tmp, "prelists", "meta.json")
    meta = json.load(open(mp))
    meta["n_docs"] += 1
    with open(mp, "w") as f:
        json.dump(meta, f)
    vio = audit_index(tmp, check_df=False)
    assert (vio["check"] == "prelists_stale").any()


def test_delta_reindex_regenerates_prelists(ray_session, fixture_corpus,
                                            tmp_path):
    """incremental_update on a prelisted tree rewrites the artifact with its
    own recorded knobs, so the engine keeps the O(k) path (valid meta,
    identical ranks) instead of silently falling back."""
    import pyarrow as pa

    from rayindex.build import build_all
    from rayindex.fixtures import write_pages
    from rayindex.incremental import incremental_update
    from rayindex.prelists import build_prelists, head_terms, load_meta
    from rayindex.query import QueryEngine

    pages = fixture_corpus.pages.slice(0, 60)
    pdir = str(tmp_path / "pages")
    write_pages(pages, pdir, 4)
    out = str(tmp_path / "idx")
    build_all(pdir, out, fixture_corpus.analyzer_spec, num_shards=2, num_buckets=4)
    build_prelists(out, df_threshold=10, n_top=64)
    heads_before = head_terms(out, 10)
    assert len(heads_before)

    # delta: replace one page's content (text change → stats change)
    row = pages.slice(7, 1).to_pylist()[0]
    delta = pa.table(
        {
            "url": pa.array([row["url"]], pa.string()),
            "warc_ts": pa.array(
                [int(row["warc_ts"].timestamp() * 1_000_000) + 10_000_000],
                pa.timestamp("us"),
            ),
            "html": pa.array([b"<html><body>tiny delta body</body></html>"], pa.binary()),
            "text": pa.array([None], pa.string()),
            "lang": pa.array(["ru"], pa.string()),
        }
    )
    ddir = str(tmp_path / "delta")
    write_pages(delta, ddir, 1)
    res = incremental_update(out, pdir, ddir, fixture_corpus.analyzer_spec,
                             num_shards=2, num_buckets=4)
    assert "prelists" in res  # regenerated by the orchestrator
    assert int(res["prelists"]["df_threshold"]) == 10  # knobs inherited

    eng = QueryEngine(out, fixture_corpus.analyzer_spec)
    assert eng._prelists_valid()  # meta matches the POST-delta stats
    meta = load_meta(out)
    assert meta["n_docs"] == eng.n_docs and meta["total_tf"] == eng.total_tf
    for term in head_terms(out, 10)["term"].head(3):
        served = eng._bm25_prelist_single(term, 5)
        assert served is not None, term
        assert served == eng.bm25_exhaustive(term, 5), term


def test_multi_term_queries_unaffected(prelisted):
    from rayindex.prelists import head_terms

    eng, _ = prelisted
    heads = head_terms(eng.index_root, 40)
    if len(heads) < 2:
        pytest.skip("fixture has a single head term")
    q = f"{heads['term'].iloc[0]} {heads['term'].iloc[1]}"
    assert eng.bm25_topk(q, k=10) == eng.bm25_exhaustive(q, k=10)
