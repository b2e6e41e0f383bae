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


def test_multi_term_queries_unaffected(prelisted):
    from rayindex.prelists import head_terms

    eng, _ = prelisted
    heads = head_terms(eng.index_root, 40)
    if len(heads) < 2:
        pytest.skip("fixture has a single head term")
    q = f"{heads['term'].iloc[0]} {heads['term'].iloc[1]}"
    assert eng.bm25_topk(q, k=10) == eng.bm25_exhaustive(q, k=10)
