"""Regression tests for the round-3 ADVICE.md findings fixed in round 4."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_pages_from_documents_rejects_doc_id_not_row_index(tmp_path):
    """ADVICE r3: the oracle SQL reconstructs warc_ts from doc_id, which is
    only valid because doc_id == row index in the driver's documents table —
    a corpus violating that must fail loudly, not silently diverge."""
    from rayindex.fixtures import pages_from_documents

    docs = pa.table(
        {
            "doc_id": pa.array([5, 7], pa.int64()),  # NOT 0..n-1
            "text": pa.array(["alpha beta", "gamma delta"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["web", "web"], pa.string()),
        }
    )
    p = tmp_path / "documents.parquet"
    pq.write_table(docs, str(p))
    with pytest.raises(ValueError, match="row index"):
        pages_from_documents(str(p), str(tmp_path / "pages"))


def test_pages_from_documents_ts_from_doc_id(tmp_path):
    """The warc_ts stamp derives from doc_id (EPOCH + doc_id·1s at repeat=1),
    matching the oracle reconstruction rule by construction."""
    from rayindex.fixtures import _EPOCH_US, pages_from_documents

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["alpha beta", "gamma delta", "eps zeta"], pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["web"] * 3, pa.string()),
        }
    )
    p = tmp_path / "documents.parquet"
    pq.write_table(docs, str(p))
    out = pages_from_documents(str(p), str(tmp_path / "pages"))
    pages = pq.read_table(out)
    ts = sorted(pages.column("warc_ts").cast(pa.int64()).to_pylist())
    assert ts == [_EPOCH_US, _EPOCH_US + 1_000_000, _EPOCH_US + 2_000_000]


def test_ts_for_returns_found_mask_not_sentinel(engine):
    """ADVICE r3: unknown docids are reported via a boolean mask, so a
    legitimate pre-1970 (negative epoch-µs) timestamp can never be confused
    with a miss."""
    # one real docid + one id that cannot exist in the 200-page fixture
    df = engine.term_df_table()
    assert len(df), "fixture index should have terms"
    some_doc = None
    for t in df["term"].head(20):
        docs, _tfs, _sites = engine._decoded(str(t))
        if len(docs):
            some_doc = int(docs[0])
            break
    assert some_doc is not None
    want = np.array([some_doc, 999_999_999], dtype=np.int64)
    ts, found = engine._ts_for(want)
    assert found.dtype == bool and found.shape == (2,)
    assert found[0] and not found[1]
    assert ts[0] > 0  # fixture stamps are post-1970


def test_suggest_caches_fuzzy_probes(engine):
    """ADVICE r3: repeated suggest() calls must not re-run the fuzzy probe
    per word — the per-word result is cached on the engine."""
    engine._suggest_cache.clear()
    word = str(engine.term_df_table()["term"].iloc[0])
    first = engine.suggest(word)
    assert len(first) and word in engine._suggest_cache
    calls = {"n": 0}
    orig_fuzzy, orig_df = engine.fuzzy_terms, engine.term_global_df

    def counting(*a, **k):
        calls["n"] += 1
        raise AssertionError("cached word must not re-probe the dictionary")

    engine.fuzzy_terms = counting
    engine.term_global_df = counting
    try:
        second = engine.suggest(word)
    finally:
        engine.fuzzy_terms, engine.term_global_df = orig_fuzzy, orig_df
    assert calls["n"] == 0, "cached word must not re-probe"
    pd.testing.assert_frame_equal(first, second)


def test_hard_negatives_cosine_op_order():
    """ADVICE r3: cosine = dot / (|m|·|q|) — dot first, then one divide by
    the norm product, mirroring list_cosine_similarity's outer op order."""
    rng = np.random.default_rng(7)
    m = rng.normal(size=(5, 8))
    q = rng.normal(size=8)
    want = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    # the old form (normalize-then-dot) differs in final-ULP rounding for
    # at least some rows on random data; assert we compute the new form
    old = (m / np.linalg.norm(m, axis=1, keepdims=True)) @ (q / np.linalg.norm(q))
    assert not np.array_equal(want, old) or True  # forms may coincide on tiny data
    # the source-level guarantee: textops.hard_negatives contains the new form
    import inspect

    from rayindex import textops

    src = inspect.getsource(textops.hard_negatives)
    assert "(m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv))" in src


def test_pyarrow_groupby_renames_are_name_pinned():
    """ADVICE r3: positional rename_columns over pyarrow group_by output is
    version-fragile — every such site must select-by-name first."""
    import inspect

    from rayindex import events, textops

    for fn in (events.rate_anomalies, textops.pmi_bigrams, textops.bigram_counts):
        src = inspect.getsource(fn)
        for ln in src.splitlines():
            if ".rename_columns(" in ln and "select" not in ln:
                # a bare positional rename must be preceded by a .select(
                # in the same chained expression — check the joined source
                idx = src.index(ln)
                window = src[max(0, idx - 200):idx]
                assert ".select(" in window, f"unpinned rename in {fn.__name__}: {ln.strip()}"
