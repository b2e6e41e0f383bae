"""Round-3 regressions from the external review (ADVICE.md round 2):

1. ngram_jaccard_pairs: a document token that IS a control character (e.g.
   "\\x01" surviving whitespace split at n=1) must not collide with the
   presence marker — markers are now an explicit key column, not an in-band
   sentinel gram.
2. ann_ivf_topk: corpora whose vec_ids all start above 4096 must still get a
   non-empty k-means sample (sample by row position, not id value), and a
   zero-norm sample vector must not divide by zero.
3. events sessionize/asof: timestamp→µs conversion pins the unit explicitly;
   a datetime64[ns] input (older pandas conversion path) must not make gap
   comparisons off by 1000×.
4. QueryEngine._readers_cache/_decoded_cache are FIFO-capped like the
   dictionary cache; results are unaffected by eviction.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from rayindex import textops


def _write_docs(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def test_jaccard_control_char_token_not_marker(ray_session, tmp_path):
    """doc 0 contains a literal \\x01 token; under the old in-band sentinel it
    merged with the presence marker and corrupted the role sum, silently
    dropping the (0, 1) pair or mis-counting its union."""
    sf = _write_docs(tmp_path, ["alpha \x01 beta", "alpha beta", "gamma delta"])
    out = textops.ngram_jaccard_pairs(sf, n=1)
    assert out["doc_a"].tolist() == [0, 1]
    r0 = out[out["doc_a"] == 0].iloc[0]
    # grams(0) = {alpha, \x01, beta}, grams(1) = {alpha, beta}
    assert r0["n_inter"] == 2 and r0["n_union"] == 3
    assert abs(r0["jaccard"] - 2 / 3) < 1e-12
    r1 = out[out["doc_a"] == 1].iloc[0]
    assert r1["n_inter"] == 0 and r1["n_union"] == 4


def test_ivf_high_vec_ids_and_zero_norm(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    n, dim = 300, 16
    emb = rng.standard_normal((n, dim))
    emb[7] = 0.0  # zero-norm row inside the positional sample
    ids = np.arange(10_000, 10_000 + n, dtype=np.int64)  # all ids > 4096
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float64())),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "embeddings.parquet"))
    out = textops.ann_ivf_topk(str(tmp_path), k=5, query_vec_id=10_001)
    assert len(out) == 5
    assert out.iloc[0]["vec_id"] == 10_001  # the query matches itself first


def test_sessionize_ns_timestamps_unit_pinned():
    from rayindex.events import US, _user_sessions

    base = pd.Timestamp("2025-01-01 00:00:00")
    ts = pd.Series([base, base + pd.Timedelta(minutes=5), base + pd.Timedelta(minutes=40)])
    g = pd.DataFrame(
        {"user_id": [1, 1, 1], "ts": ts.astype("datetime64[ns]"), "event_id": [1, 2, 3]}
    )
    out = _user_sessions(g, gap_us=30 * 60 * US)
    # gaps are 5 min and 35 min → exactly two sessions (ns input would have
    # made both gaps look 1000× larger under the old astype("int64"))
    assert out["session_idx"].tolist() == [0, 1]
    assert out["n_events"].tolist() == [2, 1]
    assert out["start_us"].iloc[0] == base.value // 1000


def test_asof_ns_timestamps_unit_pinned():
    from rayindex.events import _asof_group

    base = pd.Timestamp("2025-01-01 00:00:00")
    g = pd.DataFrame(
        {
            "user_id": [1, 1],
            "ts": pd.Series([base, base + pd.Timedelta(minutes=1)]).astype("datetime64[ns]"),
            "event_id": [10, 11],
            "event_type": ["error", "click"],
            "value": [2.5, 0.0],
        }
    )
    out = _asof_group(g)
    assert len(out) == 1
    assert out.iloc[0]["ts_us"] == (base + pd.Timedelta(minutes=1)).value // 1000
    assert out.iloc[0]["last_error_value"] == 2.5


def test_engine_posting_caches_capped(engine, fixture_corpus, monkeypatch):
    monkeypatch.setattr(type(engine), "DECODED_CACHE_CAP", 2)
    monkeypatch.setattr(type(engine), "READERS_CACHE_CAP", 2)
    engine._decoded_cache.clear()
    engine._readers_cache.clear()
    lemmas = fixture_corpus.lemmas[:8]
    for lem in lemmas:
        engine._decoded(lem)
    assert len(engine._decoded_cache) <= 2
    assert len(engine._readers_cache) <= 2
    # eviction is invisible to results: re-resolve an evicted term
    d0 = engine._decoded(lemmas[0])
    assert d0[0].size > 0


def test_embedding_near_dup_exactness_flag(ray_session, monkeypatch, caplog):
    """ADVICE: the auto→approximate switch must be visible — flagged on the
    result and logged — instead of silently changing semantics."""
    import logging

    from rayindex import textops

    sf = "tests/_mini_sf"  # set below via the mini_sf fixture path helper
    # reuse the conformance mini corpus written by test_textops' fixture if
    # present; otherwise generate a tiny one inline
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    d = tempfile.mkdtemp()
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((30, 16))
    t = pa.table({
        "vec_id": pa.array(np.arange(30, dtype=np.int64), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float64())),
    })
    pq.write_table(t, os.path.join(d, "embeddings.parquet"))
    exact = textops.embedding_near_dup(d, tau=0.5)
    assert exact.attrs["exact"] is True
    monkeypatch.setattr(textops, "EXACT_PAIR_LIMIT", 1)
    with caplog.at_level(logging.WARNING, logger="rayindex.textops"):
        approx = textops.embedding_near_dup(d, tau=0.5)
    assert approx.attrs["exact"] is False
    assert any("APPROXIMATE" in r.message for r in caplog.records)
