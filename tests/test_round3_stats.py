"""Round-3 statistics/temporal additions: hopping windows, range join,
exact per-site quantiles, KMV distinct sketch — boundary semantics the SQL
hash check alone doesn't isolate."""

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_hopping_every_event_in_exactly_two_windows():
    from rayindex.events import hopping_counts

    got = hopping_counts(SF).to_pandas()
    n_events = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    assert int(got["n_events"].sum()) == 2 * n_events  # size/hop = 2 windows each
    # window starts are hop-aligned
    assert (got["window_start_us"] % (5 * 60 * 1_000_000) == 0).all()
    # each (window, type) row is the sum of its two contributing tumbling halves:
    # cross-check total cents against a direct read
    ev = pq.read_table(f"{SF}/events.parquet", columns=["value"]).to_pandas()
    cents = np.round(ev["value"].to_numpy() * 100).astype(np.int64).sum()
    assert int(got["sum_cents"].sum()) == 2 * cents


@pytest.mark.usefixtures("ray_session")
def test_range_join_boundaries():
    from rayindex.events import range_join_errors

    w_min = 60
    got = range_join_errors(SF, window_minutes=w_min).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    errs = ev[ev["event_type"] == "error"]
    # brute force replay incl. inclusive-start / exclusive-end boundaries
    want = set()
    w_us = w_min * 60 * 1_000_000
    by_user = dict(tuple(ev.groupby("user_id")))
    for _, e in errs.iterrows():
        g = by_user[e["user_id"]]
        hit = g[(g["us"] >= e["us"]) & (g["us"] < e["us"] + w_us) & (g["event_id"] != e["event_id"])]
        want |= {(int(a), int(e["event_id"])) for a in hit["event_id"]}
    pairs = set(zip(got["event_id"].astype(int), got["error_id"].astype(int)))
    assert pairs == want
    # only SELF pairs are excluded — an error landing in another error's
    # window is a legitimate pair, and no (x, x) row may appear
    assert not any(a == b for a, b in pairs)


@pytest.mark.usefixtures("ray_session")
def test_doclen_quantiles_percentile_disc_rule():
    from rayindex.textops import doclen_quantiles

    got = doclen_quantiles(SF).set_index("site")
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["source", "n_chars"]).to_pandas()
    for site, g in docs.groupby("source"):
        v = np.sort(g["n_chars"].to_numpy())
        n = v.size
        row = got.loc[site]
        assert row["n_docs"] == n
        for q, col in [(0.25, "q25"), (0.5, "q50"), (0.75, "q75"), (0.95, "q95")]:
            assert row[col] == v[max(0, math.ceil(q * n) - 1)], (site, col)


@pytest.mark.usefixtures("ray_session")
def test_kmv_estimate_accuracy_and_merge_equivalence():
    from rayindex.textops import KMV_K, _KMV_MASK, _md5_le64, kmv_distinct_terms
    import re

    got = kmv_distinct_terms(SF).set_index("site")["n_distinct_est"]
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"]).to_pandas()
    norm = re.compile("[^a-z0-9]+")
    for site, g in docs.groupby("source"):
        words = set()
        for t in g["text"]:
            words |= {w for w in norm.sub(" ", t.lower()).split() if w}
        exact = len(words)
        est = int(got.loc[site])
        if exact < KMV_K:
            assert est == exact  # below K the sketch IS exact
        else:
            assert abs(est - exact) / exact < 0.5  # KMV std err ≈ 1/√(K−2) ≈ 0.13
        # single-shot driver KMV equals the distributed partial→merge result
        hv = np.unique(_md5_le64(sorted(words)) & np.uint64(_KMV_MASK))
        if hv.size < KMV_K:
            want = hv.size
        else:
            want = (KMV_K - 1) * (1 << 61) // int(hv[KMV_K - 1])
        assert est == want
