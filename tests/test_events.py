"""Temporal operators over the events table: tumbling windows,
sessionization, as-of join — semantics pinned by hand-built micro fixtures
(the sf-level DuckDB equivalence is covered by the driver oracle gate)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def events_sf(tmp_path_factory):
    root = tmp_path_factory.mktemp("events_sf")
    us = 1_000_000
    minute = 60 * us
    rows = [
        # user 1: two sessions (gap 31 min > 30), interleaved clicks/errors
        (0, 0 * minute, 1, "error", 1.25),
        (1, 1 * minute, 1, "click", 0.10),
        (2, 2 * minute, 1, "click", 0.20),
        (3, 33 * minute, 1, "view", 0.30),  # 31 min gap → new session
        (4, 34 * minute, 1, "error", 2.50),
        (5, 34 * minute, 1, "error", 3.75),  # same ts: higher event_id wins as-of
        (6, 35 * minute, 1, "click", 0.40),
        # user 2: one session, click with NO prior error (dropped by as-of)
        (7, 5 * minute, 2, "click", 9.99),
        (8, 35 * minute, 2, "click", 9.99),  # exactly 30 min gap → SAME session
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(root / "events.parquet"))
    return str(root)


def test_windowed_counts(ray_session, events_sf):
    from rayindex.events import windowed_counts

    got = windowed_counts(events_sf, window_minutes=5).to_pandas()
    got = got.sort_values(["window_start_us", "event_type"]).reset_index(drop=True)
    w0 = got[(got["window_start_us"] == 0) & (got["event_type"] == "click")]
    assert int(w0["n_events"].iloc[0]) == 2  # events at minutes 1, 2
    assert int(w0["sum_cents"].iloc[0]) == 30  # 0.10 + 0.20 in exact cents
    err0 = got[(got["window_start_us"] == 0) & (got["event_type"] == "error")]
    assert int(err0["sum_cents"].iloc[0]) == 125


def test_sessionize_gap_semantics(ray_session, events_sf):
    from rayindex.events import sessionize

    got = sessionize(events_sf, gap_minutes=30)
    u1 = got[got["user_id"] == 1]
    assert u1["session_idx"].tolist() == [0, 1]  # 31-min gap splits
    assert u1["n_events"].tolist() == [3, 4]
    u2 = got[got["user_id"] == 2]
    assert u2["session_idx"].tolist() == [0]  # exactly-30-min gap does NOT split
    assert int(u2["n_events"].iloc[0]) == 2


def test_asof_last_error(ray_session, events_sf):
    from rayindex.events import asof_last_error

    got = asof_last_error(events_sf).set_index("event_id")
    assert got.loc[1, "last_error_value"] == 1.25  # click after first error
    assert got.loc[2, "last_error_value"] == 1.25
    # click at minute 35: two errors at minute 34 share a ts → highest
    # event_id (5, value 3.75) wins the tie deterministically
    assert got.loc[6, "last_error_value"] == 3.75
    # user 2 has no errors at all → its clicks are absent
    assert 7 not in got.index and 8 not in got.index
