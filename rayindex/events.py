"""Temporal / streaming-style operators over the ``events`` table — the
windowed-aggregate, sessionization and as-of-join family a training-data
pipeline needs for event logs (the brief's "custom operators Ray Data
lacks": each is a composition of vectorized ``map_batches`` + one
``groupby``, with the partitioning assumption documented).

All three partition by a KEY (time window or user): at 100 TB the shuffle
moves each event once, reducers are bounded by per-key volume (windows are
bounded by rate × window; per-user history by user activity), and skew is
limited to pathological single keys (a bot user) — cap or salt those
upstream if present.

Float discipline for the correctness gate: aggregates avoid float addition
order entirely — monetary-style ``value`` sums are exact integer cents
(``round(value*100)``; the fixture's 2-decimal values are never half-cent,
so banker's-vs-away rounding cannot differ), and the as-of join COPIES a
stored double rather than computing one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from .joins import safe_join

US = 1_000_000


def windowed_counts(sf_dir: str, window_minutes: int = 5) -> rd.Dataset:
    """Tumbling-window aggregate: per (window_start, event_type) → event
    count + exact value sum in cents.

    Shape: vectorized window-key derivation + per-batch partial groupby →
    one small global groupby (keys = windows × types, tiny vs events)."""
    w_us = window_minutes * 60 * US
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy()
        win = (us // w_us) * w_us
        cents = np.round(t.column("value").to_numpy() * 100.0).astype(np.int64)
        part = pa.table(
            {
                "window_start": pa.array(win, pa.int64()),
                "event_type": t.column("event_type"),
                "n": pa.array(np.ones(len(us), np.int64), pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )
        return part.group_by(["window_start", "event_type"]).aggregate(
            [("n", "sum"), ("cents", "sum")]
        )

    agg = (
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["window_start", "event_type"])
        .aggregate(Sum("n_sum", alias_name="n_events"), Sum("cents_sum", alias_name="sum_cents"))
    )

    def finish(t: pa.Table) -> pa.Table:
        # window_start_us stays int64 epoch-µs: value-hash-stable across
        # pandas/DuckDB timestamp unit differences (ns vs µs)
        return pa.table(
            {
                "window_start_us": t.column("window_start").cast(pa.int64()),
                "event_type": t.column("event_type"),
                "n_events": t.column("n_events").cast(pa.int64()),
                "sum_cents": t.column("sum_cents").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _user_sessions(g: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """One user's events → session rows.  Deterministic order (ts, event_id);
    a new session starts when the gap to the previous event is STRICTLY
    greater than ``gap_us``."""
    g = g.sort_values(["ts", "event_id"], kind="stable")
    # explicit-unit cast: astype("int64") on a datetime column is only µs if
    # the pandas/pyarrow conversion preserved datetime64[us]; an ns coercion
    # (older pandas, coerce_temporal_nanoseconds) would silently make every
    # gap comparison off by 1000× — pin the unit like windowed_counts' Arrow
    # cast(pa.int64()) does
    us = g["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
    brk = np.ones(len(us), dtype=np.int64)
    if len(us) > 1:
        brk[1:] = (np.diff(us) > gap_us).astype(np.int64)
    sid = np.cumsum(brk) - 1
    out = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "session_idx": sid, "us": us})
    aggd = out.groupby(["user_id", "session_idx"], sort=True).agg(
        n_events=("us", "size"), start_us=("us", "min"), end_us=("us", "max")
    ).reset_index()
    return aggd


def sessionize(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Sessionization: split each user's event stream at gaps > ``gap``.

    Shape: ONE shuffle keyed by user (``groupby(user_id).map_groups``);
    within a group everything is vectorized numpy.  Partitioning assumption:
    sessions never span users, so user is the correct co-location key; group
    size is bounded by per-user history."""
    gap_us = gap_minutes * 60 * US
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"])
    out = (
        ev.groupby("user_id")
        .map_groups(lambda g: _user_sessions(g, gap_us), batch_format="pandas")
        .to_pandas()
    )
    out = out.astype({"user_id": "int64", "session_idx": "int64", "n_events": "int64",
                      "start_us": "int64", "end_us": "int64"})
    return out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)


def _asof_group(g: pd.DataFrame) -> pd.DataFrame:
    """One user's events → clicks annotated with the most recent error value
    at-or-before the click (ties on ts broken by highest event_id, matching
    the oracle's ORDER BY ts DESC, event_id DESC LIMIT 1)."""
    clicks = g[g["event_type"] == "click"].sort_values(["ts", "event_id"], kind="stable")
    errors = g[g["event_type"] == "error"].sort_values(["ts", "event_id"], kind="stable")
    if len(clicks) == 0 or len(errors) == 0:
        return pd.DataFrame(
            {"event_id": pd.Series(dtype="int64"), "user_id": pd.Series(dtype="int64"),
             "ts_us": pd.Series(dtype="int64"), "last_error_value": pd.Series(dtype="float64")}
        )
    # explicit-unit casts (same 1000×-gap hazard as _user_sessions)
    e_us = errors["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
    c_us = clicks["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
    idx = np.searchsorted(e_us, c_us, side="right") - 1  # last error ts ≤ click ts
    have = idx >= 0
    out = pd.DataFrame(
        {
            "event_id": clicks["event_id"].to_numpy()[have],
            "user_id": clicks["user_id"].to_numpy()[have],
            "ts_us": c_us[have],
            "last_error_value": errors["value"].to_numpy()[idx[have]],
        }
    )
    return out


def asof_last_error(sf_dir: str) -> pd.DataFrame:
    """As-of join: every click event joined to the user's most recent error
    value at-or-before it (clicks with no prior error are dropped — keeps
    the result NULL-free for exact comparison).

    Shape: one shuffle keyed by user, ``searchsorted`` inside the group —
    the distributed as-of pattern (sort-merge within co-located partitions);
    no value arithmetic, so doubles compare exactly."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type", "value"]
    )
    keep = ev.map_batches(
        lambda t: t.filter(pc.is_in(t.column("event_type"), pa.array(["click", "error"]))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = keep.groupby("user_id").map_groups(_asof_group, batch_format="pandas").to_pandas()
    if len(out) == 0 or "event_id" not in out.columns:
        return pd.DataFrame(
            {"event_id": pd.Series(dtype="int64"), "user_id": pd.Series(dtype="int64"),
             "ts_us": pd.Series(dtype="int64"), "last_error_value": pd.Series(dtype="float64")}
        )
    out = out.astype({"event_id": "int64", "user_id": "int64", "ts_us": "int64",
                      "last_error_value": "float64"})
    return out.sort_values("event_id").reset_index(drop=True)


def hopping_counts(sf_dir: str, size_minutes: int = 10, hop_minutes: int = 5) -> rd.Dataset:
    """Hopping-window aggregate (engine extension — the overlapping-window
    sibling of :func:`windowed_counts`): per (window_start, event_type) →
    event count + exact cents sum, where windows of ``size`` start every
    ``hop`` and each event lands in ``size // hop`` of them.

    Shape: the window fan-out is vectorized per batch (one tile per hop
    offset — the explode happens map-side, BEFORE the shuffle, so the wide
    step still moves each (window, type) partial exactly once); then the
    same partial → global groupby as the tumbling path.  ``size`` must be a
    multiple of ``hop``."""
    if size_minutes % hop_minutes:
        raise ValueError("size must be a multiple of hop")
    hop_us = hop_minutes * 60 * US
    n_win = size_minutes // hop_minutes
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy()
        base = us // hop_us
        cents = np.round(t.column("value").to_numpy() * 100.0).astype(np.int64)
        types = t.column("event_type")
        wins = np.concatenate([(base - k) * hop_us for k in range(n_win)])
        part = pa.table(
            {
                "window_start": pa.array(wins, pa.int64()),
                "event_type": pa.concat_arrays([types.combine_chunks()] * n_win),
                "n": pa.array(np.ones(len(wins), np.int64), pa.int64()),
                "cents": pa.array(np.tile(cents, n_win), pa.int64()),
            }
        )
        return part.group_by(["window_start", "event_type"]).aggregate(
            [("n", "sum"), ("cents", "sum")]
        )

    agg = (
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["window_start", "event_type"])
        .aggregate(Sum("n_sum", alias_name="n_events"), Sum("cents_sum", alias_name="sum_cents"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start_us": t.column("window_start").cast(pa.int64()),
                "event_type": t.column("event_type"),
                "n_events": t.column("n_events").cast(pa.int64()),
                "sum_cents": t.column("sum_cents").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def range_join_errors(sf_dir: str, window_minutes: int = 60) -> rd.Dataset:
    """Range join (engine extension — the interval sibling of the as-of
    join): every event paired with each SAME-USER ``error`` event whose
    window ``[error_ts, error_ts + W)`` contains it (excluding the error row
    itself) → (event_id, error_id).

    Shape: the standard distributed range join — an EQUI-key hash join on
    the user (``Dataset.join``) followed by a vectorized range filter; each
    side shuffles once, and per-user output is bounded by events × errors of
    that user (skewed single users would be salted upstream)."""
    w_us = window_minutes * 60 * US
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": t.column("ts").cast(pa.int64()),
            }
        )

    left = ev.map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True)
    errs = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    ).filter(expr="event_type == 'error'")

    def err_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "error_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "err_us": t.column("ts").cast(pa.int64()),
            }
        )

    right = errs.map_batches(err_us, batch_format="pyarrow", zero_copy_batch=True)
    # a filtered-to-empty errors block would skip err_us and keep the
    # pre-rename schema — consolidate the right side before the hash join;
    # left is a schema-pinned map product of the read (big side, no guard)
    joined = safe_join(left, right, join_type="inner", num_partitions=16,
                       on=("user_id",), guard_left=False)

    def in_window(t: pa.Table) -> pa.Table:
        ts = t.column("ts_us").to_numpy()
        err = t.column("err_us").to_numpy()
        keep = (
            (ts >= err)
            & (ts < err + w_us)
            & (t.column("event_id").to_numpy() != t.column("error_id").to_numpy())
        )
        out = t.filter(pa.array(keep))
        return pa.table({"event_id": out.column("event_id"), "error_id": out.column("error_id")})

    return joined.map_batches(in_window, batch_format="pyarrow", zero_copy_batch=True)


def funnel_steps(sf_dir: str, steps: tuple[str, ...] = ("view", "click", "purchase")) -> rd.Dataset:
    """First-touch funnel analysis: for every user with at least one
    ``steps[0]`` event, the furthest funnel stage reached IN ORDER — stage
    ``i`` counts only events strictly after the first qualifying stage-
    ``i-1`` event (the standard product-analytics conversion funnel).
    Returns (user_id, reached) with ``reached`` in 1..len(steps).

    Determinism: "after" compares the (ts, event_id) TUPLE, so equal
    timestamps cannot flip the result between runs or partitionings.

    Shape: the scan keeps only funnel event types (filter pushed to the
    read — non-funnel traffic never leaves storage), ONE user-keyed shuffle
    (same partitioning as sessionize/as-of), then a vectorized in-group
    pass of len(steps) numpy scans; per-user history bounds reducer memory,
    and output is O(users)."""
    step_list = list(steps)
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
        filter=pc.field("event_type").isin(step_list),
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        ts = g["ts"].to_numpy("datetime64[us]").astype("int64")
        eid = g["event_id"].to_numpy()
        et = g["event_type"].to_numpy()
        cur_ts, cur_eid = np.iinfo(np.int64).min, np.iinfo(np.int64).min
        reached = 0
        for step in step_list:
            after = (ts > cur_ts) | ((ts == cur_ts) & (eid > cur_eid))
            mask = (et == step) & after
            if not mask.any():
                break
            i = int(np.argmax(mask))  # first hit in (ts, event_id) order
            cur_ts, cur_eid = int(ts[i]), int(eid[i])
            reached += 1
        if reached == 0:  # no stage-1 event → not in the funnel population
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "reached": pd.Series(dtype="int64")})
        return pd.DataFrame(
            [{"user_id": np.int64(g["user_id"].iloc[0]), "reached": np.int64(reached)}]
        )

    return ev.groupby("user_id").map_groups(per_user, batch_format="pandas")


def retention_cohorts(sf_dir: str, period_minutes: int = 10) -> rd.Dataset:
    """Retention-cohort matrix — the product-analytics staple next to
    :func:`sessionize`: users are cohorted by the period of their FIRST
    event (period = ``period_minutes`` tumbling buckets) and counted in
    every later period they return in.  Emits (cohort_ts, period_offset,
    n_users): cohort_ts = epoch-µs of the cohort period start,
    period_offset = whole periods since the cohort (0 = the cohort period
    itself).

    Shape: per-batch DISTINCT (user, period) partials → one distinct
    groupby, one per-user Min (the cohort), one hash join back, one final
    (cohort, offset) count — every stage vocabulary- or user-bounded, no
    driver materialization, integers end-to-end."""
    from ray.data.aggregate import Count, Min

    p_us = int(period_minutes) * 60 * US
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy()
        per = (us // p_us) * p_us
        uid = t.column("user_id").to_numpy()
        pairs = np.unique(np.stack([uid, per], axis=1), axis=0)
        return pa.table(
            {"user_id": pa.array(pairs[:, 0], pa.int64()),
             "per": pa.array(pairs[:, 1], pa.int64())}
        )

    up = (
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "per"])
        .aggregate(Count(alias_name="_n"))
    )
    cohort = up.groupby("user_id").aggregate(Min("per", alias_name="cohort"))
    from .textops import _task_cpus

    # both sides are hash-shuffle aggregates (schema-less empty partitions)
    joined = safe_join(up, cohort, join_type="inner",
                       num_partitions=max(2, _task_cpus() // 2), on=("user_id",))

    def offsets(t: pa.Table) -> pa.Table:
        per = t.column("per").to_numpy()
        coh = t.column("cohort").to_numpy()
        return pa.table(
            {"cohort_ts": pa.array(coh, pa.int64()),
             "period_offset": pa.array((per - coh) // p_us, pa.int64())}
        )

    return (
        joined.map_batches(offsets, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["cohort_ts", "period_offset"])
        .aggregate(Count(alias_name="n_users"))
    )


def rate_anomalies(sf_dir: str, window_minutes: int = 5,
                   z_thresh: float = 2.0) -> rd.Dataset:
    """Windowed rate-anomaly detection — the streaming-monitoring staple
    over the event log: per event type, tumbling-window counts are z-scored
    against that type's own distribution over its OBSERVED (non-empty)
    windows, and windows with ``|z| ≥ z_thresh`` are flagged.

    Float discipline (hash-exact vs the SQL oracle): counts, Σn and Σn² are
    exact integers; mean and variance each CAST both integer operands to
    double and then divide ONCE — exactly the oracle's ``CAST(x AS
    DOUBLE) / y`` (a correctly-rounded exact-rational Python ``s / k``
    would differ in the last ulp once a moment exceeds 2⁵³, and the
    oracle's BIGINT k·Σn² overflows around the same scale: parity holds
    while the moments fit int64, which 5-minute event-rate counts do by
    many orders of magnitude); sqrt is correctly rounded; z is one subtract
    + one divide — mirrored op-for-op.  Types with < 2 windows or zero
    variance emit nothing.

    Shape: per-batch partial counts → one small (windows × types) groupby →
    one per-type map_groups over that bounded table.  Emits (event_type,
    window_start, n, z)."""
    import math

    w_us = window_minutes * 60 * US
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy()
        win = (us // w_us) * w_us
        part = pa.table(
            {"window_start": pa.array(win, pa.int64()),
             "event_type": t.column("event_type"),
             "n": pa.array(np.ones(len(us), np.int64), pa.int64())}
        )
        return part.group_by(["window_start", "event_type"]).aggregate([("n", "sum")])

    counts = (
        ev.map_batches(
            # select-by-name pins column order before the positional rename:
            # pyarrow's TableGroupBy.aggregate key-vs-aggregate output order
            # has changed across versions, and a silent transpose here would
            # corrupt the counts rather than error.
            lambda t: partial(t)
            .select(["window_start", "event_type", "n_sum"])
            .rename_columns(["window_start", "event_type", "n"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby(["window_start", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
    )

    _EMPTY = pd.DataFrame(
        {"event_type": pd.Series(dtype=str),
         "window_start": pd.Series(dtype="int64"),
         "n": pd.Series(dtype="int64"), "z": pd.Series(dtype="float64")}
    )

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy(dtype=np.int64)
        k = int(n.size)
        if k < 2:
            return _EMPTY
        s = int(n.sum())
        ssq = int((n * n).sum())
        num = k * ssq - s * s
        if num <= 0:  # zero variance: every window identical
            return _EMPTY
        # cast-then-divide, matching the oracle's CAST(x AS DOUBLE)/y
        mean = float(s) / float(k)
        std = math.sqrt(float(num) / float(k * k))
        z = (n.astype(np.float64) - mean) / std
        keep = np.abs(z) >= z_thresh
        if not keep.any():
            return _EMPTY
        return pd.DataFrame(
            {"event_type": g["event_type"].to_numpy()[keep],
             "window_start": g["window_start"].to_numpy()[keep],
             "n": n[keep], "z": z[keep]}
        )

    return counts.groupby("event_type").map_groups(per_type, batch_format="pandas")
