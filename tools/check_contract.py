"""Local replica of the driver's correctness gate: run every queries() entry
and compare against oracle_sql() via DuckDB (row count + schema + ordered
value comparison on name-sorted columns).  Usage:

    python tools/check_contract.py [sf_dir] [entry_name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

import ray


def to_pandas(obj):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> str:
    if set(got.columns) != set(want.columns):
        return f"SCHEMA got={sorted(got.columns)} want={sorted(want.columns)}"
    if len(got) != len(want):
        return f"ROWS got={len(got)} want={len(want)}"
    g, w = canon(got), canon(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if np.issubdtype(np.asarray(gv).dtype, np.floating) or np.issubdtype(
            np.asarray(wv).dtype, np.floating
        ):
            if not np.allclose(gv.astype(float), wv.astype(float), rtol=0, atol=0):
                bad = np.nonzero(gv.astype(float) != wv.astype(float))[0][:3]
                return f"VALUES col={c} rows={bad.tolist()} got={gv[bad]} want={wv[bad]}"
        else:
            if not (pd.Series(gv).astype(str) == pd.Series(wv).astype(str)).all():
                bad = np.nonzero((pd.Series(gv).astype(str) != pd.Series(wv).astype(str)).to_numpy())[0][:3]
                return f"VALUES col={c} rows={bad.tolist()} got={gv[bad]} want={wv[bad]}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])  # optional entry-name filter: check just these
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except duckdb.Error:
            pass

    qs = e.queries()
    oracles = e.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"{name:22s} RAY-ERROR {type(ex).__name__}: {ex}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"{name:22s} rows-only: {len(got)} rows, cols={list(got.columns)[:6]}")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"{name:22s} SQL-ERROR {type(ex).__name__}: {ex}")
            n_bad += 1
            continue
        verdict = compare(name, got, want)
        print(f"{name:22s} {verdict}  ({len(got)} rows)")
        n_ok += verdict == "OK"
        n_bad += verdict != "OK"
    print(f"\n{n_ok} OK, {n_bad} BAD")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
