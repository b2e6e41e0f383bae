"""Distributed index integrity audit (fsck for the compressed index).

At 100 TB an index is rebuilt rarely and read constantly; bit-rot, a
truncated object-store upload, or a codec regression must be detectable
without a full rebuild.  ``audit_index`` streams every segment row through
a task pool and verifies the self-describing invariants of the layout
(rayindex/segments.py docstring), then cross-checks the postings against
the ``term_df`` dictionary with one distributed groupby — no driver-side
materialization beyond the (expected-empty) violation list.

The reference has no analog (its integrity story is MySQL constraints,
model/IndexEntity.java:11-23); this is the operational tool the Ray-native
layout needs instead.

Checked invariants, per ``kind='seg'`` row:

* decoded stream lengths equal ``n_docs`` (docs/tfs/dls);
* doc ids strictly increasing (delta coding requires it; WAND assumes it);
* ``n_blocks == ceil(n_docs / BLOCK_SIZE)`` and every block-metadata
  sidecar has exactly ``n_blocks`` entries;
* per-block ``b_last_doc`` / ``b_max_tf`` / ``b_min_dl`` equal the decoded
  per-block last doc id / max tf / min dl (block-max WAND correctness);
* ``tf >= 1``, ``dl >= 1`` and ``tf <= dl`` for every posting;
* positional sidecar (when present): ``pos_nbytes`` has one uint32 per doc,
  each doc's position list decodes to EXACTLY ``tf`` strictly-increasing
  token ordinals.

Per ``kind='df'`` row: ``df >= 1`` and empty posting blobs.

Cross-check (``check_df=True``): per term, Σ ``n_docs`` over all shards /
buckets / salts equals the global df recorded in ``term_df`` — the
dictionary a query trusts before it ever touches postings.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .codec import BLOCK_SIZE, decode_postings, varbyte_decode
from .segments import expand_parquet_paths, list_shards, row_to_encoded

VIOLATION_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("bucket", pa.int32()),
        ("check", pa.string()),
        ("detail", pa.string()),
    ]
)

_SEG_COLUMNS = [
    "term", "salt", "bucket", "kind", "df", "n_docs", "n_blocks",
    "b_last_doc", "b_max_tf", "b_min_dl", "b_doc_nbytes", "b_tf_nbytes",
    "b_dl_nbytes", "docs_blob", "tfs_blob", "dls_blob",
    "pos_nbytes_blob", "pos_blob", "codec",
]


def _audit_row(row: dict, emit) -> None:
    if row["kind"] == "df":
        if not (row["df"] and row["df"] >= 1):
            emit(row, "df_positive", f"df={row['df']}")
        if row["docs_blob"] or row["tfs_blob"] or row["dls_blob"]:
            emit(row, "df_row_blobs_empty", "df row carries posting bytes")
        return
    n = int(row["n_docs"])
    nb = int(row["n_blocks"])
    if nb != math.ceil(n / BLOCK_SIZE):
        emit(row, "n_blocks", f"n_docs={n} n_blocks={nb}")
        return
    for name, width in (("b_last_doc", 8), ("b_max_tf", 4), ("b_min_dl", 4),
                        ("b_doc_nbytes", 4), ("b_tf_nbytes", 4),
                        ("b_dl_nbytes", 4)):
        if len(row[name] or b"") != width * nb:
            emit(row, "sidecar_len", f"{name}: {len(row[name] or b'')} != {width * nb}")
            return
    try:
        enc = row_to_encoded(row)
        docs, tfs, dls = decode_postings(enc)
    except Exception as exc:  # truncated/corrupt blob
        emit(row, "decode", repr(exc))
        return
    if not (docs.size == tfs.size == dls.size == n):
        emit(row, "stream_len", f"{docs.size}/{tfs.size}/{dls.size} != {n}")
        return
    if n == 0:
        return
    if n > 1 and not (docs[1:] > docs[:-1]).all():  # uint64-safe comparison
        emit(row, "docs_sorted", "doc ids not strictly increasing")
    if int(tfs.min()) < 1 or int(dls.min()) < 1:
        emit(row, "tf_dl_positive", f"min tf={tfs.min()} min dl={dls.min()}")
    if (tfs > dls).any():
        emit(row, "tf_le_dl", f"{int((tfs > dls).sum())} postings with tf > dl")
    bounds = np.arange(0, n, BLOCK_SIZE)
    ends = np.minimum(bounds + BLOCK_SIZE, n) - 1
    if not np.array_equal(np.frombuffer(row["b_last_doc"], np.uint64), docs[ends]):
        emit(row, "block_last_doc", "b_last_doc != decoded block last ids")
    max_tf = np.maximum.reduceat(tfs, bounds)
    if not np.array_equal(np.frombuffer(row["b_max_tf"], np.uint32), max_tf):
        emit(row, "block_max_tf", "b_max_tf != decoded block max tf")
    min_dl = np.minimum.reduceat(dls, bounds)
    if not np.array_equal(np.frombuffer(row["b_min_dl"], np.uint32), min_dl):
        emit(row, "block_min_dl", "b_min_dl != decoded block min dl")
    pos_lens_blob = row.get("pos_nbytes_blob") or b""
    if pos_lens_blob:
        if len(pos_lens_blob) % 4:
            emit(row, "pos_sidecar_len",
                 f"{len(pos_lens_blob)} bytes not a whole uint32 array")
            return
        lens = np.frombuffer(pos_lens_blob, np.uint32).astype(np.int64)
        if lens.size != n:
            emit(row, "pos_sidecar_len", f"{lens.size} != n_docs {n}")
            return
        buf = np.frombuffer(row.get("pos_blob") or b"", np.uint8)
        if int(lens.sum()) != buf.size:
            emit(row, "pos_blob_len", f"Σlens {int(lens.sum())} != {buf.size}")
            return
        off = np.concatenate(([0], np.cumsum(lens)))
        for i in range(n):
            if not lens[i]:
                emit(row, "pos_missing", f"doc {int(docs[i])} has tf but no positions")
                continue
            p = np.cumsum(varbyte_decode(buf[off[i]: off[i + 1]]), dtype=np.uint64)
            if p.size != tfs[i]:
                emit(row, "pos_count", f"doc {int(docs[i])}: {p.size} != tf {int(tfs[i])}")
            elif p.size > 1 and not (np.diff(p.astype(np.int64)) > 0).all():
                emit(row, "pos_sorted", f"doc {int(docs[i])} positions not increasing")
            # NOTE: positions are ordinals in the FULL token stream (phrase
            # adjacency over original tokens) while dl counts kept lemmas
            # after the particle filter — pos >= dl is legal


# internal kind tag for per-batch Σ n_docs partials riding the violation
# stream (lets the df cross-check reuse the main pass instead of a second
# full parquet scan); filtered out before the user ever sees the table
_DF_PARTIAL = "__df_partial__"

_AUDIT_SCHEMA = pa.schema(
    list(VIOLATION_SCHEMA) + [pa.field("seg_cnt", pa.int64())]
)


def _audit_batch(batch: pa.Table, *, with_df_partials: bool) -> pa.Table:
    """Task-pool body: one batch of segment rows → violation rows (plus,
    when the df cross-check is on, one ``_DF_PARTIAL`` row per distinct
    term in the batch carrying its Σ n_docs — a combiner, so the postings
    blobs are scanned exactly once)."""
    out: dict[str, list] = {k: [] for k in _AUDIT_SCHEMA.names}

    def emit(row, check, detail):
        out["term"].append(row["term"])
        out["salt"].append(int(row["salt"]))
        # hive partition column: inferred as string from the file path
        out["bucket"].append(int(row["bucket"]))
        out["check"].append(check)
        out["detail"].append(detail)
        out["seg_cnt"].append(0)

    for row in batch.to_pylist():
        try:
            _audit_row(row, emit)
        except Exception as exc:  # fsck must never die on the rot it hunts
            emit(row, "audit_error", repr(exc))
    if with_df_partials:
        seg = batch.filter(pc.equal(batch.column("kind"), "seg"))
        if seg.num_rows:
            part = seg.group_by("term").aggregate([("n_docs", "sum")])
            out["term"].extend(part.column("term").to_pylist())
            k = part.num_rows
            out["salt"].extend([-1] * k)
            out["bucket"].extend([-1] * k)
            out["check"].extend([_DF_PARTIAL] * k)
            out["detail"].extend([""] * k)
            out["seg_cnt"].extend(
                part.column("n_docs_sum").cast(pa.int64()).to_pylist())
    return pa.table(out, schema=_AUDIT_SCHEMA)


def _df_crosscheck(index_root: str, partials: "rd.Dataset") -> pd.DataFrame:
    """Σ n_docs per term over ALL seg rows ≡ term_df global df, as one
    distributed union + groupby (the site_stats kind-tag shape).  The seg
    side arrives as the ``_DF_PARTIAL`` combiner rows the main audit pass
    already emitted — no second scan of the segment files."""
    from ray.data.aggregate import Sum

    seg = partials.map_batches(
        lambda t: pa.table({
            "term": t.column("term"),
            "seg_cnt": t.column("seg_cnt"),
            "dic_cnt": pa.array(np.zeros(t.num_rows, np.int64)),
        }),
        batch_format="pyarrow",
    )
    df_paths = expand_parquet_paths(
        [os.path.join(s, "term_df") for s in list_shards(index_root)]
    )
    dic = rd.read_parquet(df_paths, columns=["term", "df"]).map_batches(
        lambda t: pa.table({
            "term": t.column("term"),
            "seg_cnt": pa.array(np.zeros(t.num_rows, np.int64)),
            "dic_cnt": t.column("df").cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )
    sums = (
        seg.union(dic)
        .groupby("term")
        .aggregate(Sum("seg_cnt"), Sum("dic_cnt"))
        .map_batches(
            lambda t: (
                lambda bad: pa.table({
                    "term": bad.column("term"),
                    "salt": pa.array(np.full(bad.num_rows, -1, np.int32)),
                    "bucket": pa.array(np.full(bad.num_rows, -1, np.int32)),
                    "check": pa.array(["df_crosscheck"] * bad.num_rows, pa.string()),
                    "detail": pa.array(
                        [f"Σ seg n_docs {s} != term_df {d}" for s, d in
                         zip(bad.column("sum(seg_cnt)").to_pylist(),
                             bad.column("sum(dic_cnt)").to_pylist())],
                        pa.string(),
                    ),
                })
            )(t.filter(pc.not_equal(t.column("sum(seg_cnt)"),
                                    t.column("sum(dic_cnt)")))),
            batch_format="pyarrow",
        )
    )
    return sums.to_pandas()


def _audit_locator(shard_dir: str) -> list[dict]:
    """Locator-sidecar checks for one shard (build.build_doc_locator): the
    fragment census in the sidecar's metadata must match the CURRENT docs
    listing (names + footer row counts), doc_id must be sorted ascending,
    and the sidecar row count must equal the census total.  A shard without
    a sidecar is healthy (engines fall back to the scan path); a shard with
    a STALE one is flagged — the engine would refuse it, but a flagged audit
    tells the operator to re-run build_doc_locator instead of silently
    eating the per-replica scan cost."""
    import json
    import pyarrow.parquet as pq

    loc_path = os.path.join(shard_dir, "locator", "locator.parquet")
    if not os.path.exists(loc_path):
        return []
    bad: list[dict] = []

    def emit(check: str, detail: str) -> None:
        bad.append({"term": os.path.basename(shard_dir), "salt": -1,
                    "bucket": -1, "check": check, "detail": detail})

    try:
        pf = pq.ParquetFile(loc_path)
        meta = pf.schema_arrow.metadata or {}
        census = json.loads(meta.get(b"docs_census", b"null") or b"null")
        if census is None:
            emit("locator_census", "sidecar has no docs_census metadata")
            return bad
        docs_dir = os.path.join(shard_dir, "docs")
        current = sorted(f for f in os.listdir(docs_dir) if f.endswith(".parquet"))
        if [c[0] for c in census] != current:
            emit("locator_census",
                 f"census files {len(census)} != docs listing {len(current)}")
            return bad
        for name, rows in census:
            got = pq.ParquetFile(os.path.join(docs_dir, name)).metadata.num_rows
            if got != rows:
                emit("locator_census", f"{name}: census rows {rows} != footer {got}")
        total = sum(r for _n, r in census)
        if pf.metadata.num_rows != total:
            emit("locator_rows",
                 f"sidecar rows {pf.metadata.num_rows} != census total {total}")
        ids = pf.read(columns=["doc_id"]).column("doc_id").to_numpy()
        if ids.size and np.any(np.diff(ids) < 0):
            emit("locator_sorted", "doc_id column is not sorted ascending")
    except (OSError, ValueError, KeyError) as e:  # unreadable sidecar
        emit("locator_census", f"unreadable sidecar: {e}")
    return bad


def _audit_site_lemmas_global(index_root: str) -> list[dict]:
    """Root-level ``site_lemmas_global`` check (build.write_site_lemmas_global):
    the shard census in its metadata must match the md5 of every CURRENT
    shard's stats.json.  Absent sidecar is healthy (multi-shard engines fall
    back to the scan); a stale one is flagged so the operator re-runs
    write_site_lemmas_global after a shard rebuild."""
    import json
    import pyarrow.parquet as pq

    from .segments import shard_stats_census

    p = os.path.join(index_root, "site_lemmas_global", "site_lemmas.parquet")
    if not os.path.exists(p):
        return []
    bad: list[dict] = []

    def emit(check: str, detail: str) -> None:
        bad.append({"term": "site_lemmas_global", "salt": -1,
                    "bucket": -1, "check": check, "detail": detail})

    try:
        meta = pq.ParquetFile(p).schema_arrow.metadata or {}
        census = json.loads(meta.get(b"shard_census", b"null") or b"null")
        if census is None:
            emit("site_lemmas_census", "sidecar has no shard_census metadata")
            return bad
        current = shard_stats_census(list_shards(index_root))
        if census != current:
            changed = sorted(
                set(census) ^ set(current)
                | {k for k in set(census) & set(current) if census[k] != current[k]}
            )
            emit("site_lemmas_census", f"stale for shards {changed}")
    except (OSError, ValueError, KeyError) as e:
        emit("site_lemmas_census", f"unreadable sidecar: {e}")
    return bad


def _audit_prelists(index_root: str) -> list[dict]:
    """Root-level head-term prelist check (rayindex.prelists): the artifact's
    recorded shard stats (n_docs/total_tf — its impact order depends on
    them via avgdl/idf) must match the CURRENT shard stats.  Absent artifact
    is healthy (engines use the full path); a stale one is flagged so the
    operator re-runs build_prelists after a rebuild / delta / purge — the
    engine itself already refuses a stale artifact at query time, so this
    is the fsck-side surfacing of the same gate."""
    import json

    p = os.path.join(index_root, "prelists", "meta.json")
    if not os.path.exists(p):
        return []
    bad: list[dict] = []

    def emit(check: str, detail: str) -> None:
        bad.append({"term": "prelists", "salt": -1,
                    "bucket": -1, "check": check, "detail": detail})

    try:
        with open(p) as f:
            meta = json.load(f)
        n_docs = total_tf = 0
        for d in list_shards(index_root):
            with open(os.path.join(d, "stats.json")) as f:
                s = json.load(f)
            n_docs += int(s["n_docs"])
            total_tf += int(s["total_tf"])
        if int(meta.get("n_docs", -1)) != n_docs or \
                int(meta.get("total_tf", -1)) != total_tf:
            emit("prelists_stale",
                 f"artifact stats (n_docs={meta.get('n_docs')}, "
                 f"total_tf={meta.get('total_tf')}) != current "
                 f"({n_docs}, {total_tf}) — rerun build_prelists")
        from .incremental import load_tombstones

        if load_tombstones(index_root)["sites"]:
            emit("prelists_stale",
                 "tree has tombstoned sites (avgdl changed) — rerun "
                 "build_prelists after compaction")
    except (OSError, ValueError, KeyError) as e:
        emit("prelists_meta", f"unreadable artifact meta: {e}")
    return bad


def audit_index(index_root: str, *, check_df: bool = True) -> pd.DataFrame:
    """Audit every shard of ``index_root``; returns the violation table
    (empty = healthy).  Streams segment rows through a task pool — driver
    memory is O(violations), not O(index)."""
    seg_paths = expand_parquet_paths(
        [os.path.join(s, "segments") for s in list_shards(index_root)]
    )
    if not seg_paths:
        raise FileNotFoundError(f"no segment files under {index_root}")
    # layout compat: indexes written before the positional layer / codec
    # column lack those fields (readers default them; so does _audit_row)
    import pyarrow.parquet as pq

    have = set(pq.read_schema(seg_paths[0]).names) | {"bucket"}
    cols = [c for c in _SEG_COLUMNS if c in have]
    import functools

    stream = (
        rd.read_parquet(seg_paths, columns=cols)
        .map_batches(
            functools.partial(_audit_batch, with_df_partials=check_df),
            batch_size=64, batch_format="pyarrow", zero_copy_batch=True)
    )
    if check_df:
        # one pass over the blobs; blocks (violations + tiny per-batch term
        # partials) are pinned in the object store, split, then released
        stream = stream.materialize()
        vio = (
            stream.filter(expr=f"check != '{_DF_PARTIAL}'")
            .drop_columns(["seg_cnt"]).to_pandas()
        )
        partials = stream.filter(expr=f"check == '{_DF_PARTIAL}'")
        parts = [vio, _df_crosscheck(index_root, partials)]
    else:
        parts = [stream.drop_columns(["seg_cnt"]).to_pandas()]
    loc_rows = [r for s in list_shards(index_root) for r in _audit_locator(s)]
    loc_rows += _audit_site_lemmas_global(index_root)
    loc_rows += _audit_prelists(index_root)
    if loc_rows:
        parts.append(pd.DataFrame(loc_rows))
    cols = list(VIOLATION_SCHEMA.names)
    # an all-healthy distributed pass yields a columnless empty frame
    parts = [p.reindex(columns=cols) for p in parts]
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values(["check", "term", "salt"]).reset_index(drop=True)
