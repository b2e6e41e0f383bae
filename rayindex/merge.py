"""Segment-level index merge — the "merge" of the north rule's
"posting-list construction, merge, compression", Lucene-style.

The reference has no merge at all: combining two crawls means re-running the
whole pipeline (services/IndexingServiceImpl.java:40-60 drops and re-indexes
every site), and a purge is a cascade of SQL DELETEs
(dto/indexing/SiteIndexer.java:108-129).  At 10^12 documents, re-lemmatizing
the corpus to combine two already-built indexes (or to make a soft-deleted
site physical) is the single most expensive thing an index pipeline can do.

``merge_indexes`` combines N built indexes into one WITHOUT touching the raw
pages: per term-hash bucket, every input's compressed sub-lists are decoded,
merge-sorted by doc id, re-salted by the exact (no longer sampled) document
frequency and re-encoded.  Soft-deleted sites (U2 tombstones) are dropped
physically during the rewrite, so ``compact_segments`` — a single-input merge
— is the segment-level compaction fast path: it replaces ``compact``'s full
rebuild-from-pages with a decode→filter→re-encode pass over ~259 B/doc of
segment bytes instead of ~2.5 KB/doc of HTML.

Distributed shape (idiomatic Ray Data, matching the build's P4):

- one task per term-hash bucket (``rd.from_items`` → ``map_batches``): the
  bucket layout is ALIGNED across inputs (same ``hash(term) % B``), so a
  bucket merges entirely locally — no all-to-all shuffle of posting data at
  any point, the only wide op is the skinny doclen re-sort;
- purged doc ids are broadcast once (``ray.put``) and probed with
  ``searchsorted`` — never re-shipped per task;
- the doc store / doclen / sites / term-stats sides are streamed
  ``read_parquet → filter → write_parquet`` with site-level predicates
  pushed into the scan (doclen is (site, doc_id)-sorted, so row-group
  statistics prune purged sites at the read).

Inputs must share ``num_buckets``, the analyzer and the positional flag
(asserted from ``stats.json``).  By default they must cover DISJOINT
document sets (disjoint url spaces — e.g. different url-space shards or
different crawls of different sites): overlapping doc ids fail loudly in
the strictly-increasing-docid encoder rather than silently double-counting
a document.  ``on_conflict="latest"`` instead resolves overlaps keep-latest
(max (warc_ts, input rank) per doc — the build's D1 rule across inputs),
making the merge an UPSERT: a re-crawl merges into the standing index at
segment-bytes cost, postings/df/doclen/doc-store of losing versions all
dropped during the same rewrite.

Output: a complete index root (segments / docs / doclen / sites /
term_stats / term_df / stats.json / _manifest lineage per shard) that the
query engine serves EXACTLY like a full rebuild over the union corpus —
global N, avgdl and df are sums of the inputs', and both scorers use only
those globals at query time.  The SHARD NAMESPACE is preserved: inputs
sharing ``num_shards`` merge shard-by-aligned-shard (the url space is
hash-partitioned by the same rule in every build), each shard group an
independent job-sized unit — the multi-node shape of a 10^12-doc merge.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .build import (DEFAULT_SALT_TARGET, DOCS_COMPRESSION,
                    DOCS_ROW_GROUP_SIZE, _config_key, _write_parquet)
from .codec import decode_postings, encode_postings
from .incremental import load_tombstones
from .membership import in_sorted
from .schema import range_salt
from .segments import (
    MIXED_SCHEMA,
    commit_phase,
    expand_parquet_paths,
    list_shards,
    phase_done,
    phase_output,
    row_to_encoded,
)


def _resolve_ref(ref):
    if isinstance(ref, ray.ObjectRef):
        return ray.get(ref)
    return ref


def _purged_sites(roots: list[str]) -> set[str]:
    """U2 tombstones are SITE-scoped, and merge keeps that semantics global:
    a site purged in ANY input is absent from the merged output entirely
    (also from inputs that never saw the purge) — anything else would leave
    the output half-deleted."""
    sites: set[str] = set()
    for root in roots:
        sites.update(load_tombstones(root)["sites"])
    return sites


def _purged_doc_ids(shard_dirs: list[str], sites: set[str]) -> np.ndarray:
    """Doc ids to drop (sorted uint64) for ONE aligned shard group.

    The ids come from each input shard's doclen table filtered to the
    purged-site union ((site, doc_id)-sorted, so row-group statistics prune
    the scan), not from the per-root sidecars.  One driver read per shard,
    then one ``ray.put`` broadcast; a purge big enough to strain driver
    memory should be compacted (this module) before being merged again."""
    if not sites:
        return np.empty(0, np.uint64)
    ids: list[np.ndarray] = []
    flt = pc.field("site").isin(sorted(sites))
    for d in shard_dirs:
        t = pads.dataset(os.path.join(d, "doclen"), format="parquet").to_table(
            columns=["doc_id"], filter=flt
        )
        ids.append(t.column("doc_id").to_numpy().astype(np.uint64))
    return np.unique(np.concatenate(ids))


def _overlap_versions(shard_dirs: list[str]):
    """Keep-latest resolution for docs present in MORE THAN ONE input of one
    aligned shard group: (sorted doc_ids uint64, winner_src int32, sites).

    Winner = max (warc_ts, input rank) — the build's D1 keep-latest dedup
    rule (rayindex/build.py P1) extended across inputs, ties broken toward
    the later-listed input.  Detection is a DISTRIBUTED groupby over the
    skinny (doc_id, site, warc_ts, src) projection; only the overlapping
    rows reach the driver, so driver/broadcast memory is bounded by the
    RE-CRAWLED SUBSET (like the purge-tombstone broadcast), not the corpus.
    A re-crawl so large the overlap strains memory should be merged
    crawl-by-crawl (each merge halves the surviving overlap)."""
    empty = (np.empty(0, np.uint64), np.empty(0, np.int32), np.empty(0, object))
    n = len(shard_dirs)
    if n < 2:
        return empty
    from ray.data.aggregate import Count, Max

    parts = []
    for src, d in enumerate(shard_dirs):
        ds = rd.read_parquet(
            os.path.join(d, "docs"), columns=["doc_id", "site", "warc_ts"]
        )
        # one int64 per version encodes the lexicographic (warc_ts, src) max:
        # val = ts_us * n + src (ts_us ≈ 1.8e15 × n ≤ 64 inputs ≪ 2^63), so
        # the whole keep-latest pick is a vectorized hash-aggregate Max —
        # no per-group Python anywhere
        parts.append(ds.map_batches(
            lambda t, s=src: pa.table({
                "doc_id": t.column("doc_id"),
                "site": t.column("site"),
                # epoch-µs int64 — no timestamp-unit skew across conversions
                "val": pc.add(
                    pc.multiply(
                        t.column("warc_ts").cast(pa.int64()),
                        pa.scalar(n, pa.int64()),
                    ),
                    pa.scalar(s, pa.int64()),
                ),
            }),
            batch_format="pyarrow", zero_copy_batch=True,
        ))
    allv = parts[0].union(*parts[1:])
    # doc_ids are unique WITHIN an input, so count(doc_id) ≥ 2 ⇔ the doc is
    # in more than one input; only those rows leave the aggregate
    agg = allv.groupby("doc_id").aggregate(
        Count(alias_name="n_versions"),
        Max("val", alias_name="win"),
        Max("site", alias_name="site"),  # site is a pure function of doc_id
    )
    ov = agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n_versions"), 2)),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()
    if len(ov) == 0:
        return empty
    ov = ov.sort_values("doc_id").reset_index(drop=True)
    return (
        ov["doc_id"].to_numpy().astype(np.uint64),
        (ov["win"].to_numpy().astype(np.int64) % n).astype(np.int32),
        ov["site"].to_numpy(),
    )


class _DropLosing:
    """Streaming filter for one input's docs/doclen scan: drop rows whose
    (doc_id, input) version LOST the keep-latest resolution.  The overlap
    arrays are broadcast once (``ray.put``) and probed with searchsorted —
    never re-shipped per batch."""

    def __init__(self, overlap_ref, src: int):
        self._ref = overlap_ref
        self.src = src
        self.overlap: tuple | None = (
            overlap_ref if isinstance(overlap_ref, tuple) else None
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.overlap is None:
            self.overlap = _resolve_ref(self._ref)
        ids, winner, _sites = self.overlap
        if not ids.size or not t.num_rows:
            return t
        d = t.column("doc_id").to_numpy().astype(np.uint64)
        ix = np.minimum(np.searchsorted(ids, d), ids.size - 1)
        lose = (ids[ix] == d) & (winner[ix] != self.src)
        return t.filter(pa.array(~lose))


def _pos_slices(enc) -> list[bytes]:
    """Per-doc position blobs of one sub-list (empty list when non-positional)."""
    if not enc.pos_nbytes_blob:
        return []
    lens = np.frombuffer(enc.pos_nbytes_blob, dtype=np.uint32).astype(np.int64)
    off = np.concatenate(([0], np.cumsum(lens)))
    mv = memoryview(enc.pos_blob)
    return [bytes(mv[off[i]: off[i + 1]]) for i in range(len(lens))]


class _MergeBucketUnit:
    """One reduce task per term-hash bucket: decode every input's sub-lists,
    merge-sort per term, drop tombstoned docs and keep-latest-losing doc
    versions, re-salt by EXACT df, re-encode.  Also merges the colocated
    partial-df rows (summed per (site, term), purged sites dropped, losing
    versions decremented) so the downstream stats phase works unchanged."""

    def __init__(self, seg_dirs: list[str], purged_ref, purged_sites: list[str],
                 salt_df_threshold: int, salt_target: int, positions: bool,
                 overlap_ref=None):
        self.seg_dirs = seg_dirs
        self._purged_ref = purged_ref
        self.purged: np.ndarray | None = (
            purged_ref if isinstance(purged_ref, np.ndarray) else None
        )
        self._overlap_ref = overlap_ref
        self.overlap: tuple | None = (
            overlap_ref if isinstance(overlap_ref, tuple) else None
        )
        self.purged_sites = set(purged_sites)
        self.threshold = salt_df_threshold
        self.salt_target = salt_target
        self.positions = positions

    def _get_purged(self) -> np.ndarray:
        if self.purged is None:
            self.purged = _resolve_ref(self._purged_ref)
        return self.purged

    def _get_overlap(self) -> tuple:
        """(sorted overlap doc_ids uint64, winner_src int32, sites) or empty."""
        if self.overlap is None:
            if self._overlap_ref is None:
                self.overlap = (np.empty(0, np.uint64), np.empty(0, np.int32),
                                np.empty(0, object))
            else:
                self.overlap = _resolve_ref(self._overlap_ref)
        return self.overlap

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[pa.Table] = []
        for unit in batch.to_pylist():
            b = int(unit["bucket"])
            # per-input reads so every sub-list carries its input rank (src):
            # keep-latest needs to know WHICH version of an overlapping doc
            # each posting belongs to
            tabs = []
            for src, d in enumerate(self.seg_dirs):
                bd = os.path.join(d, f"bucket={b}")
                if not os.path.isdir(bd):
                    continue
                t = pads.dataset(expand_parquet_paths([bd]), format="parquet").to_table()
                if t.num_rows:
                    tabs.append(t.append_column(
                        "src", pa.array(np.full(t.num_rows, src, np.int32))
                    ))
            if not tabs:
                continue
            t = pa.concat_tables(tabs)
            out.append(self._merge_bucket(b, t))
        if not out:
            return MIXED_SCHEMA.empty_table()
        return pa.concat_tables(out)

    def _merge_bucket(self, bucket: int, t: pa.Table) -> pa.Table:
        purged = self._get_purged()
        cols: dict[str, list] = {name: [] for name in MIXED_SCHEMA.names}
        # per-(site, term) df decrements from keep-latest-dropped postings —
        # collected by the seg pass below, applied to the df partials after
        df_dec: dict[tuple[str, str], int] = {}

        # ---- seg rows: per term, decode → merge-sort → filter → re-encode --
        seg = t.filter(pc.equal(t.column("kind"), "seg"))
        if seg.num_rows:
            rows = seg.sort_by("term").to_pylist()
            i = 0
            while i < len(rows):
                j = i
                term = rows[i]["term"]
                while j < len(rows) and rows[j]["term"] == term:
                    j += 1
                self._merge_term(bucket, term, rows[i:j], purged, cols, df_dec)
                i = j

        # ---- df rows: sum partials per (site, term), drop purged sites,
        # subtract keep-latest-dropped versions ------------------------------
        dfr = t.filter(pc.equal(t.column("kind"), "df"))
        if dfr.num_rows:
            dfp = dfr.select(["site", "term", "df"]).to_pandas()
            if self.purged_sites:
                dfp = dfp[~dfp["site"].isin(self.purged_sites)]
            agg = dfp.groupby(["site", "term"], sort=False)["df"].sum().reset_index()
            z = b""
            for site, term, dfv in zip(agg["site"], agg["term"], agg["df"]):
                dfv = int(dfv) - df_dec.get((site, term), 0)
                if dfv <= 0:
                    continue
                cols["term"].append(term)
                cols["salt"].append(0)
                cols["bucket"].append(bucket)
                cols["n_docs"].append(0)
                cols["n_blocks"].append(0)
                for c in ("b_last_doc", "b_max_tf", "b_min_dl", "b_doc_nbytes",
                          "b_tf_nbytes", "b_dl_nbytes", "docs_blob", "tfs_blob",
                          "dls_blob", "pos_nbytes_blob", "pos_blob"):
                    cols[c].append(z)
                cols["kind"].append("df")
                cols["site"].append(site)
                cols["df"].append(dfv)
                cols["codec"].append("vb")
        return pa.table(cols, schema=MIXED_SCHEMA)

    def _merge_term(self, bucket: int, term: str, rows: list[dict],
                    purged: np.ndarray, cols: dict[str, list],
                    df_dec: dict[tuple[str, str], int]) -> None:
        encs = [row_to_encoded(r) for r in rows]
        # re-encode under the sources' codec (first row; merged indexes are
        # built with one codec — a mixed-codec merge keeps rows decodable
        # either way since the codec tag is per segment row)
        codec = encs[0].codec
        parts = [decode_postings(e) for e in encs]
        doc_ids = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts]).astype(np.uint64)
        dls = np.concatenate([p[2] for p in parts]).astype(np.uint64)
        srcs = np.concatenate([
            np.full(len(p[0]), r["src"], np.int32) for p, r in zip(parts, rows)
        ])
        pos: list[bytes] | None = None
        if self.positions:
            pos = []
            for e in encs:
                pos.extend(_pos_slices(e))
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, tfs, dls, srcs = doc_ids[order], tfs[order], dls[order], srcs[order]

        keep = np.ones(doc_ids.size, bool)
        if purged.size:
            keep &= ~in_sorted(doc_ids, purged)
        ov_ids, ov_winner, ov_sites = self._get_overlap()
        if ov_ids.size:
            ix = np.minimum(np.searchsorted(ov_ids, doc_ids), ov_ids.size - 1)
            lose = (ov_ids[ix] == doc_ids) & (ov_winner[ix] != srcs)
            if lose.any():
                site_ix, cnt = np.unique(ix[lose], return_counts=True)
                for k, c in zip(site_ix, cnt):
                    dkey = (ov_sites[k], term)
                    df_dec[dkey] = df_dec.get(dkey, 0) + int(c)
                keep &= ~lose
        if not keep.all():
            doc_ids, tfs, dls = doc_ids[keep], tfs[keep], dls[keep]
            if pos is not None:
                order = order[keep]
        if doc_ids.size == 0:
            return
        # exact re-salt: merged df is known exactly here, so skew handling
        # needs no sampling pass (the build's _sample_heavy_terms analogue)
        n_salts = 1
        if doc_ids.size >= self.threshold:
            n_salts = max(1, -(-int(doc_ids.size) // self.salt_target))
        salts = range_salt(doc_ids, n_salts)
        for s in np.unique(salts):
            sel = salts == s
            enc = encode_postings(doc_ids[sel], tfs[sel], dls[sel], codec=codec)
            if pos is not None:
                blobs = [pos[k] for k in order[sel]]
                plens = np.fromiter((len(x) for x in blobs), dtype=np.uint32,
                                    count=len(blobs))
                cols["pos_nbytes_blob"].append(plens.tobytes())
                cols["pos_blob"].append(b"".join(blobs))
            else:
                cols["pos_nbytes_blob"].append(b"")
                cols["pos_blob"].append(b"")
            cols["term"].append(term)
            cols["salt"].append(int(s))
            cols["bucket"].append(bucket)
            cols["n_docs"].append(enc.n_docs)
            cols["n_blocks"].append(enc.n_blocks)
            cols["b_last_doc"].append(enc.b_last_doc)
            cols["b_max_tf"].append(enc.b_max_tf)
            cols["b_min_dl"].append(enc.b_min_dl)
            cols["b_doc_nbytes"].append(enc.b_doc_nbytes)
            cols["b_tf_nbytes"].append(enc.b_tf_nbytes)
            cols["b_dl_nbytes"].append(enc.b_dl_nbytes)
            cols["docs_blob"].append(enc.docs_blob)
            cols["tfs_blob"].append(enc.tfs_blob)
            cols["dls_blob"].append(enc.dls_blob)
            cols["kind"].append("seg")
            cols["site"].append("")
            cols["df"].append(0)
            cols["codec"].append(enc.codec)


def merge_indexes(
    index_roots: list[str],
    out_dir: str,
    analyzer_spec: dict,
    *,
    salt_df_threshold: int | None = None,
    salt_target: int = DEFAULT_SALT_TARGET,
    resume: bool = True,
    on_conflict: str = "error",
) -> dict[str, Any]:
    """Merge N built indexes into one (see module doc).

    ``on_conflict`` governs docs present in more than one input (the same
    url re-crawled): ``"error"`` (default) expects disjoint doc sets and
    fails loudly in the strictly-increasing-docid encoder; ``"latest"``
    keeps the newest version per doc — max (warc_ts, input rank), the
    build's D1 keep-latest rule extended across inputs — and drops the
    losing versions' postings, df contributions, doclen and doc-store rows
    during the rewrite, making the merge an UPSERT (Lucene segment-merge-
    with-deletes shape; the segment-level analogue of re-indexing a
    re-crawl from pages).

    The SHARD NAMESPACE is preserved: inputs must share ``num_shards`` (the
    url space is partitioned by the same ``hash(url) % num_shards`` rule in
    every build, so shard i of every input covers the same url slice), and
    shard i of each input merges into output shard i — each shard group is
    an independent unit with no cross-shard traffic, so at 10^12 docs every
    shard merge is its own ``ray job submit`` exactly like the build.

    Returns per-phase metrics like ``build_index`` (summed across shards).
    Resumable: each phase of each shard commits a lineage manifest keyed by
    the input roots' stats."""

    if on_conflict not in ("error", "latest"):
        raise ValueError(f"on_conflict must be 'error' or 'latest', got {on_conflict!r}")

    def _shard_no(d: str) -> int:
        return int(os.path.basename(d).split("=", 1)[1])

    per_root: list[list[str]] = []
    for root in index_roots:
        shards = list_shards(root)
        if not shards:
            raise FileNotFoundError(f"no shards under {root}")
        per_root.append(sorted(shards, key=_shard_no))
    if len({len(s) for s in per_root}) != 1:
        raise ValueError("merge inputs must share num_shards")
    n_shards = len(per_root[0])

    stats_all = [
        [json.load(open(os.path.join(d, "stats.json"))) for d in shards]
        for shards in per_root
    ]
    ref = stats_all[0][0]
    num_buckets = ref["num_buckets"]
    positions = bool(ref.get("positions", False))
    # recorded so post-merge delta/compact rebuilds inherit the codec
    # (per-segment-row tags keep a mixed-codec merge decodable either way;
    # the reference shard's codec steers future re-encodes)
    codec = ref.get("codec") or "vb"
    for shards, root_stats in zip(per_root, stats_all):
        for d, s in zip(shards, root_stats):
            if s["num_buckets"] != num_buckets:
                raise ValueError("merge inputs must share num_buckets")
            if s.get("analyzer") != ref.get("analyzer"):
                raise ValueError("merge inputs must share the analyzer")
            if bool(s.get("positions", False)) != positions:
                raise ValueError("merge inputs must share the positional flag")
            if int(s.get("shard_index", _shard_no(d))) != _shard_no(d):
                raise ValueError(f"shard_index mismatch under {d}")

    purged_sites = _purged_sites(index_roots)
    metrics: dict[str, Any] = {
        "phases": {}, "inputs": len(index_roots), "num_shards": n_shards,
    }
    t_start = time.monotonic()
    for si in range(n_shards):
        group = [shards[si] for shards in per_root]
        key = _config_key(
            op="merge",
            inputs=sorted(index_roots),
            shard=si,
            input_stats=sorted(
                json.dumps(stats_all[r][si], sort_keys=True)
                for r in range(len(per_root))
            ),
            purged=sorted(purged_sites),
            salt=[salt_df_threshold, salt_target],
            on_conflict=on_conflict,
        )
        shard_metrics = _merge_shard(
            group,
            os.path.join(out_dir, f"shard={si}"),
            analyzer_spec,
            num_buckets=num_buckets,
            positions=positions,
            codec=codec,
            shard_index=si,
            num_shards=n_shards,
            purged_sites=purged_sites,
            key=key,
            salt_df_threshold=salt_df_threshold,
            salt_target=salt_target,
            resume=resume,
            on_conflict=on_conflict,
        )
        for ph, sec in shard_metrics.items():
            metrics["phases"][ph] = round(metrics["phases"].get(ph, 0.0) + sec, 3)
    if n_shards > 1:
        # the merged shards' stats.json are new, so no prior root-level
        # site_lemmas_global census can match — regenerate it here or every
        # statistics() call on the merged tree pays the full dictionary scan
        from .build import write_site_lemmas_global

        write_site_lemmas_global(out_dir)
    metrics["total_seconds"] = round(time.monotonic() - t_start, 3)
    return metrics


def _merge_shard(
    shard_dirs: list[str],
    shard_dir: str,
    analyzer_spec: dict,
    *,
    num_buckets: int,
    positions: bool,
    codec: str,
    shard_index: int,
    num_shards: int,
    purged_sites: set[str],
    key: str,
    salt_df_threshold: int | None,
    salt_target: int,
    resume: bool,
    on_conflict: str = "error",
) -> dict[str, float]:
    """Merge one aligned shard group (shard i of every input) into one
    output shard — the per-``ray job submit`` unit of a sharded merge."""
    purged_ids = _purged_doc_ids(shard_dirs, purged_sites)
    os.makedirs(shard_dir, exist_ok=True)
    metrics: dict[str, float] = {}

    site_filter = None
    if purged_sites:
        site_filter = ~pc.field("site").isin(sorted(purged_sites))

    overlap = (np.empty(0, np.uint64), np.empty(0, np.int32), np.empty(0, object))
    if on_conflict == "latest":
        overlap = _overlap_versions(shard_dirs)
    overlap_ref = ray.put(overlap) if overlap[0].size else overlap

    def _versioned_scan(table_name: str) -> "rd.Dataset":
        """Union of per-input scans with the keep-latest filter applied per
        input (each input's rank is its provenance)."""
        parts = []
        for src, d in enumerate(shard_dirs):
            ds = rd.read_parquet(os.path.join(d, table_name), filter=site_filter)
            parts.append(ds.map_batches(
                _DropLosing(overlap_ref, src),
                batch_format="pyarrow", zero_copy_batch=True,
            ))
        return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    # ---- docs store: streamed concat minus purged sites / losing versions -
    t0 = time.monotonic()
    docs_dirs = [os.path.join(d, "docs") for d in shard_dirs]
    if not (resume and phase_done(shard_dir, "docs", key)):
        with phase_output(os.path.join(shard_dir, "docs")) as tmp:
            if overlap[0].size:
                _write_parquet(_versioned_scan("docs"), tmp,
                               compression=DOCS_COMPRESSION,
                               row_group_size=DOCS_ROW_GROUP_SIZE)
            else:
                _write_parquet(
                    rd.read_parquet(expand_parquet_paths(docs_dirs), filter=site_filter),
                    tmp, compression=DOCS_COMPRESSION,
                    row_group_size=DOCS_ROW_GROUP_SIZE,
                )
        commit_phase(shard_dir, "docs", key,
                     {"seconds": round(time.monotonic() - t0, 3)})
        # the merged doc store is new: refresh its locator sidecar so engine
        # replicas load it instead of falling back to the scan path
        from .build import build_doc_locator

        build_doc_locator(shard_dir)
    metrics["docs"] = round(time.monotonic() - t0, 3)

    # ---- doclen: concat minus purged/losing, re-sorted (site, doc_id) -----
    # the only wide op in a merge — over the skinny ~16 B/row table
    t1 = time.monotonic()
    if not (resume and phase_done(shard_dir, "prestats", key)):
        with phase_output(os.path.join(shard_dir, "doclen")) as tmp:
            if overlap[0].size:
                dl = _versioned_scan("doclen")
            else:
                dl = rd.read_parquet(
                    expand_parquet_paths(
                        [os.path.join(d, "doclen") for d in shard_dirs]
                    ),
                    filter=site_filter,
                )
            _write_parquet(dl.sort(["site", "doc_id"]), tmp)
        # sites + stats.json derived from the MERGED doclen exactly like the
        # build's P3 (partial agg → tiny groupby → O(sites) driver rows) —
        # summing the inputs' sites tables would double-count keep-latest
        # losers, so the merged doclen is the one source of truth
        from ray.data.aggregate import Sum

        dmerged = rd.read_parquet(
            os.path.join(shard_dir, "doclen"), columns=["site", "doc_len"]
        )
        partial = dmerged.map_batches(
            lambda t: t.group_by("site").aggregate(
                [("doc_len", "count"), ("doc_len", "sum")]
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        per_site = (
            partial.groupby("site")
            .aggregate(
                Sum("doc_len_count", alias_name="pages"),
                Sum("doc_len_sum", alias_name="site_tf"),
            )
            .to_pandas()
        )
        with phase_output(os.path.join(shard_dir, "sites")) as tmp:
            if len(per_site) and "site" in per_site.columns:
                agg = per_site.sort_values("site").reset_index(drop=True)
            else:
                agg = pd.DataFrame({"site": [], "pages": [], "site_tf": []})
            pq.write_table(
                pa.table({
                    "site": pa.array(agg["site"].astype(str), pa.string()),
                    "pages": pa.array(agg["pages"].astype(np.int64), pa.int64()),
                    "site_tf": pa.array(agg["site_tf"].astype(np.int64), pa.int64()),
                }),
                os.path.join(tmp, "sites.parquet"),
            )
        n_docs = int(agg["pages"].sum()) if len(agg) else 0
        total_tf = int(agg["site_tf"].sum()) if len(agg) else 0
        stats = {
            "n_docs": n_docs,
            "total_tf": total_tf,
            "avgdl": (total_tf / n_docs) if n_docs else 0.0,
            "num_buckets": num_buckets,
            "analyzer": analyzer_spec.get("name"),
            "shard_index": shard_index,
            "num_shards": num_shards,
            "positions": positions,
            "codec": codec,
            "merged_from": len(shard_dirs),
        }
        with open(os.path.join(shard_dir, "stats.json.tmp"), "w") as f:
            json.dump(stats, f, indent=1)
        os.replace(os.path.join(shard_dir, "stats.json.tmp"),
                   os.path.join(shard_dir, "stats.json"))
        commit_phase(shard_dir, "prestats", key,
                     {"seconds": round(time.monotonic() - t1, 3), **stats})
    metrics["prestats"] = round(time.monotonic() - t1, 3)

    # ---- segments: one merge task per bucket (no posting shuffle) ----------
    t2 = time.monotonic()
    if not (resume and phase_done(shard_dir, "segments", key)):
        stats = json.load(open(os.path.join(shard_dir, "stats.json")))
        threshold = salt_df_threshold
        if threshold is None:
            threshold = max(salt_target, int(stats["n_docs"]) // 8 or 1)
        seg_dirs = [os.path.join(d, "segments") for d in shard_dirs]
        buckets = sorted({
            int(name.split("=", 1)[1])
            for d in seg_dirs if os.path.isdir(d)
            for name in os.listdir(d) if name.startswith("bucket=")
        })
        purged_ref = ray.put(purged_ids) if purged_ids.size else purged_ids
        with phase_output(os.path.join(shard_dir, "segments")) as tmp:
            units = rd.from_items([{"bucket": b} for b in buckets])
            segs = units.map_batches(
                _MergeBucketUnit(seg_dirs, purged_ref, sorted(purged_sites),
                                 threshold, salt_target, positions,
                                 overlap_ref=overlap_ref),
                batch_size=1, batch_format="pyarrow", zero_copy_batch=True,
            )
            _write_parquet(segs, tmp, partition_cols=["bucket"])
        commit_phase(shard_dir, "segments", key,
                     {"seconds": round(time.monotonic() - t2, 3)})
    metrics["segments"] = round(time.monotonic() - t2, 3)

    # ---- term_stats / term_df: the build's shared shuffle-free P5 ---------
    t3 = time.monotonic()
    if not (resume and phase_done(shard_dir, "stats", key)):
        from .build import write_term_stats

        write_term_stats(shard_dir)
        commit_phase(shard_dir, "stats", key,
                     {"seconds": round(time.monotonic() - t3, 3)})
    metrics["stats"] = round(time.monotonic() - t3, 3)

    return metrics


def compact_segments(index_dir: str, out_dir: str, analyzer_spec: dict,
                     **kwargs) -> dict[str, Any]:
    """Make U2 soft deletes physical WITHOUT re-indexing: a single-input
    segment merge that drops every tombstoned doc during the decode→re-encode
    pass.  Compare ``incremental.compact``, which rebuilds from the raw pages
    (needed when the page set itself changed); this path costs segment bytes
    (~259 B/doc), not HTML bytes (~2.5 KB/doc), and never runs the analyzer."""
    return merge_indexes([index_dir], out_dir, analyzer_spec, **kwargs)
