"""Index segments: encode shuffle groups → compressed segment rows, write
bucket-partitioned Parquet, per-phase lineage manifests, and the read side.

Replaces the reference's ``index_table`` posting rows + ``lemma`` dictionary
(model/IndexEntity.java:11-23, model/LemmaEntity.java:12-28, written
row-at-a-time at dto/indexing/PageIndexer.java:161-204) with columnar
compressed posting lists (SURVEY.md §1, A2).

Layout under an index root (one directory per shard, SURVEY.md §4 resume row):

    <root>/shard=<s>/docs/*.parquet                doc store (S3)
    <root>/shard=<s>/postings/bucket=<b>/*.parquet exploded postings checkpoint
    <root>/shard=<s>/segments/bucket=<b>/*.parquet compressed segment rows (S4)
    <root>/shard=<s>/term_stats/*.parquet          per-site df (A1)
    <root>/shard=<s>/term_df/*.parquet             global df roll-up
    <root>/shard=<s>/doclen/*.parquet              doc_id → doc_len (A8)
    <root>/shard=<s>/sites/*.parquet               per-site page counts (A3)
    <root>/shard=<s>/stats.json                    N, total_tf, avgdl
    <root>/shard=<s>/_manifest/<phase>.json        lineage: config, counts, time

A phase writes into ``<dir>.tmp`` and renames on success (idempotent commit);
resume = skip phases whose manifest matches the current config.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from .codec import (
    BLOCK_SIZE,
    BlockReader,
    EncodedPostings,
    encode_postings,
    encode_postings_batch,
)
from .schema import SEGMENT_SCHEMA

# Segments and per-site df rows come out of the SAME shuffle (one wide op per
# build): 'seg' rows carry compressed postings, 'df' rows carry partial
# per-(site, term) document frequencies (partial because a salted term spans
# several groups; a tiny follow-up groupby finishes A1).
MIXED_SCHEMA = pa.schema(
    list(SEGMENT_SCHEMA)
    + [
        ("kind", pa.string()),  # 'seg' | 'df'
        ("site", pa.string()),
        ("df", pa.int64()),
    ]
)


# ---------------------------------------------------------------------------
# Encoding a shuffle group → segment rows (+ partial df rows)


def encode_group(df: pd.DataFrame, codec: str = "pfor") -> pa.Table:
    """``groupby(bucket, salt).map_groups`` body: encode every term's postings
    and emit per-(site, term) partial document frequencies.

    Input columns: doc_id, site, term, tf, doc_len, bucket, salt.  Within a
    group a term's rows are a complete per-salt sub-list (range-salted, so
    sub-lists of one term across groups cover disjoint, ordered docid ranges
    and simply concatenate at read time — SURVEY.md §4 skew row).
    """
    if len(df) == 0:
        return MIXED_SCHEMA.empty_table()
    # empty-doc marker rows (term "", tf 0 — see LemmatizeStage) exist only
    # for the doclen/sites scan; they are not postings
    if (df["term"] == "").any():
        df = df[df["term"] != ""]
        if len(df) == 0:
            return MIXED_SCHEMA.empty_table()
    df = df.sort_values(["term", "doc_id"], kind="stable")
    # resilience guard: bit-identical duplicate pages that survive the
    # url-dedup (same url, warc_ts AND content) yield duplicate (term, doc)
    # rows with equal tf/doc_len — drop the copies instead of crashing the
    # strictly-increasing-docid encoder
    df = df.drop_duplicates(["term", "doc_id"], keep="first")
    terms = df["term"].to_numpy()
    doc_ids = df["doc_id"].to_numpy().astype(np.uint64)
    tfs = df["tf"].to_numpy().astype(np.uint64)
    dls = df["doc_len"].to_numpy().astype(np.uint64)
    bucket = int(df["bucket"].iloc[0])
    salt = int(df["salt"].iloc[0])

    # term boundaries
    change = np.nonzero(terms[1:] != terms[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(terms)]))

    pos = df["positions"].to_numpy() if "positions" in df.columns else None

    # tail terms (<= one block of docs) dominate a web vocabulary; encoding
    # them one pfor/varbyte call per term pays ~1 ms of numpy fixed cost per
    # TERM.  Batch every single-block term into ONE vectorized encode (blocks
    # are encoded independently in both codecs, so the per-term blob slices
    # are byte-identical to the per-term encoder — pinned by tests).
    lens = ends - starts
    tail = lens <= BLOCK_SIZE
    batch = None
    tail_idx_of_term = np.cumsum(tail) - 1  # term index → position in batch
    if tail.any():
        row_sel = np.repeat(tail, lens)
        tail_bounds = np.concatenate(([0], np.cumsum(lens[tail])))
        batch = encode_postings_batch(
            doc_ids[row_sel], tfs[row_sel], dls[row_sel], tail_bounds, codec=codec
        )

    cols: dict[str, list] = {name: [] for name in MIXED_SCHEMA.names}
    for ti, (s, e) in enumerate(zip(starts, ends)):
        if tail[ti]:
            enc = batch.get(int(tail_idx_of_term[ti]))
        else:
            enc = encode_postings(doc_ids[s:e], tfs[s:e], dls[s:e], codec=codec)
        if pos is not None:
            blobs = pos[s:e]
            plens = np.fromiter((len(b) for b in blobs), dtype=np.uint32, count=e - s)
            cols["pos_nbytes_blob"].append(plens.tobytes())
            cols["pos_blob"].append(b"".join(blobs))
        else:
            cols["pos_nbytes_blob"].append(b"")
            cols["pos_blob"].append(b"")
        cols["term"].append(terms[s])
        cols["salt"].append(salt)
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
    n_seg = len(cols["term"])

    # partial A1: each (doc, term) row is one document occurrence
    dfc = df.groupby(["site", "term"], sort=False).size().reset_index(name="df")
    z = b""
    for site, term, cnt in zip(dfc["site"], dfc["term"], dfc["df"]):
        cols["term"].append(term)
        cols["salt"].append(salt)
        cols["bucket"].append(bucket)
        cols["n_docs"].append(0)
        cols["n_blocks"].append(0)
        for c in ("b_last_doc", "b_max_tf", "b_min_dl", "b_doc_nbytes",
                  "b_tf_nbytes", "b_dl_nbytes", "docs_blob", "tfs_blob", "dls_blob",
                  "pos_nbytes_blob", "pos_blob"):
            cols[c].append(z)
        cols["kind"].append("df")
        cols["site"].append(site)
        cols["df"].append(int(cnt))
        cols["codec"].append(codec)
    return pa.table(cols, schema=MIXED_SCHEMA)


def row_to_encoded(row: dict) -> EncodedPostings:
    return EncodedPostings(
        n_docs=row["n_docs"],
        n_blocks=row["n_blocks"],
        b_last_doc=row["b_last_doc"],
        b_max_tf=row["b_max_tf"],
        b_min_dl=row["b_min_dl"],
        b_doc_nbytes=row["b_doc_nbytes"],
        b_tf_nbytes=row["b_tf_nbytes"],
        b_dl_nbytes=row["b_dl_nbytes"],
        docs_blob=row["docs_blob"],
        tfs_blob=row["tfs_blob"],
        dls_blob=row["dls_blob"],
        # .get: layout-compat with pre-positional segment files
        pos_nbytes_blob=row.get("pos_nbytes_blob", b"") or b"",
        pos_blob=row.get("pos_blob", b"") or b"",
        # .get: layout-compat with pre-codec-column segment files (all vb)
        codec=row.get("codec") or "vb",
    )


# ---------------------------------------------------------------------------
# Lineage manifests / atomic phase commit


def manifest_path(shard_dir: str, phase: str) -> str:
    return os.path.join(shard_dir, "_manifest", f"{phase}.json")


def phase_done(shard_dir: str, phase: str, config_key: str) -> bool:
    p = manifest_path(shard_dir, phase)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            m = json.load(f)
        return m.get("status") == "done" and m.get("config_key") == config_key
    except (json.JSONDecodeError, OSError):
        return False


def commit_phase(shard_dir: str, phase: str, config_key: str, metrics: dict) -> None:
    os.makedirs(os.path.join(shard_dir, "_manifest"), exist_ok=True)
    m = {"status": "done", "phase": phase, "config_key": config_key, **metrics}
    tmp = manifest_path(shard_dir, phase) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1)
    os.replace(tmp, manifest_path(shard_dir, phase))


class phase_output:
    """Write a phase's output dir atomically: tmp dir → rename on success."""

    def __init__(self, final_dir: str):
        self.final_dir = final_dir
        self.tmp_dir = final_dir.rstrip("/") + ".tmp"

    def __enter__(self) -> str:
        if os.path.exists(self.tmp_dir):
            shutil.rmtree(self.tmp_dir)
        os.makedirs(self.tmp_dir, exist_ok=True)
        self.t0 = time.monotonic()
        return self.tmp_dir

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            if os.path.exists(self.final_dir):
                shutil.rmtree(self.final_dir)
            os.replace(self.tmp_dir, self.final_dir)
        return False

    @property
    def elapsed(self) -> float:
        return time.monotonic() - self.t0


# ---------------------------------------------------------------------------
# Read side


def segments_digest(shard_dir: str) -> str:
    """Content hash of a shard's segments (order-normalized) — used by the
    resume tests and the scaling protocol's output-equality assertion."""
    t = (
        pads.dataset(os.path.join(shard_dir, "segments"), format="parquet")
        .to_table()
        .sort_by(
            [("term", "ascending"), ("salt", "ascending"), ("kind", "ascending"),
             ("site", "ascending")]
        )
    )
    import hashlib as _hashlib

    h = _hashlib.sha256()
    for col in ("term", "salt", "kind", "site", "df", "n_docs", "docs_blob", "tfs_blob", "dls_blob"):
        for v in t[col].to_pylist():
            h.update(v if isinstance(v, bytes) else str(v).encode())
    return h.hexdigest()


def expand_parquet_paths(paths: list[str]) -> list[str]:
    """Flatten directories to their .parquet files (recursive, sorted).

    ``ray.data.read_parquet`` and ``pyarrow.dataset`` both expand a SINGLE
    directory path but reject a LIST that contains directories ("Cannot open
    for reading: path ... is a directory") — multi-shard reads must pass
    file paths.  Hive partition columns (``bucket=N``) are not re-derived
    from file paths; callers that need them must carry them in-row."""
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                out.extend(
                    os.path.join(root, f) for f in files if f.endswith(".parquet")
                )
        else:
            out.append(p)
    return sorted(out)


def list_shards(root: str) -> list[str]:
    out = []
    for name in sorted(os.listdir(root)):
        if name.startswith("shard=") and os.path.isdir(os.path.join(root, name)):
            out.append(os.path.join(root, name))
    return out


def shard_stats_census(shard_dirs: list[str]) -> dict[str, str]:
    """{shard basename → md5 of its stats.json} — the ONE census definition
    shared by the ``site_lemmas_global`` sidecar writer
    (build.write_site_lemmas_global), its reader
    (query._site_lemmas_sidecar) and the fsck
    (audit._audit_site_lemmas_global).  stats.json is rewritten by every
    build/merge of a shard, so its digest is a cheap proxy for "this shard
    changed since the sidecar was written"."""
    import hashlib

    return {
        os.path.basename(d): hashlib.md5(
            open(os.path.join(d, "stats.json"), "rb").read()
        ).hexdigest()
        for d in shard_dirs
    }


class SegmentReader:
    """Pruned access to one shard's compressed segments.

    Term lookup reads only the term's hash bucket directory with a pyarrow
    dataset filter (partition pruning replaces the reference's per-lemma
    B-tree probe, services/SearchingServiceImpl.java:78-90 / J2).
    """

    def __init__(self, shard_dir: str, num_buckets: int):
        self.shard_dir = shard_dir
        self.num_buckets = num_buckets
        self._ds_cache: dict[int, "pads.Dataset"] = {}

    def _bucket_dataset(self, bucket: int):
        ds = self._ds_cache.get(bucket)
        if ds is None:
            d = os.path.join(self.shard_dir, "segments", f"bucket={bucket}")
            if not os.path.isdir(d):
                return None
            ds = pads.dataset(d, format="parquet")
            self._ds_cache[bucket] = ds
        return ds

    def postings(self, term: str, bucket: int) -> list[BlockReader]:
        """All sub-lists for a term, ordered by salt (docid ranges ascend).

        A per-TERM filtered read (predicate pushdown on row-group stats) —
        never materializes the whole bucket, so reader memory is independent
        of bucket size; the engine caches decoded readers per term above."""
        ds = self._bucket_dataset(bucket)
        if ds is None:
            return []
        flt = pa.compute.field("term") == term
        if "kind" in ds.schema.names:  # mixed seg+df layout
            flt = flt & (pa.compute.field("kind") == "seg")
        rows = ds.to_table(filter=flt)
        if rows.num_rows == 0:
            return []
        rows = rows.sort_by("salt")
        return [BlockReader(row_to_encoded(r)) for r in rows.to_pylist()]


# ---------------------------------------------------------------------------
# index → dataset export (round 3)


def index_stats(index_root: str) -> dict:
    """Physical index introspection: distinct indexed terms and total
    posting count, read from the SEGMENT ROWS' own metadata (each row
    stores its sub-list's ``n_docs`` — no blob is decoded).  On a
    purge-free index these must equal the corpus's logical term/posting
    counts, which is what the SQL oracle pins — a one-row cross-check that
    the physical layout lost nothing (the audit's integrity scan goes
    deeper; this is the cheap census).  Stats are PHYSICAL: soft-purged
    sites still count until ``compact_segments`` rewrites them out.

    Distributed shape: one pruned (term, n_docs, kind) scan of every
    shard's segments with the 'seg' filter pushed down; the term-distinct
    groupby is vocabulary-bounded; the driver receives two scalars."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    seg_dirs = [
        os.path.join(d, "segments")
        for d in list_shards(index_root)
        if os.path.isdir(os.path.join(d, "segments"))
    ]
    # legacy pure-seg layouts lack the 'kind' column (same guard as
    # SegmentReader.postings / export_postings)
    has_kind = "kind" in pads.dataset(expand_parquet_paths(seg_dirs),
                                      format="parquet").schema.names
    kw = {"filter": pc.field("kind") == "seg"} if has_kind else {}
    cols = ["term", "n_docs"] + (["kind"] if has_kind else [])
    ds = rd.read_parquet(seg_dirs, columns=cols, **kw)
    # ONE scan: the vocab-bounded per-term roll-up carries both scalars
    g = ds.groupby("term").aggregate(Sum("n_docs", alias_name="n")).materialize()
    return {"n_terms": int(g.count()), "n_postings": int(g.sum("n") or 0)}


def scan_regex(index_root: str, pattern: str) -> "ray.data.Dataset":
    """Distributed regex grep over the doc store — the 'search the raw
    text' escape hatch next to the inverted index (Elasticsearch routes
    regexp queries to term-dictionary automata; a full-content scan like
    this is the map-only corpus job you run when the pattern isn't
    term-shaped: PII sweeps, leaked-secret audits, markup forensics).

    One pruned per-shard read of (url, site, text) with purged sites
    excluded AT THE SCAN (purge_site is the only tombstone writer, so
    site-exclusion equals the engine's doc-id tombstones — same argument as
    :func:`export_postings`), then Arrow's RE2 ``count_substring_regex``
    per batch (non-overlapping global matches, the redact_regex
    discipline).  Returns a streaming (url, n_hits) Dataset of matching
    docs only; nothing materializes."""
    import ray.data as rd

    from .incremental import load_tombstones

    docs_dirs = [os.path.join(d, "docs") for d in list_shards(index_root)]
    purged = sorted(load_tombstones(index_root)["sites"])
    kw = {}
    if purged:
        kw["filter"] = ~pc.field("site").isin(purged)
    ds = rd.read_parquet(docs_dirs, columns=["url", "site", "text"], **kw)

    def grep(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t.column("text"), pattern)
        out = pa.table({"url": t.column("url"), "n_hits": n.cast(pa.int64())})
        return out.filter(pc.greater(out.column("n_hits"), 0))

    return ds.map_batches(grep, batch_format="pyarrow", zero_copy_batch=True)


def export_postings(index_root: str) -> "ray.data.Dataset":
    """Decode the compressed segments back into an exploded ``(url, term,
    tf)`` dataset — the index→training-features export (per-document term
    vectors for downstream corpus statistics, TF-IDF features, distillation
    sets) and a dataset-level round-trip check of the whole codec path.

    Distributed shape: one ``read_parquet`` over every shard's segment
    files ('seg' rows only — the colocated partial-df rows are filtered at
    the scan) → a ``map_batches`` decode stage (each input row is ONE term
    sub-list; the blob decode is vectorized numpy, so per-row Python is per
    posting LIST, never per posting) → a hash JOIN with the doc store's
    skinny (doc_id, url) projection to resolve urls.  No stage materializes
    the exploded table; the join shuffles it hash-partitioned by doc_id.
    """
    import ray.data as rd
    import pyarrow.compute as pc

    from .codec import decode_postings
    from .incremental import load_tombstones

    seg_dirs, docs_dirs = [], []
    for d in list_shards(index_root):
        s = os.path.join(d, "segments")
        if os.path.isdir(s):
            seg_dirs.append(s)
        docs_dirs.append(os.path.join(d, "docs"))

    # U2 purge consistency: every tombstone the engine honors is site-scoped
    # (purge_site is the only writer), so excluding purged SITES on the
    # doc-store join side drops exactly the tombstoned doc ids — the export
    # equals a physical rebuild without the purged sites, like query results
    purged = set(load_tombstones(index_root)["sites"])

    def decode(t: pa.Table) -> pa.Table:
        if "kind" in t.schema.names:
            t = t.filter(pc.equal(t.column("kind"), "seg"))
        doc_parts, tf_parts, term_parts = [], [], []
        for row in t.to_pylist():
            docs, tfs, _dls = decode_postings(row_to_encoded(row))
            doc_parts.append(docs.astype(np.int64))
            tf_parts.append(tfs.astype(np.int64))
            term_parts.append(np.repeat(row["term"], len(docs)))
        if not doc_parts:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "term": pa.array([], pa.string()),
                 "tf": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(doc_parts), pa.int64()),
                "term": pa.array(np.concatenate(term_parts), pa.string()),
                "tf": pa.array(np.concatenate(tf_parts), pa.int64()),
            }
        )

    exploded = rd.read_parquet(expand_parquet_paths(seg_dirs)).map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True
    )
    url_filter = None
    if purged:
        url_filter = ~pc.field("site").isin(sorted(purged))
    urls = rd.read_parquet(
        expand_parquet_paths(docs_dirs), columns=["doc_id", "url"], filter=url_filter
    )
    try:
        ncpu = int(__import__("ray").cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        ncpu = 8
    # both sides are schema-pinned read/decode products (no aggregate
    # upstream; the urls read keeps its schema even when filtered empty) —
    # guards off, routed through safe_join for the uniform audit surface
    from .joins import safe_join

    joined = safe_join(
        exploded, urls, join_type="inner", num_partitions=max(2, ncpu // 2),
        on=("doc_id",), guard_left=False, guard_right=False,
    )
    return joined.select_columns(["url", "term", "tf"])
