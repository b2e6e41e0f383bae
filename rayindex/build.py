"""The index-build pipeline (flagship, SURVEY.md §3.1) — pure Ray Data.

Reference lifecycle being replaced: ``GET /api/startIndexing`` spawns one
thread per site (services/IndexingServiceImpl.java:35-48), a ForkJoinPool per
site crawls pages (dto/indexing/SiteIndexer.java:59-62), and every page does
fetch → jsoup text → collectLemmas → per-lemma SQL upserts
(dto/indexing/PageIndexer.java:68-121,161-204) against shared MySQL state.

Here the whole build is a sequence of checkpointed Dataset phases over the
``pages`` Parquet table (BASELINE.json input_hint); each phase streams, writes
its output atomically (tmp dir → rename) and records a lineage manifest, so a
re-run skips completed phases (resume) and a killed run loses only the phase
in flight:

  P1 docs      read(url,warc_ts,html) → extract (M1/M2 tasks) → doc_id/site
               → exact url-dedup keep-latest (D1) → docs/
  P2 postings  docs(text) → Lemmatize actor pool (ST1, M3-M6) → term bucket
               → postings/ (doc_id, site, term, tf, doc_len, bucket)
  P3 stats     per-site df (A1) → term_stats/; global df → term_df/;
               doc_len (A8) → doclen/; site page counts (A3) → sites/;
               N, total_tf, avgdl → stats.json
  P4 segments  postings + skew salt for head terms (df-driven, SURVEY.md §4)
               → groupby(bucket, salt) shuffle → encode_group →
               segments/bucket=<b>/ (delta+varbyte, block-max)

Sharding for 10^12-doc scale: ``num_shards > 1`` partitions the url space by
``hash(url) % num_shards``; each shard is an independent resumable run of the
phases above (its own directory + manifests) and the query engine merges
shards at read time.  On a real cluster each shard is one ``ray job submit``
unit of work; scaling evidence per BASELINE.md protocol.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import time
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from .analyze import LemmatizeStage
from .extract import extract_batch
from .schema import doc_ids_for_urls, hash64_strings, term_bucket, range_salt
from .segments import commit_phase, encode_group, phase_done, phase_output

_SITE_RE = r"^[a-z][a-z0-9+.-]*://([^/]+)"
# M8 (dto/indexing/PageIndexer.java:136-144): media/doc extensions + ?/# urls
_URL_REJECT_RE = r"(?i)\.(png|jpg|gif|bmp|jpeg|pdf|php|zip)$|[?#]"

DEFAULT_NUM_BUCKETS = 32
DEFAULT_SALT_TARGET = 1 << 18  # max postings per salted sub-list of a head term


def _config_key(**kwargs) -> str:
    return hashlib.sha256(json.dumps(kwargs, sort_keys=True).encode()).hexdigest()[:16]


def _write_parquet(ds: rd.Dataset, path: str, partition_cols: list[str] | None = None):
    if partition_cols:
        if "partition_cols" in inspect.signature(ds.write_parquet).parameters:
            ds.write_parquet(path, partition_cols=partition_cols)
            return
        # fallback: keep the column in-file; readers filter instead of pruning
        ds.write_parquet(path)
        return
    ds.write_parquet(path)


class _PrepareDocs:
    """P1 batch body: extract text/title, derive site + doc_id, shard filter."""

    def __init__(self, shard_index: int, num_shards: int, url_filter: bool):
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.url_filter = url_filter

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.url_filter:
            keep = pc.invert(pc.match_substring_regex(batch.column("url"), _URL_REJECT_RE))
            batch = batch.filter(keep)
        if self.num_shards > 1:
            h = hash64_strings(batch.column("url").to_pandas().to_numpy())
            batch = batch.filter(pa.array(h % np.uint64(self.num_shards) == self.shard_index))
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "url": pa.array([], pa.string()),
                    "site": pa.array([], pa.string()),
                    "title": pa.array([], pa.string()),
                    "warc_ts": pa.array([], pa.timestamp("us")),
                    "text": pa.array([], pa.string()),
                }
            )
        batch = extract_batch(batch)
        urls = batch.column("url").to_pandas()
        site = urls.str.extract(_SITE_RE, expand=False).fillna("")
        doc_ids = doc_ids_for_urls(urls.to_numpy())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "url": batch.column("url"),
                "site": pa.array(site.to_numpy(), pa.string()),
                "title": batch.column("title"),
                "warc_ts": batch.column("warc_ts"),
                "text": batch.column("extracted_text"),
            }
        )


def _take_latest(group: pd.DataFrame) -> pd.DataFrame:
    """D1 dedup: keep the newest crawl of a url (deterministic tiebreak)."""
    g = group.sort_values(["warc_ts", "url"], kind="stable")
    return g.tail(1)


class _AddBucket:
    def __init__(self, num_buckets: int):
        self.num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = term_bucket(batch.column("term").to_pandas().to_numpy(), self.num_buckets)
        return batch.append_column("bucket", pa.array(b, pa.int32()))


class _AddSalt:
    """P4: skew-aware salting — head terms (df ≥ threshold) split by docid
    range into ``ceil(df / salt_target)`` ordered sub-lists (SURVEY.md §4).

    ``heavy_ref`` is a ``ray.put`` handle to the {term: n_salts} dict —
    broadcast once, fetched once per worker, never re-shipped per batch.
    """

    def __init__(self, heavy_ref):
        self.heavy = ray.get(heavy_ref) if isinstance(heavy_ref, ray.ObjectRef) else heavy_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        salts = np.zeros(n, dtype=np.int32)
        if self.heavy:
            terms = batch.column("term").to_pandas()
            n_salts = terms.map(self.heavy)
            mask = n_salts.notna().to_numpy()
            if mask.any():
                doc_ids = batch.column("doc_id").to_pandas().to_numpy()[mask]
                ns = n_salts.to_numpy()[mask].astype(np.int64)
                # vectorize per distinct n_salts value (few)
                sub = np.zeros(mask.sum(), dtype=np.int32)
                for s in np.unique(ns):
                    m2 = ns == s
                    sub[m2] = range_salt(doc_ids[m2].astype(np.uint64), int(s))
                salts[mask] = sub
        return batch.append_column("salt", pa.array(salts, pa.int32()))


def build_index(
    pages_path: str | list[str],
    out_dir: str,
    analyzer_spec: dict,
    *,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    shard_index: int = 0,
    num_shards: int = 1,
    salt_df_threshold: int | None = None,
    salt_target: int = DEFAULT_SALT_TARGET,
    dedup_urls: bool = True,
    url_filter: bool = False,
    extract_batch_size: int = 512,
    lemma_batch_size: int = 512,
    lemma_concurrency: tuple[int, int] | int | None = None,
    resume: bool = True,
) -> dict[str, Any]:
    """Build one index shard; returns metrics. Resumable per phase."""
    shard_dir = os.path.join(out_dir, f"shard={shard_index}")
    os.makedirs(shard_dir, exist_ok=True)
    key = _config_key(
        pages_path=pages_path,
        analyzer=analyzer_spec.get("name"),
        num_buckets=num_buckets,
        shard=[shard_index, num_shards],
        dedup=dedup_urls,
        url_filter=url_filter,
        salt=[salt_df_threshold, salt_target],
    )
    metrics: dict[str, Any] = {"shard": shard_index, "phases": {}}
    t_start = time.monotonic()

    spec_ref = ray.put(analyzer_spec)

    docs_dir = os.path.join(shard_dir, "docs")
    postings_dir = os.path.join(shard_dir, "postings")

    # ---- P1: docs --------------------------------------------------------
    if not (resume and phase_done(shard_dir, "docs", key)):
        with phase_output(docs_dir) as tmp:
            ds = rd.read_parquet(pages_path, columns=["url", "warc_ts", "html"])
            ds = ds.map_batches(
                _PrepareDocs(shard_index, num_shards, url_filter),
                batch_format="pyarrow",
                batch_size=extract_batch_size,
                zero_copy_batch=True,
            )
            if dedup_urls:
                ds = ds.groupby("doc_id").map_groups(_take_latest, batch_format="pandas")
            _write_parquet(ds, tmp)
        commit_phase(shard_dir, "docs", key, {"seconds": round(time.monotonic() - t_start, 3)})
    metrics["phases"]["docs"] = round(time.monotonic() - t_start, 3)

    # ---- P2: postings ----------------------------------------------------
    t1 = time.monotonic()
    if not (resume and phase_done(shard_dir, "postings", key)):
        with phase_output(postings_dir) as tmp:
            docs = rd.read_parquet(docs_dir, columns=["url", "site", "text"])
            kwargs: dict[str, Any] = {}
            if lemma_concurrency is not None:
                kwargs["concurrency"] = lemma_concurrency
            postings = docs.map_batches(
                LemmatizeStage,
                fn_constructor_kwargs={"analyzer_spec": spec_ref, "text_col": "text"},
                batch_format="pyarrow",
                batch_size=lemma_batch_size,
                zero_copy_batch=True,
                concurrency=kwargs.get("concurrency", (1, 8)),
            )
            postings = postings.map_batches(
                _AddBucket(num_buckets), batch_format="pyarrow", zero_copy_batch=True
            )
            _write_parquet(postings, tmp)
        commit_phase(shard_dir, "postings", key, {"seconds": round(time.monotonic() - t1, 3)})
    metrics["phases"]["postings"] = round(time.monotonic() - t1, 3)

    # ---- P3: stats (A1, A3, A8, global df, stats.json) -------------------
    t2 = time.monotonic()
    if not (resume and phase_done(shard_dir, "stats", key)):
        term_stats_dir = os.path.join(shard_dir, "term_stats")
        with phase_output(term_stats_dir) as tmp:
            p = rd.read_parquet(postings_dir, columns=["site", "term", "doc_id"])
            # partial aggregation inside map_batches before the shuffle
            partial = p.map_batches(
                lambda t: t.group_by(["site", "term"]).aggregate([("doc_id", "count")]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            df_tbl = partial.groupby(["site", "term"]).aggregate(
                Sum("doc_id_count", alias_name="df")
            )
            _write_parquet(df_tbl, tmp)

        term_df_dir = os.path.join(shard_dir, "term_df")
        with phase_output(term_df_dir) as tmp:
            ts = rd.read_parquet(term_stats_dir)
            _write_parquet(ts.groupby("term").aggregate(Sum("df", alias_name="df")), tmp)

        doclen_dir = os.path.join(shard_dir, "doclen")
        with phase_output(doclen_dir) as tmp:
            p = rd.read_parquet(postings_dir, columns=["doc_id", "doc_len"])
            partial = p.map_batches(
                lambda t: t.group_by("doc_id").aggregate([("doc_len", "max")]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            dl = partial.groupby("doc_id").aggregate(Max("doc_len_max", alias_name="doc_len"))
            _write_parquet(dl, tmp)

        sites_dir = os.path.join(shard_dir, "sites")
        with phase_output(sites_dir) as tmp:
            d = rd.read_parquet(docs_dir, columns=["site", "doc_id"])
            partial = d.map_batches(
                lambda t: t.group_by("site").aggregate([("doc_id", "count")]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            _write_parquet(
                partial.groupby("site").aggregate(Sum("doc_id_count", alias_name="pages")), tmp
            )

        import pyarrow.dataset as pads

        n_docs = pads.dataset(docs_dir, format="parquet").count_rows()
        dl_tab = pads.dataset(doclen_dir, format="parquet").to_table(columns=["doc_len"])
        total_tf = int(pc.sum(dl_tab.column("doc_len")).as_py() or 0)
        stats = {
            "n_docs": int(n_docs),
            "total_tf": total_tf,
            "avgdl": (total_tf / n_docs) if n_docs else 0.0,
            "num_buckets": num_buckets,
            "analyzer": analyzer_spec.get("name"),
            "shard_index": shard_index,
            "num_shards": num_shards,
        }
        with open(os.path.join(shard_dir, "stats.json.tmp"), "w") as f:
            json.dump(stats, f, indent=1)
        os.replace(os.path.join(shard_dir, "stats.json.tmp"), os.path.join(shard_dir, "stats.json"))
        commit_phase(shard_dir, "stats", key, {"seconds": round(time.monotonic() - t2, 3), **stats})
    metrics["phases"]["stats"] = round(time.monotonic() - t2, 3)

    # ---- P4: segments (the wide shuffle, skew-salted) --------------------
    t3 = time.monotonic()
    if not (resume and phase_done(shard_dir, "segments", key)):
        import pyarrow.dataset as pads

        stats = json.load(open(os.path.join(shard_dir, "stats.json")))
        threshold = salt_df_threshold
        if threshold is None:
            threshold = max(salt_target, int(stats["n_docs"]) // 8 or 1)
        tdf = pads.dataset(os.path.join(shard_dir, "term_df"), format="parquet").to_table(
            filter=pc.field("df") >= threshold
        )
        heavy = {
            t: int(-(-int(df) // salt_target))
            for t, df in zip(tdf.column("term").to_pylist(), tdf.column("df").to_pylist())
            if int(df) >= threshold and int(-(-int(df) // salt_target)) > 1
        }
        heavy_ref = ray.put(heavy)
        seg_dir = os.path.join(shard_dir, "segments")
        with phase_output(seg_dir) as tmp:
            p = rd.read_parquet(
                postings_dir, columns=["doc_id", "term", "tf", "doc_len", "bucket"]
            )
            p = p.map_batches(
                _AddSalt, fn_constructor_kwargs={"heavy_ref": heavy_ref},
                batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4),
            )
            segs = p.groupby(["bucket", "salt"]).map_groups(encode_group, batch_format="pandas")
            _write_parquet(segs, tmp, partition_cols=["bucket"])
        commit_phase(
            shard_dir, "segments", key,
            {"seconds": round(time.monotonic() - t3, 3), "heavy_terms": len(heavy)},
        )
    metrics["phases"]["segments"] = round(time.monotonic() - t3, 3)

    metrics["total_seconds"] = round(time.monotonic() - t_start, 3)
    return metrics


def build_all(pages_path, out_dir, analyzer_spec, num_shards: int = 1, **kwargs) -> dict:
    """Build every shard (each independently resumable); per-shard lineage."""
    all_metrics = {"shards": []}
    for s in range(num_shards):
        m = build_index(
            pages_path, out_dir, analyzer_spec,
            shard_index=s, num_shards=num_shards, **kwargs,
        )
        all_metrics["shards"].append(m)
    return all_metrics
