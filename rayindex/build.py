"""The index-build pipeline (flagship, SURVEY.md §3.1) — pure Ray Data.

Reference lifecycle being replaced: ``GET /api/startIndexing`` spawns one
thread per site (services/IndexingServiceImpl.java:35-48), a ForkJoinPool per
site crawls pages (dto/indexing/SiteIndexer.java:59-62), and every page does
fetch → jsoup text → collectLemmas → per-lemma SQL upserts
(dto/indexing/PageIndexer.java:68-121,161-204) against shared MySQL state.

Here the whole build is a sequence of checkpointed Dataset phases over the
``pages`` Parquet table (BASELINE.json input_hint).  The design goal is ONE
wide (all-to-all) operation for the entire build — everything else is
embarrassingly-parallel maps, filter scans, or kilobyte-scale aggregations:

  P1 docs      read(url,warc_ts,html) → extract (M1/M2 tasks) → doc_id/site
               → docs/.  Exact url-dedup (D1): a SKINNY aggregate finds dup
               doc_ids; only then a second pass picks winners by a packed
               (warc_ts, content-hash) key — deterministic even for equal
               timestamps — broadcast via ray.put and applied as a filter in
               the same map.  Full page rows are never shuffled.
  P2 postings  docs(text) → Lemmatize actor pool (ST1, M3-M6) → term bucket
               → postings/ (doc_id, site, term, tf, doc_len, first, bucket)
  P3 doclen    A8 as a shuffle-free filter scan (the lemmatizer marks one
               posting row per doc); sites (A3) small groupby; total_tf sum;
               heavy-term detection by SAMPLING postings fragments
  P4 segments  postings + range salt for sampled head terms (SURVEY.md §4)
               → groupby(bucket, salt)  ← THE one wide shuffle →
               encode_group → compressed segment rows + partial per-(site,
               term) df rows in one mixed output, partitioned by bucket
  P5 stats     A1 finishes as a tiny groupby over P4's df rows →
               term_stats/ + term_df/; stats.json

Each phase streams, writes its output atomically (tmp dir → rename) and
records a lineage manifest, so a re-run skips completed phases (resume) and a
killed run loses only the phase in flight.

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
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

# fsspec.implementations.http fails to import here (no aiohttp), so every
# ray.data read/write retries the import; concurrent first-imports race and
# surface as a bare ImportError that ray's ModuleNotFoundError guard misses.
# Register a benign stub so the import succeeds exactly once (the sentinel
# class never matches a real filesystem).
try:  # pragma: no cover
    from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
except Exception:  # noqa: BLE001
    import sys as _sys
    import types as _types

    _m = _types.ModuleType("fsspec.implementations.http")

    class _NoHTTPFileSystem:
        pass

    _m.HTTPFileSystem = _NoHTTPFileSystem
    _sys.modules.setdefault("fsspec.implementations.http", _m)

from .analyze import LemmatizeStage
from .extract import extract_batch, extract_batch_fast
from .schema import DOCS_SCHEMA, doc_ids_for_urls, hash64_strings, term_bucket, range_salt
from .segments import commit_phase, encode_group, phase_done, phase_output

_SITE_RE = r"^[a-z][a-z0-9+.-]*://([^/]+)"
# M8 (dto/indexing/PageIndexer.java:136-144): media/doc extensions + ?/# urls
_URL_REJECT_RE = r"(?i)\.(png|jpg|gif|bmp|jpeg|pdf|php|zip)$|[?#]"

DEFAULT_NUM_BUCKETS = 32
DEFAULT_SALT_TARGET = 1 << 18  # max postings per salted sub-list of a head term
_HEAVY_SAMPLE_ROWS = 2_000_000  # posting rows sampled for skew detection
LAYOUT_VERSION = 2  # bump when on-disk phase output schemas change (invalidates resume)


def normalize_https(url: str) -> str:
    """M11 (dto/indexing/SiteIndexer.java:98-103): the reference inserts an
    ``s`` at position 4 when ``url[4] != 's'`` — i.e. http:// → https:// for
    configured crawl roots.  Same effect, done sanely."""
    if url.startswith("http://"):
        return "https://" + url[len("http://"):]
    return url


def _config_key(**kwargs) -> str:
    return hashlib.sha256(json.dumps(kwargs, sort_keys=True).encode()).hexdigest()[:16]


def _write_parquet(ds: rd.Dataset, path: str, partition_cols: list[str] | None = None):
    if partition_cols:
        if "partition_cols" not in inspect.signature(ds.write_parquet).parameters:
            # bucketed shuffle + segment pruning depend on the hive layout;
            # silently degrading would commit an empty segments phase
            raise RuntimeError(
                "this Ray version lacks write_parquet(partition_cols=...); "
                "required for the bucketed index layout"
            )
        ds.write_parquet(path, partition_cols=partition_cols)
        return
    ds.write_parquet(path)


def _resolve_ref(ref):
    """Lazy broadcast: resolve a ray.put handle once, in the worker."""
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else (ref or {})


def derive_salts(terms: "pd.Series", doc_ids: np.ndarray, heavy: dict) -> np.ndarray:
    """Salt assignment shared by BOTH shuffle modes (their byte-identical
    output depends on this being the single implementation): 0 for normal
    terms; order-preserving docid-range salt for heavy terms."""
    salts = np.zeros(len(terms), dtype=np.int32)
    if heavy:
        n_salts = terms.map(heavy)
        mask = n_salts.notna().to_numpy()
        if mask.any():
            ids = doc_ids[mask]
            ns = n_salts.to_numpy()[mask].astype(np.int64)
            sub = np.zeros(int(mask.sum()), dtype=np.int32)
            for val in np.unique(ns):
                m2 = ns == val
                sub[m2] = range_salt(ids[m2], int(val))
            salts[mask] = sub
    return salts


def pack_winner(ts_us: np.ndarray, htmls: list) -> np.ndarray:
    """Deterministic total order for url-dedup winners: millisecond timestamp
    in the high bits, 22 bits of content hash as the tiebreak — same url +
    same warc_ts + different content resolves deterministically instead of
    crashing the posting encoder with duplicate doc_ids.  Bit-identical
    duplicates still collapse (same packed value → residual copies are
    dropped by the encoder's (term, doc) dedup guard)."""
    import hashlib as _h

    md = np.array(
        [int.from_bytes(_h.md5(h if isinstance(h, bytes) else h.encode()).digest()[:4], "little") & 0x3FFFFF
         for h in htmls],
        dtype=np.int64,
    )
    return ((ts_us // 1000) << np.int64(22)) | md


class _PrepareDocs:
    """P1 batch body: extract text/title, derive site + doc_id, shard filter,
    and apply the broadcast dedup-winner filter when duplicates exist."""

    def __init__(self, shard_index: int, num_shards: int, url_filter: bool, winners_ref=None,
                 exclude_sites: list[str] | None = None, extractor: str = "parser"):
        # "parser" = per-doc HTML parser (robust to adversarial markup);
        # "fast" = vectorized regex path, byte-identical on well-formed pages
        self.extract = extract_batch_fast if extractor == "fast" else extract_batch
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.url_filter = url_filter
        self.exclude_sites = frozenset(exclude_sites or ())
        # {doc_id: winning packed (ts_ms, content-hash)} for dup doc_ids;
        # a ray.ObjectRef is resolved lazily on first use in the worker
        self._winners_ref = winners_ref
        self.winners = winners_ref if isinstance(winners_ref, dict) else None

    def _get_winners(self) -> dict:
        if self.winners is None:
            ref = self._winners_ref
            self.winners = ray.get(ref) if isinstance(ref, ray.ObjectRef) else (ref or {})
        return self.winners

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.url_filter:
            keep = pc.invert(pc.match_substring_regex(batch.column("url"), _URL_REJECT_RE))
            batch = batch.filter(keep)
        if self.num_shards > 1 and batch.num_rows:
            h = hash64_strings(batch.column("url").to_pandas().to_numpy())
            batch = batch.filter(pa.array(h % np.uint64(self.num_shards) == self.shard_index))
        if batch.num_rows == 0:
            return DOCS_SCHEMA.empty_table()
        urls_pd = batch.column("url").to_pandas()
        doc_ids = doc_ids_for_urls(urls_pd.to_numpy())
        if self._get_winners():
            ts = batch.column("warc_ts").cast(pa.int64()).to_numpy()
            w = self.winners
            # exact int64 lookup (a pandas .map would round-trip the packed
            # values through float64 and corrupt anything above 2^53)
            win_np = np.array([w.get(int(d), -1) for d in doc_ids], dtype=np.int64)
            need = win_np != -1
            packed = np.zeros(len(doc_ids), dtype=np.int64)
            if need.any():
                htmls = batch.filter(pa.array(need)).column("html").to_pylist()
                packed[need] = pack_winner(ts[need], htmls)
            keep_mask = (~need) | (win_np == packed)
            batch = batch.filter(pa.array(keep_mask))
            doc_ids = doc_ids[keep_mask]
            urls_pd = urls_pd[keep_mask].reset_index(drop=True)
            if batch.num_rows:
                # same-batch exact (doc_id, warc_ts) ties: keep the first
                first = pd.Series(doc_ids).duplicated(keep="first").to_numpy()
                if first.any():
                    batch = batch.filter(pa.array(~first))
                    doc_ids = doc_ids[~first]
                    urls_pd = urls_pd[~first].reset_index(drop=True)
        site = urls_pd.str.extract(_SITE_RE, expand=False).fillna("")
        if self.exclude_sites:
            keep = ~site.isin(self.exclude_sites).to_numpy()
            batch = batch.filter(pa.array(keep))
            doc_ids = doc_ids[keep]
            site = site[keep].reset_index(drop=True)
            if batch.num_rows == 0:
                return DOCS_SCHEMA.empty_table()
        batch = self.extract(batch)
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


class _AddBucket:
    def __init__(self, num_buckets: int):
        self.num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = term_bucket(batch.column("term").to_pandas().to_numpy(), self.num_buckets)
        return batch.append_column("bucket", pa.array(b, pa.int32()))


class _AddSalt:
    """P4: skew-aware salting — head terms (sampled df ≥ threshold) split by
    docid range into ordered sub-lists (SURVEY.md §4).

    ``heavy_ref`` is a ``ray.put`` handle to the {term: n_salts} dict —
    broadcast once, fetched once per worker, never re-shipped per batch.
    """

    def __init__(self, heavy_ref):
        self._heavy_ref = heavy_ref
        self.heavy = heavy_ref if isinstance(heavy_ref, dict) else None

    def _get_heavy(self) -> dict:
        if self.heavy is None:
            self.heavy = _resolve_ref(self._heavy_ref)
        return self.heavy

    def __call__(self, batch: pa.Table) -> pa.Table:
        salts = derive_salts(
            batch.column("term").to_pandas(),
            batch.column("doc_id").to_pandas().to_numpy(),
            self._get_heavy(),
        )
        return batch.append_column("salt", pa.array(salts, pa.int32()))


class _EncodeUnit:
    """Bucketed-shuffle reduce task: one (bucket, salt) unit per call.

    Reads only its bucket's postings directory (the map-side partitioned
    write colocated the bucket), derives salts for the broadcast heavy-term
    set, slices its salt, and encodes — identical output to the groupby path.
    """

    def __init__(self, postings_dir: str, heavy_ref):
        self.postings_dir = postings_dir
        self._heavy_ref = heavy_ref
        self.heavy: dict | None = heavy_ref if isinstance(heavy_ref, dict) else None

    def _get_heavy(self) -> dict:
        if self.heavy is None:
            self.heavy = _resolve_ref(self._heavy_ref)
        return self.heavy

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        from .segments import MIXED_SCHEMA

        out = []
        heavy = self._get_heavy()
        for unit in batch.to_pylist():
            b, s = int(unit["bucket"]), int(unit["salt"])
            d = os.path.join(self.postings_dir, f"bucket={b}")
            dset = pads.dataset(d, format="parquet")
            # salt units beyond 0 contain only heavy-term rows — push the term
            # filter into the read instead of materializing the whole bucket
            flt = pc.field("term").isin(list(heavy)) if (s > 0 and heavy) else None
            t = dset.to_table(
                columns=["doc_id", "site", "term", "tf", "doc_len"], filter=flt
            )
            if t.num_rows == 0:
                continue
            salts = derive_salts(
                t.column("term").to_pandas(),
                t.column("doc_id").to_pandas().to_numpy(),
                heavy,
            )
            sel = salts == s
            if not sel.any():
                continue
            df = t.filter(pa.array(sel)).to_pandas()
            df["bucket"] = b
            df["salt"] = s
            out.append(encode_group(df))
        if not out:
            return MIXED_SCHEMA.empty_table()
        return pa.concat_tables(out)


def _detect_dup_winners(pages_path, shard_index: int, num_shards: int) -> dict[int, int]:
    """D1 winner selection: {doc_id: max packed (ts_ms, content-hash)} for
    urls that occur more than once.

    Two stages so the common no-duplicates case stays cheap: a SKINNY
    (url, warc_ts) aggregate finds which doc_ids have duplicates at all; only
    when some exist does a second pass (restricted to those doc_ids) hash the
    html payloads to produce the packed content-tiebroken winner.  The result
    is small (only actual duplicates) and is broadcast to the extract stage;
    with url-space sharding each shard's duplicate set stays bounded."""

    def skinny(batch: pa.Table) -> pa.Table:
        if num_shards > 1 and batch.num_rows:
            h = hash64_strings(batch.column("url").to_pandas().to_numpy())
            batch = batch.filter(pa.array(h % np.uint64(num_shards) == shard_index))
        ids = doc_ids_for_urls(batch.column("url").to_pandas().to_numpy())
        return pa.table({"doc_id": pa.array(ids, pa.int64())})

    agg = (
        rd.read_parquet(pages_path, columns=["url", "warc_ts"])
        .map_batches(skinny, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(Count(alias_name="n"))
    )
    dups = agg.map_batches(
        lambda t: t.filter(pc.greater(t.column("n"), 1)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    if len(dups) == 0 or "doc_id" not in dups.columns:
        return {}
    dup_ids = set(dups["doc_id"].astype(np.int64).tolist())
    dup_ref = ray.put(dup_ids)

    def packed_of_dups(batch: pa.Table) -> pa.Table:
        wanted = _resolve_ref(dup_ref)
        ids = doc_ids_for_urls(batch.column("url").to_pandas().to_numpy())
        mask = np.array([int(i) in wanted for i in ids], dtype=bool)
        if not mask.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "packed": pa.array([], pa.int64())}
            )
        batch = batch.filter(pa.array(mask))
        ts = batch.column("warc_ts").cast(pa.int64()).to_numpy()
        packed = pack_winner(ts, batch.column("html").to_pylist())
        return pa.table(
            {"doc_id": pa.array(ids[mask], pa.int64()), "packed": pa.array(packed, pa.int64())}
        )

    winners = (
        rd.read_parquet(pages_path, columns=["url", "warc_ts", "html"])
        .map_batches(packed_of_dups, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(Max("packed", alias_name="win"))
        .to_pandas()
    )
    return dict(zip(winners["doc_id"].astype(np.int64), winners["win"].astype(np.int64)))


def _sample_heavy_terms(
    postings_dir: str, threshold: int, salt_target: int
) -> dict[str, int]:
    """Skew detection by sampling posting fragments (driver-side, cheap):
    estimate per-term df from a row sample and return {term: n_salts} for
    terms whose estimated df crosses ``threshold``.  Misestimates only affect
    parallelism, never correctness (salting is order-preserving)."""
    files = []
    for root, _dirs, names in os.walk(postings_dir):
        files.extend(os.path.join(root, f) for f in names if f.endswith(".parquet"))
    files.sort()
    if not files:
        return {}
    total_rows = 0
    counts: dict[str, int] = {}
    sampled = 0
    meta_total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    for f in files:
        t = pq.read_table(f, columns=["term"])
        vc = t.column("term").value_counts()
        for sv in vc:
            term = sv["values"].as_py()
            counts[term] = counts.get(term, 0) + sv["counts"].as_py()
        sampled += t.num_rows
        if sampled >= _HEAVY_SAMPLE_ROWS:
            break
    if sampled == 0:
        return {}
    scale = meta_total / sampled
    heavy = {}
    for term, c in counts.items():
        est = int(c * scale)
        if est >= threshold:
            n_salts = -(-est // salt_target)
            if n_salts > 1:
                heavy[term] = n_salts
    return heavy


def _count_input_rows(pages_path) -> int:
    paths = pages_path if isinstance(pages_path, list) else [pages_path]
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for f in os.listdir(p):
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(p, f)).metadata.num_rows
        elif p.endswith(".parquet"):
            total += pq.ParquetFile(p).metadata.num_rows
    return total


def _write_empty_shard(shard_dir: str, num_buckets: int, analyzer_spec: dict,
                       shard_index: int, num_shards: int, key: str) -> None:
    """Zero-page input: a complete, schema-correct empty shard (Ray's writer
    emits schema-less files for empty datasets, which breaks every reader)."""
    from .schema import DOCS_SCHEMA, POSTINGS_FLAT_SCHEMA, TERM_STATS_SCHEMA
    from .segments import MIXED_SCHEMA

    layouts = {
        "docs": DOCS_SCHEMA,
        "postings": POSTINGS_FLAT_SCHEMA,
        "doclen": pa.schema([("doc_id", pa.int64()), ("doc_len", pa.uint32())]),
        "sites": pa.schema([("site", pa.string()), ("pages", pa.int64())]),
        "segments": MIXED_SCHEMA,
        "term_stats": TERM_STATS_SCHEMA,
        "term_df": pa.schema([("term", pa.string()), ("df", pa.int64())]),
    }
    for name, schema in layouts.items():
        d = os.path.join(shard_dir, name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(schema.empty_table(), os.path.join(d, "empty.parquet"))
    stats = {
        "n_docs": 0, "total_tf": 0, "avgdl": 0.0, "num_buckets": num_buckets,
        "analyzer": analyzer_spec.get("name"), "shard_index": shard_index,
        "num_shards": num_shards,
    }
    with open(os.path.join(shard_dir, "stats.json"), "w") as f:
        json.dump(stats, f)
    for phase in ("docs", "postings", "prestats", "segments", "stats"):
        commit_phase(shard_dir, phase, key, {"seconds": 0.0, "empty_input": True})


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
    exclude_sites: list[str] | None = None,
    shuffle_mode: str = "bucketed",  # "bucketed" (map-side partitioned write +
    # per-(bucket, salt) reduce tasks) or "groupby" (Ray sort-based shuffle);
    # both produce byte-identical segments
    extractor: str = "parser",  # "parser" | "fast" (vectorized regex path)
    extract_batch_size: int = 2048,
    lemma_batch_size: int = 2048,
    lemma_concurrency: tuple[int, int] | int | None = None,
    resume: bool = True,
) -> dict[str, Any]:
    """Build one index shard; returns metrics. Resumable per phase."""
    shard_dir = os.path.join(out_dir, f"shard={shard_index}")
    os.makedirs(shard_dir, exist_ok=True)
    key = _config_key(
        layout=LAYOUT_VERSION,
        pages_path=pages_path,
        analyzer=analyzer_spec.get("name"),
        num_buckets=num_buckets,
        shard=[shard_index, num_shards],
        dedup=dedup_urls,
        url_filter=url_filter,
        exclude_sites=sorted(exclude_sites or []),
        salt=[salt_df_threshold, salt_target],
        shuffle_mode=shuffle_mode,
        extractor=extractor,
    )
    metrics: dict[str, Any] = {"shard": shard_index, "phases": {}}
    t_start = time.monotonic()

    if not (resume and phase_done(shard_dir, "stats", key)) and _count_input_rows(pages_path) == 0:
        _write_empty_shard(shard_dir, num_buckets, analyzer_spec, shard_index, num_shards, key)
        metrics["phases"] = {p: 0.0 for p in ("docs", "postings", "prestats", "segments", "stats")}
        metrics["total_seconds"] = round(time.monotonic() - t_start, 3)
        return metrics

    # size actor pools to the cluster — a fixed cap silently breaks scaling
    avail_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    if lemma_concurrency is None:
        lemma_concurrency = (1, max(2, avail_cpus))

    spec_ref = ray.put(analyzer_spec)

    docs_dir = os.path.join(shard_dir, "docs")
    postings_dir = os.path.join(shard_dir, "postings")
    seg_dir = os.path.join(shard_dir, "segments")
    doclen_dir = os.path.join(shard_dir, "doclen")
    sites_dir = os.path.join(shard_dir, "sites")
    term_stats_dir = os.path.join(shard_dir, "term_stats")
    term_df_dir = os.path.join(shard_dir, "term_df")

    # ---- P1: docs --------------------------------------------------------
    if not (resume and phase_done(shard_dir, "docs", key)):
        winners: dict[int, int] = {}
        if dedup_urls:
            winners = _detect_dup_winners(pages_path, shard_index, num_shards)
        winners_ref = ray.put(winners)
        with phase_output(docs_dir) as tmp:
            ds = rd.read_parquet(pages_path, columns=["url", "warc_ts", "html"])
            # stateless tasks (cheap, elastic): extraction carries no heavy
            # state, and task scheduling outperforms an actor pool here
            ds = ds.map_batches(
                _PrepareDocs(shard_index, num_shards, url_filter, winners_ref,
                             exclude_sites, extractor),
                batch_format="pyarrow",
                batch_size=extract_batch_size,
                zero_copy_batch=True,
            )
            _write_parquet(ds, tmp)
        commit_phase(
            shard_dir, "docs", key,
            {"seconds": round(time.monotonic() - t_start, 3), "dup_urls": len(winners)},
        )
    metrics["phases"]["docs"] = round(time.monotonic() - t_start, 3)

    # ---- P2: postings ----------------------------------------------------
    t1 = time.monotonic()
    if not (resume and phase_done(shard_dir, "postings", key)):
        with phase_output(postings_dir) as tmp:
            docs = rd.read_parquet(docs_dir, columns=["url", "site", "text"])
            # ST1: a heavy analyzer (closed lemma dictionary) runs as an
            # actor pool so the dictionary loads once per actor; a tiny
            # stateless analyzer runs as plain tasks (pool scheduling tax
            # outweighs state amortization when there is no state)
            heavy_state = len(analyzer_spec.get("lemma_map", {})) > 0
            if heavy_state:
                postings = docs.map_batches(
                    LemmatizeStage,
                    fn_constructor_kwargs={"analyzer_spec": spec_ref, "text_col": "text"},
                    batch_format="pyarrow",
                    batch_size=lemma_batch_size,
                    zero_copy_batch=True,
                    concurrency=lemma_concurrency,
                )
            else:
                postings = docs.map_batches(
                    LemmatizeStage(analyzer_spec, "text"),
                    batch_format="pyarrow",
                    batch_size=lemma_batch_size,
                    zero_copy_batch=True,
                )
            postings = postings.map_batches(
                _AddBucket(num_buckets), batch_format="pyarrow", zero_copy_batch=True
            )
            # map-side shuffle write: one directory per term-hash bucket, so
            # the encode phase can run as independent per-bucket work units
            _write_parquet(postings, tmp, partition_cols=["bucket"])
        commit_phase(shard_dir, "postings", key, {"seconds": round(time.monotonic() - t1, 3)})
    metrics["phases"]["postings"] = round(time.monotonic() - t1, 3)

    # ---- P3: shuffle-free stats ------------------------------------------
    t2 = time.monotonic()
    if not (resume and phase_done(shard_dir, "prestats", key)):
        with phase_output(doclen_dir) as tmp:
            p = rd.read_parquet(postings_dir, columns=["doc_id", "doc_len", "first"])
            dl = p.map_batches(
                lambda t: t.filter(t.column("first")).select(["doc_id", "doc_len"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            _write_parquet(dl, tmp)
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
        total_tf = rd.read_parquet(doclen_dir, columns=["doc_len"]).sum("doc_len") or 0
        import pyarrow.dataset as pads

        n_docs = pads.dataset(docs_dir, format="parquet").count_rows()
        stats = {
            "n_docs": int(n_docs),
            "total_tf": int(total_tf),
            "avgdl": (int(total_tf) / n_docs) if n_docs else 0.0,
            "num_buckets": num_buckets,
            "analyzer": analyzer_spec.get("name"),
            "shard_index": shard_index,
            "num_shards": num_shards,
        }
        with open(os.path.join(shard_dir, "stats.json.tmp"), "w") as f:
            json.dump(stats, f, indent=1)
        os.replace(os.path.join(shard_dir, "stats.json.tmp"), os.path.join(shard_dir, "stats.json"))
        commit_phase(
            shard_dir, "prestats", key, {"seconds": round(time.monotonic() - t2, 3), **stats}
        )
    metrics["phases"]["prestats"] = round(time.monotonic() - t2, 3)

    # ---- P4: THE wide shuffle — segments + partial df --------------------
    # "bucketed": the shuffle is explicit — P2 already wrote postings
    # partitioned by term-hash bucket (map side); here each (bucket, salt)
    # pair is an independent reduce task that reads only its bucket directory,
    # slices its salt range, sorts locally and encodes.  No all-to-all
    # barrier; parallelism = Σ salts over buckets; per-task memory is bounded
    # by the bucket size (choose num_buckets for the data scale) and by
    # salt_target for head terms.  "groupby" keeps Ray's sort-based shuffle;
    # both produce byte-identical segment rows.
    t3 = time.monotonic()
    if not (resume and phase_done(shard_dir, "segments", key)):
        stats = json.load(open(os.path.join(shard_dir, "stats.json")))
        threshold = salt_df_threshold
        if threshold is None:
            threshold = max(salt_target, int(stats["n_docs"]) // 8 or 1)
        heavy = _sample_heavy_terms(postings_dir, threshold, salt_target)
        heavy_ref = ray.put(heavy)
        with phase_output(seg_dir) as tmp:
            if shuffle_mode == "bucketed":
                present = sorted(
                    int(name.split("=", 1)[1])
                    for name in os.listdir(postings_dir)
                    if name.startswith("bucket=")
                )
                bucket_salts: dict[int, set[int]] = {b: {0} for b in present}
                if heavy:
                    hterms = np.array(list(heavy.keys()), dtype=object)
                    hbuckets = term_bucket(hterms, num_buckets)
                    for term, hb in zip(hterms, hbuckets):
                        if int(hb) in bucket_salts:
                            bucket_salts[int(hb)].update(range(heavy[term]))
                units = [
                    {"bucket": b, "salt": s}
                    for b in present
                    for s in sorted(bucket_salts[b])
                ]
                units_ds = rd.from_items(units)
                segs = units_ds.map_batches(
                    _EncodeUnit(postings_dir, heavy_ref),
                    batch_size=1, batch_format="pyarrow", zero_copy_batch=True,
                )
                _write_parquet(segs, tmp, partition_cols=["bucket"])
            else:
                p = rd.read_parquet(
                    postings_dir, columns=["doc_id", "site", "term", "tf", "doc_len"]
                )
                p = p.map_batches(
                    _AddBucket(num_buckets), batch_format="pyarrow", zero_copy_batch=True
                )
                p = p.map_batches(
                    _AddSalt(heavy_ref),
                    batch_format="pyarrow", zero_copy_batch=True,
                )
                segs = p.groupby(["bucket", "salt"]).map_groups(
                    encode_group, batch_format="pandas"
                )
                _write_parquet(segs, tmp, partition_cols=["bucket"])
        commit_phase(
            shard_dir, "segments", key,
            {"seconds": round(time.monotonic() - t3, 3), "heavy_terms": len(heavy)},
        )
    metrics["phases"]["segments"] = round(time.monotonic() - t3, 3)

    # ---- P5: finish A1 from the df rows (tiny groupbys) ------------------
    t4 = time.monotonic()
    if not (resume and phase_done(shard_dir, "stats", key)):
        with phase_output(term_stats_dir) as tmp:
            mixed = rd.read_parquet(seg_dir, columns=["term", "site", "df", "kind"])
            dfrows = mixed.map_batches(
                lambda t: t.filter(pc.equal(t.column("kind"), "df")).select(
                    ["site", "term", "df"]
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            _write_parquet(
                dfrows.groupby(["site", "term"]).aggregate(Sum("df", alias_name="df")), tmp
            )
        with phase_output(term_df_dir) as tmp:
            ts = rd.read_parquet(term_stats_dir)
            _write_parquet(ts.groupby("term").aggregate(Sum("df", alias_name="df")), tmp)
        commit_phase(shard_dir, "stats", key, {"seconds": round(time.monotonic() - t4, 3)})
    metrics["phases"]["stats"] = round(time.monotonic() - t4, 3)

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
