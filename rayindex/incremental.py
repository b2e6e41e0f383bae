"""Incremental operators — U1/U2/U3 of SURVEY.md §2.9.

Reference behavior being replaced:

- U1 single-page re-index (services/IndexingPageServiceImpl.java:37-135):
  decrement each touched lemma's df in place, delete the page's postings and
  row, then re-fetch and re-index — racy read-modify-write against MySQL.
- U2 site purge (dto/indexing/SiteIndexer.java:108-129): cascade DELETEs of
  index_table → page → lemma → site rows.

Here both become *declarative* operations over immutable shard outputs:

- ``incremental_update``: delta pages are just MORE page rows with newer
  ``warc_ts``; the url-space shard(s) they hash into are rebuilt from
  (original ∪ delta) inputs, where the existing D1 keep-latest dedup
  resolves the override.  Document frequencies are recomputed by the normal
  aggregation — never decremented in place.  Untouched shards are not read.
- ``purge_site``: a soft delete recorded in ``tombstones.json`` at the index
  root, carrying the exact correction terms (page count, Σ doc_len and the
  purged doc ids) so the query engine serves *exactly* the results a full
  rebuild without the site would produce (idf/avgdl corrected; candidates
  filtered).  ``compact`` makes it physical by rebuilding without the site.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from .build import build_index
from .schema import hash64_strings


def affected_shards(delta_pages_path: str, num_shards: int) -> list[int]:
    """Which url-space shards a delta touches (hash(url) % num_shards)."""
    if num_shards <= 1:
        return [0]
    ds = pads.dataset(delta_pages_path, format="parquet")
    urls = ds.to_table(columns=["url"]).column("url").to_pandas().to_numpy()
    return sorted(set((hash64_strings(urls) % np.uint64(num_shards)).astype(int).tolist()))


def _expand(paths: list[str]) -> list[str]:
    """ray.data.read_parquet expands a single directory but not directories
    inside a list — flatten to parquet file paths (see segments.expand_parquet_paths)."""
    from .segments import expand_parquet_paths

    return expand_parquet_paths(paths)


def _deltas_path(index_dir: str) -> str:
    return os.path.join(index_dir, "deltas.json")


def registered_deltas(index_dir: str) -> list[str]:
    p = _deltas_path(index_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)["deltas"]


def _register_delta(index_dir: str, delta_pages: str) -> list[str]:
    deltas = registered_deltas(index_dir)
    if delta_pages not in deltas:
        deltas.append(delta_pages)
    tmp = _deltas_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"deltas": deltas}, f)
    os.replace(tmp, _deltas_path(index_dir))
    return deltas


def incremental_update(
    index_dir: str,
    original_pages: str | list[str],
    delta_pages: str,
    analyzer_spec: dict,
    num_shards: int = 1,
    **build_kwargs,
) -> dict:
    """U1: rebuild only the shards whose url-space the delta touches.

    Deltas COMPOSE: every applied delta is registered in ``deltas.json`` at
    the index root, and each rebuild uses (original ∪ all registered deltas)
    — a later update never reverts an earlier one.  The combined input
    changes the touched shards' phase config keys so their phases re-run;
    untouched shards' manifests still match and are skipped."""
    paths = original_pages if isinstance(original_pages, list) else [original_pages]
    os.makedirs(index_dir, exist_ok=True)
    _inherit_positions(index_dir, build_kwargs)
    deltas = _register_delta(index_dir, delta_pages)
    combined = _expand(paths + deltas)
    out = {"rebuilt_shards": []}
    for s in affected_shards(delta_pages, num_shards):
        m = build_index(
            combined, index_dir, analyzer_spec,
            shard_index=s, num_shards=num_shards, **build_kwargs,
        )
        out["rebuilt_shards"].append(m)
    if num_shards > 1:
        # the rebuilt shards' stats.json changed, so the root-level
        # site_lemmas_global census no longer matches (engines would refuse
        # it and fall back to the scan) — regenerate it while we are the
        # orchestrator that saw the whole update
        from .build import write_site_lemmas_global

        write_site_lemmas_global(index_dir)
    if os.path.isfile(os.path.join(index_dir, "prelists", "meta.json")):
        # the delta changed shard stats, so the head-term prelist artifact's
        # recorded (n_docs, total_tf) no longer match — the engine would
        # refuse it (full-path fallback) and fsck would flag it; regenerate
        # with the artifact's own recorded knobs while we are the
        # orchestrator (same rule as the cross-shard sidecar above)
        import json

        from .prelists import build_prelists

        with open(os.path.join(index_dir, "prelists", "meta.json")) as f:
            pm = json.load(f)
        out["prelists"] = build_prelists(
            index_dir, df_threshold=int(pm["df_threshold"]),
            n_top=int(pm["n_top"]), k1=float(pm["k1"]), b=float(pm["b"]),
        )
    return out


def _inherit_positions(index_dir: str, build_kwargs: dict) -> None:
    """Delta/compact rebuilds inherit the base index's layout flags
    (positions, codec, num_buckets) unless the caller overrides — otherwise
    one update would silently downgrade ``QueryEngine.has_positions`` (an
    all-shards property), re-encode deltas under a different stream codec,
    or — worst — re-partition ONE shard of a multi-shard tree under a
    different bucket count: the engine derives ``num_buckets`` from shard 0,
    so a shard whose dictionary/segments are hashed mod a different count
    silently vanishes from every bucket-pruned lookup."""
    sp = os.path.join(index_dir, "shard=0", "stats.json")
    if not os.path.exists(sp):
        return
    with open(sp) as f:
        stats = json.load(f)
    if "positions" not in build_kwargs:
        build_kwargs["positions"] = bool(stats.get("positions", False))
    if "codec" not in build_kwargs:
        build_kwargs["codec"] = stats.get("codec") or "vb"
    if "num_buckets" not in build_kwargs and stats.get("num_buckets"):
        build_kwargs["num_buckets"] = int(stats["num_buckets"])


def _tombstones_path(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones.json")


def load_tombstones(index_dir: str) -> dict:
    p = _tombstones_path(index_dir)
    if not os.path.exists(p):
        return {"sites": {}}
    with open(p) as f:
        return json.load(f)


def purge_site(index_dir: str, site: str) -> dict:
    """U2 soft delete, scalable: summary corrections + a Parquet id sidecar.

    ``tombstones.json`` now carries only O(1) per purged site — the page
    count and Σ doc_len corrections, both read from the per-shard ``sites``
    roll-up table (one pruned row per shard, no doc scan).  The purged doc
    *ids* go to ``tombstones/site=<digest>/`` as doc_id-sorted Parquet,
    written by a distributed Ray sort over the shard doc stores (pruned to
    the one ``doc_id`` column, filtered to the site at the read) — driver
    memory stays O(1) however large the site.  The query engine loads the
    sidecar through :class:`rayindex.membership.TombstoneSet`: an exact array
    for small purges, a bloom + row-group-pruned verification above that, so
    a 10^6-doc purge holds ~1-8 MB of engine state instead of a GB-scale
    JSON (reference cascade DELETE: dto/indexing/SiteIndexer.java:108-129).
    """
    import hashlib

    import ray.data as rd

    from .segments import list_shards

    tomb = load_tombstones(index_dir)
    if site in tomb["sites"]:
        return tomb
    shards = list_shards(index_dir)
    n_docs = 0
    purged_tf = 0
    tf_known = True
    for shard in shards:
        st = pads.dataset(os.path.join(shard, "sites"), format="parquet").to_table(
            filter=pc.field("site") == site
        )
        if st.num_rows == 0:
            continue
        n_docs += int(pc.sum(st.column("pages")).as_py() or 0)
        if "site_tf" in st.schema.names:
            purged_tf += int(pc.sum(st.column("site_tf")).as_py() or 0)
        else:
            tf_known = False
    if not tf_known:
        # pre-site_tf index layout: one streaming doclen scan (site rides the
        # doclen rows, so no id join is needed)
        purged_tf = 0
        for shard in shards:
            dl = pads.dataset(os.path.join(shard, "doclen"), format="parquet").to_table(
                columns=["doc_len"], filter=pc.field("site") == site
            )
            purged_tf += int(pc.sum(dl.column("doc_len")).as_py() or 0)
    entry: dict = {"n_docs": n_docs, "purged_tf": purged_tf}
    if n_docs > 0:
        digest = hashlib.md5(site.encode()).hexdigest()[:16]
        rel = os.path.join("tombstones", f"site={digest}")
        dest = os.path.join(index_dir, rel)
        ids = rd.read_parquet(
            _expand([os.path.join(s, "docs") for s in shards]),
            columns=["doc_id"],
            filter=pc.field("site") == site,
        ).sort("doc_id")
        os.makedirs(dest, exist_ok=True)
        ids.write_parquet(dest)
        entry["dir"] = rel
    tomb["sites"][site] = entry
    tmp = _tombstones_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(tomb, f)
    os.replace(tmp, _tombstones_path(index_dir))
    return tomb


def tombstone_id_files(index_dir: str, tomb: dict | None = None) -> tuple[list[int], list[str]]:
    """(inline_ids, parquet_paths) across all purged sites — inline ids come
    from round-2-format ``tombstones.json`` entries (back-compat), paths from
    the Parquet sidecars."""
    tomb = tomb if tomb is not None else load_tombstones(index_dir)
    inline: list[int] = []
    paths: list[str] = []
    for info in tomb["sites"].values():
        inline.extend(info.get("doc_ids", ()))
        rel = info.get("dir")
        if rel:
            d = os.path.join(index_dir, rel)
            if os.path.isdir(d):
                paths.extend(
                    os.path.join(d, f)
                    for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                )
    return inline, paths


def compact(
    index_dir: str,
    original_pages: str | list[str],
    analyzer_spec: dict,
    out_dir: str,
    num_shards: int = 1,
    **build_kwargs,
) -> dict:
    """Make purges physical: full rebuild excluding tombstoned sites.

    (The site filter rides the extract stage; no extra pass.)"""
    tomb = load_tombstones(index_dir)
    purged = sorted(tomb["sites"])
    paths = original_pages if isinstance(original_pages, list) else [original_pages]
    _inherit_positions(index_dir, build_kwargs)
    combined = _expand(paths + registered_deltas(index_dir))
    out = {"shards": []}
    for s in range(num_shards):
        m = build_index(
            combined, out_dir, analyzer_spec,
            shard_index=s, num_shards=num_shards,
            exclude_sites=purged, **build_kwargs,
        )
        out["shards"].append(m)
    if num_shards > 1:
        # fresh multi-shard tree → fresh census; without the root sidecar
        # every statistics() call on the compacted tree falls back to the
        # full dictionary scan
        from .build import write_site_lemmas_global

        write_site_lemmas_global(out_dir)
    return out


def index_page(
    index_dir: str,
    url: str,
    html: bytes,
    warc_ts_us: int,
    original_pages: str | list[str],
    analyzer_spec: dict,
    num_shards: int = 1,
    scratch_dir: str | None = None,
    **build_kwargs,
) -> dict:
    """The ``POST /api/indexPage`` equivalent: wrap one page as a delta table
    and run the incremental update (services/IndexingPageServiceImpl.java:37-135)."""
    import pyarrow as pa

    from .schema import PAGES_SCHEMA

    import hashlib

    scratch = scratch_dir or os.path.join(index_dir, "_delta")
    os.makedirs(scratch, exist_ok=True)
    # content-addressed delta dir: re-submitting the same url with NEW content
    # yields a new path, which changes the build config key and defeats the
    # phase-resume skip; the old delta stays registered and loses by warc_ts
    fp = hashlib.md5(url.encode() + str(warc_ts_us).encode() + html).hexdigest()[:12]
    delta = os.path.join(scratch, f"delta_{fp}")
    os.makedirs(delta, exist_ok=True)
    t = pa.table(
        {
            "url": pa.array([url], pa.string()),
            "warc_ts": pa.array([warc_ts_us], pa.timestamp("us")),
            "html": pa.array([html], pa.binary()),
            "text": pa.array([""], pa.string()),
            "lang": pa.array([""], pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    pq.write_table(t, os.path.join(delta, "part-00000.parquet"))
    return incremental_update(
        index_dir, original_pages, delta, analyzer_spec, num_shards, **build_kwargs
    )
