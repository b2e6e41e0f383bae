"""Distributed query serving: a query LOG as a ``ray.data.Dataset`` streamed
through an actor pool of full query-engine replicas.

Reference analog: the Spring MVC request thread pool serving ``/api/search``
(`controllers/ApiController.java:35-47`) — one engine instance, many threads,
one machine.  The Ray-Data-first shape replaces it with a stateful actor-pool
stage (the ST1/ST4 pattern): each actor constructs ONE ``QueryEngine`` in
``__init__`` — dictionary/readers/stats loaded once, every cache FIFO-capped
so replica memory is bounded regardless of log length — and ``__call__``
answers a whole Arrow batch of queries.  Nothing is broadcast or re-shipped
per batch: replicas read the SHARED on-disk index lazily (bucket-pruned
term_stats reads, block-level posting reads), so the OS page cache / object
store dedups hot segment bytes across replicas on a node, and throughput
scales with ``actors × nodes`` while the index stays a single on-disk
artifact.  At 100 TB this is the serving tier: the same index directory
mounted on every node, ``batch_search`` over a billion-query log.

Determinism: each query's result set is computed by the same single-process
engine code paths the conformance tests pin, so the emitted rows are
independent of batch boundaries, actor count and scheduling order (row
ORDER across the output dataset is not guaranteed — results carry their
query string, and consumers sort or group by it).
"""

from __future__ import annotations

import os
from typing import Iterable

import pyarrow as pa

import ray
import ray.data as rd

from .query import QueryEngine

RESULT_SCHEMA = pa.schema(
    [
        ("query", pa.string()),
        ("url", pa.string()),
        ("score", pa.int64()),
        ("relevance", pa.float64()),
    ]
)

# with_snippets=True adds the presentation columns of the reference's
# SearchingResponse (F1-F4 snippet builder + M2 title)
SNIPPET_SCHEMA = pa.schema(
    list(RESULT_SCHEMA) + [("title", pa.string()), ("snippet", pa.string())]
)


class SearchReplica:
    """One engine replica per actor: heavy state (stats, segment readers,
    lazily-populated dictionary/posting caches) built once in ``__init__``,
    batches of queries answered in ``__call__`` — the stateful-actor-pool
    rule the build's lemmatizer stage (ST1) follows."""

    def __init__(
        self,
        index_root: str,
        analyzer_spec: dict,
        *,
        site: str | None = None,
        k: int | None = None,
        scorer: str = "reference",
        with_snippets: bool = False,
        shared_locators: dict | None = None,
    ):
        if scorer not in ("reference", "bm25"):
            raise ValueError(f"scorer must be 'reference' or 'bm25', got {scorer!r}")
        if with_snippets and scorer != "reference":
            raise ValueError("with_snippets requires the reference scorer")
        self.eng = QueryEngine(index_root, analyzer_spec,
                               shared_locators=shared_locators)
        self.site = site
        self.k = k
        self.scorer = scorer
        self.with_snippets = with_snippets

    def __call__(self, batch: pa.Table) -> pa.Table:
        queries, urls, scores, rels = [], [], [], []
        titles, snippets = [], []
        for q in batch.column("query").to_pylist():
            if self.scorer == "bm25":
                # k=None means ALL hits (the batch_search contract): force
                # the exhaustive scorer, whose ranking [:None] is the full
                # match set (WAND's heap needs a finite k)
                hits = (self.eng.bm25_topk(q, k=None, algorithm="exhaustive")
                        if self.k is None else self.eng.bm25_topk(q, k=self.k))
                meta = self.eng.doc_meta([d for d, _ in hits], columns=["url"])
                for doc_id, s in hits:
                    queries.append(q)
                    urls.append(meta[doc_id]["url"])
                    scores.append(0)
                    rels.append(float(s))
                continue
            res = self.eng.search(
                q, site=self.site, k=self.k, with_snippets=self.with_snippets
            )
            if self.with_snippets:
                for r in res["data"]:
                    queries.append(q)
                    urls.append(r["url"])
                    scores.append(int(r["abs"]))
                    rels.append(float(r["relevance"]))
                    titles.append(r["title"])
                    snippets.append(r["snippet"])
                continue
            meta = self.eng.doc_meta([r["doc_id"] for r in res["data"]], columns=["url"])
            for r in res["data"]:
                queries.append(q)
                urls.append(meta[r["doc_id"]]["url"])
                scores.append(int(r["abs"]))
                rels.append(float(r["relevance"]))
        cols = {"query": queries, "url": urls, "score": scores, "relevance": rels}
        if self.with_snippets:
            cols.update(title=titles, snippet=snippets)
            return pa.table(cols, schema=SNIPPET_SCHEMA)
        return pa.table(cols, schema=RESULT_SCHEMA)


def batch_search(
    index_root: str,
    analyzer_spec: dict,
    queries: "rd.Dataset | Iterable[str]",
    *,
    site: str | None = None,
    k: int | None = None,
    scorer: str = "reference",
    with_snippets: bool = False,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 32,
    share_locator: bool = True,
    shared_locators: dict | None = None,
) -> rd.Dataset:
    """Serve a query log from an actor pool of engine replicas.

    ``queries`` is a Dataset with a ``query`` column (a real log) or any
    iterable of strings (convenience).  Returns a streamed Dataset of
    ``(query, url, score, relevance)`` rows — one row per hit, all hits when
    ``k is None`` (the reference backend ignores limit/offset,
    `controllers/ApiController.java:55-58`).  ``with_snippets=True`` adds the
    SearchingResponse presentation columns (``title``, ``snippet`` — the
    F1-F4 builder runs inside the replicas, so snippet generation scales
    with the pool instead of the driver).  Row values are independent of
    batch boundaries and pool size; only row order varies.

    ``shared_locators`` accepts the refs of a prior :func:`share_locators`
    call so REPEATED batch jobs over the same index reuse one object-store
    copy instead of re-reading the (multi-hundred-MB at 5 M docs) locator
    from disk per call; with the default ``share_locator=True`` and no
    precomputed refs the load happens here, eagerly — callers that may
    never consume the returned (lazy) Dataset should pass refs or
    ``share_locator=False``.
    """
    if not isinstance(queries, rd.Dataset):
        items = [{"query": q} for q in queries]
        # one block per batch: a single-block log would pin the whole stream
        # to ONE replica (Ray Data schedules per input block, so pool
        # parallelism is capped by block count, not batch_size)
        queries = rd.from_items(
            items, override_num_blocks=max(1, len(items) // batch_size)
        )
    if concurrency is None:
        from .textops import auto_concurrency

        concurrency = auto_concurrency()
    ctor_kwargs = {
        "site": site, "k": k, "scorer": scorer, "with_snippets": with_snippets,
    }
    if shared_locators is not None:
        ctor_kwargs["shared_locators"] = shared_locators
    elif share_locator:
        # locator loaded once on the driver; every pool actor maps the same
        # object-store buffers instead of loading its own copy (the dominant
        # cold-pool cost — at 5 M docs each replica otherwise reads and
        # materializes a multi-hundred-MB table before its first batch)
        ctor_kwargs["shared_locators"] = share_locators(index_root)
    return queries.map_batches(
        SearchReplica,
        fn_constructor_args=(index_root, analyzer_spec),
        fn_constructor_kwargs=ctor_kwargs,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# Always-on serving tier


def share_locators(index_root: str) -> dict[str, "ray.ObjectRef"]:
    """Load every shard's doc locator ONCE on the driver and ``ray.put`` it.

    Returns {shard basename → ObjectRef of the single-chunk locator table}.
    Replica actors receive the refs and map the Arrow buffers zero-copy from
    the object store — N replicas on a node share ONE copy of the
    (doc_id, rowpos, url) arrays instead of each loading + materializing its
    own (at 5 M docs/shard that is hundreds of MB per replica otherwise,
    and the dominant cold-start cost)."""
    from .query import load_locator_table
    from .segments import list_shards

    out = {}
    for d in list_shards(index_root):
        t, _src = load_locator_table(d)
        out[os.path.basename(d)] = ray.put(t)
    return out


@ray.remote
class _ServiceReplica:
    """One long-lived engine replica; wraps :class:`SearchReplica` so the
    online and batch tiers share one code path (and one conformance pin).

    Carries a FIFO-capped per-replica RESULT cache (the node-local request
    cache of production engines): a repeated query returns its cached k-row
    slice without touching the scorer.  Capacity is per replica, so cache
    memory scales with the pool, not the corpus; invalidation is structural —
    ``swap_index``/``sync`` spawn fresh replicas, so a new index can never
    serve a stale entry."""

    def __init__(self, index_root: str, analyzer_spec: dict, kwargs: dict,
                 result_cache_entries: int = 256):
        self._replica = SearchReplica(index_root, analyzer_spec, **kwargs)
        self._served = 0
        self._schema = SNIPPET_SCHEMA if kwargs.get("with_snippets") else RESULT_SCHEMA
        self._cache: dict[str, pa.Table] = {}  # insertion-ordered → FIFO
        self._cache_cap = int(result_cache_entries)
        self._cache_hits = 0

    def search_batch(self, queries: list[str]) -> pa.Table:
        self._served += len(queries)
        if not self._cache_cap:
            return self._replica(pa.table({"query": pa.array(queries, pa.string())}))
        fresh: dict[str, pa.Table] = {}
        missing = [q for q in dict.fromkeys(queries) if q not in self._cache]
        if missing:
            import pyarrow.compute as pc

            t = self._replica(pa.table({"query": pa.array(missing, pa.string())}))
            qcol = t.column("query")
            for q in missing:
                fresh[q] = t.filter(pc.equal(qcol, q))
        # a hit is any occurrence served without a scorer run: cached from a
        # prior batch, or a duplicate occurrence within this one
        self._cache_hits += len(queries) - len(missing)
        # per-OCCURRENCE reassembly in submission order — byte-identical to
        # the uncached batch (SearchReplica emits per-query blocks in input
        # order, and filter preserves within-query row order)
        parts = []
        for q in queries:
            part = fresh.get(q)
            if part is None:
                part = self._cache[q]
            if part.num_rows:
                parts.append(part)
        for q, part in fresh.items():
            self._cache[q] = part
            if len(self._cache) > self._cache_cap:
                self._cache.pop(next(iter(self._cache)))
        return pa.concat_tables(parts) if parts else self._schema.empty_table()

    def served(self) -> int:
        return self._served

    def cache_hits(self) -> int:
        return self._cache_hits


class SearchService:
    """ALWAYS-ON serving: N long-lived engine-replica actors behind a
    round-robin router — the Ray analog of the reference's persistent Spring
    Boot service (`controllers/ApiController.java:35-47`: one warm engine,
    many request threads), where ``batch_search`` is the batch/job tier.

    Replicas are created ONCE and keep their FIFO-capped dictionary/
    posting/reader caches across calls, so steady-state latency excludes
    actor startup and cold segment reads.  The index stays a single shared
    on-disk artifact; on a multi-node cluster Ray spreads the replicas and
    the OS page cache dedups hot segment bytes per node.  Routing is
    client-side round-robin: queries are independent, replicas are
    identical, so any placement is correct — no coordinator actor (a single
    router actor would serialize the tier and cap it at one core).

    Row values are identical to ``QueryEngine`` / ``batch_search`` for the
    same query (the tests pin this); only row ORDER across a
    ``search_many`` call varies with chunking.
    """

    def __init__(
        self,
        index_root: str,
        analyzer_spec: dict,
        *,
        num_replicas: int | None = None,
        site: str | None = None,
        k: int | None = None,
        scorer: str = "reference",
        with_snippets: bool = False,
        num_cpus: float = 1.0,
        share_locator: bool = True,
        result_cache_entries: int = 256,
    ):
        if num_replicas is None:
            from .textops import auto_concurrency

            num_replicas = max(2, auto_concurrency()[1] // 2)
        kwargs = {"site": site, "k": k, "scorer": scorer,
                  "with_snippets": with_snippets}
        self._schema = SNIPPET_SCHEMA if with_snippets else RESULT_SCHEMA
        self._analyzer_spec = analyzer_spec
        self._kwargs = kwargs
        self._num_cpus = num_cpus
        self._index_root = index_root
        self._share_locator = share_locator
        self._result_cache_entries = int(result_cache_entries)
        self._replicas, self._locator_refs = self._spawn(index_root, num_replicas)
        self._rr = 0
        # CURRENT-record identity last synced against (version,
        # published_unix, realpath) — lets sync() detect a rebuild
        # republished at the SAME path, which a path compare misses
        self._synced_token: tuple | None = None

    def _spawn(self, index_root: str, n: int) -> tuple[list, dict]:
        # locator loaded ONCE here, mapped zero-copy by every replica —
        # per-replica cold-start and memory no longer scale with doc count.
        # Returns (replicas, locator_refs); the CALLER commits the refs to
        # self._locator_refs only once the set is actually serving — a
        # failed swap must not pin the unused new index's tables for the
        # service's lifetime, nor drop the in-use ones to replica-held
        # borrower refs only
        kwargs = dict(self._kwargs)
        refs: dict = {}
        if self._share_locator:
            refs = share_locators(index_root)
            kwargs["shared_locators"] = refs
        replicas = [
            _ServiceReplica.options(num_cpus=self._num_cpus).remote(
                index_root, self._analyzer_spec, kwargs,
                result_cache_entries=self._result_cache_entries,
            )
            for _ in range(n)
        ]
        return replicas, refs

    def swap_index(self, index_root: str, *,
                   warmup_queries: Iterable[str] | None = None,
                   ready_timeout_s: float = 120.0) -> None:
        """Zero-downtime index swap (the serving analog of the reference's
        re-index-while-serving, `services/IndexingPageServiceImpl.java`):
        spin up a full replica set over ``index_root`` (optionally warmed)
        BEFORE routing to it, then retire the old replicas gracefully —
        `__ray_terminate__` queues behind their in-flight batches, so
        outstanding ``submit`` refs still resolve against the old index.
        Queries issued after the swap see only the new index.

        The swap needs 2x replica capacity while both sets are alive; if
        the cluster cannot schedule the replacement set within
        ``ready_timeout_s`` the fresh actors are killed and RuntimeError is
        raised (instead of wedging the sync poller forever)."""
        fresh, fresh_refs = self._spawn(index_root, len(self._replicas))
        probe = [r.served.remote() for r in fresh]
        ready, pending = ray.wait(probe, num_returns=len(probe),
                                  timeout=ready_timeout_s)
        if pending:
            for r in fresh:
                ray.kill(r)
            # fresh_refs goes out of scope here: the new index's locator
            # tables are freed once the killed actors' borrower refs drop,
            # and self._locator_refs still pins the SERVING index's tables
            raise RuntimeError(
                f"swap_index: {len(pending)}/{len(fresh)} replacement "
                f"replicas not ready within {ready_timeout_s}s — a swap "
                f"holds BOTH replica sets alive, so it needs 2x capacity; "
                f"free CPUs or lower num_replicas")
        if warmup_queries is not None:
            qs = list(warmup_queries)
            ray.get([r.search_batch.remote(qs) for r in fresh])
        old, self._replicas = self._replicas, fresh
        # commit the new locator tables only now that the fresh set serves;
        # held on the service so they outlive replica restart churn
        self._locator_refs = fresh_refs
        self._index_root = index_root
        self._synced_token = None  # a direct swap detaches from any root
        for r in old:
            r.__ray_terminate__.remote()

    def sync(self, versions_root: str, *,
             warmup_queries: Iterable[str] | None = None) -> bool:
        """Follow a versioned-publication root (rayindex/publish.py): if the
        CURRENT pointer names a different index than the one being served,
        perform the zero-downtime swap; returns whether a swap happened.
        Poll this from a cron/sidecar and cutover cost stays one pointer
        read when nothing changed.

        Staleness is judged by the CURRENT record's (version,
        published_unix, path) — not the path alone — so a rebuild
        republished INTO THE SAME directory still triggers a swap (the old
        replicas' segment caches hold the pre-rebuild bytes).  The very
        first sync against a pointer that already names the served path
        adopts the record without swapping (the replicas just loaded it)."""
        from .publish import current_record

        rec = current_record(versions_root)
        target = rec["path"]
        token = (rec.get("version"), rec.get("published_unix"),
                 os.path.realpath(target))
        if token == self._synced_token:
            return False
        if (self._synced_token is None
                and os.path.realpath(target) == os.path.realpath(self._index_root)):
            self._synced_token = token
            return False
        self.swap_index(target, warmup_queries=warmup_queries)
        self._synced_token = token
        return True

    @property
    def num_replicas(self) -> int:
        return len(self._replicas)

    def _next(self):
        r = self._replicas[self._rr % len(self._replicas)]
        self._rr += 1
        return r

    def submit(self, query: str) -> "ray.ObjectRef":
        """Async single query → ObjectRef of a result Table (one row/hit)."""
        return self._next().search_batch.remote([query])

    def search(self, query: str) -> pa.Table:
        """Sync single query."""
        return ray.get(self.submit(query))

    def search_many(self, queries: Iterable[str], *, chunk_size: int = 32) -> pa.Table:
        """Serve a query list across the whole pool; returns one Table.

        Chunks are dispatched round-robin and pipelined (all in flight at
        once); within a chunk results keep submission order."""
        qs = list(queries)
        refs = [
            self._next().search_batch.remote(qs[i : i + chunk_size])
            for i in range(0, len(qs), chunk_size)
        ]
        tables = [t for t in ray.get(refs) if t.num_rows]
        if not tables:
            return self._schema.empty_table()
        return pa.concat_tables(tables)

    def warmup(self, queries: Iterable[str]) -> None:
        """Run the query set through EVERY replica (each keeps its own
        caches), so a following measurement sees steady-state latency."""
        qs = list(queries)
        ray.get([r.search_batch.remote(qs) for r in self._replicas])

    def stats(self) -> dict:
        served = ray.get([r.served.remote() for r in self._replicas])
        hits = ray.get([r.cache_hits.remote() for r in self._replicas])
        return {"num_replicas": len(self._replicas), "served_per_replica": served,
                "result_cache_hits": hits}

    def shutdown(self) -> None:
        for r in self._replicas:
            ray.kill(r)
        self._replicas = []
