#!/usr/bin/env python
"""Index-build entrypoint for ``ray job submit`` (BASELINE.json north_rule).

Cluster usage (each shard is an independent resumable unit of work):

    ray job submit --working-dir . -- \
        python tools/build_cli.py --pages s3://bucket/pages --out s3://bucket/index \
        --analyzer simple --num-shards 64 --shard-range 0:64

Local usage (owns its Ray session; the sandbox always runs local):

    python tools/build_cli.py --pages /tmp/pages --out /tmp/index --analyzer simple
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True, help="pages Parquet path (input_hint schema)")
    ap.add_argument("--out", required=True, help="index output root")
    ap.add_argument("--analyzer", default="simple", choices=["simple", "reference_ru"])
    ap.add_argument("--analyzer-spec-json", default=None,
                    help="path to a JSON analyzer spec (overrides --analyzer)")
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--shard-range", default=None,
                    help="START:END shard slice for this job (default: all)")
    def _positive_int(v: str) -> int:
        n = int(v)
        if n <= 0:
            raise argparse.ArgumentTypeError("--num-buckets must be a positive integer")
        return n

    ap.add_argument("--num-buckets", type=_positive_int, default=None,
                    help="term-hash buckets per shard (default: auto-sized "
                         "from the input row count)")
    ap.add_argument("--warc", action="store_true",
                    help="--pages points at WARC archives (plain or Common "
                         "Crawl member-gzip): ingest to <out>/pages_parquet "
                         "first, then build over the Parquet")
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--codec", default="pfor", choices=["vb", "pfor"],
                    help="postings stream codec (delta+varbyte or PForDelta)")
    ap.add_argument("--positions", action="store_true",
                    help="build the positional postings layer (phrase/NEAR)")
    ap.add_argument("--prelists", action="store_true",
                    help="after the build, write head-term impact-ordered "
                         "prelists (full-range jobs only — the artifact "
                         "needs every shard)")
    ap.add_argument("--url-filter", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU count (ignored on a real cluster)")
    ap.add_argument("--object-store-gb", type=float, default=None,
                    help="local-mode object store size (needed when several "
                         "node-model jobs share one machine)")
    ap.add_argument("--warmup", action="store_true",
                    help="spin up workers + shuffle aggregator actors before "
                         "timing (the standing-cluster analogue: `ray job "
                         "submit` to a real cluster does not pay runtime "
                         "startup per job)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        init_kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                           logging_level="ERROR")
        if args.num_cpus:
            init_kwargs.update(address="local", num_cpus=args.num_cpus)
        if args.object_store_gb:
            init_kwargs.update(object_store_memory=int(args.object_store_gb * (1 << 30)))
        ray.init(**init_kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from rayindex.build import build_index

    if args.analyzer_spec_json:
        spec = json.load(open(args.analyzer_spec_json))
    else:
        spec = {"name": args.analyzer}

    lo, hi = 0, args.num_shards
    if args.shard_range:
        lo, hi = (int(x) for x in args.shard_range.split(":"))

    import time

    if args.warmup:
        import ray.data as rd

        def _spin(b):
            import rayindex.build  # noqa: F401  (worker-side import cost)

            t = time.monotonic()
            while time.monotonic() - t < 0.3:
                pass
            return b

        ncpu = int(ray.cluster_resources().get("CPU", 4))
        rd.range(ncpu, override_num_blocks=ncpu).map_batches(_spin, batch_size=1).materialize()
        rd.range(10_000).groupby("id").count().materialize()

    pages_path = args.pages
    if args.warc:
        from rayindex.sources import ingest_warc

        pages_path = os.path.join(args.out, "pages_parquet")
        ingest_warc(args.pages, pages_path)

    t_build0 = time.monotonic()
    metrics = []
    for s in range(lo, hi):
        m = build_index(
            pages_path, args.out, spec,
            shard_index=s, num_shards=args.num_shards,
            num_buckets=args.num_buckets,  # None → auto-sized from input rows
            dedup_urls=not args.no_dedup,
            url_filter=args.url_filter,
            codec=args.codec,
            positions=args.positions,
        )
        print(json.dumps(m), flush=True)
        metrics.append(m)
    build_wall = round(time.monotonic() - t_build0, 3)
    done = {"done": True, "shards": [m["shard"] for m in metrics],
            "build_wall_sec": build_wall}
    if args.num_shards > 1 and lo == 0 and hi == args.num_shards:
        # this job saw EVERY shard, so it can vouch for the cross-shard A4
        # sidecar (statistics() without a dictionary scan).  A --shard-range
        # subset job cannot — engines over such trees fall back to the scan
        # until an orchestrator (build_all / incremental_update / this path)
        # regenerates it.  Written after build_wall_sec is computed: the
        # scaling protocol's N level builds the full range in one job while
        # the 4N jobs are subsets, so folding the sidecar into the timed
        # wall would bias only the N side.
        from rayindex.build import write_site_lemmas_global

        t_sl = time.monotonic()
        write_site_lemmas_global(args.out)
        done["site_lemmas_global_sec"] = round(time.monotonic() - t_sl, 3)
    if args.prelists and lo == 0 and hi == args.num_shards:
        # full-range jobs only: the impact order is global, so a
        # --shard-range subset cannot vouch for it (same rule as the
        # cross-shard sidecar above); also written after build_wall_sec so
        # the scaling protocol's N level stays symmetric with the 4N jobs
        from rayindex.prelists import build_prelists

        t_pl = time.monotonic()
        done["prelists"] = build_prelists(args.out)
        done["prelists_sec"] = round(time.monotonic() - t_pl, 3)
    print(json.dumps(done), flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
