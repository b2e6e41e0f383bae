"""Sharded deployment benchmark — N url-space shards built by N concurrent
``build_cli`` jobs (fresh Ray runtime + own object store each), the sandbox
analogue of one `ray job submit` per node.  The round-4 20M/4-shard run is
the template; this script parametrizes pages/shards/cpus so the round-5
50M/8-shard and 20M-positions runs use one committed, reproducible path.

Usage:
    python tools/sharded_bench.py --repeat 10000 --shards 8 --cpus-per-job 4 \
        --object-store-gb 5 --out /tmp/rayindex_50m --json BENCH/bench_r5_50m_sharded.json

Phases: generate (cached) pages → launch shard jobs → cross-shard
site_lemmas_global → live engine verification (flagship count, warm
snippet/bm25/WAND identity, dense-term prelist) → sizes → one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def tree_bytes(path: str, sub: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        if sub in root:
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=10000)
    ap.add_argument("--body-repeat", type=int, default=8)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--cpus-per-job", type=int, default=4)
    ap.add_argument("--object-store-gb", type=float, default=5.0)
    ap.add_argument("--positions", action="store_true")
    ap.add_argument("--prelists", action="store_true",
                    help="build head-term prelists after the shards and "
                         "measure the dense-term query they bound")
    ap.add_argument("--out", required=True)
    ap.add_argument("--json", default=None, help="also write the result here")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from rayindex.pipelines import FLAGSHIP_QUERIES, SIMPLE_SPEC, WAND_QUERIES, bench_pages

    t_pages = time.monotonic()
    pages = bench_pages(args.sf, args.repeat, body_repeat=args.body_repeat)
    pages_sec = time.monotonic() - t_pages
    n_docs = int(open(os.path.join(pages, "_SUCCESS")).read())
    # the shard jobs own their Ray runtimes; free this one's CPUs first
    ray.shutdown()

    cli = os.path.join(REPO, "tools", "build_cli.py")
    shutil.rmtree(args.out, ignore_errors=True)

    def job(s: int) -> subprocess.Popen:
        cmd = [sys.executable, cli, "--pages", pages, "--out", args.out,
               "--analyzer", "simple", "--num-shards", str(args.shards),
               "--shard-range", f"{s}:{s + 1}",
               "--num-cpus", str(args.cpus_per_job),
               "--object-store-gb", str(args.object_store_gb), "--warmup"]
        if args.positions:
            cmd.append("--positions")
        return subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, text=True)

    t0 = time.monotonic()
    procs = [job(s) for s in range(args.shards)]
    walls, phases0 = [], None
    for s, p in enumerate(procs):
        out, _ = p.communicate()
        if p.returncode:
            raise RuntimeError(f"shard {s} failed rc={p.returncode}")
        wall = None
        for line in out.strip().splitlines():
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "build_wall_sec" in d:
                wall = float(d["build_wall_sec"])
            if s == 0 and "phases" in d:
                phases0 = d["phases"]
        walls.append(wall)
    popen_wall = time.monotonic() - t0

    import ray  # fresh session for the sidecar + verification

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    from rayindex.build import write_site_lemmas_global

    t_sl = time.monotonic()
    write_site_lemmas_global(args.out)
    sl_sec = time.monotonic() - t_sl

    prelist = {}
    if args.prelists:
        from rayindex.prelists import build_prelists

        t_pl = time.monotonic()
        summary = build_prelists(args.out)
        prelist = {"prelist_build_sec": round(time.monotonic() - t_pl, 1),
                   "prelist_terms": int(summary["n_terms"])}

    from rayindex.query import QueryEngine

    eng = QueryEngine(args.out, SIMPLE_SPEC)
    verify: dict = {"n_docs": eng.n_docs}
    q0 = FLAGSHIP_QUERIES[0]
    verify["flagship_count"] = int(eng.search(q0, k=10, with_snippets=False)["count"])
    eng.search(q0, k=10, with_snippets=True)  # warm
    t = time.monotonic()
    eng.search(q0, k=10, with_snippets=True)
    verify["warm_snippet_ms"] = round((time.monotonic() - t) * 1e3, 1)
    words = sorted({w for q in FLAGSHIP_QUERIES + WAND_QUERIES for w in q.split()})
    terms = sorted({t2 for w in words for t2 in eng.analyzer.collect_lemmas(w)})
    dense = max(terms, key=eng.term_global_df)
    verify["dense_term_df"] = int(eng.term_global_df(dense))
    t = time.monotonic()
    full = eng.bm25_exhaustive(dense, k=10)
    verify["dense_bm25_full_s"] = round(time.monotonic() - t, 2)
    if args.prelists:
        t = time.monotonic()
        pre = eng.bm25_topk(dense, k=10)  # auto → prelist
        verify["dense_bm25_prelist_s"] = round(time.monotonic() - t, 4)
        verify["dense_prelist_identical"] = pre == full
    wq = WAND_QUERIES[0]
    verify["wand_equals_exhaustive"] = (
        eng.bm25_wand(wq, k=10) == eng.bm25_exhaustive(wq, k=10)
    )
    if args.positions:
        # selective query: a DENSE-pair phrase decodes every candidate's
        # position list (O(Σ positions), the same tail the bm25 prelists
        # bound for single terms — measured >1 h at 20M and documented in
        # BASELINE.md, not re-priced per run)
        pq = WAND_QUERIES[0]
        eng.search_phrase_positional(pq, k=10)  # warm
        t = time.monotonic()
        eng.search_phrase_positional(pq, k=10)
        verify["warm_phrase_pos_ms"] = round((time.monotonic() - t) * 1e3, 1)
        t = time.monotonic()
        eng.search_near(pq, slop=3, k=10)
        verify["warm_near_ms"] = round((time.monotonic() - t) * 1e3, 1)

    seg_bytes = tree_bytes(args.out, "segments")
    docs_bytes = tree_bytes(args.out, "docs")
    result = {
        "metric": "index_build_wall_sec",
        "value": round(max(walls), 1),
        "unit": "sec",
        "model": (f"deployment model at {n_docs / 1e6:.0f}M pages: "
                  f"{args.shards} url-space shards, {args.shards} concurrent "
                  f"build_cli jobs (fresh Ray each, {args.cpus_per_job} CPUs "
                  f"+ {args.object_store_gb:g} GB object store per job)"
                  + (", positional postings" if args.positions else "")),
        "shard_walls_sec": [round(w, 1) for w in walls],
        "popen_wall_sec": round(popen_wall, 1),
        "docs_per_sec": round(n_docs / max(walls)),
        "n_docs": n_docs,
        "sf": args.sf,
        "repeat": args.repeat,
        "body_repeat": args.body_repeat,
        "pages_gen_sec": round(pages_sec, 1),
        "phases_shard0": phases0,
        "segments_mb": round(seg_bytes / 1e6, 1),
        "docs_mb": round(docs_bytes / 1e6, 1),
        "index_bytes_per_doc": round(seg_bytes / max(1, n_docs), 2),
        "site_lemmas_global_sec": round(sl_sec, 1),
        "positions": args.positions,
        **prelist,
        "verify": verify,
    }
    line = json.dumps(result)
    print(line)
    if args.json:
        with open(os.path.join(REPO, args.json) if not os.path.isabs(args.json)
                  else args.json, "w") as f:
            f.write(line + "\n")
    if not args.keep:
        shutil.rmtree(args.out, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
