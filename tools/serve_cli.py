#!/usr/bin/env python
"""Serving entrypoint: the reference's Spring Boot application as a CLI.

The reference user launches one process (SearchEngineApplication.java) that
serves the dashboard at ``GET /`` and the five ``/api`` JSON endpoints over
the configured index.  This CLI is that process over the Ray-native engine:

    python tools/serve_cli.py --index /tmp/index --analyzer simple --port 8080

With ``--pages`` the Management tab's start/stop-indexing toggle and the
add/update-page form work too (the build runs as a resumable subprocess of
``tools/build_cli.py``, exactly the cluster submission path).

The process owns its Ray session (a real deployment gives each serving
replica its own driver); the index analyzer must match the one used at build
time — the shard manifest records the analyzer *name*, so a mismatch fails
loudly at startup instead of returning silently empty searches.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True, help="built index root")
    ap.add_argument("--analyzer", default="simple", choices=["simple", "reference_ru"])
    ap.add_argument("--analyzer-spec-json", default=None,
                    help="path to a JSON analyzer spec (overrides --analyzer; "
                         "required for reference_ru, whose spec carries the "
                         "lemma map)")
    ap.add_argument("--pages", default=None,
                    help="pages Parquet path (enables the indexing endpoints)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--k", type=int, default=10, help="default search depth")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU count (ignored on a real cluster)")
    args = ap.parse_args()

    if args.analyzer_spec_json:
        with open(args.analyzer_spec_json) as f:
            spec = json.load(f)
    elif args.analyzer == "simple":
        spec = {"name": "simple"}
    else:
        ap.error("--analyzer reference_ru needs --analyzer-spec-json "
                 "(the spec carries the lemma map and particle set)")

    # fail loudly on an analyzer mismatch: the build recorded its analyzer
    # name in every shard's stats.json (checked before Ray boots)
    import glob

    for p in glob.glob(os.path.join(args.index, "shard=*", "stats.json")):
        with open(p) as f:
            built_with = json.load(f).get("analyzer")
        if built_with and built_with != spec.get("name"):
            print(f"error: index shard {os.path.dirname(p)} was built with "
                  f"analyzer {built_with!r}, serving spec is "
                  f"{spec.get('name')!r}", file=sys.stderr)
            return 2
        break  # all shards share one analyzer; checking one suffices

    import ray

    if not ray.is_initialized():
        init_kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                           logging_level="ERROR")
        if args.num_cpus:
            init_kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**init_kwargs)

    from rayindex.http_api import ApiServer

    srv = ApiServer(args.index, spec, pages_dir=args.pages, host=args.host,
                    port=args.port, k=args.k).start()
    print(f"serving {args.index} at {srv.address} "
          f"(dashboard: {srv.address}/)", flush=True)
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        pass
    finally:
        srv.close()
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
