#!/usr/bin/env python
"""Index integrity audit entrypoint for ``ray job submit``.

    ray job submit --working-dir . -- \
        python tools/audit_cli.py --index s3://bucket/index [--no-df-check]

Prints a one-line JSON summary and exits non-zero if violations were found
(the violation table itself goes to --out as Parquet when given).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True, help="index root to audit")
    ap.add_argument("--out", default=None,
                    help="optional Parquet path for the violation table")
    ap.add_argument("--no-df-check", action="store_true",
                    help="skip the postings-vs-dictionary df cross-check")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
    from rayindex.audit import audit_index

    vio = audit_index(args.index, check_df=not args.no_df_check)
    if args.out:
        vio.to_parquet(args.out, index=False)
    print(json.dumps({
        "index": args.index,
        "violations": int(len(vio)),
        "checks": sorted(vio["check"].unique().tolist()) if len(vio) else [],
    }))
    ray.shutdown()
    return 1 if len(vio) else 0


if __name__ == "__main__":
    sys.exit(main())
