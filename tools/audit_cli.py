#!/usr/bin/env python
"""Index integrity audit entrypoint for ``ray job submit``.

    ray job submit --working-dir . -- \
        python tools/audit_cli.py --index /mnt/shared/index [--no-df-check]

Prints a one-line JSON summary and exits non-zero if violations were found
(the violation table itself goes to --out as Parquet when given).

The index root must be a filesystem path visible to every node (local disk
on one node, NFS on a cluster): shard discovery walks the directory tree
(rayindex/segments.py ``list_shards``), which does not speak object-store
URIs — sync an s3:// index down (or FUSE-mount the bucket) before auditing.
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
        kwargs = {"include_dashboard": False, "logging_level": "ERROR",
                  "ignore_reinit_error": True}
        # like tools/build_cli.py: only force a fresh local instance when
        # --num-cpus pins one; otherwise auto-connect so `ray job submit`
        # fans the audit out over the WHOLE cluster it was submitted to
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)
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
