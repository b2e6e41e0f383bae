"""Versioned index publication: an atomic CURRENT pointer over build outputs.

The serving story at scale: builds (full, delta-composed, merged or
compacted) land in sibling directories under one versions root; consumers
never point at a build directory directly but at the root, resolving the
``CURRENT`` pointer file (written tmp → ``os.replace``, the same atomic
commit discipline as the build's phase manifests).  Publishing never copies
index bytes — it validates the candidate and flips one pointer, so cutover
cost is independent of index size, and the previous version stays on disk
for instant rollback (``publish_index(..., version=<old>)`` again).

``SearchService.sync`` (rayindex/serve.py) pairs with this: it re-resolves
CURRENT and, when the pointer moved, performs the zero-downtime replica
swap.  The reference's analog is restarting the Spring service against the
one mutable MySQL schema — no versions, no rollback
(services/IndexingServiceImpl.java:33-60).
"""

from __future__ import annotations

import json
import os
import time
import uuid

_CURRENT = "CURRENT"


def _validate_index(index_dir: str) -> int:
    """A publishable index has ≥1 shard, each with stats.json + a committed
    ``stats`` phase manifest; returns the shard count."""
    from .segments import list_shards, manifest_path

    shards = list_shards(index_dir)
    if not shards:
        raise ValueError(f"not an index root (no shard=* dirs): {index_dir}")
    for s in shards:
        if not os.path.exists(os.path.join(s, "stats.json")):
            raise ValueError(f"shard missing stats.json: {s}")
        m = manifest_path(s, "stats")
        if not os.path.exists(m):
            raise ValueError(f"shard missing the stats phase manifest: {s}")
        with open(m) as f:
            if json.load(f).get("status") != "done":
                raise ValueError(f"stats phase not committed: {s}")
    return len(shards)


def publish_index(versions_root: str, index_dir: str,
                  version: str | None = None) -> str:
    """Atomically make ``index_dir`` the CURRENT version under
    ``versions_root``; returns the version name.  ``index_dir`` may live
    anywhere (the pointer stores an absolute path) but conventionally is a
    subdirectory of the root.  Validation runs BEFORE the flip — a
    half-written build can never become CURRENT."""
    n_shards = _validate_index(index_dir)
    os.makedirs(versions_root, exist_ok=True)
    index_dir = os.path.abspath(index_dir)
    if version is None:
        version = os.path.basename(os.path.normpath(index_dir))
    record = {
        "version": version,
        "path": index_dir,
        "n_shards": n_shards,
        "published_unix": int(time.time()),
    }
    # unique temp name: concurrent publishers (a rollback racing a CI
    # publish) must never interleave writes in one file — each writes its
    # own tmp and the LAST os.replace wins atomically
    tmp = os.path.join(
        versions_root, f"{_CURRENT}.tmp.{os.getpid()}.{uuid.uuid4().hex}")
    try:
        with open(tmp, "w") as f:
            json.dump(record, f, indent=1)
        os.replace(tmp, os.path.join(versions_root, _CURRENT))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return version


def resolve_current(versions_root: str) -> str:
    """Path of the CURRENT index version (raises if nothing published)."""
    p = os.path.join(versions_root, _CURRENT)
    if not os.path.exists(p):
        raise FileNotFoundError(f"no CURRENT pointer under {versions_root}")
    with open(p) as f:
        return json.load(f)["path"]


def current_record(versions_root: str) -> dict:
    """Full CURRENT record (version, path, n_shards, published_unix)."""
    with open(os.path.join(versions_root, _CURRENT)) as f:
        return json.load(f)
