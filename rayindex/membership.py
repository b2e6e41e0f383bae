"""Broadcastable / loadable membership structures over int64 id sets.

Shared by the P1 duplicate-id broadcast (build.py `_DupMembership`) and the
U2 purge-tombstone exclusions (query.py `Exclusions`): an exact sorted array
when the set is small, a ~10-bit/element double-hash bloom above that.  Both
consumers pair the bloom with an exact side path, so false positives cost a
little work and never correctness.
"""

from __future__ import annotations

import numpy as np


def splitmix_hashes(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hash streams per id (splitmix64-style mixes)
    for double hashing; the second stream is forced odd."""
    x = ids.astype(np.uint64)
    h1 = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    h1 = (h1 ^ (h1 >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
    h1 ^= h1 >> np.uint64(33)
    h2 = (x + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    h2 = (h2 ^ (h2 >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h2 ^= h2 >> np.uint64(31)
    return h1, h2 | np.uint64(1)


class BloomFilter:
    """~10-bit/element bloom with K=7 probes (~1 % false positives).
    ``add`` is incremental so large id sets stream in row-group-sized
    chunks without ever materializing in one array."""

    K = 7

    def __init__(self, n_expected: int, bits_per_element: int = 10):
        m = max(64, int(n_expected) * bits_per_element)
        words = (m + 63) // 64
        self.m = words * 64
        self.bits = np.zeros(words, dtype=np.uint64)

    def nbytes(self) -> int:
        return int(self.bits.nbytes)

    def add(self, ids: np.ndarray) -> None:
        if len(ids) == 0:
            return
        h1, h2 = splitmix_hashes(np.asarray(ids))
        for i in range(self.K):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
            np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, ids: np.ndarray) -> np.ndarray:
        if len(ids) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = splitmix_hashes(np.asarray(ids))
        out = np.ones(len(ids), dtype=bool)
        for i in range(self.K):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
            word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return out


def in_sorted(values: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Vectorized membership of values in a sorted array (same dtype)."""
    if sorted_arr.size == 0:
        return np.zeros(len(values), dtype=bool)
    idx = np.searchsorted(sorted_arr, values)
    return (idx < sorted_arr.size) & (
        sorted_arr[np.minimum(idx, sorted_arr.size - 1)] == values
    )


class BloomVerifiedSet:
    """Bounded-memory EXACT membership over a large id set.

    - at/below ``exact_cap`` ids: one sorted uint64 array (bit-identical to a
      plain sorted-array membership test);
    - above it: a ~10-bit/element :class:`BloomFilter` streamed chunk-by-chunk
      from ``chunks_fn`` (1.25 MB per 10^6 ids) + **exact verification** of
      bloom positives through ``verify_fn`` (typically a row-group-pruned
      Parquet point read), with a bounded cache of verdicts.  False positives
      therefore cost a pruned read, never correctness.

    ``chunks_fn()`` must yield uint64 arrays that together cover every member
    id exactly; ``verify_fn(sorted_unknown)`` must return the sorted subset
    that are true members.
    """

    VERIFY_CACHE_CAP = 1 << 21  # cached verdict ids (~16 MB at the cap)

    def __init__(self, n_total: int, chunks_fn, verify_fn, exact_cap: int):
        self.n = int(n_total)
        self._verify_fn = verify_fn
        self.exact: np.ndarray | None = None
        self.bloom: BloomFilter | None = None
        self._known_true = np.zeros(0, dtype=np.uint64)
        self._known_false = np.zeros(0, dtype=np.uint64)
        if self.n == 0:
            self.exact = np.zeros(0, dtype=np.uint64)
            return
        if self.n <= exact_cap:
            parts = [np.asarray(c, dtype=np.uint64) for c in chunks_fn()]
            self.exact = (
                np.sort(np.concatenate(parts)) if parts else np.zeros(0, dtype=np.uint64)
            )
            self.n = int(self.exact.size)
            return
        # streaming bloom build: one chunk in memory at a time
        self.bloom = BloomFilter(self.n)
        for c in chunks_fn():
            self.bloom.add(np.asarray(c, dtype=np.uint64))

    def __len__(self) -> int:
        return self.n

    def nbytes(self) -> int:
        """Resident state (the 'bounded structure' the scale tests pin)."""
        out = self._known_true.nbytes + self._known_false.nbytes
        if self.exact is not None:
            out += self.exact.nbytes
        if self.bloom is not None:
            out += self.bloom.nbytes()
        return int(out)

    def _seed_known_true(self, ids: np.ndarray) -> None:
        """Pre-populate the verdict cache with ids already known to be members
        (bloom mode only; no-op in exact mode)."""
        if self.bloom is not None and len(ids):
            self._known_true = np.union1d(
                self._known_true, np.asarray(ids, dtype=np.uint64)
            )

    def _verify(self, cand: np.ndarray) -> np.ndarray:
        """Exact verdicts for bloom-positive candidate ids (sorted uint64 in →
        sorted true subset out); consults and feeds the verdict cache."""
        known_t = cand[in_sorted(cand, self._known_true)]
        unknown = cand[
            ~in_sorted(cand, self._known_true) & ~in_sorted(cand, self._known_false)
        ]
        if unknown.size:
            hits = np.asarray(self._verify_fn(unknown), dtype=np.uint64)
            known_t = np.union1d(known_t, hits)
            if (
                self._known_true.size + self._known_false.size + unknown.size
                > self.VERIFY_CACHE_CAP
            ):
                self._known_true = np.zeros(0, dtype=np.uint64)
                self._known_false = np.zeros(0, dtype=np.uint64)
            self._known_true = np.union1d(self._known_true, hits)
            self._known_false = np.union1d(
                self._known_false, unknown[~in_sorted(unknown, hits)]
            )
        return known_t

    def contains(self, ids: np.ndarray) -> np.ndarray:
        """Boolean mask: which of ``ids`` are members.  Exact always."""
        ids = np.asarray(ids, dtype=np.uint64)
        if self.n == 0:
            return np.zeros(len(ids), dtype=bool)
        if self.exact is not None:
            return in_sorted(ids, self.exact)
        mask = self.bloom.contains(ids)
        if not mask.any():
            return mask
        true_ids = self._verify(np.unique(ids[mask]))
        return mask & in_sorted(ids, true_ids)

    def contains_one(self, doc: int) -> bool:
        if self.n == 0:
            return False
        if self.exact is not None:
            a = self.exact
            i = int(np.searchsorted(a, np.uint64(doc)))
            return i < a.size and int(a[i]) == int(doc)
        return bool(self.contains(np.array([doc], dtype=np.uint64))[0])


def parquet_id_verifier(paths: list[str], column: str = "doc_id", extra_filter=None,
                        chunk: int = 1 << 16):
    """A ``verify_fn`` for :class:`BloomVerifiedSet`: pruned Parquet point
    reads.  When the files are sorted by ``column``, row-group statistics
    prune the ``isin`` lookup to the touched groups.  ``extra_filter`` (a
    pyarrow expression) is ANDed in — e.g. ``site == X`` for per-site
    membership over a site-clustered table."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")
            )
        else:
            files.append(p)

    def verify(unknown: np.ndarray) -> np.ndarray:
        out = []
        dset = pads.dataset(files, format="parquet")
        for i in range(0, unknown.size, chunk):
            part = unknown[i : i + chunk]
            flt = pc.field(column).isin(pa.array(part.astype(np.int64), pa.int64()))
            if extra_filter is not None:
                flt = extra_filter & flt
            tab = dset.to_table(columns=[column], filter=flt)
            out.append(tab.column(column).to_numpy().astype(np.uint64))
        return (
            np.unique(np.concatenate(out)) if out else np.zeros(0, dtype=np.uint64)
        )

    return verify


class TombstoneSet(BloomVerifiedSet):
    """Bounded-memory membership over purged doc ids (U2 tombstones).

    Replaces the round-2 design where ``tombstones.json`` carried every purged
    doc id inline and the engine held them all in one array — a billion-page
    site purge wrote GBs of JSON (reference analog of the cascade DELETE in
    dto/indexing/SiteIndexer.java:108-129, which pays the same O(site) cost
    *inside MySQL*).  Ids stream from the doc_id-sorted Parquet sidecar
    (``purge_site``); verification point-reads it with row-group pruning.
    Results stay identical to a physical rebuild.
    """

    def __init__(
        self,
        inline_ids: np.ndarray | None = None,
        parquet_paths: list[str] | None = None,
        n_total: int | None = None,
        exact_cap: int = 2_000_000,
    ):
        import pyarrow.parquet as pq

        paths = list(parquet_paths or [])
        inline = (
            np.asarray(inline_ids, dtype=np.uint64)
            if inline_ids is not None
            else np.zeros(0, dtype=np.uint64)
        )
        if n_total is None:
            n_total = int(inline.size) + sum(
                pq.ParquetFile(p).metadata.num_rows for p in paths
            )

        def chunks():
            if inline.size:
                yield inline
            for p in paths:
                f = pq.ParquetFile(p)
                for rg in range(f.metadata.num_row_groups):
                    yield (
                        f.read_row_group(rg, columns=["doc_id"])
                        .column("doc_id")
                        .to_numpy()
                        .astype(np.uint64)
                    )

        def verify(unknown: np.ndarray) -> np.ndarray:
            hits = parquet_id_verifier(paths)(unknown) if paths else np.zeros(0, np.uint64)
            if inline.size:
                hits = np.union1d(hits, unknown[in_sorted(unknown, np.sort(inline))])
            return hits

        super().__init__(n_total, chunks, verify, exact_cap)
        self._seed_known_true(np.sort(inline))
