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


class TombstoneSet:
    """Bounded-memory membership over purged doc ids (U2 tombstones).

    Replaces the round-2 design where ``tombstones.json`` carried every purged
    doc id inline and the engine held them all in one array — a billion-page
    site purge wrote GBs of JSON (reference analog of the cascade DELETE in
    dto/indexing/SiteIndexer.java:108-129, which pays the same O(site) cost
    *inside MySQL*).  Now:

    - at/below ``exact_cap`` ids: one sorted uint64 array, exact (bit-identical
      to round 2's behavior);
    - above it: a ~10-bit/element :class:`BloomFilter` streamed from the
      tombstone Parquet row groups (1.25 MB per 10^6 ids) + **exact
      verification** of bloom positives against the Parquet (doc_id-sorted
      files → row-group statistics prune the lookup), with a bounded cache of
      verdicts.  False positives therefore cost a pruned point read, never
      correctness — results stay identical to a physical rebuild.
    """

    VERIFY_CACHE_CAP = 1 << 21  # cached verdict ids (~16 MB at the cap)

    def __init__(
        self,
        inline_ids: np.ndarray | None = None,
        parquet_paths: list[str] | None = None,
        n_total: int | None = None,
        exact_cap: int = 2_000_000,
    ):
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        self._paths = list(parquet_paths or [])
        inline = (
            np.asarray(inline_ids, dtype=np.uint64)
            if inline_ids is not None
            else np.zeros(0, dtype=np.uint64)
        )
        if n_total is None:
            n_total = int(inline.size) + sum(
                pq.ParquetFile(p).metadata.num_rows for p in self._paths
            )
        self.n = int(n_total)
        self.exact: np.ndarray | None = None
        self.bloom: BloomFilter | None = None
        self._known_true = np.zeros(0, dtype=np.uint64)
        self._known_false = np.zeros(0, dtype=np.uint64)
        if self.n == 0:
            self.exact = np.zeros(0, dtype=np.uint64)
            return
        if self.n <= exact_cap:
            parts = [inline]
            for p in self._paths:
                parts.append(
                    pads.dataset(p, format="parquet")
                    .to_table(columns=["doc_id"])
                    .column("doc_id")
                    .to_numpy()
                    .astype(np.uint64)
                )
            self.exact = np.sort(np.concatenate(parts))
            return
        # streaming bloom build: one row-group-sized chunk in memory at a time
        self.bloom = BloomFilter(self.n)
        self.bloom.add(inline)
        self._known_true = np.sort(inline)
        for p in self._paths:
            f = pq.ParquetFile(p)
            for rg in range(f.metadata.num_row_groups):
                self.bloom.add(
                    f.read_row_group(rg, columns=["doc_id"])
                    .column("doc_id")
                    .to_numpy()
                    .astype(np.uint64)
                )

    def __len__(self) -> int:
        return self.n

    def nbytes(self) -> int:
        """Resident engine state (the 'bounded structure' the purge test pins)."""
        out = self._known_true.nbytes + self._known_false.nbytes
        if self.exact is not None:
            out += self.exact.nbytes
        if self.bloom is not None:
            out += self.bloom.nbytes()
        return int(out)

    def _verify(self, cand: np.ndarray) -> np.ndarray:
        """Exact verdicts for bloom-positive candidate ids (sorted uint64 in →
        sorted true subset out); consults and feeds the verdict cache."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        known_t = cand[in_sorted(cand, self._known_true)]
        unknown = cand[
            ~in_sorted(cand, self._known_true) & ~in_sorted(cand, self._known_false)
        ]
        if unknown.size:
            tab = pads.dataset(self._paths, format="parquet").to_table(
                columns=["doc_id"],
                filter=pc.field("doc_id").isin(
                    pa.array(unknown.astype(np.int64), pa.int64())
                ),
            )
            hits = np.unique(tab.column("doc_id").to_numpy().astype(np.uint64))
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
        """Boolean mask: which of ``ids`` are tombstoned.  Exact always."""
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
