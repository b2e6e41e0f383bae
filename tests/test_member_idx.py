"""sorted_member_idx must be exactly np.searchsorted + equality membership.

The chunked range-partitioned search in rayindex/query.py:sorted_member_idx
replaces the profiled per-query hot spot of the reference scorer; its
correctness argument (unique sorted haystack ⇒ per-chunk slice search equals
the global search) is pinned here against the plain formulation across the
regimes the engine hits: tiny/huge haystacks, empty needles, needles entirely
below/above the haystack, duplicate needles, and the forced-chunked path.
"""

import numpy as np
import pytest

from rayindex.query import sorted_member_idx


def _plain(docs: np.ndarray, cand: np.ndarray):
    idx = np.searchsorted(docs, cand)
    hit = idx < docs.size
    hit[hit] = docs[idx[hit]] == cand[hit]
    return idx, hit


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize(
    "n_docs,n_cand,overlap",
    [
        (100, 50, 0.5),
        (1 << 17, 40_000, 0.5),     # above the small-docs gate, chunked path
        (300_000, 120_000, 0.9),
        (300_000, 5, 0.0),          # tiny needle set
        (5, 300_000, 0.2),          # haystack smaller than needles
    ],
)
def test_matches_plain_searchsorted(seed, n_docs, n_cand, overlap):
    rng = np.random.default_rng(seed)
    space = 1 << 62
    docs = np.sort(
        rng.choice(space, size=min(n_docs * 4, space), replace=False)[:n_docs]
        .astype(np.uint64)
    )
    n_in = int(n_cand * overlap)
    cand = np.concatenate(
        [
            rng.choice(docs, size=min(n_in, docs.size)),
            rng.integers(0, space, size=n_cand - min(n_in, docs.size)).astype(np.uint64),
        ]
    )
    cand = np.sort(cand)  # duplicates allowed: needles need not be unique
    idx0, hit0 = _plain(docs, cand)
    # default chunking AND a tiny chunk that forces many slices
    for chunk in (8192, 61):
        idx1, hit1 = sorted_member_idx(docs, cand, chunk=chunk)
        assert np.array_equal(hit0, hit1)
        assert np.array_equal(idx0[hit0], idx1[hit1])
        # insertion points agree everywhere, not just on hits
        assert np.array_equal(idx0, idx1)


def test_empty_needles_and_boundaries():
    docs = np.arange(10, 200_000 * 3, 3, dtype=np.uint64)
    empty = np.empty(0, dtype=np.uint64)
    idx, hit = sorted_member_idx(docs, empty)
    assert idx.size == 0 and hit.size == 0
    # empty HAYSTACK with non-empty needles: all misses, no IndexError
    # (reachable when a dictionary-known term decodes to zero postings)
    idx, hit = sorted_member_idx(empty, np.array([1, 2, 3], dtype=np.uint64))
    assert not hit.any() and idx.size == 3
    # all needles below the haystack / all above (idx == docs.size)
    below = np.arange(0, 9, dtype=np.uint64)
    above = docs[-1] + 1 + np.arange(5_000, dtype=np.uint64)
    for cand in (below, above, np.concatenate([below, above])):
        idx0, hit0 = _plain(docs, cand)
        idx1, hit1 = sorted_member_idx(docs, cand, chunk=64)
        assert np.array_equal(idx0, idx1) and np.array_equal(hit0, hit1)
        assert not hit1.any()
