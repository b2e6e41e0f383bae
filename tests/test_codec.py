"""Codec unit + property tests (SURVEY.md §5 item 3: delta+varbyte roundtrip,
block-max metadata invariants)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rayindex.codec import (
    BLOCK_SIZE,
    BlockReader,
    decode_postings,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
@settings(max_examples=100, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(arr), len(arr)).tolist() == values


def test_varbyte_boundaries():
    edge = np.array([0, 1, 127, 128, 2**14 - 1, 2**14, 2**35, 2**63, 2**64 - 1], dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(edge)), edge)


@given(
    st.sets(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=700),
    st.randoms(),
)
@settings(max_examples=50, deadline=None)
def test_postings_roundtrip(doc_set, rnd):
    docs = np.array(sorted(doc_set), dtype=np.uint64)
    n = len(docs)
    tfs = np.array([rnd.randint(1, 1000) for _ in range(n)], dtype=np.uint64)
    dls = np.array([rnd.randint(1, 100000) for _ in range(n)], dtype=np.uint64)
    enc = encode_postings(docs, tfs, dls)
    d, t, l = decode_postings(enc)
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    assert np.array_equal(l, dls)


def test_block_metadata_invariants():
    rng = np.random.default_rng(3)
    docs = np.unique(rng.integers(0, 2**63, size=1000, dtype=np.uint64))
    n = len(docs)
    tfs = rng.integers(1, 50, size=n).astype(np.uint64)
    dls = rng.integers(1, 500, size=n).astype(np.uint64)
    enc = encode_postings(docs, tfs, dls)
    br = BlockReader(enc)
    assert br.n_blocks == -(-n // BLOCK_SIZE)
    for k in range(br.n_blocks):
        bdocs, btfs, bdls = br.block(k)
        assert int(br.last_doc[k]) == int(bdocs[-1])
        assert int(br.max_tf[k]) == int(btfs.max())
        assert int(br.min_dl[k]) == int(bdls.min())
        assert bool(np.all(np.diff(bdocs.astype(np.int64)) > 0) or len(bdocs) == 1)


def test_unsorted_rejected():
    with pytest.raises(ValueError):
        encode_postings(
            np.array([5, 5], dtype=np.uint64),
            np.ones(2, dtype=np.uint64),
            np.ones(2, dtype=np.uint64),
        )
