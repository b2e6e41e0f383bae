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


# ---------------------------------------------------------------------------
# PForDelta codec (NewPFD-style patched frame-of-reference)


@given(
    st.sets(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=700),
    st.randoms(),
)
@settings(max_examples=50, deadline=None)
def test_pfor_postings_roundtrip(doc_set, rnd):
    docs = np.array(sorted(doc_set), dtype=np.uint64)
    n = len(docs)
    rng = np.random.default_rng(rnd.randint(0, 2**31))
    tfs = rng.integers(1, 50, size=n).astype(np.uint64)
    dls = rng.integers(1, 500, size=n).astype(np.uint64)
    enc = encode_postings(docs, tfs, dls, codec="pfor")
    assert enc.codec == "pfor"
    d, t, l = decode_postings(enc)
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    assert np.array_equal(l, dls.astype(np.uint32))


def test_pfor_stream_roundtrip_adversarial():
    """Skewed blocks: mostly-tiny values with a few huge outliers — the case
    PFor's patching exists for; plus all-zero, all-equal, and b=64 blocks."""
    from rayindex.codec import pfor_decode_stream, pfor_encode_stream

    cases = [
        np.zeros(300, np.uint64),  # b=0, no exceptions
        np.full(257, 7, np.uint64),  # constant
        np.r_[np.ones(126, np.uint64), [2**63, 2**64 - 1]],  # outlier patch
        np.arange(1, 1000, dtype=np.uint64) ** 2,
        np.array([2**64 - 1] * 128, dtype=np.uint64),  # b=64 everywhere
        np.array([5], np.uint64),  # single-value stream
    ]
    for v in cases:
        bounds = np.append(np.arange(0, v.size, BLOCK_SIZE), v.size)
        blob, nbytes = pfor_encode_stream(v, bounds)
        sizes = np.diff(bounds)
        got = pfor_decode_stream(blob, nbytes, sizes)
        assert np.array_equal(got, v)


def test_pfor_blockreader_equals_vb():
    rng = np.random.default_rng(3)
    docs = np.unique(rng.integers(1, 2**48, 5000, dtype=np.uint64))
    n = docs.size
    tfs = rng.integers(1, 30, n).astype(np.uint64)
    dls = rng.integers(1, 4000, n).astype(np.uint64)
    e_vb = encode_postings(docs, tfs, dls, codec="vb")
    e_pf = encode_postings(docs, tfs, dls, codec="pfor")
    # block-max metadata is codec-independent
    assert e_vb.b_last_doc == e_pf.b_last_doc
    assert e_vb.b_max_tf == e_pf.b_max_tf
    assert e_vb.b_min_dl == e_pf.b_min_dl
    rv, rp = BlockReader(e_vb), BlockReader(e_pf)
    assert rv.n_blocks == rp.n_blocks
    for k in range(rv.n_blocks):
        for a, b in zip(rv.block(k), rp.block(k)):
            assert np.array_equal(a, b)


def test_pfor_smaller_on_small_value_streams():
    """tf/doc-len style streams (small ints) pack well below 1 byte/value."""
    rng = np.random.default_rng(5)
    docs = np.cumsum(rng.integers(1, 20, 4096, dtype=np.uint64))
    tfs = rng.integers(1, 8, 4096).astype(np.uint64)
    dls = rng.integers(100, 200, 4096).astype(np.uint64)
    e_vb = encode_postings(docs, tfs, dls, codec="vb")
    e_pf = encode_postings(docs, tfs, dls, codec="pfor")
    assert len(e_pf.tfs_blob) < len(e_vb.tfs_blob)
    assert len(e_pf.docs_blob) + len(e_pf.tfs_blob) + len(e_pf.dls_blob) < (
        len(e_vb.docs_blob) + len(e_vb.tfs_blob) + len(e_vb.dls_blob)
    )


def test_unknown_codec_rejected():
    with pytest.raises(ValueError):
        encode_postings(
            np.array([1], np.uint64), np.ones(1, np.uint64), np.ones(1, np.uint64),
            codec="zzz",
        )


def test_pfor_decode_stream_matches_per_block():
    """The vectorized multi-block decode (query/merge hot loop) is
    value-identical to per-block pfor_decode_block, including blocks with
    exception patches and a short tail block."""
    from rayindex.codec import (
        BLOCK_SIZE,
        pfor_decode_block,
        pfor_decode_stream,
        pfor_encode_stream,
    )

    rng = np.random.default_rng(11)
    for n in (129, 1000, 20000):
        vals = rng.integers(0, 2**16, n).astype(np.uint64)
        vals[rng.integers(0, n, max(1, n // 40))] = rng.integers(2**30, 2**50)
        heads = np.arange(0, n, BLOCK_SIZE)
        bounds = np.append(heads, n)
        blob, nbytes = pfor_encode_stream(vals, bounds)
        buf = np.frombuffer(blob, np.uint8)
        off = np.concatenate(([0], np.cumsum(nbytes.astype(np.int64))))
        sizes = np.diff(bounds)
        ref = np.concatenate(
            [pfor_decode_block(buf[off[k]:off[k + 1]], int(sizes[k]))
             for k in range(len(sizes))]
        )
        got = pfor_decode_stream(blob, nbytes, sizes)
        assert np.array_equal(ref, got), n


def test_pfor_decode_stream_all_zero_and_varied_widths():
    from rayindex.codec import pfor_decode_stream, pfor_encode_stream

    # per-block widths differ wildly (zeros, tiny, huge) across blocks
    parts = [
        np.zeros(128, np.uint64),
        np.full(128, 3, np.uint64),
        np.full(128, 2**40, np.uint64),
        np.arange(37, dtype=np.uint64),  # short tail
    ]
    vals = np.concatenate(parts)
    bounds = np.concatenate(([0], np.cumsum([len(p) for p in parts])))
    blob, nbytes = pfor_encode_stream(vals, bounds)
    got = pfor_decode_stream(blob, nbytes, np.diff(bounds))
    assert np.array_equal(got, vals)


def test_blockreader_tail_matches_per_block():
    """tail(k0) (the WAND bulk-bail fast path) equals the per-block concat
    for every start block, both codecs, including a short tail block."""
    from rayindex.codec import BlockReader, encode_postings

    rng = np.random.default_rng(7)
    docs = np.unique(rng.integers(1, 2**40, 1500, dtype=np.uint64))
    n = docs.size
    tfs = rng.integers(1, 30, n).astype(np.uint64)
    dls = rng.integers(1, 4000, n).astype(np.uint64)
    for codec in ("pfor", "vb"):
        r = BlockReader(encode_postings(docs, tfs, dls, codec=codec))
        for k0 in (0, 1, r.n_blocks // 2, r.n_blocks - 1, r.n_blocks):
            want = [r.block(k) for k in range(k0, r.n_blocks)]
            got = r.tail(k0)
            for i in range(3):
                ref = (
                    np.concatenate([w[i] for w in want])
                    if want
                    else np.empty(0, np.uint64)
                )
                assert np.array_equal(got[i], ref), (codec, k0, i)
