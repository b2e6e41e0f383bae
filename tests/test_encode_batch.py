"""Byte-identity of the batched tail-term posting encoder.

``encode_group`` batches every single-block term into ONE
``encode_postings_batch`` call; these tests pin that each batched list's
fields are byte-identical to ``encode_postings`` on the list alone, and
that ``encode_group``'s full output table (rows, order, every blob) is
unchanged from the per-term construction it replaced.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rayindex.codec import (
    BLOCK_SIZE,
    encode_postings,
    encode_postings_batch,
)
from rayindex.segments import MIXED_SCHEMA, encode_group


def _rand_lists(rng, n_lists, max_len):
    lens = np.clip(rng.zipf(1.5, n_lists), 1, max_len)
    doc_ids, tfs, dls = [], [], []
    for l in lens:
        doc_ids.append(np.sort(rng.choice(2**40, int(l), replace=False)).astype(np.uint64))
        tfs.append(rng.integers(1, 1000, int(l)).astype(np.uint64))
        dls.append(rng.integers(1, 10**6, int(l)).astype(np.uint64))
    return lens, doc_ids, tfs, dls


@pytest.mark.parametrize("codec", ["pfor", "vb"])
def test_batch_matches_per_list_encode(codec):
    rng = np.random.default_rng(7)
    lens, doc_ids, tfs, dls = _rand_lists(rng, 300, BLOCK_SIZE)
    bounds = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    batch = encode_postings_batch(
        np.concatenate(doc_ids), np.concatenate(tfs), np.concatenate(dls),
        bounds, codec=codec,
    )
    assert batch.n == 300
    for i in range(300):
        ref = encode_postings(doc_ids[i], tfs[i], dls[i], codec=codec)
        got = batch.get(i)
        assert got == ref, f"list {i} (len {lens[i]}) mismatch"


@pytest.mark.parametrize("codec", ["pfor", "vb"])
def test_batch_edge_lengths(codec):
    """Lists of len 1 and exactly BLOCK_SIZE, plus extreme values."""
    cases = [
        (np.array([0], np.uint64),),
        (np.array([2**63], np.uint64),),
        (np.arange(1, BLOCK_SIZE + 1, dtype=np.uint64),),
        (np.array([5, 2**40, 2**63 + 7], np.uint64),),
    ]
    doc_ids = [c[0] for c in cases]
    tfs = [np.full(len(d), 3, np.uint64) for d in doc_ids]
    dls = [np.full(len(d), 77, np.uint64) for d in doc_ids]
    bounds = np.concatenate(([0], np.cumsum([len(d) for d in doc_ids]))).astype(np.int64)
    batch = encode_postings_batch(
        np.concatenate(doc_ids), np.concatenate(tfs), np.concatenate(dls),
        bounds, codec=codec,
    )
    for i, d in enumerate(doc_ids):
        assert batch.get(i) == encode_postings(d, tfs[i], dls[i], codec=codec)


def test_batch_rejects_oversize_and_nonincreasing():
    d = np.arange(BLOCK_SIZE + 1, dtype=np.uint64)
    one = np.ones(d.size, np.uint64)
    with pytest.raises(ValueError):
        encode_postings_batch(d, one, one, np.array([0, d.size]))
    # non-increasing WITHIN a list raises; a reset at a list boundary is fine
    d2 = np.array([5, 4], np.uint64)
    with pytest.raises(ValueError):
        encode_postings_batch(d2, one[:2], one[:2], np.array([0, 2]))
    encode_postings_batch(d2, one[:2], one[:2], np.array([0, 1, 2]))  # boundary reset ok


def test_batch_empty():
    b = encode_postings_batch(
        np.empty(0, np.uint64), np.empty(0, np.uint64), np.empty(0, np.uint64),
        np.array([0]),
    )
    assert b.n == 0


def _group_df(rng, n_terms, max_len, with_positions=False):
    lens = np.clip(rng.zipf(1.5, n_terms), 1, max_len)
    rows = int(lens.sum())
    terms = np.repeat([f"t{i:05d}" for i in range(n_terms)], lens)
    doc_id = np.concatenate(
        [np.sort(rng.choice(10**7, int(l), replace=False)) for l in lens]
    ).astype(np.int64)
    df = pd.DataFrame(
        {
            "doc_id": doc_id,
            "site": rng.choice(["a.com", "b.org"], rows),
            "term": terms,
            "tf": rng.integers(1, 20, rows),
            "doc_len": rng.integers(30, 3000, rows),
            "bucket": 3,
            "salt": 0,
        }
    )
    if with_positions:
        df["positions"] = [bytes(rng.integers(0, 255, 4).astype(np.uint8)) for _ in range(rows)]
    return df


def _encode_group_reference(df, codec="pfor"):
    """The pre-batching per-term construction, kept as the identity oracle."""
    if len(df) == 0:
        return MIXED_SCHEMA.empty_table()
    if (df["term"] == "").any():
        df = df[df["term"] != ""]
        if len(df) == 0:
            return MIXED_SCHEMA.empty_table()
    df = df.sort_values(["term", "doc_id"], kind="stable")
    df = df.drop_duplicates(["term", "doc_id"], keep="first")
    terms = df["term"].to_numpy()
    doc_ids = df["doc_id"].to_numpy().astype(np.uint64)
    tfs = df["tf"].to_numpy().astype(np.uint64)
    dls = df["doc_len"].to_numpy().astype(np.uint64)
    bucket = int(df["bucket"].iloc[0])
    salt = int(df["salt"].iloc[0])
    change = np.nonzero(terms[1:] != terms[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(terms)]))
    pos = df["positions"].to_numpy() if "positions" in df.columns else None
    cols = {name: [] for name in MIXED_SCHEMA.names}
    for s, e in zip(starts, ends):
        enc = encode_postings(doc_ids[s:e], tfs[s:e], dls[s:e], codec=codec)
        if pos is not None:
            blobs = pos[s:e]
            plens = np.fromiter((len(b) for b in blobs), dtype=np.uint32, count=e - s)
            cols["pos_nbytes_blob"].append(plens.tobytes())
            cols["pos_blob"].append(b"".join(blobs))
        else:
            cols["pos_nbytes_blob"].append(b"")
            cols["pos_blob"].append(b"")
        cols["term"].append(terms[s])
        cols["salt"].append(salt)
        cols["bucket"].append(bucket)
        cols["n_docs"].append(enc.n_docs)
        cols["n_blocks"].append(enc.n_blocks)
        cols["b_last_doc"].append(enc.b_last_doc)
        cols["b_max_tf"].append(enc.b_max_tf)
        cols["b_min_dl"].append(enc.b_min_dl)
        cols["b_doc_nbytes"].append(enc.b_doc_nbytes)
        cols["b_tf_nbytes"].append(enc.b_tf_nbytes)
        cols["b_dl_nbytes"].append(enc.b_dl_nbytes)
        cols["docs_blob"].append(enc.docs_blob)
        cols["tfs_blob"].append(enc.tfs_blob)
        cols["dls_blob"].append(enc.dls_blob)
        cols["kind"].append("seg")
        cols["site"].append("")
        cols["df"].append(0)
        cols["codec"].append(enc.codec)
    dfc = df.groupby(["site", "term"], sort=False).size().reset_index(name="df")
    z = b""
    for site, term, cnt in zip(dfc["site"], dfc["term"], dfc["df"]):
        cols["term"].append(term)
        cols["salt"].append(salt)
        cols["bucket"].append(bucket)
        cols["n_docs"].append(0)
        cols["n_blocks"].append(0)
        for c in ("b_last_doc", "b_max_tf", "b_min_dl", "b_doc_nbytes",
                  "b_tf_nbytes", "b_dl_nbytes", "docs_blob", "tfs_blob", "dls_blob",
                  "pos_nbytes_blob", "pos_blob"):
            cols[c].append(z)
        cols["kind"].append("df")
        cols["site"].append(site)
        cols["df"].append(int(cnt))
        cols["codec"].append(codec)
    return pa.table(cols, schema=MIXED_SCHEMA)


@pytest.mark.parametrize("codec", ["pfor", "vb"])
@pytest.mark.parametrize("seed", [0, 1])
def test_encode_group_identical_to_reference(codec, seed):
    rng = np.random.default_rng(seed)
    df = _group_df(rng, 200, 600)  # mix of tail and multi-block terms
    got = encode_group(df.copy(), codec=codec)
    ref = _encode_group_reference(df.copy(), codec=codec)
    assert got.equals(ref)


def test_encode_group_identical_with_positions():
    rng = np.random.default_rng(2)
    df = _group_df(rng, 80, 300, with_positions=True)
    got = encode_group(df.copy(), codec="pfor")
    ref = _encode_group_reference(df.copy(), codec="pfor")
    assert got.equals(ref)


def test_encode_group_identical_markers_and_dups():
    """Empty-doc marker rows and bit-identical duplicate rows still handled."""
    rng = np.random.default_rng(3)
    df = _group_df(rng, 40, 50)
    dup = df.iloc[:5].copy()
    marker = pd.DataFrame(
        {
            "doc_id": [999999], "site": ["a.com"], "term": [""],
            "tf": [0], "doc_len": [0], "bucket": [3], "salt": [0],
        }
    )
    df = pd.concat([df, dup, marker], ignore_index=True)
    got = encode_group(df.copy(), codec="pfor")
    ref = _encode_group_reference(df.copy(), codec="pfor")
    assert got.equals(ref)
