"""Index integrity audit (rayindex/audit.py): a healthy index yields zero
violations; every class of on-disk corruption is detected with the right
check name; the df cross-check catches dictionary drift."""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _first_seg_file(index_dir: str) -> str:
    files = sorted(
        glob.glob(os.path.join(index_dir, "shard=*", "segments", "bucket=*", "*.parquet"))
    )
    assert files
    return files[0]


def _tamper(path: str, fn) -> str:
    """Rewrite one parquet file after applying ``fn(cols, i)`` to the first
    non-empty seg row; returns that row's term."""
    t = pq.read_table(path)
    cols = {c: t.column(c).to_pylist() for c in t.schema.names}
    for i, k in enumerate(cols["kind"]):
        if k == "seg" and cols["n_docs"][i] > 0:
            fn(cols, i)
            term = cols["term"][i]
            break
    else:
        raise AssertionError("no non-empty seg row in file")
    pq.write_table(pa.table(cols, schema=t.schema), path)
    return term


@pytest.fixture()
def index_copy(built_index, tmp_path):
    dst = str(tmp_path / "idx")
    shutil.copytree(built_index["out_dir"], dst)
    return dst


def test_audit_healthy_index_is_clean(ray_session, built_index):
    from rayindex.audit import audit_index

    v = audit_index(built_index["out_dir"])
    assert len(v) == 0, v.to_string()


def test_audit_detects_block_metadata_corruption(ray_session, index_copy):
    from rayindex.audit import audit_index

    def bump_max_tf(cols, i):
        a = np.frombuffer(cols["b_max_tf"][i], np.uint32).copy()
        a[0] += 7
        cols["b_max_tf"][i] = a.tobytes()

    term = _tamper(_first_seg_file(index_copy), bump_max_tf)
    v = audit_index(index_copy, check_df=False)
    assert (v["check"] == "block_max_tf").any()
    assert (v.loc[v["check"] == "block_max_tf", "term"] == term).any()


def test_audit_detects_truncated_blob(ray_session, index_copy):
    from rayindex.audit import audit_index

    def truncate(cols, i):
        cols["docs_blob"][i] = cols["docs_blob"][i][:-1]

    _tamper(_first_seg_file(index_copy), truncate)
    v = audit_index(index_copy, check_df=False)
    assert set(v["check"]) & {"decode", "stream_len", "docs_sorted",
                              "block_last_doc"}


def test_audit_detects_count_mismatch(ray_session, index_copy):
    from rayindex.audit import audit_index

    def wrong_count(cols, i):
        cols["n_docs"][i] += 1  # n_blocks no longer matches ceil(n/128) or
        # the decoded stream length

    _tamper(_first_seg_file(index_copy), wrong_count)
    v = audit_index(index_copy, check_df=False)
    assert set(v["check"]) & {"n_blocks", "stream_len", "decode"}


def test_audit_df_crosscheck(ray_session, index_copy):
    from rayindex.audit import audit_index

    f = sorted(glob.glob(os.path.join(index_copy, "shard=*", "term_df", "*.parquet")))[0]
    t = pq.read_table(f)
    cols = {c: t.column(c).to_pylist() for c in t.schema.names}
    cols["df"][0] += 1
    drifted = cols["term"][0]
    pq.write_table(pa.table(cols, schema=t.schema), f)
    v = audit_index(index_copy)
    bad = v[v["check"] == "df_crosscheck"]
    assert len(bad) == 1 and bad["term"].iloc[0] == drifted


def test_audit_positional_index_clean(ray_session, fixture_corpus, tmp_path):
    from rayindex.audit import audit_index
    from rayindex.build import build_index
    from rayindex.fixtures import write_pages

    pdir = str(tmp_path / "p")
    idir = str(tmp_path / "i")
    write_pages(fixture_corpus.pages.slice(0, 80), pdir, n_fragments=2)
    build_index(pdir, idir, fixture_corpus.analyzer_spec, num_buckets=4,
                positions=True)
    v = audit_index(idir)
    assert len(v) == 0, v.to_string()


def test_audit_survives_corrupt_pos_sidecar(ray_session, fixture_corpus, tmp_path):
    """A pos_nbytes_blob whose length is not a whole uint32 array must be
    REPORTED, not crash the audit run (the fsck has to survive exactly the
    bit-rot it exists to find)."""
    from rayindex.audit import audit_index
    from rayindex.build import build_index
    from rayindex.fixtures import write_pages

    pdir = str(tmp_path / "p")
    idir = str(tmp_path / "i")
    write_pages(fixture_corpus.pages.slice(0, 80), pdir, n_fragments=2)
    build_index(pdir, idir, fixture_corpus.analyzer_spec, num_buckets=4,
                positions=True)

    def truncate_pos_lens(cols, i):
        cols["pos_nbytes_blob"][i] = cols["pos_nbytes_blob"][i][:-1]

    term = _tamper(_first_seg_file(idir), truncate_pos_lens)
    v = audit_index(idir, check_df=False)  # must not raise
    bad = v[v["check"] == "pos_sidecar_len"]
    assert len(bad) and (bad["term"] == term).any()
