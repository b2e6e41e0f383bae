"""End-to-end PForDelta build: an index built with codec="pfor" answers every
query identically to the session's varbyte index, and incremental rebuilds
inherit the codec (mirrors the positional-flag inheritance contract)."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pfor_index(ray_session, fixture_corpus, built_index, tmp_path_factory):
    from rayindex.build import build_index

    out_dir = str(tmp_path_factory.mktemp("pfor") / "index")
    metrics = build_index(
        built_index["pages_dir"],
        out_dir,
        fixture_corpus.analyzer_spec,
        num_buckets=8,
        salt_df_threshold=40,
        salt_target=48,
        lemma_batch_size=64,
        codec="pfor",
    )
    return {"out_dir": out_dir, "metrics": metrics}


@pytest.fixture(scope="module")
def pfor_engine(pfor_index, fixture_corpus):
    from rayindex.query import QueryEngine

    return QueryEngine(pfor_index["out_dir"], fixture_corpus.analyzer_spec)


def test_pfor_rank_identical_to_vb(engine, pfor_engine, fixture_corpus):
    qs = [
        " ".join(fixture_corpus.lemmas[i : i + 2]) for i in range(0, 24, 2)
    ] + [fixture_corpus.lemmas[0], fixture_corpus.lemmas[-1]]
    for q in qs:
        assert engine.bm25_topk(q, k=10) == pfor_engine.bm25_topk(q, k=10), q
        assert engine.bm25_wand(q, k=10) == pfor_engine.bm25_wand(q, k=10), q
        assert str(engine.search(q)) == str(pfor_engine.search(q)), q


def test_pfor_postings_decode_equal(built_index, pfor_index, oracle_index):
    """Every term's full posting list decodes identically from both codecs."""
    from rayindex.query import QueryEngine

    vb = QueryEngine(built_index["out_dir"], {"name": "simple"})
    pf = QueryEngine(pfor_index["out_dir"], {"name": "simple"})
    for term in list(oracle_index.postings)[:50]:
        a = vb._decoded(term)
        b = pf._decoded(term)
        for x, y in zip(a, b):
            assert np.array_equal(x, y), term


def test_pfor_segments_tagged(pfor_index):
    import pyarrow.dataset as pads

    seg = pads.dataset(
        os.path.join(pfor_index["out_dir"], "shard=0", "segments"), format="parquet"
    ).to_table(columns=["codec", "kind"])
    kinds = seg.column("kind").to_pylist()
    codecs = seg.column("codec").to_pylist()
    assert all(c == "pfor" for c, k in zip(codecs, kinds) if k == "seg")


def test_delta_rebuild_inherits_codec(ray_session, fixture_corpus, tmp_path):
    from rayindex.build import build_index
    from rayindex.fixtures import write_pages
    from rayindex.incremental import incremental_update

    pages = fixture_corpus.pages
    base_pages = pages.slice(0, 120)
    delta_pages = pages.slice(120, 40)
    pdir = str(tmp_path / "pages_base")
    ddir = str(tmp_path / "pages_delta")
    out = str(tmp_path / "idx")
    write_pages(base_pages, pdir, n_fragments=2)
    write_pages(delta_pages, ddir, n_fragments=2)
    build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4, codec="pfor")
    incremental_update(out, pdir, ddir, fixture_corpus.analyzer_spec)
    with open(os.path.join(out, "shard=0", "stats.json")) as f:
        assert json.load(f).get("codec") == "pfor"
    import pyarrow.dataset as pads

    seg = pads.dataset(
        os.path.join(out, "shard=0", "segments"), format="parquet"
    ).to_table(columns=["codec", "kind"])
    assert all(
        c == "pfor"
        for c, k in zip(seg.column("codec").to_pylist(), seg.column("kind").to_pylist())
        if k == "seg"
    )
