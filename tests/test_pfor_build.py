"""Cross-codec identity: the session index (default codec, PForDelta since
round 3) answers every query identically to an index built with the legacy
delta+varbyte codec, and incremental rebuilds inherit a non-default codec
(mirrors the positional-flag inheritance contract)."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def vb_index(ray_session, fixture_corpus, built_index, tmp_path_factory):
    from rayindex.build import build_index

    out_dir = str(tmp_path_factory.mktemp("vb") / "index")
    metrics = build_index(
        built_index["pages_dir"],
        out_dir,
        fixture_corpus.analyzer_spec,
        num_buckets=8,
        salt_df_threshold=40,
        salt_target=48,
        lemma_batch_size=64,
        codec="vb",
    )
    return {"out_dir": out_dir, "metrics": metrics}


@pytest.fixture(scope="module")
def vb_engine(vb_index, fixture_corpus):
    from rayindex.query import QueryEngine

    return QueryEngine(vb_index["out_dir"], fixture_corpus.analyzer_spec)


def test_pfor_rank_identical_to_vb(engine, vb_engine, fixture_corpus):
    qs = [
        " ".join(fixture_corpus.lemmas[i : i + 2]) for i in range(0, 24, 2)
    ] + [fixture_corpus.lemmas[0], fixture_corpus.lemmas[-1]]
    for q in qs:
        assert engine.bm25_topk(q, k=10) == vb_engine.bm25_topk(q, k=10), q
        assert engine.bm25_wand(q, k=10) == vb_engine.bm25_wand(q, k=10), q
        assert str(engine.search(q)) == str(vb_engine.search(q)), q


def test_pfor_postings_decode_equal(built_index, vb_index, oracle_index):
    """Every term's full posting list decodes identically from both codecs."""
    from rayindex.query import QueryEngine

    pf = QueryEngine(built_index["out_dir"], {"name": "simple"})
    vb = QueryEngine(vb_index["out_dir"], {"name": "simple"})
    for term in list(oracle_index.postings)[:50]:
        a = vb._decoded(term)
        b = pf._decoded(term)
        for x, y in zip(a, b):
            assert np.array_equal(x, y), term


def _seg_codecs(out_dir: str) -> list[str]:
    import pyarrow.dataset as pads

    seg = pads.dataset(
        os.path.join(out_dir, "shard=0", "segments"), format="parquet"
    ).to_table(columns=["codec", "kind"])
    return [
        c
        for c, k in zip(seg.column("codec").to_pylist(), seg.column("kind").to_pylist())
        if k == "seg"
    ]


def test_default_segments_tagged_pfor(built_index):
    codecs = _seg_codecs(built_index["out_dir"])
    assert codecs and all(c == "pfor" for c in codecs)


def test_vb_segments_tagged_vb(vb_index):
    codecs = _seg_codecs(vb_index["out_dir"])
    assert codecs and all(c == "vb" for c in codecs)


def test_delta_rebuild_inherits_codec(ray_session, fixture_corpus, tmp_path):
    """A delta rebuild inherits the base index's NON-default codec — default
    fallback would silently re-encode the delta under pfor."""
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
    build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4, codec="vb")
    incremental_update(out, pdir, ddir, fixture_corpus.analyzer_spec)
    with open(os.path.join(out, "shard=0", "stats.json")) as f:
        assert json.load(f).get("codec") == "vb"
    assert all(c == "vb" for c in _seg_codecs(out))
