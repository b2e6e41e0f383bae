"""Regressions for the round-3 self-review findings: empty-shard flag
carry-through, merged-stats codec inheritance, MinHasher null text, serving
empty-schema / bm25 k=None contract, fuzzy_terms radius guard, docs-only
decode path."""

from __future__ import annotations

import json
import os
from urllib.parse import urlparse

import numpy as np
import pyarrow as pa
import pytest


def _all_sites(pages: pa.Table) -> list[str]:
    return sorted({urlparse(u).netloc for u in pages.column("url").to_pylist()})


def test_drained_shard_keeps_positions_and_codec(ray_session, fixture_corpus, tmp_path):
    """A shard drained by exclude_sites must still record positions/codec in
    stats.json — QueryEngine.has_positions is an all() over shards and
    _inherit_positions reads these keys, so a flagless empty shard silently
    downgraded the whole index."""
    from rayindex.build import build_index
    from rayindex.fixtures import write_pages
    from rayindex.query import QueryEngine

    pdir = str(tmp_path / "pages")
    out = str(tmp_path / "idx")
    write_pages(fixture_corpus.pages, pdir, n_fragments=2)
    build_index(
        pdir, out, fixture_corpus.analyzer_spec, num_buckets=4,
        positions=True, exclude_sites=_all_sites(fixture_corpus.pages),
    )
    with open(os.path.join(out, "shard=0", "stats.json")) as f:
        stats = json.load(f)
    assert stats["n_docs"] == 0
    assert stats["positions"] is True
    assert stats["codec"] == "pfor"
    eng = QueryEngine(out, fixture_corpus.analyzer_spec)
    assert eng.has_positions is True


def test_empty_input_stats_carry_flags(ray_session, fixture_corpus, tmp_path):
    """Zero-page input: same flag carry-through on the all-empty path."""
    import pyarrow.parquet as pq

    from rayindex.build import build_index
    from rayindex.schema import PAGES_SCHEMA

    pdir = str(tmp_path / "pages")
    os.makedirs(pdir)
    pq.write_table(PAGES_SCHEMA.empty_table(), os.path.join(pdir, "p.parquet"))
    out = str(tmp_path / "idx")
    build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4,
                positions=True, codec="vb")
    with open(os.path.join(out, "shard=0", "stats.json")) as f:
        stats = json.load(f)
    assert stats["positions"] is True and stats["codec"] == "vb"


def test_merged_stats_record_codec(ray_session, fixture_corpus, tmp_path):
    """Post-merge delta/compact rebuilds inherit the codec via stats.json —
    a merged index without the key re-encoded future deltas under vb."""
    from rayindex.build import build_index
    from rayindex.fixtures import write_pages
    from rayindex.merge import merge_indexes

    pages = fixture_corpus.pages
    dirs = []
    for i, sl in enumerate((pages.slice(0, 100), pages.slice(100, 100))):
        pdir = str(tmp_path / f"pages{i}")
        out = str(tmp_path / f"idx{i}")
        write_pages(sl, pdir, n_fragments=2)
        build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4)
        dirs.append(out)
    merged = str(tmp_path / "merged")
    merge_indexes(dirs, merged, fixture_corpus.analyzer_spec)
    with open(os.path.join(merged, "shard=0", "stats.json")) as f:
        assert json.load(f)["codec"] == "pfor"


def test_minhash_null_text_is_empty_doc():
    """A null text row must emit no bands, not crash the batch."""
    from rayindex.textops import MinHasher

    mh = MinHasher(shingle=3)
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha beta gamma delta", None, "x"], pa.string()),
    })
    out = mh(batch)
    ids = set(out.column("doc_id").to_pylist())
    assert 1 in ids and 2 not in ids and 3 not in ids


def test_service_empty_result_keeps_snippet_schema(ray_session, built_index, fixture_corpus):
    from rayindex.serve import SNIPPET_SCHEMA, SearchService

    svc = SearchService(built_index["out_dir"], fixture_corpus.analyzer_spec,
                        num_replicas=1, with_snippets=True)
    try:
        t = svc.search_many(["xyzzynotaword"])
        assert t.schema.equals(SNIPPET_SCHEMA)
        assert t.num_rows == 0
    finally:
        svc.shutdown()


def test_replica_bm25_k_none_returns_all_hits(ray_session, built_index, fixture_corpus):
    """scorer='bm25' with k=None honors the 'all hits' contract instead of
    silently capping at 10."""
    from rayindex.query import QueryEngine
    from rayindex.serve import SearchReplica

    fx = fixture_corpus
    q = fx.forms[fx.lemmas[0]][0]
    eng = QueryEngine(built_index["out_dir"], fx.analyzer_spec)
    want = eng.bm25_topk(q, k=None, algorithm="exhaustive")
    assert len(want) > 10  # the corpus makes this a meaningful case
    rep = SearchReplica(built_index["out_dir"], fx.analyzer_spec,
                        k=None, scorer="bm25")
    out = rep(pa.table({"query": pa.array([q], pa.string())}))
    assert out.num_rows == len(want)


def test_fuzzy_terms_rejects_radius_above_one(engine):
    with pytest.raises(ValueError, match="max_edits=1"):
        engine.fuzzy_terms("anything", max_edits=2)


@pytest.mark.parametrize("codec", ["vb", "pfor"])
def test_all_docs_matches_full_decode(codec):
    """Docs-only stream decode (positions hot path) ≡ the three-stream
    reference decode, across block boundaries."""
    from rayindex.codec import BlockReader, decode_postings, encode_postings

    rng = np.random.default_rng(7)
    for n in (1, 127, 128, 129, 1000, 4096):
        docs = np.cumsum(rng.integers(1, 1 << 20, n, dtype=np.uint64))
        tfs = rng.integers(1, 100, n, dtype=np.uint64)
        dls = rng.integers(1, 5000, n, dtype=np.uint64)
        enc = encode_postings(docs, tfs, dls, codec=codec)
        br = BlockReader(enc)
        got = br.all_docs()
        assert np.array_equal(got, decode_postings(enc)[0]), (codec, n)
        # cached second call returns the same array
        assert br.all_docs() is got
