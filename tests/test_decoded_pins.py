"""Decoded-posting memory must stay bounded on a long-lived engine.

BlockReader.tail() caches the full three-stream decode on the reader so the
WAND bulk-bail path pays it once; without coordination those pins would
survive the engine's decoded-cache eviction (the readers cache holds 4× more
terms) and grow without bound under a wide query stream.  These tests pin:

- drop_decoded() releases every decoded cache and the next access re-decodes
  to identical arrays;
- QueryEngine keeps at most 2 × DECODED_CACHE_CAP terms' worth of decoded
  pins across BOTH paths (reference scorer + WAND) while results stay
  identical before/after eviction.
"""

import numpy as np

from rayindex.codec import BlockReader, encode_postings
from rayindex.query import QueryEngine


def _reader(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    docs = np.sort(rng.choice(1 << 40, size=n, replace=False).astype(np.uint64))
    tfs = rng.integers(1, 50, size=n).astype(np.uint64)
    dls = rng.integers(10, 500, size=n).astype(np.uint64)
    return BlockReader(encode_postings(docs, tfs, dls)), (docs, tfs, dls)


def test_drop_decoded_releases_and_redecodes_identically():
    br, (docs, tfs, dls) = _reader()
    d0, t0, l0 = br.tail(0)
    assert br._full is not None and br._docs_all is not None
    # per-block cache entries may be views of the full decode
    br.block(0)
    assert br._cache
    br.drop_decoded()
    assert br._full is None and br._docs_all is None and not br._cache
    d1, t1, l1 = br.tail(0)
    assert np.array_equal(d0, d1) and np.array_equal(t0, t1) and np.array_equal(l0, l1)
    assert np.array_equal(br.all_docs(), br.all_docs())  # rebuilt cache works


def _pinned_terms(eng: QueryEngine) -> int:
    n = 0
    for readers in eng._readers_cache.values():
        if any(r._full is not None or r._docs_all is not None for r in readers):
            n += 1
    return n


def test_engine_decoded_pins_bounded(engine, fixture_corpus, monkeypatch):
    monkeypatch.setattr(QueryEngine, "DECODED_CACHE_CAP", 4)
    eng = QueryEngine(engine.index_root, fixture_corpus.analyzer_spec)
    fx = fixture_corpus
    words = [fx.forms[l][0] for l in fx.lemmas[:20]]
    baseline = {}
    for w in words:
        baseline[w] = (eng.search(w, k=5, with_snippets=False)["count"],
                       eng.bm25_wand(w, k=5))
    # both caches are capped at 4 terms; pins may cover the union of the two
    assert len(eng._decoded_cache) <= 4
    assert len(eng._full_pins) <= 4
    assert _pinned_terms(eng) <= 8
    # evicted terms re-decode to identical results
    for w in words:
        assert eng.search(w, k=5, with_snippets=False)["count"] == baseline[w][0]
        assert eng.bm25_wand(w, k=5) == baseline[w][1]


def test_merged_array_readers_bounded_by_decoded_budget(ray_session, tmp_path):
    """Multi-shard merged readers ARE their decoded arrays (ArrayBlockReader:
    drop_decoded frees nothing), so the engine must bound them by the decoded
    budget and evict them from the readers cache entirely — results identical
    after eviction forces a re-merge."""
    from rayindex.build import build_all
    from rayindex.codec import ArrayBlockReader
    from rayindex.fixtures import gen_fixture, write_pages

    fx = gen_fixture(n_pages=60, n_lemmas=40, seed=9)
    pdir = str(tmp_path / "pages")
    write_pages(fx.pages, pdir, 4)
    out = str(tmp_path / "idx")
    build_all(pdir, out, fx.analyzer_spec, num_shards=2, num_buckets=4)
    eng = QueryEngine(out, fx.analyzer_spec)
    eng.DECODED_CACHE_CAP = 3
    terms = sorted({t for q in fx.queries
                    for t in eng.analyzer.collect_lemmas(q["query"])})
    terms = [t for t in terms if eng.term_global_df(t) > 0][:8]
    assert len(terms) >= 5
    first = terms[0]
    before = eng.bm25_topk(first, k=5, algorithm="exhaustive")
    for t in terms:  # churn well past the cap
        eng._cursor(t)
    merged = [t for t, rs in eng._readers_cache.items()
              if rs and isinstance(rs[0], ArrayBlockReader)]
    assert len(eng._merged_terms) <= eng.DECODED_CACHE_CAP
    assert len(merged) <= eng.DECODED_CACHE_CAP
    if first not in eng._readers_cache:  # evicted → re-merge must be identical
        assert eng.bm25_topk(first, k=5, algorithm="exhaustive") == before
