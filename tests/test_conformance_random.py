"""Property-style conformance (SURVEY.md §5 item 5): rank identity and
WAND ≡ exhaustive must hold on corpora the suite's main fixture never saw
(different seeds, sizes, salting configs)."""

import pytest

from rayindex.analyze import make_analyzer
from rayindex.build import build_index
from rayindex.fixtures import gen_fixture, write_pages
from rayindex.oracle import build_oracle_index, oracle_search
from rayindex.query import QueryEngine


@pytest.mark.parametrize("seed,n_pages,n_lemmas,buckets,salt", [
    (101, 120, 50, 4, (30, 16)),
    (202, 90, 35, 8, (1000, 1 << 18)),  # salting effectively off
])
def test_random_corpus_rank_identity(ray_session, tmp_path, seed, n_pages, n_lemmas, buckets, salt):
    fx = gen_fixture(n_pages=n_pages, n_lemmas=n_lemmas, seed=seed)
    pdir = str(tmp_path / "pages")
    write_pages(fx.pages, pdir, 4)
    out = str(tmp_path / "idx")
    build_index(pdir, out, fx.analyzer_spec, num_buckets=buckets,
                salt_df_threshold=salt[0], salt_target=salt[1])
    eng = QueryEngine(out, fx.analyzer_spec)
    oidx = build_oracle_index(fx.pages.to_pylist(), make_analyzer(fx.analyzer_spec))
    assert eng.n_docs == n_pages
    for q in fx.queries[::3]:
        want = oracle_search(oidx, q["query"], k=10)
        got = eng.search(q["query"], k=10, with_snippets=False)
        assert [(r["doc_id"], round(r["relevance"], 9)) for r in got["data"]] == [
            (r["doc_id"], round(r["relevance"], 9)) for r in want
        ], q
        wd = eng.bm25_wand(q["query"], k=10)
        ex = eng.bm25_exhaustive(q["query"], k=10)
        assert [(d, round(s, 10)) for d, s in wd] == [(d, round(s, 10)) for d, s in ex], q


def test_full_size_conformance_corpus(ray_session, tmp_path):
    """FIXTURES.md correctness size: 2,000 pages / 500 lemmas — rank identity
    on a query subset plus WAND equality, through a sharded build."""
    from rayindex.build import build_all

    fx = gen_fixture(n_pages=2000, n_lemmas=500, seed=42)
    pdir = str(tmp_path / "pages")
    write_pages(fx.pages, pdir, 16)
    out = str(tmp_path / "idx")
    build_all(pdir, out, fx.analyzer_spec, num_shards=2, num_buckets=8,
              salt_df_threshold=400, salt_target=256)
    eng = QueryEngine(out, fx.analyzer_spec)
    assert eng.n_docs == 2000
    oidx = build_oracle_index(
        fx.pages.to_pylist(), make_analyzer(fx.analyzer_spec), num_shards=2
    )
    for q in fx.queries[::2]:
        want = oracle_search(oidx, q["query"], k=10)
        got = eng.search(q["query"], k=10, with_snippets=False)
        assert [(r["doc_id"], round(r["relevance"], 9)) for r in got["data"]] == [
            (r["doc_id"], round(r["relevance"], 9)) for r in want
        ], q
    for q in fx.queries[::7]:
        assert eng.bm25_wand(q["query"], k=10) == eng.bm25_exhaustive(q["query"], k=10), q
