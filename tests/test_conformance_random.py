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


@pytest.mark.parametrize("seed,n_pages,n_lemmas,buckets", [
    (303, 150, 60, 4),
    (404, 100, 45, 8),
])
def test_random_corpus_round3_ops(ray_session, tmp_path, seed, n_pages, n_lemmas, buckets):
    """search_or / search_not / prefix_terms / facet_sites conformance on
    corpora the round-3 suite never saw."""
    from collections import Counter

    from rayindex.oracle import java_round

    fx = gen_fixture(n_pages=n_pages, n_lemmas=n_lemmas, seed=seed)
    pdir = str(tmp_path / "pages")
    write_pages(fx.pages, pdir, 4)
    out = str(tmp_path / "idx")
    build_index(pdir, out, fx.analyzer_spec, num_buckets=buckets)
    eng = QueryEngine(out, fx.analyzer_spec)
    oidx = build_oracle_index(fx.pages.to_pylist(), make_analyzer(fx.analyzer_spec))

    def or_oracle(query):
        qlemmas = list(oidx.analyzer.collect_lemmas(query).keys())
        df_of = lambda t: sum(v for (s, t2), v in oidx.df.items() if t2 == t)
        pages = oidx.n_docs
        kept = [t for t in qlemmas if df_of(t) > 0
                and java_round(100.0 * df_of(t) / pages) < 80]
        cand = set()
        for t in kept:
            cand |= set(oidx.postings.get(t, {}))
        scored = sorted(
            ((d, sum(oidx.postings[t].get(d, 0) for t in kept)) for d in cand),
            key=lambda x: (-x[1], x[0]),
        )
        return scored

    ex_lemma = fx.lemmas[15]
    ex_form = fx.forms[ex_lemma][0]
    for q in fx.queries[::5]:
        if q["site"] is not None:
            continue
        got = eng.search_or(q["query"], k=None)["data"]
        want = or_oracle(q["query"])
        assert [(r["doc_id"], r["abs"]) for r in got] == [
            (d, float(s)) for d, s in want
        ], q["query"]
        # NOT: base minus exclusion postings
        base = eng.search(q["query"], k=None, with_snippets=False)["data"]
        got_not = eng.search_not(q["query"], ex_form, k=None)["data"]
        ex_docs = set(oidx.postings.get(ex_lemma, {}))
        assert sorted(r["doc_id"] for r in got_not) == sorted(
            r["doc_id"] for r in base if r["doc_id"] not in ex_docs
        ), q["query"]
        # facets: site distribution of the AND candidates
        f = eng.facet_sites(q["query"])
        want_f = Counter(oidx.doc_site[r["doc_id"]] for r in base)
        assert dict(zip(f["site"], f["n"])) == dict(want_f), q["query"]
    # prefix scan ≡ filtered dictionary
    full = eng.term_df_table()
    for prefix in {t[:1] for t in full["term"].head(5)}:
        got_p = eng.prefix_terms(prefix)
        want_p = full[full["term"].str.startswith(prefix)].reset_index(drop=True)
        assert got_p["term"].tolist() == want_p["term"].tolist()
        assert got_p["df"].tolist() == want_p["df"].tolist()
