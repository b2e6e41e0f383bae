"""Ranked-search conformance (SURVEY.md §5 items 4-5): rank identity vs the
reference-semantics oracle on the whole query set; WAND ≡ exhaustive BM25."""

import numpy as np
import pytest

from rayindex.oracle import oracle_bm25, oracle_search
from rayindex.fixtures import SITE_URL


def _fmt(rows):
    return [(r["doc_id"], round(r["relevance"], 9)) for r in rows]


def test_rank_identity_all_queries(engine, oracle_index, fixture_corpus):
    for q in fixture_corpus.queries:
        want = oracle_search(oracle_index, q["query"], site=None, k=10)
        got = engine.search(q["query"], site=None, k=10, with_snippets=False)
        assert _fmt(got["data"]) == _fmt(want), q
        # count = intersection size (A6)
        assert got["count"] == len(oracle_search(oracle_index, q["query"], site=None, k=None))


def test_site_restricted_search(engine, oracle_index, fixture_corpus):
    site = "fixture.example"
    for q in fixture_corpus.queries[::5]:
        want = oracle_search(oracle_index, q["query"], site=site, k=10)
        got = engine.search(q["query"], site=site, k=10, with_snippets=False)
        assert _fmt(got["data"]) == _fmt(want), q


def test_site_restricted_bloom_path_identical(
    built_index, oracle_index, fixture_corpus, monkeypatch
):
    """Round-3 bounded site membership: forcing the exact-array cap to 0 makes
    J5 site filtering take the bloom + doc_id-point-verify path — rank, score
    and count identity with the oracle must hold, and the resident structure
    must be bloom-sized, not O(site) ids."""
    from rayindex.query import QueryEngine

    monkeypatch.setattr(QueryEngine, "SITE_EXACT_CAP", 0)
    eng = QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec)
    site = "fixture.example"
    for q in fixture_corpus.queries[::5]:
        want = oracle_search(oracle_index, q["query"], site=site, k=10)
        got = eng.search(q["query"], site=site, k=10, with_snippets=False)
        assert _fmt(got["data"]) == _fmt(want), q
    mem = eng._site_membership(site)
    assert mem.bloom is not None  # bloom path actually engaged
    # ~10 bits/page bloom + verdict caches, far below the 8 B/page id array
    assert mem.nbytes() < 8 * len(mem) + 4096


def test_head_term_cut_by_80pct_rule(engine, fixture_corpus):
    head_form = fixture_corpus.forms[fixture_corpus.lemmas[0]][0]
    got = engine.search(head_form, k=10, with_snippets=False)
    assert got["count"] == 0 and got["data"] == []


def test_unknown_word_is_dropped_not_empty(engine, oracle_index, fixture_corpus):
    """Reference drops unknown lemmas silently (J1, no lemma row)."""
    known = fixture_corpus.forms[fixture_corpus.lemmas[30]][0]
    got = engine.search(f"{known} ыыыыыы", k=10, with_snippets=False)
    want = engine.search(known, k=10, with_snippets=False)
    assert _fmt(got["data"]) == _fmt(want["data"])


def test_wand_equals_exhaustive_on_query_set(engine, fixture_corpus):
    for q in fixture_corpus.queries:
        ex = engine.bm25_exhaustive(q["query"], k=10)
        wd = engine.bm25_wand(q["query"], k=10)
        assert [(d, round(s, 10)) for d, s in ex] == [(d, round(s, 10)) for d, s in wd], q


def test_bm25_matches_oracle(engine, oracle_index, fixture_corpus):
    for q in fixture_corpus.queries[::3]:
        want = [(r["doc_id"], round(r["score"], 8)) for r in oracle_bm25(oracle_index, q["query"])]
        got = [(d, round(s, 8)) for d, s in engine.bm25_exhaustive(q["query"], k=10)]
        assert got == want, q


def test_wand_random_small_k(engine, fixture_corpus):
    rng = np.random.default_rng(5)
    lemmas = fixture_corpus.lemmas
    for _ in range(25):
        n = int(rng.integers(1, 5))
        terms = " ".join(lemmas[int(rng.integers(0, len(lemmas)))] for _ in range(n))
        k = int(rng.integers(1, 8))
        assert engine.bm25_wand(terms, k=k) == engine.bm25_exhaustive(terms, k=k)


def test_snippet_phrase_query(engine, oracle_index, fixture_corpus):
    phrase_q = next(q for q in fixture_corpus.queries if q["query_id"] == 3)
    got = engine.search(phrase_q["query"], k=10, with_snippets=True)
    assert got["count"] > 0
    # the planted verbatim-phrase pages produce bolded snippets; pages where
    # the phrase only occurs inside a longer word fall back (word boundaries)
    assert any("<b>" in r["snippet"] for r in got["data"])
    top = got["data"][0]
    assert top["url"].startswith(SITE_URL)
    assert top["title"]
    assert top["uri"].startswith("/p/")


def test_complete_ranked_topk(engine):
    """complete(prefix, k): (df desc, term asc) total order, k cut, and
    consistency with the full prefix scan."""
    full = engine.prefix_terms("")
    assert len(full) > 3
    prefix = full["term"].iloc[0][0]  # a single-char prefix with matches
    all_matches = full[full["term"].str.startswith(prefix)]
    k = max(1, len(all_matches) - 1)  # force the cut
    got = engine.complete(prefix, k=k)
    assert list(got.columns) == ["rank", "term", "df"]
    assert list(got["rank"]) == list(range(1, len(got) + 1))
    want = all_matches.sort_values(["df", "term"], ascending=[False, True]).head(k)
    assert list(got["term"]) == list(want["term"])
    assert list(got["df"]) == list(want["df"])


def test_search_after_pages_equal_ordered_scan(engine, fixture_corpus):
    """Draining cursor pages reproduces the one-shot (score desc, url asc)
    ordered match set exactly — no dropped / duplicated / reordered rows at
    any page boundary, including boundaries inside a score-tie group."""
    q = next(
        q["query"] for q in fixture_corpus.queries
        if engine.search(q["query"], k=None, with_snippets=False)["count"] > 7
    )
    full = engine.search(q, k=None, with_snippets=False)
    meta = engine.doc_meta([r["doc_id"] for r in full["data"]], columns=["url"])
    want = sorted(
        ((int(r["abs"]), meta[r["doc_id"]]["url"]) for r in full["data"]),
        key=lambda x: (-x[0], x[1]),
    )
    for page_size in (1, 3, len(want)):  # ties split across pages at 1 and 3
        got, after = [], None
        while True:
            df = engine.search_after(q, k=page_size, after=after)
            if df.empty:
                break
            got.extend((int(s), u) for s, u in zip(df["score"], df["url"]))
            if len(df) < page_size:
                break
            after = (int(df["score"].iloc[-1]), str(df["url"].iloc[-1]))
        assert got == want, page_size
    # relevance is normalized by the FULL match-set max on every page
    first = engine.search_after(q, k=2)
    assert list(first["relevance"]) == [s / want[0][0] for s, _u in want[:2]]


def test_search_bool_matches_bruteforce(engine, oracle_index, fixture_corpus):
    """search_bool over `A AND (B OR C) NOT D` (and friends) equals a set-
    algebra brute force over the oracle postings, scores = Σtf of positive
    lemmas, (rel desc, doc_id) order."""
    fx = fixture_corpus
    lems = [l for l in fx.lemmas[20:80] if l in oracle_index.postings][:4]
    assert len(lems) == 4
    a, b, c, d = lems
    fa, fb, fc, fd = (fx.forms[x][0] for x in lems)
    P = oracle_index.postings

    def brute(match_ids, positives):
        scores = {
            doc: sum(P[t].get(doc, 0) for t in positives) for doc in match_ids
        }
        mx = max(scores.values())
        return sorted(
            ((doc, s / mx) for doc, s in scores.items()),
            key=lambda x: (-x[1], x[0]),
        )

    cases = [
        (f"{fa} AND ({fb} OR {fc}) NOT {fd}",
         (set(P[a]) & (set(P[b]) | set(P[c]))) - set(P[d]), [a, b, c]),
        (f"{fa} {fb}", set(P[a]) & set(P[b]), [a, b]),  # implicit AND
        (f"{fa} or {fb} and {fc}",  # case-insensitive; AND binds over OR
         set(P[a]) | (set(P[b]) & set(P[c])), [a, b, c]),
        (f"({fa} OR {fb}) AND ({fc} OR {fd})",
         (set(P[a]) | set(P[b])) & (set(P[c]) | set(P[d])), [a, b, c, d]),
    ]
    for expr, match, positives in cases:
        got = engine.search_bool(expr, k=None)
        assert got["count"] == len(match), expr
        want = brute(match, positives)
        assert [(r["doc_id"], r["relevance"]) for r in got["data"]] == [
            (doc, pytest.approx(rel)) for doc, rel in want
        ], expr
        # k cut is a prefix of the full ranking
        top = engine.search_bool(expr, k=3)
        assert [r["doc_id"] for r in top["data"]] == [
            r["doc_id"] for r in got["data"][:3]
        ]


def test_search_bool_rejects_bad_expressions(engine, fixture_corpus):
    fa = fixture_corpus.forms[fixture_corpus.lemmas[30]][0]
    for bad in (f"NOT {fa}", "", f"({fa}", f"{fa} AND", f"{fa} OR OR {fa}",
                f"NOT NOT {fa} AND {fa}"):
        with pytest.raises(ValueError):
            engine.search_bool(bad, k=5)


def test_search_bool_unknown_words(engine, fixture_corpus):
    fa = fixture_corpus.forms[fixture_corpus.lemmas[30]][0]
    base = engine.search_bool(fa, k=None)
    assert base["count"] > 0
    # NOT over an unknown word excludes nothing
    got = engine.search_bool(f"{fa} NOT zzzzunknownzzz", k=None)
    assert got == base
    # an unknown POSITIVE conjunct empties the conjunction (strict boolean)
    assert engine.search_bool(f"{fa} AND zzzzunknownzzz", k=None)["count"] == 0
    # ... but an unknown OR branch is just the other branch
    assert engine.search_bool(f"{fa} OR zzzzunknownzzz", k=None) == base


def test_explain_matches_search(engine, fixture_corpus):
    """explain() agrees with the scorers it describes: count/max_score match
    search(), kept/cut verdicts match the K3 rule, intersection steps are
    rarest-first and end at the match count."""
    fx = fixture_corpus
    head = fx.forms[fx.lemmas[0]][0]   # cut by the 80% rule
    known = fx.forms[fx.lemmas[30]][0]
    q = f"{known} {head} ыыыыыы"
    ex = engine.explain(q)
    by_reason = {r["reason"] for r in ex["lemmas"]}
    assert by_reason == {"ok", "cutoff_80pct", "unknown"}
    want = engine.search(q, k=None, with_snippets=False)
    assert ex["count"] == want["count"]
    assert ex["max_score"] == max(int(r["abs"]) for r in want["data"])
    assert ex["intersection_order"][-1]["candidates_after"] == ex["count"]
    dfs = [s["postings"] for s in ex["intersection_order"]]
    assert dfs == sorted(dfs) or len(dfs) == 1  # K2 rarest-first
    assert ex["bm25_algorithm"] in ("bulk", "wand")

    none = engine.explain("ыыыыыы")
    assert none["count"] == 0 and none["intersection_order"] == []


def test_wand_tie_heavy_equals_bruteforce():
    """Tie-aware pruning (upper bound == θ skips: ties lose the doc-asc
    tie-break to incumbents, which always carry smaller doc ids because the
    traversal is doc-ascending) must stay exactly equal to brute force on
    corpora built almost entirely of exact score ties."""
    from rayindex.codec import BlockReader, encode_postings
    from rayindex.query import ChainCursor, wand_topk

    rng = np.random.default_rng(3)
    k1, b, avgdl = 1.2, 0.75, 10.0

    def contrib(idf, tf, dl):
        return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    for trial in range(60):
        nterms = int(rng.integers(1, 4))
        entries, parts = [], []
        for _t in range(nterms):
            n = int(rng.integers(1, 2000))
            docs = np.sort(rng.choice(100000, size=n, replace=False).astype(np.uint64))
            tfs = rng.choice([1, 1, 1, 2], size=n).astype(np.uint64)
            dls = rng.choice([10, 10, 20], size=n).astype(np.uint64)
            idf = float(rng.choice([0.5, 1.0, 1.0]))
            entries.append((idf, ChainCursor([BlockReader(encode_postings(docs, tfs, dls))])))
            parts.append((idf, docs, tfs, dls))
        k = int(rng.integers(1, 20))
        got = wand_topk(entries, contrib, k)
        score: dict[int, float] = {}
        for idf, docs, tfs, dls in parts:
            for d, tf, dl in zip(docs.tolist(), tfs.tolist(), dls.tolist()):
                score[d] = score.get(d, 0.0) + contrib(idf, float(tf), float(dl))
        want = [(int(d), float(s)) for d, s in
                sorted(score.items(), key=lambda x: (-x[1], x[0]))[:k]]
        assert got == want, trial
