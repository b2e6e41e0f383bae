"""Round-3 engine extensions (search_or / prefix_terms / search_phrase) and
corpus-curation textops (sample_hash / redact_regex / bigram_counts), verified
against brute force over the fixture corpus and DuckDB."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayindex.oracle import java_round


def _oracle_search_or(idx, query, k=None):
    """Brute-force disjunctive Σtf/max ranking (mirror of oracle_search with
    union instead of progressive intersection)."""
    qlemmas = list(idx.analyzer.collect_lemmas(query).keys())
    df_of = lambda t: sum(v for (s, t2), v in idx.df.items() if t2 == t)
    pages = idx.n_docs
    kept = [t for t in qlemmas if df_of(t) > 0
            and pages and java_round(100.0 * df_of(t) / pages) < 80]
    if not kept:
        return []
    cand: set[int] = set()
    for t in kept:
        cand |= set(idx.postings.get(t, {}))
    scored = [(d, float(sum(idx.postings[t].get(d, 0) for t in kept))) for d in cand]
    mx = max(s for _, s in scored)
    out = [{"doc_id": d, "abs": s, "relevance": s / mx} for d, s in scored]
    out.sort(key=lambda r: (-r["relevance"], r["doc_id"]))
    return out[:k] if k else out


def _norm(s: str) -> str:
    return " ".join(re.sub(r"[\W_]+", " ", s.lower(), flags=re.UNICODE).split())


def test_search_or_matches_bruteforce(engine, oracle_index, fixture_corpus):
    for q in fixture_corpus.queries[::4]:
        if q["site"] is not None:
            continue
        got = engine.search_or(q["query"], k=None)["data"]
        want = _oracle_search_or(oracle_index, q["query"], k=None)
        assert [(r["doc_id"], r["abs"]) for r in got] == [
            (r["doc_id"], r["abs"]) for r in want
        ], q["query"]


def test_search_or_is_superset_of_and(engine, fixture_corpus):
    for q in fixture_corpus.queries[::7]:
        if q["site"] is not None:
            continue
        and_ids = {r["doc_id"] for r in engine.search(q["query"], k=None,
                                                      with_snippets=False)["data"]}
        or_ids = {r["doc_id"] for r in engine.search_or(q["query"], k=None)["data"]}
        assert and_ids <= or_ids


def test_prefix_terms_matches_dictionary(engine):
    full = engine.term_df_table()
    for prefix in ["l", "lem", "zzz-no-such"]:
        got = engine.prefix_terms(prefix)
        want = full[full["term"].str.startswith(prefix)].reset_index(drop=True)
        assert got["term"].tolist() == want["term"].tolist()
        assert got["df"].tolist() == want["df"].tolist()
    # empty prefix degenerates to the full dictionary
    assert engine.prefix_terms("")["term"].tolist() == full["term"].tolist()


def test_search_phrase_verified_against_texts(engine, oracle_index, fixture_corpus):
    """Every conjunctive candidate whose text contains the adjacent phrase is
    returned, and nothing else."""
    # build a phrase that exists AND whose words the analyzer keeps: scan
    # adjacent normalized-token pairs until both map to kept lemmas
    texts = fixture_corpus.pages.column("text").to_pylist()
    phrase = None
    for x in texts[:50]:
        toks = _norm(x).split()
        for i in range(len(toks) - 1):
            cand_phrase = f"{toks[i]} {toks[i + 1]}"
            if len(engine._query_terms(cand_phrase, None)) == 2:
                phrase = cand_phrase
                break
        if phrase:
            break
    assert phrase, "no analyzer-known adjacent pair found in fixture texts"
    res = engine.search_phrase(phrase, k=None)
    and_res = engine.search(phrase, k=None, with_snippets=False)["data"]
    needle = f" {_norm(phrase)} "
    want_ids = sorted(
        r["doc_id"] for r in and_res
        if needle in f" {_norm(oracle_index.doc_text[r['doc_id']])} "
    )
    got_ids = sorted(r["doc_id"] for r in res["data"])
    assert got_ids == want_ids
    assert res["count"] == len(want_ids)
    assert got_ids, "fixture phrase should have at least one verified match"
    # relevance renormalized over the verified set
    assert max(r["relevance"] for r in res["data"]) == 1.0


def test_search_phrase_all_filtered_returns_empty(engine, fixture_corpus):
    """A pair that co-occurs in docs but never adjacently → count 0."""
    texts = fixture_corpus.pages.column("text").to_pylist()
    toks = next(t for t in (_norm(x).split() for x in texts) if len(t) >= 6)
    # reversed adjacency is (almost surely) absent; verify the claim first
    phrase = f"{toks[4]} {toks[3]}"
    needle = f" {phrase} "
    present = any(needle in f" {_norm(t)} " for t in texts)
    if present:
        pytest.skip("reversed bigram happens to occur in the fixture")
    res = engine.search_phrase(phrase, k=None)
    assert res["count"] == 0 and res["data"] == []


def test_search_phrase_single_word_degenerates(engine, fixture_corpus):
    q = next(q for q in fixture_corpus.queries if q["site"] is None)
    word = q["query"].split()[0]
    got = engine.search_phrase(word, k=10)["data"]
    want = engine.search(word, k=10, with_snippets=False)["data"]
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]


@pytest.fixture(scope="module")
def curation_sf(tmp_path_factory):
    root = tmp_path_factory.mktemp("curation_sf")
    rng = np.random.default_rng(9)
    vocab = ["alpha", "beta", "gamma", "delta", "run", "stop", "go", "x9"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(2, 20))))
        + f" num{int(rng.integers(0, 50))} 123"
        for _ in range(60)
    ]
    texts[7] = "x"  # single-token doc → no bigrams
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(100, 160)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array([f"s{i % 3}" for i in range(60)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(root / "documents.parquet"))
    return str(root)


def test_sample_hash_deterministic_rule(ray_session, curation_sf):
    import duckdb

    from rayindex.textops import sample_hash

    got = sample_hash(curation_sf, rate_pct=30).to_pandas()
    want = duckdb.sql(
        f"SELECT doc_id, source, n_chars FROM read_parquet('{curation_sf}/documents.parquet') "
        "WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 < 30"
    ).fetchdf()
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    # deterministic: second run identical
    again = sample_hash(curation_sf, rate_pct=30).to_pandas()
    assert sorted(again["doc_id"]) == sorted(got["doc_id"])


def test_redact_regex_vs_duckdb(ray_session, curation_sf):
    import duckdb

    from rayindex.textops import redact_regex

    got = redact_regex(curation_sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        "SELECT doc_id, CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_hits, "
        "CAST(length(regexp_replace(text, '[0-9]+', '<num>', 'g')) AS BIGINT) AS n_chars_redacted, "
        "md5(regexp_replace(text, '[0-9]+', '<num>', 'g')) AS redacted_fp "
        f"FROM read_parquet('{curation_sf}/documents.parquet') ORDER BY doc_id"
    ).fetchdf()
    assert got["n_hits"].tolist() == want["n_hits"].tolist()
    assert got["n_chars_redacted"].tolist() == want["n_chars_redacted"].tolist()
    assert got["redacted_fp"].tolist() == want["redacted_fp"].tolist()
    assert int(got["n_hits"].sum()) > 0


def test_bigram_counts_vs_duckdb(ray_session, curation_sf):
    import duckdb

    from rayindex.textops import bigram_counts

    got = bigram_counts(curation_sf, k=20).to_pandas()
    want = duckdb.sql(
        "WITH toks AS (SELECT list_filter(string_split_regex(trim("
        "regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g')), ' +'), x -> x <> '') AS l "
        f"FROM read_parquet('{curation_sf}/documents.parquet')), "
        "bg AS (SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram "
        "FROM toks WHERE len(l) >= 2) "
        "SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM bg "
        "GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20"
    ).fetchdf()
    assert got["bigram"].tolist() == want["bigram"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_round3_ops_on_sharded_index(ray_session, tmp_path):
    """search_or / prefix_terms / search_phrase through a 2-shard build:
    shard-merged postings and dictionaries must agree with brute force."""
    from rayindex.build import build_all
    from rayindex.fixtures import gen_fixture, write_pages
    from rayindex.analyze import make_analyzer
    from rayindex.oracle import build_oracle_index
    from rayindex.query import QueryEngine

    fx = gen_fixture(n_pages=300, n_lemmas=120, seed=7)
    pdir = str(tmp_path / "pages")
    write_pages(fx.pages, pdir, 8)
    out = str(tmp_path / "idx")
    build_all(pdir, out, fx.analyzer_spec, num_shards=2, num_buckets=4)
    eng = QueryEngine(out, fx.analyzer_spec)
    oidx = build_oracle_index(
        fx.pages.to_pylist(), make_analyzer(fx.analyzer_spec), num_shards=2
    )
    for q in fx.queries[::6]:
        if q["site"] is not None:
            continue
        got = eng.search_or(q["query"], k=None)["data"]
        want = _oracle_search_or(oidx, q["query"], k=None)
        assert [(r["doc_id"], r["abs"]) for r in got] == [
            (r["doc_id"], r["abs"]) for r in want
        ], q["query"]
    full = eng.term_df_table()
    for prefix in [full["term"].iloc[0][:2], "zz-none"]:
        got = eng.prefix_terms(prefix)
        want = full[full["term"].str.startswith(prefix)].reset_index(drop=True)
        assert got["term"].tolist() == want["term"].tolist()
        assert got["df"].tolist() == want["df"].tolist()
    # phrase over the sharded index: verified set matches brute force
    texts = fx.pages.column("text").to_pylist()
    phrase = None
    for x in texts[:50]:
        toks = _norm(x).split()
        for i in range(len(toks) - 1):
            p = f"{toks[i]} {toks[i + 1]}"
            if len(eng._query_terms(p, None)) == 2:
                phrase = p
                break
        if phrase:
            break
    assert phrase
    needle = f" {phrase} "
    res = eng.search_phrase(phrase, k=None)
    want_ids = sorted(
        d for d, t in oidx.doc_text.items() if needle in f" {_norm(t)} "
        and d in {r["doc_id"] for r in eng.search(phrase, k=None, with_snippets=False)["data"]}
    )
    assert sorted(r["doc_id"] for r in res["data"]) == want_ids
    assert want_ids


def test_facet_sites_matches_bruteforce(engine, oracle_index, fixture_corpus):
    from rayindex.oracle import oracle_search

    checked = 0
    for q in fixture_corpus.queries[::5]:
        if q["site"] is not None:
            continue
        got = engine.facet_sites(q["query"])
        want_rows = oracle_search(oracle_index, q["query"], k=None)
        from collections import Counter

        want = Counter(oracle_index.doc_site[r["doc_id"]] for r in want_rows)
        assert dict(zip(got["site"], got["n"])) == dict(want), q["query"]
        checked += 1
    assert checked


def test_export_postings_roundtrip(engine, built_index, oracle_index):
    """export_postings over the built index reproduces the oracle's exploded
    (url, term, tf) postings exactly — dataset-level codec round-trip."""
    from rayindex.segments import export_postings

    got = (
        export_postings(built_index["out_dir"])
        .to_pandas()
        .sort_values(["url", "term"])
        .reset_index(drop=True)
    )
    rows = [
        {"url": oracle_index.doc_url[d], "term": t, "tf": tf}
        for t, posts in oracle_index.postings.items()
        for d, tf in posts.items()
    ]
    import pandas as pd

    want = pd.DataFrame(rows).sort_values(["url", "term"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert got["url"].tolist() == want["url"].tolist()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["tf"].tolist() == want["tf"].tolist()


def test_tfidf_vs_duckdb(ray_session, curation_sf):
    import duckdb

    from rayindex.textops import tfidf

    got = tfidf(curation_sf).to_pandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
    want = duckdb.sql(
        "WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(regexp_replace("
        f"lower(text), '[^a-z0-9]', ' ', 'g')), ' +')) AS term FROM read_parquet('{curation_sf}/documents.parquet')), "
        "t AS (SELECT doc_id, term FROM toks WHERE term <> '' AND term NOT IN "
        "('a','an','the','and','of','in','to','is','on','at','by','for','with')), "
        "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, term), "
        "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term) "
        "SELECT tf.doc_id, tf.term, tf.tf, CAST(tf.tf AS DOUBLE) * "
        f"ln(CAST((SELECT count(*) FROM read_parquet('{curation_sf}/documents.parquet')) AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf "
        "FROM tf JOIN df USING (term) ORDER BY doc_id, term"
    ).fetchdf()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["term"].tolist() == want["term"].tolist()
    # bit-exact float mirror (math.log per distinct df == DuckDB ln)
    assert got["tfidf"].tolist() == want["tfidf"].tolist()


def test_curate_corpus_composition(ray_session, curation_sf, tmp_path):
    """dedup winners ∧ length gate ∧ md5 sample, plus the partitioned sink."""
    import duckdb

    from rayindex.textops import curate_corpus

    out = str(tmp_path / "curated")
    got = curate_corpus(curation_sf, min_chars=30, rate_pct=60, out_dir=out).to_pandas()
    want = duckdb.sql(
        f"SELECT d.doc_id, d.source, d.n_chars FROM read_parquet('{curation_sf}/documents.parquet') d "
        f"JOIN (SELECT CAST(min(doc_id) AS BIGINT) AS doc_id FROM read_parquet('{curation_sf}/documents.parquet') GROUP BY text) w "
        "USING (doc_id) WHERE d.n_chars >= 30 "
        "AND md5_number_upper(CAST(d.doc_id AS VARCHAR)) % 100 < 60"
    ).fetchdf()
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    # partitioned sink wrote one dir per source with the same rows
    import pyarrow.dataset as pads

    sunk = pads.dataset(out, format="parquet", partitioning="hive").to_table()
    assert sorted(sunk.column("doc_id").to_pylist()) == sorted(got["doc_id"])


def test_export_postings_honors_purge(ray_session, fixture_corpus, tmp_path):
    """export after purge_site ≡ export of a physical rebuild without the
    purged site (U2 consistency extends to the export operator)."""
    import pyarrow as pa

    from rayindex.build import build_index
    from rayindex.fixtures import write_pages
    from rayindex.incremental import purge_site
    from rayindex.segments import export_postings

    pages = fixture_corpus.pages.slice(0, 50)
    urls = pages.column("url").to_pylist()
    urls2 = [
        u.replace("fixture.example", "other.example") if i % 2 else u
        for i, u in enumerate(urls)
    ]
    pages2 = pages.set_column(0, "url", pa.array(urls2, pa.string()))
    pdir = str(tmp_path / "pages")
    write_pages(pages2, pdir, 4)

    out_a = str(tmp_path / "idx_purged")
    build_index(pdir, out_a, fixture_corpus.analyzer_spec, num_buckets=4)
    purge_site(out_a, "other.example")
    out_b = str(tmp_path / "idx_clean")
    build_index(pdir, out_b, fixture_corpus.analyzer_spec, num_buckets=4,
                exclude_sites=["other.example"])

    key = ["url", "term"]
    got = export_postings(out_a).to_pandas().sort_values(key).reset_index(drop=True)
    want = export_postings(out_b).to_pandas().sort_values(key).reset_index(drop=True)
    assert got["url"].tolist() == want["url"].tolist()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["tf"].tolist() == want["tf"].tolist()
    assert not any(u.startswith("https://other.example") for u in got["url"])


def test_search_not_excludes_exactly(engine, oracle_index, fixture_corpus):
    qs = [q for q in fixture_corpus.queries if q["site"] is None][:6]
    # excluded word: a mid-frequency lemma's surface form
    ex_lemma = fixture_corpus.lemmas[20]
    ex_form = fixture_corpus.forms[ex_lemma][0]
    checked = 0
    for q in qs:
        base = engine.search(q["query"], k=None, with_snippets=False)["data"]
        got = engine.search_not(q["query"], ex_form, k=None)["data"]
        ex_docs = set(oracle_index.postings.get(ex_lemma, {}))
        want_ids = sorted(r["doc_id"] for r in base if r["doc_id"] not in ex_docs)
        assert sorted(r["doc_id"] for r in got) == want_ids, q["query"]
        if got:
            assert max(r["relevance"] for r in got) == 1.0
        if len(want_ids) != len(base):
            checked += 1
    assert checked, "exclusion never fired — pick a more frequent lemma"


def test_search_not_unknown_exclusion_is_noop(engine, fixture_corpus):
    q = next(q for q in fixture_corpus.queries if q["site"] is None)
    base = engine.search(q["query"], k=None, with_snippets=False)["data"]
    got = engine.search_not(q["query"], "zzzunknownword", k=None)["data"]
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in base]


def test_top_terms_per_site_vs_duckdb(ray_session, curation_sf):
    import duckdb

    from rayindex.textops import top_terms_per_site

    got = (
        top_terms_per_site(curation_sf, k=3)
        .to_pandas()
        .sort_values(["site", "rank"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "WITH toks AS (SELECT doc_id, source AS site, unnest(string_split_regex(trim("
        f"regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g')), ' +')) AS term FROM read_parquet('{curation_sf}/documents.parquet')), "
        "t AS (SELECT doc_id, site, term FROM toks WHERE term <> '' AND term NOT IN "
        "('a','an','the','and','of','in','to','is','on','at','by','for','with')), "
        "std AS (SELECT site, term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM t GROUP BY site, term), "
        "r AS (SELECT site, term, df, row_number() OVER (PARTITION BY site ORDER BY df DESC, term) AS rank FROM std) "
        "SELECT site, CAST(rank AS BIGINT) AS rank, term, df FROM r WHERE rank <= 3 ORDER BY site, rank"
    ).fetchdf()
    assert got["site"].tolist() == want["site"].tolist()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["df"].tolist() == want["df"].tolist()
    assert got["rank"].tolist() == want["rank"].tolist()


# --- fuzzy dictionary lookup (SymSpell deletion neighborhood) ---------------


def test_levenshtein_dp_matches_bruteforce():
    import itertools

    from rayindex.query import QueryEngine

    def ref(a, b):
        # classic O(len(a)*len(b)) DP, scalar reference
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    words = ["", "a", "ab", "scan", "scna", "scant", "can", "sian", "table", "77", "777", "17"]
    for a, b in itertools.product(words, repeat=2):
        assert QueryEngine._levenshtein(a, b) == ref(a, b), (a, b)


def test_fuzzy_terms_equals_vocabulary_scan(engine):
    from rayindex.query import QueryEngine

    dic = engine.term_df_table()
    for w in ["scan", "tabel", "xyzzy", "77"]:
        got = engine.fuzzy_terms(w)
        mask = dic["term"].map(lambda t: QueryEngine._levenshtein(w, t) <= 1)
        want = dic[mask].sort_values("term").reset_index(drop=True)[["term", "df"]]
        assert got.equals(want), w


def test_fuzzy_terms_includes_exact_word_and_respects_df(engine):
    dic = engine.term_df_table()
    w = dic["term"].iloc[len(dic) // 2]
    got = engine.fuzzy_terms(w)
    assert w in set(got["term"])  # distance 0
    row = got[got["term"] == w].iloc[0]
    assert row["df"] == int(dic[dic["term"] == w]["df"].iloc[0])


# --- did-you-mean spell correction (suggest / search_corrected) -------------


def test_suggest_matches_bruteforce(engine):
    from rayindex.query import QueryEngine

    dic = engine.term_df_table()
    known = dic["term"].iloc[len(dic) // 3]
    # a 1-edit misspelling of a dictionary term that is NOT itself a term
    base = max(dic.itertuples(), key=lambda r: (r.df, r.term)).term
    missp = base + "q"
    assert missp not in set(dic["term"])
    query = f"{known} {missp} zzzzqq"
    got = engine.suggest(query)
    for _, row in got.iterrows():
        w = row["word"]
        in_dic = dic[dic["term"] == w]
        if len(in_dic):
            assert row["corrected"] == w
            assert row["df"] == int(in_dic["df"].iloc[0])
        else:
            mask = dic["term"].map(lambda t: QueryEngine._levenshtein(w, t) <= 1)
            cand = dic[mask]
            if len(cand):
                best = cand.sort_values(["df", "term"],
                                        ascending=[False, True]).iloc[0]
                assert row["corrected"] == best["term"], w
                assert row["df"] == int(best["df"])
            else:
                assert row["corrected"] == w and row["df"] == 0
    assert got["word"].tolist() == sorted(set(got["word"]))


def test_search_corrected_equals_search_on_corrected_query(engine):
    dic = engine.term_df_table()
    a = dic["term"].iloc[len(dic) // 4]
    b = dic["term"].iloc[len(dic) // 2]
    misspelled = f"{a}q {b}"
    out = engine.search_corrected(misspelled, k=None)
    sug = engine.suggest(misspelled)
    mapping = dict(zip(sug["word"], sug["corrected"]))
    toks = [t for t, _ in engine.analyzer.lemma_positions(misspelled)]
    corrected = " ".join(mapping.get(t, t) for t in toks)
    assert out["corrected_query"] == corrected
    want = engine.search(corrected, k=None)
    assert [(r["doc_id"], r["abs"]) for r in out["data"]] == [
        (r["doc_id"], r["abs"]) for r in want["data"]
    ]


def test_search_corrected_known_query_unchanged(engine, fixture_corpus):
    q = next(x["query"] for x in fixture_corpus.queries if x["site"] is None)
    out = engine.search_corrected(q, k=None)
    toks = [t for t, _ in engine.analyzer.lemma_positions(q)]
    # every analyzed token of a real fixture query may not be in the dict
    # (cutoff-independent): only assert tokens WITH df>0 survive unchanged
    for t in toks:
        if engine.term_global_df(t) > 0:
            assert f" {t} " in f" {out['corrected_query']} "


# --- collapsed / dated / boosted search + date facets ------------------------


def _drained(engine, query):
    """Full (url, score) match set of the reference scorer as a DataFrame."""
    import pandas as pd

    res = engine.search(query, k=None, with_snippets=False)
    ids = [r["doc_id"] for r in res["data"]]
    meta = engine.doc_meta(ids, columns=["url"])
    return pd.DataFrame(
        {
            "doc_id": ids,
            "url": [meta[d]["url"] for d in ids],
            "score": [int(r["abs"]) for r in res["data"]],
        }
    )


def _ts_us_of(engine, ids):
    import pandas as pd

    meta = engine.doc_meta(list(ids), columns=["warc_ts"])
    return {d: int(pd.Timestamp(m["warc_ts"]).value // 1000) for d, m in meta.items()}


@pytest.fixture(scope="module")
def collapse_query(engine, fixture_corpus):
    for q in fixture_corpus.queries:
        if q["site"] is None and engine.search(q["query"], k=None)["count"] >= 5:
            return q["query"]
    raise AssertionError("no query with >=5 matches in fixture")


def test_search_collapsed_bruteforce(engine, collapse_query):
    got = engine.search_collapsed(collapse_query, per_site=2)
    d = _drained(engine, collapse_query)
    d["site"] = d["url"].str.extract(r"^[a-z][a-z0-9+.-]*://([^/]+)", expand=False)
    mx = d["score"].max()
    d = d.sort_values(["score", "url"], ascending=[False, True], kind="stable")
    d = d[d.groupby("site").cumcount() < 2].reset_index(drop=True)
    assert got["url"].tolist() == d["url"].tolist()
    assert got["score"].tolist() == d["score"].tolist()
    assert got["rank"].tolist() == list(range(1, len(d) + 1))
    assert got["relevance"].tolist() == [s / mx for s in d["score"]]


def test_search_collapsed_per_site_cap(engine, collapse_query):
    got = engine.search_collapsed(collapse_query, per_site=1)
    assert got["site"].is_unique
    # the survivor per site is that site's (score desc, url asc) winner
    full = engine.search_collapsed(collapse_query, per_site=10**9)
    for site, grp in full.groupby("site"):
        w = grp.sort_values(["score", "url"], ascending=[False, True]).iloc[0]
        mine = got[got["site"] == site].iloc[0]
        assert (mine["url"], mine["score"]) == (w["url"], w["score"])


def test_search_dated_window_bruteforce(engine, collapse_query):
    epoch = 1_577_836_800_000_000
    lo, hi = epoch + 50 * 1_000_000, epoch + 150 * 1_000_000
    got = engine.search_dated(collapse_query, ts_from=lo, ts_to=hi)
    d = _drained(engine, collapse_query)
    ts = _ts_us_of(engine, d["doc_id"])
    d["ts"] = d["doc_id"].map(ts)
    d = d[(d["ts"] >= lo) & (d["ts"] < hi)]
    d = d.sort_values(["score", "url"], ascending=[False, True],
                      kind="stable").reset_index(drop=True)
    assert got["url"].tolist() == d["url"].tolist()
    assert got["ts"].tolist() == d["ts"].tolist()
    assert got["score"].tolist() == d["score"].tolist()
    if len(d):
        mx = d["score"].max()
        assert got["relevance"].tolist() == [s / mx for s in d["score"]]
    # the window is a strict subset of the fixture's stamp range → non-trivial
    assert 0 < len(got) < engine.search(collapse_query, k=None)["count"]


def test_search_dated_unbounded_equals_search(engine, collapse_query):
    got = engine.search_dated(collapse_query)
    assert len(got) == engine.search(collapse_query, k=None)["count"]


def test_facet_dates_histogram_bruteforce(engine, collapse_query):
    gran = 30_000_000
    got = engine.facet_dates(collapse_query, granularity_us=gran)
    d = _drained(engine, collapse_query)
    ts = _ts_us_of(engine, d["doc_id"])
    want = {}
    for t in ts.values():
        b = (t // gran) * gran
        want[b] = want.get(b, 0) + 1
    assert dict(zip(got["bucket"], got["n"])) == want
    assert int(got["n"].sum()) == len(d)
    assert got["bucket"].is_monotonic_increasing


def test_search_boosted_bruteforce(engine, collapse_query):
    boost = 5
    got = engine.search_boosted(collapse_query, title_boost=boost)
    d = _drained(engine, collapse_query)
    kept = {t for t, _df in engine._query_terms(collapse_query, None)}
    meta = engine.doc_meta([int(x) for x in d["doc_id"]], columns=["title"])
    def btf(did):
        tf = engine.analyzer.collect_lemmas(meta[did]["title"] or "")
        return sum(n for t, n in tf.items() if t in kept)
    d["score"] = d["score"] + boost * d["doc_id"].map(btf)
    d = d.sort_values(["score", "url"], ascending=[False, True],
                      kind="stable").reset_index(drop=True)
    assert got["url"].tolist() == d["url"].tolist()
    assert got["score"].tolist() == d["score"].tolist()
    mx = d["score"].max()
    assert got["relevance"].tolist() == [s / mx for s in d["score"]]


def test_search_boosted_zero_boost_is_base_order(engine, collapse_query):
    got = engine.search_boosted(collapse_query, title_boost=0)
    base = _drained(engine, collapse_query).sort_values(
        ["score", "url"], ascending=[False, True], kind="stable")
    assert got["url"].tolist() == base["url"].tolist()
    assert got["score"].tolist() == base["score"].tolist()


# --- bigram language-model quality score (lm_score) --------------------------


def test_lm_score_bruteforce(ray_session, curation_sf):
    import math

    import duckdb

    from rayindex.textops import lm_score

    got = lm_score(curation_sf).to_pandas().set_index("doc_id").sort_index()
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{curation_sf}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    toks = {d: re.sub(r"[^a-z0-9]+", " ", t.lower()).split() for d, t in texts}
    vocab = len({w for ws in toks.values() for w in ws})
    cb: dict[str, int] = {}
    cu: dict[str, int] = {}
    per_doc: dict[int, dict[str, int]] = {}
    for d, ws in toks.items():
        g = {}
        for a, b in zip(ws, ws[1:]):
            bg = f"{a} {b}"
            g[bg] = g.get(bg, 0) + 1
            cb[bg] = cb.get(bg, 0) + 1
            cu[a] = cu.get(a, 0) + 1
        if g:
            per_doc[d] = g
    assert set(got.index) == set(per_doc)  # <2-token docs emit no row
    for d, g in per_doc.items():
        s = 0.0
        for bg in sorted(g):
            w1 = bg.split(" ", 1)[0]
            s += float(g[bg]) * math.log((cb[bg] + 1) / (cu[w1] + vocab))
        nb = sum(g.values())
        row = got.loc[d]
        assert int(row["n_bigrams"]) == nb
        assert row["logp_sum"] == s, d  # bit-exact sequential sum
        assert row["avg_logp"] == s / nb


def test_lm_score_ranks_repetitive_text_higher(ray_session, tmp_path):
    """A doc made of the corpus's most common bigram scores higher (less
    surprising) than a doc of unique gibberish bigrams."""
    import pyarrow.parquet as pq_

    from rayindex.textops import lm_score

    texts = ["the cat sat on the mat"] * 20 + ["zq xv qj kp wy bn"]
    docs = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    pq_.write_table(docs, str(tmp_path / "documents.parquet"))
    got = lm_score(str(tmp_path)).to_pandas().set_index("doc_id")
    assert got.loc[0, "avg_logp"] > got.loc[20, "avg_logp"]


# --- wildcard glob lookup / doc-store regex grep / next-word suggestion -----


def test_wildcard_terms_matches_fnmatch(engine):
    import fnmatch

    dic = engine.term_df_table()
    t = dic["term"].iloc[len(dic) // 2]
    patterns = [
        t[:2] + "*", "*" + t[-2:], t[0] + "*" + t[-1], "*" + t[2:4] + "*",
        t, "zz*qq*zz",
    ]
    for p in patterns:
        got = engine.wildcard_terms(p)
        want = dic[[fnmatch.fnmatchcase(x, p) for x in dic["term"]]]
        want = want.sort_values("term").reset_index(drop=True)
        assert got["term"].tolist() == want["term"].tolist(), p
        assert got["df"].tolist() == want["df"].tolist(), p
    # the anchored patterns above must actually match something
    assert len(engine.wildcard_terms(t[:2] + "*"))


def test_scan_regex_matches_bruteforce(ray_session, built_index, fixture_corpus):
    from rayindex.segments import scan_regex

    got = (
        scan_regex(built_index["out_dir"], "[0-9]{8}")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pages = fixture_corpus.pages
    want = {}
    for url, text in zip(
        pages.column("url").to_pylist(), pages.column("text").to_pylist()
    ):
        n = len(re.findall(r"[0-9]{8}", text))
        if n:
            want[url] = n
    assert dict(zip(got["url"], got["n_hits"])) == want
    assert len(got)  # titles carry 8-digit page numbers → non-trivial


def test_next_words_matches_bruteforce(ray_session, curation_sf):
    import duckdb

    from rayindex.textops import next_words

    texts = [
        t
        for (t,) in duckdb.sql(
            f"SELECT text FROM read_parquet('{curation_sf}/documents.parquet')"
        ).fetchall()
    ]
    counts: dict[str, int] = {}
    for x in texts:
        ws = re.sub(r"[^a-z0-9]+", " ", x.lower()).split()
        for a, b in zip(ws, ws[1:]):
            if a == "run":
                counts[b] = counts.get(b, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = next_words(curation_sf, "run", k=10).to_pandas()
    assert list(zip(got["w2"], got["n"])) == want
    assert got["rank"].tolist() == list(range(1, len(want) + 1))


def test_doc_term_vector_bruteforce(engine, fixture_corpus):
    texts = fixture_corpus.pages.column("text").to_pylist()
    urls = fixture_corpus.pages.column("url").to_pylist()
    from rayindex.schema import doc_ids_for_urls

    for i in (3, 17):
        did = int(doc_ids_for_urls([urls[i]])[0])
        got = engine.doc_term_vector(did)
        want: dict[str, int] = {}
        cleaned = engine.analyzer._strip_re.sub(" ", texts[i].lower()).strip()
        for w in engine.analyzer._split_re.split(cleaned):
            if w and w not in engine.analyzer.particles:
                lem = engine.analyzer.lemma_map.get(w, w)
                want[lem] = want.get(lem, 0) + 1
        assert dict(zip(got["term"], got["tf"])) == want
        assert got["term"].is_monotonic_increasing
    # unknown id → empty typed frame
    assert len(engine.doc_term_vector(12345)) == 0


def test_hard_negatives_bruteforce(ray_session):
    import duckdb

    from rayindex.textops import hard_negatives

    sf = "/root/testdata/sf0.001"
    got = hard_negatives(sf, query_doc_id=0, n_lexical=50, k=10)
    want = duckdb.sql(f"""
        WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(regexp_replace(
            lower(text), '[^a-z0-9]', ' ', 'g')), ' +')) AS term
            FROM read_parquet('{sf}/documents.parquet')),
        t AS (SELECT doc_id, term FROM toks WHERE term <> '' AND term NOT IN
            ('a','an','the','and','of','in','to','is','on','at','by','for','with')),
        tfd AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
        q AS (SELECT term, tf AS tfq FROM tfd WHERE doc_id = 0),
        s AS (SELECT tfd.doc_id, CAST(sum(tfd.tf * q.tfq) AS BIGINT) AS lex_score
            FROM tfd JOIN q USING (term) WHERE tfd.doc_id <> 0 GROUP BY tfd.doc_id),
        lex AS (SELECT doc_id, lex_score FROM (SELECT s.*, row_number() OVER
            (ORDER BY lex_score DESC, doc_id) AS lr FROM s) WHERE lr <= 50),
        e AS (SELECT * FROM read_parquet('{sf}/embeddings.parquet')),
        c AS (SELECT lex.doc_id, lex.lex_score, list_cosine_similarity(e.embedding,
            (SELECT embedding FROM e WHERE vec_id = 0)) AS cos
            FROM lex JOIN e ON e.vec_id = lex.doc_id)
        SELECT doc_id, lex_score FROM c ORDER BY cos ASC, doc_id LIMIT 10
    """).fetchdf()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["lex_score"].tolist() == want["lex_score"].tolist()
    assert got["rank"].tolist() == list(range(1, len(want) + 1))
    # hard negatives are lexically similar: every row carries a positive score
    assert (got["lex_score"] > 0).all()


def test_chunk_docs_bruteforce(ray_session, curation_sf):
    import duckdb

    from rayindex.textops import chunk_docs

    size, overlap = 7, 3
    stride = size - overlap
    got = (
        chunk_docs(curation_sf, size=size, overlap=overlap)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{curation_sf}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    want = []
    for did, x in texts:
        ws = re.sub(r"[^a-z0-9]+", " ", x.lower()).split()
        n = len(ws)
        if n == 0:
            continue
        i = 0
        while True:
            s = i * stride
            e = min(s + size, n)
            want.append((did, i, s, e - s, " ".join(ws[s:e])))
            if e >= n:
                break
            i += 1
    assert list(map(tuple, got.values)) == want
    # multi-chunk docs exist and windows overlap by `overlap` tokens
    multi = got[got["chunk_id"] > 0]
    assert len(multi)
    assert (multi["start"].to_numpy() % stride == 0).all()


def test_chunk_docs_rejects_bad_window(ray_session, curation_sf):
    from rayindex.textops import chunk_docs

    with pytest.raises(ValueError):
        chunk_docs(curation_sf, size=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_docs(curation_sf, size=0, overlap=0)


def test_pack_sequences_bruteforce(ray_session, curation_sf):
    import duckdb

    from rayindex.textops import pack_sequences

    budget = 20
    got = (
        pack_sequences(curation_sf, budget=budget)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM read_parquet('{curation_sf}/documents.parquet') "
        "ORDER BY source, doc_id"
    ).fetchall()
    want = []
    state: dict[str, tuple[int, int]] = {}
    for did, src, text in rows:
        n = len(re.sub(r"[^a-z0-9]+", " ", text.lower()).split())
        if src not in state:
            seq, fill = 0, n
        else:
            seq, fill = state[src]
            if fill + n <= budget:
                fill += n
            else:
                seq, fill = seq + 1, n
        state[src] = (seq, fill)
        want.append((src, did, n, seq, fill))
    assert list(map(tuple, got.values)) == want
    # the budget is never exceeded EXCEPT by single oversized docs
    over = got[got["seq_fill"] > budget]
    assert (over["n_tokens"] > budget).all()
    assert got.groupby(["source", "seq_id"]).size().gt(0).all()


def test_pack_sequences_rejects_bad_budget(ray_session, curation_sf):
    from rayindex.textops import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(curation_sf, budget=0)


def test_winnow_fingerprints_bruteforce(ray_session, curation_sf):
    import duckdb
    import hashlib

    from rayindex.textops import winnow_fingerprints

    k, w = 3, 4
    got = winnow_fingerprints(curation_sf, k=k, w=w).to_pandas()
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{curation_sf}/documents.parquet')"
    ).fetchall()
    want: set[tuple[int, int]] = set()
    for did, x in texts:
        ws = re.sub(r"[^a-z0-9]+", " ", x.lower()).split()
        grams = [" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)]
        if not grams:
            continue
        hs = [int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
              for g in grams]
        if len(hs) >= w:
            mins = {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}
        else:
            mins = {min(hs)}
        want |= {(did, m - (1 << 63)) for m in mins}
    assert set(map(tuple, got[["doc_id", "fp"]].values)) == want


def test_winnow_shared_run_guarantee(ray_session, tmp_path):
    """Two docs sharing a run of >= w+k-1 tokens must share a fingerprint."""
    import pyarrow.parquet as pq_

    from rayindex.textops import winnow_fingerprints

    shared = "one two three four five six seven"  # 7 tokens = w+k-1 at 3/4... k+w-1=6
    docs = pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()),
         "text": pa.array([f"alpha beta {shared} gamma",
                           f"zz qq {shared} yy ww xx"], pa.string())}
    )
    pq_.write_table(docs, str(tmp_path / "documents.parquet"))
    got = winnow_fingerprints(str(tmp_path), k=3, w=4).to_pandas()
    a = set(got[got["doc_id"] == 0]["fp"])
    b = set(got[got["doc_id"] == 1]["fp"])
    assert a & b


def test_curate_corpus_near_drops_planted_near_dups(ray_session, tmp_path):
    import hashlib

    import pyarrow.parquet as pq_

    from rayindex.textops import curate_corpus_near

    rng = np.random.default_rng(11)
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    texts, sources = [], []
    for i in range(30):
        if i in (5, 6, 7):
            texts.append(base)  # identical shingle sets → same LSH buckets
        else:
            # DISTINCT token streams: no shared shingles with anything else
            texts.append(" ".join(f"w{i}x{int(v)}" for v in rng.integers(0, 9, 24)))
        sources.append(f"s{i % 2}")
    docs = pa.table(
        {"doc_id": pa.array(range(30), pa.int64()),
         "text": pa.array(texts, pa.string()),
         "source": pa.array(sources, pa.string()),
         "n_chars": pa.array([len(t) for t in texts], pa.int64())}
    )
    pq_.write_table(docs, str(tmp_path / "documents.parquet"))
    got = curate_corpus_near(str(tmp_path), min_chars=10, rate_pct=100).to_pandas()
    kept = set(got["doc_id"])
    # exactly one of the identical trio survives: the min doc_id; every
    # distinct-stream doc survives untouched
    assert kept == {i for i in range(30) if i not in (6, 7)}
    # the md5 sample rule at rate 40 is a strict deterministic subset
    s40 = curate_corpus_near(str(tmp_path), min_chars=10, rate_pct=40).to_pandas()
    rule = {d for d in kept
            if int.from_bytes(hashlib.md5(str(d).encode()).digest()[:8], "little") % 100 < 40}
    assert set(s40["doc_id"]) == rule


def test_retention_cohorts_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq_

    from rayindex.events import retention_cohorts

    us = 1_000_000
    p = 10 * 60 * us
    rows = [  # (user, period_index): u1 cohort 0 active 0/1/3; u2 cohort 1 active 1; u3 cohort 0 active 0
        (1, 0), (1, 0), (1, 1), (1, 3), (2, 1), (3, 0),
    ]
    ev = pa.table(
        {"event_id": pa.array(range(len(rows)), pa.int64()),
         "ts": pa.array([r[1] * p + 123 for r in rows], pa.timestamp("us")),
         "user_id": pa.array([r[0] for r in rows], pa.int64()),
         "event_type": pa.array(["click"] * len(rows), pa.string()),
         "value": pa.array([1.0] * len(rows), pa.float64()),
         "props": pa.array(["{}"] * len(rows), pa.string())}
    )
    pq_.write_table(ev, str(tmp_path / "events.parquet"))
    got = retention_cohorts(str(tmp_path), period_minutes=10).to_pandas()
    got = {(int(r.cohort_ts), int(r.period_offset)): int(r.n_users)
           for r in got.itertuples()}
    assert got == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (p, 0): 1}


def test_blocklist_hits_bruteforce(ray_session, curation_sf):
    import duckdb

    from rayindex.textops import blocklist_hits

    words = ("alpha", "run")
    got = blocklist_hits(curation_sf, words).to_pandas()
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{curation_sf}/documents.parquet')"
    ).fetchall()
    want = {}
    for did, x in texts:
        n = sum(1 for t in re.sub(r"[^a-z0-9]+", " ", x.lower()).split() if t in words)
        if n:
            want[did] = n
    assert dict(zip(got["doc_id"], got["n_hits"])) == want
    assert want  # the gate must actually fire on this corpus


def test_oov_rate_bruteforce(ray_session, curation_sf):
    import duckdb

    from rayindex.textops import oov_rate

    k = 5
    got = oov_rate(curation_sf, vocab_k=k).to_pandas().set_index("doc_id")
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{curation_sf}/documents.parquet')"
    ).fetchall()
    counts: dict[str, int] = {}
    docs_toks = {}
    for did, x in texts:
        ws = re.sub(r"[^a-z0-9]+", " ", x.lower()).split()
        docs_toks[did] = ws
        for t in ws:
            counts[t] = counts.get(t, 0) + 1
    vocab = {t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]}
    for did, ws in docs_toks.items():
        if not ws:
            assert did not in got.index
            continue
        oov = sum(1 for t in ws if t not in vocab)
        row = got.loc[did]
        assert int(row["n_tokens"]) == len(ws)
        assert int(row["n_oov"]) == oov
        assert row["oov_rate"] == oov / len(ws)


def test_source_overlap_planted_leak(ray_session, tmp_path):
    import pyarrow.parquet as pq_

    from rayindex.textops import source_overlap

    shared = "leak one two three four five six"
    rng = np.random.default_rng(3)
    texts, sources = [], []
    for i in range(12):
        if i in (0, 6):  # one doc in s0 and one in s1 share a long run
            texts.append(f"pre{i} {shared} post{i}")
        else:
            texts.append(" ".join(f"t{i}x{int(v)}" for v in rng.integers(0, 9, 12)))
        sources.append("s0" if i < 6 else "s1")
    docs = pa.table(
        {"doc_id": pa.array(range(12), pa.int64()),
         "text": pa.array(texts, pa.string()),
         "source": pa.array(sources, pa.string())}
    )
    pq_.write_table(docs, str(tmp_path / "documents.parquet"))
    got = source_overlap(str(tmp_path)).to_pandas()
    row = got[(got["source_a"] == "s0") & (got["source_b"] == "s1")]
    assert len(row) == 1 and int(row["n_shared_fps"].iloc[0]) >= 1


def test_rate_anomalies_planted_spike(ray_session, tmp_path):
    import math

    import pyarrow.parquet as pq_

    from rayindex.events import rate_anomalies

    us = 1_000_000
    w = 5 * 60 * us
    # type 'a': 9 quiet windows of 2 events + one spike window of 30
    rows = []
    for win in range(10):
        cnt = 30 if win == 9 else 2
        for j in range(cnt):
            rows.append((win * w + j, "a"))
    # type 'b': constant rate → zero variance → never flagged
    for win in range(10):
        rows.append((win * w, "b"))
    ev = pa.table(
        {"event_id": pa.array(range(len(rows)), pa.int64()),
         "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
         "user_id": pa.array([1] * len(rows), pa.int64()),
         "event_type": pa.array([r[1] for r in rows], pa.string()),
         "value": pa.array([0.0] * len(rows), pa.float64()),
         "props": pa.array(["{}"] * len(rows), pa.string())}
    )
    pq_.write_table(ev, str(tmp_path / "events.parquet"))
    got = rate_anomalies(str(tmp_path), window_minutes=5, z_thresh=2.0).to_pandas()
    assert set(got["event_type"]) == {"a"}
    assert got["window_start"].tolist() == [9 * w]
    n = np.array([2] * 9 + [30], dtype=np.float64)
    z = (30 - n.mean()) / math.sqrt(((10 * (n * n).sum() - n.sum() ** 2) / 100))
    assert got["z"].iloc[0] == z


def test_index_stats_matches_oracle_index(ray_session, built_index, oracle_index):
    from rayindex.segments import index_stats

    s = index_stats(built_index["out_dir"])
    want_terms = len({t for (_site, t) in oracle_index.df.keys()})
    want_postings = sum(len(d) for d in oracle_index.postings.values())
    assert s["n_terms"] == want_terms
    assert s["n_postings"] == want_postings
