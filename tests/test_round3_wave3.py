"""Round-3 third-wave ops: MoreLikeThis (related_docs) and the inter-document
duplicated-n-gram fraction — brute-force semantics checks against plain
Python over the fixture (the SQL hash gate checks the same ops at sf0.01)."""

from __future__ import annotations

import re
from collections import Counter

import pytest

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
_NON_ALNUM = re.compile(r"[^a-z0-9]+")
_STOP = {"a", "an", "the", "and", "of", "in", "to", "is", "on", "at", "by", "for", "with"}


def _surface(text: str) -> list[str]:
    return _NON_ALNUM.sub(" ", text.lower()).split()


def _lemmas(text: str) -> list[str]:
    return [w for w in _surface(text) if w not in _STOP]


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


@pytest.mark.usefixtures("ray_session")
def test_related_docs_matches_bruteforce_dot_product():
    from rayindex.textops import related_docs

    docs = _docs()
    qid = 0
    q = Counter(_lemmas(docs[qid]))
    scores = {}
    for doc_id, text in docs.items():
        if doc_id == qid:
            continue
        c = Counter(_lemmas(text))
        s = sum(tfq * c[t] for t, tfq in q.items())
        if s > 0:
            scores[doc_id] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = related_docs(SF, query_doc_id=qid, k=10)
    assert list(zip(got["doc_id"], got["score"])) == want
    assert qid not in set(got["doc_id"])  # the query doc never ranks itself


@pytest.mark.usefixtures("ray_session")
def test_related_docs_missing_query_doc_is_empty():
    from rayindex.textops import related_docs

    got = related_docs(SF, query_doc_id=10**9, k=10)
    assert len(got) == 0
    assert list(got.columns) == ["doc_id", "score"]


@pytest.mark.usefixtures("ray_session")
def test_dup_ngram_fraction_matches_bruteforce():
    from rayindex.textops import dup_ngram_fraction

    docs = _docs()
    n = 2
    per_doc: dict[int, Counter] = {}
    for doc_id, text in docs.items():
        w = _surface(text)
        grams = Counter(" ".join(w[i : i + n]) for i in range(len(w) - n + 1))
        if grams:
            per_doc[doc_id] = grams
    df = Counter()
    for grams in per_doc.values():
        df.update(grams.keys())  # one per containing doc

    got = dup_ngram_fraction(SF, n=n).to_pandas().set_index("doc_id")
    assert set(got.index) == set(per_doc)
    for doc_id, grams in per_doc.items():
        tot = sum(grams.values())
        dup = sum(c for g, c in grams.items() if df[g] > 1)
        row = got.loc[doc_id]
        assert row["n_grams"] == tot
        assert row["n_dup"] == dup
        assert row["dup_frac"] == dup / tot  # one IEEE divide — exact


@pytest.mark.usefixtures("ray_session")
def test_dup_ngram_fraction_bounds():
    from rayindex.textops import dup_ngram_fraction

    got = dup_ngram_fraction(SF, n=2).to_pandas()
    assert ((got["dup_frac"] >= 0) & (got["dup_frac"] <= 1)).all()
    assert (got["n_dup"] <= got["n_grams"]).all()


@pytest.mark.usefixtures("ray_session")
def test_hybrid_rrf_matches_bruteforce_fusion():
    from rayindex.textops import ann_cosine_topk, hybrid_rrf, search_and

    lex = search_and(SF, "table", "spark", k=10)
    sem = ann_cosine_topk(SF, k=10, query_vec_id=0)
    lex_r = {int(d): i + 1 for i, d in enumerate(lex["doc_id"])}
    sem_r = {int(v): int(r) for v, r in zip(sem["vec_id"], sem["rank"])}
    want = {}
    for d in set(lex_r) | set(sem_r):
        want[d] = (1.0 / (60 + lex_r[d]) if d in lex_r else 0.0) + (
            1.0 / (60 + sem_r[d]) if d in sem_r else 0.0
        )
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = hybrid_rrf(SF, "table", "spark", query_vec_id=0, k=10)
    assert list(zip(got["doc_id"], got["rrf"])) == top
    # a doc in BOTH lists outranks equal-rank docs in one list
    both = set(lex_r) & set(sem_r)
    if both:
        assert max(want[d] for d in both) > 1.0 / 61
    assert got["rrf"].is_monotonic_decreasing or len(got) <= 1


def test_suffix_terms_matches_dictionary_scan(engine):
    """*suffix wildcard ≡ a brute-force endswith scan of the dictionary, for
    every distinct last character in the vocabulary plus multi-char and
    no-match probes."""
    dic = engine.term_df_table()
    suffixes = sorted({t[-1] for t in dic["term"]}) + ["le", "zzz~none"]
    for s in suffixes:
        got = engine.suffix_terms(s)
        want = dic[dic["term"].str.endswith(s)].reset_index(drop=True)
        assert got.equals(want), s
    # empty suffix = the whole dictionary
    assert engine.suffix_terms("").equals(dic)


def test_search_synonyms_matches_bruteforce(engine, oracle_index):
    """OR-within-group / AND-across-groups Σtf semantics vs a brute force
    over the oracle's postings (vocabulary sampled so groups really overlap)."""
    import numpy as np

    vocab = sorted(oracle_index.postings)
    cases = [
        [[vocab[0], vocab[1]], [vocab[2], vocab[3]]],
        [[vocab[4]], [vocab[5], vocab[6], vocab[7]]],
        [[vocab[0], vocab[0]], [vocab[1]]],  # duplicate synonym counted once
        [["no-such-term"], [vocab[0]]],  # unmatched group empties the AND
    ]
    for groups in cases:
        want_scores: dict[int, int] = {}
        ok_docs: set[int] | None = None
        for g in groups:
            gdocs: dict[int, int] = {}
            for t in dict.fromkeys(g):
                for d, tf in oracle_index.postings.get(t, {}).items():
                    gdocs[d] = gdocs.get(d, 0) + tf
            ok_docs = set(gdocs) if ok_docs is None else ok_docs & set(gdocs)
            for d, s in gdocs.items():
                want_scores[d] = want_scores.get(d, 0) + s
        assert ok_docs is not None
        got = engine.search_synonyms(groups, k=None)
        if not ok_docs:
            assert got["count"] == 0 and got["data"] == []
            continue
        mx = max(want_scores[d] for d in ok_docs)
        want = sorted(
            ((d, want_scores[d], want_scores[d] / mx) for d in ok_docs),
            key=lambda x: (-x[2], x[0]),
        )
        assert got["count"] == len(ok_docs)
        assert [(r["doc_id"], int(r["abs"]), r["relevance"]) for r in got["data"]] == [
            (d, s, r) for d, s, r in want
        ]


@pytest.mark.usefixtures("ray_session")
def test_events_funnel_matches_bruteforce():
    from rayindex.events import funnel_steps

    t = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    ).to_pandas()
    t = t[t["event_type"].isin(["view", "click", "purchase"])]
    t["us"] = t["ts"].to_numpy("datetime64[us]").astype("int64")
    want = {}
    for uid, g in t.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        cur = (float("-inf"), float("-inf"))
        reached = 0
        for step in ("view", "click", "purchase"):
            hits = g[(g["event_type"] == step)]
            hits = hits[
                (hits["us"] > cur[0])
                | ((hits["us"] == cur[0]) & (hits["event_id"] > cur[1]))
            ]
            if len(hits) == 0:
                break
            first = hits.iloc[0]
            cur = (first["us"], first["event_id"])
            reached += 1
        if reached:
            want[int(uid)] = reached

    got = funnel_steps(SF).to_pandas().set_index("user_id")["reached"].to_dict()
    assert {int(k): int(v) for k, v in got.items()} == want
    assert set(want.values()) <= {1, 2, 3}


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_matches_bruteforce_priorities():
    import hashlib

    import numpy as np

    from rayindex.textops import weighted_sample

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]).to_pandas()
    m = 1 << 20

    def le64(s: str) -> int:
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")

    t["priority"] = [
        (int(w) * m) // ((le64(str(int(d))) % m) + 1)
        for d, w in zip(t["doc_id"], t["n_chars"])
    ]
    want = t.sort_values(["priority", "doc_id"], ascending=[False, True]).head(50)

    got = weighted_sample(SF, k=50)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["priority"].tolist() == want["priority"].tolist()
    # determinism across runs
    again = weighted_sample(SF, k=50)
    assert got.equals(again)
    # size bias sanity: sampled docs skew longer than the corpus median
    assert got["n_chars"].median() >= t["n_chars"].median()
