"""Round-3 second-wave curation ops: repetition signals, test-set
decontamination, stratified sampling, PMI collocations — brute-force
semantics checks the SQL hash alone doesn't isolate."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
_NON_ALNUM = re.compile(r"[^a-z0-9]+")


def _toks(text: str) -> list[str]:
    return _NON_ALNUM.sub(" ", text.lower()).split()


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


@pytest.mark.usefixtures("ray_session")
def test_repetition_signals_match_bruteforce():
    from rayindex.textops import repetition_signals

    got = repetition_signals(SF).to_pandas().set_index("doc_id")
    for doc_id, text in list(_docs().items())[::7]:
        w = _toks(text)
        bgs = [f"{a} {b}" for a, b in zip(w, w[1:])]
        tris = [f"{a} {b} {c}" for a, b, c in zip(w, w[1:], w[2:])]
        row = got.loc[doc_id]
        assert row["n_bigrams"] == len(bgs)
        if bgs:
            c = Counter(bgs)
            best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
            assert (row["top_bigram"], row["top_bigram_n"]) == best
        else:
            assert (row["top_bigram"], row["top_bigram_n"]) == ("", 0)
        assert row["dup_trigram_n"] == len(tris) - len(set(tris))


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_flags_exactly_the_overlapping_docs():
    from rayindex.textops import decontaminate

    got = decontaminate(SF, n=5, bench_mod=97).to_pandas().set_index("doc_id")
    docs = _docs()
    bench_grams: set[str] = set()
    for doc_id, text in docs.items():
        if doc_id % 97 == 0:
            w = _toks(text)
            bench_grams |= {" ".join(w[i : i + 5]) for i in range(len(w) - 4)}
    assert bench_grams, "fixture must contain at least one benchmark doc"
    for doc_id, text in docs.items():
        w = _toks(text)
        mine = {" ".join(w[i : i + 5]) for i in range(len(w) - 4)}
        overlap = len(mine & bench_grams)
        assert got.loc[doc_id, "n_overlap"] == overlap, doc_id
        assert got.loc[doc_id, "contaminated"] == int(overlap > 0)
    # benchmark members flag themselves (they share their own n-grams)
    for doc_id in docs:
        if doc_id % 97 == 0 and len(_toks(docs[doc_id])) >= 5:
            assert got.loc[doc_id, "contaminated"] == 1


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_rule_and_determinism():
    from rayindex.textops import stratified_sample

    a = stratified_sample(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = stratified_sample(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)  # deterministic: no RNG, partitioning-independent
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
    kept = set(a["doc_id"])
    for doc_id, lang in zip(t["doc_id"], t["lang"]):
        h = int.from_bytes(hashlib.md5(str(doc_id).encode()).digest()[:8], "little")
        cut = 20 if lang == "en" else 50
        assert (doc_id in kept) == (h % 100 < cut)


@pytest.mark.usefixtures("ray_session")
def test_pmi_matches_bruteforce_counts():
    from rayindex.textops import pmi_bigrams

    got = pmi_bigrams(SF, k=20, min_n=2).to_pandas()
    assert len(got) == 20
    uni: Counter = Counter()
    bg: Counter = Counter()
    for text in _docs().values():
        w = _toks(text)
        uni.update(w)
        bg.update(f"{a} {b}" for a, b in zip(w, w[1:]))
    n1, n2 = sum(uni.values()), sum(bg.values())
    want_top = sorted(
        ((b, n) for b, n in bg.items() if n >= 2), key=lambda kv: (-kv[1], kv[0])
    )[:20]
    assert sorted(zip(got["bigram"], got["n"])) == sorted(want_top)
    for _, row in got.iterrows():
        a, b = row["bigram"].split(" ")
        ratio = (float(row["n"]) * float(n1) * float(n1)) / (
            float(n2) * float(uni[a]) * float(uni[b])
        )
        assert row["pmi"] == math.log(ratio)
        # a collocation that always co-occurs must out-PMI independence
    assert (got["pmi"] > -25).all() and np.isfinite(got["pmi"]).all()
