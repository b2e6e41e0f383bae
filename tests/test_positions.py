"""Positional postings (positions=True builds): analyzer position layer,
codec roundtrip, and positional-phrase ≡ doc-store-verify equivalence."""

from __future__ import annotations

import re

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _brute_positions(analyzer, text: str) -> dict[str, list[int]]:
    """lemma → word positions, particles consuming a slot (scalar mirror of
    the vectorized positional layer)."""
    cleaned = analyzer._strip_re.sub(" ", text.lower()).strip()
    out: dict[str, list[int]] = {}
    if not cleaned:
        return out
    pos = 0
    for w in analyzer._split_re.split(cleaned):
        if not w:
            continue
        if w not in analyzer.particles:
            out.setdefault(analyzer.lemma_map.get(w, w), []).append(pos)
        pos += 1
    return out


def test_lemmatize_arrow_positions_match_bruteforce():
    import pyarrow as pa

    from rayindex.analyze import Analyzer, simple_analyzer
    from rayindex.codec import varbyte_decode

    texts = [
        "the quick brown fox the quick fox",
        "",
        "  padded   spaces  and the end ",
        "repeat repeat repeat",
        "a the of in",  # all particles
        "mixed 42 tokens 42 and punctuation!!! 42",
    ]
    for an in (simple_analyzer(), Analyzer(lemma_map={"quick": "fast"}, particles={"the"}, keep="a-z0-9")):
        rows, terms, tfs, blobs = an.lemmatize_arrow(pa.array(texts, pa.string()), with_positions=True)
        got: dict[tuple[int, str], list[int]] = {}
        for r, t, tf, b in zip(rows, terms.to_pylist(), tfs, blobs):
            pos = np.cumsum(varbyte_decode(b, int(tf))).tolist()
            got[(int(r), t)] = pos
        want: dict[tuple[int, str], list[int]] = {}
        for i, txt in enumerate(texts):
            for lemma, ps in _brute_positions(an, txt).items():
                want[(i, lemma)] = ps
        assert got == want


@pytest.fixture(scope="session")
def pos_index(ray_session, tmp_path_factory):
    """Positional bench index over the sf0.001-seeded pages."""
    from rayindex.pipelines import SIMPLE_SPEC, bench_pages
    from rayindex.build import build_index
    from rayindex.query import QueryEngine

    root = tmp_path_factory.mktemp("pos_index")
    pages = bench_pages(SF, repeat=1)
    out = str(root / "index")
    build_index(pages, out, SIMPLE_SPEC, num_buckets=8, salt_df_threshold=200,
                salt_target=128, positions=True)
    eng = QueryEngine(out, SIMPLE_SPEC)
    assert eng.has_positions
    return eng


def test_positional_phrase_equals_docstore_verify(pos_index):
    from rayindex.pipelines import PHRASE_QUERIES

    extra = ["slow query window", "window table", "table table", "merge xyzzynotaword",
             "customer join order", "key agg row"]
    for q in PHRASE_QUERIES + extra:
        a = pos_index.search_phrase(q, k=None)
        b = pos_index.search_phrase_positional(q, k=None)
        assert a["count"] == b["count"], q
        assert [(r["doc_id"], r["abs"]) for r in a["data"]] == [
            (r["doc_id"], r["abs"]) for r in b["data"]
        ], q


def test_positional_phrase_positions_content(pos_index):
    # pick a verified phrase result and check the positions against the text
    from rayindex.pipelines import PHRASE_QUERIES

    checked = 0
    for q in PHRASE_QUERIES:
        res = pos_index.search_phrase_positional(q, k=3)
        if not res["data"]:
            continue
        seq = pos_index.analyzer.lemma_positions(q)
        meta = pos_index.doc_meta([r["doc_id"] for r in res["data"]])
        for r in res["data"]:
            words = re.sub(r"[^a-z0-9]+", " ", meta[r["doc_id"]]["text"].lower()).split()
            pm = pos_index._positions_for(seq[0][0], np.array([r["doc_id"]], dtype=np.uint64))
            for p in pm[r["doc_id"]]:
                assert words[int(p)] == seq[0][0]
            checked += 1
    assert checked > 0


def test_fallback_without_positions(engine):
    # a non-positional engine serves the positional API via the doc-store path
    assert not engine.has_positions
    for q in ["phrase query", "зима лето"]:
        a = engine.search_phrase(q, k=None)
        b = engine.search_phrase_positional(q, k=None)
        assert a["count"] == b["count"]


def test_min_span_bruteforce():
    import itertools
    import random

    from rayindex.query import QueryEngine

    rng = random.Random(7)
    for _ in range(200):
        m = rng.randint(2, 4)
        lists = [
            np.unique(np.array([rng.randint(0, 30) for _ in range(rng.randint(1, 6))],
                               dtype=np.uint64))
            for _ in range(m)
        ]
        got = QueryEngine._min_span(lists)
        want = min(
            max(c) - min(c) for c in itertools.product(*[l.tolist() for l in lists])
        )
        assert got == int(want)


def test_search_near_matches_bruteforce(pos_index):
    from rayindex.pipelines import NEAR_QUERIES, NEAR_SLOP

    for q in NEAR_QUERIES + ["slow fast", "table window scan"]:
        got = pos_index.search_near(q, slop=NEAR_SLOP, k=None)
        base = pos_index.search(q, k=None, with_snippets=False)
        lemmas = list(dict.fromkeys(t for t, _ in pos_index.analyzer.lemma_positions(q)))
        meta = pos_index.doc_meta([r["doc_id"] for r in base["data"]])
        want_ids = []
        for r in base["data"]:
            words = re.sub(r"[^a-z0-9]+", " ", meta[r["doc_id"]]["text"].lower()).split()
            pls = [
                np.array([i for i, w in enumerate(words) if w == t], dtype=np.uint64)
                for t in lemmas
            ]
            if all(p.size for p in pls) and pos_index._min_span(pls) <= NEAR_SLOP:
                want_ids.append(r["doc_id"])
        assert sorted(r["doc_id"] for r in got["data"]) == sorted(want_ids), q


def test_phrase_results_subset_of_near(pos_index):
    from rayindex.pipelines import PHRASE_QUERIES

    for q in PHRASE_QUERIES:
        ph = {r["doc_id"] for r in pos_index.search_phrase_positional(q, k=None)["data"]}
        nr = {r["doc_id"] for r in pos_index.search_near(q, slop=1, k=None)["data"]}
        assert ph <= nr, q


def test_search_near_requires_positions(engine):
    with pytest.raises(RuntimeError):
        engine.search_near("slow query")


def test_incremental_update_inherits_positions(pos_index, tmp_path):
    """A delta rebuild of a positional index stays positional (and the
    positional phrase path still agrees with the doc-store verify)."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq_

    from rayindex.incremental import incremental_update
    from rayindex.pipelines import SIMPLE_SPEC, bench_pages
    from rayindex.query import QueryEngine

    src_index = pos_index.shard_dirs[0].rsplit("/shard=", 1)[0]
    index_dir = str(tmp_path / "index")
    shutil.copytree(src_index, index_dir)
    pages = bench_pages(SF, repeat=1)
    # delta: re-index the first 5 pages with modified html
    frag = next(f"{pages}/{f}" for f in sorted(os.listdir(pages)) if f.endswith(".parquet"))
    t = pq_.read_table(frag).slice(0, 5)
    htmls = [h.replace(b"</body>", b" freshword</body>") if b"</body>" in h else h + b" freshword"
             for h in t.column("html").to_pylist()]
    delta = t.set_column(t.schema.get_field_index("html"), "html", pa.array(htmls, pa.binary()))
    delta_dir = str(tmp_path / "delta")
    os.makedirs(delta_dir)
    pq_.write_table(delta, f"{delta_dir}/delta.parquet")
    incremental_update(index_dir, pages, delta_dir, SIMPLE_SPEC)
    eng = QueryEngine(index_dir, SIMPLE_SPEC)
    assert eng.has_positions  # inherited, not passed explicitly
    for q in ["slow query", "table hash"]:
        a = eng.search_phrase(q, k=None)
        b = eng.search_phrase_positional(q, k=None)
        assert [(r["doc_id"], r["abs"]) for r in a["data"]] == [
            (r["doc_id"], r["abs"]) for r in b["data"]
        ]


# --- ordered NEAR (SpanNearQuery inOrder=true) -------------------------------


def test_min_span_ordered_bruteforce():
    from itertools import product

    from rayindex.query import QueryEngine

    rng = np.random.default_rng(7)
    for _ in range(50):
        m = int(rng.integers(2, 4))
        lists = [np.sort(rng.choice(60, size=int(rng.integers(1, 6)),
                                    replace=False)).astype(np.uint32)
                 for _ in range(m)]
        got = QueryEngine._min_span_ordered(lists)
        best = 1 << 60
        for combo in product(*[l.tolist() for l in lists]):
            if all(a < b for a, b in zip(combo, combo[1:])):
                best = min(best, combo[-1] - combo[0])
        assert got == best


def test_near_ordered_subset_and_bruteforce(pos_index):
    from rayindex.pipelines import NEAR_QUERIES, NEAR_SLOP

    exercised = 0
    for q in NEAR_QUERIES:
        uno = {r["doc_id"] for r in pos_index.search_near(q, slop=NEAR_SLOP, k=None)["data"]}
        res = pos_index.search_near(q, slop=NEAR_SLOP, k=None, ordered=True)
        got = {r["doc_id"] for r in res["data"]}
        assert got <= uno, q
        # independent verify against the doc-store text word positions
        seq = [t for t, _ in pos_index.analyzer.lemma_positions(q)]
        lemmas = list(dict.fromkeys(seq))
        cand = [r["doc_id"] for r in pos_index.search(q, k=None,
                                                      with_snippets=False)["data"]]
        meta = pos_index.doc_meta(cand)
        want = set()
        for d in cand:
            pos = _brute_positions(pos_index.analyzer, meta[d]["text"])
            ls = [pos.get(t, []) for t in lemmas]
            if any(not x for x in ls):
                continue
            ok = False
            for p1 in ls[0]:
                cur, alive = p1, True
                for nxt in ls[1:]:
                    later = [p for p in nxt if p > cur]
                    if not later:
                        alive = False
                        break
                    cur = min(later)
                if alive and cur - p1 <= NEAR_SLOP:
                    ok = True
                    break
            if ok:
                want.add(d)
        assert got == want, q
        exercised += len(got)
    assert exercised  # ordered NEAR must match something across the set
