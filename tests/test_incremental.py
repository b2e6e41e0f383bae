"""Incremental operators (SURVEY.md §2.9): delta re-index (U1), site purge
(U2) — engine state must equal a from-scratch rebuild."""

import os

import numpy as np
import pyarrow as pa
import pytest

from rayindex.analyze import make_analyzer
from rayindex.build import build_all, build_index
from rayindex.fixtures import _page_html, write_pages
from rayindex.incremental import incremental_update, index_page, purge_site
from rayindex.oracle import build_oracle_index, oracle_search
from rayindex.query import QueryEngine
from rayindex.segments import segments_digest


def _fmt(rows):
    return [(r["doc_id"], round(r["relevance"], 9)) for r in rows]


def test_delta_reindex_overrides_page(ray_session, fixture_corpus, tmp_path):
    pages = fixture_corpus.pages.slice(0, 60)
    pdir = str(tmp_path / "pages")
    write_pages(pages, pdir, 4)
    out = str(tmp_path / "idx")
    build_all(pdir, out, fixture_corpus.analyzer_spec, num_shards=2, num_buckets=4)

    # delta: replace page 7's content entirely (new vocab word, newer ts)
    row = pages.slice(7, 1).to_pylist()[0]
    new_word = fixture_corpus.lemmas[-3]  # rare lemma: survives the 80 % cutoff
    html, golden = _page_html("Новый заголовок", new_word, [f"{new_word} {new_word}"])
    delta = pa.table(
        {
            "url": pa.array([row["url"]], pa.string()),
            "warc_ts": pa.array(
                [int(row["warc_ts"].timestamp() * 1_000_000) + 10_000_000],
                pa.timestamp("us"),
            ),
            "html": pa.array([html.encode()], pa.binary()),
            "text": pa.array([golden], pa.string()),
            "lang": pa.array(["ru"], pa.string()),
        }
    )
    ddir = str(tmp_path / "delta")
    write_pages(delta, ddir, 1)

    incremental_update(out, pdir, ddir, fixture_corpus.analyzer_spec,
                       num_shards=2, num_buckets=4)

    # engine must now equal an oracle built over (pages with page 7 replaced)
    rows = pages.to_pylist()
    rows[7]["text"] = golden
    oidx = build_oracle_index(rows, make_analyzer(fixture_corpus.analyzer_spec), num_shards=2)
    eng = QueryEngine(out, fixture_corpus.analyzer_spec)
    assert eng.n_docs == 60
    for q in [new_word, fixture_corpus.forms[fixture_corpus.lemmas[5]][0]]:
        want = oracle_search(oidx, q, k=10)
        got = eng.search(q, k=10, with_snippets=False)
        assert _fmt(got["data"]) == _fmt(want), q
    # the new word's postings contain the replaced page
    hit = eng.search(new_word, k=10, with_snippets=False)
    assert row["url"] in {
        eng.doc_meta([r["doc_id"] for r in hit["data"]]).get(r["doc_id"], {}).get("url")
        for r in hit["data"]
    }
    # the multi-shard update regenerated site_lemmas_global: the sidecar
    # passes the census check and agrees with the post-delta dictionary
    assert eng._site_lemmas_sidecar() is not None
    eng_scan = QueryEngine(out, fixture_corpus.analyzer_spec)
    eng_scan._site_lemmas_sidecar = lambda: None
    assert eng.statistics() == eng_scan.statistics()


def test_delta_only_touches_affected_shard(ray_session, fixture_corpus, tmp_path):
    pages = fixture_corpus.pages.slice(0, 40)
    pdir = str(tmp_path / "pages")
    write_pages(pages, pdir, 2)
    out = str(tmp_path / "idx")
    build_all(pdir, out, fixture_corpus.analyzer_spec, num_shards=2, num_buckets=4)

    from rayindex.incremental import affected_shards
    from rayindex.fixtures import SITE_URL

    # brand-new page → lands in exactly one shard
    html, golden = _page_html("Т", "тест", ["абв"])
    delta = pa.table(
        {
            "url": pa.array([f"{SITE_URL}/p/99999999"], pa.string()),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([html.encode()], pa.binary()),
            "text": pa.array([golden], pa.string()),
            "lang": pa.array(["ru"], pa.string()),
        }
    )
    ddir = str(tmp_path / "delta")
    write_pages(delta, ddir, 1)
    touched = affected_shards(ddir, 2)
    assert len(touched) == 1
    untouched = 1 - touched[0]
    before = segments_digest(f"{out}/shard={untouched}")
    mtime = os.path.getmtime(f"{out}/shard={untouched}/segments")
    incremental_update(out, pdir, ddir, fixture_corpus.analyzer_spec,
                       num_shards=2, num_buckets=4)
    assert os.path.getmtime(f"{out}/shard={untouched}/segments") == mtime
    assert segments_digest(f"{out}/shard={untouched}") == before
    eng = QueryEngine(out, fixture_corpus.analyzer_spec)
    assert eng.n_docs == 41


def test_purge_site_equals_rebuild_without_it(ray_session, fixture_corpus, tmp_path):
    # two-site corpus: rewrite half the urls onto a second host
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
    eng_a = QueryEngine(out_a, fixture_corpus.analyzer_spec)

    out_b = str(tmp_path / "idx_clean")
    build_index(pdir, out_b, fixture_corpus.analyzer_spec, num_buckets=4,
                exclude_sites=["other.example"])
    eng_b = QueryEngine(out_b, fixture_corpus.analyzer_spec)

    assert eng_a.n_docs == eng_b.n_docs
    assert abs(eng_a.avgdl - eng_b.avgdl) < 1e-9
    for q in [fixture_corpus.forms[fixture_corpus.lemmas[i]][0] for i in (3, 8, 15)]:
        got = eng_a.search(q, k=10, with_snippets=False)
        want = eng_b.search(q, k=10, with_snippets=False)
        assert _fmt(got["data"]) == _fmt(want["data"]), q
        wa = eng_a.bm25_wand(q, k=10)
        wb = eng_b.bm25_wand(q, k=10)
        assert [(d, round(s, 9)) for d, s in wa] == [(d, round(s, 9)) for d, s in wb], q
    # purged-site-restricted search returns nothing
    assert eng_a.search("любое", site="other.example", k=5)["count"] == 0
    # statistics reflect the purge
    st = eng_a.statistics()["statistics"]
    assert st["total"]["pages"] == eng_b.n_docs
    assert all(d["name"] != "other.example" for d in st["detailed"])


def test_purge_bloom_path_identical_and_bounded(
    ray_session, fixture_corpus, tmp_path, monkeypatch
):
    """Round-3 scalable tombstones: with the exact-array cap forced to 0 the
    engine takes the bloom + Parquet-verify path — results must stay
    identical to a physical rebuild, tombstones.json must carry NO inline doc
    ids, and the resident membership state must be a bounded structure."""
    import json as _json

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

    with open(os.path.join(out_a, "tombstones.json")) as f:
        tomb = _json.load(f)
    info = tomb["sites"]["other.example"]
    assert "doc_ids" not in info  # ids live in the Parquet sidecar
    assert info["n_docs"] == 25
    assert os.path.isdir(os.path.join(out_a, info["dir"]))

    monkeypatch.setattr(QueryEngine, "TOMBSTONE_EXACT_CAP", 0)
    eng_a = QueryEngine(out_a, fixture_corpus.analyzer_spec)
    assert eng_a.tombstones.bloom is not None  # bloom path actually engaged

    out_b = str(tmp_path / "idx_clean")
    build_index(pdir, out_b, fixture_corpus.analyzer_spec, num_buckets=4,
                exclude_sites=["other.example"])
    eng_b = QueryEngine(out_b, fixture_corpus.analyzer_spec)

    assert eng_a.n_docs == eng_b.n_docs
    assert abs(eng_a.avgdl - eng_b.avgdl) < 1e-9
    for q in [fixture_corpus.forms[fixture_corpus.lemmas[i]][0] for i in (3, 8, 15)]:
        got = eng_a.search(q, k=10, with_snippets=False)
        want = eng_b.search(q, k=10, with_snippets=False)
        assert _fmt(got["data"]) == _fmt(want["data"]), q
        wa = eng_a.bm25_wand(q, k=10)
        wb = eng_b.bm25_wand(q, k=10)
        assert [(d, round(s, 9)) for d, s in wa] == [(d, round(s, 9)) for d, s in wb], q
        ea = eng_a.bm25_exhaustive(q, k=10)
        assert [(d, round(s, 9)) for d, s in ea] == [(d, round(s, 9)) for d, s in wb], q
    # bounded state: bloom (~10 bits/id) + verdict caches, NOT O(GB) JSON;
    # at 10^6 purged ids this structure is ~1.25 MB + caches
    assert eng_a.tombstones.nbytes() < 1 << 20


def test_index_page_single(ray_session, fixture_corpus, tmp_path):
    pages = fixture_corpus.pages.slice(0, 20)
    pdir = str(tmp_path / "pages")
    write_pages(pages, pdir, 2)
    out = str(tmp_path / "idx")
    build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4)
    word = fixture_corpus.lemmas[4]
    html, _ = _page_html("Одна страница", word, [f"{word} {word} {word}"])
    from rayindex.fixtures import SITE_URL

    index_page(
        out, f"{SITE_URL}/p/55555555", html.encode(), 1_600_000_000_000_000,
        pdir, fixture_corpus.analyzer_spec, num_shards=1, num_buckets=4,
    )
    eng = QueryEngine(out, fixture_corpus.analyzer_spec)
    assert eng.n_docs == 21
    got = eng.search(word, k=10, with_snippets=False)
    metas = eng.doc_meta([r["doc_id"] for r in got["data"]])
    assert any(m["url"].endswith("55555555") for m in metas.values())


def test_sequential_index_page_calls_compose(ray_session, fixture_corpus, tmp_path):
    """Review regression: a later single-page update must not revert earlier
    ones (deltas are registered and composed into every rebuild)."""
    from rayindex.fixtures import SITE_URL

    pages = fixture_corpus.pages.slice(0, 15)
    pdir = str(tmp_path / "pages")
    write_pages(pages, pdir, 2)
    out = str(tmp_path / "idx")
    build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4)
    w1, w2 = fixture_corpus.lemmas[-1], fixture_corpus.lemmas[-2]
    h1, _ = _page_html("A", w1, [f"{w1} {w1}"])
    h2, _ = _page_html("B", w2, [f"{w2} {w2}"])
    index_page(out, f"{SITE_URL}/p/11111111", h1.encode(), 1_600_000_000_000_000,
               pdir, fixture_corpus.analyzer_spec, num_shards=1, num_buckets=4)
    index_page(out, f"{SITE_URL}/p/22222222", h2.encode(), 1_600_000_100_000_000,
               pdir, fixture_corpus.analyzer_spec, num_shards=1, num_buckets=4)
    eng = QueryEngine(out, fixture_corpus.analyzer_spec)
    assert eng.n_docs == 17  # both pages present
    for w, suffix in [(w1, "11111111"), (w2, "22222222")]:
        got = eng.search(w, k=10, with_snippets=False)
        metas = eng.doc_meta([r["doc_id"] for r in got["data"]])
        assert any(m["url"].endswith(suffix) for m in metas.values()), w


def test_same_url_same_ts_different_content_cross_batch(ray_session, fixture_corpus, tmp_path):
    """Review regression: identical (url, warc_ts) with different html in
    different fragments must resolve deterministically, not crash P4."""
    import pyarrow as pa

    from rayindex.fixtures import SITE_URL

    base = fixture_corpus.pages.slice(0, 8)
    h1, g1 = _page_html("Вариант один", "первый", ["текст один"])
    h2, g2 = _page_html("Вариант два", "второй", ["текст два"])
    dup_url = f"{SITE_URL}/p/00777777"

    def one(html, golden):
        return pa.table(
            {
                "url": pa.array([dup_url], pa.string()),
                "warc_ts": pa.array([1_500_000_000_000_000], pa.timestamp("us")),
                "html": pa.array([html.encode()], pa.binary()),
                "text": pa.array([golden], pa.string()),
                "lang": pa.array(["ru"], pa.string()),
            }
        )

    pdir = str(tmp_path / "pages")
    os.makedirs(pdir, exist_ok=True)
    import pyarrow.parquet as pq

    pq.write_table(base, f"{pdir}/part-0.parquet")
    pq.write_table(one(h1, g1), f"{pdir}/part-1.parquet")  # separate fragments →
    pq.write_table(one(h2, g2), f"{pdir}/part-2.parquet")  # separate batches
    out = str(tmp_path / "idx")
    build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4)
    import pyarrow.dataset as pads

    docs = pads.dataset(f"{out}/shard=0/docs").to_table()
    assert docs.num_rows == 9  # exactly one winner for the dup url
    eng = QueryEngine(out, fixture_corpus.analyzer_spec)
    assert eng.n_docs == 9


def test_bit_identical_duplicate_rows_dont_crash(ray_session, fixture_corpus, tmp_path):
    """Fully identical rows across fragments collapse via the encoder guard."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = fixture_corpus.pages.slice(0, 6)
    dup = fixture_corpus.pages.slice(2, 1)
    pdir = str(tmp_path / "pages")
    os.makedirs(pdir, exist_ok=True)
    pq.write_table(base, f"{pdir}/part-0.parquet")
    pq.write_table(dup, f"{pdir}/part-1.parquet")
    out = str(tmp_path / "idx")
    build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4)
    eng = QueryEngine(out, fixture_corpus.analyzer_spec)
    q = fixture_corpus.forms[fixture_corpus.lemmas[10]][0]
    eng.search(q, k=5, with_snippets=False)  # must not raise
