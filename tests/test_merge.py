"""Segment-level merge (rayindex.merge): merge ≡ rebuild over the union,
tombstones made physical, exact re-salting, positional layer carried through.

The reference has no merge operator at all (combining crawls = full re-index,
services/IndexingServiceImpl.java:40-60); these tests pin the new capability
to the engine's existing ground truth: a merged index must be
indistinguishable from a from-scratch build over the union corpus."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pytest

from rayindex.build import build_index
from rayindex.fixtures import write_pages
from rayindex.incremental import purge_site
from rayindex.merge import _MergeBucketUnit, compact_segments, merge_indexes
from rayindex.query import QueryEngine


def _fmt(rows):
    return [(r["doc_id"], round(r["relevance"], 9)) for r in rows]


def _bm(pairs):
    return [(d, round(s, 9)) for d, s in pairs]


def _term_df(root: str):
    import pandas as pd

    dirs = [
        os.path.join(root, d, "term_df")
        for d in sorted(os.listdir(root))
        if d.startswith("shard=")
    ]
    t = pd.concat([pads.dataset(d).to_table().to_pandas() for d in dirs])
    return (
        t.groupby("term")["df"].sum().reset_index()
        .sort_values("term").reset_index(drop=True)
    )


def _two_site(pages: pa.Table) -> pa.Table:
    """Half the urls moved to a second site (the purge-test convention)."""
    urls = pages.column("url").to_pylist()
    urls2 = [
        u.replace("fixture.example", "other.example") if i % 2 else u
        for i, u in enumerate(urls)
    ]
    return pages.set_column(0, "url", pa.array(urls2, pa.string()))


@pytest.fixture(scope="module")
def halves(ray_session, fixture_corpus, tmp_path_factory):
    """Two half-corpus indexes + the full rebuild they must merge into."""
    base = tmp_path_factory.mktemp("merge")
    spec = fixture_corpus.analyzer_spec
    pages = _two_site(fixture_corpus.pages)
    paths = {}
    for name, tab in [
        ("a", pages.slice(0, 100)),
        ("b", pages.slice(100, pages.num_rows - 100)),
        ("full", pages),
    ]:
        pdir = str(base / f"pages_{name}")
        write_pages(tab, pdir, 4)
        out = str(base / f"idx_{name}")
        build_index(pdir, out, spec, num_buckets=4)
        paths[name] = {"pages": pdir, "idx": out}
    return {"base": base, "spec": spec, "pages": pages, **paths}


def test_merge_equals_rebuild(halves, fixture_corpus):
    out = str(halves["base"] / "merged")
    m = merge_indexes([halves["a"]["idx"], halves["b"]["idx"]], out, halves["spec"])
    assert set(m["phases"]) == {"docs", "prestats", "segments", "stats"}

    full = QueryEngine(halves["full"]["idx"], halves["spec"])
    merged = QueryEngine(out, halves["spec"])
    assert merged.n_docs == full.n_docs == fixture_corpus.pages.num_rows
    assert merged.total_tf == full.total_tf
    assert merged.avgdl == full.avgdl
    assert merged.site_pages == full.site_pages

    queries = [
        fixture_corpus.forms[fixture_corpus.lemmas[5]][0],
        " ".join(
            fixture_corpus.forms[fixture_corpus.lemmas[i]][0] for i in (3, 11)
        ),
        fixture_corpus.forms[fixture_corpus.lemmas[-1]][0],
    ]
    for q in queries:
        got = merged.search(q, k=10, with_snippets=False)
        want = full.search(q, k=10, with_snippets=False)
        assert _fmt(got["data"]) == _fmt(want["data"]), q
        assert _bm(merged.bm25_topk(q, k=10)) == _bm(full.bm25_topk(q, k=10)), q
        # site-restricted path reads the merged doclen sidecar
        got_s = merged.search(q, site="other.example", k=10, with_snippets=False)
        want_s = full.search(q, site="other.example", k=10, with_snippets=False)
        assert _fmt(got_s["data"]) == _fmt(want_s["data"]), q

    # dictionary parity: global df table identical to the rebuild's
    assert _term_df(out).equals(_term_df(halves["full"]["idx"]))


def test_merge_purged_site_is_global_and_physical(halves, fixture_corpus):
    """A site purged in ANY input is dropped from the whole merged output
    (U2 is site-scoped), and the merged index carries no tombstones."""
    spec = halves["spec"]
    a2 = str(halves["base"] / "idx_a_purged")
    shutil.copytree(halves["a"]["idx"], a2)
    purge_site(a2, "other.example")

    out = str(halves["base"] / "merged_purged")
    merge_indexes([a2, halves["b"]["idx"]], out, spec)

    # ground truth: rebuild over the full pages excluding the site
    pdir = halves["full"]["pages"]
    ref = str(halves["base"] / "idx_nosite")
    build_index(pdir, ref, spec, num_buckets=4, exclude_sites=["other.example"])

    got = QueryEngine(out, spec)
    want = QueryEngine(ref, spec)
    assert not got.purged_sites  # merge made the delete physical
    assert got.n_docs == want.n_docs
    assert got.total_tf == want.total_tf
    for q in [fixture_corpus.forms[fixture_corpus.lemmas[i]][0] for i in (2, 7)]:
        assert _fmt(got.search(q, k=10, with_snippets=False)["data"]) == _fmt(
            want.search(q, k=10, with_snippets=False)["data"]
        ), q
    assert _term_df(out).equals(_term_df(ref))
    # the purged site's docs are gone from every sidecar table
    doclen = pads.dataset(os.path.join(out, "shard=0", "doclen")).to_table()
    assert "other.example" not in set(doclen.column("site").to_pylist())
    docs = pads.dataset(os.path.join(out, "shard=0", "docs")).to_table()
    assert "other.example" not in set(docs.column("site").to_pylist())


def test_compact_segments_is_single_input_merge(halves, fixture_corpus):
    """compact_segments = decode→filter→re-encode, no re-lemmatization; the
    result serves exactly like the tombstoned index it compacts."""
    spec = halves["spec"]
    src = str(halves["base"] / "idx_b_tomb")
    shutil.copytree(halves["b"]["idx"], src)
    purge_site(src, "other.example")

    out = str(halves["base"] / "idx_b_compacted")
    compact_segments(src, out, spec)

    soft = QueryEngine(src, spec)  # tombstoned, corrections applied at read
    hard = QueryEngine(out, spec)  # physical
    assert not hard.purged_sites
    assert hard.n_docs == soft.n_docs
    assert hard.total_tf == soft.total_tf
    assert hard.avgdl == soft.avgdl
    for q in [fixture_corpus.forms[fixture_corpus.lemmas[i]][0] for i in (1, 9)]:
        assert _fmt(hard.search(q, k=10, with_snippets=False)["data"]) == _fmt(
            soft.search(q, k=10, with_snippets=False)["data"]
        ), q


def test_merge_resalts_heavy_terms(halves, fixture_corpus):
    """Merged df crosses the salt threshold → the term re-splits into ordered
    docid-range sub-lists, and results stay identical to the rebuild."""
    spec = halves["spec"]
    out = str(halves["base"] / "merged_salted")
    merge_indexes(
        [halves["a"]["idx"], halves["b"]["idx"]], out, spec,
        salt_df_threshold=8, salt_target=8,
    )
    seg = pads.dataset(os.path.join(out, "shard=0", "segments")).to_table()
    segrows = seg.filter(pc.equal(seg.column("kind"), "seg"))
    salts_per_term = (
        segrows.select(["term", "salt"]).to_pandas().groupby("term")["salt"].nunique()
    )
    assert (salts_per_term > 1).any()  # at least one head term actually split

    full = QueryEngine(halves["full"]["idx"], spec)
    merged = QueryEngine(out, spec)
    for q in [fixture_corpus.forms[fixture_corpus.lemmas[i]][0] for i in (0, 5, 13)]:
        assert _fmt(merged.search(q, k=10, with_snippets=False)["data"]) == _fmt(
            full.search(q, k=10, with_snippets=False)["data"]
        ), q
        assert _bm(merged.bm25_topk(q, k=10)) == _bm(full.bm25_topk(q, k=10)), q


def test_merge_positions_phrase_parity(ray_session, fixture_corpus, tmp_path):
    """Positional blobs are sliced per doc, permuted with the merge order and
    re-concatenated — phrase/NEAR search over the merged index ≡ rebuild."""
    spec = fixture_corpus.analyzer_spec
    pages = fixture_corpus.pages
    idxs = []
    for i, tab in enumerate([pages.slice(0, 80), pages.slice(80, 80)]):
        pdir = str(tmp_path / f"p{i}")
        write_pages(tab, pdir, 3)
        out = str(tmp_path / f"i{i}")
        build_index(pdir, out, spec, num_buckets=4, positions=True)
        idxs.append(out)
    fdir = str(tmp_path / "pf")
    write_pages(pages.slice(0, 160), fdir, 3)
    fidx = str(tmp_path / "if")
    build_index(fdir, fidx, spec, num_buckets=4, positions=True)

    out = str(tmp_path / "merged_pos")
    merge_indexes(idxs, out, spec)
    full = QueryEngine(fidx, spec)
    merged = QueryEngine(out, spec)
    assert merged.has_positions
    checked = 0
    for i in range(0, 12, 2):
        q = " ".join(
            fixture_corpus.forms[fixture_corpus.lemmas[j]][0] for j in (i, i + 1)
        )
        want = full.search_phrase_positional(q, k=10)
        got = merged.search_phrase_positional(q, k=10)
        assert _fmt(got["data"]) == _fmt(want["data"]), q
        checked += len(want["data"])
        want_n = full.search_near(q, slop=4, k=10)
        got_n = merged.search_near(q, slop=4, k=10)
        assert _fmt(got_n["data"]) == _fmt(want_n["data"]), q
        checked += len(want_n["data"])
    assert checked > 0  # the parity loop exercised real positives


def test_merge_upsert_positions_phrase_parity(ray_session, fixture_corpus, tmp_path):
    """Keep-latest upsert over POSITIONAL indexes: losing versions' position
    blobs are dropped with their postings, winners' blobs permuted into the
    merged order — phrase/NEAR over the upserted index ≡ rebuild over the
    combined crawls."""
    spec = fixture_corpus.analyzer_spec
    pages = fixture_corpus.pages

    v1 = pages.slice(0, 120)
    ts2 = pc.cast(
        pc.add(pc.cast(pages.column("warc_ts").slice(30, 50), pa.int64()), 10**9),
        pa.timestamp("us"),
    )
    v2 = pa.table(
        {
            "url": pages.column("url").slice(30, 50),
            "warc_ts": ts2,
            "html": pages.column("html").slice(90, 50),
        }
    )

    idxs = []
    for name, tab in [("v1", v1.select(["url", "warc_ts", "html"])), ("v2", v2)]:
        pdir = str(tmp_path / f"pp_{name}")
        write_pages(tab, pdir, 3)
        out = str(tmp_path / f"pi_{name}")
        build_index(pdir, out, spec, num_buckets=4, positions=True)
        idxs.append(out)

    refp = str(tmp_path / "pp_ref")
    write_pages(pa.concat_tables([v1.select(["url", "warc_ts", "html"]), v2]), refp, 3)
    ref = str(tmp_path / "pi_ref")
    build_index(refp, ref, spec, num_buckets=4, positions=True)

    out = str(tmp_path / "merged_upsert_pos")
    merge_indexes(idxs, out, spec, on_conflict="latest")
    want = QueryEngine(ref, spec)
    got = QueryEngine(out, spec)
    assert got.has_positions
    assert got.n_docs == want.n_docs == 120
    checked = 0
    for i in range(0, 12, 2):
        q = " ".join(
            fixture_corpus.forms[fixture_corpus.lemmas[j]][0] for j in (i, i + 1)
        )
        assert _fmt(got.search_phrase_positional(q, k=10)["data"]) == _fmt(
            want.search_phrase_positional(q, k=10)["data"]
        ), q
        w = want.search_near(q, slop=4, k=10)
        assert _fmt(got.search_near(q, slop=4, k=10)["data"]) == _fmt(w["data"]), q
        checked += len(w["data"])
    assert checked > 0


def test_merge_keep_latest_upsert(ray_session, fixture_corpus, tmp_path):
    """on_conflict='latest': a re-crawl index (60 of the base's urls with
    CHANGED content + later warc_ts, plus 60 new urls) merges into the base
    as an upsert — the result must equal a full rebuild over the combined
    pages, whose D1 dedup applies the same keep-latest rule."""
    spec = fixture_corpus.analyzer_spec
    pages = _two_site(fixture_corpus.pages)

    v1 = pages.slice(0, 140)
    # re-crawled urls 40..100 get a DIFFERENT page's html (content change)
    # and a strictly later timestamp; urls 140..200 are brand new
    ts2 = pc.cast(
        pc.add(pc.cast(pages.column("warc_ts").slice(40, 60), pa.int64()),
               10**9),
        pa.timestamp("us"),
    )
    recrawl = pa.table(
        {
            "url": pages.column("url").slice(40, 60),
            "warc_ts": ts2,
            "html": pages.column("html").slice(100, 60),
        }
    )
    fresh = pages.slice(140, 60)
    v2 = pa.concat_tables([recrawl, fresh.select(["url", "warc_ts", "html"])])

    idxs = []
    for name, tab in [("v1", v1.select(["url", "warc_ts", "html"])), ("v2", v2)]:
        pdir = str(tmp_path / f"p_{name}")
        write_pages(tab, pdir, 4)
        out = str(tmp_path / f"i_{name}")
        build_index(pdir, out, spec, num_buckets=4)
        idxs.append(out)

    # ground truth: one build over the concatenated crawls (D1 keep-latest)
    refp = str(tmp_path / "p_ref")
    write_pages(pa.concat_tables([v1.select(["url", "warc_ts", "html"]), v2]), refp, 4)
    ref = str(tmp_path / "i_ref")
    build_index(refp, ref, spec, num_buckets=4)

    out = str(tmp_path / "merged_upsert")
    merge_indexes(idxs, out, spec, on_conflict="latest")

    want = QueryEngine(ref, spec)
    got = QueryEngine(out, spec)
    assert got.n_docs == want.n_docs == 200
    assert got.total_tf == want.total_tf
    assert got.avgdl == want.avgdl
    assert got.site_pages == want.site_pages
    for i in (0, 3, 7, 11):
        q = fixture_corpus.forms[fixture_corpus.lemmas[i]][0]
        assert _fmt(got.search(q, k=10, with_snippets=False)["data"]) == _fmt(
            want.search(q, k=10, with_snippets=False)["data"]
        ), q
        assert _bm(got.bm25_topk(q, k=10)) == _bm(want.bm25_topk(q, k=10)), q
        got_s = got.search(q, site="other.example", k=10, with_snippets=False)
        want_s = want.search(q, site="other.example", k=10, with_snippets=False)
        assert _fmt(got_s["data"]) == _fmt(want_s["data"]), q
    assert _term_df(out).equals(_term_df(ref))

    # the doc store holds exactly one (winning) version per url
    docs = pads.dataset(os.path.join(out, "shard=0", "docs")).to_table()
    ids = docs.column("doc_id").to_numpy()
    assert len(np.unique(ids)) == len(ids) == 200


def test_merge_upsert_sharded(ray_session, fixture_corpus, tmp_path):
    """Keep-latest upsert across a 2-SHARD namespace: the re-crawl's urls
    hash into both shards, each aligned shard group resolves its own overlap,
    and the result serves identically to a 2-shard rebuild over the combined
    crawls."""
    from rayindex.build import build_all

    spec = fixture_corpus.analyzer_spec
    pages = _two_site(fixture_corpus.pages)

    v1 = pages.slice(0, 160)
    ts2 = pc.cast(
        pc.add(pc.cast(pages.column("warc_ts").slice(60, 60), pa.int64()), 10**9),
        pa.timestamp("us"),
    )
    v2 = pa.table(
        {
            "url": pages.column("url").slice(60, 60),
            "warc_ts": ts2,
            "html": pages.column("html").slice(120, 60),
        }
    )

    idxs = []
    for name, tab in [("v1", v1.select(["url", "warc_ts", "html"])), ("v2", v2)]:
        pdir = str(tmp_path / f"sp_{name}")
        write_pages(tab, pdir, 4)
        out = str(tmp_path / f"si_{name}")
        build_all(pdir, out, spec, num_shards=2, num_buckets=4)
        idxs.append(out)

    refp = str(tmp_path / "sp_ref")
    write_pages(pa.concat_tables([v1.select(["url", "warc_ts", "html"]), v2]), refp, 4)
    ref = str(tmp_path / "si_ref")
    build_all(refp, ref, spec, num_shards=2, num_buckets=4)

    out = str(tmp_path / "merged_upsert_sharded")
    m = merge_indexes(idxs, out, spec, on_conflict="latest")
    assert m["num_shards"] == 2

    want = QueryEngine(ref, spec)
    got = QueryEngine(out, spec)
    assert got.n_docs == want.n_docs == 160
    assert got.total_tf == want.total_tf
    for i in (1, 5, 9):
        q = fixture_corpus.forms[fixture_corpus.lemmas[i]][0]
        assert _fmt(got.search(q, k=10, with_snippets=False)["data"]) == _fmt(
            want.search(q, k=10, with_snippets=False)["data"]
        ), q
        assert _bm(got.bm25_topk(q, k=10)) == _bm(want.bm25_topk(q, k=10)), q
    assert _term_df(out).equals(_term_df(ref))


def test_merge_preserves_shard_namespace(ray_session, fixture_corpus, tmp_path):
    """2-shard inputs merge shard-by-aligned-shard into a 2-shard output
    that serves identically to a 2-shard full rebuild (shards are url-hash
    slices, so shard i of every input covers the same url space)."""
    from rayindex.build import build_all

    spec = fixture_corpus.analyzer_spec
    pages = _two_site(fixture_corpus.pages)
    idxs = []
    for i, tab in enumerate([pages.slice(0, 100), pages.slice(100, pages.num_rows - 100)]):
        pdir = str(tmp_path / f"p{i}")
        write_pages(tab, pdir, 4)
        out = str(tmp_path / f"i{i}")
        build_all(pdir, out, spec, num_shards=2, num_buckets=4)
        idxs.append(out)
    fdir = str(tmp_path / "pf")
    write_pages(pages, fdir, 4)
    fidx = str(tmp_path / "if")
    build_all(fdir, fidx, spec, num_shards=2, num_buckets=4)

    out = str(tmp_path / "merged_sharded")
    m = merge_indexes(idxs, out, spec)
    assert m["num_shards"] == 2
    # shard namespace preserved, plus the root-level cross-shard site_lemmas
    # sidecar a multi-shard build also writes (commit 3de955c)
    assert sorted(os.listdir(out)) == ["shard=0", "shard=1", "site_lemmas_global"]
    import json as _json

    for s in (0, 1):
        st = _json.load(open(os.path.join(out, f"shard={s}", "stats.json")))
        assert (st["shard_index"], st["num_shards"]) == (s, 2)

    full = QueryEngine(fidx, spec)
    merged = QueryEngine(out, spec)
    assert merged.n_docs == full.n_docs
    assert merged.total_tf == full.total_tf
    for i in (2, 6, 10):
        q = fixture_corpus.forms[fixture_corpus.lemmas[i]][0]
        assert _fmt(merged.search(q, k=10, with_snippets=False)["data"]) == _fmt(
            full.search(q, k=10, with_snippets=False)["data"]
        ), q
        assert _bm(merged.bm25_topk(q, k=10)) == _bm(full.bm25_topk(q, k=10)), q
    assert _term_df(out).equals(_term_df(fidx))


def test_merge_rejects_shard_count_mismatch(halves, tmp_path):
    from rayindex.build import build_all

    spec = halves["spec"]
    pages = pads.dataset(halves["a"]["pages"]).to_table()
    pdir = str(tmp_path / "p")
    write_pages(pages.slice(0, 20), pdir, 2)
    sharded = str(tmp_path / "idx_2shard")
    build_all(pdir, sharded, spec, num_shards=2, num_buckets=4)
    with pytest.raises(ValueError, match="num_shards"):
        merge_indexes([halves["a"]["idx"], sharded], str(tmp_path / "x"), spec)


def test_merge_rejects_overlapping_doc_ids(halves):
    """Same doc in two inputs → the strictly-increasing-docid encoder raises
    instead of silently double-counting (documented contract)."""
    seg_dir = os.path.join(halves["a"]["idx"], "shard=0", "segments")
    unit = _MergeBucketUnit([seg_dir, seg_dir], np.empty(0, np.uint64), [],
                            salt_df_threshold=1 << 30, salt_target=1 << 18,
                            positions=False)
    batch = pa.table({"bucket": pa.array([0], pa.int64())})
    with pytest.raises(ValueError, match="strictly increasing"):
        unit(batch)


def test_merge_validates_inputs(halves, tmp_path):
    spec = halves["spec"]
    pages = pads.dataset(halves["a"]["pages"]).to_table()
    pdir = str(tmp_path / "p")
    write_pages(pages.slice(0, 20), pdir, 2)
    other = str(tmp_path / "idx_otherbuckets")
    build_index(pdir, other, spec, num_buckets=8)
    with pytest.raises(ValueError, match="num_buckets"):
        merge_indexes([halves["a"]["idx"], other], str(tmp_path / "x"), spec)


def test_sharded_merge_and_compact_write_global_sidecar(
    ray_session, fixture_corpus, tmp_path
):
    """A multi-shard merge/compact output must carry a root-level
    site_lemmas_global whose census matches the NEW shards' stats.json —
    otherwise every statistics() call on the merged tree silently pays the
    full dictionary scan the sidecar exists to avoid."""
    from rayindex.build import build_all
    from rayindex.incremental import compact

    spec = fixture_corpus.analyzer_spec
    pages = _two_site(fixture_corpus.pages)
    idxs = []
    for i, tab in enumerate([pages.slice(0, 100), pages.slice(100, pages.num_rows - 100)]):
        pdir = str(tmp_path / f"gp{i}")
        write_pages(tab, pdir, 4)
        out = str(tmp_path / f"gi{i}")
        build_all(pdir, out, spec, num_shards=2, num_buckets=4)
        idxs.append(out)

    merged = str(tmp_path / "g_merged")
    merge_indexes(idxs, merged, spec)
    assert os.path.exists(
        os.path.join(merged, "site_lemmas_global", "site_lemmas.parquet")
    )
    eng = QueryEngine(merged, spec)
    sidecar = eng._site_lemmas_sidecar()
    assert sidecar is not None  # census accepted → no scan on the admin path
    site_lemmas, n_lemmas = sidecar
    # sidecar values ≡ the dictionary-scan fallback it replaces
    ts = eng._scan_term_stats()
    live = ts[ts["df"] > 0]
    assert site_lemmas == live.groupby("site")["term"].nunique().to_dict()
    assert n_lemmas == int(live["term"].nunique())

    # compact (full rebuild minus tombstones) over a 2-shard namespace
    pdir_all = str(tmp_path / "gp_all")
    write_pages(pages, pdir_all, 4)
    base = str(tmp_path / "g_base")
    build_all(pdir_all, base, spec, num_shards=2, num_buckets=4)
    purge_site(base, "other.example")
    compacted = str(tmp_path / "g_compacted")
    compact(base, pdir_all, spec, compacted, num_shards=2, num_buckets=4)
    assert os.path.exists(
        os.path.join(compacted, "site_lemmas_global", "site_lemmas.parquet")
    )
    ceng = QueryEngine(compacted, spec)
    assert ceng._site_lemmas_sidecar() is not None
    assert "other.example" not in ceng._site_lemmas_sidecar()[0]
