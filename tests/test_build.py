"""Index snapshot tests (SURVEY.md §5 item 3): the Ray-built index must equal
the brute-force oracle — decoded postings, df table, doc_len, doc store."""

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as pads

from rayindex.query import QueryEngine
from rayindex.schema import term_bucket
from rayindex.segments import SegmentReader


def test_doc_store_complete(built_index, oracle_index):
    docs = pads.dataset(f"{built_index['out_dir']}/shard=0/docs").to_table()
    got = {int(d): u for d, u in zip(docs["doc_id"].to_pylist(), docs["url"].to_pylist())}
    assert got == oracle_index.doc_url


def test_term_stats_equal_oracle_df(built_index, oracle_index):
    ts = pads.dataset(f"{built_index['out_dir']}/shard=0/term_stats").to_table()
    got = {
        (s, t): int(df)
        for s, t, df in zip(
            ts["site"].to_pylist(), ts["term"].to_pylist(), ts["df"].to_pylist()
        )
    }
    assert got == oracle_index.df


def test_doclen_equal_oracle(built_index, oracle_index):
    dl = pads.dataset(f"{built_index['out_dir']}/shard=0/doclen").to_table()
    got = {int(d): int(v) for d, v in zip(dl["doc_id"].to_pylist(), dl["doc_len"].to_pylist())}
    want = {d: v for d, v in oracle_index.doc_len.items() if v > 0}
    assert got == want


def test_all_posting_lists_roundtrip(built_index, oracle_index, engine):
    """Every term's decoded (doc → tf) must equal the oracle's postings."""
    reader = SegmentReader(f"{built_index['out_dir']}/shard=0", engine.num_buckets)
    for term, plist in oracle_index.postings.items():
        b = int(term_bucket(np.array([term], dtype=object), engine.num_buckets)[0])
        brs = reader.postings(term, b)
        assert brs, f"term {term} missing"
        docs, tfs, dls = engine._cursor(term).decode_all()
        got = dict(zip(docs.tolist(), tfs.tolist()))
        assert got == plist, term
        # dls must match the doc's total length
        for d, l in zip(docs.tolist(), dls.tolist()):
            assert l == oracle_index.doc_len[d]
        assert bool(np.all(np.diff(docs.astype(np.float64)) > 0)) or len(docs) == 1


def test_head_term_was_salted(built_index, fixture_corpus, engine):
    """The ≥85 % head lemma must have been split into >1 ordered sub-lists."""
    head = fixture_corpus.lemmas[0]
    reader = SegmentReader(f"{built_index['out_dir']}/shard=0", engine.num_buckets)
    b = int(term_bucket(np.array([head], dtype=object), engine.num_buckets)[0])
    brs = reader.postings(head, b)
    assert len(brs) > 1
    all_docs = np.concatenate(
        [np.concatenate([x.block(k)[0] for k in range(x.n_blocks)]) for x in brs]
    )
    assert bool(np.all(np.diff(all_docs.astype(np.float64)) > 0))


def test_stats_json(built_index, oracle_index):
    import json

    stats = json.load(open(f"{built_index['out_dir']}/shard=0/stats.json"))
    assert stats["n_docs"] == oracle_index.n_docs
    assert stats["total_tf"] == sum(oracle_index.doc_len.values())


def test_dedup_idempotent(ray_session, fixture_corpus, tmp_path):
    """Duplicate urls collapse to the newest row (D1 keep-latest)."""
    import pyarrow as pa

    from rayindex.build import build_index
    from rayindex.fixtures import write_pages

    pages = fixture_corpus.pages.slice(0, 30)
    older = pages.slice(0, 10).set_column(
        1, "warc_ts", pa.array([0] * 10, pa.timestamp("us"))
    )
    doubled = pa.concat_tables([pages, older])
    pdir = str(tmp_path / "pages")
    write_pages(doubled, pdir, 4)
    out = str(tmp_path / "idx")
    build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4)
    docs = pads.dataset(f"{out}/shard=0/docs").to_table()
    assert docs.num_rows == 30
    # winners must be the newer rows (non-zero timestamps)
    ts = docs.filter(pc.equal(pc.year(docs["warc_ts"]), 1970))
    assert ts.num_rows == 0


def test_url_filter_rejects_media_and_query_urls(ray_session, fixture_corpus, tmp_path):
    """M8 (dto/indexing/PageIndexer.java:136-144): media extensions, ?, #."""
    import pyarrow as pa

    from rayindex.build import build_index
    from rayindex.fixtures import write_pages

    pages = fixture_corpus.pages.slice(0, 12)
    urls = pages.column("url").to_pylist()
    urls[1] = urls[1] + ".png"
    urls[2] = urls[2] + "?session=1"
    urls[3] = urls[3] + "#frag"
    urls[4] = urls[4] + ".PDF"  # case-insensitive
    pages = pages.set_column(0, "url", pa.array(urls, pa.string()))
    pdir = str(tmp_path / "pages")
    write_pages(pages, pdir, 2)
    out = str(tmp_path / "idx")
    build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4, url_filter=True)
    docs = pads.dataset(f"{out}/shard=0/docs").to_table()
    kept = set(docs.column("url").to_pylist())
    assert len(kept) == 8
    assert urls[1] not in kept and urls[2] not in kept
    assert urls[3] not in kept and urls[4] not in kept


def test_compact_makes_purge_physical(ray_session, fixture_corpus, tmp_path):
    import pyarrow as pa

    from rayindex.build import build_index
    from rayindex.fixtures import write_pages
    from rayindex.incremental import compact, purge_site
    from rayindex.query import QueryEngine

    pages = fixture_corpus.pages.slice(0, 30)
    urls = pages.column("url").to_pylist()
    urls2 = [u.replace("fixture.example", "dead.example") if i < 10 else u for i, u in enumerate(urls)]
    pages = pages.set_column(0, "url", pa.array(urls2, pa.string()))
    pdir = str(tmp_path / "pages")
    write_pages(pages, pdir, 2)
    out = str(tmp_path / "idx")
    build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4)
    purge_site(out, "dead.example")
    out2 = str(tmp_path / "idx2")
    compact(out, pdir, fixture_corpus.analyzer_spec, out2, num_shards=1, num_buckets=4)
    eng = QueryEngine(out2, fixture_corpus.analyzer_spec)
    assert eng.n_docs == 20
    assert "dead.example" not in eng.site_pages
    assert not eng.purged_sites  # compacted index carries no tombstones


def test_normalize_https():
    """M11 (dto/indexing/SiteIndexer.java:98-103)."""
    from rayindex.build import normalize_https

    assert normalize_https("http://a.example/x") == "https://a.example/x"
    assert normalize_https("https://a.example/x") == "https://a.example/x"
    assert normalize_https("ftp://a.example") == "ftp://a.example"


def test_fast_extractor_build_digest_equal(ray_session, fixture_corpus, tmp_path):
    from rayindex.build import build_index
    from rayindex.fixtures import write_pages
    from rayindex.segments import segments_digest

    pages = fixture_corpus.pages.slice(0, 40)
    pdir = str(tmp_path / "pages")
    write_pages(pages, pdir, 2)
    a, b = str(tmp_path / "ia"), str(tmp_path / "ib")
    build_index(pdir, a, fixture_corpus.analyzer_spec, num_buckets=4, extractor="parser")
    build_index(pdir, b, fixture_corpus.analyzer_spec, num_buckets=4, extractor="fast")
    assert segments_digest(f"{a}/shard=0") == segments_digest(f"{b}/shard=0")
    # the default (hybrid) must also be digest-identical to the parser build
    c = str(tmp_path / "ic")
    build_index(pdir, c, fixture_corpus.analyzer_spec, num_buckets=4)
    assert segments_digest(f"{a}/shard=0") == segments_digest(f"{c}/shard=0")


def test_empty_corpus_builds_and_queries(ray_session, tmp_path):
    """A zero-page input yields a complete, queryable empty index (Ray's
    writer emits schema-less files for empty datasets otherwise)."""
    import pyarrow.parquet as pq

    from rayindex.build import build_index
    from rayindex.query import QueryEngine
    from rayindex.schema import PAGES_SCHEMA

    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(PAGES_SCHEMA.empty_table(), str(pdir / "part-0.parquet"))
    out = str(tmp_path / "idx")
    build_index(str(pdir), out, {"name": "simple"}, num_buckets=4)
    eng = QueryEngine(out, {"name": "simple"})
    assert eng.n_docs == 0
    assert eng.search("anything", k=5)["count"] == 0
    assert eng.bm25_topk("anything", k=5) == []
    assert eng.statistics()["statistics"]["total"]["pages"] == 0


def test_fused_build_equals_two_phase(ray_session, fixture_corpus, tmp_path):
    """resume=False fuses P1→P2 (extract streams into the lemmatizer; doc
    store written as a task side effect) — segments, doc store and stats must
    be identical to the checkpointed two-phase build, and the fused index
    must resume cleanly afterwards."""
    import json

    from rayindex.build import build_index
    from rayindex.fixtures import write_pages
    from rayindex.segments import segments_digest

    pages = fixture_corpus.pages.slice(0, 60)
    pdir = str(tmp_path / "pages")
    write_pages(pages, pdir, 4)
    a, b = str(tmp_path / "fused"), str(tmp_path / "classic")
    m1 = build_index(pdir, a, fixture_corpus.analyzer_spec, num_buckets=4, resume=False)
    m2 = build_index(pdir, b, fixture_corpus.analyzer_spec, num_buckets=4, resume=True)
    assert m1["phases"]["postings"] == 0.0  # fused into the docs wall
    assert m2["phases"]["postings"] > 0.0
    assert segments_digest(f"{a}/shard=0") == segments_digest(f"{b}/shard=0")
    ta = pads.dataset(f"{a}/shard=0/docs").to_table().sort_by("doc_id")
    tb = pads.dataset(f"{b}/shard=0/docs").to_table().sort_by("doc_id")
    assert ta.equals(tb)
    with open(f"{a}/shard=0/stats.json") as f:
        sa = json.load(f)
    with open(f"{b}/shard=0/stats.json") as f:
        sb = json.load(f)
    assert sa == sb
    # the fused build committed valid phase manifests: a resume build on top
    # of it is a no-op (no phase re-runs)
    import os

    mtime = os.path.getmtime(f"{a}/shard=0/segments")
    build_index(pdir, a, fixture_corpus.analyzer_spec, num_buckets=4, resume=True)
    assert os.path.getmtime(f"{a}/shard=0/segments") == mtime


def test_null_html_row_builds_as_empty_page(ray_session, fixture_corpus, tmp_path):
    """A null html row (failed fetch) must not kill the build: the page is
    indexed as an empty doc (counted, zero postings) and the rest of the
    corpus is unaffected — with the default (hybrid) extractor AND the
    parser path."""
    import pyarrow as pa

    from rayindex.build import build_index
    from rayindex.fixtures import write_pages
    from rayindex.query import QueryEngine

    pages = fixture_corpus.pages.slice(0, 20)
    cols = {name: pages.column(name).to_pylist() for name in pages.schema.names}
    cols["html"][7] = None
    cols["text"][7] = ""
    t = pa.table(cols, schema=pages.schema)
    pdir = str(tmp_path / "pages")
    write_pages(t, pdir, 2)
    for extractor in ("hybrid", "parser"):
        out = str(tmp_path / f"idx_{extractor}")
        build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4,
                    extractor=extractor)
        eng = QueryEngine(out, fixture_corpus.analyzer_spec)
        assert eng.n_docs == 20, extractor


def test_null_url_dropped_null_ts_epoch0(ray_session, fixture_corpus, tmp_path):
    """Malformed crawl rows: a null url is unidentifiable → dropped at
    ingest (not hashed into a phantom doc); a null warc_ts indexes at epoch 0
    so a real-timestamped duplicate copy wins keep-latest dedup."""
    import pyarrow as pa

    from rayindex.build import build_index
    from rayindex.fixtures import write_pages
    from rayindex.query import QueryEngine

    pages = fixture_corpus.pages.slice(0, 12)
    cols = {n: pages.column(n).to_pylist() for n in pages.schema.names}
    cols["url"][3] = None          # dropped
    cols["warc_ts"][5] = None      # indexed at epoch 0
    # duplicate of row 6: null-ts copy with different html; the REAL-ts
    # original must win keep-latest dedup
    for n in cols:
        cols[n].append(cols[n][6])
    cols["warc_ts"][-1] = None
    cols["html"][-1] = b"<p>stale copy</p>"
    cols["text"][-1] = "stale copy"
    t = pa.table(cols, schema=pages.schema)
    pdir = str(tmp_path / "pages")
    write_pages(t, pdir, 2)
    out = str(tmp_path / "idx")
    build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4)
    eng = QueryEngine(out, fixture_corpus.analyzer_spec)
    assert eng.n_docs == 11  # 12 - null-url - dup
    # the real-timestamped copy won: the stale copy's unique term is absent
    assert eng.search("stale", k=5)["count"] == 0


def test_bucketed_chunked_salts_equal_groupby_mode(ray_session, fixture_corpus, tmp_path):
    """The chunked salted reduce units (one read per SALT_CHUNK consecutive
    salts, docid-windowed scan filter) must be byte-identical to Ray's
    sort-based groupby shuffle.  salt_target=4 over the whole fixture forces
    head terms past SALT_CHUNK salts so multi-chunk units actually run."""
    from rayindex.build import SALT_CHUNK, build_index
    from rayindex.fixtures import write_pages
    from rayindex.segments import segments_digest

    pages = fixture_corpus.pages
    pdir = str(tmp_path / "pages")
    write_pages(pages, pdir, 4)
    a, b = str(tmp_path / "ia"), str(tmp_path / "ib")
    kw = dict(num_buckets=4, salt_df_threshold=8, salt_target=4)
    build_index(pdir, a, fixture_corpus.analyzer_spec, shuffle_mode="bucketed", **kw)
    build_index(pdir, b, fixture_corpus.analyzer_spec, shuffle_mode="groupby", **kw)
    assert segments_digest(f"{a}/shard=0") == segments_digest(f"{b}/shard=0")
    # the config genuinely exercised a multi-chunk unit
    seg = pads.dataset(f"{a}/shard=0/segments").to_table(columns=["term", "salt", "kind"])
    seg = seg.filter(pc.equal(seg.column("kind"), "seg"))
    max_salt = pc.max(seg.column("salt")).as_py()
    assert max_salt is not None and max_salt >= SALT_CHUNK


def test_auto_num_buckets_scales_with_input():
    from rayindex.build import (BUCKET_DOCS_TARGET, DEFAULT_NUM_BUCKETS,
                                _auto_num_buckets)

    assert _auto_num_buckets(0, 1) == DEFAULT_NUM_BUCKETS
    assert _auto_num_buckets(500_000, 1) == DEFAULT_NUM_BUCKETS
    assert _auto_num_buckets(BUCKET_DOCS_TARGET * DEFAULT_NUM_BUCKETS, 1) == DEFAULT_NUM_BUCKETS
    assert _auto_num_buckets(10_000_000, 1) == 64
    assert _auto_num_buckets(20_000_000, 1) == 128
    # sharded builds size per shard: the 20M 4-shard deployment keeps 32
    assert _auto_num_buckets(20_000_000, 4) == DEFAULT_NUM_BUCKETS
    assert _auto_num_buckets(10**9, 1) == 4096  # capped


def test_detect_dup_ids_matches_brute_force(ray_session, tmp_path, monkeypatch):
    """The metadata-planned map/reduce duplicate census must agree with a
    brute-force pandas count under every ingest filter (null urls, M8 url
    reject, url-space sharding), across multiple files and row groups, with
    the multi-task / multi-bucket paths forced."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import rayindex.build as B
    from rayindex.schema import doc_ids_for_urls, hash64_strings

    rng = np.random.default_rng(7)
    urls = []
    for i in range(600):
        urls.append(f"https://s{i % 7}.example.com/p{i}")
    # duplicates within and across files, triples included
    urls += [urls[i] for i in rng.choice(600, 80, replace=False)]
    urls += [urls[3], urls[3], urls[500]]
    # rows the ingest filters must drop
    urls += [None, None, "https://s0.example.com/img.PNG",
             "https://s1.example.com/a?b=1", "https://s2.example.com/doc.pdf"]
    rng.shuffle(urls)
    pdir = tmp_path / "pages"
    pdir.mkdir()
    third = len(urls) // 3
    for fi, chunk in enumerate((urls[:third], urls[third:2 * third], urls[2 * third:])):
        t = pa.table({"url": pa.array(chunk, pa.string()),
                      "html": pa.array([b"<p>x</p>"] * len(chunk), pa.binary())})
        pq.write_table(t, pdir / f"part{fi}.parquet", row_group_size=50)
    # zero-row fragment: the metadata planner must skip it without a unit
    pq.write_table(t.schema.empty_table(), pdir / "part-empty.parquet")

    def brute(shard_index, num_shards, url_filter):
        s = pd.Series([u for u in urls if u is not None])
        if url_filter:
            s = s[~s.str.contains(B._URL_REJECT_RE, regex=True)]
        if num_shards > 1:
            h = hash64_strings(s.to_numpy())
            s = s[h % np.uint64(num_shards) == shard_index]
        if len(s) == 0:
            return np.empty(0, np.int64)
        ids = pd.Series(doc_ids_for_urls(s.to_numpy(), shard_index, num_shards))
        vc = ids.value_counts()
        return np.sort(vc[vc > 1].index.to_numpy().astype(np.int64))

    # force many map tasks and several reduce buckets
    monkeypatch.setattr(B, "_DUP_SCAN_ROWS", 64)
    monkeypatch.setattr(B, "_DUP_BUCKET_ROWS", 100)
    for num_shards in (1, 2):
        for shard_index in range(num_shards):
            for url_filter in (False, True):
                got = B._detect_dup_ids(str(pdir), shard_index, num_shards, url_filter)
                want = brute(shard_index, num_shards, url_filter)
                assert np.array_equal(got, want), (num_shards, shard_index, url_filter)
                assert got.dtype == np.int64
    # single-bucket path (num_returns == 1)
    monkeypatch.setattr(B, "_DUP_BUCKET_ROWS", 10_000_000)
    got1 = B._detect_dup_ids(str(pdir), 0, 1, False)
    assert np.array_equal(got1, brute(0, 1, False))
