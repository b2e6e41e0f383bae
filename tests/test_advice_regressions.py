"""Round-2 regressions from the external review (ADVICE.md):

1. a zero-row SHARD (sharding/url_filter drains it while the global input is
   non-empty) must produce a complete empty shard, not crash P2;
2. bit-identical duplicate pages split across batches must leave exactly ONE
   surviving doc (winner selection is an exact groupby, not batch-local);
3. shard-namespaced doc ids: cross-shard doc_id collisions are impossible by
   construction, and id uniqueness holds at scale;
4. multi-shard query results equal the single-shard build's results.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from rayindex.build import build_all, build_index
from rayindex.query import QueryEngine
from rayindex.schema import doc_ids_for_urls, hash64_strings


def test_zero_row_shard_completes(ray_session, fixture_corpus, tmp_path):
    """4 pages over 8 shards: most shards receive zero rows and must still
    produce schema-correct empty outputs (was: KeyError 'Column url ...')."""
    pages = fixture_corpus.pages.slice(0, 4)
    pdir = str(tmp_path / "pages")
    os.makedirs(pdir)
    pq.write_table(pages, f"{pdir}/part-0.parquet")
    out = str(tmp_path / "idx")
    build_all(pdir, out, fixture_corpus.analyzer_spec, num_shards=8, num_buckets=4)
    eng = QueryEngine(out, fixture_corpus.analyzer_spec)
    assert eng.n_docs == 4
    total_docs = sum(
        pads.dataset(f"{out}/shard={s}/docs").to_table().num_rows for s in range(8)
    )
    assert total_docs == 4
    # empty shards are typed (schema-pinned), not schema-less
    for s in range(8):
        t = pads.dataset(f"{out}/shard={s}/docs").to_table()
        assert "url" in t.schema.names


def test_bit_identical_dups_cross_batch_exactly_one_survives(
    ray_session, fixture_corpus, tmp_path
):
    """ADVICE repro: extract_batch_size=1 puts each copy in its own batch;
    the old batch-local keep='first' let both survive (7 docs / inflated
    total_tf).  The exact per-doc_id groupby must keep exactly one."""
    base = fixture_corpus.pages.slice(0, 6)
    dup = fixture_corpus.pages.slice(2, 1)  # bit-identical copy of row 2
    pdir = str(tmp_path / "pages")
    os.makedirs(pdir)
    pq.write_table(base, f"{pdir}/part-0.parquet")
    pq.write_table(dup, f"{pdir}/part-1.parquet")
    out = str(tmp_path / "idx")
    build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4,
                extract_batch_size=1)
    docs = pads.dataset(f"{out}/shard=0/docs").to_table()
    assert docs.num_rows == 6
    eng = QueryEngine(out, fixture_corpus.analyzer_spec)
    assert eng.n_docs == 6
    # compare against a dedup-free reference build of the 6 unique rows
    out_ref = str(tmp_path / "idx_ref")
    pdir_ref = str(tmp_path / "pages_ref")
    os.makedirs(pdir_ref)
    pq.write_table(base, f"{pdir_ref}/part-0.parquet")
    build_index(pdir_ref, out_ref, fixture_corpus.analyzer_spec, num_buckets=4)
    ref = QueryEngine(out_ref, fixture_corpus.analyzer_spec)
    assert eng.total_tf == ref.total_tf
    assert eng.site_pages == ref.site_pages


def test_doc_id_cross_shard_disjoint_and_unique():
    """Shard index in the LOW bits: ids from different shards can never be
    equal, and the id space stays collision-free at 10^6 urls (birthday
    expectation ~4e-7 collisions in 2^60 per-shard space)."""
    n, num_shards = 1_000_000, 8
    urls = np.array([f"https://s{i % 97}.example/p/{i:09d}" for i in range(n)], dtype=object)
    shard_of = (hash64_strings(urls) % np.uint64(num_shards)).astype(np.int64)
    all_ids = []
    for s in range(num_shards):
        sel = urls[shard_of == s]
        ids = doc_ids_for_urls(sel, s, num_shards)
        # low bits encode the shard
        assert (ids & (num_shards - 1) == s).all()
        assert (ids >= 0).all()
        all_ids.append(ids)
    cat = np.concatenate(all_ids)
    assert len(np.unique(cat)) == n
    # unsharded derivation unchanged (layout compatibility for num_shards=1)
    one = doc_ids_for_urls(urls[:10])
    legacy = (hash64_strings(urls[:10]) >> np.uint64(1)).astype(np.int64)
    assert (one == legacy).all()


def test_multi_shard_equals_single_shard_results(ray_session, fixture_corpus, tmp_path):
    pages = fixture_corpus.pages.slice(0, 60)
    pdir = str(tmp_path / "pages")
    os.makedirs(pdir)
    pq.write_table(pages, f"{pdir}/part-0.parquet")
    out1 = str(tmp_path / "idx1")
    out4 = str(tmp_path / "idx4")
    build_index(pdir, out1, fixture_corpus.analyzer_spec, num_buckets=4)
    build_all(pdir, out4, fixture_corpus.analyzer_spec, num_shards=4, num_buckets=4)
    e1 = QueryEngine(out1, fixture_corpus.analyzer_spec)
    e4 = QueryEngine(out4, fixture_corpus.analyzer_spec)
    assert e1.n_docs == e4.n_docs and e1.total_tf == e4.total_tf
    for li in (0, 5, 20):
        q = fixture_corpus.forms[fixture_corpus.lemmas[li]][0]
        r1 = e1.search(q, k=None, with_snippets=False)
        r4 = e4.search(q, k=None, with_snippets=False)
        assert r1["count"] == r4["count"], q
        # same result SET with same scores (doc ids differ by namespace, so
        # compare by url)
        m1 = e1.doc_meta([r["doc_id"] for r in r1["data"]])
        m4 = e4.doc_meta([r["doc_id"] for r in r4["data"]])
        s1 = {m1[r["doc_id"]]["url"]: round(r["relevance"], 12) for r in r1["data"]}
        s4 = {m4[r["doc_id"]]["url"]: round(r["relevance"], 12) for r in r4["data"]}
        assert s1 == s4, q


def test_dup_membership_bloom_mode(monkeypatch):
    """Bloom-mode membership: zero false negatives; false positives are
    harmless by construction (they divert rows to the exact side path)."""
    import rayindex.build as B

    monkeypatch.setattr(B, "DUP_BLOOM_THRESHOLD", 50)
    rng = np.random.default_rng(7)
    dups = np.unique(rng.integers(0, 2**62, 2000).astype(np.int64))
    m = B._DupMembership(dups)
    assert m.exact is None  # bloom engaged above the (patched) threshold
    assert m.contains(dups).all()  # no false negatives, ever
    probe = rng.integers(0, 2**62, 100_000).astype(np.int64)
    fp = (m.contains(probe) & ~np.isin(probe, dups)).mean()
    assert fp < 0.02  # ~1 % design point at 10 bits/key, 7 probes
