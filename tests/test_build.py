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
