"""Checkpoint/resume lineage (SURVEY.md §4 + §5 item 5): a rebuild skips
completed phases; a killed phase re-runs and reproduces identical output."""

import json
import os
import shutil

import pyarrow.dataset as pads

from rayindex.build import build_index
from rayindex.fixtures import write_pages


from rayindex.segments import segments_digest as _segments_digest  # noqa: E402


def test_resume_skips_completed_phases(ray_session, fixture_corpus, tmp_path):
    pages = fixture_corpus.pages.slice(0, 60)
    pdir = str(tmp_path / "pages")
    write_pages(pages, pdir, 4)
    out = str(tmp_path / "idx")
    build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4)
    shard = f"{out}/shard=0"
    digest = _segments_digest(shard)
    mtime = os.path.getmtime(f"{shard}/docs")

    # full re-run: all phases skipped, outputs untouched
    m2 = build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4)
    assert os.path.getmtime(f"{shard}/docs") == mtime
    assert _segments_digest(shard) == digest
    assert m2["phases"]["segments"] < 1.0  # skip is near-instant


def test_killed_phase_reruns_and_reproduces(ray_session, fixture_corpus, tmp_path):
    pages = fixture_corpus.pages.slice(0, 60)
    pdir = str(tmp_path / "pages")
    write_pages(pages, pdir, 4)
    out = str(tmp_path / "idx")
    build_index(
        pdir, out, fixture_corpus.analyzer_spec, num_buckets=4,
        salt_df_threshold=30, salt_target=24,
    )
    shard = f"{out}/shard=0"
    digest = _segments_digest(shard)

    # simulate a crash mid-segments: output gone, manifest gone
    shutil.rmtree(f"{shard}/segments")
    os.remove(f"{shard}/_manifest/segments.json")
    build_index(
        pdir, out, fixture_corpus.analyzer_spec, num_buckets=4,
        salt_df_threshold=30, salt_target=24,
    )
    assert _segments_digest(shard) == digest


def test_config_change_invalidates(ray_session, fixture_corpus, tmp_path):
    pages = fixture_corpus.pages.slice(0, 40)
    pdir = str(tmp_path / "pages")
    write_pages(pages, pdir, 2)
    out = str(tmp_path / "idx")
    build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=4)
    shard = f"{out}/shard=0"
    m = json.load(open(f"{shard}/_manifest/docs.json"))
    key1 = m["config_key"]
    build_index(pdir, out, fixture_corpus.analyzer_spec, num_buckets=8)
    m2 = json.load(open(f"{shard}/_manifest/docs.json"))
    assert m2["config_key"] != key1
    assert json.load(open(f"{shard}/stats.json"))["num_buckets"] == 8


def test_sharded_build_and_query(ray_session, fixture_corpus, tmp_path):
    """num_shards=2 partitions the url space; merged engine sees every doc."""
    from rayindex.build import build_all
    from rayindex.oracle import build_oracle_index, oracle_search
    from rayindex.analyze import make_analyzer
    from rayindex.query import QueryEngine

    pages = fixture_corpus.pages.slice(0, 80)
    pdir = str(tmp_path / "pages")
    write_pages(pages, pdir, 4)
    out = str(tmp_path / "idx")
    build_all(pdir, out, fixture_corpus.analyzer_spec, num_shards=2, num_buckets=4)
    eng = QueryEngine(out, fixture_corpus.analyzer_spec)
    assert eng.n_docs == 80
    oidx = build_oracle_index(pages.to_pylist(), make_analyzer(fixture_corpus.analyzer_spec), num_shards=2)
    for q in fixture_corpus.queries[:12]:
        want = oracle_search(oidx, q["query"], k=10)
        got = eng.search(q["query"], k=10, with_snippets=False)
        assert [(r["doc_id"], round(r["relevance"], 9)) for r in got["data"]] == [
            (r["doc_id"], round(r["relevance"], 9)) for r in want
        ], q
        assert eng.bm25_wand(q["query"], k=5) == eng.bm25_exhaustive(q["query"], k=5)
