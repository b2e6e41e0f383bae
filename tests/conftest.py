"""Session-scoped Ray + a shared built index over the conformance fixture."""

from __future__ import annotations

import shutil

import pytest

import ray


@pytest.fixture(scope="session")
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_corpus():
    from rayindex.fixtures import gen_fixture

    return gen_fixture(n_pages=200, n_lemmas=80, seed=42)


@pytest.fixture(scope="session")
def built_index(ray_session, fixture_corpus, tmp_path_factory):
    """Build the index once for the whole session (small salt threshold so
    head-term salting is exercised)."""
    from rayindex.build import build_index
    from rayindex.fixtures import write_pages

    root = tmp_path_factory.mktemp("index_build")
    pages_dir = str(root / "pages")
    out_dir = str(root / "index")
    write_pages(fixture_corpus.pages, pages_dir, n_fragments=8)
    metrics = build_index(
        pages_dir,
        out_dir,
        fixture_corpus.analyzer_spec,
        num_buckets=8,
        salt_df_threshold=40,
        salt_target=48,
        lemma_batch_size=64,
    )
    yield {"pages_dir": pages_dir, "out_dir": out_dir, "metrics": metrics}
    shutil.rmtree(str(root), ignore_errors=True)


@pytest.fixture(scope="session")
def oracle_index(fixture_corpus):
    from rayindex.analyze import make_analyzer
    from rayindex.oracle import build_oracle_index

    return build_oracle_index(
        fixture_corpus.pages.to_pylist(), make_analyzer(fixture_corpus.analyzer_spec)
    )


@pytest.fixture(scope="session")
def engine(built_index, fixture_corpus):
    from rayindex.query import QueryEngine

    return QueryEngine(built_index["out_dir"], fixture_corpus.analyzer_spec)
