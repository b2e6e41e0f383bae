"""Regression tests for the shared empty-partition-safe join guard
(r4 VERDICT #1: tfidf / lm_score / pmi_bigrams went driver-red on
``ArrowInvalid: No match or multiple matches for key field reference``
inside the hash-shuffle join whenever a schema-less empty aggregate
partition landed on a join side).

The poison is manufactured deterministically here: a
``groupby().aggregate()`` with far fewer distinct keys than hash
partitions emits zero-row ZERO-COLUMN blocks, and empty blocks skip
``map_batches`` fns, so they survive any map stage and reach the join.
"""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from rayindex.joins import safe_join


def _left(n: int = 1000) -> rd.Dataset:
    return rd.range(n).map_batches(
        lambda t: pa.table(
            {
                "term": pa.array([f"t{i % 5}" for i in t.column("id").to_pylist()]),
                "doc_id": t.column("id"),
            }
        ),
        batch_format="pyarrow",
    )


def _poisoned_right(n: int = 1000) -> rd.Dataset:
    """An aggregate whose hash-shuffle output carries schema-less empty
    partitions (5 distinct keys, default partition count >> 5)."""
    return (
        rd.range(n)
        .map_batches(
            lambda t: pa.table(
                {
                    "term": pa.array([f"t{i % 5}" for i in t.column("id").to_pylist()]),
                    "n": t.column("id"),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("term")
        .aggregate(Sum("n", alias_name="df"))
    )


def test_aggregate_emits_schemaless_empty_blocks(ray_session):
    """Pin the hazard itself: if a future Ray stops emitting schema-less
    empties, the guard (and this file) can be retired."""
    mat = _poisoned_right().materialize()
    shapes = [
        (ray.get(ref).num_rows, len(ray.get(ref).schema.names))
        for ref in mat.get_internal_block_refs()
    ]
    assert (0, 0) in shapes, shapes  # the poison
    assert sum(r for r, _ in shapes) == 5


def test_safe_join_survives_poisoned_right(ray_session):
    j = safe_join(
        _left(), _poisoned_right(), on=("term",), num_partitions=8, guard_left=False
    )
    t = pa.concat_tables(ray.get(j.materialize().get_internal_block_refs()))
    assert t.num_rows == 1000
    assert sorted(t.schema.names) == ["df", "doc_id", "term"]
    # spot-check a value: df for t0 = sum of ids ≡ 0 mod 5 in [0,1000)
    dfv = {r["term"]: r["df"] for r in t.select(["term", "df"]).to_pylist()}
    assert dfv["t0"] == sum(range(0, 1000, 5))


def test_safe_join_survives_poisoned_left(ray_session):
    j = safe_join(
        _poisoned_right(), _left(), on=("term",), num_partitions=8, guard_right=False
    )
    assert j.count() == 1000


def test_safe_join_fully_empty_right_with_schema(ray_session):
    sch = pa.schema([("term", pa.string()), ("df", pa.int64())])
    empty = _poisoned_right().filter(lambda r: False)
    j = safe_join(
        _left(), empty, on=("term",), num_partitions=8,
        guard_left=False, right_schema=sch,
    )
    mat = j.materialize()
    assert mat.count() == 0
    assert sorted(mat.schema().names) == ["df", "doc_id", "term"]


def test_safe_join_right_on(ray_session):
    renamed = _poisoned_right().map_batches(
        lambda t: t.rename_columns(["w", "df"]) if t.num_rows else t,
        batch_format="pyarrow",
    )
    j = safe_join(
        _left(), renamed, on=("term",), right_on=("w",),
        num_partitions=8, guard_left=False,
    )
    assert j.count() == 1000


@pytest.mark.parametrize("entry", ["tfidf", "lm_score", "pmi_bigrams"])
def test_r4_flaky_entries_run_clean(ray_session, entry, tmp_path_factory):
    """The three driver-red entries of round 4, executed end-to-end on a
    small synthetic documents table (hash-shuffle joins included)."""
    import numpy as np
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sfmini")
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(words, size=20)) for _ in range(120)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(120), pa.int64()),
                "source": pa.array(["s%d" % (i % 3) for i in range(120)]),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                "text": pa.array(texts),
            }
        ),
        str(d / "documents.parquet"),
    )
    import rayindex.textops as tx

    fn = {"tfidf": tx.tfidf, "lm_score": tx.lm_score,
          "pmi_bigrams": tx.pmi_bigrams}[entry]
    out = fn(str(d))
    cnt = out.count()
    assert cnt > 0
