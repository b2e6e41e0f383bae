"""Shared empty-partition-safe ``Dataset.join`` wrapper.

Ray Data's hash-shuffle aggregates (``groupby().aggregate(...)``) emit
zero-row, ZERO-COLUMN blocks for hash partitions that received no groups,
and empty blocks skip ``map_batches`` fns entirely — so any dataset
downstream of an aggregate can carry schema-less empty blocks all the way
into a ``Dataset.join``.  The join's ``HashShuffleAggregator.finalize``
then dies inside ``pyarrow.Table.join`` with::

    ArrowInvalid: No match or multiple matches for key field reference
    FieldRef.Name(<key>) on right side of the join

because the 0-column block can't resolve the key field.  The failure is
timing-dependent (it needs an empty hash partition to land in the joined
dataset's block list), which made three driver-gate entries flaky in
round 4 (``tfidf``, ``lm_score``, ``pmi_bigrams`` — CORRECTNESS_r04).

The guard, proven at ``textops.dedup_near_clusters`` in round 4: a plain
``repartition(n)`` merges the schema-less empties into real blocks before
the join sees them.  This module centralizes it for all join sites
(r4 VERDICT "Next round" #1).

Scale note: ``repartition`` here is a split/merge consolidation (NOT an
all-to-all shuffle) over a side that is about to be hash-shuffled by the
join anyway; on the driver-gate datasets it is noise.  Callers with a
known schema-pinned side (e.g. a raw parquet read, or a ``map_batches``
product of one) pass ``guard_left=False`` / ``guard_right=False`` to skip
the extra pass on the big stream.

A FULLY-empty side (every block schema-less — e.g. an aggregate over an
empty corpus) cannot be repaired by repartition (it rebuilds empty
schema-less blocks), and Ray's join cannot consume an empty side even
with a pinned schema — the empty block skips the hash-partition map, so
join partitions still finalize schema-less (both measured on ray 2.49).
For that case callers pass ``left_schema`` / ``right_schema`` (a
``pyarrow.Schema``): the guard materializes that side (the caller asserts
it is aggregate-sized), and when it is empty the inner join is
short-circuited to a 0-row dataset with the joined schema.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def _default_partitions() -> int:
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        ncpu = 8
    return max(2, ncpu // 2)


def _guard(
    ds: rd.Dataset, n: int, schema: pa.Schema | None
) -> tuple[rd.Dataset, bool]:
    """Returns (guarded dataset, known-fully-empty flag).  The flag is only
    ever True on the opt-in schema path: repartition cannot repair a
    FULLY-empty dataset (it rebuilds empty schema-less blocks), and Ray's
    join cannot consume an empty side even with a pinned schema (the empty
    block skips the hash-partition map, so join partitions still finalize
    schema-less) — the caller must short-circuit the join instead."""
    if schema is None:
        return ds.repartition(n), False
    # opt-in, small sides only: materialize (cheap — the caller asserts
    # this side is aggregate-sized) to learn whether anything is left
    ds = ds.repartition(n).materialize()
    return ds, ds.count() == 0


def _pa_schema(ds: rd.Dataset) -> pa.Schema:
    sch = ds.schema(fetch_if_missing=True)
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema([(name, typ) for name, typ in zip(sch.names, sch.types)])


def _empty_inner_result(
    left: rd.Dataset,
    right: rd.Dataset,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None,
    left_schema: pa.Schema | None,
    right_schema: pa.Schema | None,
) -> rd.Dataset:
    """The inner join of anything with an empty side is empty; build the
    0-row result with the joined schema (left fields + right non-key
    fields, matching ``pyarrow.Table.join`` column order) without invoking
    Ray's join at all."""
    lsch = left_schema if left_schema is not None else _pa_schema(left)
    rsch = right_schema if right_schema is not None else _pa_schema(right)
    rkeys = set(right_on if right_on is not None else on)
    fields = list(lsch) + [f for f in rsch if f.name not in rkeys]
    return rd.from_arrow(pa.schema(fields).empty_table())


def safe_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: tuple[str, ...],
    join_type: str = "inner",
    num_partitions: int | None = None,
    right_on: tuple[str, ...] | None = None,
    guard_left: bool = True,
    guard_right: bool = True,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """``left.join(right, ...)`` with both sides consolidated first so the
    hash join never receives a schema-less empty partition.  Drop-in for
    every ``Dataset.join`` call in this package."""
    n = int(num_partitions) if num_partitions else _default_partitions()
    n = max(2, n)
    left_empty = right_empty = False
    if guard_left or left_schema is not None:
        left, left_empty = _guard(left, n, left_schema)
    if guard_right or right_schema is not None:
        right, right_empty = _guard(right, n, right_schema)
    if left_empty or right_empty:
        if join_type != "inner":
            raise NotImplementedError(
                "safe_join's empty-side short-circuit only covers inner joins"
            )
        return _empty_inner_result(left, right, on, right_on,
                                   left_schema, right_schema)
    kwargs = {}
    if right_on is not None:
        kwargs["right_on"] = right_on
    return left.join(right, join_type=join_type, num_partitions=n, on=on, **kwargs)
