"""Skew- and shuffle-control utilities: salting for hot keys and
bucketed tables for shuffle-free co-located joins.

The reference's delegation data is the textbook skew case (SURVEY
§7.4-2): every drone points at ONE hq value, so a shuffle on `hq_id`
sends the whole table to one reducer.  AQE's skew-join splitting handles
the join case at runtime; these utilities cover the two cases AQE does
not: hot-key AGGREGATION (two-phase salted aggregate) and repeated
co-located joins (bucketed layout — the disk-level analogue of the
reference's B-tree indexes, SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: phase 1 groups on
    (keys + salt) so a hot key spreads over ``salt_buckets`` reducers,
    phase 2 re-aggregates per key.  ``aggs`` maps output name → phase-1
    expression; phase 2 SUMs the partials, so pass only additive
    aggregates (count/sum family — min/max survive a SUM only if you
    want nonsense).

    ``salt_on``: column whose hash spreads rows (default: a per-partition
    monotonic id, deterministic in content but not across
    repartitionings — pass a real column for reproducible salting)."""
    salt_src = (
        F.xxhash64(F.col(salt_on))
        if salt_on is not None
        else F.monotonically_increasing_id()
    )
    salted = df.withColumn("__salt", F.pmod(salt_src, F.lit(salt_buckets)))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__{name}") for name, expr in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[F.sum(f"__{name}").alias(name) for name in aggs]
    )


def replicate_dim_for_salted_join(
    dim: DataFrame, salt_buckets: int = 16
) -> DataFrame:
    """Replicate a dimension table ``salt_buckets``× with a `__salt`
    column: join it against a fact table salted with
    ``pmod(xxhash64(<spread col>), salt_buckets)`` on (key, __salt) and
    the hot key's rows land on ``salt_buckets`` reducers instead of one.
    Use when the dimension is too big to broadcast but the fact side is
    skewed; with AQE skew-join on, prefer letting AQE split first."""
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias("__salt")
    return dim.select("*", salts)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join key.
    Two tables bucketed by the same key into the same bucket count join
    WITHOUT any exchange — at 100 TB this turns every frontier-expansion
    or fact-dim join on that key into a zip of co-located buckets.  The
    write costs one shuffle once; every subsequent join is shuffle-free
    (verified by tests/test_plan_shape.py::test_bucketed_join_no_exchange).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        # external table: bucketing metadata in the catalog, data at path
        w = w.option("path", path)
    w.saveAsTable(table)
