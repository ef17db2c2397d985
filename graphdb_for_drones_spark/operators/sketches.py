"""Mergeable-sketch rollups — the hypertable/continuous-aggregate
pattern: build fine-grained sketches once, merge them to any coarser
grain without rescanning the facts.

Uses Spark's built-in Apache DataSketches HLL functions
(`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`, JVM-side):
a daily (key, sketch) table is O(keys × days × sketch_size) and answers
weekly/monthly/all-time distinct-count questions by sketch union — at
100 TB this replaces repeated full-scan COUNT(DISTINCT) with reads of a
tiny rollup table, and sketches merge associatively so the rollup
parallelizes/shuffles like any aggregation.

Accuracy: HLL with lgConfigK=12 is ~1.6% RSE; tests pin a 5% tolerance
against exact distinct counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_build(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Fine-grain sketch table: one HLL sketch of ``distinct_col`` per
    key combination.  Persist this instead of raw facts for
    distinct-count serving."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(distinct_col), F.lit(lgk)).alias("hll"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_rollup(
    sketches: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Merge sketches to a coarser grain (drop some key columns) and
    estimate: the continuous-aggregate rollup step.  No access to the
    original facts."""
    return (
        sketches.groupBy(*keys)
        .agg(
            F.hll_union_agg(F.col("hll")).alias("hll"),
            F.sum("n_rows").alias("n_rows"),
        )
        .select(
            *keys,
            F.hll_sketch_estimate(F.col("hll")).cast("long").alias(
                "approx_distinct"
            ),
            "n_rows",
        )
    )
