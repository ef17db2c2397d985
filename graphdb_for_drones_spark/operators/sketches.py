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
from pyspark.sql.window import Window


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


def hist_build(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    buckets: int = 200,
) -> DataFrame:
    """Mergeable QUANTILE sketch as a fixed-range histogram: per key, a
    (bucket, cnt) table with ``buckets`` equal-width bins over [lo, hi)
    (out-of-range values clamp to the edge bins).  Histograms merge by
    summing bucket counts — the same continuous-aggregate algebra as the
    HLL sketches — and, unlike t-digest/KLL, every step is plain integer
    arithmetic, so quantile serving is EXACTLY reproducible in any SQL
    engine (the oracle twin proves it).  Error is bounded by the bin
    width (hi−lo)/buckets."""
    width = (hi - lo) / buckets
    b = F.least(
        F.lit(buckets - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int"),
        ),
    )
    return df.groupBy(*keys, b.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def hist_rollup(hist: DataFrame, keys: list[str]) -> DataFrame:
    """Merge histogram sketches to a coarser grain: sum bucket counts."""
    return hist.groupBy(*keys, "bucket").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    hist: DataFrame,
    keys: list[str],
    lo: float,
    hi: float,
    buckets: int = 200,
    qs: tuple = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Serve quantiles from a histogram sketch without touching the
    facts: per key, the q-quantile estimate is the UPPER EDGE of the
    first bucket whose cumulative count reaches q·total (deterministic
    rule; error <= one bin width).  One window pass + one grouped
    conditional-min per quantile."""
    width = (hi - lo) / buckets
    wc = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*keys)
    cc = hist.select(
        *keys,
        "bucket",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wt).alias("total"),
    )
    aggs = [
        F.min(
            F.when(F.col("cum") >= F.col("total") * F.lit(q), F.col("bucket"))
        ).alias(f"__b{i}")
        for i, q in enumerate(qs)
    ]
    out = cc.groupBy(*keys).agg(*aggs)
    return out.select(
        *keys,
        *[
            (F.lit(lo) + (F.col(f"__b{i}") + 1) * F.lit(width)).alias(
                f"p{int(q * 100)}"
            )
            for i, q in enumerate(qs)
        ],
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
