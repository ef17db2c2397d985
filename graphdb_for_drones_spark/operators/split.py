"""Deterministic dataset splitting for training pipelines.

A train/val/test split at 100 TB must be (a) a pure function of the row
key — re-running the pipeline, adding columns, or repartitioning must
never move a document across splits (leakage) — and (b) computable
without any shuffle: the split column is a projection, assignable at
scan time and usable as a partition column on write.

``hash_split`` keys on md5(key || ':' || seed) so the assignment is
reproducible in any engine (the DuckDB oracle replays it exactly);
``stratified_counts`` is the QA query every split ships with: per
(stratum, split) counts to check the split preserved the stratum mix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SPLITS = (("train", 0.8), ("val", 0.1), ("test", 0.1))


def split_assignment(
    key_col: Column, splits=DEFAULT_SPLITS, seed: int = 42, modulus: int = 10_000
) -> Column:
    """Split label as a pure projection of the key: the first 15 hex
    chars of md5("{key}:{seed}") mod ``modulus`` land in cumulative
    weight ranges.  15 hex chars = 60 bits — exact in signed-64
    arithmetic on any engine (same trick as ``simhash_md5``)."""
    h = F.conv(
        F.substring(F.md5(F.concat(key_col.cast("string"), F.lit(f":{seed}"))), 1, 15),
        16,
        10,
    ).cast("long")
    slot = F.pmod(h, F.lit(modulus))
    expr = None
    acc = 0.0
    for name, w in splits:
        acc += w
        bound = int(round(acc * modulus))
        cond = slot < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr.otherwise(F.lit(splits[-1][0]))


def hash_split(
    df: DataFrame,
    key_col: str,
    splits=DEFAULT_SPLITS,
    seed: int = 42,
) -> DataFrame:
    """Attach a ``split`` column — deterministic, shuffle-free, stable
    under reruns/repartitioning.  Write partitioned by it and each split
    is a partition-pruned read."""
    return df.withColumn(
        "split", split_assignment(F.col(key_col), splits, seed)
    )


def stratified_counts(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    splits=DEFAULT_SPLITS,
    seed: int = 42,
) -> DataFrame:
    """Split-QA rollup: (stratum, split, n_rows) — verifies each stratum
    keeps the global split ratios (hash splits are stratified in
    expectation; this query is how you CHECK it, per stratum)."""
    return (
        hash_split(df, key_col, splits, seed)
        .groupBy(F.col(stratum_col).alias("stratum"), "split")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
