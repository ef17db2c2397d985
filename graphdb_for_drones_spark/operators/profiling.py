"""Table profiling — the ANALYZE / data-quality-monitor shape: one row
per column with row, null, and exact distinct counts plus typed min/max.
The stats a cost-based planner or a pipeline health dashboard consumes;
exact (not approximate) distincts keep every cell
driver-hash-checkable.

Plan shape: one column-PRUNED aggregate per column, unioned into a
single job whose stages run in parallel.  The tempting alternative —
every statistic in ONE wide aggregate — compiles N exact
count-distincts into an Expand that multiplies every row (N+1)× before
the shuffle: measured 2.6 s vs 0.09 s for a 6-column profile of
sf0.1 orders (29×).  On columnar storage the pruned scans together
read exactly the bytes of one wide scan, so the union plan wins at any
scale; swap `count_distinct` for `approx_count_distinct` when an
estimate suffices (the exact form is kept here for oracle parity).

Numeric and timestamp extremes surface as doubles (timestamps as epoch
milliseconds — engine-neutral, no string formatting), string extremes as
the raw data values; the other pair is typed NULL, so one fixed schema
covers every column class.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    numeric_cols: tuple = (),
    string_cols: tuple = (),
    ts_cols: tuple = (),
) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str)."""
    cols = (
        [(c, "num") for c in numeric_cols]
        + [(c, "str") for c in string_cols]
        + [(c, "ts") for c in ts_cols]
    )
    if not cols:
        raise ValueError("profile_table: no columns requested")
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")

    def one_col(c: str, kind: str) -> DataFrame:
        base = [
            F.lit(c).alias("col_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.count(F.lit(1)) - F.count(F.col(c)))
            .cast("long")
            .alias("n_nulls"),
            F.count_distinct(F.col(c)).cast("long").alias("n_distinct"),
        ]
        if kind == "num":
            ext = [
                F.min(F.col(c)).cast("double").alias("min_num"),
                F.max(F.col(c)).cast("double").alias("max_num"),
                null_s.alias("min_str"),
                null_s.alias("max_str"),
            ]
        elif kind == "ts":
            # parquet TIMESTAMP(MICROS) arrives as TIMESTAMP_NTZ; the
            # cast reinterprets under the UTC session tz (the catalog's
            # events convention) so unix_millis accepts it
            tsc = F.col(c).cast("timestamp")
            ext = [
                F.unix_millis(F.min(tsc)).cast("double").alias("min_num"),
                F.unix_millis(F.max(tsc)).cast("double").alias("max_num"),
                null_s.alias("min_str"),
                null_s.alias("max_str"),
            ]
        else:
            ext = [
                null_d.alias("min_num"),
                null_d.alias("max_num"),
                F.min(F.col(c)).alias("min_str"),
                F.max(F.col(c)).alias("max_str"),
            ]
        return df.select(F.col(c)).agg(*base, *ext)

    return reduce(
        lambda a, b: a.unionByName(b),
        (one_col(c, k) for c, k in cols),
    )
