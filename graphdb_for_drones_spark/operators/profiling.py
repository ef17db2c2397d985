"""Table profiling — the ANALYZE / data-quality-monitor shape: one row
per column with row, null, and exact distinct counts plus typed min/max,
computed in a SINGLE scan (one wide aggregate row exploded into per-
column rows), where the naive formulation scans the table once per
column.  The stats a cost-based planner or a pipeline health dashboard
consumes; exact (not approximate) distincts keep every cell
driver-hash-checkable.

Numeric and timestamp extremes surface as doubles (timestamps as epoch
milliseconds — engine-neutral, no string formatting), string extremes as
the raw data values; the other pair is typed NULL, so one fixed schema
covers every column class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    numeric_cols: tuple = (),
    string_cols: tuple = (),
    ts_cols: tuple = (),
) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str).

    Plan shape: every statistic folds into ONE aggregation over ONE
    scan (count/count-distinct/min/max all partial-aggregate map-side);
    the per-column rows are an inline explode of the single result row
    — no per-column scans, no union of subqueries.  At 100 TB the
    COUNT(DISTINCT) columns are the only shuffle-heavy terms; swap in
    approx_count_distinct when an estimate suffices (the exact form is
    kept here for oracle parity)."""
    cols = (
        [(c, "num") for c in numeric_cols]
        + [(c, "str") for c in string_cols]
        + [(c, "ts") for c in ts_cols]
    )
    if not cols:
        raise ValueError("profile_table: no columns requested")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c, kind in cols:
        aggs.append(F.count(F.col(c)).cast("long").alias(f"__nn_{c}"))
        aggs.append(
            F.count_distinct(F.col(c)).cast("long").alias(f"__nd_{c}")
        )
        if kind == "num":
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__mx_{c}"))
        elif kind == "ts":
            # parquet TIMESTAMP(MICROS) arrives as TIMESTAMP_NTZ; the
            # cast reinterprets under the UTC session tz (the catalog's
            # events convention) so unix_millis accepts it
            tsc = F.col(c).cast("timestamp")
            aggs.append(
                F.unix_millis(F.min(tsc)).cast("double").alias(f"__mn_{c}")
            )
            aggs.append(
                F.unix_millis(F.max(tsc)).cast("double").alias(f"__mx_{c}")
            )
        else:
            aggs.append(F.min(F.col(c)).alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"__mx_{c}"))
    one = df.agg(*aggs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for c, kind in cols:
        is_str = kind == "str"
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (null_d if is_str else F.col(f"__mn_{c}")).alias("min_num"),
                (null_d if is_str else F.col(f"__mx_{c}")).alias("max_num"),
                (F.col(f"__mn_{c}") if is_str else null_s).alias("min_str"),
                (F.col(f"__mx_{c}") if is_str else null_s).alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
