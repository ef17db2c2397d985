"""Streaming distribution-drift monitor.

The batch entry (`plans.q_source_drift_stats` →
`operators/stats.distribution_drift`) sweeps finished data; an
ingesting pipeline wants the SAME drift report updated as slices
arrive — each micro-batch's rows are binned against the FROZEN
reference geometry (bounds collected once at monitor start), the
(g, bin) counts land idempotently per batch, and the report recomputes
TVD / smoothed chi-square / max-gap from the RUNNING totals.

Why counts, not statistics: histogram counts are the op's only
mergeable state — plain SUM across batches reproduces the batch
histogram exactly, so the final report equals the batch operator on the
union of all drained rows BY CONSTRUCTION (`drift_from_bin_counts` is
the shared math half; the monitor never re-implements a fold).  No
row-level state accumulates: state size is |groups| × n_bins counts
regardless of ingest volume — the 100 TB property.

Idempotence: each batch's counts overwrite their own ``batch_id``
partition (dynamic partition overwrite, the anomaly-gate contract), so
a foreachBatch retry inside the at-least-once window replaces identical
rows instead of double-counting — effectively-once totals under
availableNow re-drains of the same source layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators.stats import (
    bin_counts,
    drift_from_bin_counts,
)


def reference_geometry(
    ref_df: DataFrame, value_col: str, n_bins: int = 10
) -> tuple[tuple[int, int], DataFrame]:
    """(bounds, reference (g='__ref__', b, c) counts) from the offline
    reference slice — one setup-time action for the two scalars; the
    counts table is n_bins rows, pinned by the caller."""
    row = ref_df.agg(
        F.min(value_col).cast("long").alias("lo"),
        F.max(value_col).cast("long").alias("hi"),
    ).first()
    if row.lo is None:
        raise ValueError("reference slice is empty — drift is undefined")
    bounds = (int(row.lo), int(row.hi))
    counts = bin_counts(
        ref_df.select(
            F.lit("__ref__").alias("__g"), F.col(value_col)
        ),
        "__g",
        value_col,
        n_bins=n_bins,
        bounds=bounds,
    )
    return bounds, counts


def make_apply_batch(
    bounds: tuple[int, int],
    out_dir: str,
    group_col: str,
    value_col: str,
    n_bins: int = 10,
):
    """The monitor's per-micro-batch function, module-level so retry
    tests can re-invoke it with the SAME batch_id (the at-least-once
    window)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            bin_counts(
                batch_df, group_col, value_col, n_bins=n_bins, bounds=bounds
            )
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return apply_batch


def start_drift_monitor(
    stream_df: DataFrame,
    ref_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    group_col: str,
    value_col: str,
    n_bins: int = 10,
    available_now: bool = True,
):
    """Accumulate per-batch bin counts for ``stream_df`` against
    ``ref_df``'s frozen bin geometry.  Read the report any time with
    ``drift_report`` — it reflects every committed batch."""
    bounds, ref_counts = reference_geometry(ref_df, value_col, n_bins)
    # persist the reference counts beside the stream counts so the
    # report is self-contained (readable without re-deriving geometry)
    ref_counts.withColumn("batch_id", F.lit(-1)).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy(
        "batch_id"
    ).parquet(out_dir)
    apply_batch = make_apply_batch(
        bounds, out_dir, group_col, value_col, n_bins
    )
    writer = stream_df.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drift_report(
    spark: SparkSession, out_dir: str, n_bins: int = 10
) -> DataFrame:
    """Drift statistics over every committed batch: SUM the accumulated
    (g, b) counts (including the ``batch_id=-1`` reference partition)
    and run the SHARED math half — bit-identical to
    ``distribution_drift`` on the union of all drained rows."""
    counts = spark.read.parquet(out_dir).select("g", "b", "c")
    return drift_from_bin_counts(counts, "g", "__ref__", n_bins)
