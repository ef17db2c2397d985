"""Streaming z-score anomaly gate.

The batch entry (`plans.q_event_type_outliers`) sweeps finished data; a
continuously-ingesting pipeline wants the same 3σ check ON THE WAY IN —
every arriving micro-batch of events is scored against per-key
reference statistics (mean/stddev computed offline from exact decimal
moments, the batch entry's arithmetic) and flagged rows append to a
quarantine table before the events reach downstream aggregates.

Shape: the stats table is SMALL (one row per key) — pinned once with
``localCheckpoint`` and re-joined (broadcastable) against each
micro-batch inside ``foreachBatch``.  No state accumulates beyond the
written flags.  Writes are idempotent per micro-batch WITHIN one
checkpoint lineage: each batch's flags land in a ``batch_id=<n>``
partition via dynamic partition overwrite, so a micro-batch retried
after the write but before the checkpoint commit (foreachBatch's
at-least-once window) overwrites its own partition with identical rows
instead of appending duplicates — exactly-once output given the gate's
deterministic scoring.  A replay from a FRESH checkpoint is idempotent
only when the source reproduces the same batch boundaries (true for
``availableNow`` drains of a static directory with the same reader
options); batching that groups the files differently leaves stale
partitions from the earlier lineage behind.  Keys
unseen in the reference window pass through unflagged (no stats row —
the inner join drops them), mirroring how a production gate treats
cold keys until the next stats refresh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def reference_stats(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-key (mean, stddev) from exact decimal moments — the batch
    outlier entry's arithmetic (order-independent sums, so a stats
    refresh is reproducible on any cluster layout)."""
    v = F.col(value_col)
    agg = events.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v.cast("decimal(18,6)")).cast("double").alias("__s1"),
        F.sum((v * v).cast("decimal(28,10)")).cast("double").alias("__s2"),
    )
    mean = F.col("__s1") / F.col("n")
    ex2 = F.col("__s2") / F.col("n")
    return agg.select(
        key_col,
        F.col("n").alias("n_ref"),
        mean.alias("ref_mean"),
        F.sqrt(ex2 - mean * mean).alias("ref_std"),
    )


def flag_outliers(
    batch: DataFrame,
    stats: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    n_sigma: float = 3.0,
) -> DataFrame:
    """The per-batch scoring join: rows beyond ``n_sigma`` of their
    key's reference mean.  Shared by the streaming gate and its batch
    twin so stream==batch equivalence is by construction."""
    joined = batch.join(F.broadcast(stats), key_col)
    z_ok = F.abs(F.col(value_col) - F.col("ref_mean")) > (
        F.lit(float(n_sigma)) * F.col("ref_std")
    )
    return joined.filter(z_ok).select(
        batch.columns + ["ref_mean", "ref_std"]
    )


def make_apply_batch(
    pinned_stats: DataFrame,
    out_dir: str,
    key_col: str = "event_type",
    value_col: str = "value",
    n_sigma: float = 3.0,
):
    """The gate's per-micro-batch function, exposed at module level so
    failure-injection tests can re-invoke it with the SAME batch_id —
    simulating a foreachBatch retry after the quarantine write but
    before the checkpoint commit (the at-least-once window)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Idempotent-per-batch: dynamic partition overwrite into a
        # batch_id partition replaces (not duplicates) a retried batch's
        # output — foreachBatch alone is only at-least-once.
        (
            flag_outliers(batch_df, pinned_stats, key_col, value_col, n_sigma)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return apply_batch


def start_anomaly_gate(
    stream_events: DataFrame,
    stats: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "event_type",
    value_col: str = "value",
    n_sigma: float = 3.0,
    available_now: bool = True,
):
    """Append events beyond ``n_sigma`` of their key's reference mean
    to ``out_dir``.  ``stats`` is pinned once (it is re-referenced per
    micro-batch).

    Layout note: output is parquet PARTITIONED BY ``batch_id`` (the
    idempotency key).  A quarantine dir written by the pre-partitioned
    flat-append layout cannot be mixed with this one — the mix only
    fails at READ time (conflicting directory structures), so this
    refuses at start instead."""
    import glob as _glob
    import os as _os

    legacy_parts = _glob.glob(
        _os.path.join(_glob.escape(out_dir), "part-*.parquet")
    ) + _glob.glob(_os.path.join(_glob.escape(out_dir), "part-*.snappy.parquet"))
    if legacy_parts:
        raise ValueError(
            f"out_dir {out_dir!r} holds flat-append (pre-batch_id-"
            "partition) quarantine files; mixing layouts makes the dir "
            "unreadable — point the gate at a fresh out_dir"
        )
    pinned = stats.localCheckpoint()
    apply_batch = make_apply_batch(
        pinned, out_dir, key_col, value_col, n_sigma
    )
    writer = stream_events.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_quarantine(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)
