"""SQLite trigger-based CDC source — the reference's actual capture flow.

Reference pipeline (demo_sqlite_cdc/01_unit_test/05_trigger_cdc_test.py):
AFTER INSERT/UPDATE/DELETE triggers on ``items`` append rows to a
``change_log`` table (change_id AUTOINCREMENT, operation, table_name,
row_id, old_name, new_name, timestamp — :23-51); a poller reads
``WHERE change_id > last_id ORDER BY change_id`` (:91-97) and ships the
events onward (Kafka in 07_test_kafka_producer.py).

This module is the engine-side bridge: the change_log is read through
the distributed SQLite source (rowid ranges + the incremental predicate
pushed into SQLite), normalized into the CDC change-row shape
(id, payload, op, ts_ms) that ``streaming.cdc.apply_cdc_batch``
dispatches, with ``change_id`` as the per-key ordering sequence (the
reference's monotone ordering key).  Together with the triggers (owned
by the writer application, exactly as in the reference) this runs the
full capture → poll → net-effect apply loop against a real SQLite file,
no broker required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_for_drones_spark.sources.sqlite_src import read_sqlite

# reference operation names → Debezium-style op codes used across
# streaming/cdc.py (c=create, u=update, d=delete)
_OP_MAP = {"INSERT": "c", "UPDATE": "u", "DELETE": "d"}


def read_change_log(
    spark: SparkSession,
    db_path: str,
    last_id: int = 0,
    table: str = "change_log",
    num_partitions: int = 4,
    upper_id: int | None = None,
) -> DataFrame:
    """Incremental poll of the trigger-maintained change_log: only rows
    with ``change_id > last_id``, filtered inside SQLite (the predicate
    rides the partition queries), exactly the reference's poll loop.

    ``upper_id`` closes the window on the right (``change_id <= upper_id``)
    so a batch stays deterministic under a concurrent writer: every action
    re-reads the SQLite file, and an unbounded predicate would pull in rows
    appended after the high-water mark was computed."""
    pred = f"change_id > {int(last_id)}"
    if upper_id is not None:
        pred += f" AND change_id <= {int(upper_id)}"
    return read_sqlite(
        spark,
        db_path,
        table,
        num_partitions=num_partitions,
        predicate=pred,
    )


def changes_to_cdc(log_df: DataFrame) -> DataFrame:
    """change_log rows → CDC change rows (id, payload, op, ts_ms).

    ``row_id`` keys the change, ``new_name`` is the after-image payload
    (NULL for deletes, like a Debezium ``after``), and ``change_id``
    becomes the ordering sequence — the reference applies events in
    change_id order, and ``reduce_batch_per_key`` folds per key by the
    same column."""
    op = F.col("operation")
    mapped = F.coalesce(
        *[F.when(op == k, F.lit(v)) for k, v in _OP_MAP.items()]
    )
    return log_df.select(
        F.col("row_id").alias("id"),
        F.col("new_name").alias("payload"),
        mapped.alias("op"),
        F.col("change_id").cast("long").alias("ts_ms"),
    )


def poll_and_apply(
    spark: SparkSession,
    db_path: str,
    state: DataFrame,
    last_id: int,
    table: str = "change_log",
) -> tuple[DataFrame, int]:
    """One reference poll iteration: read new change_log rows, fold them
    into the state snapshot, return (next_state, next_last_id).

    The high-water mark is the max change_id of the polled batch — a
    one-row aggregate, not a log materialization.  The batch that feeds
    the apply is then re-read with BOTH bounds
    (``last_id < change_id <= hwm``): under a concurrent writer (the
    reference's topology) a one-sided predicate would lazily pull rows
    past the returned high-water mark into this batch on every later
    action AND re-poll them next round — double-apply and
    action-to-action non-determinism unless the caller checkpoints."""
    from graphdb_for_drones_spark.streaming.cdc import apply_cdc_batch

    log = read_change_log(spark, db_path, last_id, table)
    hwm = log.agg(F.max("change_id").alias("m")).first().m
    if hwm is None:
        return state, last_id
    bounded = read_change_log(
        spark, db_path, last_id, table, upper_id=int(hwm)
    )
    changes = changes_to_cdc(bounded)
    return apply_cdc_batch(state, changes, seq_col="ts_ms"), int(hwm)
