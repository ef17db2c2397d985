"""Kafka broker contract test — the reference's E2E CDC pipeline crosses
a real broker socket (demo_sqlite_cdc/02_benchmark/02_e2e_cdc.py:26-37,
01_unit_test/07_test_kafka_producer.py:39-75).  The engine's codec +
stream wiring (streaming/cdc.encode_envelope / read_cdc_kafka_stream /
start_cdc_apply) is fully tested through the file-stream twin; THIS
module drives the same pipeline through an actual broker when one is
reachable, and skips (environment-blocked, see COVERAGE.md S8/S9)
otherwise:

* set ``SPARK_GRAFT_KAFKA_BROKERS`` (e.g. ``localhost:9092``) to a live
  broker, and
* launch Spark with the ``spark-sql-kafka`` connector on the classpath
  (``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``) —
  the connector is not bundled with pyspark.

Both prerequisites are probed, not assumed, so the module is safe to run
anywhere and goes green automatically once the environment provides them.
"""

from __future__ import annotations

import os
import socket
import uuid

import pytest
from pyspark.sql import functions as F

from graphdb_for_drones_spark.streaming.cdc import (
    ROW_SCHEMA,
    encode_envelope,
    read_cdc_kafka_stream,
    start_cdc_apply,
)

BROKERS = os.environ.get("SPARK_GRAFT_KAFKA_BROKERS", "")


def _broker_reachable(brokers: str) -> bool:
    if not brokers:
        return False
    # first broker's host:port
    first = brokers.split(",")[0]
    host, _, port = first.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=2):
            return True
    except OSError:
        return False


def _connector_available(spark) -> bool:
    """The kafka data source is a separate artifact; probe the classpath
    instead of letting every test die on ClassNotFound."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


kafka_env = pytest.mark.skipif(
    not BROKERS, reason="environment-blocked: SPARK_GRAFT_KAFKA_BROKERS not set"
)


@kafka_env
def test_kafka_e2e_cdc_roundtrip(spark, tmp_path):
    """02_e2e_cdc.py topology: change rows -> Debezium envelopes -> the
    topic (S8 sink) -> read_cdc_kafka_stream (S9 source) -> availableNow
    drain -> net-effect state snapshot."""
    if not _broker_reachable(BROKERS):
        pytest.skip(f"environment-blocked: no broker at {BROKERS}")
    if not _connector_available(spark):
        pytest.skip("environment-blocked: spark-sql-kafka connector not on classpath")

    topic = f"cdc-contract-{uuid.uuid4().hex[:8]}"
    changes = spark.createDataFrame(
        [
            (1, "Alpha", "c", 1),
            (2, "Beta", "c", 2),
            (2, "Beta2", "u", 3),
            (1, None, "d", 4),
        ],
        "id long, payload string, op string, ts_ms long",
    )
    # S8: producer leg — envelopes to the topic through the same connector
    (
        encode_envelope(changes)
        .select(F.col("value").cast("binary").alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("topic", topic)
        .save()
    )

    # S9 + C5: consumer leg — drain the topic, fold into the snapshot
    state_path = str(tmp_path / "state")
    stream = read_cdc_kafka_stream(spark, BROKERS, topic)
    q = start_cdc_apply(
        stream,
        state_path=state_path,
        checkpoint_path=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)

    got = {(r.id, r.payload) for r in spark.read.parquet(state_path).collect()}
    assert got == {(2, "Beta2")}  # 1 created+deleted, 2 created+updated


@kafka_env
def test_kafka_drain_is_idempotent(spark, tmp_path):
    """Second availableNow drain from the same checkpoint sees no new
    offsets and leaves the snapshot untouched (C6 replay contract)."""
    if not _broker_reachable(BROKERS):
        pytest.skip(f"environment-blocked: no broker at {BROKERS}")
    if not _connector_available(spark):
        pytest.skip("environment-blocked: spark-sql-kafka connector not on classpath")

    topic = f"cdc-contract-{uuid.uuid4().hex[:8]}"
    changes = spark.createDataFrame(
        [(7, "Only", "c", 1)], "id long, payload string, op string, ts_ms long"
    )
    (
        encode_envelope(changes)
        .select(F.col("value").cast("binary").alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("topic", topic)
        .save()
    )
    state_path = str(tmp_path / "state")

    def drain():
        stream = read_cdc_kafka_stream(spark, BROKERS, topic)
        q = start_cdc_apply(
            stream,
            state_path=state_path,
            checkpoint_path=str(tmp_path / "ckpt"),
            available_now=True,
        )
        q.awaitTermination(120)

    drain()
    drain()
    rows = spark.read.parquet(state_path).collect()
    assert [(r.id, r.payload) for r in rows] == [(7, "Only")]
