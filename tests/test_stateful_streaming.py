"""Custom stateful streaming operators: state must carry ACROSS
micro-batches (maxFilesPerTrigger=1 forces one batch per input file)."""

import json

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from graphdb_for_drones_spark.streaming.stateful import (
    running_counts,
    session_window_agg,
    streaming_first_seen,
)

IN_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("seq", LongType()),
        StructField("value", LongType()),
    ]
)


def _write_batches(tmp_path, batches):
    import os

    sdir = tmp_path / "in"
    sdir.mkdir()
    for i, rows in enumerate(batches):
        p = sdir / f"b{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        # the file source orders batches by modification time — pin it
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return sdir


def _drain(stream_df, tmp_path, mode):
    out = []
    q = (
        stream_df.writeStream.format("memory")
        .queryName("sink_" + mode)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    spark = stream_df.sparkSession
    out = spark.sql(f"SELECT * FROM sink_{mode}").collect()
    return out


@pytest.mark.slow
def test_running_counts_across_batches(spark, tmp_path):
    sdir = _write_batches(
        tmp_path,
        [
            [
                {"key": "a", "seq": 1, "value": 10},
                {"key": "a", "seq": 2, "value": 20},
                {"key": "b", "seq": 3, "value": 30},
            ],
            [
                {"key": "a", "seq": 4, "value": 40},
            ],
        ],
    )
    stream = (
        spark.readStream.schema(IN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(sdir))
    )
    rows = _drain(running_counts(stream.groupBy("key")), tmp_path, "update")
    # last emission per key wins (update mode appends each batch's rows
    # to the memory sink; take the final state per key)
    final = {}
    for r in rows:
        final[r.key] = (r.n_events, r.last_value)
    assert final["a"] == (3, 40)  # count accumulated across both batches
    assert final["b"] == (1, 30)


@pytest.mark.slow
def test_streaming_first_seen_suppresses_repeats(spark, tmp_path):
    sdir = _write_batches(
        tmp_path,
        [
            [
                {"key": "x", "seq": 5, "value": 0},
                {"key": "x", "seq": 2, "value": 0},
                {"key": "y", "seq": 7, "value": 0},
            ],
            [
                {"key": "x", "seq": 9, "value": 0},  # repeat: suppressed
                {"key": "z", "seq": 11, "value": 0},
            ],
        ],
    )
    stream = (
        spark.readStream.schema(IN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(sdir))
    )
    rows = _drain(
        streaming_first_seen(stream.groupBy("key")), tmp_path, "append"
    )
    got = {r.key: r.first_seq for r in rows}
    assert got == {"x": 2, "y": 7, "z": 11}
    assert len(rows) == 3  # exactly once per key


@pytest.mark.slow
def test_session_window_batch(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", base),
        ("u1", base + dt.timedelta(minutes=10)),  # same session
        ("u1", base + dt.timedelta(minutes=50)),  # gap 40 min → new
        ("u2", base),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp"
    ).localCheckpoint()
    got = {
        (r.user_id, r.session_start_ms): r.n_events
        for r in session_window_agg(df, gap="30 minutes").collect()
    }
    b = int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert got == {
        ("u1", b): 2,
        ("u1", b + 50 * 60 * 1000): 1,
        ("u2", b): 1,
    }


@pytest.mark.slow
def test_running_counts_unordered_chunks(spark, tmp_path):
    # force 1-row Arrow chunks: last_value must follow max(seq), not the
    # last chunk delivered (regression: per-chunk overwrite); a replayed
    # lower-seq batch must not regress last_value either
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        sdir = _write_batches(
            tmp_path,
            [
                [
                    {"key": "a", "seq": 5, "value": 50},
                    {"key": "a", "seq": 2, "value": 20},
                    {"key": "a", "seq": 4, "value": 40},
                ],
                [
                    {"key": "a", "seq": 1, "value": 10},  # late replay
                ],
            ],
        )
        stream = (
            spark.readStream.schema(IN_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(sdir))
        )
        rows = _drain(running_counts(stream.groupBy("key")), tmp_path, "update")
        final = {}
        for r in rows:
            final[r.key] = (r.n_events, r.last_value)
        assert final["a"] == (4, 50)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
