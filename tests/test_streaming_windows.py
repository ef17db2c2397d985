"""Structured-Streaming windowed aggregation parity: the same tumbling
window over a file stream (with watermark) must equal the batch result
once the stream drains — the engine's generalization of the reference's
ordered-replay guarantee (SURVEY §2.8 C6)."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


@pytest.mark.slow
def test_windowed_stream_equals_batch(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=7 * i), "click" if i % 2 else "view", float(i))
        for i in range(40)
    ]
    batch_df = spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).localCheckpoint()

    def windowed(df):
        return (
            df.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
            .select(
                F.unix_timestamp("w.start").alias("ws"), "event_type", "n", "sv"
            )
        )

    expected = sorted(tuple(r) for r in windowed(batch_df).collect())

    # stream the same rows from json files, two files to force two batches
    sdir = tmp_path / "in"
    sdir.mkdir()
    for part in (0, 1):
        lines = [
            json.dumps(
                {
                    "event_id": r[0],
                    "ts": r[1].strftime("%Y-%m-%dT%H:%M:%S"),
                    "event_type": r[2],
                    "value": r[3],
                }
            )
            for r in rows[part * 20 : (part + 1) * 20]
        ]
        (sdir / f"p{part}.json").write_text("\n".join(lines))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(sdir))
        .withWatermark("ts", "2 hours")
    )
    out_dir = tmp_path / "out"
    q = (
        windowed(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_agg")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM win_agg").collect())
    assert got == expected
