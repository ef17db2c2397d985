"""Streaming z-score anomaly gate: micro-batched flags equal the batch
scoring, cold keys pass through, appends effectively-once under
availableNow drains."""

import json
import os

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from graphdb_for_drones_spark.streaming.anomaly_gate import (
    flag_outliers,
    read_quarantine,
    reference_stats,
    start_anomaly_gate,
)

EV_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

# reference window: 'click' ~ N(10, small); 'view' ~ N(50, small)
REF_ROWS = [(i, "click", 10.0 + (i % 3) * 0.5) for i in range(30)] + [
    (100 + i, "view", 50.0 + (i % 5) * 1.0) for i in range(30)
]

BATCHES = [
    [
        {"event_id": 1000, "event_type": "click", "value": 10.4},  # normal
        {"event_id": 1001, "event_type": "click", "value": 500.0},  # spike
    ],
    [
        {"event_id": 1002, "event_type": "view", "value": -900.0},  # spike
        {"event_id": 1003, "event_type": "cold_key", "value": 1e9},  # no stats
    ],
]


def _write_batches(tmp_path):
    sdir = tmp_path / "in"
    sdir.mkdir()
    for i, rows in enumerate(BATCHES):
        p = sdir / f"b{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (1_700_000_000 + i * 60,) * 2)
    return sdir


def test_stream_gate_matches_batch_and_skips_cold_keys(spark, tmp_path):
    sdir = _write_batches(tmp_path)
    ref = spark.createDataFrame(REF_ROWS, EV_SCHEMA).localCheckpoint()
    stats = reference_stats(ref)
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(sdir))
    )
    out = str(tmp_path / "quarantine")
    q = start_anomaly_gate(
        stream, stats, out_dir=out, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = {r.event_id for r in read_quarantine(spark, out).collect()}
    # batch twin over the union of all batches must flag the same set
    all_rows = [
        (r["event_id"], r["event_type"], r["value"]) for b in BATCHES for r in b
    ]
    batch_df = spark.createDataFrame(all_rows, EV_SCHEMA).localCheckpoint()
    want = {r.event_id for r in flag_outliers(batch_df, stats).collect()}
    assert got == want == {1001, 1002}  # spikes only; cold key passes

    # effectively-once: a second availableNow drain appends nothing
    q2 = start_anomaly_gate(
        (
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(sdir))
        ),
        stats,
        out_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert read_quarantine(spark, out).count() == 2

    # retry/replay: a drain from a FRESH checkpoint reprocesses every
    # micro-batch (the worst-case foreachBatch retry) — dynamic
    # batch_id-partition overwrite must leave the quarantine identical,
    # not doubled.  NOTE this holds because the replay reproduces the
    # batch boundaries (same static dir, same maxFilesPerTrigger) — the
    # documented limit of the cross-lineage guarantee
    q3 = start_anomaly_gate(
        (
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(sdir))
        ),
        stats,
        out_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt_replay"),
    )
    q3.awaitTermination(120)
    rows = read_quarantine(spark, out).collect()
    assert len(rows) == 2, "replay duplicated quarantine rows"
    assert {r.event_id for r in rows} == {1001, 1002}
