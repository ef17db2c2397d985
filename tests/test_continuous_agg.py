"""Streaming continuous aggregates: sketch rollups maintained across
micro-batches equal their batch-built twins."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from graphdb_for_drones_spark.operators.sketches import (
    hist_build,
    hist_quantiles,
)
from graphdb_for_drones_spark.streaming.continuous_agg import (
    serve_hll_rollup,
    start_hist_continuous_rollup,
    start_hll_continuous_rollup,
)

IN_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("user_id", LongType()),
        StructField("value", LongType()),
    ]
)


def _write_batches(tmp_path, batches):
    sdir = tmp_path / "in"
    sdir.mkdir()
    for i, rows in enumerate(batches):
        p = sdir / f"b{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return sdir


def _stream(spark, sdir):
    return (
        spark.readStream.schema(IN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(sdir))
    )


@pytest.mark.slow
def test_hll_rollup_across_batches(spark, tmp_path):
    # users 0..49 for type a split across two batches with overlap:
    # the maintained rollup must estimate the distinct count of the
    # UNION (sketch union, not sum of batch counts)
    b1 = [{"event_type": "a", "user_id": u, "value": 0} for u in range(30)]
    b2 = [{"event_type": "a", "user_id": u, "value": 0} for u in range(20, 50)]
    b2 += [{"event_type": "b", "user_id": 7, "value": 0}]
    sdir = _write_batches(tmp_path, [b1, b2])
    state = str(tmp_path / "state")
    q = start_hll_continuous_rollup(
        _stream(spark, sdir),
        ["event_type"],
        "user_id",
        state,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = {
        r.event_type: (r.approx_distinct, r.n_rows)
        for r in serve_hll_rollup(spark, state, ["event_type"]).collect()
    }
    est_a, rows_a = got["a"]
    assert rows_a == 60  # row counts sum across batches
    assert abs(est_a - 50) <= 3  # distinct union, ~1.6% RSE sketch
    assert got["b"] == (1, 1)


@pytest.mark.slow
def test_hist_rollup_across_batches_equals_batch_twin(spark, tmp_path):
    rows = [
        {"event_type": "a", "user_id": 0, "value": v * 7 % 100}
        for v in range(200)
    ]
    sdir = _write_batches(tmp_path, [rows[:90], rows[90:]])
    state = str(tmp_path / "state")
    q = start_hist_continuous_rollup(
        _stream(spark, sdir),
        ["event_type"],
        "value",
        state,
        str(tmp_path / "ckpt"),
        lo=0.0,
        hi=100.0,
        buckets=50,
    )
    q.awaitTermination(120)
    maintained = {
        (r.event_type, r.bucket): r.cnt
        for r in spark.read.parquet(state).collect()
    }
    batch_df = spark.createDataFrame(
        [(r["event_type"], r["user_id"], r["value"]) for r in rows], IN_SCHEMA
    )
    direct = {
        (r.event_type, r.bucket): r.cnt
        for r in hist_build(
            batch_df, ["event_type"], "value", 0.0, 100.0, 50
        ).collect()
    }
    assert maintained == direct  # streaming merge == one-shot batch build
    # and quantile serving works straight off the maintained state
    p = hist_quantiles(
        spark.read.parquet(state), ["event_type"], 0.0, 100.0, 50
    ).first()
    assert 40 <= p.p50 <= 60
