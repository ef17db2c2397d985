"""P8 poll, M11 diff-as-changes, C7 observe metrics."""

from pyspark.sql import functions as F

from graphdb_for_drones_spark.mutation import diff_as_changes
from graphdb_for_drones_spark.streaming.cdc import (
    apply_cdc_batch,
    observe_latency_stages,
    poll_changes,
)


def test_poll_changes(spark):
    log = spark.createDataFrame(
        [(i, "INSERT", i * 10) for i in range(10)],
        "change_id long, operation string, row_id long",
    ).coalesce(1).localCheckpoint()
    got = poll_changes(log, last_id=6).collect()
    assert [r.change_id for r in got] == [7, 8, 9]


def test_diff_as_changes_roundtrip(spark):
    before = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "id long, payload string"
    ).coalesce(1).localCheckpoint()
    after = spark.createDataFrame(
        [(1, "one"), (2, "two-v2"), (4, "four")], "id long, payload string"
    ).coalesce(1).localCheckpoint()
    ch = diff_as_changes(before, after, "id").localCheckpoint()
    ops = {r.id: r.op for r in ch.collect()}
    assert ops == {2: "u", 3: "d", 4: "c"}
    # applying the derived changes to `before` reproduces `after`
    replayed = apply_cdc_batch(before, ch)
    assert sorted(map(tuple, replayed.collect())) == sorted(map(tuple, after.collect()))


def test_observe_latency(spark):
    ch = spark.createDataFrame(
        [(1, "a", "c", 100), (2, "b", "c", 200)],
        "id long, payload string, op string, ts_ms long",
    )
    observed = observe_latency_stages(ch, now_ms_col=F.lit(1000))
    observed.collect()
    # observation names are attached to the plan; collect must succeed and
    # rows flow through unchanged
    assert observed.count() == 2
