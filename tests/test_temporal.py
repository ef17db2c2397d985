"""asof_join and sessionize on hand-built micro-fixtures."""

from datetime import datetime

from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators.temporal import (
    asof_join,
    session_stats,
    sessionize,
)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 250), (3, "u2", 50)],
        "event_id long, user_id string, ts long",
    ).localCheckpoint()
    right = spark.createDataFrame(
        [("u1", 90, 9.0), ("u1", 200, 20.0), ("u2", 60, 6.0)],
        "user_id string, rts long, v double",
    ).localCheckpoint()
    out = {
        r.event_id: (r.asof_v, r.asof_ts)
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="rts", value_col="v"
        ).collect()
    }
    assert out[1] == (9.0, 90)  # latest right at-or-before 100
    assert out[2] == (20.0, 200)
    assert out[3] == (None, None)  # u2's only right row is after ts=50


def test_asof_tie_matches_equal_ts(spark):
    left = spark.createDataFrame(
        [(1, "u", 100)], "event_id long, user_id string, ts long"
    ).localCheckpoint()
    right = spark.createDataFrame(
        [("u", 100, 1.0)], "user_id string, rts long, v double"
    ).localCheckpoint()
    row = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="rts", value_col="v"
    ).first()
    assert row.asof_v == 1.0  # right row at exactly left_ts matches


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, "u1", datetime.utcfromtimestamp(t)) for i, t in enumerate(rows)],
        "event_id long, user_id string, ts timestamp",
    ).localCheckpoint()


def test_sessionize_gap(spark):
    # gaps: 10 min (same session), 31 min (new), 1 min (same)
    ev = _ev(spark, [0, 600, 600 + 31 * 60, 600 + 32 * 60])
    got = {
        r.event_id: r.session_seq
        for r in sessionize(ev, gap_ms=30 * 60 * 1000).collect()
    }
    assert got == {0: 1, 1: 1, 2: 2, 3: 2}


def test_session_stats(spark):
    ev = _ev(spark, [0, 600, 600 + 31 * 60])
    rows = {
        r.session_seq: r
        for r in session_stats(ev, gap_ms=30 * 60 * 1000).collect()
    }
    assert rows[1].n_events == 2 and rows[1].duration_ms == 600_000
    assert rows[2].n_events == 1 and rows[2].duration_ms == 0
    assert rows[1].session_start_ms == 0


def test_sessionize_single_event_user(spark):
    ev = spark.createDataFrame(
        [(1, "solo", datetime.utcfromtimestamp(42))],
        "event_id long, user_id string, ts timestamp",
    ).localCheckpoint()
    assert sessionize(ev).first().session_seq == 1


def test_range_join_bucketized(spark):
    from graphdb_for_drones_spark.operators.temporal import range_join

    pts = spark.createDataFrame(
        [(1, 1_000), (2, 5_000), (3, 10_000), (4, 10_001)],
        "pid long, tsm long",
    ).localCheckpoint()
    iv = spark.createDataFrame(
        [("w1", 0, 5_000), ("w2", 4_000, 11_000)],
        "wid string, s long, e long",
    ).localCheckpoint()
    got = sorted(
        (r.pid, r.wid)
        for r in range_join(pts, iv, "tsm", "s", "e", bucket_ms=1_000).collect()
    )
    # end exclusive: tsm=5000 not in w1 [0,5000); both 10000/10001 in w2
    assert got == [(1, "w1"), (2, "w2"), (3, "w2"), (4, "w2")]


def test_range_join_no_matches(spark):
    from graphdb_for_drones_spark.operators.temporal import range_join

    pts = spark.createDataFrame([(1, 100)], "pid long, tsm long").localCheckpoint()
    iv = spark.createDataFrame(
        [("w", 200, 300)], "wid string, s long, e long"
    ).localCheckpoint()
    assert range_join(pts, iv, "tsm", "s", "e", bucket_ms=50).count() == 0


def test_asof_join_property_random(spark):
    # randomized check vs an independent reference: for each left row,
    # asof value == right value at the greatest rts <= ts (distinct rts
    # per key by construction)
    import random

    rng = random.Random(7)
    keys = ["a", "b", "c"]
    left_rows = [
        (i, rng.choice(keys), rng.randrange(0, 1000)) for i in range(60)
    ]
    right_rows = [
        (rng.choice(keys), 2 * j + 1, float(j)) for j in range(80)
    ]
    left = spark.createDataFrame(
        left_rows, "event_id long, user_id string, ts long"
    ).localCheckpoint()
    right = spark.createDataFrame(
        right_rows, "user_id string, rts long, v double"
    ).localCheckpoint()

    def ref(k, ts):
        elig = [(rts, v) for rk, rts, v in right_rows if rk == k and rts <= ts]
        return max(elig)[1] if elig else None

    from graphdb_for_drones_spark.operators.temporal import asof_join

    got = {
        r.event_id: r.asof_v
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="rts",
            value_col="v",
        ).collect()
    }
    for eid, k, ts in left_rows:
        assert got[eid] == ref(k, ts), (eid, k, ts)


def test_range_join_negative_epochs_floor_bucket(spark):
    # floor (not truncate-toward-zero) bucketing: ts=-1500 lives in bucket
    # -2 with bucket_ms=1000; interval [-2000,-1000) covers exactly bucket
    # -2, so the pair must meet (truncation would put the point in -1)
    from graphdb_for_drones_spark.operators.temporal import range_join

    pts = spark.createDataFrame([(1, -1500)], "pid long, tsm long")
    iv = spark.createDataFrame(
        [("w", -2000, -1000)], "wid string, s long, e long"
    )
    got = [
        (r.pid, r.wid)
        for r in range_join(pts, iv, "tsm", "s", "e", bucket_ms=1000).collect()
    ]
    assert got == [(1, "w")]


def test_range_join_inverted_interval_dropped(spark):
    # end <= start intervals contribute nothing (and generate no
    # descending-sequence candidate explosion)
    from graphdb_for_drones_spark.operators.temporal import range_join

    pts = spark.createDataFrame([(1, 500)], "pid long, tsm long")
    iv = spark.createDataFrame(
        [("bad", 9_000, 0), ("empty", 500, 500), ("ok", 0, 1_000)],
        "wid string, s long, e long",
    )
    got = sorted(
        (r.pid, r.wid)
        for r in range_join(pts, iv, "tsm", "s", "e", bucket_ms=100).collect()
    )
    assert got == [(1, "ok")]
