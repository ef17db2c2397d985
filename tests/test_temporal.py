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


def test_resample_counts_fills_gaps_with_zero(spark):
    from graphdb_for_drones_spark.operators.temporal import resample_counts
    import datetime as dt

    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 10), 1.0),
        ("a", dt.datetime(2024, 1, 1, 0, 50), 2.0),
        # hour 1 silent -> must EXIST with n=0
        ("a", dt.datetime(2024, 1, 1, 2, 5), 4.0),
        ("b", dt.datetime(2024, 1, 1, 5, 0), 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    ).localCheckpoint()
    out = {
        (r.grp, r.bucket_start): (r.n, r.total)
        for r in resample_counts(
            df, "ts", "event_type", 3_600_000, value_col="value"
        ).collect()
    }
    h0 = 1704067200000  # 2024-01-01T00:00Z
    hr = 3_600_000
    assert out[("a", h0)] == (2, 3.0)
    assert out[("a", h0 + hr)] == (0, 0.0)  # the silent hour
    assert out[("a", h0 + 2 * hr)] == (1, 4.0)
    # group b spans one bucket only -> exactly one row
    assert out[("b", h0 + 5 * hr)] == (1, 7.0)
    assert len([k for k in out if k[0] == "b"]) == 1
    assert len([k for k in out if k[0] == "a"]) == 3


def test_resample_counts_without_value_col(spark):
    from graphdb_for_drones_spark.operators.temporal import resample_counts
    import datetime as dt

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 0, 0))], "event_type string, ts timestamp"
    ).localCheckpoint()
    rows = resample_counts(df, "ts", "event_type").collect()
    assert len(rows) == 1 and rows[0].n == 1
    assert "total" not in rows[0].asDict()


def test_zscore_outlier_entry_flags_planted_spike(spark, tmp_path):
    # build a tiny parquet sf dir: one type with a far outlier
    import datetime as dt
    from graphdb_for_drones_spark.plans.extra_queries import (
        q_event_type_outliers,
    )

    vals = [10.0] * 20 + [10.5] * 20 + [1000.0]
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), i % 7, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/events.parquet")
    out = q_event_type_outliers(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_events == 41 and r.n_outliers == 1
    assert r.mean_value > 10 and r.stddev_value > 100


def test_mad_outliers_immune_to_spike_inflation(spark, tmp_path):
    # the MAD gate must flag spikes that a handful of extreme values
    # would hide from the plain 3-sigma gate (sigma inflation)
    import datetime as dt
    from graphdb_for_drones_spark.plans.extra_queries import (
        q_event_type_outliers,
        q_event_type_robust_outliers,
    )

    vals = [10.0] * 40 + [10.5] * 40 + [120.0] * 10  # moderate spikes
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i % 60), i % 7, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/events.parquet")
    robust = q_event_type_robust_outliers(spark, sf).collect()[0]
    plain = q_event_type_outliers(spark, sf).collect()[0]
    # the spikes inflate sigma enough that the plain gate misses them...
    assert plain.n_outliers == 0
    # ...while MAD (median-based) flags exactly the 10 spikes
    assert robust.n_outliers == 10
    assert robust.median_value == 10.5


def test_islands_value_change_collapse(spark):
    import datetime as dt

    from graphdb_for_drones_spark.operators.temporal import islands

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user u1: A A B A  -> islands 1 1 2 3
        (1, "u1", base, "A"),
        (2, "u1", base + dt.timedelta(minutes=1), "A"),
        (3, "u1", base + dt.timedelta(minutes=2), "B"),
        (4, "u1", base + dt.timedelta(minutes=3), "A"),
        # user u2: NULL NULL A -> null-safe: 1 1 2
        (5, "u2", base, None),
        (6, "u2", base + dt.timedelta(minutes=1), None),
        (7, "u2", base + dt.timedelta(minutes=2), "A"),
        # ts tie broken by event_id: 8 before 9 -> A A = one island
        (8, "u3", base, "A"),
        (9, "u3", base, "A"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, event_type string"
    ).localCheckpoint()
    got = {r.event_id: r.island_id for r in islands(df).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 3, 5: 1, 6: 1, 7: 2, 8: 1, 9: 1}
