"""Round-11 operator families: exact two-sample KS drift, cohort
retention, Gini concentration — hand-computable fixtures plus the
degenerate inputs the sf corpus never exercises (ANSI x/0 is a JOB
failure, so empty/one-element/missing-reference slices must be probed
explicitly)."""

from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators.stats import (
    gini_concentration,
    ks_drift,
)
from graphdb_for_drones_spark.operators.temporal import retention_cohorts


def test_ks_drift_hand_computed(spark):
    # ref: {1, 2, 3, 4}; shifted: {3, 4, 5, 6} -> D = |F_s - F_r| peaks
    # at x=2 (ref 0.5, shifted 0.0) and x=4 (ref 1.0, shifted 0.5): 0.5
    rows = [("ref", v) for v in (1, 2, 3, 4)] + [
        ("shift", v) for v in (3, 4, 5, 6)
    ]
    df = spark.createDataFrame(rows, "g string, x long").localCheckpoint()
    got = {r.g: (r.n_rows, r.ks) for r in ks_drift(df, "g", "x", "ref").collect()}
    assert got["ref"] == (4, 0.0)  # self-consistency row
    assert got["shift"] == (4, 0.5)


def test_ks_drift_identical_and_disjoint(spark):
    rows = (
        [("ref", v) for v in (10, 20, 30)]
        + [("same", v) for v in (10, 20, 30)]
        + [("far", v) for v in (100, 200)]
    )
    df = spark.createDataFrame(rows, "g string, x long").localCheckpoint()
    got = {r.g: r.ks for r in ks_drift(df, "g", "x", "ref").collect()}
    assert got["same"] == 0.0
    assert got["far"] == 1.0  # fully separated supports


def test_ks_drift_missing_reference_is_null_not_crash(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2)], "g string, x long"
    ).localCheckpoint()
    rows = ks_drift(df, "g", "x", "nope").collect()
    assert [r.ks for r in rows] == [None]  # no ANSI div-by-zero job fail


def test_retention_cohorts_hand_computed(spark):
    # week length 604800000 ms; users u1/u2 start week 0, u1 returns
    # week 1; u3 starts week 1
    wk = 604_800_000
    rows = [
        (1, 10), (1, 20), (2, 30),           # week 0: u1, u2
        (1, wk + 5), (3, wk + 6),            # week 1: u1 returns, u3 new
    ]
    df = spark.createDataFrame(
        [(u, ms) for u, ms in rows], "user_id long, ms long"
    ).select(
        "user_id", F.timestamp_millis(F.col("ms")).alias("ts")
    ).localCheckpoint()
    got = {
        (r.cohort_period, r.period_offset): (
            r.n_users,
            r.cohort_size,
            r.retention,
        )
        for r in retention_cohorts(df, "user_id", "ts").collect()
    }
    assert got[(0, 0)] == (2, 2, 1.0)
    assert got[(0, 1)] == (1, 2, 0.5)
    assert got[(1, 0)] == (1, 1, 1.0)
    assert len(got) == 3


def test_retention_cohorts_null_users_dropped(spark):
    df = spark.createDataFrame(
        [(None, 1000), (5, 1000)], "user_id long, ms long"
    ).select(
        "user_id", F.timestamp_millis(F.col("ms")).alias("ts")
    ).localCheckpoint()
    rows = retention_cohorts(df, "user_id", "ts").collect()
    assert len(rows) == 1 and rows[0].n_users == 1


def test_gini_hand_computed(spark):
    # perfectly equal slice -> 0; one-holder slice {0,0,0,9}:
    # num = sum((2i-n-1)x) = (8-5)*9 = 27, den = 4*9 = 36 -> 0.75
    rows = (
        [("eq", 5), ("eq", 5), ("eq", 5), ("eq", 5)]
        + [("one", 0), ("one", 0), ("one", 0), ("one", 9)]
    )
    df = spark.createDataFrame(rows, "g string, x long").localCheckpoint()
    got = {r.g: (r.n_rows, r.total, r.gini) for r in
           gini_concentration(df, "g", "x").collect()}
    assert got["eq"] == (4, 20, 0.0)
    assert got["one"] == (4, 9, 0.75)


def test_gini_zero_total_and_singleton(spark):
    df = spark.createDataFrame(
        [("z", 0), ("z", 0), ("s", 7)], "g string, x long"
    ).localCheckpoint()
    got = {r.g: r.gini for r in gini_concentration(df, "g", "x").collect()}
    assert got["z"] is None  # zero mass: undefined, not a job failure
    assert got["s"] == 0.0  # a singleton holds everything equally


def test_gini_tie_order_invariance(spark):
    """Duplicated values must yield the same coefficient regardless of
    partitioning (the row_number tiebreak is provably block-invariant)."""
    rows = [("g", v) for v in (3, 1, 3, 1, 3, 1)]
    a = gini_concentration(
        spark.createDataFrame(rows, "g string, x long").repartition(1),
        "g",
        "x",
    ).collect()[0]
    b = gini_concentration(
        spark.createDataFrame(rows, "g string, x long").repartition(7),
        "g",
        "x",
    ).collect()[0]
    assert (a.n_rows, a.total, a.gini) == (b.n_rows, b.total, b.gini)


def _ts_df(spark, rows):
    return (
        spark.createDataFrame(rows, "user_id long, ms long, event_type string")
        .select(
            "user_id",
            F.timestamp_millis(F.col("ms")).alias("ts"),
            "event_type",
        )
        .localCheckpoint()
    )


def test_funnel_hand_computed(spark):
    from graphdb_for_drones_spark.operators.temporal import funnel_counts

    rows = [
        # u1 completes the funnel in order
        (1, 100, "view"), (1, 200, "click"), (1, 300, "purchase"),
        # u2 clicks BEFORE viewing: reaches step 0 only
        (2, 200, "click"), (2, 300, "view"),
        # u3 views and clicks, purchase is same-instant as click: no chain
        (3, 100, "view"), (3, 200, "click"), (3, 200, "purchase"),
        # u4 never views
        (4, 100, "purchase"),
    ]
    got = {
        r.step_idx: (r.step, r.n_users, r.conversion)
        for r in funnel_counts(
            _ts_df(spark, rows),
            "user_id",
            "ts",
            "event_type",
            ("view", "click", "purchase"),
        ).collect()
    }
    assert got[0] == ("view", 3, 1.0)
    assert got[1] == ("click", 2, round(2 / 3, 9))
    assert got[2] == ("purchase", 1, round(1 / 3, 9))


def test_funnel_empty_head_is_null_not_crash(spark):
    from graphdb_for_drones_spark.operators.temporal import funnel_counts

    rows = [(1, 100, "click")]
    got = {
        r.step_idx: (r.n_users, r.conversion)
        for r in funnel_counts(
            _ts_df(spark, rows),
            "user_id",
            "ts",
            "event_type",
            ("view", "click"),
        ).collect()
    }
    assert got[0] == (0, None)
    assert got[1] == (0, None)


def test_centroid_drift_self_and_opposite(spark):
    from graphdb_for_drones_spark.operators.stats import centroid_drift

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [-2.0, 0.0, 0.0, 0.0]),   # centroid exactly opposite ref
        (2, [0.0, 3.0, 0.0, 0.0]),    # orthogonal
        (3, None),                     # failed embedding job: dropped
        (3, [0.0, 0.0, 0.0, 0.0]),    # zero-norm centroid -> NULL cosine
    ]
    df = spark.createDataFrame(
        rows, "label long, embedding array<double>"
    ).localCheckpoint()
    got = {
        r.label: (r.n_vecs, r.centroid_cosine)
        for r in centroid_drift(df, "label", "embedding", 0, dim=4).collect()
    }
    assert got[0] == (2, 1.0)   # reference vs itself
    assert got[1] == (1, -1.0)
    assert got[2] == (1, 0.0)
    assert got[3] == (1, None)  # zero norm: undefined, not a job failure


def test_wasserstein_hand_computed(spark):
    from graphdb_for_drones_spark.operators.stats import wasserstein_drift

    # ref {0, 10}; shifted {5, 15}: W1 between two 2-point CDFs shifted
    # by +5 is exactly 5.0; "same" distribution reads 0.0
    rows = (
        [("ref", 0), ("ref", 10)]
        + [("shift", 5), ("shift", 15)]
        + [("same", 0), ("same", 10)]
    )
    df = spark.createDataFrame(rows, "g string, x long").localCheckpoint()
    got = {
        r.g: (r.n_rows, r.w1)
        for r in wasserstein_drift(df, "g", "x", "ref").collect()
    }
    assert got["ref"] == (2, 0.0)
    assert got["same"] == (2, 0.0)
    assert got["shift"] == (2, 5.0)


def test_wasserstein_missing_reference_is_null(spark):
    from graphdb_for_drones_spark.operators.stats import wasserstein_drift

    df = spark.createDataFrame(
        [("a", 1), ("a", 9)], "g string, x long"
    ).localCheckpoint()
    rows = wasserstein_drift(df, "g", "x", "nope").collect()
    assert [r.w1 for r in rows] == [None]


def test_ks_and_w1_ride_the_same_grid(spark):
    """Refactor guard: ks_drift must be unchanged by the _cdf_grid
    extraction (same hand-computed values as before)."""
    rows = [("ref", v) for v in (1, 2, 3, 4)] + [
        ("shift", v) for v in (3, 4, 5, 6)
    ]
    df = spark.createDataFrame(rows, "g string, x long").localCheckpoint()
    got = {r.g: r.ks for r in ks_drift(df, "g", "x", "ref").collect()}
    assert got == {"ref": 0.0, "shift": 0.5}


def test_funnel_latency_hand_computed(spark):
    from graphdb_for_drones_spark.operators.temporal import funnel_latency

    rows = [
        (1, 100, "view"), (1, 200, "click"), (1, 700, "purchase"),
        (2, 100, "view"), (2, 300, "click"), (2, 400, "purchase"),
        (3, 100, "view"), (3, 200, "click"),  # never completes
    ]
    r = funnel_latency(
        _ts_df(spark, rows), "user_id", "ts", "event_type",
        ("view", "click", "purchase"),
    ).collect()[0]
    assert r.n_completers == 2
    assert r.avg_latency_ms == 450.0  # (600 + 300) / 2
    assert (r.min_latency_ms, r.max_latency_ms) == (300, 600)


def test_funnel_latency_no_completers_is_null(spark):
    from graphdb_for_drones_spark.operators.temporal import funnel_latency

    r = funnel_latency(
        _ts_df(spark, [(1, 100, "view")]), "user_id", "ts", "event_type",
        ("view", "click"),
    ).collect()[0]
    assert r.n_completers == 0
    assert r.avg_latency_ms is None and r.min_latency_ms is None


def test_centroid_drift_dim_mismatch_raises(spark):
    """dim is a contract (ADVICE r11): ragged / mis-declared vectors
    must fail the job loudly, never fold into a NULL cosine."""
    import pytest

    from graphdb_for_drones_spark.operators.stats import centroid_drift

    bad = spark.createDataFrame(
        [("ref", [1.0, 2.0]), ("a", [2.0, 1.0, 9.9])],
        "g string, v array<double>",
    ).localCheckpoint()
    with pytest.raises(Exception, match="centroid_drift.*declared dim"):
        centroid_drift(bad, "g", "v", "ref", 2).collect()


def test_centroid_drift_null_vectors_still_drop(spark):
    from graphdb_for_drones_spark.operators.stats import centroid_drift

    df = spark.createDataFrame(
        [("ref", [1.0, 2.0]), ("a", [2.0, 1.0]), ("b", None)],
        "g string, v array<double>",
    ).localCheckpoint()
    got = {
        r.g: (r.n_vecs, r.centroid_cosine)
        for r in centroid_drift(df, "g", "v", "ref", 2).collect()
    }
    assert got == {"ref": (1, 1.0), "a": (1, 0.8)}
