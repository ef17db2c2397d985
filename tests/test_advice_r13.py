"""Round-13 ADVICE-r12 regression pins.

1. ``_centered_moments`` must keep NULL-keyed groups (the r12 equi-join
   rewrite silently dropped them; the advisor's repro: a 4-row frame
   with a NULL key returned 1 group instead of 2).
2. ``_spread_input`` / ``posting_pairs`` must not probe ``.rdd`` on a
   plan that contains a shuffle Exchange (under AQE that materializes
   query stages at plan-BUILD time).
3. ``bpe_train_list`` path choice is count-gated (no 200k-row collect
   before the distributed loop) — pinned indirectly: the driver/distributed
   equality test still passes, and the gate is exercised here on a tiny
   vocab.
"""

from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators.dedup import (
    _plan_has_shuffle,
    _spread_input,
)
from graphdb_for_drones_spark.operators.stats import ols_trend, pearson_corr


def test_centered_moments_null_key_groups_kept(spark):
    rows = [
        ("a", 1.0, 2.0),
        ("a", 2.0, 4.0),
        (None, 1.0, 1.0),
        (None, 2.0, 3.0),
    ]
    df = spark.createDataFrame(
        rows, "k string, x double, y double"
    ).localCheckpoint()
    trend = {r.k: r.slope for r in ols_trend(df, ["k"], "x", "y").collect()}
    assert len(trend) == 2, "NULL-keyed group must survive the centering join"
    assert trend["a"] == 2.0
    assert trend[None] == 2.0
    corr = {r.k: r.r for r in pearson_corr(df, ["k"], "x", "y").collect()}
    assert len(corr) == 2
    assert corr["a"] == 1.0
    assert corr[None] == 1.0


def test_centered_moments_non_null_results_unchanged(spark):
    # the eqNullSafe join must be result-identical to the old equi-join
    # for non-null keys (every catalog caller)
    rows = [("g1", float(i), 3.0 * i + 1.0) for i in range(5)] + [
        ("g2", float(i), -2.0 * i + 7.0) for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "k string, x double, y double"
    ).localCheckpoint()
    got = {
        r.k: (r.n, r.slope, r.intercept0)
        for r in ols_trend(df, ["k"], "x", "y").collect()
    }
    assert got["g1"] == (5, 3.0, 1.0)
    assert got["g2"] == (4, -2.0, 7.0)


def test_plan_has_shuffle_detection(spark):
    base = spark.createDataFrame(
        [(i, i % 3) for i in range(10)], "id long, k long"
    ).localCheckpoint()
    assert not _plan_has_shuffle(base)  # ExistingRDD scan
    grouped = base.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    assert _plan_has_shuffle(grouped)  # aggregate ⇒ Exchange
    # BroadcastExchange alone must NOT count as a shuffle: row
    # partitioning of the streamed side is unchanged
    dim = spark.createDataFrame([(0, "x")], "k long, name string")
    joined = base.join(F.broadcast(dim), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "BroadcastExchange" in plan and "Exchange hashpartitioning" not in plan:
        assert not _plan_has_shuffle(joined)


def test_spread_input_still_spreads_narrow_scans(spark):
    one_part = (
        spark.createDataFrame([(i,) for i in range(100)], "v long")
        .coalesce(1)
        .localCheckpoint()
    )
    target = spark.sparkContext.defaultParallelism
    spread = _spread_input(one_part, "v")
    assert spread.rdd.getNumPartitions() >= min(target, 100) or target == 1


def test_spread_input_no_op_on_shuffled_plans(spark):
    base = spark.createDataFrame(
        [(i, i % 3) for i in range(10)], "id long, k long"
    ).localCheckpoint()
    grouped = base.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    out = _spread_input(grouped, "k", "c")
    # no repartition appended: the output plan is the projection over the
    # aggregate, with no RoundRobinPartitioning exchange on top
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "roundrobin" not in plan.lower()
    # and results are intact
    assert {r.k for r in out.collect()} == {0, 1, 2}


def test_bpe_train_list_tiny_vocab_driver_path(spark):
    from graphdb_for_drones_spark.operators.text import bpe_train_list

    df = spark.createDataFrame(
        [("low low lower",), ("newest newest",)], "text string"
    ).localCheckpoint()
    merges = bpe_train_list(df, n_merges=3)
    assert len(merges) == 3
    assert merges[0][0] == 1 and merges[0][2] >= 2
