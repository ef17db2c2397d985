"""Salted aggregation correctness and bucketed-join plan shape."""

import pytest
from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators.skew import (
    replicate_dim_for_salted_join,
    salted_agg,
    write_bucketed,
)


def test_salted_agg_matches_plain(spark):
    # the reference's star: one hot hq value over every row
    df = spark.createDataFrame(
        [(i, "HQ1" if i % 10 else "HQ2", float(i)) for i in range(1000)],
        "drone_id long, hq_id string, v double",
    ).localCheckpoint()
    plain = {
        (r.hq_id): (r.n, r.sv)
        for r in df.groupBy("hq_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect()
    }
    salted = {
        (r.hq_id): (r.n, r.sv)
        for r in salted_agg(
            df,
            ["hq_id"],
            {"n": F.count(F.lit(1)), "sv": F.sum("v")},
            salt_buckets=8,
            salt_on="drone_id",
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    fact = spark.createDataFrame(
        [(i, "HQ1" if i % 100 else "HQ2") for i in range(500)],
        "drone_id long, hq_id string",
    ).localCheckpoint()
    dim = spark.createDataFrame(
        [("HQ1", "alpha"), ("HQ2", "beta")], "hq_id string, name string"
    ).localCheckpoint()
    plain = sorted(
        (r.drone_id, r.name) for r in fact.join(dim, "hq_id").collect()
    )
    dim_rep = replicate_dim_for_salted_join(dim, salt_buckets=8)
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.xxhash64("drone_id"), F.lit(8))
    )
    got = sorted(
        (r.drone_id, r.name)
        for r in fact_s.join(dim_rep, ["hq_id", "__salt"]).collect()
    )
    assert got == plain


@pytest.mark.slow
def test_bucketed_join_no_exchange(spark, tmp_path):
    orders = spark.range(0, 2000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 7).alias("v")
    )
    lineitem = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("l_orderkey"), F.col("id").alias("li")
    )
    write_bucketed(
        orders, "t_orders_b", "o_orderkey", num_buckets=8,
        path=str(tmp_path / "ob"),
    )
    write_bucketed(
        lineitem, "t_lineitem_b", "l_orderkey", num_buckets=8,
        path=str(tmp_path / "lb"),
    )
    o = spark.table("t_orders_b")
    li = spark.table("t_lineitem_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = o.join(li, o["o_orderkey"] == li["l_orderkey"])
        assert j.count() == 6000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed tables must join without a shuffle:\n" + plan
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
