"""Source/sink format round-trips (CSV read, ORC) and the bucketed
co-located-join layout (shuffle-free join — the recurring-shuffle
eliminator at scale)."""

from pyspark.sql import functions as F

from graphdb_for_drones_spark.sources.io import (
    read_csv_results,
    read_orc,
    write_bucketed,
    write_csv_results,
    write_orc,
)


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("q1", 1.5, 10), ("q2", 2.25, 20)], "name string, p50 double, n int"
    )
    p = str(tmp_path / "res")
    write_csv_results(df, p)
    back = read_csv_results(
        spark, p, schema="name string, p50 double, n int"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    )
    p = str(tmp_path / "orc")
    write_orc(df, p)
    back = read_orc(spark, p).filter(F.col("k") == 3)
    assert back.count() == 20
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters" in plan and "k" in plan.split("PushedFilters")[1].split("]")[0]


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "t_bucket_a", ["k"], num_buckets=8, sort_cols=["k"],
                   path=str(tmp_path / "ta"))
    write_bucketed(b, "t_bucket_b", ["k"], num_buckets=8, sort_cols=["k"],
                   path=str(tmp_path / "tb"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (the tiny test tables would broadcast
        # and hide the layout property under test)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ta, tb = spark.table("t_bucket_a"), spark.table("t_bucket_b")
        joined = ta.join(tb, "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            "bucketed-on-key join must not shuffle either side:\n" + plan
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")
