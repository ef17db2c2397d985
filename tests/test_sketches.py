"""HLL sketch rollups: merged coarse-grain estimates must track exact
distinct counts within sketch error, WITHOUT touching the fact table."""

from pyspark.sql import functions as F

from graphdb_for_drones_spark.catalog import Catalog
from graphdb_for_drones_spark.operators.sketches import hll_build, hll_rollup


def test_hll_rollup_accuracy(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    ev = cat.events.withColumn("day", F.to_date("ts"))
    daily = hll_build(ev, ["event_type", "day"], "user_id")
    rolled = hll_rollup(daily, ["event_type"])
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {r.event_type: r.approx_distinct for r in rolled.collect()}
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_hll_rollup_row_counts_exact(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    ev = cat.events.withColumn("day", F.to_date("ts"))
    rolled = hll_rollup(hll_build(ev, ["event_type", "day"], "user_id"), [])
    assert rolled.first().n_rows == ev.count()
