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


def test_hist_quantiles_accuracy_and_merge(spark):
    # sketch-served quantiles within one bin width of exact; rollup of
    # per-day sketches equals a direct per-key histogram (merge algebra)
    import random

    from graphdb_for_drones_spark.operators.sketches import (
        hist_build,
        hist_quantiles,
        hist_rollup,
    )

    rng = random.Random(11)
    rows = [
        ("a", i % 7, rng.uniform(0, 100)) for i in range(2000)
    ] + [("b", i % 7, rng.gauss(50, 10)) for i in range(2000)]
    df = spark.createDataFrame(
        rows, "k string, day int, v double"
    ).localCheckpoint()
    lo, hi, nb = 0.0, 100.0, 100
    width = (hi - lo) / nb

    daily = hist_build(df, ["k", "day"], "v", lo, hi, nb)
    rolled = hist_rollup(daily, ["k"])
    direct = hist_build(df, ["k"], "v", lo, hi, nb)
    a = {(r.k, r.bucket): r.cnt for r in rolled.collect()}
    b = {(r.k, r.bucket): r.cnt for r in direct.collect()}
    assert a == b  # merge algebra is exact

    got = {r.k: r for r in hist_quantiles(rolled, ["k"], lo, hi, nb).collect()}
    for k in ("a", "b"):
        vals = sorted(v for kk, _d, v in rows if kk == k)
        for q, col in [(0.5, "p50"), (0.95, "p95"), (0.99, "p99")]:
            import math

            exact = vals[math.ceil(q * len(vals)) - 1]
            est = got[k][col]
            assert abs(est - exact) <= width + 1e-9, (k, col, est, exact)
