"""Catalog relation cache: per-session weak keying + invalidation."""

from graphdb_for_drones_spark.catalog import invalidate_table, load_table


def test_cache_returns_same_plan(spark, tmp_path):
    sf = str(tmp_path)
    spark.range(3).toDF("id").write.parquet(f"{sf}/region.parquet")
    a = load_table(spark, sf, "region")
    b = load_table(spark, sf, "region")
    assert a is b  # cached relation object reused


def test_invalidation_serves_fresh_listing(spark, tmp_path):
    sf = str(tmp_path)
    path = f"{sf}/region.parquet"
    spark.range(3).toDF("id").write.parquet(path)
    assert load_table(spark, sf, "region").count() == 3
    spark.range(5).toDF("id").write.mode("overwrite").parquet(path)
    invalidate_table(sf_dir=sf, name="region")
    assert load_table(spark, sf, "region").count() == 5


def test_invalidation_wildcard(spark, tmp_path):
    sf = str(tmp_path)
    spark.range(1).toDF("id").write.parquet(f"{sf}/region.parquet")
    a = load_table(spark, sf, "region")
    invalidate_table()  # clear everything
    assert load_table(spark, sf, "region") is not a


def test_writer_invalidates_via_write_partitioned(spark, tmp_path):
    # the engine write path itself must drop the stale cached listing —
    # no manual invalidate_table call by the caller
    from graphdb_for_drones_spark.sources.io import write_partitioned

    sf = str(tmp_path)
    path = f"{sf}/part.parquet"
    df3 = spark.range(3).selectExpr("id", "id % 2 AS lbl")
    write_partitioned(df3, path, ["lbl"])
    assert load_table(spark, sf, "part").count() == 3
    df5 = spark.range(5).selectExpr("id", "id % 2 AS lbl")
    write_partitioned(df5, path, ["lbl"])
    assert load_table(spark, sf, "part").count() == 5


def test_invalidate_path_normalizes(spark, tmp_path):
    from graphdb_for_drones_spark.catalog import invalidate_path

    sf = str(tmp_path)
    path = f"{sf}/region.parquet"
    spark.range(2).toDF("id").write.parquet(path)
    a = load_table(spark, sf, "region")
    # non-normalized writer path still hits the cache entry
    invalidate_path(f"{sf}/./region.parquet/")
    assert load_table(spark, sf, "region") is not a
