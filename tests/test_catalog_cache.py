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
