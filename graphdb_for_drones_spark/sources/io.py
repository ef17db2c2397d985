"""Non-parquet sources/sinks from the reference inventory (SURVEY §2.1).

* S5  JSON file source/sink — the offline VC/package files
  (demo_offline/01_offline_did/self_contained_vc.py:62-64).
* S12 CSV result sink — every benchmark writes metric rows as CSV
  (02_topology_dynamic/benchmark_scenario_a.py:139-145).
* S6  SQLite/SQLCipher wallet tables — modeled as a JDBC source; the
  SQLCipher at-rest encryption is out of engine scope (the reference
  treats it as transparent storage), so without a JDBC driver we read
  the equivalent parquet fixture.
* S7  ArangoDB collections — the vertex/edge collection model maps to
  the same two-DataFrame graph; a dedicated connector is out of scope.

Kafka source/sink (S8/S9) live in streaming/cdc.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_json_docs(spark: SparkSession, path: str, schema=None, multiline: bool = True) -> DataFrame:
    """VC/DID JSON documents from files.  ``multiLine=True`` matches the
    reference's one-document-per-file layout."""
    reader = spark.read.option("multiLine", "true" if multiline else "false")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json_docs(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_csv_results(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Benchmark CSV sink: header row like csv.DictWriter's."""
    df.write.mode(mode).option("header", "true").csv(path)


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound=None,
    upper_bound=None,
) -> DataFrame:
    """JDBC source (SQLite/PostgreSQL wallet tables).  When a numeric key
    is available, pass partition bounds so the read parallelizes instead
    of funnelling through one connection."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet layout (e.g. vertices/edges
    partitioned by ``label``, SURVEY §1.4): an equality filter on a
    partition column becomes directory pruning — the scan never lists,
    let alone reads, other partitions.  Verified by
    tests/test_plan_shape.py::test_partition_pruning_on_label."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    from graphdb_for_drones_spark.catalog import invalidate_path

    invalidate_path(path)


def read_csv_results(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Round-trip of the CSV result sink (header row; pass a schema for
    exact types, else inference — acceptable for metric tables only)."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the alternative columnar format for interchange with
    Hive-side consumers; same predicate-pushdown/pruning behavior as
    parquet through the Spark reader."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed + sorted managed table (`bucketBy`/`sortBy` +
    saveAsTable): the CO-LOCATED JOIN layout — two tables bucketed on
    the join key with the same bucket count join with NO shuffle
    exchange on either side (and no sort, when ``sort_cols`` covers the
    key), because partitioning is baked into the file layout.  At
    100 TB this converts every recurring fact-fact join on the bucket
    key from a full shuffle into a zip of pre-sorted buckets —
    the single biggest recurring-shuffle eliminator Spark offers.
    Verified by tests/test_io_formats.py::test_bucketed_join_is_shuffle_free."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        # external table at an explicit location (the warehouse dir is a
        # static conf — tests and ad-hoc layouts pass a path instead)
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)
