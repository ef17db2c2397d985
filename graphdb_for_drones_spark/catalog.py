"""Testdata catalog: load the driver's parquet tables and register views.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings.  At 100 TB these would be partitioned/bucketed
Delta or Parquet tables; here they are single files, but every reader goes
through ``spark.read.parquet`` so partition discovery, predicate pushdown
and column pruning behave identically at any scale.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# session-level relation cache: resolving a parquet relation costs a
# driver round of file listing + footer reads (~100 ms each); a real
# engine caches catalog metadata the same way.  DataFrames are immutable
# plans, so sharing one per (session, path, table) is safe.  Keyed
# weakly on the session OBJECT (not id(): a stopped session's id can be
# reused by a new one, which would serve plans bound to a dead JVM
# context); entries die with the session.
_DF_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[tuple, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def invalidate_table(sf_dir: str | None = None, name: str | None = None) -> None:
    """Drop cached relations whose files may have been rewritten.

    Engine write paths that overwrite a parquet path (the CDC state sink
    ``streaming.cdc.start_cdc_apply``, ``sources.io.write_partitioned``)
    call ``invalidate_path`` — which resolves here — so the next
    ``load_table`` re-lists files and re-reads footers instead of serving
    a stale file listing.  ``None`` acts as a wildcard
    (``invalidate_table()`` clears everything).
    """
    sf_norm = None if sf_dir is None else os.path.abspath(sf_dir)
    for per_session in _DF_CACHE.values():
        for key in [
            k
            for k in per_session
            if (sf_norm is None or os.path.abspath(k[0]) == sf_norm)
            and (name is None or k[1] == name)
        ]:
            del per_session[key]


def invalidate_path(path: str) -> None:
    """Writer-facing invalidation: given the on-disk path a sink just
    overwrote, drop any cached relation serving it.  Inverse of
    ``load_table``'s ``<sf_dir>/<name>.parquet`` layout; paths outside
    that layout have no cache entry and are a no-op."""
    base = os.path.basename(path.rstrip("/"))
    if base.endswith(".parquet"):
        invalidate_table(os.path.dirname(os.path.abspath(path.rstrip("/"))), base[: -len(".parquet")])


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    per_session = _DF_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    if key in per_session:
        return per_session[key]
    if name == "events":
        # Depending on the generator version, events.parquet carries either
        # TIMESTAMP(NANOS) — which Spark's vectorized reader rejects, so read
        # nanos as long (runtime-settable legacy conf) and normalize — or a
        # native TIMESTAMP(MICROS) column that needs no conversion.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if isinstance(raw.schema["ts"].dataType, LongType):
            # integer division: `/` would go through DOUBLE, whose 52-bit
            # mantissa cannot represent epoch-nanos exactly (±1 µs drift)
            df = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # native TIMESTAMP(MICROS) arrives as TIMESTAMP_NTZ; with the
            # session tz pinned to UTC (session.py) the cast reinterprets
            # the same micros as the TimestampType every consumer
            # (unix_millis, window ranges, the DuckDB oracle compare)
            # has been checked against since round 1.
            df = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    per_session[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


class Catalog:
    """Lazy handle over one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        from graphdb_for_drones_spark.session import ensure_package_shipped

        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}
        # any catalog consumer may reach a pandas-UDF plan; make sure the
        # workers can import this package no matter the driver's cwd
        ensure_package_shipped(spark)

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]
