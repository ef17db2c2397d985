"""Engine facade: the entry points a reference user needs to switch.

The reference's "API" is: build a SQL/Cypher string, execute it on a
server, time it (SURVEY §3).  Here:

* ``DroneGraphEngine.sql(...)`` — full Spark SQL including native
  ``WITH RECURSIVE`` (Spark 4), so the reference's recursive-CTE
  benchmark strings (common/bench_utils.py:9-34) run nearly verbatim;
* ``get_bench_query(hq_id, depth)`` — the exact chain-count SQL the
  reference builds, emitted in Spark dialect;
* ``traverse(...)`` — the iterative kernel (traversal.py), which beats
  the native recursive CTE whenever the edge derivation is non-trivial
  (the CTE re-derives the edge subquery every iteration; the kernel
  persists it once — measured 7× on the lineitem DAG);
* ``benchmark(...)`` — the reference measurement protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from graphdb_for_drones_spark.bench_utils import BenchResult, benchmark_query
from graphdb_for_drones_spark.catalog import TABLES, Catalog, load_table
from graphdb_for_drones_spark.graph import DroneGraph, testdata_graph
from graphdb_for_drones_spark.traversal import (
    path_count_to,
    reachable,
    reachable_counts,
)


def get_bench_query(hq_id: str, depth: int, table: str = "delegation") -> str:
    """The reference's recursive chain-count SQL
    (common/bench_utils.py:9-34), Spark dialect (CONCAT/CAST instead of
    ``::TEXT``).  Runs natively via ``WITH RECURSIVE`` on Spark 4."""
    return f"""
WITH RECURSIVE chain AS (
  SELECT CAST(drone_id AS STRING) AS node, 1 AS lvl
  FROM {table} WHERE hq_id = '{hq_id}'
  UNION ALL
  SELECT CAST(d.drone_id AS STRING), c.lvl + 1
  FROM {table} d JOIN chain c ON d.hq_id = c.node
  WHERE c.lvl < {depth}
)
SELECT COUNT(*) AS chain_count FROM chain
"""


class DroneGraphEngine:
    """Session + catalog + graph + measurement, in one handle."""

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = spark
        self.sf_dir = sf_dir
        if sf_dir:
            self.catalog = Catalog(spark, sf_dir)

    # -------------------------------------------------------------- #
    def register_testdata(self) -> None:
        for name in TABLES:
            load_table(self.spark, self.sf_dir, name).createOrReplaceTempView(name)

    def register(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)

    def sql(self, query: str) -> DataFrame:
        """Spark SQL passthrough — recursive CTEs included."""
        return self.spark.sql(query)

    # -------------------------------------------------------------- #
    def graph(self) -> DroneGraph:
        return testdata_graph(self.spark, self.sf_dir)

    def traverse(self, edges: DataFrame, seeds, max_depth: int, **kw) -> DataFrame:
        return reachable(edges, seeds, max_depth, **kw)

    def traverse_counts(
        self, edges: DataFrame, seeds, max_depth: int, **kw
    ) -> DataFrame:
        """(node, level, cnt) counter kernel — the adaptive execution
        path (driver BFS / driver frontier / distributed)."""
        return reachable_counts(edges, seeds, max_depth, **kw)

    def path_count(
        self, edges: DataFrame, seeds, target: str, max_len: int, **kw
    ) -> DataFrame:
        return path_count_to(edges, seeds, target, max_len, **kw)

    # ---------------- beyond-reference operator families ----------- #
    def asof_join(self, left, right, **kw) -> DataFrame:
        from graphdb_for_drones_spark.operators.temporal import asof_join

        return asof_join(left, right, **kw)

    def sessionize(self, events: DataFrame, **kw) -> DataFrame:
        from graphdb_for_drones_spark.operators.temporal import sessionize

        return sessionize(events, **kw)

    def dedup_exact(self, df: DataFrame, **kw) -> DataFrame:
        from graphdb_for_drones_spark.operators.dedup import dedup_exact

        return dedup_exact(df, **kw)

    def near_dup_pairs(self, df: DataFrame, method: str = "minhash", **kw):
        from graphdb_for_drones_spark.operators import dedup as D

        fn = {
            "minhash": D.minhash_lsh_pairs,
            "minhash_md5": D.minhash_lsh_pairs_md5,
            "simhash": D.simhash_pairs,
            "ngram": D.ngram_jaccard_pairs,
        }[method]
        return fn(df, **kw)

    def topk_similar(self, embeddings: DataFrame, query_vec, **kw) -> DataFrame:
        from graphdb_for_drones_spark.operators.similarity import cosine_topk

        return cosine_topk(embeddings, query_vec, **kw)

    def salted_agg(self, df: DataFrame, keys, aggs, **kw) -> DataFrame:
        from graphdb_for_drones_spark.operators.skew import salted_agg

        return salted_agg(df, keys, aggs, **kw)

    def write_bucketed(self, df: DataFrame, table: str, bucket_col: str, **kw):
        from graphdb_for_drones_spark.operators.skew import write_bucketed

        return write_bucketed(df, table, bucket_col, **kw)

    def chain_count(self, delegation: DataFrame, hq_id: str, depth: int) -> int:
        """Library form of get_bench_query: count recursive chain rows
        from one HQ over a flat delegation table."""
        from pyspark.sql import functions as F

        edges = delegation.select(
            F.col("hq_id").alias("src"),
            F.col("drone_id").cast("string").alias("dst"),
        )
        return reachable(edges, [hq_id], depth, mode="path").count()

    # -------------------------------------------------------------- #
    def benchmark(self, df: DataFrame, iterations: int = 100, **kw) -> BenchResult:
        """Reference protocol over any DataFrame query: warm-up + timed
        ``collect`` loop + percentiles (common/bench_utils.py:37-60)."""
        return benchmark_query(lambda: df.collect(), iterations=iterations, **kw)
