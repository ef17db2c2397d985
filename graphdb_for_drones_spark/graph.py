"""Property-graph container: the Spark-native equivalent of the reference's
AgensGraph VLABEL/ELABEL model (SURVEY.md §1.4).

A graph is two DataFrames:

  vertices(id string, label string, props map<string,string>)
  edges(src string, dst string, label string)

mirroring the vertex/edge labels created by e.g.
``demo_did_graph/01_multi_layer/setup_scenario_c.py:48-57`` (HQ, Regional,
Unit, Squad, Drone, Issuer, Subject, VC; DELEGATES/ISSUED/ASSERTS) — but
stored as label-partitionable columnar tables rather than per-label
inherited row tables.

Scale notes (100 TB): partition both tables by ``label`` on disk so label
filters become partition pruning; bucket edges by ``src`` (and a second
copy or a sorted projection by ``dst``) so frontier-expansion joins of a
BFS co-locate without a full shuffle per level.  The API below is layout
agnostic — it only expresses the logical plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VERTEX_COLS = ("id", "label")
EDGE_COLS = ("src", "dst", "label")


@dataclass
class DroneGraph:
    """vertices: (id, label, props...); edges: (src, dst, label)."""

    vertices: DataFrame
    edges: DataFrame

    def vlabel(self, label: str) -> DataFrame:
        """Vertex scan by label — S2 in SURVEY.md §2.1
        (``MATCH (d:Drone) RETURN d.id``,
        reference 02_topology_dynamic/benchmark_scenario_c.py:225)."""
        return self.vertices.filter(F.col("label") == label)

    def elabel(self, label: str) -> DataFrame:
        return self.edges.filter(F.col("label") == label)

    def out_edges(self, label: str | None = None) -> DataFrame:
        e = self.edges if label is None else self.elabel(label)
        return e.select("src", "dst")

    def in_edges(self, label: str | None = None) -> DataFrame:
        """Reversed edge list — used for the ``<-[:ASSERTS]-`` reversed hop
        (reference 01_multi_layer/benchmark_scenario_c.py:47-53)."""
        e = self.edges if label is None else self.elabel(label)
        return e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))

    def degrees(self, direction: str = "out") -> DataFrame:
        key = "src" if direction == "out" else "dst"
        return self.edges.groupBy(F.col(key).alias("id")).agg(
            F.count(F.lit(1)).alias("degree")
        )

    # ------------------------------------------------------------------ #
    # construction helpers
    # ------------------------------------------------------------------ #
    @staticmethod
    def from_edge_table(
        edges: DataFrame,
        src_col: str,
        dst_col: str,
        label: str = "DELEGATES",
        src_label: str = "node",
        dst_label: str = "node",
    ) -> "DroneGraph":
        """Build a graph from a relational adjacency list — the scenario-A
        encoding (``delegation_relation(parent_id, child_id, child_type)``,
        reference 01_multi_layer/setup_scenario_a.py:56-63)."""
        e = edges.select(
            F.col(src_col).cast("string").alias("src"),
            F.col(dst_col).cast("string").alias("dst"),
            F.lit(label).alias("label"),
        )
        v = (
            e.select(F.col("src").alias("id"), F.lit(src_label).alias("label"))
            .unionByName(
                e.select(F.col("dst").alias("id"), F.lit(dst_label).alias("label"))
            )
            .distinct()
        )
        return DroneGraph(v, e)


def testdata_graph(spark: SparkSession, sf_dir: str) -> DroneGraph:
    """Map the TPC-H-ish testdata onto the reference's delegation hierarchy:

      Region ('R'||r_regionkey)   ~ HQ / Regional
        -DELEGATES-> Nation ('N'||n_nationkey)     ~ Unit
          -DELEGATES-> Customer ('C'||c_custkey)   ~ Drone
          -DELEGATES-> Supplier ('S'||s_suppkey)   ~ Drone (second fleet)

    Orders play the role of missions (mission_test, reference
    01_multi_layer/setup_scenario_a.py:64-72): one fact row per order keyed
    by the customer ("drone") that flew it.
    """
    from graphdb_for_drones_spark.catalog import Catalog

    cat = Catalog(spark, sf_dir)
    nation, customer, supplier = cat.nation, cat.customer, cat.supplier

    def vtx(df: DataFrame, key: str, prefix: str, label: str) -> DataFrame:
        return df.select(
            F.concat(F.lit(prefix), F.col(key).cast("string")).alias("id"),
            F.lit(label).alias("label"),
        )

    vertices = (
        vtx(cat.region, "r_regionkey", "R", "Region")
        .unionByName(vtx(nation, "n_nationkey", "N", "Nation"))
        .unionByName(vtx(customer, "c_custkey", "C", "Customer"))
        .unionByName(vtx(supplier, "s_suppkey", "S", "Supplier"))
    )

    def edge(df: DataFrame, s: str, sp: str, d: str, dp: str) -> DataFrame:
        return df.select(
            F.concat(F.lit(sp), F.col(s).cast("string")).alias("src"),
            F.concat(F.lit(dp), F.col(d).cast("string")).alias("dst"),
            F.lit("DELEGATES").alias("label"),
        )

    edges = (
        edge(nation, "n_regionkey", "R", "n_nationkey", "N")
        .unionByName(edge(customer, "c_nationkey", "N", "c_custkey", "C"))
        .unionByName(edge(supplier, "s_nationkey", "N", "s_suppkey", "S"))
    )
    return DroneGraph(vertices, edges)
