"""Iterative traversal kernel — the Spark-native replacement for the
reference's recursive SQL CTEs and Cypher variable-length paths.

The reference expresses traversal two ways and our engine must reproduce
BOTH semantics exactly (SURVEY.md §7.4-1):

* ``WITH RECURSIVE ... UNION ALL`` (PostgreSQL,
  demo_did_graph/common/bench_utils.py:9-34) enumerates *rows* — i.e.
  paths.  On a DAG with diamonds a node reached twice counts twice.
  → ``mode="path"``: no dedupe, per-level multiplicity preserved.

* Reachable-node-set questions (ABAC group membership via recursive
  ``UNION`` i.e. distinct, reference
  04_web_of_trust/benchmark_scenario_a.py:208-231) want each node once.
  → ``mode="node"``: per-level distinct + global visited anti-join
  (matches SQL recursive ``UNION`` semantics, terminates on cycles).

Execution model (designed for a 1000-executor cluster, tested on local):
one Spark job per level; the driver only controls the loop — all data
movement is executor-side joins.  Per level:

* the new frontier is ``localCheckpoint``-ed eagerly: this materializes it
  (so the loop's empty-frontier early-exit count is a cheap job over
  cached blocks) AND truncates lineage, which otherwise makes deep
  traversals quadratic in planning time.  On a long-lived production
  cluster with executor churn, swap for reliable ``checkpoint()`` to a
  checkpoint dir — same plan shape.
* frontiers under ``broadcast_threshold`` rows are broadcast so the
  expansion is a map-side join — no shuffle of the (huge) edge table.
  Above the threshold the join falls back to shuffle hash/SMJ, where
  bucketing the edge table by ``src`` removes its shuffle side entirely.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BROADCAST_THRESHOLD = 2_000_000  # frontier rows; ids are short strings


def _as_seed_df(edges: DataFrame, seeds) -> DataFrame:
    if isinstance(seeds, DataFrame):
        col = seeds.columns[0]
        return seeds.select(F.col(col).cast("string").alias("node"))
    spark = edges.sparkSession
    return spark.createDataFrame([(str(s),) for s in seeds], "node string")


def expand(
    frontier: DataFrame, edges: DataFrame, broadcast_frontier: bool = True
) -> DataFrame:
    """One hop: frontier(node) ⋈ edges(src,dst) → next frontier(node).

    The J1 edge-expansion join of the recursive member
    (``FROM delegation d JOIN chain c ON d.hq_id = c.drone_id``,
    reference common/bench_utils.py:26-30)."""
    f = F.broadcast(frontier) if broadcast_frontier else frontier
    return edges.join(f, edges["src"] == f["node"]).select(
        edges["dst"].alias("node")
    )


def reachable(
    edges: DataFrame,
    seeds,
    max_depth: int,
    mode: str = "node",
    include_seed: bool = False,
    broadcast_threshold: int = BROADCAST_THRESHOLD,
    cache_edges: bool = True,
) -> DataFrame:
    """Bounded BFS.  Returns DataFrame(node string, level int).

    mode="node": each node appears once, at its minimum level
      (recursive-CTE-with-UNION / reachability semantics).
    mode="path": one row per distinct path, so nodes repeat with
      multiplicity (recursive-CTE-with-UNION-ALL / Cypher path semantics).
    """
    if mode not in ("node", "path"):
        raise ValueError(f"mode must be 'node' or 'path', got {mode!r}")
    edges = edges.select("src", "dst")
    if cache_edges:
        # the loop scans edges once per level; persist so the (possibly
        # expensive) edge derivation runs once.  MEMORY_AND_DISK default:
        # spills rather than OOMs on huge edge tables; pass
        # cache_edges=False when the caller manages caching or a single
        # scan is cheaper than materialization.
        edges = edges.persist()
    seed_df = _as_seed_df(edges, seeds)

    frontier = (seed_df.distinct() if mode == "node" else seed_df).localCheckpoint()
    visited = frontier  # node-set mode only
    levels: list[DataFrame] = []
    if include_seed:
        levels.append(frontier.select("node", F.lit(0).alias("level")))

    for lvl in range(1, max_depth + 1):
        n = frontier.count()  # cheap: frontier is checkpointed blocks
        if n == 0:
            break
        nxt = expand(frontier, edges, broadcast_frontier=n <= broadcast_threshold)
        if mode == "node":
            nxt = nxt.distinct().join(visited, "node", "left_anti")
        nxt = nxt.localCheckpoint()  # eager: materialize + cut lineage
        # (sparse checkpointing re-executes the un-materialized segment for
        # every count/broadcast build — measured quadratic; eager-per-level
        # is strictly faster)
        if mode == "node":
            visited = visited.unionByName(nxt)
        levels.append(nxt.select("node", F.lit(lvl).alias("level")))
        frontier = nxt

    if cache_edges:
        # safe: every level is an eager localCheckpoint, so the result no
        # longer references the edge lineage
        edges.unpersist()
    if not levels:
        spark = edges.sparkSession
        return spark.createDataFrame([], "node string, level int")
    return reduce(DataFrame.unionByName, levels)


def reachable_count(edges: DataFrame, seeds, max_depth: int, mode: str = "node") -> int:
    """A1 scalar count over the chain CTE
    (``SELECT COUNT(*) FROM chain``, reference common/bench_utils.py:32)."""
    return reachable(edges, seeds, max_depth, mode=mode).count()


def path_count_to(
    edges: DataFrame,
    seeds,
    target: str,
    max_len: int,
) -> DataFrame:
    """Count paths of length 1..max_len from seeds to a fixed target —
    the web-of-trust J9 query
    (``MATCH path=(c)-[:CROSSED_SIGNED*1..L]->(a {did:anchor})
    RETURN count(path)``,
    reference 04_web_of_trust/benchmark_scenario_c.py:131-137).

    Path multiplicity matters: returns one-row DataFrame(path_count long).
    """
    paths = reachable(edges, seeds, max_len, mode="path")
    return paths.filter(F.col("node") == target).agg(
        F.count(F.lit(1)).alias("path_count")
    )


def reachable_via_labels(
    graph,
    seed_id: str,
    edge_label: str,
    max_depth: int,
    target_vlabel: str | None = None,
    mode: str = "node",
) -> DataFrame:
    """Cypher-shaped entry: ``MATCH (x {id:seed})-[:LABEL*1..d]->(t:TLabel)``
    (reference 01_multi_layer/benchmark_scenario_c.py:47-53).
    Returns (node, level) optionally restricted to a target vertex label.
    The label restriction is a plain join — AQE picks broadcast vs shuffle
    based on the label table's actual size."""
    hops = reachable(graph.out_edges(edge_label), [seed_id], max_depth, mode=mode)
    if target_vlabel is None:
        return hops
    tgt = graph.vlabel(target_vlabel).select(F.col("id").alias("node"))
    return hops.join(tgt, "node")
