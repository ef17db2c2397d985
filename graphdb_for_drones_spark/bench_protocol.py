"""Reference benchmark protocol, end to end: the scale-up × depth sweep
with warm-up, timed iterations, p50/p95/p99 + TPS, and the reference's
CSV result schema — `scenario, scale_up, depth, p50_ms, p95_ms, p99_ms,
tps` (reference 02_topology_dynamic/benchmark_scenario_a.py:110-145,
metrics common/bench_utils.py:37-60).

Run:  python -m graphdb_for_drones_spark.bench_protocol \
          [--nodes 100,500,1000] [--depths 2,4,6,8] [--iterations 20]
          [--csv out.csv]

Scenarios swept (each over reference-shaped fixtures with closed-form
expected counts, so every timed iteration is also a correctness check):

* ``flat_chain``  — flat delegation star (02_topology_dynamic
  setup_scenario_a): recursion dies at level 1 by construction.
* ``hierarchy``   — the 5-layer HQ→Regional→Unit→Squad→Drone tree
  (01_multi_layer setup, ratios scaled down proportionally).
* ``wot_chain``   — linear web-of-trust chain, path count to anchor
  (04_web_of_trust).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from graphdb_for_drones_spark.bench_utils import (
    BenchResult,
    benchmark_query,
    write_results_csv,
)
from pyspark.sql import functions as F

from graphdb_for_drones_spark.fixtures import (
    abac_tables,
    delegation_hierarchy,
    flat_delegation,
    web_trust_chain,
)
from graphdb_for_drones_spark.traversal import path_count_to, reachable_counts


def _expected_flat(n: int, depth: int) -> int:
    return n  # star topology: every drone at level 1, nothing deeper


def sweep(
    spark: SparkSession,
    scale_up_nodes: list[int],
    depths: list[int],
    iterations: int = 20,
) -> list[BenchResult]:
    results: list[BenchResult] = []

    for n in scale_up_nodes:
        flat = flat_delegation(spark, n=n)
        edges = flat.selectExpr("hq_id AS src", "CAST(drone_id AS STRING) AS dst")
        for depth in depths:

            def run_flat(edges=edges, depth=depth, n=n):
                got = (
                    reachable_counts(
                        edges,
                        ["HQ1"],
                        depth,
                        mode="path",
                        # dimension-sized graph → driver BFS strategy
                        collect_edges=n <= 10_000,
                    )
                    .selectExpr("CAST(coalesce(sum(cnt), 0) AS LONG) AS c")
                    .first()
                    .c
                )
                assert got == _expected_flat(n, depth), (got, n, depth)

            results.append(
                benchmark_query(
                    run_flat,
                    iterations=iterations,
                    scenario="flat_chain",
                    scale_up=n,
                    depth=depth,
                )
            )

    for n in scale_up_nodes:
        # scale the reference's 1/100/200/500/2500 shape proportionally
        h = delegation_hierarchy(
            spark,
            num_regional=max(1, n // 25),
            num_unit=max(1, n // 12),
            num_squad=max(1, n // 5),
            drones_per_squad=5,
        )
        edges = h.delegation_relation.selectExpr(
            "parent_id AS src", "child_id AS dst"
        )
        for depth in depths:

            def run_h(edges=edges, depth=depth, h=h, n=n):
                got = reachable_counts(
                    edges, ["HQ1"], depth, mode="node", collect_edges=n <= 10_000
                ).count()
                want = h.counts["reachable_depth"](depth)
                assert got == want, (got, want, depth)

            results.append(
                benchmark_query(
                    run_h,
                    iterations=iterations,
                    scenario="hierarchy",
                    scale_up=n,
                    depth=depth,
                )
            )

    for n in scale_up_nodes:
        for depth in depths:
            # the reference sweeps PATH LENGTH (04_web_of_trust): size the
            # chain so the anchor sits exactly `min(n, depth)` hops from the
            # seed — every timed iteration is a SUCCESSFUL search of that
            # length (a fixed 100+-node chain with depths <= 8 would only
            # ever measure anchor-never-reached misses)
            chain_len = min(n, depth)
            wt = web_trust_chain(spark, n=chain_len)
            edges = wt.selectExpr("from_did AS src", "to_did AS dst")

            def run_wot(edges=edges, depth=depth, chain_len=chain_len):
                got = (
                    path_count_to(
                        edges,
                        ["did:example:e0"],
                        "did:example:anchor",
                        depth,
                        collect_edges=True,
                    )
                    .first()
                    .path_count
                )
                # single linear path, anchor at distance chain_len <= depth
                assert got == 1, (got, depth, chain_len)

            results.append(
                benchmark_query(
                    run_wot,
                    iterations=iterations,
                    scenario="wot_chain",
                    scale_up=n,
                    depth=depth,
                )
            )

    for n in scale_up_nodes:
        for depth in depths:
            # 05_abac permission-check sweep: n users round-robin into a
            # subgroup chain of depth+1 groups (top group reached at
            # exactly `depth` hops and holds the permission), so every
            # timed iteration is a SUCCESSFUL access check at that depth
            t = abac_tables(spark, num_users=n, num_groups=depth + 1)
            sub_edges = t.subgroup.selectExpr("from_id AS src", "to_id AS dst")
            seed_group = (
                t.member.filter(F.col("user_did") == "did:example:u0")
                .select("group_id")
                .first()
                .group_id
            )
            perm = t.permission.localCheckpoint()

            def run_abac(
                sub_edges=sub_edges, seed_group=seed_group, perm=perm,
                depth=depth,
            ):
                reached = reachable_counts(
                    sub_edges,
                    [seed_group],
                    depth,
                    mode="node",
                    include_seed=True,
                    collect_edges=True,
                ).select(F.col("node").alias("group_id"))
                allowed = (
                    reached.join(perm, "group_id")
                    .filter(F.col("resource_id") == "res0")
                    .count()
                )
                assert allowed == 1, (allowed, depth)

            results.append(
                benchmark_query(
                    run_abac,
                    iterations=iterations,
                    scenario="abac",
                    scale_up=n,
                    depth=depth,
                )
            )
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", default="100,500,1000")
    ap.add_argument("--depths", default="2,4,6,8")
    ap.add_argument("--iterations", type=int, default=20)
    ap.add_argument("--csv", default="bench_protocol_results.csv")
    args = ap.parse_args()

    from graphdb_for_drones_spark.session import get_spark

    spark = get_spark("bench-protocol")
    spark.sparkContext.setLogLevel("ERROR")
    results = sweep(
        spark,
        [int(x) for x in args.nodes.split(",")],
        [int(x) for x in args.depths.split(",")],
        iterations=args.iterations,
    )
    write_results_csv(results, args.csv)
    for r in results:
        print(r)


if __name__ == "__main__":
    main()
