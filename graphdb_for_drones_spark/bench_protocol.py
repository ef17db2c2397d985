"""Reference benchmark protocol, end to end: the scale-up × depth sweep
with warm-up, timed iterations, p50/p95/p99 + TPS, and the reference's
CSV result schema — `scenario, scale_up, depth, p50_ms, p95_ms, p99_ms,
tps` (reference 02_topology_dynamic/benchmark_scenario_a.py:110-145,
metrics common/bench_utils.py:37-60).

Run:  python -m graphdb_for_drones_spark.bench_protocol \
          [--nodes 100,500,1000] [--depths 2,4,6,8] [--iterations 20]
          [--big-nodes 100000,500000,1000000] [--big-depths 4,8]
          [--big-iterations 3] [--csv out.csv]

The ``--big-*`` grid extends the sweep to the reference's largest
published scale (scale_up_nodes up to 1,000,000 —
02_topology_dynamic/benchmark_scenario_a.py:110); fixtures there are
generated engine-side (``fixtures.*_dist``, spark.range — row-identical
twins of the driver-built versions) and the traversal kernel crosses its
strategy thresholds: the >10k graphs leave driver-BFS, and the flat
star's 10^5-10^6-row frontiers exceed COLLECT_THRESHOLD, handing off to
the fully distributed continuation.

Scenarios swept (each over reference-shaped fixtures with closed-form
expected counts, so every timed iteration is also a correctness check):

* ``flat_chain``  — flat delegation star (02_topology_dynamic
  setup_scenario_a): recursion dies at level 1 by construction.
* ``hierarchy``   — the 5-layer HQ→Regional→Unit→Squad→Drone tree
  (01_multi_layer setup, ratios scaled down proportionally).
* ``wot_chain``   — web-of-trust chain of n nodes; the searched target
  sits exactly ``depth`` hops from the seed, so ``scale_up`` is the real
  data size and ``depth`` the real path length (04_web_of_trust).
* ``abac``        — membership lookup → subgroup-chain traversal →
  permission join, seeded from the USER row so the n-user member table
  is part of the measured query (05 permission check).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from graphdb_for_drones_spark.bench_utils import (
    BenchResult,
    benchmark_query,
    write_results_csv,
)
from graphdb_for_drones_spark.fixtures import (
    abac_tables_dist,
    delegation_hierarchy,
    delegation_hierarchy_edges_dist,
    flat_delegation_dist,
    web_trust_chain_dist,
)
from graphdb_for_drones_spark.traversal import path_count_to, reachable_counts

ALL_SCENARIOS = ("flat_chain", "hierarchy", "wot_chain", "abac")


def _expected_flat(n: int, depth: int) -> int:
    return n  # star topology: every drone at level 1, nothing deeper


def sweep(
    spark: SparkSession,
    scale_up_nodes: list[int],
    depths: list[int],
    iterations: int = 20,
    scenarios: tuple[str, ...] = ALL_SCENARIOS,
) -> list[BenchResult]:
    results: list[BenchResult] = []
    # driver-BFS is the right plan only for dimension-sized graphs; the
    # sweep exercises the handoff by crossing this line on the big grid
    driver_ok = 10_000

    if "flat_chain" in scenarios:
        for n in scale_up_nodes:
            flat = flat_delegation_dist(spark, n=n)
            edges = flat.selectExpr("hq_id AS src", "CAST(drone_id AS STRING) AS dst")
            for depth in depths:

                def run_flat(edges=edges, depth=depth, n=n):
                    got = (
                        reachable_counts(
                            edges,
                            ["HQ1"],
                            depth,
                            mode="path",
                            collect_edges=n <= driver_ok,
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

    if "hierarchy" in scenarios:
        for n in scale_up_nodes:
            # scale the reference's 1/100/200/500/2500 shape proportionally
            shape = dict(
                num_regional=max(1, n // 25),
                num_unit=max(1, n // 12),
                num_squad=max(1, n // 5),
                drones_per_squad=5,
            )
            edges = delegation_hierarchy_edges_dist(spark, **shape).selectExpr(
                "parent_id AS src", "child_id AS dst"
            )
            # closed-form expected counts (same formula as the driver fixture)
            layer_sizes = [
                shape["num_regional"],
                shape["num_unit"],
                shape["num_squad"],
                shape["num_squad"] * shape["drones_per_squad"],
            ]
            for depth in depths:

                def run_h(edges=edges, depth=depth, n=n, layer_sizes=layer_sizes):
                    got = reachable_counts(
                        edges, ["HQ1"], depth, mode="node",
                        collect_edges=n <= driver_ok,
                    ).count()
                    want = sum(layer_sizes[: min(depth, 4)])
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

    if "wot_chain" in scenarios:
        for n in scale_up_nodes:
            # the chain is n nodes long (like the reference, whose
            # web_trust chain is num_drones long); the depth axis varies
            # only the searched path length — the target sits exactly
            # `depth` hops from the seed, so every timed iteration is a
            # SUCCESSFUL search of that length over an n-node graph
            wt = web_trust_chain_dist(spark, n=n)
            edges = wt.selectExpr("from_did AS src", "to_did AS dst")
            for depth in depths:
                if depth > n:
                    continue
                target = (
                    f"did:example:e{depth}" if depth < n else "did:example:anchor"
                )

                def run_wot(edges=edges, depth=depth, target=target, n=n):
                    got = (
                        path_count_to(
                            edges,
                            ["did:example:e0"],
                            target,
                            depth,
                            collect_edges=n <= driver_ok,
                        )
                        .first()
                        .path_count
                    )
                    # single linear path, target at exactly `depth` hops
                    assert got == 1, (got, depth, n)

                results.append(
                    benchmark_query(
                        run_wot,
                        iterations=iterations,
                        scenario="wot_chain",
                        scale_up=n,
                        depth=depth,
                    )
                )

    if "abac" in scenarios:
        for n in scale_up_nodes:
            for depth in depths:
                # 05_abac permission-check sweep: n users round-robin into
                # a subgroup chain of depth+1 groups (top group reached at
                # exactly `depth` hops and holds the permission).  The
                # membership lookup is part of the timed query — seeded
                # from the user row, so the n-row member table is scanned
                # (filter pushed to the scan) every iteration.
                t = abac_tables_dist(spark, num_users=n, num_groups=depth + 1)
                sub_edges = t.subgroup.selectExpr("from_id AS src", "to_id AS dst")
                member, perm = t.member, t.permission

                def run_abac(
                    sub_edges=sub_edges, member=member, perm=perm, depth=depth,
                ):
                    seed = member.filter(
                        F.col("user_did") == "did:example:u0"
                    ).select("group_id")
                    reached = reachable_counts(
                        sub_edges,
                        seed,
                        depth,
                        mode="node",
                        include_seed=True,
                        collect_edges=True,  # chain is depth-sized by design
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
    ap.add_argument("--big-nodes", default="", help="extra scale grid, e.g. 100000,500000,1000000")
    ap.add_argument("--big-depths", default="4,8")
    ap.add_argument("--big-iterations", type=int, default=3)
    ap.add_argument("--scenarios", default=",".join(ALL_SCENARIOS))
    ap.add_argument("--csv", default="bench_protocol_results.csv")
    args = ap.parse_args()

    from graphdb_for_drones_spark.session import get_spark

    spark = get_spark("bench-protocol")
    spark.sparkContext.setLogLevel("ERROR")
    scenarios = tuple(args.scenarios.split(","))

    def _ints(csv: str) -> list[int]:
        # "--nodes ''" legally skips a grid (e.g. a big-grid-only run)
        return [int(x) for x in csv.split(",") if x.strip()]

    results = sweep(
        spark,
        _ints(args.nodes),
        _ints(args.depths),
        iterations=args.iterations,
        scenarios=scenarios,
    )
    if args.big_nodes:
        results += sweep(
            spark,
            _ints(args.big_nodes),
            _ints(args.big_depths),
            iterations=args.big_iterations,
            scenarios=scenarios,
        )
    write_results_csv(results, args.csv)
    for r in results:
        print(r)


if __name__ == "__main__":
    main()
