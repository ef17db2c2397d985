"""Mutation-workload drivers mirroring the reference's dynamic-topology
benchmark scenarios (02_topology_dynamic/benchmark_scenario_a.py):

* scenario 1 — turn-taking: each round re-points ``update_ratio`` of the
  drones at the next HQ in a rotation, then measures (lines 25-46);
* scenario 2 — chain-churn: per depth in ``depth_cycle``, churn a ratio
  of drones between HQs and measure at that depth (lines 49-67);
* scenario 3 — partition & reconciliation: split the fleet, hammer the
  split half with updates for a window, reconcile, then measure a burst
  of post-reconcile sync queries (lines 70-93).

Spark-native shape: the delegation table is an immutable snapshot per
round (the reference's committed chunks ≈ our snapshot versions); every
mutation is the broadcast-join rewrite from mutation.py, and each round
yields (snapshot, measure) so the harness can time queries against a
well-defined version — the §7.4-5 mutation-while-querying pin.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphdb_for_drones_spark.mutation import redelegate


def _chunk(keys: list, size: int) -> Iterator[list]:
    for i in range(0, len(keys), size):
        yield keys[i : i + size]


def _snapshot(df: DataFrame) -> DataFrame:
    # commit point: materialize the round's state (≈ the reference's
    # per-chunk COMMIT), keeping rounds independent of lineage depth
    return df.localCheckpoint()


def turn_taking(
    delegation: DataFrame,
    hq_ids: list[str],
    rounds: int,
    update_ratio: float = 0.2,
    chunk_size: int = 500,
    key_col: str = "drone_id",
    hq_col: str = "hq_id",
) -> Iterator[DataFrame]:
    """Yield one committed snapshot per round; round r re-points the first
    ``update_ratio`` fraction of drones at ``hq_ids[r % len]``."""
    current = _snapshot(delegation)
    keys = [r[0] for r in current.select(key_col).collect()]
    n_upd = int(len(keys) * update_ratio)
    for r in range(rounds):
        target = hq_ids[r % len(hq_ids)]
        for chunk in _chunk(keys[:n_upd], chunk_size):
            current = redelegate(current, chunk, target, key_col, hq_col)
        current = _snapshot(current)
        yield current


def chain_churn(
    delegation: DataFrame,
    hq_ids: list[str],
    depth_cycle: list[int],
    update_ratio: float = 0.1,
    chunk_size: int = 500,
    key_col: str = "drone_id",
    hq_col: str = "hq_id",
) -> Iterator[tuple[int, DataFrame]]:
    """Per depth in the cycle: churn a ratio of drones round-robin across
    HQs, commit, and yield (depth, snapshot) for depth-d measurement."""
    current = _snapshot(delegation)
    keys = [r[0] for r in current.select(key_col).collect()]
    n_upd = int(len(keys) * update_ratio)
    for i, depth in enumerate(depth_cycle):
        target = hq_ids[i % len(hq_ids)]
        for chunk in _chunk(keys[i * n_upd % len(keys) : i * n_upd % len(keys) + n_upd], chunk_size):
            current = redelegate(current, chunk, target, key_col, hq_col)
        current = _snapshot(current)
        yield depth, current


def partition_reconcile(
    delegation: DataFrame,
    main_hq: str,
    island_hq: str,
    split_ratio: float = 0.5,
    churn_rounds: int = 5,
    chunk_size: int = 500,
    key_col: str = "drone_id",
    hq_col: str = "hq_id",
) -> tuple[DataFrame, DataFrame]:
    """Scenario 3: split ``split_ratio`` of the fleet onto an island HQ,
    churn the island for ``churn_rounds``, then reconcile everyone back to
    the main HQ.  Returns (partitioned_snapshot, reconciled_snapshot)."""
    current = _snapshot(delegation)
    keys = [r[0] for r in current.select(key_col).collect()]
    island = keys[: int(len(keys) * split_ratio)]
    for chunk in _chunk(island, chunk_size):
        current = redelegate(current, chunk, island_hq, key_col, hq_col)
    current = _snapshot(current)
    partitioned = current
    for _ in range(churn_rounds):
        for chunk in _chunk(island, chunk_size):
            current = redelegate(current, chunk, island_hq, key_col, hq_col)
        current = _snapshot(current)
    for chunk in _chunk(island, chunk_size):
        current = redelegate(current, chunk, main_hq, key_col, hq_col)
    reconciled = _snapshot(current)
    return partitioned, reconciled


def measure_under_workload(
    snapshots: Iterator,
    query: Callable[[DataFrame], DataFrame],
) -> list[tuple[int, int]]:
    """Run ``query`` against each committed snapshot (the reference's
    measure-after-mutation loop); returns [(round, result_count)]."""
    out = []
    for i, snap in enumerate(snapshots):
        snap_df = snap[1] if isinstance(snap, tuple) else snap
        out.append((i, query(snap_df).count()))
    return out
