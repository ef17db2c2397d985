"""Shared pinning policy for small, multiply-consumed aggregates.

ReuseExchange dedups only the SHUFFLE below an aggregate: each plan
consumer re-executes the post-shuffle aggregation, so posting/bucket
tables with 3-4 consumers pay the aggregate 3-4× (PERF.md round 8,
simhash family 5.2 → 3.9 s isolated).  Pinning materializes the rows
once so every consumer is a scan.  Row-based checkpoints, NOT
``.persist()`` — the columnar cache is ~20× slower on array columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def pin(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Materialize ``df`` once for multi-consumer reuse, mode-aware.

    FAULT-TOLERANCE TRADE (round-8 ADVICE finding):
    ``localCheckpoint`` truncates lineage into NON-REPLICATED
    executor-local blocks — on a multi-executor cluster a lost executor
    makes every consumer of the pinned frame irrecoverable (lineage is
    gone), and the blocks stay resident until Python GC drops the
    DataFrame.  Eager pins also move a Spark job to DataFrame-BUILD
    time, so long sessions composing many pair plans accumulate pinned
    blocks.  Policy, chosen per master:

    - local[*] master (tests / bench / single-JVM): ``localCheckpoint``.
      A "lost executor" is the lost JVM itself — lineage would not have
      survived either, so the trade is free here.
    - non-local master WITH a configured checkpoint dir: reliable
      ``df.checkpoint()`` — replicated storage, survives executor loss,
      same plan-reuse benefit.
    - non-local master, NO checkpoint dir: return ``df`` unpinned.
      Re-executing a posting-list-sized aggregate per consumer beats an
      irrecoverable lost-block failure at 100 TB.
    - ``SPARK_GRAFT_NO_PIN=1`` disables pinning everywhere: the opt-out
      for long-lived sessions where accumulated executor-local blocks
      matter more than per-plan latency (the bench harness previously
      needed ``gc.collect()`` between plans for exactly this).
    """
    if os.environ.get("SPARK_GRAFT_NO_PIN"):
        return df
    spark = df.sparkSession
    master = spark.sparkContext.master or ""
    if master.startswith("local"):
        return df.localCheckpoint(eager=eager)
    try:
        has_dir = (
            spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()
        )
    except Exception:  # pragma: no cover - py4j surface drift
        has_dir = False
    if has_dir:
        return df.checkpoint(eager=eager)
    return df
