"""Measure the blocked-cosine pair join's adaptive LSH routing.

VERDICT r4 #3: ``cosine_pairs_blocked`` routed every block through an
exact all-pairs self-join — fine at sf0.1 (label blocks ≈ 220 rows),
quadratic death at 100×.  Blocks above ``max_block_rows`` now go
through per-block hyperplane-LSH bucket candidates + exact re-score.
This module measures the A/B on one block 10×–40× the sf0.1 size.

Fixture: ``n`` deterministic pseudo-random vectors (hash-derived, so
engine-reproducible) where vector ``i`` and ``i + n/2`` are IDENTICAL —
``n/2`` planted exact-duplicate pairs at cosine 1.0.  At threshold
0.99 random dim-64 pairs never qualify (cosine ~ N(0, 1/64)), so BOTH
plans must return exactly the planted pair set — asserted before any
timing is reported, same discipline as ``bench_prefix`` /
``bench_decontam``.  Identical vectors collide in every LSH band, so
the adaptive leg's recall on this set is 1.0 by construction, not luck.

The LSH leg widens its bands with the block (width ≈ log2(n) - 3,
i.e. signature length ~ log n, the standard LSH sizing): per-bucket
occupancy stays roughly constant, so candidate count — and measured
wall time — grows near-linearly while the exact leg grows as n².

Run:  python -m graphdb_for_drones_spark.bench_blocked [--quick]
Output: one JSON line per (n, plan) with wall seconds and pair count,
suitable for pasting into PERF.md.
"""

from __future__ import annotations

import json
import math
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators.similarity import cosine_pairs_blocked

DIM = 64


def _vec_corpus(spark: SparkSession, n: int, dim: int = DIM) -> DataFrame:
    """One block of ``n`` vectors; ids i and i+n/2 share one hash-derived
    vector (planted exact duplicates), everything else is pseudo-random."""
    half = n // 2
    return (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: F.pmod(F.xxhash64(F.col("id") % half, i), F.lit(1_000_000))
                / 500_000.0
                - 1.0,
            ).alias("embedding"),
            F.lit(1).alias("label"),
        )
        .localCheckpoint()
    )


def _pair_set(df: DataFrame) -> set[tuple[int, int]]:
    return {(r.id_a, r.id_b) for r in df.select("id_a", "id_b").collect()}


def run_blocked_bench(
    spark: SparkSession,
    n_list: tuple[int, ...] = (2_000, 8_000),
    threshold: float = 0.99,
    check_equality: bool = True,
) -> list[dict]:
    rows: list[dict] = []
    for n in n_list:
        emb = _vec_corpus(spark, n)
        # exact leg: cap above the block so the all-pairs join runs
        exact = cosine_pairs_blocked(
            emb, "label", threshold=threshold, max_block_rows=n + 1, dim=DIM
        )
        # adaptive leg: cap at 0 forces the LSH routing; band width grows
        # ~log n so bucket occupancy (and thus candidate pairs per row)
        # stays bounded as the block scales
        width = max(4, int(math.log2(n)) - 3)
        lsh = cosine_pairs_blocked(
            emb,
            "label",
            threshold=threshold,
            max_block_rows=0,
            dim=DIM,
            n_planes=4 * width,
            bands=4,
        )
        if check_equality:
            planted = {(i, i + n // 2) for i in range(n // 2)}
            got_e, got_l = _pair_set(exact), _pair_set(lsh)
            if got_e != planted or got_l != planted:
                raise AssertionError(
                    f"pair sets diverged at n={n}: exact "
                    f"+{len(got_e - planted)}/-{len(planted - got_e)}, lsh "
                    f"+{len(got_l - planted)}/-{len(planted - got_l)}"
                )
        for plan, df in (("exact", exact), ("adaptive_lsh", lsh)):
            df.count()  # warm
            t0 = time.time()
            n_pairs = df.count()
            dt = time.time() - t0
            row = {"n": n, "plan": plan, "sec": round(dt, 2), "pairs": n_pairs}
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


def main() -> None:
    import sys

    from graphdb_for_drones_spark.session import get_spark

    quick = "--quick" in sys.argv
    spark = get_spark("bench_blocked", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    run_blocked_bench(spark, (1_000,) if quick else (2_000, 8_000))


if __name__ == "__main__":
    main()
