"""Measure the contamination df-cap's hot-shingle bound on a skewed corpus.

VERDICT r4 #4: the catalog's contamination entries now engage
``max_df`` (plans/curation_queries.MAX_TRAIN_DF).  This module measures
WHY on the corpus the cap exists for: ``fixtures.skewed_corpus_dist``
gives every training document one shared boilerplate template (shingle
df = n_train), so the uncapped inverted-index join enumerates
n_train × n_eval rows PER HOT SHINGLE — Θ(n²) growth with corpus size —
while the capped join drops the boilerplate postings up front and its
work tracks the df≤2 tail (≈ linear in n_train).

The eval set is a sample of training documents re-keyed past the train
id range (planted contamination at jaccard 1.0), so both plans must
return the same (train_id, eval_id) pair set at the working threshold —
asserted before any timing is reported, same discipline as
``bench_prefix``.  Capped scores differ by design (the jaccard
denominator is recomputed over kept shingles); membership does not.

Run:  python -m graphdb_for_drones_spark.bench_decontam [--quick]
Output: one JSON line per (n_train, plan) with wall seconds and pair
count, suitable for pasting into PERF.md.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_for_drones_spark import fixtures
from graphdb_for_drones_spark.operators import curation

EVAL_OFFSET = 1_000_000_000


def _corpora(
    spark: SparkSession, n_train: int, n_eval: int = 50
) -> tuple[DataFrame, DataFrame]:
    """Skewed train corpus + an eval set of ``n_eval`` re-keyed train
    docs (planted contamination; every eval doc carries the boilerplate)."""
    train = fixtures.skewed_corpus_dist(spark, n_train).localCheckpoint()
    stride = max(2, n_train // n_eval)
    # even ids only: keeps the planted near-dup partner out of the eval
    # sample so expected pairs stay exactly one per eval doc
    ev = (
        train.filter((F.col("doc_id") % stride == 0))
        .limit(n_eval)
        .withColumn("doc_id", F.col("doc_id") + F.lit(EVAL_OFFSET))
        .localCheckpoint()
    )
    return train, ev


def _pair_set(df: DataFrame) -> set[tuple[int, int]]:
    return {(r.train_id, r.eval_id) for r in df.select("train_id", "eval_id").collect()}


def run_cap_bench(
    spark: SparkSession,
    n_train_list: tuple[int, ...] = (4_000, 16_000),
    threshold: float = 0.5,
    max_df: int = 100,
    check_equality: bool = True,
) -> list[dict]:
    rows: list[dict] = []
    for n_train in n_train_list:
        # eval grows with the corpus (a real benchmark suite is fixed-size,
        # but scaling it makes the uncapped blowup's GROWTH visible: every
        # (train, eval) pair shares the boilerplate shingles, so uncapped
        # candidates = n_train × n_eval — quadratic along this grid — while
        # capped candidates stay the planted pairs only)
        n_eval = max(50, n_train // 80)
        train, ev = _corpora(spark, n_train, n_eval)
        capped = curation.contamination_pairs(
            train, ev, threshold=threshold, max_df=max_df
        )
        uncapped = curation.contamination_pairs(train, ev, threshold=threshold)
        if check_equality:
            got_c, got_u = _pair_set(capped), _pair_set(uncapped)
            planted = {(e - EVAL_OFFSET, e) for (_, e) in got_u}
            if got_c != got_u or not planted <= got_c:
                raise AssertionError(
                    f"capped plan diverged at n={n_train}: "
                    f"+{len(got_c - got_u)}/-{len(got_u - got_c)}"
                )
        for plan, df in (("capped", capped), ("uncapped", uncapped)):
            df.count()  # warm
            t0 = time.time()
            n_pairs = df.count()
            dt = time.time() - t0
            row = {
                "n_train": n_train,
                "plan": plan,
                "sec": round(dt, 2),
                "pairs": n_pairs,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


def main() -> None:
    import sys

    from graphdb_for_drones_spark.session import get_spark

    quick = "--quick" in sys.argv
    spark = get_spark("bench_decontam", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    run_cap_bench(spark, (2_000,) if quick else (4_000, 16_000))


if __name__ == "__main__":
    main()
