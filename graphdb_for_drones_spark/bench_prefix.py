"""Measure the PPJoin prefix-filter crossover on a skewed corpus.

VERDICT r3 #7: PERF.md documents that `ngram_jaccard_prefix` loses to the
plain counting plan on the driver's *uniform* sf corpora (max shingle df 25,
prefix keeps ~91% of the index) and claims it wins at high threshold /
power-law shingle df.  This module MEASURES both sides of that crossover
instead of asserting it.

Corpus: `fixtures.skewed_corpus_dist` — every doc shares one boilerplate
template (shingle df = n_docs) plus ~2 near-dup-planted unique shingle
groups (df ≤ 2).  On such a corpus the counting plan must enumerate
C(n_docs, 2) candidate pairs **per hot shingle**; the prefix plan indexes
only each doc's |X| − ⌈t·|X|⌉ + 1 *rarest* shingles, which at t ≥ 0.5
excludes the boilerplate entirely.

Both plans are exact — each run asserts identical (id_a, id_b) pair sets
before timing is reported.

Run:  python -m graphdb_for_drones_spark.bench_prefix [--quick]
Output: one JSON line per (n_docs, threshold, plan) with wall seconds and
result pair count, suitable for pasting into PERF.md.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession

from graphdb_for_drones_spark import fixtures
from graphdb_for_drones_spark.operators import dedup


def _pairs(df: DataFrame, threshold: float, prefix: bool) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        df, threshold=threshold, prefix_filter=prefix
    ).select("id_a", "id_b")


def _assert_equal_pairs(a: DataFrame, b: DataFrame) -> int:
    """Exactness check: symmetric difference must be empty."""
    only_a = a.exceptAll(b).count()
    only_b = b.exceptAll(a).count()
    if only_a or only_b:
        raise AssertionError(
            f"prefix plan diverged from counting plan: +{only_a}/-{only_b} pairs"
        )
    return a.count()


def run_crossover(
    spark: SparkSession,
    n_docs_list: tuple[int, ...] = (2_000, 8_000),
    thresholds: tuple[float, ...] = (0.1, 0.5, 0.7),
    check_equality: bool = True,
) -> list[dict]:
    rows: list[dict] = []
    for n_docs in n_docs_list:
        corpus = fixtures.skewed_corpus_dist(spark, n_docs).localCheckpoint()
        for t in thresholds:
            timings: dict[str, float | None] = {}
            counts: dict[str, int | None] = {}
            # prefix first: a counting-plan OOM at large n can take the
            # whole JVM down (C(n,2) pair structs from one hot posting
            # list), and the prefix rows must survive that
            for plan, prefix in (("prefix", True), ("counting", False)):
                q = _pairs(corpus, t, prefix)
                t0 = time.perf_counter()
                try:
                    counts[plan] = q.count()
                    timings[plan] = time.perf_counter() - t0
                except Exception as e:  # noqa: BLE001 - DNF is a result
                    # a hot shingle at df=n forces the counting plan to
                    # materialize a C(n,2)-struct pair array per posting
                    # list; past ~4k docs that single row exceeds task
                    # memory.  Record the DNF — it IS the measurement.
                    counts[plan] = None
                    timings[plan] = None
                    print(
                        json.dumps(
                            {
                                "n_docs": n_docs,
                                "threshold": t,
                                "plan": plan,
                                "dnf": f"{type(e).__name__}",
                            }
                        ),
                        flush=True,
                    )
            # full symmetric-difference pass re-executes both plans; do it
            # at the smallest size only (plan equality is additionally
            # pinned corpus-independently in tests/test_prefix_crossover)
            if check_equality and n_docs == min(n_docs_list):
                _assert_equal_pairs(
                    _pairs(corpus, t, False), _pairs(corpus, t, True)
                )
            if None not in counts.values():
                assert counts["counting"] == counts["prefix"], (
                    n_docs,
                    t,
                    counts,
                )
            row = {
                "n_docs": n_docs,
                "threshold": t,
                "pairs": counts["prefix"] if counts["prefix"] is not None else counts["counting"],
                "counting_s": round(timings["counting"], 3)
                if timings["counting"] is not None
                else None,
                "prefix_s": round(timings["prefix"], 3)
                if timings["prefix"] is not None
                else None,
                "speedup": round(timings["counting"] / timings["prefix"], 2)
                if None not in timings.values()
                else None,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


def main() -> None:
    import argparse

    from graphdb_for_drones_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small sizes only")
    ap.add_argument(
        "--no-check", action="store_true", help="skip the pair-set equality pass"
    )
    args = ap.parse_args()
    spark = get_spark("bench_prefix", master=None)
    sizes = (1_000,) if args.quick else (2_000, 8_000)
    run_crossover(spark, n_docs_list=sizes, check_equality=not args.no_check)


if __name__ == "__main__":
    main()
