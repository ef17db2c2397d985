#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Protocol mirrors the reference's bench_utils (one warm-up action to prime
the JVM + file-system caches, then timed runs); per-query time is the
wall-clock of plan construction + execution + collect, like the
reference's execute+fetchone loop (common/bench_utils.py:37-60).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graphdb_for_drones_spark.session import get_spark  # noqa: E402
from graphdb_for_drones_spark.plans import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline set: one per operator family (traversal, path-multiplicity,
# web-of-trust, ABAC, scan+agg, multi-way joins, anti/semi, rollup,
# windows (ranking/tumbling/sliding/session), as-of, CDC apply, plus the
# LLM-pipeline families: dedup, text analysis, similarity search)
HEADLINE = [
    "mission_count",
    "delegation_reachable",
    "path_count_diamond",
    "wot_path_count",
    "abac_check",
    "pricing_summary",
    "top_customers",
    "shipping_priority",
    "region_volume",
    "orders_rollup",
    "latest_event_per_user",
    "event_type_stats",
    "cdc_apply_events",
    "events_tumbling_hourly",
    "events_sliding_windows",
    "user_sessions",
    "asof_signup_before_purchase",
    "events_in_windows",
    "user_event_hash_chain",
    "min_price_supplier",
    "minhash_pairs",
    "ngram_jaccard",
    "ngram_jaccard_prefix",
    "doc_token_stats",
    "embedding_topk",
    "ann_topk",
    "ivf_topk",
    "event_value_hist_quantiles",
    "doc_split_counts",
    "corpus_curation_stats",
    # round-4 curation family
    "contamination_check",
    "contamination_containment",
    "doc_pack_stats",
    "doc_pack_greedy_stats",
    "mixture_weights",
    "doc_repetition",
    "doc_quality_sample_stats",
    "embedding_dup_clusters",
]

# the literal block above IS the round-4 bench set — frozen for the
# cross-round "value_headline38" metric no matter what gets appended
# to HEADLINE later
ROUND4_HEADLINE = tuple(HEADLINE)

# r5 (VERDICT r4 #6): the bench sweeps the FULL catalog — headline
# entries above keep their historical order (BENCH_r{N} comparability),
# every other registered query is appended so a regression in a
# previously un-benched entry cannot hide.  The floor is therefore
# len(QUERIES): adding a catalog query automatically adds a bench entry.
HEADLINE += [q for q in QUERIES if q not in HEADLINE]


def main() -> None:
    sf_match = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(sf_match.group(1)) if sf_match else None

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    def drop_leftover_caches():
        # free localCheckpoint/persist blocks left by the previous query so
        # its GC debt doesn't tax the next measurement (the reference
        # resets state between scenarios the same way)
        sc = spark.sparkContext
        for rdd in list(sc._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        sc._jvm.System.gc()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        # reference protocol (common/bench_utils.py): one untimed warm-up
        # execution (primes codegen/JIT, page cache), then timed runs.
        # min-of-2 timed runs: the shared host's load spikes on a
        # minutes scale — a single-shot sweep randomly catches 10-20×
        # slowdowns on a few queries (different victims each run); the
        # min is the reproducible engine cost.
        QUERIES[name](spark, SF_DIR).collect()
        drop_leftover_caches()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            QUERIES[name](spark, SF_DIR).collect()
            best = min(best, time.time() - t0)
            drop_leftover_caches()
        timings[name] = round(best, 3)

    # Full per-query timings go to a sidecar file (committed history lives
    # in PERF.md); the stdout line is capped because the driver captures
    # only the LAST 2000 characters of output and json-parses that tail —
    # round 5's full-catalog line (~4 KB) overflowed it and BENCH_r05
    # recorded "parsed": null.  The printed line keeps the historical
    # headline prefix first, then as many catalog extras as fit.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full_results.json"),
        "w",
    ) as fh:
        json.dump(
            {
                "metric": "full catalog wall-clock at sf on local[%s]" % CPUS,
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            },
            fh,
            indent=1,
        )

    # the frozen round-4 bench set, for cross-round comparability (the
    # full-catalog "value" grows every time the catalog does)
    headline38 = round(
        sum(timings[n] for n in ROUND4_HEADLINE if n in timings), 3
    )

    def line_for(subset: dict[str, float]) -> str:
        return json.dumps(
            {
                "metric": "headline wall-clock local[%s]" % CPUS,
                "value": round(sum(timings.values()), 3),
                "value_headline38": headline38,
                "unit": "sec",
                "queries": subset,
                "n_total": len(timings),
                "sf": sf,
            },
            separators=(",", ":"),
        )

    MAX_LINE = 1700  # < 2000-char driver tail, with margin for a trailing newline
    subset: dict[str, float] = {}
    for name in HEADLINE:
        trial = dict(subset)
        trial[name] = timings[name]
        if len(line_for(trial)) > MAX_LINE:
            break
        subset = trial
    print(line_for(subset))


if __name__ == "__main__":
    main()
