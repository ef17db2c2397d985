"""Reduction-order independence, pinned: entries whose outputs carry
floats derived from decimal-exact sums (or rounded folds) must return
BIT-IDENTICAL rows regardless of shuffle width — the property that
makes them driver-hash-checkable at all, and the one a partitioning
change on a real cluster would silently break if any aggregate
regressed to raw double folding."""

import os

import pytest

from graphdb_for_drones_spark.plans import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

FLOAT_BEARING = [
    "pricing_summary",
    "region_volume",
    "doc_quality",
    "mixture_weights",
    "event_type_outliers",
    "doc_bm25_topk",
    "doc_lm_fluency",
    "event_type_twap",
    "event_value_trends",
    "lineitem_price_qty_corr",
    "supplier_pagerank",
    "customer_rfm_segments",
    "nation_market_share",
    "doc_quality_logit",
    "doc_bpe_compression",
    "lang_temperature_mixture",
    # round 8: the UniMax waterfill (double level division) and the
    # auto-geometry LSH pairs (rounded cosine after a corpus-count-
    # derived width) must stay shuffle-width independent
    "lang_unimax_mixture",
    # (renamed round 10: auto geometry now owns the unsuffixed name)
    "ann_near_pairs",
    # round 10: trimmed mean — the kept SET comes from a deterministic
    # (value, event_id) rank and the mean from a decimal sum; neither
    # may move with shuffle width
    "event_type_trimmed_stats",
    # round 9: the universal-hash md5 MinHash twin (jaccard = integer
    # intersection / integer union, but the PAIR SET derives from band
    # mins over per-partition-computed hashes — per-row determinism is
    # what keeps it width-independent, so pin it)
    "minhash_pairs_md5",
    # round 10: histogram-drift stats fold per-bin doubles in BIN order
    # (ordered F.aggregate) — the fold order, not shuffle layout, must
    # determine every value
    "source_drift_stats",
    # round 9: DIMSUM sampled co-occurrence — the kept set derives from
    # a deterministic per-occurrence coin and the estimate from one
    # IEEE sqrt/divide; neither may move with shuffle width
    "supplier_shared_customers_sampled",
]


@pytest.mark.slow
@pytest.mark.parametrize("name", FLOAT_BEARING)
def test_result_invariant_under_shuffle_width(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        wide = sorted(map(tuple, QUERIES[name](spark, SF_DIR).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = sorted(map(tuple, QUERIES[name](spark, SF_DIR).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert wide == narrow, f"{name}: results vary with shuffle width"
