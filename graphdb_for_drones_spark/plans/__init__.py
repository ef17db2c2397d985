"""Merged query/oracle catalog (the driver-gate contract surface).

The driver's CORRECTNESS gate checks exactly the FIRST 50 entries of the
dict returned by ``__spark_entry__.queries()`` (which is ``dict(QUERIES)``,
so insertion order here is the gate order).  The catalog is larger than 50,
so ``_GATE_FIRST`` below explicitly rotates queries into the checked window.

Round-7 rotation: the 6 new entries (recursive-CTE SQL surface twins,
event_hll_vs_exact, contamination_check_bucketed, ivfpq_topk,
contamination_exact_13gram) lead, then the 9 entries whose plans
changed this round (materialized pair-graph consumers, the NULLS LAST
temperature fold, the dense co-occurrence string keys, the probe-gated
SSSP, the capped_train_index extraction),
then the driver rows stalest by round (all of r4's survivors, then
r5's) — freshening the window's coverage now that every query has had
at least one green row.  Rotated-out entries stay covered by the local
oracle replica (``tests/test_queries_oracle.py`` runs every
oracle-paired query).
"""

from graphdb_for_drones_spark.plans.queries import QUERIES as _BASE_QUERIES
from graphdb_for_drones_spark.plans.queries import ORACLES as _BASE_ORACLES
from graphdb_for_drones_spark.plans.llm_queries import LLM_QUERIES, LLM_ORACLES
from graphdb_for_drones_spark.plans.extra_queries import (
    EXTRA_QUERIES,
    EXTRA_ORACLES,
)
from graphdb_for_drones_spark.plans.curation_queries import (
    CURATION_QUERIES,
    CURATION_ORACLES,
)

_MERGED_QUERIES = {
    **_BASE_QUERIES,
    **LLM_QUERIES,
    **EXTRA_QUERIES,
    **CURATION_QUERIES,
}
_MERGED_ORACLES = {
    **_BASE_ORACLES,
    **LLM_ORACLES,
    **EXTRA_ORACLES,
    **CURATION_ORACLES,
}

# Queries promoted to the head of the gate window this round.  Order within
# the first 50 does not matter; membership does.
_GATE_FIRST = [
    # ---- Round-7 rotation ----------------------------------------------
    # New this round (never driver-checked): the native recursive-CTE SQL
    # surface, the driver-visible HLL accuracy assertion, and the
    # bucketed zero-exchange contamination variant.
    "flat_chain_count_recursive_sql",
    "delegation_reachable_recursive_sql",
    "event_hll_vs_exact",
    "contamination_check_bucketed",
    "ivfpq_topk",
    "contamination_exact_13gram",
    "ivfpq_residual_topk",
    # Changed this round — re-gate: the materialized pair-graph
    # consumers (near_pairs_open / ngram_pairs_open), the NULLS LAST
    # temperature fold, the string-keyed dense co-occurrence branch, the
    # probe-gated SSSP broadcast, and the capped_train_index extraction.
    "embedding_dbscan_cores",
    "dedup_cluster_keepers",
    "dedup_clusters",
    "ann_near_pairs",
    "lang_temperature_mixture",
    "supplier_shared_customers",
    "trade_cheapest_route",
    "contamination_check",
    "embedding_dup_clusters",
    # Stalest driver rows (last checked r4) — every one green in the
    # local oracle replica (tests/test_queries_oracle.py) since:
    "asof_signup_before_purchase",
    "cdc_apply_events",
    "delegation_count_by_level",
    "distinct_segments",
    "doc_dedup_stats",
    "doc_repetition",
    "embedding_clusters",
    "entity_counts",
    "event_props_extract",
    "event_type_stats",
    "event_user_distinct",
    "event_value_hist_quantiles",
    "event_value_percentiles",
    "events_filter",
    "events_in_windows",
    "events_tumbling_hourly",
    "ivf_topk",
    "latest_event_per_user",
    "min_price_supplier",
    "minhash_pairs_md5",
    "nation_triangles",
    "ngram_jaccard",
    "ngram_jaccard_capped",
    "ngram_jaccard_prefix",
    "order_price_percentiles",
    "pricing_summary",
    "priority_histogram",
    "simhash_pairs_md5",
    "user_event_hash_chain",
    "vc_count_per_region",
    "wot_path_count_short",
    # Stalest r5 rows, filling the remaining slots:
    "ann_topk",
    "contamination_containment",
    "corpus_curation_stats",
]

_missing = [n for n in _GATE_FIRST if n not in _MERGED_QUERIES]
if _missing:  # pragma: no cover - guards against catalog renames
    raise KeyError(f"_GATE_FIRST names not in catalog: {_missing}")

QUERIES = {name: _MERGED_QUERIES[name] for name in _GATE_FIRST}
for _name, _fn in _MERGED_QUERIES.items():
    if _name not in QUERIES:
        QUERIES[_name] = _fn

ORACLES = {name: _MERGED_ORACLES[name] for name in _GATE_FIRST if name in _MERGED_ORACLES}
for _name, _sql in _MERGED_ORACLES.items():
    if _name not in ORACLES:
        ORACLES[_name] = _sql

__all__ = ["QUERIES", "ORACLES"]
