"""Merged query/oracle catalog (the driver-gate contract surface).

The driver's CORRECTNESS gate checks exactly the FIRST 50 entries of the
dict returned by ``__spark_entry__.queries()`` (which is ``dict(QUERIES)``,
so insertion order here is the gate order).  The catalog is larger than 50,
so ``_GATE_FIRST`` below explicitly rotates queries into the checked window.

Round-11 rotation (the VERDICT r10 task #1 contract): the window LEADS
with every entry the driver has NEVER attested — the seven r10
additions (`event_type_trimmed_stats`, `lang_id_confusion`,
`source_drift_stats`, `source_lang_drift`, `source_vocab_overlap`,
`sq8_topk`, `sq8_recall_at_k`), the two saturation-knee twins
(`ann_near_pairs_fixed16`, `embedding_dbscan_cores_fixed16`), and any
entry NEW this round — plus the five aggregates whose latest driver
row dates to round 6 (`customer_rfm_segments`,
`customer_spend_quartiles`, `orders_cube`, `orders_profile`,
`part_type_profit`) and the two defaults whose PLANS changed in r10
(`ann_near_pairs`, `embedding_dbscan_cores` now execute the auto
geometry; changed entries outrank stale-unchanged rows).  The
remaining slots take the stalest cohort (latest driver row = round 7);
the handful of r7 rows that do not fit defer to round 12, where
``tests/test_gate_rotation.py`` makes their inclusion MANDATORY: the
test parses the committed ``CORRECTNESS_r*.json`` history and fails
the suite if any never-gated entry, or any entry whose latest driver
row is more than 3 rounds old, sits outside the current first-50.
Staleness is now enforced by pytest, not by this docstring.
Rotated-out entries stay covered by the local oracle replica
(``tests/test_queries_oracle.py`` runs every oracle-paired query).
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
    # ---- Round-11 rotation ---------------------------------------------
    # Never driver-gated (r10 additions + the two knee twins):
    "event_type_trimmed_stats",
    "lang_id_confusion",
    "source_drift_stats",
    "source_lang_drift",
    "source_vocab_overlap",
    "sq8_topk",
    "sq8_recall_at_k",
    "ann_near_pairs_fixed16",
    "embedding_dbscan_cores_fixed16",
    # Latest driver row = round 6 (the five r6-deferred aggregates):
    "customer_rfm_segments",
    "customer_spend_quartiles",
    "orders_cube",
    "orders_profile",
    "part_type_profit",
    # Plans changed in r10 (renamed to the auto-geometry defaults):
    "ann_near_pairs",
    "embedding_dbscan_cores",
    # Changed/new THIS round (r11): the DIMSUM default now derives
    # auto-γ from the item-dimension count (plan change), with the
    # pinned γ=32 A/B twin new beside it.
    "supplier_shared_customers_sampled",
    "supplier_shared_customers_sampled_fixed32",
    # New in r11: the streaming drift monitor's report path, gated
    # against the batch entry's oracle SQL verbatim (stream==batch as
    # a driver-checked fact).
    "source_drift_stats_streamed",
    # New in r11: exact two-sample KS drift, weekly retention cohorts,
    # Gini length concentration — never-gated entries lead.
    "source_drift_ks",
    "user_retention_cohorts",
    "doc_length_gini",
    "event_funnel",
    "lang_id_kappa",
    "label_centroid_drift",
    "source_drift_w1",
    "event_funnel_latency",
    "orders_snapshot_diff",
    # ---- Stalest cohort fill (latest driver row = round 7) -------------
    # Sixteen r7 rows defer to round 12 to make room for the round-11
    # additions (distinct_segments, entity_counts, events_filter,
    # priority_histogram, event_props_extract, event_type_stats,
    # event_user_distinct, latest_event_per_user, event_hll_vs_exact,
    # doc_repetition, doc_dedup_stats, event_value_percentiles,
    # order_price_percentiles, nation_triangles,
    # lang_temperature_mixture, flat_chain_count_recursive_sql) -- test_gate_rotation makes the
    # deferral binding, not optional.
    "asof_signup_before_purchase",
    "cdc_apply_events",
    "contamination_check",
    "contamination_containment",
    "corpus_curation_stats",
    "dedup_cluster_keepers",
    "dedup_clusters",
    "delegation_count_by_level",
    "embedding_clusters",
    "embedding_dup_clusters",
    "event_value_hist_quantiles",
    "events_in_windows",
    "events_tumbling_hourly",
    "ivf_topk",
    "ivfpq_residual_topk",
    "ivfpq_topk",
    "min_price_supplier",
    "pricing_summary",
    "supplier_shared_customers",
    "user_event_hash_chain",
    "vc_count_per_region",
    "wot_path_count_short",
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
