"""Merged query/oracle catalog (the driver-gate contract surface).

The driver's CORRECTNESS gate checks exactly the FIRST 50 entries of the
dict returned by ``__spark_entry__.queries()`` (which is ``dict(QUERIES)``,
so insertion order here is the gate order).  The catalog is larger than 50,
so ``_GATE_FIRST`` below explicitly rotates queries into the checked window.

Round-6 rotation: every query that has never had a driver row leads the
window — the 31 oracle-paired entries added in rounds 4-5 beyond those
rounds' windows, the round-6 additions (doc_quality_logit,
bpe_train_merges, doc_bpe_compression, corpus_stopword_candidates,
customer_fuzzy_pairs, lang_temperature_mixture), the changed
doc_weighted_sample (u now maps to (0,1] on both sides), and the 4
declared rows-only surfaces — then flagship re-gates fill the remaining
slots.  With this round every cataloged query has had a driver row in
rounds 4-6; rotated-out entries stay covered by the local oracle replica
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
    # ---- Round-6 rotation ----------------------------------------------
    # The 31 oracle-paired queries that have NEVER had a driver row
    # (added rounds 4-5 beyond the 50-row windows; every one is green in
    # the local oracle replica, tests/test_queries_oracle.py):
    "embedding_dbscan_cores",
    "embedding_distance_hist",
    "nation_trade_flows",
    "nation_market_share",
    "part_type_profit",
    "supplier_shared_customers",
    "orders_profile",
    "event_type_outliers",
    "events_hourly_gapfilled",
    "orders_cube",
    "events_pivot_dow",
    "dedup_cluster_keepers",
    "event_value_trends",
    "event_type_robust_outliers",
    "event_type_transitions",
    "event_type_twap",
    "shipping_delay_histogram",
    "trade_cheapest_route",
    "customer_spend_quartiles",
    "events_native_session_windows",
    "customer_rfm_segments",
    "lineitem_price_qty_corr",
    "ann_recall_at_k",
    "doc_lm_fluency",
    "doc_bpe_token_stats",
    "doc_dup_passages",
    "doc_winnow_stats",
    "doc_weighted_sample",  # engine+oracle changed this round: u -> (h+1)/2^60
    "bpe_merge_candidates",
    "source_vocab_stats",
    "mixture_resample_stats",
    # New in round 6 (never driver-checked):
    "doc_quality_logit",
    "bpe_train_merges",
    "doc_bpe_compression",
    "corpus_stopword_candidates",
    "customer_fuzzy_pairs",
    "customer_supplier_fuzzy_matches",
    "lang_temperature_mixture",
    "user_activity_islands",
    # Declared rows-only twins/surfaces, never driver-recorded (driver
    # does the weaker rows-only check for these by design):
    "minhash_pairs",
    "simhash_pairs",
    "event_hll_rollup",
    "doc_pack_greedy_stats",
    # ---- Filler: flagship re-gates (all r4/r5-green; keeps the window's
    # remaining slots on the operators users hit first) -------------------
    "mission_count",
    "delegation_reachable",
    "flat_chain_count",
    "wot_path_count",
    "abac_check",
    "path_count_diamond",
    "top_customers",
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
