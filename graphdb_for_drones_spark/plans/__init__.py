"""Merged query/oracle catalog (the driver-gate contract surface).

The driver's CORRECTNESS gate checks exactly the FIRST 50 entries of the
dict returned by ``__spark_entry__.queries()`` (which is ``dict(QUERIES)``,
so insertion order here is the gate order).  The catalog is larger than 50,
so ``_GATE_FIRST`` below explicitly rotates queries into the checked window.

Round-9 rotation (the VERDICT r8 staleness contract, plus in-round
amendments): the window LEADS with `lang_unimax_mixture` (new in r8,
never driver-gated) plus the four rows deferred since r5
(`pq_adc_topk`, `semantic_dedup_stats`, `label_maxsim_topk`,
`media_feature_stats`) — all five judge-verified MATCH in the r8
session; the driver row is the contract.  Next come the entries whose
OUTPUT or PLAN changed during round 9 (changed entries outrank
stale-unchanged rows): `minhash_pairs_md5` (new universal hash
family), the three `ngram_jaccard*` plans (pin restructure), and the
brand-new `supplier_shared_customers_sampled`.  The remaining slots
take the r6 cohort MINUS five static aggregates bumped to make room
(`customer_rfm_segments`, `customer_spend_quartiles`, `orders_cube`,
`orders_profile`, `part_type_profit` — ROUND 10 MUST LEAD WITH THESE)
plus the stalest r7 row (`ann_topk`, also a bench-calibration query).
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
    # ---- Round-9 rotation ----------------------------------------------
    # Contract leads (VERDICT r8 task #1): never-gated + the four r5 rows
    # deferred in r8 -- all judge-verified MATCH, now getting driver rows:
    "lang_unimax_mixture",
    "pq_adc_topk",
    "semantic_dedup_stats",
    "label_maxsim_topk",
    "media_feature_stats",
    # CHANGED THIS ROUND (changed entries outrank stale-unchanged rows):
    # minhash_pairs_md5's OUTPUT changed (universal hash family), the
    # ngram family's plans were restructured (shingle + posting pins).
    # To make room, four static r6-cohort aggregates
    # (customer_rfm_segments, customer_spend_quartiles, orders_cube,
    # orders_profile -- plain SQL-shape plans untouched since r6, all
    # green r6, re-verified ALL MATCH by this round's full driver-sim)
    # defer to round 10, which MUST lead with them.
    "minhash_pairs_md5",
    "ngram_jaccard",
    "ngram_jaccard_capped",
    "ngram_jaccard_prefix",
    # NEW this round (never-gated entries lead, the lang_unimax lesson):
    # DIMSUM-sampled co-occurrence with a bit-exact md5-coin oracle.
    # part_type_profit joins the r10 deferral list to make room.
    "supplier_shared_customers_sampled",
    "abac_check",
    "ann_recall_at_k",
    "bpe_merge_candidates",
    "bpe_train_merges",
    "corpus_stopword_candidates",
    "customer_fuzzy_pairs",
    "customer_supplier_fuzzy_matches",
    "delegation_reachable",
    "doc_bpe_compression",
    "doc_bpe_token_stats",
    "doc_dup_passages",
    "doc_lm_fluency",
    "doc_quality_logit",
    "doc_weighted_sample",
    "doc_winnow_stats",
    "embedding_distance_hist",
    "event_hll_rollup",
    "event_type_outliers",
    "event_type_robust_outliers",
    "event_type_transitions",
    "event_type_twap",
    "event_value_trends",
    "events_hourly_gapfilled",
    "events_native_session_windows",
    "events_pivot_dow",
    "flat_chain_count",
    "lineitem_price_qty_corr",
    "minhash_pairs",
    "mission_count",
    "mixture_resample_stats",
    "nation_market_share",
    "nation_trade_flows",
    "path_count_diamond",
    "shipping_delay_histogram",
    "simhash_pairs",
    "source_vocab_stats",
    "top_customers",
    "user_activity_islands",
    "wot_path_count",
    "ann_topk",
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
