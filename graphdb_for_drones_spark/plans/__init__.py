"""Merged query/oracle catalog (the driver-gate contract surface).

The driver's CORRECTNESS gate checks exactly the FIRST 50 entries of the
dict returned by ``__spark_entry__.queries()`` (which is ``dict(QUERIES)``,
so insertion order here is the gate order).  The catalog is larger than 50,
so ``_GATE_FIRST`` below explicitly rotates queries into the checked window.

Round-8 rotation (the VERDICT r7 staleness plan): the 3 new entries
(`ann_near_pairs_auto`, its persisted-graph consumer
`embedding_dbscan_cores_auto`, the invariant-paired
`doc_pack_greedy_stats`)
plus the 7 whose plans changed this round (posting-bucket pinning in
the simhash/minhash/ann kernels, the bucketed-contamination param
encoding, the wide-gram staging refactor under the 13-gram entry, the
dialect-neutral recursive template, the SSSP probe edit) lead; the
remaining 40 slots take the stalest driver rows (last checked r5).
Four r5 rows defer to round 9 (`pq_adc_topk` and
`semantic_dedup_stats` were independently judge-verified against
DuckDB in the r7 session; `label_maxsim_topk` / `media_feature_stats`
are unchanged since r5 and pytest-pinned) — after round 8 every other
live row is ≤ 2 rounds old and round 9 sweeps those four.  Rotated-out entries stay covered by the local
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
    # ---- Round-8 rotation ----------------------------------------------
    # New this round, then entries whose plans changed (posting-bucket
    # pinning, bucketed-index param encoding, wide-gram staging, the
    # dialect-neutral recursive template, the SSSP probe edit):
    "ann_near_pairs_auto",
    "embedding_dbscan_cores_auto",
    "doc_pack_greedy_stats",
    "simhash_pairs_md5",
    "minhash_pairs_md5",
    "ann_near_pairs",
    "contamination_check_bucketed",
    "contamination_exact_13gram",
    "delegation_reachable_recursive_sql",
    "trade_cheapest_route",
    # Stalest driver rows (last checked r5; 40 of 44 — pq_adc_topk,
    # semantic_dedup_stats, label_maxsim_topk, media_feature_stats defer
    # to round 9; the first two were independently judge-verified in the
    # r7 session, the last two are unchanged since r5 and pytest-pinned):
    "curation_pipeline_stats",
    "customer_pii_scrub",
    "customers_with_orders",
    "customers_without_orders",
    "doc_bm25_topk",
    "doc_chunk_stats",
    "doc_difficulty_deciles",
    "doc_dup_span_stats",
    "doc_fingerprint",
    "doc_gopher_rules",
    "doc_lang_id",
    "doc_lang_summary",
    "doc_negative_pairs",
    "doc_pack_stats",
    "doc_quality",
    "doc_quality_sample_stats",
    "doc_sample_per_source",
    "doc_split_counts",
    "doc_tfidf_topk",
    "doc_token_stats",
    "doc_top_ngram_stats",
    "embedding_near_pairs",
    "embedding_topk",
    "event_type_salted_counts",
    "event_user_cm_counts",
    "events_sliding_windows",
    "mixture_weights",
    "orders_rollup",
    "region_volume",
    "shipping_priority",
    "source_bloom_probe_stats",
    "supplier_pagerank",
    "trade_graph_degrees",
    "trade_kcore",
    "trade_temporal_reach",
    "trade_trust_from_anchor",
    "user_funnel_counts",
    "user_retention_cohorts",
    "user_sessions",
    "vc_verify_count",
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
