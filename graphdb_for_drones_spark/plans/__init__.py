"""Merged query/oracle catalog (the driver-gate contract surface).

The driver's CORRECTNESS gate checks exactly the FIRST 50 entries of the
dict returned by ``__spark_entry__.queries()`` (which is ``dict(QUERIES)``,
so insertion order here is the gate order).  The catalog is larger than 50,
so ``_GATE_FIRST`` below explicitly rotates queries into the checked window.

Round-5 rotation: the 3 curation queries whose round-4 driver rows failed on
oracle typing (HUGEINT vs long — fixed by CAST AS BIGINT this round), the
21 queries last driver-checked in rounds 1-3, and the 3 r4-green queries
whose plans changed since that run (contamination df-cap, adaptive blocked
cosine) lead the dict; the rotated-out r4 window stays covered by the local
oracle replica (``tests/test_queries_oracle.py`` runs every oracle-paired
query).
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
    # Round-4 driver hash FAILs, root-caused to un-cast SUM(BIGINT) in the
    # DuckDB oracles (HUGEINT vs long); oracles fixed this round — these
    # three MUST get a green driver row in round 5:
    "doc_pack_stats",
    "mixture_weights",
    "doc_quality_sample_stats",
    # Last driver-checked in rounds 1-3, rotated out by the r4 window
    # (VERDICT r4 "Next round" #2 — sweep the tail back in):
    "doc_token_stats",
    "doc_lang_summary",
    "doc_fingerprint",
    "doc_lang_id",
    "embedding_topk",
    "embedding_near_pairs",
    "ann_topk",
    "vc_verify_count",  # rows-only (driver compares row count only)
    "doc_quality",
    "media_feature_stats",
    "shipping_priority",
    "region_volume",
    "customers_without_orders",
    "customers_with_orders",
    "orders_rollup",
    "events_sliding_windows",
    "user_sessions",
    "ann_near_pairs",
    "doc_split_counts",
    "corpus_curation_stats",
    "doc_negative_pairs",
    # Green in r4 but their plans/oracles changed SINCE that driver run
    # (df-cap engaged in the contamination entries; adaptive LSH routing
    # added to the blocked-cosine join) — must be re-gated, not trusted:
    "contamination_check",
    "contamination_containment",
    "embedding_dup_clusters",
    # New in round 5 (never driver-checked).  With 44 gate-first
    # entries the window's remaining 6 slots fill in catalog order with
    # the flagship traversal family (delegation/chain/mission/wot/abac
    # — green in r4 AND re-gated here); everything rotated out is
    # r1-r4-green and stays covered by the local oracle replica:
    "doc_dup_span_stats",
    "doc_gopher_rules",
    "doc_tfidf_topk",
    "semantic_dedup_stats",
    "customer_pii_scrub",
    "event_type_salted_counts",
    "curation_pipeline_stats",
    "supplier_pagerank",
    "doc_top_ngram_stats",
    "doc_sample_per_source",
    "source_bloom_probe_stats",
    "doc_chunk_stats",
    "trade_graph_degrees",
    "trade_trust_from_anchor",
    "event_user_cm_counts",
    # Late round-5 additions (never driver-checked — each takes one of
    # the catalog-order filler slots, whose occupants were r4-green):
    "trade_kcore",
    "trade_temporal_reach",
    "doc_difficulty_deciles",
    "label_maxsim_topk",
    "pq_adc_topk",
    "user_funnel_counts",
    "user_retention_cohorts",
    # Session additions filling the last window slot (50 of 50).  Every
    # other entry added this session (BM25's siblings: fluency,
    # recall@k, the Q7/Q8/Q9 trade analytics, co-occurrence similarity,
    # table profiling, gap-filled resample, z-score outliers, BPE token
    # stats, duplicate passages, winnowing, weighted sampling, CUBE,
    # PIVOT, cluster keepers, OLS/corr, DBSCAN cores) sits beyond the
    # 50-row window: each is local-replica-green
    # (tests/test_queries_oracle.py covers every oracle) and queues for
    # the r6 rotation:
    "doc_bm25_topk",
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
