"""Merged query/oracle catalog (the driver-gate contract surface).

The driver's CORRECTNESS gate checks exactly the FIRST 50 entries of the
dict returned by ``__spark_entry__.queries()`` (which is ``dict(QUERIES)``,
so insertion order here is the gate order).  The catalog is larger than 50,
so ``_GATE_FIRST`` below explicitly rotates queries into the checked window.

Round-4 rotation: the 13 queries that sat beyond the 50-row cap in round 3
(8 of which never had a driver row in any round) lead the dict; the
rotated-out tail stays covered by the local oracle replica
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
    # Never driver-checked through round 3 (VERDICT r3 "What's missing" #1):
    "ivf_topk",
    "min_price_supplier",
    "user_event_hash_chain",
    "event_props_extract",
    "dedup_clusters",
    "embedding_clusters",
    "event_value_hist_quantiles",
    "event_hll_rollup",  # rows-only by design (HLL estimate is engine-specific)
    # Last checked in round 2, rotated out by the r3 catalog growth:
    "asof_signup_before_purchase",
    "event_user_distinct",
    "events_in_windows",
    "event_value_percentiles",
    "nation_triangles",
    # New in round 4 (training-pipeline curation ops) — never checked:
    "contamination_check",
    "doc_pack_stats",
    "mixture_weights",
    "doc_repetition",
    "embedding_dup_clusters",
    "doc_pack_greedy_stats",  # rows-only by design (FFD state machine)
    "doc_quality_sample_stats",
    "contamination_containment",
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
