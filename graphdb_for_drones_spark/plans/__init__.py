"""Merged query/oracle catalog (the driver-gate contract surface).

The driver's CORRECTNESS gate checks exactly the FIRST 50 entries of the
dict returned by ``__spark_entry__.queries()`` (which is ``dict(QUERIES)``,
so insertion order here is the gate order).  The catalog is larger than
50, so the window must ROTATE so every entry keeps a recent driver row.

Round 12 makes the rotation SELF-DERIVING (VERDICT r11 task #1): the
order is computed at import time from the committed ``CORRECTNESS_r*.json``
history — the same files ``tests/test_gate_rotation.py`` parses — so the
window can never again drift out of sync with the staleness test:

1. ``_GATE_OVERRIDE`` leads: the explicit, per-round list of entries
   whose PLANS changed this round or that are NEW this round (a changed
   plan outranks a stale-unchanged row — its old driver rows attest a
   plan that no longer exists).
2. Then every remaining catalog entry, stalest first: never-gated
   entries (no driver row in any committed gate file) sort before all
   gated ones, then ascending latest-gated round, tie-broken by catalog
   insertion order so the order is deterministic for a given history.

With a 50-entry window, ~160 entries, and ≤ ~15 new entries per round,
the stalest-first fill guarantees every entry re-gates at least every
⌈160/35⌉ ≈ 5 rounds and the never-gated/staleness invariants of
``tests/test_gate_rotation.py`` hold by construction.  Rotated-out
entries stay covered every round by the local oracle replica
(``tests/test_queries_oracle.py`` runs every oracle-paired query).

Round-12 override rationale: ``source_drift_ks`` / ``source_drift_w1``
re-gate because their shared ``_cdf_grid`` half moved to the two-level
(range-bucketed) prefix sum this round — identical values, new plan;
``event_hll_rollup_md5``, ``event_funnel_streamed``,
``user_retention_cohorts_streamed``, ``event_hll_rollup_md5_streamed``,
``source_drift_ks_streamed`` and ``source_drift_w1_streamed`` are new
this round (never-gated also catches them; the override records
intent).
"""

import glob
import json
import os
import re

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

# Entries whose plans CHANGED this round, or that are NEW this round —
# the only hand-maintained part of the rotation (see module docstring).
_GATE_OVERRIDE = [
    "source_drift_ks",
    "source_drift_w1",
    "event_hll_rollup_md5",
    "event_funnel_streamed",
    "user_retention_cohorts_streamed",
    "event_hll_rollup_md5_streamed",
    "source_drift_ks_streamed",
    "source_drift_w1_streamed",
]

_missing = [n for n in _GATE_OVERRIDE if n not in _MERGED_QUERIES]
if _missing:  # pragma: no cover - guards against catalog renames
    raise KeyError(f"_GATE_OVERRIDE names not in catalog: {_missing}")


def _latest_gated_round() -> dict:
    """Latest committed driver-gate round per entry, parsed from the
    CORRECTNESS_r*.json files at the repo root (absent files — e.g. a
    fresh checkout — mean every entry is 'never gated', and the order
    degrades gracefully to override + catalog order)."""
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    latest: dict = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        match = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if match is None:
            continue
        round_no = int(match.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, json.JSONDecodeError):  # pragma: no cover
            continue
        for name in rows:
            latest[name] = max(latest.get(name, 0), round_no)
    return latest


def _gate_order() -> list:
    latest = _latest_gated_round()
    catalog_idx = {name: i for i, name in enumerate(_MERGED_QUERIES)}
    rest = [n for n in _MERGED_QUERIES if n not in _GATE_OVERRIDE]
    # never-gated entries get latest = -1 and sort before every gated one
    rest.sort(key=lambda n: (latest.get(n, -1), catalog_idx[n]))
    return list(_GATE_OVERRIDE) + rest


QUERIES = {name: _MERGED_QUERIES[name] for name in _gate_order()}
ORACLES = {name: _MERGED_ORACLES[name] for name in QUERIES if name in _MERGED_ORACLES}

__all__ = ["QUERIES", "ORACLES"]
