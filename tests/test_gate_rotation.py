"""Gate-window staleness is a test, not a docstring (VERDICT r10 task #1).

The driver checks only the FIRST 50 entries of ``queries()`` each round, so
a catalog entry without a recent ``CORRECTNESS_r*.json`` row is, from the
driver's standpoint, unimplemented.  These tests parse the committed
driver-gate history and fail the suite when the rotation contract is
violated, so window staleness can never again survive a round of feature
work unnoticed:

* every catalog entry that has NEVER received a driver row must sit inside
  the current first-50 window, and
* every entry whose latest driver row is more than ``MAX_STALE_ROUNDS``
  rounds older than the newest committed gate file must sit inside the
  window.

No SparkSession is needed; this is pure catalog/JSON bookkeeping.
"""

import glob
import json
import os
import re

import pytest

from graphdb_for_drones_spark.plans import QUERIES

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE_WINDOW = 50
MAX_STALE_ROUNDS = 3


def _gate_history():
    """Return ({entry: latest round with a driver row}, newest round)."""
    latest = {}
    rounds = []
    for path in glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")):
        match = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if match is None:
            continue
        round_no = int(match.group(1))
        rounds.append(round_no)
        with open(path) as fh:
            rows = json.load(fh)
        for name in rows:
            latest[name] = max(latest.get(name, 0), round_no)
    if not rounds:
        pytest.skip("no CORRECTNESS_r*.json history in this checkout")
    return latest, max(rounds)


def _window():
    return list(QUERIES)[:GATE_WINDOW]


def test_window_is_full_and_unique():
    window = _window()
    assert len(window) == GATE_WINDOW
    assert len(set(window)) == GATE_WINDOW


def test_never_gated_entries_are_in_window():
    latest, _ = _gate_history()
    window = set(_window())
    never_gated = sorted(
        name for name in QUERIES if name not in latest and name not in window
    )
    assert not never_gated, (
        "catalog entries that have never received a driver CORRECTNESS row "
        f"must be in the first-{GATE_WINDOW} gate window this round: "
        f"{never_gated}"
    )


def test_no_stale_entry_outside_window():
    latest, newest_round = _gate_history()
    window = set(_window())
    stale = sorted(
        (name, latest[name])
        for name in QUERIES
        if name in latest
        and newest_round - latest[name] > MAX_STALE_ROUNDS
        and name not in window
    )
    assert not stale, (
        f"entries whose latest driver row is more than {MAX_STALE_ROUNDS} "
        f"rounds older than round {newest_round} must rotate into the "
        f"first-{GATE_WINDOW} window: {stale}"
    )


def test_gate_order_is_self_deriving():
    """Round 12: the window order must come from the committed gate
    history — overrides first, then never-gated, then ascending
    latest-gated round — so the staleness invariants above hold by
    construction, not by hand-maintained lists."""
    from graphdb_for_drones_spark import plans

    latest, _ = _gate_history()
    order = list(QUERIES)
    n_over = len(plans._GATE_OVERRIDE)
    assert order[:n_over] == list(plans._GATE_OVERRIDE)
    rest = order[n_over:]
    # never-gated block (if any) strictly precedes every gated entry,
    # and gated entries are non-decreasing in latest-gated round
    ranks = [latest.get(n, -1) for n in rest]
    assert ranks == sorted(ranks), (
        "gate order must be stalest-first after the override block"
    )
