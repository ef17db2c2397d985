"""Two-level CDF prefix sum (VERDICT r11 task #3).

Round 11's ``_cdf_grid`` ran each group's cumulative sums through ONE
``Window.partitionBy(g)`` task; round 12 range-buckets the jump points
so the big windows partition by (group, bucket).  These tests pin:

* exactness across MANY buckets against a brute-force pandas CDF scan
  (wide value range, hundreds of distinct points per group, so the
  bucketed path genuinely splits the work), and
* the plan: the cumulative windows partition by (g, bkt) — a regression
  to a whole-group window would re-serialize the statistic.
"""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators.stats import (
    CDF_GRID_BUCKETS,
    ks_drift,
    wasserstein_drift,
)


def _brute(df_pd: pd.DataFrame, ref: str):
    """Exact KS / W1 per group vs ref, straight from the definitions."""
    out = {}
    r = np.sort(df_pd.loc[df_pd.g == ref, "x"].to_numpy())
    for g, sub in df_pd.groupby("g"):
        a = np.sort(sub["x"].to_numpy())
        grid = np.unique(np.concatenate([a, r]))
        fa = np.searchsorted(a, grid, side="right") / len(a)
        fr = np.searchsorted(r, grid, side="right") / len(r)
        ks = float(np.max(np.abs(fa - fr)))
        w1 = float(np.sum(np.abs(fa - fr)[:-1] * np.diff(grid)))
        out[g] = (round(ks, 9), round(w1, 9))
    return out


@pytest.fixture(scope="module")
def wide(spark):
    """3 groups × ~400 distinct values spread over [0, 4e6]: every one
    of the 64 range buckets is non-empty for every group."""
    rng = np.random.default_rng(7)
    frames = []
    for g, (loc, scale, n) in {
        "ref": (2_000_000, 600_000, 900),
        "shifted": (2_400_000, 600_000, 700),
        "narrow": (2_000_000, 150_000, 500),
    }.items():
        x = rng.normal(loc, scale, n).astype("int64")
        frames.append(pd.DataFrame({"g": g, "x": x}))
    pdf = pd.concat(frames, ignore_index=True)
    return spark.createDataFrame(pdf).localCheckpoint(), pdf


def test_ks_and_w1_exact_across_many_buckets(wide):
    df, pdf = wide
    expect = _brute(pdf, "ref")
    ks = {r.g: r.ks for r in ks_drift(df, "g", "x", "ref").collect()}
    w1 = {r.g: r.w1 for r in wasserstein_drift(df, "g", "x", "ref").collect()}
    assert set(ks) == set(expect)
    for g, (eks, ew1) in expect.items():
        assert ks[g] == pytest.approx(eks, abs=1e-9), g
        assert w1[g] == pytest.approx(ew1, abs=1e-9), g
    assert ks["ref"] == 0.0 and w1["ref"] == 0.0


def test_single_distinct_value_group(spark):
    """Degenerate range (max == min): the bucket map must not divide by
    zero and the statistics stay exact."""
    rows = [("ref", 5)] * 4 + [("g1", 5)] * 3 + [("g2", 9)] * 2
    df = spark.createDataFrame(rows, "g string, x long").localCheckpoint()
    ks = {r.g: r.ks for r in ks_drift(df, "g", "x", "ref").collect()}
    assert ks["g1"] == 0.0  # same point mass
    assert ks["g2"] == 1.0  # disjoint point masses
    w1 = {r.g: r.w1 for r in wasserstein_drift(df, "g", "x", "ref").collect()}
    assert w1["g1"] == 0.0
    assert w1["g2"] == 4.0  # move all mass from 5 to 9


def test_cumulative_windows_partition_by_group_and_bucket(wide):
    df, _ = wide
    plan = (
        ks_drift(df, "g", "x", "ref")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the heavy running-sum windows must carry the bucket key; only the
    # tiny |groups|×B offsets table may window on the group alone
    assert "bkt" in plan
    assert CDF_GRID_BUCKETS == 64
