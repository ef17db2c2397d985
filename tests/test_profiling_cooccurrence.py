"""Unit semantics for operators/profiling.profile_table and
operators/graph_algorithms.cooccurrence_similarity (catalog twins are
oracle-checked; these pin contracts on controlled inputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators.graph_algorithms import (
    cooccurrence_similarity,
)
from graphdb_for_drones_spark.operators.profiling import profile_table


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (3, 2.0, None), (4, 5.5, "a")],
        "k long, v double, s string",
    ).localCheckpoint()
    out = {
        r.col_name: r
        for r in profile_table(
            df, numeric_cols=("k", "v"), string_cols=("s",)
        ).collect()
    }
    assert out["k"].n_rows == 4 and out["k"].n_nulls == 0
    assert out["k"].n_distinct == 4
    assert out["k"].min_num == 1.0 and out["k"].max_num == 4.0
    assert out["k"].min_str is None and out["k"].max_str is None
    assert out["v"].n_nulls == 1 and out["v"].n_distinct == 2
    assert out["v"].min_num == 2.0 and out["v"].max_num == 5.5
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    assert out["s"].min_str == "a" and out["s"].max_str == "b"
    assert out["s"].min_num is None


def test_profile_plan_has_no_expand(spark):
    # the selling point: per-column PRUNED aggregates unioned into one
    # job — never the wide-aggregate form, whose N exact distincts
    # compile to an Expand multiplying every row (N+1)x before the
    # shuffle (measured 29x slower on the 6-column orders profile)
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).alias("m")
    )
    plan = profile_table(
        df, numeric_cols=("id", "m")
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "Expand" not in plan
    assert plan.count("Union") == 1


def test_profile_empty_table_and_no_cols(spark):
    df = spark.createDataFrame([], "k long").localCheckpoint()
    rows = profile_table(df, numeric_cols=("k",)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_rows == 0 and r.n_nulls == 0 and r.n_distinct == 0
    assert r.min_num is None
    with pytest.raises(ValueError):
        profile_table(df)


def test_cooccurrence_counts_and_jaccard(spark):
    # groups: g1 {a,b,c}, g2 {a,b}, g3 {b} -> pairs (a,b):2, (a,c):1, (b,c):1
    e = spark.createDataFrame(
        [("g1", "a"), ("g1", "b"), ("g1", "c"), ("g2", "a"), ("g2", "b"),
         ("g3", "b")],
        "g string, i string",
    ).localCheckpoint()
    out = {(r.id_a, r.id_b): r for r in
           cooccurrence_similarity(e, "g", "i", k=10).collect()}
    assert out[("a", "b")].n_common == 2
    # deg(a)=2, deg(b)=3 -> jaccard = 2/(2+3-2)
    assert out[("a", "b")].jaccard == pytest.approx(2 / 3)
    assert out[("a", "c")].n_common == 1
    assert out[("a", "c")].jaccard == pytest.approx(1 / 2)
    assert out[("b", "c")].jaccard == pytest.approx(1 / 3)


def test_cooccurrence_topk_ordering_deterministic(spark):
    e = spark.createDataFrame(
        [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b"),
         ("g1", "x"), ("g3", "x"), ("g3", "y"), ("g1", "y")],
        "g string, i string",
    ).localCheckpoint()
    rows = cooccurrence_similarity(e, "g", "i", k=2).collect()
    # (a,b)=2 and (x,y)=2 tie on count; (a,b) wins the id tiebreak
    assert [(r.id_a, r.id_b) for r in rows] == [("a", "b"), ("x", "y")]


def test_cooccurrence_dense_branch_equals_posting_path(spark):
    # pseudo-random bipartite graph: the dense-matrix branch (asserted
    # small item dimension) must return bit-identical rows to the
    # posting-pair plan, including the jaccard doubles and the
    # (n_common DESC, id) top-k tiebreak
    rows, state = [], 99
    for g in range(60):
        for _ in range(6):
            state = (state * 1103515245 + 12345) % (1 << 31)
            rows.append((g, state % 17))
    e = spark.createDataFrame(
        sorted(set(rows)), "g long, i long"
    ).localCheckpoint()
    posting = cooccurrence_similarity(e, "g", "i", k=15).collect()
    dense = cooccurrence_similarity(
        e, "g", "i", k=15, n_items_hint=17
    ).collect()
    assert [tuple(r) for r in dense] == [tuple(r) for r in posting]


def test_cooccurrence_lying_hint_falls_back(spark):
    # a hint below the threshold but above the true cardinality is
    # verified after the probe; results stay correct either way
    e = spark.createDataFrame(
        [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b")],
        "g string, i string",
    ).localCheckpoint()
    out = cooccurrence_similarity(
        e, "g", "i", k=5, n_items_hint=1, dense_items_threshold=1
    ).collect()
    assert [(r.id_a, r.id_b, r.n_common) for r in out] == [("a", "b", 2)]


def test_ols_trend_recovers_planted_line(spark):
    from graphdb_for_drones_spark.operators.stats import ols_trend

    # exact line y = 2x + 5 for key 'a'; constant x for key 'b' -> NULLs
    rows = [("a", float(x), 2.0 * x + 5.0) for x in range(10)] + [
        ("b", 3.0, float(v)) for v in range(5)
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r.k: r for r in ols_trend(df, ["k"], "x", "y").collect()}
    assert out["a"].slope == 2.0
    # intercept0 = fitted y at min x (x=0) = 5
    assert out["a"].intercept0 == 5.0 and out["a"].x0 == 0.0
    assert out["b"].slope is None and out["b"].intercept0 is None


def test_pearson_corr_exact_cases(spark):
    from graphdb_for_drones_spark.operators.stats import pearson_corr

    rows = (
        [("pos", float(x), 3.0 * x + 1.0) for x in range(8)]
        + [("neg", float(x), -2.0 * x) for x in range(8)]
        + [("flat", float(x), 7.0) for x in range(8)]
    )
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r.k: r.r for r in pearson_corr(df, ["k"], "x", "y").collect()}
    assert out["pos"] == 1.0 and out["neg"] == -1.0
    assert out["flat"] is None  # zero y variance -> NULL, not NaN


def test_cooccurrence_sampled_gamma_inf_equals_exact(spark):
    """γ ≥ √(max deg product) makes every coin pass (p = 1), so the
    sampled op must reproduce the exact counts bit-for-bit — the
    correctness anchor under which sampling is pure mechanism."""
    import random

    from graphdb_for_drones_spark.operators.graph_algorithms import (
        cooccurrence_similarity_sampled,
    )

    rng = random.Random(11)
    rows = list(
        {
            (f"g{rng.randrange(30)}", f"i{rng.randrange(12)}")
            for _ in range(300)
        }
    )
    e = spark.createDataFrame(rows, "g string, i string").localCheckpoint()
    exact = {
        (r.id_a, r.id_b): r.n_common
        for r in cooccurrence_similarity(e, "g", "i", k=100).collect()
    }
    sampled = {
        (r.item_a, r.item_b): r
        for r in cooccurrence_similarity_sampled(
            e, "g", "i", k=100, gamma=1e9
        ).collect()
    }
    assert set(sampled) == set(exact)
    for pair, r in sampled.items():
        assert r.est_common == exact[pair]  # integer-exact at p=1


def test_cooccurrence_sampled_deterministic_and_active(spark):
    """With a small γ the coin must actually drop occurrences (the op
    samples, it doesn't just reweight) while two runs stay identical
    (md5 coin, no RNG state)."""
    import random

    from graphdb_for_drones_spark.operators.graph_algorithms import (
        cooccurrence_similarity_sampled,
    )

    rng = random.Random(13)
    rows = list(
        {
            (f"g{rng.randrange(40)}", f"i{rng.randrange(8)}")
            for _ in range(280)
        }
    )
    e = spark.createDataFrame(rows, "g string, i string").localCheckpoint()
    a = sorted(
        tuple(r)
        for r in cooccurrence_similarity_sampled(
            e, "g", "i", k=100, gamma=2.0
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in cooccurrence_similarity_sampled(
            e, "g", "i", k=100, gamma=2.0
        ).collect()
    )
    assert a == b  # deterministic across runs
    exact_total = sum(
        r.n_common
        for r in cooccurrence_similarity(e, "g", "i", k=1000).collect()
    )
    # raw kept occurrences = est / (1/p) summed; with γ=2 on deg ~30+
    # items p « 1, so the kept multiset must be strictly smaller than
    # the exact pair stream (sampling active), yet estimates stay in a
    # sane band around the truth (unbiasedness sanity, generous)
    est_total = sum(r[4] for r in a)
    assert 0 < est_total < 4 * exact_total


def test_cooccurrence_sampled_null_group_matches_exact(spark):
    """The exact op's groupBy keeps a NULL group as a real group; the
    sampled coin must too (a NULL-propagating concat silently dropped
    every NULL-group occurrence — round-9 review reproduction)."""
    from graphdb_for_drones_spark.operators.graph_algorithms import (
        cooccurrence_similarity_sampled,
    )

    e = spark.createDataFrame(
        [("g1", "a"), ("g1", "b"), (None, "a"), (None, "b"),
         ("g2", "a"), ("g2", "b")],
        "g string, i string",
    ).localCheckpoint()
    exact = {
        (r.id_a, r.id_b): r.n_common
        for r in cooccurrence_similarity(e, "g", "i", k=10).collect()
    }
    sampled = {
        (r.item_a, r.item_b): r.est_common
        for r in cooccurrence_similarity_sampled(
            e, "g", "i", k=10, gamma=1e9
        ).collect()
    }
    assert exact[("a", "b")] == 3
    assert sampled[("a", "b")] == 3  # NULL group counted, not dropped


def test_auto_dimsum_gamma_values():
    """γ = 4·max(8, ⌈log₂ n⌉) in integer arithmetic — floored at 32
    (the sf0.1 anchor: corpora <= 256 items keep the old constant) and
    growing with the item-dimension union bound (VERDICT r10 task #3)."""
    from graphdb_for_drones_spark.operators.graph_algorithms import (
        auto_dimsum_gamma,
    )

    assert auto_dimsum_gamma(0) == 32.0
    assert auto_dimsum_gamma(1) == 32.0
    assert auto_dimsum_gamma(100) == 32.0
    assert auto_dimsum_gamma(256) == 32.0  # 2^8 exactly: still the floor
    assert auto_dimsum_gamma(257) == 36.0  # first corpus past the floor
    assert auto_dimsum_gamma(1000) == 40.0
    assert auto_dimsum_gamma(10_000) == 56.0


def test_cooccurrence_sampled_auto_gamma_matches_derived(spark):
    """gamma=None must execute exactly the plan of the explicitly
    derived γ — the auto path is a count + the same pipeline."""
    import random

    from graphdb_for_drones_spark.operators.graph_algorithms import (
        auto_dimsum_gamma,
        cooccurrence_similarity_sampled,
    )

    rng = random.Random(17)
    rows = list(
        {
            (f"g{rng.randrange(40)}", f"i{rng.randrange(9)}")
            for _ in range(260)
        }
    )
    e = spark.createDataFrame(rows, "g string, i string").localCheckpoint()
    n_items = e.select("i").distinct().count()
    auto = sorted(
        tuple(r)
        for r in cooccurrence_similarity_sampled(e, "g", "i", k=100).collect()
    )
    pinned = sorted(
        tuple(r)
        for r in cooccurrence_similarity_sampled(
            e, "g", "i", k=100, gamma=auto_dimsum_gamma(n_items)
        ).collect()
    )
    assert auto == pinned


def test_exact_pairs_budget_guard(spark):
    """The exact posting path must refuse a pair stream past
    ``max_pairs`` with the escape routes named, keep working under the
    budget, and run unguarded with max_pairs=None (VERDICT r10 #4)."""
    import random

    import pytest

    from graphdb_for_drones_spark.operators.graph_algorithms import (
        cooccurrence_similarity,
    )

    rng = random.Random(19)
    rows = list(
        {
            (f"g{rng.randrange(6)}", f"i{rng.randrange(60)}")
            for _ in range(300)
        }
    )
    e = spark.createDataFrame(rows, "g string, i string").localCheckpoint()
    with pytest.raises(ValueError, match="sampled"):
        cooccurrence_similarity(e, "g", "i", k=10, max_pairs=100)
    under = cooccurrence_similarity(e, "g", "i", k=10).collect()
    forced = cooccurrence_similarity(
        e, "g", "i", k=10, max_pairs=None
    ).collect()
    assert [tuple(r) for r in under] == [tuple(r) for r in forced]
    assert len(under) == 10
