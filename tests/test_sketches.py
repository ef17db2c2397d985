"""HLL sketch rollups: merged coarse-grain estimates must track exact
distinct counts within sketch error, WITHOUT touching the fact table."""

import pytest
from pyspark.sql import functions as F

from graphdb_for_drones_spark.catalog import Catalog
from graphdb_for_drones_spark.operators.sketches import hll_build, hll_rollup


def test_hll_rollup_accuracy(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    ev = cat.events.withColumn("day", F.to_date("ts"))
    daily = hll_build(ev, ["event_type", "day"], "user_id")
    rolled = hll_rollup(daily, ["event_type"])
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {r.event_type: r.approx_distinct for r in rolled.collect()}
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_hll_rollup_row_counts_exact(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    ev = cat.events.withColumn("day", F.to_date("ts"))
    rolled = hll_rollup(hll_build(ev, ["event_type", "day"], "user_id"), [])
    assert rolled.first().n_rows == ev.count()


def test_hist_quantiles_accuracy_and_merge(spark):
    # sketch-served quantiles within one bin width of exact; rollup of
    # per-day sketches equals a direct per-key histogram (merge algebra)
    import random

    from graphdb_for_drones_spark.operators.sketches import (
        hist_build,
        hist_quantiles,
        hist_rollup,
    )

    rng = random.Random(11)
    rows = [
        ("a", i % 7, rng.uniform(0, 100)) for i in range(2000)
    ] + [("b", i % 7, rng.gauss(50, 10)) for i in range(2000)]
    df = spark.createDataFrame(
        rows, "k string, day int, v double"
    ).localCheckpoint()
    lo, hi, nb = 0.0, 100.0, 100
    width = (hi - lo) / nb

    daily = hist_build(df, ["k", "day"], "v", lo, hi, nb)
    rolled = hist_rollup(daily, ["k"])
    direct = hist_build(df, ["k"], "v", lo, hi, nb)
    a = {(r.k, r.bucket): r.cnt for r in rolled.collect()}
    b = {(r.k, r.bucket): r.cnt for r in direct.collect()}
    assert a == b  # merge algebra is exact

    got = {r.k: r for r in hist_quantiles(rolled, ["k"], lo, hi, nb).collect()}
    for k in ("a", "b"):
        vals = sorted(v for kk, _d, v in rows if kk == k)
        for q, col in [(0.5, "p50"), (0.95, "p95"), (0.99, "p99")]:
            import math

            exact = vals[math.ceil(q * len(vals)) - 1]
            est = got[k][col]
            assert abs(est - exact) <= width + 1e-9, (k, col, est, exact)


def test_bloom_no_false_negatives_and_fpr(spark):
    from pyspark.sql import functions as F

    from graphdb_for_drones_spark.operators.sketches import (
        bloom_build,
        bloom_probe_counts,
    )

    members = spark.range(500).select(
        F.lit("s1").alias("src"), F.concat(F.lit("m"), F.col("id")).alias("g")
    ).localCheckpoint()
    bloom = bloom_build(members, ["src"], "g", m_bits=63 * 256, k=3)
    # every true member must be maybe-present (no false negatives)
    hit = bloom_probe_counts(bloom, ["src"], members, "g", m_bits=63 * 256, k=3)
    r = hit.collect()[0]
    assert (r.n_probed, r.n_maybe_present) == (500, 500)
    # disjoint probes: false positives allowed but bounded — with
    # n=500, m=16128, k=3 the theoretical fpr is ~0.2%; assert < 5%
    others = spark.range(1000).select(
        F.concat(F.lit("x"), F.col("id")).alias("g")
    ).localCheckpoint()
    miss = bloom_probe_counts(bloom, ["src"], others, "g", m_bits=63 * 256, k=3)
    r = miss.collect()[0]
    assert r.n_probed == 1000
    assert r.n_maybe_present < 50


def test_bloom_merge_equals_union_build(spark):
    from pyspark.sql import functions as F

    from graphdb_for_drones_spark.operators.sketches import (
        bloom_build,
        bloom_merge,
    )

    day1 = spark.range(100).select(
        F.lit("s").alias("src"), F.lit(1).alias("day"),
        F.concat(F.lit("a"), F.col("id")).alias("g"),
    )
    day2 = spark.range(100).select(
        F.lit("s").alias("src"), F.lit(2).alias("day"),
        F.concat(F.lit("b"), F.col("id")).alias("g"),
    )
    both = day1.unionByName(day2).localCheckpoint()
    fine = bloom_build(both, ["src", "day"], "g", m_bits=63 * 64, k=3)
    merged = {
        (r.idx, r.bits) for r in bloom_merge(fine, ["src"]).collect()
    }
    direct = {
        (r.idx, r.bits)
        for r in bloom_build(both, ["src"], "g", m_bits=63 * 64, k=3).collect()
    }
    assert merged == direct


def test_bloom_md5_family_engine_neutral(spark):
    # md5 family positions must be independent of partitioning and match
    # a driver-side python replay of the md5-60 arithmetic
    import hashlib

    from pyspark.sql import functions as F

    from graphdb_for_drones_spark.operators.sketches import bloom_build

    elems = ["alpha", "beta", "gamma"]
    df = spark.createDataFrame(
        [("k", e) for e in elems], "src string, g string"
    ).localCheckpoint()
    bloom = {
        (r.idx, r.bits)
        for r in bloom_build(
            df, ["src"], "g", m_bits=63 * 8, k=2, family="md5"
        ).collect()
    }
    m = 63 * 8
    words = {}
    for e in elems:
        hh = int(hashlib.md5(e.encode()).hexdigest()[:15], 16)
        h1, h2 = hh % m, 1 + (hh // 2 // m) % (m - 1)
        for j in range(2):
            pos = (h1 + j * h2) % m
            words[pos // 63] = words.get(pos // 63, 0) | (1 << (pos % 63))
    assert bloom == set(words.items())


def test_cm_estimate_dominates_exact_counts(spark):
    from pyspark.sql import functions as F

    from graphdb_for_drones_spark.operators.sketches import (
        cm_build,
        cm_estimate,
    )

    # skewed stream: element e_i appears i+1 times
    rows = [("k", f"e{i}") for i in range(50) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "g string, elem string").localCheckpoint()
    sk = cm_build(df, ["g"], "elem", width=256, depth=4)
    est = {
        r.elem: r.est
        for r in cm_estimate(
            sk, ["g"], df.select("elem"), "elem", width=256, depth=4
        ).collect()
    }
    for i in range(50):
        assert est[f"e{i}"] >= i + 1  # count-min never undercounts
    # absent element estimates 0 unless it collides
    miss = cm_estimate(
        sk,
        ["g"],
        spark.createDataFrame([("zzz",)], "elem string"),
        "elem",
        width=256,
        depth=4,
    ).collect()[0]
    assert miss.est >= 0


def test_cm_merge_equals_union_build(spark):
    from pyspark.sql import functions as F

    from graphdb_for_drones_spark.operators.sketches import cm_build, cm_merge

    d1 = spark.range(200).select(
        F.lit("k").alias("g"), F.lit(1).alias("day"),
        F.concat(F.lit("a"), (F.col("id") % 30)).alias("elem"),
    )
    d2 = spark.range(100).select(
        F.lit("k").alias("g"), F.lit(2).alias("day"),
        F.concat(F.lit("a"), (F.col("id") % 10)).alias("elem"),
    )
    both = d1.unionByName(d2).localCheckpoint()
    fine = cm_build(both, ["g", "day"], "elem", width=128, depth=3)
    merged = {
        (r.r, r.c, r.cnt) for r in cm_merge(fine, ["g"]).collect()
    }
    direct = {
        (r.r, r.c, r.cnt)
        for r in cm_build(both, ["g"], "elem", width=128, depth=3).collect()
    }
    assert merged == direct


def test_hll_md5_accuracy_and_merge_invariance(spark, sf_dir):
    """md5-register HLL (the oracle-reproducible twin): the estimate
    must track exact distinct counts within the m=256 sketch envelope,
    and merging DAILY register tables by MAX must equal building the
    registers at the coarse grain directly (sketch mergeability)."""
    from graphdb_for_drones_spark.operators.sketches import (
        hll_md5_estimate,
        hll_md5_registers,
    )

    cat = Catalog(spark, sf_dir)
    ev = cat.events.select(
        "event_type",
        F.expr("unix_millis(ts) DIV 86400000").alias("day"),
        "user_id",
    ).localCheckpoint()
    daily = hll_md5_registers(ev, ["event_type", "day"], "user_id")
    merged = hll_md5_estimate(daily, ["event_type"])
    direct = hll_md5_estimate(
        hll_md5_registers(ev, ["event_type"], "user_id"), ["event_type"]
    )
    got_m = {r.event_type: (r.n_registers, r.approx_distinct)
             for r in merged.collect()}
    got_d = {r.event_type: (r.n_registers, r.approx_distinct)
             for r in direct.collect()}
    assert got_m == got_d  # merge-then-estimate == direct build
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, (_, est) in got_m.items():
        # 3x the m=256 RSE (1.04/sqrt(256) = 6.5%) as the hard envelope
        assert abs(est - exact[k]) / exact[k] < 0.20, (k, est, exact[k])


def test_hll_md5_empty_and_single_value(spark):
    """Degenerate inputs: a single distinct value must estimate ~1 via
    the linear-counting branch; NULL values drop."""
    from graphdb_for_drones_spark.operators.sketches import (
        hll_md5_estimate,
        hll_md5_registers,
    )

    df = spark.createDataFrame(
        [("a", 7)] * 5 + [("a", None)], "g string, v long"
    ).localCheckpoint()
    regs = hll_md5_registers(df, ["g"], "v")
    assert regs.count() == 1  # one distinct value -> one register
    r = hll_md5_estimate(regs, ["g"]).first()
    assert r.n_registers == 1
    assert 0.9 < r.approx_distinct < 1.5


def _hll_md5_reference(values, m=256, sent=53):
    """Straight-line python md5-HLL: the same registers and estimate
    arithmetic as the engine and the SQL twin, independently coded."""
    import hashlib
    import math

    regs = {}
    for v in values:
        if v is None:
            continue
        h = int(hashlib.md5(f"{v}:hll".encode()).hexdigest()[:15], 16)
        idx, rest = h % m, h // m
        rho = sent - rest.bit_length() if rest > 0 else sent
        regs[idx] = max(regs.get(idx, 0), rho)
    s = sum(1 << (sent - r) for r in regs.values()) + (m - len(regs)) * (
        1 << sent
    )
    from graphdb_for_drones_spark.operators.sketches import HLL_MD5_ALPHA_NUM

    raw = HLL_MD5_ALPHA_NUM / float(s)
    v_zero = m - len(regs)
    if raw <= 2.5 * m and v_zero > 0:
        est = float(m) * math.log(float(m) / float(v_zero))
    else:
        est = raw
    return regs, round(est, 9)


@pytest.mark.parametrize("seed,n,domain", [
    (1, 40, 10**3),      # tiny: deep linear-counting region
    (2, 500, 10**6),     # LC region with hash collisions
    (3, 5000, 10**9),    # past 2.5m: raw-branch region
    (4, 200, 5),         # heavy value collisions (5 distinct)
])
def test_hll_md5_matches_python_reference(spark, seed, n, domain):
    """Engine registers AND estimate must equal an independently coded
    straight-line python reference exactly (same md5-60 hash, same
    integer register algebra, same one-division/ln arithmetic) — the
    cross-engine contract pinned without DuckDB in the loop."""
    import random

    from graphdb_for_drones_spark.operators.sketches import (
        hll_md5_estimate,
        hll_md5_registers,
    )

    rng = random.Random(seed)
    vals = [rng.randrange(domain) for _ in range(n)]
    ref_regs, ref_est = _hll_md5_reference(vals)
    df = spark.createDataFrame(
        [("k", v) for v in vals], "g string, v long"
    ).localCheckpoint()
    got_regs = {
        r.idx: r.rho
        for r in hll_md5_registers(df, ["g"], "v").collect()
    }
    assert got_regs == ref_regs
    got = hll_md5_estimate(
        hll_md5_registers(df, ["g"], "v"), ["g"]
    ).first()
    assert got.n_registers == len(ref_regs)
    assert got.approx_distinct == pytest.approx(ref_est, abs=0.0), (
        got.approx_distinct,
        ref_est,
    )
