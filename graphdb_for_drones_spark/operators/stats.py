"""Regression / correlation aggregates — the ``regr_slope`` /
``regr_intercept`` / ``corr`` surface every SQL engine ships, rebuilt on
EXACT decimal moment sums so the results are reduction-order-independent
and driver-hash-checkable (the native ``corr``/``covar`` aggregates fold
doubles in partition order — nondeterministic across layouts, which is
why they can't be oracle-paired directly).

Inputs are CENTERED per key (x − min(x), and y − min(y) for r) before
the moments: slope and r are shift-invariant, and without centering the
closed form computes ``n·Σx² − (Σx)²`` as a difference of ~1e17-scale
doubles — catastrophic cancellation that amplifies the one place the
two engines may differ by an ulp (DECIMAL(38,10) → double conversion of
the exact sums).  Centered, every unpacked double has ≤ 13 significant
digits and the conversion is exact, so the closed form is bit-identical
(observed: intercepts differing at 1e-6 uncentered, exact after).

Pattern: the per-key mins are a map-side-combined aggregate broadcast
back onto the rows (r12: the earlier key-partitioned window bounded the
whole moment fold's parallelism by |keys| — 3 tasks on l_returnflag);
per-row products are computed in double (deterministic per row), cast
to DECIMAL(28,10) and summed exactly in the scan partitioning; the
closed form unpacks in ONE documented op order that the SQL twins
replicate literally.  At 100 TB this is two column-pruned scans of the
(key, x, y) slice and two tiny map-combined exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _centered_moments(
    df: DataFrame, key_cols, x: str, y: str
) -> DataFrame:
    # r12 (guide §2.5 — parallelism bounded by key cardinality): the old
    # ``Window.partitionBy(key)`` centering repartitioned the whole fact
    # slice into |keys| partitions, serializing the decimal moment fold
    # onto |keys| cores (profiled: 3-task 4 s stage on l_returnflag).
    # Compute the per-key mins as a map-side-combined aggregate instead,
    # broadcast them back, and fold the moments in the SCAN partitioning
    # (spread when the source arrives in fewer splits than the cluster —
    # no-op at real scale).  The final aggregate is map-side combined,
    # so the exchange carries |tasks|·|keys| partial rows.  Values are
    # identical: same per-key mins, same per-row doubles, and the
    # DECIMAL sums are reduction-order-independent by design.
    from graphdb_for_drones_spark.operators.dedup import _spread_input

    keys = list(key_cols)
    base = _spread_input(df, *keys, x, y)
    # null-SAFE broadcast-back (ADVICE r12): a plain equi-join on the
    # keys silently dropped NULL-keyed groups that the old window
    # centering kept as their own partition.  <=> plans as a
    # BroadcastHashJoin key the same as =, so the shape is unchanged;
    # groupBy below groups NULL keys together, matching the window.
    mins = base.groupBy(*keys).agg(
        F.min(x).alias("__x0"), F.min(y).alias("__y0")
    ).select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
        "__x0",
        "__y0",
    )
    cond = None
    for i, k in enumerate(keys):
        c = base[k].eqNullSafe(mins[f"__k{i}"])
        cond = c if cond is None else (cond & c)
    base = base.join(F.broadcast(mins), cond).drop(
        *[f"__k{i}" for i in range(len(keys))]
    )
    xc = F.col(x) - F.col("__x0")
    yc = F.col(y) - F.col("__y0")
    d = lambda c: c.cast("decimal(28,10)")  # noqa: E731
    return base.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.first("__x0").alias("x0"),
        F.first("__y0").alias("y0"),
        F.sum(d(xc)).cast("double").alias("sx"),
        F.sum(d(yc)).cast("double").alias("sy"),
        F.sum(d(xc * yc)).cast("double").alias("sxy"),
        F.sum(d(xc * xc)).cast("double").alias("sxx"),
        F.sum(d(yc * yc)).cast("double").alias("syy"),
    )


def ols_trend(
    df: DataFrame, key_cols, x: str, y: str, round_to: int = 6
) -> DataFrame:
    """Per-key least-squares line in centered coordinates: ``slope``
    (shift-invariant — dy/dx in the ORIGINAL units) and ``intercept0``,
    the fitted y AT the key's minimum x (y-centering undone by adding
    y0 back).  Keys with zero x spread surface with NULLs rather than
    an ANSI division failure."""
    m = _centered_moments(df, key_cols, x, y)
    den = m["n"] * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (m["n"] * F.col("sxy") - F.col("sx") * F.col("sy")) / den
    icept = (F.col("sy") - slope * F.col("sx")) / m["n"] + F.col("y0")
    ok = den != 0
    return m.select(
        *key_cols,
        "n",
        F.col("x0"),
        F.when(ok, F.round(slope, round_to)).alias("slope"),
        F.when(ok, F.round(icept, round_to)).alias("intercept0"),
    )


def pearson_corr(
    df: DataFrame, key_cols, x: str, y: str, round_to: int = 6
) -> DataFrame:
    """Per-key Pearson r from the centered exact moments; NULL when
    either variable has zero variance."""
    m = _centered_moments(df, key_cols, x, y)
    vx = m["n"] * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = m["n"] * F.col("syy") - F.col("sy") * F.col("sy")
    num = m["n"] * F.col("sxy") - F.col("sx") * F.col("sy")
    ok = (vx > 0) & (vy > 0)
    r = num / (F.sqrt(vx) * F.sqrt(vy))
    return m.select(
        *key_cols, "n", F.when(ok, F.round(r, round_to)).alias("r")
    )


def distribution_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ref_group: str,
    n_bins: int = 10,
) -> DataFrame:
    """Histogram DRIFT of an integer feature per corpus slice against a
    REFERENCE slice — the dataset-monitoring report (PSI-family) a
    pipeline reads before admitting a new crawl/source into the
    mixture: equal-width bins over the reference range, per-slice bin
    proportions, and three drift statistics per slice:

    * ``tvd`` — total-variation distance, ``0.5 · Σ|p_i − q_i|``;
    * ``chi2`` — Pearson chi-square vs the Laplace-smoothed reference
      ``q'_i = (c_i + 1) / (n + B)`` (smoothing keeps empty reference
      bins finite, the standard PSI dodge);
    * ``max_gap`` — the worst single-bin proportion gap.

    All three are deliberately TRANSCENDENTAL-FREE (no log, unlike
    PSI/KL): binning is exact integer arithmetic (``(x − lo)·B div
    (hi − lo + 1)``, clamped), proportions are single IEEE divisions of
    exact counts, and the per-bin terms fold in BIN ORDER via an
    ordered ``F.aggregate`` — bit-identical to the SQL twin's
    ``list_reduce`` fold, so the driver can hash-check every double.

    Plan shape at 100 TB: one (group, bin) count shuffle with map-side
    combine (B·|groups| rows out), a two-scalar reference min/max
    bound as a broadcast, and a |groups|-row final projection — no row
    ever carries an array wider than B.

    Precondition: the reference slice must be NON-EMPTY (drift against
    nothing is undefined; an empty reference surfaces as a NULL-bin
    map-key error rather than silently zeroed statistics)."""
    counts = bin_counts(df, group_col, value_col, ref_group, n_bins)
    return drift_from_bin_counts(counts, group_col, ref_group, n_bins)


def bin_counts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ref_group: str | None = None,
    n_bins: int = 10,
    bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """(g, b, c) histogram counts over reference-range equal-width bins
    — the binning half of ``distribution_drift``, exposed separately so
    the STREAMING drift monitor can accumulate per-micro-batch counts
    (counts are mergeable by plain SUM; the drift math runs on the
    running totals via ``drift_from_bin_counts``).

    Bounds come from the in-frame ``ref_group`` slice (the batch
    entry's shape) or, for micro-batches that never see the reference,
    from an explicit ``bounds=(lo, hi)`` pair — SAME clamped integer
    expression either way, so stream and batch bin identically."""
    if bounds is not None:
        lo, hi = int(bounds[0]), int(bounds[1])
        mm = df.sparkSession.range(1).select(
            F.lit(lo).cast("long").alias("__lo"),
            F.lit(hi).cast("long").alias("__hi"),
        )
    else:
        if ref_group is None:
            raise ValueError("bin_counts needs ref_group or bounds")
        mm = df.filter(F.col(group_col) == ref_group).agg(
            F.min(value_col).cast("long").alias("__lo"),
            F.max(value_col).cast("long").alias("__hi"),
        )
    raw = F.expr(
        f"(CAST({value_col} AS BIGINT) - __lo) * {n_bins} div (__hi - __lo + 1)"
    )
    binned = (
        df.select(group_col, value_col)
        .crossJoin(F.broadcast(mm))
        .select(
            F.col(group_col).alias("g"),
            F.least(
                F.lit(n_bins - 1), F.greatest(F.lit(0), raw)
            ).alias("b"),
        )
    )
    return binned.groupBy("g", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def drift_from_bin_counts(
    counts: DataFrame,
    group_col: str,
    ref_group: str,
    n_bins: int = 10,
) -> DataFrame:
    """Drift statistics from (g, b, c) bin counts — the math half of
    ``distribution_drift`` (identical ordered folds), shared with the
    streaming monitor so stream==batch equivalence holds by
    construction.  Accepts pre-SUMmed or raw mergeable counts (it
    re-aggregates per (g, b))."""
    counts = counts.groupBy("g", "b").agg(F.sum("c").alias("c"))
    dense = (
        counts.groupBy("g")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("b", "c"))
            ).alias("m"),
            F.sum("c").alias("n_rows"),
        )
        .select(
            "g",
            "n_rows",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bins - 1)),
                # try_element_at: ANSI element_at THROWS on a missing
                # map key, and sparse slices legitimately have empty bins
                lambda i: F.coalesce(
                    F.try_element_at(F.col("m"), i.cast("long")),
                    F.lit(0).cast("long"),
                ),
            ).alias("cs"),
        )
    )
    ref = dense.filter(F.col("g") == ref_group).select(
        F.col("cs").alias("rcs"), F.col("n_rows").alias("rn")
    )
    joined = dense.crossJoin(F.broadcast(ref))
    p = F.transform(F.col("cs"), lambda c: c / F.col("n_rows"))
    q = F.transform(F.col("rcs"), lambda c: c / F.col("rn"))
    qs = F.transform(
        F.col("rcs"), lambda c: (c + F.lit(1)) / (F.col("rn") + F.lit(n_bins))
    )
    gaps = F.zip_with(p, q, lambda a, b: F.abs(a - b))
    chi_terms = F.zip_with(p, qs, lambda a, b: (a - b) * (a - b) / b)
    fold = lambda arr: F.aggregate(  # noqa: E731 - ordered left fold
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    return joined.select(
        F.col("g").alias(group_col),
        F.col("n_rows"),
        F.round(F.lit(0.5) * fold(gaps), 9).alias("tvd"),
        F.round(fold(chi_terms), 9).alias("chi2"),
        F.round(F.array_max(gaps), 9).alias("max_gap"),
    )


def categorical_drift(
    df: DataFrame,
    group_col: str,
    cat_col: str,
    ref_group: str,
) -> DataFrame:
    """Categorical sibling of ``distribution_drift``: drift of a
    CATEGORY mix (language, format, license...) per slice against the
    reference slice.  Bins are the reference's distinct categories in
    ALPHABETICAL order (0-based), plus one trailing "unseen" bin
    catching categories the reference never exhibited — so a slice
    introducing a new language shows up as mass in a bin where the
    smoothed reference has only the Laplace floor, exactly the signal
    an admission gate wants.  TVD / smoothed chi-square / max-gap come
    from the SHARED math half (``drift_from_bin_counts``) — same
    ordered folds, same oracle-exactness.

    One setup-time action sizes the bin space (|ref categories| — the
    auto_band_width precedent: corpus-derived parameters are fine as
    long as both engines derive them from the same data); the category
    → bin mapping is category-cardinality-sized and broadcasts.  Scale
    shape: one (group, bin) count shuffle, everything else is
    dimension-sized."""
    from pyspark.sql.window import Window as _W

    ref_cats = (
        df.filter(F.col(group_col) == ref_group)
        .select(F.col(cat_col).alias("__cat"))
        .distinct()
        .select(
            "__cat",
            (F.row_number().over(_W.orderBy("__cat")) - 1).alias("__idx"),
        )
    )
    n_cats = ref_cats.count()
    if n_cats == 0:
        raise ValueError("reference slice is empty — drift is undefined")
    counts = (
        df.select(group_col, F.col(cat_col).alias("__cat"))
        .join(F.broadcast(ref_cats), "__cat", "left")
        .select(
            F.col(group_col).alias("g"),
            F.coalesce(F.col("__idx"), F.lit(n_cats)).alias("b"),
        )
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return drift_from_bin_counts(counts, group_col, ref_group, n_cats + 1)


def ks_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ref_group: str,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic per slice against a
    REFERENCE slice — the rank-based companion to the binned
    ``distribution_drift``: D_g = sup_x |F_g(x) − F_ref(x)| with NO
    binning loss, the classic "did the whole shape move" admission
    test.  The sup over step functions is attained at a jump point of
    either function, so evaluating both empirical CDFs at the union of
    observed values is exact, not an approximation.

    Deterministic/oracle-exact by construction: cumulative counts are
    integers; each CDF value is ONE correctly-rounded IEEE division of
    exact longs; |a − b| and max are exact — so DuckDB reproduces D to
    the last bit (per-side division also never overflows, unlike the
    cross-multiplied integer form whose n_g·n_ref product blows past
    int64 at ~1e10 rows per side).

    INTEGER-FEATURE CONTRACT (same as ``wasserstein_drift``): the value
    column is cast to long, so fractional inputs are silently truncated
    and distinct points can merge — pre-scale a fixed-point feature
    (e.g. value·10⁶) before calling, or use the binned
    ``distribution_drift`` for genuinely continuous data.

    Plan shape at 100 TB: one (group, value) count shuffle with
    map-side combine, the reference jump points replicated per group
    via a BROADCAST of the |groups|-row dimension (group cardinality is
    bounded, the drift-family contract; the big side stays
    distributed), one full-outer join on (group, value), and the
    cumulative sums as a TWO-LEVEL range-partitioned prefix sum
    (per-(group, bucket) partials + broadcast offsets + within-bucket
    windows — see ``_cdf_grid``), so no single task ever scans a whole
    group's jump points.  State is (|groups| × |distinct values|) rows,
    never row-count-sized.  Heavier than the (group × bins) drift
    report, lighter than a sort of the raw rows.

    Returns one row per group INCLUDING ``ref_group`` (its D is 0.0 —
    the self-consistency row the drift family always carries):
    (group_col, n_rows, ks)."""
    cum = _cdf_grid(df, group_col, value_col, ref_group)
    return _ks_from_grid(cum, group_col)


def ks_drift_from_counts(
    counts: DataFrame, group_col: str, ref_group
) -> DataFrame:
    """``ks_drift`` from PRE-AGGREGATED (g, x, cg) jump-point counts —
    the streaming entry point: per-(group, value) counts are a
    continuous aggregate, so the EXACT KS statistic over a drained
    stream is this function over the accumulated count state (state is
    distinct-value-bounded, the same bound as the batch grid).  Same
    math half as ``ks_drift`` verbatim."""
    return _ks_from_grid(
        _cdf_grid_from_counts(counts, ref_group), group_col
    )


def _ks_from_grid(cum: DataFrame, group_col: str) -> DataFrame:
    # n_g >= 1 for every emitted group; n_r = 0 only when ref_group is
    # absent — NULL the statistic instead of an ANSI division failure
    d = F.when(
        F.col("n_r") > 0,
        F.abs(
            F.col("Cg").cast("double") / F.col("n_g").cast("double")
            - F.col("Cr").cast("double") / F.col("n_r").cast("double")
        ),
    )
    return (
        cum.select("g", "n_g", d.alias("d"))
        .groupBy("g")
        .agg(
            F.max("n_g").cast("long").alias("n_rows"),
            F.round(F.max("d"), 9).alias("ks"),
        )
        .select(F.col("g").alias(group_col), "n_rows", "ks")
    )


#: Range buckets per group for the two-level CDF prefix sum: the big
#: cumulative-sum windows partition by (group, bucket), so per-group
#: parallelism is CDF_GRID_BUCKETS tasks instead of one.
CDF_GRID_BUCKETS = 64


def _cdf_grid(
    df: DataFrame, group_col: str, value_col: str, ref_group
) -> DataFrame:
    """Shared half of the rank-based drift statistics (KS sup-norm and
    Wasserstein-1 integral): per group, the pooled jump-point grid with
    cumulative group/reference counts and the NEXT jump point —
    (g, x, Cg, Cr, n_g, n_r, x_next).

    The cumulative sums run as a TWO-LEVEL range-partitioned prefix sum
    (VERDICT r11 task #3 — the round-11 shape put each group's whole
    distinct-value set through ONE ``Window.partitionBy(g)`` task, which
    serializes a genuinely continuous high-cardinality feature at 100 TB):

    1. each jump point lands in one of ``CDF_GRID_BUCKETS`` equal-width
       value ranges (per-group min/max from the same count table — the
       double-precision bucket map is weakly monotone in x, which is all
       a range partition needs; exactness lives in the integer counts);
    2. per-(group, bucket) PARTIAL sums — one map-side-combined
       aggregate, output is |groups|·B rows;
    3. bucket OFFSETS via a prefix sum over that tiny table (one task
       per group over ≤ B rows), broadcast back;
    4. within-bucket cumulative sums in a (group, bucket)-partitioned
       window: Cg = offset + within-bucket running sum.

    So no task ever scans more than one bucket's share of one group's
    jump points, and per-group parallelism is B tasks.  ``x_next`` is
    the following jump point (within-bucket lead, or the next non-empty
    bucket's minimum from the offsets table; NULL at each group's last
    point) — emitted here so ``wasserstein_drift`` needs no extra
    whole-group window.  All counts stay exact longs; every CDF value
    downstream is one IEEE division of exact integers."""
    v = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("long").alias("x"),
    ).filter(F.col("x").isNotNull())
    gc = v.groupBy("g", "x").agg(
        F.count(F.lit(1)).cast("long").alias("cg")
    )
    return _cdf_grid_from_counts(gc, ref_group)


def _cdf_grid_from_counts(counts: DataFrame, ref_group) -> DataFrame:
    """``_cdf_grid`` from PRE-AGGREGATED (g, x, cg) jump-point counts —
    the entry point the STREAMING path shares: per-(group, value)
    counts are a continuous aggregate (monotone, mergeable by SUM/MAX),
    so exact KS/W1 over a drained stream is this function over the
    accumulated count state."""
    from graphdb_for_drones_spark.operators._pin import pin

    # one exchange: per-(group, value) counts feed the ref slice, the
    # group dimension, the per-group range stats, and the join's left
    # side (pin: 4 consumers)
    gc = pin(
        counts.select(
            "g", F.col("x").cast("long").alias("x"), F.col("cg").cast("long").alias("cg")
        )
    )
    ref = gc.filter(F.col("g") == ref_group).select(
        "x", F.col("cg").alias("cr")
    )
    groups = gc.select("g").distinct()
    # |groups|-row broadcast against the distributed ref points: the
    # grid every group's CDF must be evaluated on
    ref_grid = ref.crossJoin(F.broadcast(groups)).select("g", "x", "cr")
    allp = (
        gc.join(ref_grid, ["g", "x"], "full_outer")
        .select(
            "g",
            "x",
            F.coalesce("cg", F.lit(0)).alias("cg"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    )
    # per-group totals and value range WITHOUT touching the joined grid
    # twice: own points from the count table, the ref grid's reach from
    # one broadcast scalar row (every group's grid includes all ref
    # points; least/greatest skip the NULLs of an absent reference)
    gstats = gc.groupBy("g").agg(
        F.min("x").alias("__mn_own"),
        F.max("x").alias("__mx_own"),
        F.sum("cg").alias("n_g"),
    )
    rstats = ref.groupBy().agg(
        F.min("x").alias("__mn_ref"),
        F.max("x").alias("__mx_ref"),
        F.coalesce(F.sum("cr"), F.lit(0).cast("long")).alias("n_r"),
    )
    stats = gstats.crossJoin(F.broadcast(rstats)).select(
        "g",
        F.least("__mn_own", "__mn_ref").cast("double").alias("__mn"),
        F.greatest("__mx_own", "__mx_ref").cast("double").alias("__mx"),
        "n_g",
        "n_r",
    )
    nb = CDF_GRID_BUCKETS
    # double-precision range map: weakly monotone in x (mul/div by a
    # positive constant are monotone in IEEE), collisions just coarsen
    # a bucket — exactness is carried by the integer counts, never by
    # the bucket id
    bkt = F.least(
        F.lit(nb - 1),
        F.greatest(
            F.lit(0),
            F.floor(
                (F.col("x").cast("double") - F.col("__mn"))
                * F.lit(float(nb))
                / (F.col("__mx") - F.col("__mn") + F.lit(1.0))
            ).cast("int"),
        ),
    )
    b = allp.join(F.broadcast(stats), "g").select(
        "g", "x", "cg", "cr", "n_g", "n_r", bkt.alias("bkt")
    )
    part = b.groupBy("g", "bkt").agg(
        F.sum("cg").alias("__pcg"),
        F.sum("cr").alias("__pcr"),
        F.min("x").alias("__bmin"),
    )
    wb = Window.partitionBy("g").orderBy("bkt")
    offs = part.select(
        "g",
        "bkt",
        (F.sum("__pcg").over(wb) - F.col("__pcg")).alias("__ocg"),
        (F.sum("__pcr").over(wb) - F.col("__pcr")).alias("__ocr"),
        F.lead("__bmin").over(wb).alias("__next_bmin"),
    )
    win = Window.partitionBy("g", "bkt").orderBy("x")
    return b.join(F.broadcast(offs), ["g", "bkt"]).select(
        "g",
        "x",
        (F.col("__ocg") + F.sum("cg").over(win)).alias("Cg"),
        (F.col("__ocr") + F.sum("cr").over(win)).alias("Cr"),
        "n_g",
        "n_r",
        F.coalesce(F.lead("x").over(win), F.col("__next_bmin")).alias(
            "x_next"
        ),
    )


def wasserstein_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ref_group,
) -> DataFrame:
    """EXACT Wasserstein-1 (earth-mover) distance per slice against a
    REFERENCE slice — the INTEGRAL companion to ``ks_drift``'s sup-norm:
    W₁ = ∫|F_g − F_ref| dx = Σ over consecutive pooled jump points of
    |F_g(x) − F_ref(x)|·(x_next − x), in the feature's units ("how far
    does probability mass have to move"), sensitive to tail shifts a
    max-gap statistic can miss.  Completes the drift suite: TVD/chi²
    (binned), KS (sup), W₁ (integral), centroid (embedding).

    Exact/oracle-bit-identical by integer arithmetic throughout: each
    segment contributes |Cg·n_r − Cr·n_g|·Δx as a DECIMAL(38,0) product
    of exact longs (order-independent sum), and W₁ = that sum /
    (n_g·n_r) is ONE final double division.  Headroom: the summed
    numerator is bounded by n_g·n_r·range ≲ 1e33 at 1e12 rows per side
    over a 1e9-wide integer feature — inside DECIMAL(38,0).

    Same plan shape as ``ks_drift`` (shared ``_cdf_grid``, two-level
    range-bucketed prefix sum) — the next jump point comes back as the
    grid's ``x_next`` column, so no extra whole-group window rides this
    statistic.  Missing reference → NULL.
    Returns (group_col, n_rows, w1)."""
    cum = _cdf_grid(df, group_col, value_col, ref_group)
    return _w1_from_grid(cum, group_col)


def wasserstein_drift_from_counts(
    counts: DataFrame, group_col: str, ref_group
) -> DataFrame:
    """``wasserstein_drift`` from PRE-AGGREGATED (g, x, cg) jump-point
    counts — the streaming entry point (see ``ks_drift_from_counts``):
    same grid, same math half, distinct-value-bounded state."""
    return _w1_from_grid(
        _cdf_grid_from_counts(counts, ref_group), group_col
    )


def _w1_from_grid(cum: DataFrame, group_col: str) -> DataFrame:
    dec = "decimal(38,0)"
    seg = cum.select(
        "g",
        "n_g",
        "n_r",
        (
            F.abs(
                F.col("Cg").cast(dec) * F.col("n_r").cast(dec)
                - F.col("Cr").cast(dec) * F.col("n_g").cast(dec)
            )
            * (F.col("x_next") - F.col("x")).cast(dec)
        ).alias("term"),  # NULL on each group's last point (no x_next)
    )
    agg = seg.groupBy("g").agg(
        F.max("n_g").cast("long").alias("n_rows"),
        F.max("n_r").alias("__nr"),
        F.coalesce(F.sum("term"), F.lit(0).cast(dec)).alias("__num"),
    )
    w1 = F.when(
        F.col("__nr") > 0,
        F.round(
            F.col("__num").cast("double")
            / (
                F.col("n_rows").cast("double") * F.col("__nr").cast("double")
            ),
            9,
        ),
    )
    return agg.select(F.col("g").alias(group_col), "n_rows", w1.alias("w1"))


def gini_concentration(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Gini coefficient of a nonnegative integer feature per slice —
    the corpus-concentration report ("is 1% of documents carrying 50%
    of the bytes?") read next to the drift family before reweighting a
    mixture.  Uses the rank form G = Σ_i (2i − n − 1)·x_(i) / (n·Σx)
    over ascending values: tie-safe (equal values make the coefficient
    block-invariant under any tie order, so the row_number tiebreak
    cannot change the sum) and transcendental-free.

    Exactness: numerator/denominator accumulate as DECIMAL(38,0)
    (order-independent integer sums; DuckDB's HUGEINT matches), the
    ratio is one division after one cast each, rounded to 9dp — the
    drift family's cross-engine contract.

    Plan shape: one group-partitioned sort window (rank + the two
    running totals ride the same exchange) and a |groups|-row final
    aggregate.  Empty/zero-total slices return NULL instead of an ANSI
    division failure.  Returns (group_col, n_rows, total, gini)."""
    w = Window.partitionBy("g").orderBy("x", "rn_seed")
    v = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("long").alias("x"),
        F.monotonically_increasing_id().alias("rn_seed"),
    ).filter(F.col("x").isNotNull())
    ranked = v.select(
        "g", "x", F.row_number().over(w).cast("long").alias("i")
    )
    agg = ranked.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("__sx"),
        F.sum(
            (
                (F.lit(2) * F.col("i")).cast("decimal(38,0)")
                * F.col("x").cast("decimal(38,0)")
            )
        ).alias("__sxi2"),
    )
    n = F.col("n_rows").cast("decimal(38,0)")
    num = F.col("__sxi2") - (n + F.lit(1).cast("decimal(38,0)")) * F.col("__sx")
    den = n * F.col("__sx")
    gini = F.when(
        F.col("__sx") > 0,
        F.round(num.cast("double") / den.cast("double"), 9),
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_rows",
        F.col("__sx").cast("long").alias("total"),
        gini.alias("gini"),
    )


def centroid_drift(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    ref_group,
    dim: int,
) -> DataFrame:
    """EMBEDDING drift: cosine between each slice's mean vector and a
    REFERENCE slice's mean vector — the semantic companion to the
    scalar drift family ("did this crawl move in embedding space", read
    before admitting a source into a mixture).

    Exact/oracle-reproducible mean: per-(group, dim) sums accumulate as
    DECIMAL(28,10) of the double-widened elements (order-independent —
    the established cross-engine float-aggregate contract), one IEEE
    division per dim for the mean, then the cosine folds over the
    FIXED dim order (``F.aggregate`` left fold ≡ the twin's
    ``list_reduce``), so every double is driver-hash-checkable.

    Plan shape at 100 TB: posexplode fans each row ×dim, the
    (group, dim) aggregate takes ONE exchange with map-side combine
    (state = |groups|·dim cells), centroids assemble via
    dim-bounded sort_array(collect_list) per group, and the reference
    centroid binds as a broadcast scalar row.  NULL vectors are
    dropped; zero-norm centroids yield NULL cosine instead of an ANSI
    division failure.  Returns (group_col, n_vecs, centroid_cosine)."""
    dec = "decimal(28,10)"
    # dim is a CONTRACT, not a hint (ADVICE r11): a ragged vector or a
    # dim/data mismatch must fail the job loudly — silently folding
    # whatever posexplode emits against a fixed-dim oracle produced
    # NULL cosines instead of an error.  NULL vectors still drop.
    checked = F.when(
        F.col(vec_col).isNull() | (F.size(vec_col) == dim), F.col(vec_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"centroid_drift: {vec_col} length "
                ),
                F.size(vec_col).cast("string"),
                F.lit(f" != declared dim {dim}"),
            )
        )
    )
    ex = (
        df.select(
            F.col(group_col).alias("g"),
            F.posexplode(checked).alias("d", "v"),
        )
        .filter(F.col("v").isNotNull())
        .select(
            "g", "d", F.col("v").cast("double").cast(dec).alias("v")
        )
    )
    sums = ex.groupBy("g", "d").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).cast("long").alias("n")
    )
    cent = sums.groupBy("g").agg(
        F.max("n").alias("n_vecs"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("d", "s", "n"))),
            lambda e: e["s"].cast("double") / e["n"].cast("double"),
        ).alias("m"),
    )
    ref = cent.filter(F.col("g").eqNullSafe(F.lit(ref_group))).select(
        F.col("m").alias("rm")
    )
    j = cent.crossJoin(F.broadcast(ref))

    def fold(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    dot = fold(F.zip_with("m", "rm", lambda a, b: a * b))
    na = fold(F.zip_with("m", "m", lambda a, b: a * b))
    nr = fold(F.zip_with("rm", "rm", lambda a, b: a * b))
    cos = F.when(
        (na > 0) & (nr > 0),
        F.round(dot / (F.sqrt(na) * F.sqrt(nr)), 9),
    )
    return j.select(
        F.col("g").alias(group_col), "n_vecs", cos.alias("centroid_cosine")
    )
