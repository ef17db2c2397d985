"""Round-10 operators: distribution_drift (PSI-family histogram drift)
and vocab_overlap (pairwise source-vocabulary similarity).  The catalog
entries are oracle-gated at the driver; these pin the edge semantics
the sf corpus cannot reach (identical slices, out-of-range values,
empty bins, disjoint / identical vocabularies)."""

import pytest
from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators.stats import distribution_drift
from graphdb_for_drones_spark.operators.text import vocab_overlap


def _drift_rows(spark, rows):
    df = spark.createDataFrame(rows, "g string, v long").localCheckpoint()
    return {
        r.g: r
        for r in distribution_drift(df, "g", "v", ref_group="ref").collect()
    }


def test_drift_identical_slice_is_zero(spark):
    """A slice distributed exactly like the reference must read tvd=0
    and max_gap=0 (chi2 is vs the SMOOTHED reference, so it is a small
    positive constant — equal for the ref itself and the clone)."""
    rows = [("ref", v) for v in (1, 2, 3, 10, 20, 20)] + [
        ("clone", v) for v in (1, 2, 3, 10, 20, 20)
    ]
    got = _drift_rows(spark, rows)
    assert got["clone"].tvd == 0.0
    assert got["clone"].max_gap == 0.0
    assert got["clone"].chi2 == got["ref"].chi2
    assert got["ref"].tvd == 0.0


def test_drift_out_of_range_values_clamp(spark):
    """Values outside the reference range clamp into the edge bins
    (ANSI-safe integer arithmetic, no crash, no dropped rows)."""
    rows = [("ref", v) for v in range(10, 20)] + [
        ("wild", -1000),
        ("wild", 0),
        ("wild", 10_000),
    ]
    got = _drift_rows(spark, rows)
    assert got["wild"].n_rows == 3
    # 2 rows in bin 0, 1 row in bin 9 vs uniform ref: max gap is the
    # low-edge bin: |2/3 - 1/10|
    assert got["wild"].max_gap == pytest.approx(2 / 3 - 1 / 10, abs=1e-9)


def test_drift_disjoint_slice_maxes_tvd(spark):
    """A slice entirely outside the reference's support (all rows clamp
    to one edge bin the reference barely occupies) approaches tvd=1
    territory; exact value = 1 - 1/10 here."""
    rows = [("ref", v) for v in range(10)] + [("far", 999)] * 5
    got = _drift_rows(spark, rows)
    # far: all mass in bin 9; ref has 1/10 there -> tvd = (1-0.1)
    assert got["far"].tvd == pytest.approx(0.9, abs=1e-9)
    assert got["far"].max_gap == pytest.approx(0.9, abs=1e-9)


def test_categorical_drift_unseen_category_bin(spark):
    """Categories the reference never exhibited land in the trailing
    unseen bin, where the smoothed reference has only the Laplace
    floor — the new-language admission signal."""
    from graphdb_for_drones_spark.operators.stats import categorical_drift

    df = spark.createDataFrame(
        [("ref", "en")] * 5
        + [("ref", "de")] * 5
        + [("same", "en"), ("same", "de")]
        + [("new", "zz")] * 4,  # a category ref never saw
        "g string, lang string",
    ).localCheckpoint()
    got = {
        r.g: (r.n_rows, r.tvd, r.chi2, r.max_gap)
        for r in categorical_drift(df, "g", "lang", "ref").collect()
    }
    assert got["ref"][1] == 0.0
    # bins: (de, en, unseen); 'same' is 1/2-1/2 like ref -> tvd 0
    assert got["same"][1] == 0.0
    # 'new' has ALL mass in the unseen bin: tvd = 0.5*(0.5+0.5+1) = 1
    assert got["new"][1] == 1.0 and got["new"][3] == 1.0
    assert got["new"][2] > got["same"][2]  # chi2 ranks the newcomer worst


def test_vocab_overlap_identical_and_disjoint(spark):
    df = spark.createDataFrame(
        [
            ("a", "red green blue"),
            ("b", "red green blue"),
            ("c", "cyan magenta"),
        ],
        "source string, text string",
    ).localCheckpoint()
    got = {
        (r.source_a, r.source_b): r
        for r in vocab_overlap(df, group_col="source").collect()
    }
    ab = got[("a", "b")]
    assert (ab.inter_types, ab.union_types) == (3, 3)
    assert ab.jaccard == 1.0 and ab.containment == 1.0
    # disjoint vocabularies never emit a pair row (posting lists are
    # per-term: no shared term, no row — the sparse-output contract)
    assert ("a", "c") not in got and ("b", "c") not in got


def test_vocab_overlap_partial_and_normalization(spark):
    """Case/whitespace normalization is the dedup normalizer; jaccard
    and containment are exact integer ratios."""
    df = spark.createDataFrame(
        [
            ("a", "Alpha  beta\tGAMMA"),
            ("b", "alpha delta"),
        ],
        "source string, text string",
    ).localCheckpoint()
    [r] = vocab_overlap(df, group_col="source").collect()
    assert (r.source_a, r.source_b) == ("a", "b")
    assert (r.inter_types, r.union_types) == (1, 4)
    assert r.jaccard == 0.25
    assert r.containment == 0.5  # 1 shared / min(3, 2)
