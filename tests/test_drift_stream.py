"""Streaming drift monitor: the accumulated-counts report must equal
the BATCH `distribution_drift` on the union of all drained rows (the
shared-math-half construction), stay idempotent under a same-batch_id
retry, and keep state at |groups| x n_bins regardless of volume."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from graphdb_for_drones_spark.operators.stats import distribution_drift
from graphdb_for_drones_spark.streaming.drift_monitor import (
    drift_report,
    make_apply_batch,
    reference_geometry,
    start_drift_monitor,
)

SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

REF_ROWS = [("ref", v) for v in range(100, 200, 10)]  # lo=100 hi=190

BATCHES = [
    [
        {"source": "a", "n_chars": 105},
        {"source": "a", "n_chars": 195},
        {"source": "b", "n_chars": 10},  # below lo -> clamps to bin 0
    ],
    [
        {"source": "a", "n_chars": 150},
        {"source": "b", "n_chars": 5000},  # above hi -> clamps to bin 9
    ],
]


def _write_batches(tmp_path):
    sdir = tmp_path / "in"
    sdir.mkdir()
    for i, rows in enumerate(BATCHES):
        p = sdir / f"b{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (1_700_000_000 + i * 60,) * 2)
    return sdir


def _drain(spark, tmp_path, out, ckpt):
    sdir = _write_batches(tmp_path)
    ref = spark.createDataFrame(REF_ROWS, "g string, n_chars long")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(sdir))
    )
    q = start_drift_monitor(
        stream,
        ref,
        out_dir=out,
        checkpoint_dir=ckpt,
        group_col="source",
        value_col="n_chars",
    )
    q.awaitTermination(120)
    return ref


def test_stream_report_equals_batch_drift(spark, tmp_path):
    out, ckpt = str(tmp_path / "counts"), str(tmp_path / "ckpt")
    _drain(spark, tmp_path, out, ckpt)
    got = {
        r["g"]: (r.n_rows, r.tvd, r.chi2, r.max_gap)
        for r in drift_report(spark, out).collect()
    }
    static = spark.createDataFrame(
        [("__ref__", v) for _, v in REF_ROWS]
        + [
            (row["source"], row["n_chars"])
            for batch in BATCHES
            for row in batch
        ],
        "g string, n_chars long",
    )
    want = {
        r.g: (r.n_rows, r.tvd, r.chi2, r.max_gap)
        for r in distribution_drift(
            static, "g", "n_chars", ref_group="__ref__"
        ).collect()
    }
    assert got == want  # bit-identical via the shared math half
    assert got["__ref__"][1] == 0.0  # ref vs itself: tvd 0


def test_retry_same_batch_id_is_idempotent(spark, tmp_path):
    out, ckpt = str(tmp_path / "counts"), str(tmp_path / "ckpt")
    _drain(spark, tmp_path, out, ckpt)
    before = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    # simulate the at-least-once window: re-apply batch 0's rows with
    # the SAME batch_id — dynamic overwrite must replace, not append
    bounds, _ = reference_geometry(
        spark.createDataFrame(REF_ROWS, "g string, n_chars long"),
        "n_chars",
    )
    apply_batch = make_apply_batch(bounds, out, "source", "n_chars")
    b0 = spark.createDataFrame(
        [(r["source"], r["n_chars"]) for r in BATCHES[0]], SCHEMA
    )
    apply_batch(b0, 0)
    after = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert after == before


def test_state_is_bounded_by_groups_and_bins(spark, tmp_path):
    out, ckpt = str(tmp_path / "counts"), str(tmp_path / "ckpt")
    _drain(spark, tmp_path, out, ckpt)
    counts = spark.read.parquet(out)
    # rows <= (|groups| incl. __ref__) x n_bins x n_partitions-touched;
    # the REPORT is |groups| rows exactly
    assert drift_report(spark, out).count() == 3  # __ref__, a, b
    assert (
        counts.groupBy("g", "b").count().filter(F.col("count") > 3).count()
        == 0
    )


def test_fresh_checkpoint_truncates_stale_out_dir(spark, tmp_path):
    """out_dir and checkpoint_dir are paired for a monitor's lifetime:
    starting a NEW monitor (fresh checkpoint) on an existing out_dir
    must truncate the prior run's batch partitions — otherwise batch
    ids restart at 0 and dynamic overwrite leaves higher-numbered
    leftovers silently inflating the report totals (ADVICE r10)."""
    out = str(tmp_path / "counts")
    _drain(spark, tmp_path, out, str(tmp_path / "ckpt1"))
    total_run1 = (
        spark.read.parquet(out)
        .filter(F.col("g") != "__ref__")
        .agg(F.sum("c"))
        .first()[0]
    )
    assert total_run1 == 5  # both batches drained
    # second monitor lifetime: same out_dir, FRESH checkpoint, a source
    # containing only batch 0 -- ids restart at 0
    ref = spark.createDataFrame(REF_ROWS, "g string, n_chars long")
    sdir2 = tmp_path / "in2"
    sdir2.mkdir()
    (sdir2 / "b0.json").write_text(
        "\n".join(json.dumps(r) for r in BATCHES[0])
    )
    stream = spark.readStream.schema(SCHEMA).json(str(sdir2))
    q = start_drift_monitor(
        stream,
        ref,
        out_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt2"),
        group_col="source",
        value_col="n_chars",
    )
    q.awaitTermination(120)
    total_run2 = (
        spark.read.parquet(out)
        .filter(F.col("g") != "__ref__")
        .agg(F.sum("c"))
        .first()[0]
    )
    assert total_run2 == 3  # run 1's batch-1 partition is gone
    report = {r.g: r.n_rows for r in drift_report(spark, out).collect()}
    assert report == {"__ref__": 10, "a": 2, "b": 1}


def test_report_reads_n_bins_from_sidecar(spark, tmp_path):
    """A monitor started at a non-default n_bins must be reportable
    with NO n_bins argument (geometry persisted beside the counts), and
    an explicit mismatching n_bins must raise instead of silently
    truncating the dense vectors (ADVICE r10)."""
    import pytest

    out, ckpt = str(tmp_path / "counts"), str(tmp_path / "ckpt")
    sdir = _write_batches(tmp_path)
    ref = spark.createDataFrame(REF_ROWS, "g string, n_chars long")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(sdir))
    )
    q = start_drift_monitor(
        stream,
        ref,
        out_dir=out,
        checkpoint_dir=ckpt,
        group_col="source",
        value_col="n_chars",
        n_bins=20,
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).agg(F.max("b")).first()[0] > 9
    got = {r.g: r.n_rows for r in drift_report(spark, out).collect()}
    assert got == {"__ref__": 10, "a": 3, "b": 2}
    with pytest.raises(ValueError, match="disagrees"):
        drift_report(spark, out, n_bins=10)
