"""On-disk versioned snapshots: commit/pin semantics, workload wiring,
and the restart-survival contract (a pinned version is on-disk state
only — readable from a brand-new session and a brand-new process)."""

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from graphdb_for_drones_spark.snapshots import SnapshotStore


def test_commit_read_pin(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "snaps"))
    assert store.current_version() is None
    v1 = store.commit(spark.range(3).toDF("id"))
    v2 = store.commit(spark.range(5).toDF("id"))
    assert (v1, v2) == (1, 2)
    assert store.versions() == [1, 2]
    assert store.current_version() == 2
    assert store.read(spark, 1).count() == 3
    assert store.read(spark, 2).count() == 5
    assert store.read(spark).count() == 5  # default = current
    with pytest.raises(ValueError):
        store.read(spark, 99)


def test_unpublished_version_invisible(spark, tmp_path):
    # data dir present but manifest not updated (simulated crash between
    # the data write and the manifest rename) → version not readable
    store = SnapshotStore(str(tmp_path / "snaps"))
    store.commit(spark.range(1).toDF("id"))
    spark.range(9).toDF("id").write.parquet(store.path_for(2))  # orphan
    assert store.versions() == [1]
    with pytest.raises(ValueError):
        store.read(spark, 2)


def test_workload_rounds_are_durable_versions(spark, tmp_path):
    from graphdb_for_drones_spark.fixtures import flat_delegation
    from graphdb_for_drones_spark.workloads import (
        measure_under_workload,
        turn_taking,
    )

    store = SnapshotStore(str(tmp_path / "wl"))
    flat = flat_delegation(spark, n=40)
    rounds = turn_taking(
        flat, ["HQ1", "HQ2"], rounds=3, update_ratio=0.5, store=store
    )
    measured = measure_under_workload(
        rounds, lambda df: df.filter(F.col("hq_id") == "HQ2")
    )
    # every timed read names the on-disk version it measured
    versions = [v for _, v, _ in measured]
    assert versions == [2, 3, 4]  # v1 = the baseline commit
    assert store.versions() == [1, 2, 3, 4]
    # rounds target HQ1, HQ2, HQ1 in rotation over the 20 selected drones
    counts = {v: c for _, v, c in measured}
    assert counts[2] == 0 and counts[3] == 20 and counts[4] == 0
    # the PIN holds: re-reading version 3 after the later commit sees the
    # same state (immutability, not just the counter)
    assert store.read(spark, 3).filter(F.col("hq_id") == "HQ2").count() == 20


def test_pin_readable_from_new_session(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "snaps"))
    store.commit(spark.range(7).toDF("id"))
    fresh = spark.newSession()
    again = SnapshotStore(str(tmp_path / "snaps"))  # fresh handle, disk only
    assert again.read(fresh, 1).count() == 7


@pytest.mark.slow
def test_pin_survives_process_restart(spark, tmp_path):
    # the real restart contract: a SEPARATE python process with its own
    # SparkSession re-reads the pinned version from disk alone
    store = SnapshotStore(str(tmp_path / "snaps"))
    store.commit(spark.range(4).selectExpr("id", "id * 10 AS x"))
    store.commit(spark.range(9).selectExpr("id", "id AS x"))  # current moves on
    script = f"""
import json
from pyspark.sql import SparkSession
from graphdb_for_drones_spark.snapshots import SnapshotStore

spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
store = SnapshotStore({str(tmp_path / "snaps")!r})
df = store.read(spark, 1)  # the pin, not current
print(json.dumps({{"versions": store.versions(),
                   "rows": df.count(),
                   "sum_x": df.agg({{"x": "sum"}}).first()[0]}}))
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got == {"versions": [1, 2], "rows": 4, "sum_x": 60}


def test_snapshot_diff_classes(spark):
    """Hand-computed reconciliation: every class incl. the NULL-safe
    value transitions (value->NULL inside a present row is a CHANGE,
    not an add/remove)."""
    from graphdb_for_drones_spark.snapshots import snapshot_diff

    a = spark.createDataFrame(
        [(1, 10, "x"), (2, 20, "y"), (3, 30, None), (4, 40, "z")],
        "k long, v long, w string",
    ).localCheckpoint()
    b = spark.createDataFrame(
        [(2, 20, "y"), (3, 30, "now-set"), (4, 41, "z"), (5, 50, "new")],
        "k long, v long, w string",
    ).localCheckpoint()
    r = snapshot_diff(a, b, ["k"], ["v", "w"]).collect()[0]
    assert (r.n_a, r.n_b) == (4, 4)
    assert r.added == 1      # k=5
    assert r.removed == 1    # k=1
    assert r.changed == 2    # k=3 (NULL -> value), k=4 (41)
    assert r.unchanged == 1  # k=2


def test_snapshot_diff_empty_sides(spark):
    from graphdb_for_drones_spark.snapshots import snapshot_diff

    a = spark.createDataFrame([(1, 10)], "k long, v long").localCheckpoint()
    empty = a.filter("v < 0")
    r = snapshot_diff(a, empty, ["k"], ["v"]).collect()[0]
    assert (r.n_a, r.n_b, r.added, r.removed) == (1, 0, 0, 1)
    r = snapshot_diff(empty, empty, ["k"], ["v"]).collect()[0]
    assert tuple(r) == (0, 0, 0, 0, 0, 0)
