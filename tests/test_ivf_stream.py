"""Continuous IVF maintenance: streamed vectors land in the right
cluster partitions, probes see them, drains are effectively-once."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from graphdb_for_drones_spark.operators.similarity import (
    ivf_open,
    ivf_read,
    ivf_search,
)
from graphdb_for_drones_spark.streaming.ivf_maintain import start_ivf_ingest

VEC_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)

# two tight base clusters on orthogonal axes
BASE = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0]),
    (2, [0.95, 0.05, 0.0]),
    (3, [0.0, 1.0, 0.0]),
    (4, [0.1, 0.9, 0.0]),
    (5, [0.05, 0.95, 0.0]),
]

NEW_BATCHES = [
    [{"vec_id": 100, "embedding": [0.98, 0.02, 0.0]}],  # → x-cluster
    [{"vec_id": 200, "embedding": [0.02, 0.98, 0.0]}],  # → y-cluster
]


def _build(spark, tmp_path):
    base = spark.createDataFrame(BASE, VEC_SCHEMA).localCheckpoint()
    path = str(tmp_path / "ivf")
    ivf_open(spark, base, path, k=2, iters=2)
    return path


def _write_batches(tmp_path):
    sdir = tmp_path / "in"
    sdir.mkdir()
    for i, rows in enumerate(NEW_BATCHES):
        p = sdir / f"b{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (1_700_000_000 + i * 60,) * 2)
    return sdir


def _drain(spark, sdir, path, tmp_path):
    stream = (
        spark.readStream.schema(VEC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(sdir))
    )
    q = start_ivf_ingest(
        stream, path, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)


def test_streamed_vectors_probe_back(spark, tmp_path):
    path = _build(spark, tmp_path)
    _drain(spark, _write_batches(tmp_path), path, tmp_path)

    index, cents = ivf_read(spark, path)
    assert index.count() == len(BASE) + 2

    # self-probe: each streamed vector is its own nearest neighbour
    for vid, vec in [(100, [0.98, 0.02, 0.0]), (200, [0.02, 0.98, 0.0])]:
        hits = ivf_search(index, cents, vec, k=1, n_probe=1).collect()
        assert hits[0].vec_id == vid
        assert hits[0].cosine == 1.0

    # streamed vectors joined the same cluster as their base neighbours
    clusters = {r.vec_id: r.cluster for r in index.collect()}
    assert clusters[100] == clusters[0]
    assert clusters[200] == clusters[3]


def test_restart_does_not_duplicate(spark, tmp_path):
    path = _build(spark, tmp_path)
    sdir = _write_batches(tmp_path)
    _drain(spark, sdir, path, tmp_path)
    _drain(spark, sdir, path, tmp_path)  # same checkpoint: no new input
    index, _ = ivf_read(spark, path)
    assert index.count() == len(BASE) + 2


def test_probe_is_partition_pruned_after_ingest(spark, tmp_path):
    path = _build(spark, tmp_path)
    _drain(spark, _write_batches(tmp_path), path, tmp_path)
    index, cents = ivf_read(spark, path)
    plan = (
        ivf_search(index, cents, [0.98, 0.02, 0.0], k=1, n_probe=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the cluster IN (...) filter must reach partition pruning, not scan
    # both cluster directories
    assert "PartitionFilters: [cluster" in plan.replace("\n", " ") or "cluster#" in plan
    pruned = index.filter(
        F.col("cluster") == [c for v, c in ((r.vec_id, r.cluster) for r in index.collect()) if v == 100][0]
    )
    assert pruned.count() < index.count()
