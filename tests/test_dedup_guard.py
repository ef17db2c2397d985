"""Streaming near-dup guard: incremental LSH flags equal the batch
sweep over the union corpus; the index accrues, history is not
re-shingled."""

import json
import os

from pyspark.sql.types import LongType, StringType, StructField, StructType

from graphdb_for_drones_spark.operators.dedup import minhash_lsh_pairs
from graphdb_for_drones_spark.streaming.dedup_guard import (
    read_neardup_flags,
    start_neardup_guard,
)

DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
BATCHES = [
    [
        {"doc_id": 1, "text": BASE},
        {"doc_id": 2, "text": BASE + " extra"},  # near-dup of 1, same batch
        {"doc_id": 3, "text": "completely unrelated content about spark plans"},
    ],
    [
        {"doc_id": 4, "text": BASE + " tonight"},  # near-dup of 1 & 2, cross-batch
        {"doc_id": 5, "text": "another singleton document with its own words"},
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


def _drain(spark, tmp_path, sdir):
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(sdir))
    )
    q = start_neardup_guard(
        stream,
        index_dir=str(tmp_path / "index"),
        out_dir=str(tmp_path / "flags"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        jaccard_threshold=0.3,
    )
    q.awaitTermination(180)


def test_stream_guard_matches_batch_sweep(spark, tmp_path):
    sdir = _write_batches(tmp_path)
    _drain(spark, tmp_path, sdir)

    got = {
        (r.id_a, r.id_b)
        for r in read_neardup_flags(spark, str(tmp_path / "flags")).collect()
    }
    all_docs = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for b in BATCHES for r in b], DOC_SCHEMA
    ).localCheckpoint()
    expect = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(all_docs, jaccard_threshold=0.3).collect()
    }
    assert got == expect
    # the planted structure: {1,2,4} pairwise near-dups, caught both
    # within-batch (1,2) and cross-batch (1,4), (2,4)
    assert {(1, 2), (1, 4), (2, 4)} <= got
    assert not any(3 in p or 5 in p for p in got)


def test_stream_guard_restart_does_not_duplicate(spark, tmp_path):
    sdir = _write_batches(tmp_path)
    _drain(spark, tmp_path, sdir)
    n1 = read_neardup_flags(spark, str(tmp_path / "flags")).count()
    _drain(spark, tmp_path, sdir)  # same checkpoint: no new input
    n2 = read_neardup_flags(spark, str(tmp_path / "flags")).count()
    assert n1 == n2


def test_stream_guard_index_accrues_per_batch(spark, tmp_path):
    sdir = _write_batches(tmp_path)
    _drain(spark, tmp_path, sdir)
    sigs = spark.read.parquet(str(tmp_path / "index" / "sigs"))
    assert {r.id for r in sigs.select("id").collect()} == {1, 2, 3, 4, 5}
    bands = spark.read.parquet(str(tmp_path / "index" / "bands"))
    assert bands.count() == 5 * 8  # 8 bands per accepted doc
