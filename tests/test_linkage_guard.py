"""Streaming linkage guard: incremental fuzzy-match flags equal the
batch sweep over the union corpus; the pattern index accrues, history
is not re-patterned."""

import json
import os

from pyspark.sql.types import LongType, StringType, StructField, StructType

from graphdb_for_drones_spark.operators.linkage import (
    substitution_neighborhood_pairs,
)
from graphdb_for_drones_spark.streaming.linkage_guard import (
    read_linkage_flags,
    start_linkage_guard,
)

REC_SCHEMA = StructType(
    [StructField("id", LongType()), StructField("key", StringType())]
)

BATCHES = [
    [
        {"id": 1, "key": "00123"},
        {"id": 2, "key": "00124"},  # within-batch match of 1
        {"id": 3, "key": "77777"},
    ],
    [
        {"id": 4, "key": "00123"},  # exact cross-batch match of 1
        {"id": 5, "key": "90123"},  # cross-batch match of 1 and 4
        {"id": 6, "key": "abc"},  # different length: never matches
    ],
    [
        {"id": 7, "key": "77077"},  # cross-batch match of 3, two back
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


def test_stream_guard_matches_batch_sweep(spark, tmp_path):
    sdir = _write_batches(tmp_path)
    stream = (
        spark.readStream.schema(REC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(sdir))
    )
    q = start_linkage_guard(
        stream,
        index_dir=str(tmp_path / "index"),
        out_dir=str(tmp_path / "flags"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_subs=1,
    )
    q.awaitTermination(180)

    flags = read_linkage_flags(spark, str(tmp_path / "flags")).collect()
    pairs = [(r.id_a, r.id_b) for r in flags]
    assert len(pairs) == len(set(pairs)), "flag appended twice"
    got = {(r.id_a, r.id_b): (r.key_a, r.key_b, r.hamming) for r in flags}

    all_recs = spark.createDataFrame(
        [(r["id"], r["key"]) for b in BATCHES for r in b], REC_SCHEMA
    ).localCheckpoint()
    want = {
        (r.id_a, r.id_b): (r.key_a, r.key_b, r.hamming)
        for r in substitution_neighborhood_pairs(
            all_recs, "id", "key", max_subs=1
        ).collect()
    }
    assert got == want
    # the planted structure, explicitly
    assert (1, 2) in got and got[(1, 2)][2] == 1  # within-batch
    assert (1, 4) in got and got[(1, 4)][2] == 0  # exact cross-batch
    assert (4, 5) in got  # both sides arrived in the same later batch
    assert (3, 7) in got  # match across two batches of separation
    assert not any(6 in p for p in got)


def test_replayed_batches_overwrite_not_duplicate(spark, tmp_path):
    # a FRESH checkpoint replays every micro-batch under the same
    # batch ids (maxFilesPerTrigger=1 makes the batching
    # deterministic): the batch_id dynamic-overwrite layout must
    # replace the earlier run's partitions, not append beside them —
    # the crash-mid-batch retry contract
    sdir = _write_batches(tmp_path)
    for run in range(2):
        stream = (
            spark.readStream.schema(REC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(sdir))
        )
        q = start_linkage_guard(
            stream,
            index_dir=str(tmp_path / "index"),
            out_dir=str(tmp_path / "flags"),
            checkpoint_dir=str(tmp_path / f"ckpt{run}"),  # fresh: replay
            max_subs=1,
        )
        q.awaitTermination(180)
    flags = read_linkage_flags(spark, str(tmp_path / "flags")).collect()
    pairs = [(r.id_a, r.id_b) for r in flags]
    assert len(pairs) == len(set(pairs)), "replay duplicated flags"
    # and the index holds each record's patterns exactly once
    pat = spark.read.parquet(str(tmp_path / "index" / "patterns"))
    per_id = {
        r.id: r.n for r in pat.groupBy("id").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert all(
        n == 5 for rid, n in per_id.items() if rid != 6
    ), per_id  # 5-char keys
    assert per_id.get(6) == 3  # the 3-char key


def test_second_drain_appends_nothing_new(spark, tmp_path):
    sdir = _write_batches(tmp_path)
    for _ in range(2):
        stream = (
            spark.readStream.schema(REC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(sdir))
        )
        q = start_linkage_guard(
            stream,
            index_dir=str(tmp_path / "index"),
            out_dir=str(tmp_path / "flags"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            max_subs=1,
        )
        q.awaitTermination(180)
    flags = read_linkage_flags(spark, str(tmp_path / "flags")).collect()
    pairs = [(r.id_a, r.id_b) for r in flags]
    assert len(pairs) == len(set(pairs)), (
        "a clean re-drain on the same checkpoint re-flagged history"
    )
