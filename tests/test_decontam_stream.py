"""Streaming contamination guard: micro-batched flags equal the batch
sweep, appends are effectively-once under availableNow drains."""

import json
import os

from pyspark.sql.types import LongType, StringType, StructField, StructType

from graphdb_for_drones_spark.operators import curation
from graphdb_for_drones_spark.streaming.decontam import (
    read_quarantine,
    start_contamination_guard,
)

DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

EVAL_ROWS = [
    (100, "alpha beta gamma delta epsilon zeta"),
    (101, "totally different benchmark prompt here okay"),
]

BATCHES = [
    [
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon eta"},  # overlap
        {"doc_id": 2, "text": "one two three four five six"},
    ],
    [
        {"doc_id": 3, "text": "totally different benchmark prompt here maybe"},  # overlap
        {"doc_id": 4, "text": "nothing shared with anything at all"},
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
    ev = spark.createDataFrame(EVAL_ROWS, DOC_SCHEMA).localCheckpoint()
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(sdir))
    )
    q = start_contamination_guard(
        stream,
        ev,
        out_dir=str(tmp_path / "quarantine"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.3,
    )
    q.awaitTermination(120)

    got = {
        (r.train_id, r.eval_id)
        for r in read_quarantine(spark, str(tmp_path / "quarantine")).collect()
    }
    all_docs = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for b in BATCHES for r in b], DOC_SCHEMA
    ).localCheckpoint()
    expect = {
        (r.train_id, r.eval_id)
        for r in curation.contamination_pairs(all_docs, ev, threshold=0.3).collect()
    }
    assert got == expect
    assert got == {(1, 100), (3, 101)}


def test_stream_guard_restart_does_not_duplicate(spark, tmp_path):
    sdir = _write_batches(tmp_path)
    ev = spark.createDataFrame(EVAL_ROWS, DOC_SCHEMA).localCheckpoint()

    def run():
        stream = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(sdir))
        )
        q = start_contamination_guard(
            stream,
            ev,
            out_dir=str(tmp_path / "quarantine"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            threshold=0.3,
        )
        q.awaitTermination(120)

    run()
    run()  # second drain from the same checkpoint: no new input, no new rows
    rows = read_quarantine(spark, str(tmp_path / "quarantine")).collect()
    assert len(rows) == 2


def test_stream_guard_containment_catches_quoted_prompt(spark, tmp_path):
    """A short eval prompt quoted inside a long incoming document: the
    jaccard guard dilutes it below threshold, the containment guard
    (metric passed through to the batch kernel) flags it."""
    prompt = "the secret benchmark prompt goes here"
    filler = " ".join(f"f{i}" for i in range(80))
    sdir = tmp_path / "in"
    sdir.mkdir()
    (sdir / "b0.json").write_text(
        json.dumps({"doc_id": 7, "text": filler + " " + prompt})
    )
    ev = spark.createDataFrame([(200, prompt)], DOC_SCHEMA).localCheckpoint()

    def drain(metric, sub):
        stream = spark.readStream.schema(DOC_SCHEMA).json(str(sdir))
        q = start_contamination_guard(
            stream,
            ev,
            out_dir=str(tmp_path / sub / "quarantine"),
            checkpoint_dir=str(tmp_path / sub / "ckpt"),
            threshold=0.5,
            metric=metric,
        )
        q.awaitTermination(120)
        out = read_quarantine(spark, str(tmp_path / sub / "quarantine"))
        assert metric in out.columns
        return out.collect()

    contained = drain("containment", "cont")
    assert [(r.train_id, r.eval_id, r.containment) for r in contained] == [
        (7, 200, 1.0)
    ]
    import pyspark.sql.utils  # noqa: F401  (parquet read of empty dir raises)
    try:
        missed = drain("jaccard", "jac")
    except Exception:
        missed = []  # nothing quarantined: no parquet files written
    assert missed == []
