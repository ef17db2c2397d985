"""CDC pipeline: envelope roundtrip, batch apply dispatch semantics, and
the streaming availableNow drain (offline-recovery replay)."""

import json

import pytest
from pyspark.sql import functions as F

from graphdb_for_drones_spark.streaming.cdc import (
    apply_cdc_batch,
    encode_envelope,
    parse_envelope,
    read_cdc_file_stream,
    start_cdc_apply,
)


def changes_df(spark, rows):
    # rows: (id, payload, op, ts_ms)
    return spark.createDataFrame(
        rows, "id long, payload string, op string, ts_ms long"
    ).coalesce(1).localCheckpoint()


def state_df(spark, rows):
    return spark.createDataFrame(rows, "id long, payload string").coalesce(1).localCheckpoint()


def test_envelope_roundtrip(spark):
    ch = changes_df(spark, [(1, "a", "c", 100), (2, None, "d", 101)])
    enc = encode_envelope(ch.select("op", "id", "payload", "ts_ms"))
    row = enc.filter(F.col("key") == "1").first()
    env = json.loads(row.value)
    assert env["payload"]["op"] == "c"
    assert env["payload"]["after"] == {"id": 1, "payload": "a"}
    dec = parse_envelope(enc).orderBy("id").collect()
    assert [(r.id, r.payload, r.op) for r in dec] == [(1, "a", "c"), (2, None, "d")]


def test_apply_dispatch(spark):
    # reference semantics (06_postgres_cdc_sink.py:32-64):
    # c upserts, u updates-if-present, d deletes, u cannot resurrect
    state = state_df(spark, [(1, "one"), (2, "two"), (3, "three")])
    ch = changes_df(
        spark,
        [
            (1, "one-v2", "u", 10),   # update existing
            (2, None, "d", 11),       # delete
            (4, "four", "c", 12),     # insert new
            (5, "five-upd", "u", 13), # update of missing key → no-op
        ],
    )
    out = apply_cdc_batch(state, ch)
    got = {r.id: r.payload for r in out.collect()}
    assert got == {1: "one-v2", 3: "three", 4: "four"}


def test_apply_dedupes_to_latest(spark):
    # within a batch, only the latest change per key applies (§7.4-4)
    state = state_df(spark, [(1, "one")])
    ch = changes_df(
        spark,
        [(1, "x", "u", 10), (1, None, "d", 11), (1, "resurrected", "c", 12)],
    )
    out = apply_cdc_batch(state, ch)
    got = {r.id: r.payload for r in out.collect()}
    assert got == {1: "resurrected"}


def test_apply_idempotent(spark):
    # replaying the same batch leaves the state unchanged (C5)
    state = state_df(spark, [(1, "one"), (2, "two")])
    ch = changes_df(spark, [(1, "one-v2", "u", 10), (3, "three", "c", 11)])
    once = apply_cdc_batch(state, ch).localCheckpoint()
    twice = apply_cdc_batch(once, ch)
    assert sorted((r.id, r.payload) for r in twice.collect()) == sorted(
        (r.id, r.payload) for r in once.collect()
    )


@pytest.mark.slow
def test_streaming_available_now_drain(spark, tmp_path):
    # offline-recovery replay (03_recovery.py): buffer K inserts, K/2
    # updates, K/2 deletes; drain with availableNow; final state =
    # rows K/2+1..K with original payloads + updated first half minus deletes
    k = 20
    rows = [(i, f"p{i}", "c", i) for i in range(k)]
    rows += [(i, f"p{i}-upd", "u", k + i) for i in range(k // 2)]
    rows += [(i, None, "d", 2 * k + i) for i in range(k // 2, k)]
    ch = changes_df(spark, rows)
    env = encode_envelope(ch.select("op", "id", "payload", "ts_ms"))

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    lines = [r.value for r in env.collect()]
    (stream_dir / "backlog.json").write_text("\n".join(lines))

    state_path = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = read_cdc_file_stream(spark, str(stream_dir))
    q = start_cdc_apply(stream, state_path, ckpt, available_now=True)
    q.awaitTermination(120)

    final = spark.read.parquet(state_path)
    got = {r.id: r.payload for r in final.collect()}
    assert got == {i: f"p{i}-upd" for i in range(k // 2)}
