"""End-to-end SQLite trigger CDC: the reference's capture flow
(demo_sqlite_cdc/01_unit_test/05_trigger_cdc_test.py) run against the
engine — triggers populate change_log, incremental polls fold the events
into a Spark state snapshot, and the snapshot must equal the live SQLite
table after every round."""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from graphdb_for_drones_spark.sources import sqlite_cdc

STATE_SCHEMA = StructType(
    [StructField("id", LongType()), StructField("payload", StringType())]
)

# the reference's DDL: items + change_log + AFTER triggers
# (05_trigger_cdc_test.py:15-51)
DDL = """
CREATE TABLE items (
    id   INTEGER PRIMARY KEY AUTOINCREMENT,
    name TEXT
);
CREATE TABLE change_log (
    change_id  INTEGER PRIMARY KEY AUTOINCREMENT,
    operation  TEXT,
    table_name TEXT,
    row_id     INTEGER,
    old_name   TEXT,
    new_name   TEXT,
    timestamp  TEXT DEFAULT (datetime('now'))
);
CREATE TRIGGER log_insert AFTER INSERT ON items
BEGIN
    INSERT INTO change_log(operation, table_name, row_id, new_name)
    VALUES('INSERT','items',NEW.id,NEW.name);
END;
CREATE TRIGGER log_update AFTER UPDATE ON items
BEGIN
    INSERT INTO change_log(operation, table_name, row_id, old_name, new_name)
    VALUES('UPDATE','items',NEW.id,OLD.name,NEW.name);
END;
CREATE TRIGGER log_delete AFTER DELETE ON items
BEGIN
    INSERT INTO change_log(operation, table_name, row_id, old_name)
    VALUES('DELETE','items',OLD.id,OLD.name);
END;
"""


@pytest.fixture()
def cdc_db(tmp_path):
    path = str(tmp_path / "cdc.db")
    with sqlite3.connect(path) as conn:
        conn.executescript(DDL)
    return path


def _sqlite_items(path):
    with sqlite3.connect(path) as conn:
        return sorted(conn.execute("SELECT id, name FROM items").fetchall())


def _spark_items(state):
    return sorted((r.id, r.payload) for r in state.collect())


def test_trigger_cdc_end_to_end(spark, cdc_db):
    state = spark.createDataFrame([], STATE_SCHEMA).localCheckpoint()
    last = 0

    # round 1: inserts only
    with sqlite3.connect(cdc_db) as conn:
        for name in ("Alpha", "Beta", "Gamma"):
            conn.execute("INSERT INTO items(name) VALUES (?)", (name,))
    state, last = sqlite_cdc.poll_and_apply(spark, cdc_db, state, last)
    state = state.localCheckpoint()
    assert _spark_items(state) == _sqlite_items(cdc_db)
    assert last == 3

    # round 2: mixed churn — update, delete, insert, then update the new row
    with sqlite3.connect(cdc_db) as conn:
        conn.execute("UPDATE items SET name='Beta2' WHERE name='Beta'")
        conn.execute("DELETE FROM items WHERE name='Alpha'")
        conn.execute("INSERT INTO items(name) VALUES ('Delta')")
        conn.execute("UPDATE items SET name='Delta2' WHERE name='Delta'")
    state, last = sqlite_cdc.poll_and_apply(spark, cdc_db, state, last)
    state = state.localCheckpoint()
    assert _spark_items(state) == _sqlite_items(cdc_db)

    # round 3: nothing new — state and high-water mark unchanged
    state2, last2 = sqlite_cdc.poll_and_apply(spark, cdc_db, state, last)
    assert last2 == last
    assert _spark_items(state2) == _spark_items(state)


def test_insert_then_delete_same_poll_never_materializes(spark, cdc_db):
    # a row created and deleted between two polls must not appear
    with sqlite3.connect(cdc_db) as conn:
        conn.execute("INSERT INTO items(name) VALUES ('Ghost')")
        conn.execute("DELETE FROM items WHERE name='Ghost'")
        conn.execute("INSERT INTO items(name) VALUES ('Stays')")
    state = spark.createDataFrame([], STATE_SCHEMA).localCheckpoint()
    state, last = sqlite_cdc.poll_and_apply(spark, cdc_db, state, 0)
    assert _spark_items(state) == _sqlite_items(cdc_db)
    assert [p for _, p in _spark_items(state)] == ["Stays"]


def test_poll_is_incremental(spark, cdc_db):
    with sqlite3.connect(cdc_db) as conn:
        conn.execute("INSERT INTO items(name) VALUES ('One')")
        conn.execute("INSERT INTO items(name) VALUES ('Two')")
    log = sqlite_cdc.read_change_log(spark, cdc_db, last_id=1)
    rows = log.collect()
    assert [r.change_id for r in rows] == [2]
    assert rows[0].operation == "INSERT" and rows[0].new_name == "Two"


def test_sqlite_changes_survive_envelope_roundtrip(spark, cdc_db):
    """Full reference topology: SQLite triggers -> change_log -> Debezium
    envelopes (the Kafka producer's payload) -> parse -> apply.  The
    envelope hop must be lossless: applying the decoded events gives the
    same state as applying the raw change rows."""
    from graphdb_for_drones_spark.streaming.cdc import (
        apply_cdc_batch,
        encode_envelope,
        parse_envelope,
    )

    with sqlite3.connect(cdc_db) as conn:
        conn.execute("INSERT INTO items(name) VALUES ('Alpha')")
        conn.execute("INSERT INTO items(name) VALUES ('Beta')")
        conn.execute("UPDATE items SET name='Beta2' WHERE name='Beta'")
        conn.execute("DELETE FROM items WHERE name='Alpha'")

    log = sqlite_cdc.read_change_log(spark, cdc_db, last_id=0)
    changes = sqlite_cdc.changes_to_cdc(log).localCheckpoint()
    wire = encode_envelope(changes)
    decoded = parse_envelope(wire)

    empty = spark.createDataFrame([], STATE_SCHEMA).localCheckpoint()
    via_wire = apply_cdc_batch(empty, decoded)
    direct = apply_cdc_batch(empty, changes)
    assert _spark_items(via_wire) == _spark_items(direct) == _sqlite_items(cdc_db)


def test_poll_batch_bounded_under_concurrent_writer(spark, cdc_db):
    """Rows appended AFTER the high-water mark is computed must not bleed
    into the already-returned batch (lazy re-reads are bounded by
    change_id <= hwm) — they arrive in the NEXT poll."""
    with sqlite3.connect(cdc_db) as conn:
        conn.execute("INSERT INTO items(name) VALUES ('One')")
    state = spark.createDataFrame([], STATE_SCHEMA).localCheckpoint()
    state, last = sqlite_cdc.poll_and_apply(spark, cdc_db, state, 0)
    # concurrent writer lands between poll and the state's first action
    with sqlite3.connect(cdc_db) as conn:
        conn.execute("INSERT INTO items(name) VALUES ('Late')")
    assert last == 1
    assert [p for _, p in _spark_items(state)] == ["One"]
    # re-collecting is deterministic (no unbounded re-read)
    assert [p for _, p in _spark_items(state)] == ["One"]
    state2, last2 = sqlite_cdc.poll_and_apply(spark, cdc_db, state, last)
    assert last2 == 2
    assert [p for _, p in _spark_items(state2)] == ["One", "Late"]
