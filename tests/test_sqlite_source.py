"""S6: distributed SQLite wallet reads on the stdlib driver.

Covers the read protocol (rowid-range partitioning, pruning/pushdown,
affinity schema mapping, gaps, empty tables) and the single-writer sink
roundtrip.  Reference shape: per-drone wallet tables in SQLite files
(demo_offline wallet storage)."""

from __future__ import annotations

import sqlite3

import pytest

from graphdb_for_drones_spark.sources import sqlite_src


@pytest.fixture()
def wallet_db(tmp_path):
    path = str(tmp_path / "wallet.db")
    with sqlite3.connect(path) as conn:
        conn.execute(
            "CREATE TABLE vc_store (vc_id TEXT, subject_did TEXT,"
            " issued_at INTEGER, trust REAL, proof BLOB)"
        )
        conn.executemany(
            "INSERT INTO vc_store VALUES (?,?,?,?,?)",
            [
                (
                    f"vc{i:05d}",
                    f"did:example:d{i % 50:03d}",
                    1_700_000_000 + i,
                    i / 1000.0,
                    bytes([i % 256, (i * 7) % 256]),
                )
                for i in range(1000)
            ],
        )
    return path


def test_schema_affinity(wallet_db):
    schema = sqlite_src.sqlite_table_schema(wallet_db, "vc_store")
    kinds = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert kinds == {
        "vc_id": "string",
        "subject_did": "string",
        "issued_at": "bigint",
        "trust": "double",
        "proof": "binary",
    }


def test_distributed_read_all_rows(spark, wallet_db):
    df = sqlite_src.read_sqlite(spark, wallet_db, "vc_store", num_partitions=7)
    assert df.rdd.getNumPartitions() == 7
    rows = df.collect()
    assert len(rows) == 1000
    by_id = {r.vc_id: r for r in rows}
    assert by_id["vc00042"].issued_at == 1_700_000_042
    assert by_id["vc00042"].trust == 0.042
    assert by_id["vc00042"].proof == bytes([42, (42 * 7) % 256])


def test_column_pruning_and_predicate_pushdown(spark, wallet_db):
    df = sqlite_src.read_sqlite(
        spark,
        wallet_db,
        "vc_store",
        num_partitions=4,
        columns=["vc_id", "issued_at"],
        predicate="issued_at >= 1700000990",
    )
    assert df.columns == ["vc_id", "issued_at"]
    got = sorted(r.vc_id for r in df.collect())
    assert got == [f"vc{i:05d}" for i in range(990, 1000)]


def test_rowid_gaps_do_not_drop_rows(spark, wallet_db):
    with sqlite3.connect(wallet_db) as conn:
        conn.execute("DELETE FROM vc_store WHERE rowid % 3 = 0")
    n_sqlite = sqlite3.connect(wallet_db).execute(
        "SELECT COUNT(*) FROM vc_store"
    ).fetchone()[0]
    df = sqlite_src.read_sqlite(spark, wallet_db, "vc_store", num_partitions=5)
    assert df.count() == n_sqlite


def test_empty_table(spark, tmp_path):
    path = str(tmp_path / "empty.db")
    with sqlite3.connect(path) as conn:
        conn.execute("CREATE TABLE t (a INTEGER, b TEXT)")
    df = sqlite_src.read_sqlite(spark, path, "t")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["a", "b"]


def test_missing_table_raises(wallet_db):
    with pytest.raises(ValueError, match="no such table"):
        sqlite_src.sqlite_table_schema(wallet_db, "nope")


def test_identifier_quoting_rejects_escapes(wallet_db):
    with pytest.raises(ValueError, match="invalid identifier"):
        sqlite_src.sqlite_table_schema(wallet_db, 'x" OR 1=1 --')


def test_write_roundtrip(spark, tmp_path, wallet_db):
    src = sqlite_src.read_sqlite(spark, wallet_db, "vc_store", num_partitions=3)
    out = str(tmp_path / "out.db")
    n = sqlite_src.write_sqlite(src, out, "vc_copy")
    assert n == 1000
    back = sqlite_src.read_sqlite(spark, out, "vc_copy", num_partitions=2)
    assert back.count() == 1000
    assert (
        src.select("vc_id", "issued_at")
        .exceptAll(back.select("vc_id", "issued_at"))
        .count()
        == 0
    )


def test_sqlcipher_rejects_plaintext_db(spark, wallet_db):
    # A plain (unencrypted) SQLite file is not a valid SQLCipher wallet:
    # the page-1 HMAC probe must fail fast, not garble a scan.
    # (Roundtrips on real encrypted wallets live in test_sqlcipher.py.)
    with pytest.raises(ValueError, match="key rejected"):
        sqlite_src.read_sqlcipher(spark, wallet_db, "vc_store", key="k")


def test_predicate_tripwire_rejects_suspicious_tokens(spark, wallet_db):
    from graphdb_for_drones_spark.sources.sqlite_src import read_sqlite

    for bad in ("1=1; DROP TABLE items", "1=1 -- comment", "1=1 /* x */"):
        with pytest.raises(ValueError, match="trusted"):
            read_sqlite(spark, wallet_db, "items", predicate=bad)


def test_write_mode_validated(spark, tmp_path):
    from graphdb_for_drones_spark.sources.sqlite_src import write_sqlite

    df = spark.range(3)
    with pytest.raises(ValueError, match="mode"):
        write_sqlite(df, str(tmp_path / "w.db"), "t", mode="overwite")
