"""SQLCipher wallet leg (S6): pure-Python page codec + distributed read.

The container has no SQLCipher build, so interop against the native
library cannot run here; these tests pin the published v4 format
structurally (salt placement, reserve sizing, ciphertext coverage),
roundtrip fidelity, key/tamper rejection, and the Spark read/write
surface over an encrypted wallet shaped like the reference's
(demo_offline/05_sqlite/02initdb.py:13-46).
"""

import os
import sqlite3

import pytest

pytest.importorskip("cryptography")

from graphdb_for_drones_spark.sources import sqlcipher_codec as C
from graphdb_for_drones_spark.sources.sqlite_src import (
    read_sqlcipher,
    read_sqlite,
    write_sqlcipher,
)

KEY = "correct horse battery staple"


def _make_wallet(path: str, n_vcs: int = 200) -> None:
    with sqlite3.connect(path) as conn:
        conn.execute("PRAGMA page_size=4096")
        conn.execute(
            "CREATE TABLE did_document (id INTEGER PRIMARY KEY AUTOINCREMENT,"
            " did TEXT, document TEXT)"
        )
        conn.execute(
            "CREATE TABLE verifiable_credential (id INTEGER PRIMARY KEY"
            " AUTOINCREMENT, vc_id TEXT, issuer TEXT, payload TEXT)"
        )
        conn.execute(
            "CREATE TABLE private_keys (id INTEGER PRIMARY KEY AUTOINCREMENT,"
            " did TEXT, key_pem BLOB)"
        )
        conn.execute(
            "INSERT INTO did_document (did, document) VALUES"
            " ('did:example:drone0', '{\"id\": \"did:example:drone0\"}')"
        )
        conn.executemany(
            "INSERT INTO verifiable_credential (vc_id, issuer, payload)"
            " VALUES (?, ?, ?)",
            [
                (f"vc{i}", f"did:example:issuer{i % 3}", f"payload-{i}" * 20)
                for i in range(n_vcs)
            ],
        )
        conn.execute(
            "INSERT INTO private_keys (did, key_pem) VALUES"
            " ('did:example:drone0', X'0001029baddecaf0')"
        )
        conn.commit()


@pytest.fixture(scope="module")
def wallet(tmp_path_factory):
    d = tmp_path_factory.mktemp("wallet")
    plain = str(d / "wallet_plain.db")
    enc = str(d / "wallet.db")
    _make_wallet(plain)
    C.prepare_reserve(plain, 80)
    C.encrypt_db(plain, KEY, enc)
    return plain, enc


def test_encrypted_layout_is_sqlcipher_shaped(wallet):
    plain, enc = wallet
    raw = open(enc, "rb").read()
    # magic replaced by the salt; sizes preserved page-for-page
    assert raw[:16] != C.SQLITE_MAGIC
    assert len(raw) == os.path.getsize(plain)
    assert len(raw) % 4096 == 0
    # nothing readable leaks: the plaintext header and table names are gone
    assert b"SQLite format 3" not in raw
    assert b"verifiable_credential" not in raw
    # wrong-key probe is cheap and correct both ways
    assert C.verify_key(enc, KEY)
    assert not C.verify_key(enc, "wrong-key")


def test_roundtrip_restores_every_table(wallet, tmp_path):
    plain, enc = wallet
    dec = str(tmp_path / "dec.db")
    C.decrypt_db(enc, KEY, dec)
    with sqlite3.connect(plain) as a, sqlite3.connect(dec) as b:
        for t in ("did_document", "verifiable_credential", "private_keys"):
            ra = a.execute(f"SELECT * FROM {t} ORDER BY id").fetchall()
            rb = b.execute(f"SELECT * FROM {t} ORDER BY id").fetchall()
            assert ra == rb and ra
        # integrity of the reconstructed file, not just row equality
        assert b.execute("PRAGMA integrity_check").fetchone()[0] == "ok"


def test_wrong_key_and_tamper_rejected(wallet, tmp_path):
    _plain, enc = wallet
    with pytest.raises(ValueError, match="HMAC"):
        C.decrypt_db(enc, "wrong-key", str(tmp_path / "x.db"))
    raw = bytearray(open(enc, "rb").read())
    raw[4096 + 100] ^= 0xFF  # flip one ciphertext byte on page 2
    bad = str(tmp_path / "tampered.db")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="HMAC"):
        C.decrypt_db(bad, KEY, str(tmp_path / "y.db"))


def test_raw_key_syntax_skips_kdf(wallet, tmp_path):
    plain, _enc = wallet
    raw_key = "x'" + "ab" * 32 + "'"
    enc2 = str(tmp_path / "raw.db")
    C.encrypt_db(plain, raw_key, enc2)
    dec = str(tmp_path / "rawdec.db")
    C.decrypt_db(enc2, raw_key, dec)
    with sqlite3.connect(dec) as conn:
        assert conn.execute(
            "SELECT COUNT(*) FROM verifiable_credential"
        ).fetchone() == (200,)


def test_v3_profile_roundtrip(tmp_path):
    # fresh wallet: libsqlite3's RESERVE_BYTES file-control grows reserve
    # from 0 but won't shrink an existing one, so don't reuse the v4 file
    plain3 = str(tmp_path / "p3.db")
    _make_wallet(plain3)
    C.prepare_reserve(plain3, C.reserve_size(20))  # sha1 hmac → 48
    enc3 = str(tmp_path / "v3.db")
    C.encrypt_db(plain3, KEY, enc3, profile="v3")
    dec3 = str(tmp_path / "v3dec.db")
    C.decrypt_db(enc3, KEY, dec3, profile="v3")
    with sqlite3.connect(dec3) as conn:
        assert conn.execute(
            "SELECT COUNT(*) FROM verifiable_credential"
        ).fetchone() == (200,)
    # v4-profile keys must NOT open a v3 file
    with pytest.raises(ValueError):
        C.decrypt_db(enc3, KEY, str(tmp_path / "z.db"), profile="v4")


def test_read_sqlcipher_distributed(spark, wallet):
    _plain, enc = wallet
    df = read_sqlcipher(
        spark,
        enc,
        "verifiable_credential",
        KEY,
        num_partitions=4,
        predicate="issuer = 'did:example:issuer1'",
    )
    rows = df.collect()
    assert len(rows) == len([i for i in range(200) if i % 3 == 1])
    assert df.rdd.getNumPartitions() == 4
    assert all(r.issuer == "did:example:issuer1" for r in rows)
    with pytest.raises(ValueError, match="key rejected"):
        read_sqlcipher(spark, enc, "verifiable_credential", "nope")


def test_write_sqlcipher_appends_preserve_other_tables(spark, wallet, tmp_path):
    _plain, enc = wallet
    import shutil

    target = str(tmp_path / "wallet2.db")
    shutil.copy(enc, target)
    new_vcs = spark.createDataFrame(
        [(900 + i, f"vc-new{i}", "did:example:issuer9", "p") for i in range(5)],
        "id long, vc_id string, issuer string, payload string",
    ).coalesce(1)
    n = write_sqlcipher(
        new_vcs, target, "verifiable_credential", KEY, mode="append"
    )
    assert n == 5
    got = read_sqlcipher(
        spark, target, "verifiable_credential", KEY, num_partitions=2
    )
    assert got.count() == 205
    # sibling tables survived the decrypt→write→re-encrypt cycle
    keys = read_sqlcipher(spark, target, "private_keys", KEY)
    assert keys.count() == 1
