"""Crypto UDFs + VC fixtures: sign/verify roundtrip, canonicalization
byte-exactness (§7.4-3), tamper detection."""

import json

import pytest
from pyspark.sql import functions as F

from graphdb_for_drones_spark.fixtures import vc_tables
from graphdb_for_drones_spark.functions.crypto import (
    HAVE_CRYPTOGRAPHY,
    canonical_json_udf,
    make_keypair,
    sha256_hex,
    sign_ed25519_udf,
    verify_ed25519_udf,
    verify_vc_udf,
)

pytestmark = pytest.mark.skipif(
    not HAVE_CRYPTOGRAPHY, reason="cryptography package unavailable"
)


@pytest.fixture(scope="module")
def vcs(spark):
    return vc_tables(spark, num_subjects=20)


def test_all_vcs_verify(spark, vcs):
    # the reference invariant: verified == inserted
    # (test_b_did_pg.py / scripts/traversal_verify.py)
    df = vcs.vc_test.withColumn(
        "ok", verify_vc_udf(F.col("vc_json"), F.lit(vcs.issuer_pubkey))
    )
    assert df.filter(F.col("ok")).count() == 20


def test_reordered_keys_still_verify(spark, vcs):
    # JSONB-style key reordering must not break verification because
    # verify re-canonicalizes (sort_keys) before checking
    row = vcs.vc_test.first()
    vc = json.loads(row.vc_json)
    reordered = json.dumps(dict(reversed(list(vc.items()))))
    df = spark.createDataFrame([(reordered,)], "vc_json string")
    ok = df.select(
        verify_vc_udf(F.col("vc_json"), F.lit(vcs.issuer_pubkey)).alias("ok")
    ).first()
    assert ok.ok is True


def test_tampered_vc_fails(spark, vcs):
    row = vcs.vc_test.first()
    vc = json.loads(row.vc_json)
    vc["credentialSubject"]["mission_id"] = "M999999"
    df = spark.createDataFrame([(json.dumps(vc),)], "vc_json string")
    ok = df.select(
        verify_vc_udf(F.col("vc_json"), F.lit(vcs.issuer_pubkey)).alias("ok")
    ).first()
    assert ok.ok is False


def test_sign_verify_roundtrip(spark):
    sk, pk = make_keypair(b"\x01" * 32)
    from cryptography.hazmat.primitives import serialization

    sk_bytes = sk.private_bytes(
        serialization.Encoding.Raw,
        serialization.PrivateFormat.Raw,
        serialization.NoEncryption(),
    )
    df = spark.createDataFrame(
        [(f"payload {i}",) for i in range(10)], "payload string"
    ).coalesce(1).localCheckpoint()
    signed = df.withColumn(
        "sig", sign_ed25519_udf(F.col("payload"), F.lit(sk_bytes))
    ).localCheckpoint()
    ok = signed.withColumn(
        "ok", verify_ed25519_udf(F.col("payload"), F.col("sig"), F.lit(pk))
    )
    assert ok.filter(F.col("ok")).count() == 10
    # wrong key fails
    _, pk2 = make_keypair(b"\x02" * 32)
    bad = signed.withColumn(
        "ok", verify_ed25519_udf(F.col("payload"), F.col("sig"), F.lit(pk2))
    )
    assert bad.filter(F.col("ok")).count() == 0


def test_canonical_json_udf(spark):
    df = spark.createDataFrame([('{"b": 1, "a": {"d": 2, "c": 3}}',)], "js string")
    out = df.select(canonical_json_udf(F.col("js")).alias("c")).first()
    assert out.c == '{"a": {"c": 3, "d": 2}, "b": 1}'


def test_sha256_hex_matches_python(spark):
    import hashlib

    df = spark.createDataFrame([("hello",)], "s string")
    got = df.select(sha256_hex(F.col("s")).alias("h")).first().h
    assert got == hashlib.sha256(b"hello").hexdigest()
