"""ECDSA-P256 UDFs, urlsafe base64 columns, hybrid envelope crypto."""

import base64

import pytest
from pyspark.sql import functions as F

from graphdb_for_drones_spark.functions.crypto import (
    HAVE_CRYPTOGRAPHY,
    b64url_decode,
    b64url_encode,
    hybrid_decrypt,
    hybrid_encrypt,
    sign_ecdsa_p256_udf,
    verify_ecdsa_p256_udf,
)

pytestmark = pytest.mark.skipif(
    not HAVE_CRYPTOGRAPHY, reason="cryptography package unavailable"
)


@pytest.fixture(scope="module")
def ec_keys():
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import ec

    sk = ec.generate_private_key(ec.SECP256R1())
    sk_pem = sk.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )
    pk_pem = sk.public_key().public_bytes(
        serialization.Encoding.PEM,
        serialization.PublicFormat.SubjectPublicKeyInfo,
    )
    return sk_pem, pk_pem


def test_ecdsa_sign_verify(spark, ec_keys):
    sk_pem, pk_pem = ec_keys
    df = spark.createDataFrame(
        [(f"m{i}",) for i in range(5)], "payload string"
    ).coalesce(1).localCheckpoint()
    signed = df.withColumn(
        "sig", sign_ecdsa_p256_udf(F.col("payload"), F.lit(sk_pem))
    ).localCheckpoint()
    ok = signed.withColumn(
        "ok", verify_ecdsa_p256_udf("payload", "sig", F.lit(pk_pem))
    )
    assert ok.filter("ok").count() == 5
    tampered = signed.withColumn("payload", F.lit("x")).withColumn(
        "ok", verify_ecdsa_p256_udf("payload", "sig", F.lit(pk_pem))
    )
    assert tampered.filter("ok").count() == 0


def test_b64url_matches_python(spark):
    raw = bytes(range(240, 256)) * 2  # exercises + and / in std alphabet
    df = spark.createDataFrame([(raw,)], "b binary")
    enc = df.select(b64url_encode(F.col("b")).alias("e"))
    assert enc.first().e == base64.urlsafe_b64encode(raw).decode()
    dec = enc.select(b64url_decode(F.col("e")).alias("d")).first()
    assert bytes(dec.d) == raw


def test_hybrid_envelope_roundtrip():
    from cryptography.hazmat.primitives.asymmetric import rsa

    rk = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    env = hybrid_encrypt(b"vc payload bytes", rk.public_key())
    assert hybrid_decrypt(env, rk) == b"vc payload bytes"
    # tampered ciphertext fails authentication
    # flip a bit (never a no-op, unlike overwriting with a fixed byte)
    bad = dict(
        env,
        ciphertext=env["ciphertext"][:-1] + bytes([env["ciphertext"][-1] ^ 1]),
    )
    with pytest.raises(Exception):
        hybrid_decrypt(bad, rk)
