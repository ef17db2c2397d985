"""DID/VC crypto surface — the reference's only user-defined computation
(SURVEY.md §2.9), as Arrow-batched pandas UDFs.

Semantics pinned to the reference:

* canonical JSON = ``json.dumps(obj, sort_keys=True)`` UTF-8 bytes — the
  exact byte stream that gets signed (common/did_utils.py:43).  Spark's
  ``to_json`` does NOT sort keys, so canonicalization is a pandas UDF.
* ``verify_vc`` strips the ``proof`` member, re-canonicalizes, and
  verifies the hex signature in ``proof.signatureValue`` against the
  issuer's public key (common/did_utils.py:88-100).  Never trust stored
  bytes: JSONB round-trips reorder keys (SURVEY §7.4-3).
* Ed25519 via the ``cryptography`` package (same as the reference,
  common/sign_verify.py); ECDSA-P256 variant gated the same way
  (demo_offline/01_offline_did/self_contained_vc.py:40-46).

Scale notes: pandas UDFs move Arrow batches to Python workers — the slow
path by design (10-100× better than row-at-a-time, still off the JVM).
Everything around them (hashing, hex, filtering, counting) stays in
built-in functions; only the actual Ed25519 math crosses the boundary.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, BooleanType, StringType

try:  # gate the crypto dependency (import-try per environment rules)
    from cryptography.hazmat.primitives.asymmetric.ed25519 import (
        Ed25519PrivateKey,
        Ed25519PublicKey,
    )

    HAVE_CRYPTOGRAPHY = True
except ImportError:  # pragma: no cover
    HAVE_CRYPTOGRAPHY = False


def canonical_json_bytes(obj) -> bytes:
    """Reference's signing byte stream: common/did_utils.py:43."""
    return json.dumps(obj, sort_keys=True).encode("utf-8")


@pandas_udf(StringType())
def canonical_json_udf(js: pd.Series) -> pd.Series:
    """Re-serialize a JSON string column into canonical (sorted-key) form."""
    return js.map(lambda s: json.dumps(json.loads(s), sort_keys=True))


def sha256_hex(col: Column) -> Column:
    """F7 content hash — built-in, stays JVM-side
    (hashlib.sha256(canonical).hexdigest(),
    demo_offline/02_offline_did_and_hash/issuer.py:5-8)."""
    return F.sha2(col, 256)


def _require_crypto():
    if not HAVE_CRYPTOGRAPHY:
        raise NotImplementedError(
            "cryptography package unavailable: Ed25519 sign/verify UDFs "
            "are disabled in this environment"
        )


def make_keypair(seed: bytes = b"\x42" * 32):
    """Deterministic Ed25519 keypair for fixtures (seed-derived, like the
    reference's random_seed=42 determinism)."""
    _require_crypto()
    sk = Ed25519PrivateKey.from_private_bytes(seed)
    from cryptography.hazmat.primitives import serialization

    pk_bytes = sk.public_key().public_bytes(
        serialization.Encoding.Raw, serialization.PublicFormat.Raw
    )
    return sk, pk_bytes


@pandas_udf(BinaryType())
def sign_ed25519_udf(payload: pd.Series, private_key: pd.Series) -> pd.Series:
    """F4: sign payload bytes with a raw-32-byte Ed25519 private key
    (common/sign_verify.py:15-23).  Keys are cached per batch."""
    _require_crypto()
    cache: dict[bytes, Ed25519PrivateKey] = {}

    def sign(args):
        data, kb = args
        kb = bytes(kb)
        sk = cache.get(kb)
        if sk is None:
            sk = cache[kb] = Ed25519PrivateKey.from_private_bytes(kb)
        data = data.encode("utf-8") if isinstance(data, str) else bytes(data)
        return sk.sign(data)

    return pd.Series(map(sign, zip(payload, private_key)))


@pandas_udf(BooleanType())
def verify_ed25519_udf(
    payload: pd.Series, signature: pd.Series, public_key: pd.Series
) -> pd.Series:
    """F5: the flagship verify UDF (common/sign_verify.py:26-31)."""
    _require_crypto()
    cache: dict[bytes, Ed25519PublicKey] = {}

    def verify(args):
        data, sig, kb = args
        try:
            kb = bytes(kb)
            pk = cache.get(kb)
            if pk is None:
                pk = cache[kb] = Ed25519PublicKey.from_public_bytes(kb)
            data = data.encode("utf-8") if isinstance(data, str) else bytes(data)
            pk.verify(bytes(sig), data)
            return True
        except Exception:
            return False

    return pd.Series(map(verify, zip(payload, signature, public_key)))


@pandas_udf(BinaryType())
def sign_ecdsa_p256_udf(payload: pd.Series, private_key_pem: pd.Series) -> pd.Series:
    """F6: ECDSA-P256/SHA-256 signing (PEM-encoded keys), the offline-VC
    variant (demo_offline/01_offline_did/self_contained_vc.py:40-46)."""
    _require_crypto()
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import ec

    cache: dict[bytes, object] = {}

    def sign(args):
        data, pem = args
        pem = bytes(pem)
        sk = cache.get(pem)
        if sk is None:
            sk = cache[pem] = serialization.load_pem_private_key(pem, password=None)
        data = data.encode("utf-8") if isinstance(data, str) else bytes(data)
        return sk.sign(data, ec.ECDSA(hashes.SHA256()))

    return pd.Series(map(sign, zip(payload, private_key_pem)))


@pandas_udf(BooleanType())
def verify_ecdsa_p256_udf(
    payload: pd.Series, signature: pd.Series, public_key_pem: pd.Series
) -> pd.Series:
    """F6: ECDSA-P256/SHA-256 verification
    (self_contained_vc_verifier.py:26-39)."""
    _require_crypto()
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import ec

    cache: dict[bytes, object] = {}

    def verify(args):
        data, sig, pem = args
        try:
            pem = bytes(pem)
            pk = cache.get(pem)
            if pk is None:
                pk = cache[pem] = serialization.load_pem_public_key(pem)
            data = data.encode("utf-8") if isinstance(data, str) else bytes(data)
            pk.verify(bytes(sig), data, ec.ECDSA(hashes.SHA256()))
            return True
        except Exception:
            return False

    return pd.Series(map(verify, zip(payload, signature, public_key_pem)))


def b64url_encode(col: Column) -> Column:
    """F9: URL-safe base64 — built-in ``base64`` (standard alphabet) +
    JVM-side ``translate`` to the urlsafe alphabet
    (base64.urlsafe_b64encode, self_contained_vc.py:46)."""
    return F.translate(F.base64(col), "+/", "-_")


def b64url_decode(col: Column) -> Column:
    return F.unbase64(F.translate(col, "-_", "+/"))


def hybrid_encrypt(vc_bytes: bytes, rsa_public_key) -> dict:
    """F15 driver-side envelope encryption mirroring
    demo_sqlite_cdc/01_unit_test/01_hybrid_crypto.py:27-60: random AES-GCM
    data key encrypts the payload; RSA-OAEP wraps the data key.  (Column
    variant: ``F.aes_encrypt`` for the AES leg; RSA wrap stays driver-side
    because the wrapped key is per-envelope metadata, not row data.)"""
    _require_crypto()
    import os as _os

    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import padding
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    key = AESGCM.generate_key(bit_length=256)
    nonce = _os.urandom(12)
    ct = AESGCM(key).encrypt(nonce, vc_bytes, None)
    wrapped = rsa_public_key.encrypt(
        key,
        padding.OAEP(
            mgf=padding.MGF1(algorithm=hashes.SHA256()),
            algorithm=hashes.SHA256(),
            label=None,
        ),
    )
    return {"ciphertext": ct, "nonce": nonce, "wrapped_key": wrapped}


def hybrid_decrypt(envelope: dict, rsa_private_key) -> bytes:
    """F15 inverse (01_hybrid_crypto.py:62-97)."""
    _require_crypto()
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import padding
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    key = rsa_private_key.decrypt(
        envelope["wrapped_key"],
        padding.OAEP(
            mgf=padding.MGF1(algorithm=hashes.SHA256()),
            algorithm=hashes.SHA256(),
            label=None,
        ),
    )
    return AESGCM(key).decrypt(envelope["nonce"], envelope["ciphertext"], None)


@pandas_udf(BooleanType())
def verify_vc_udf(vc_json: pd.Series, public_key: pd.Series) -> pd.Series:
    """Verify a W3C VC JSON string: strip ``proof``, canonical-serialize,
    check ``proof.signatureValue`` (hex) — common/did_utils.py:88-100."""
    _require_crypto()
    cache: dict[bytes, Ed25519PublicKey] = {}

    def verify(args):
        js, kb = args
        try:
            vc = json.loads(js)
            proof = vc.pop("proof")
            sig = bytes.fromhex(proof["signatureValue"])
            kb = bytes(kb)
            pk = cache.get(kb)
            if pk is None:
                pk = cache[kb] = Ed25519PublicKey.from_public_bytes(kb)
            pk.verify(sig, canonical_json_bytes(vc))
            return True
        except Exception:
            return False

    return pd.Series(map(verify, zip(vc_json, public_key)))
