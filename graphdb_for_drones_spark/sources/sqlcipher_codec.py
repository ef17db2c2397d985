"""Pure-Python SQLCipher page codec (v4 defaults, v3 parameterizable).

The reference keeps drone wallets in SQLCipher files (PRAGMA key —
demo_offline/05_sqlite/02initdb.py:13-46, 03did_vc_pk.py:13).  This
container ships no SQLCipher-linked driver, but the on-disk format is
published (SQLCipher design document, zetetic.net/sqlcipher/design), and
every primitive it uses ships in the ``cryptography`` package — so the
*at-rest* leg is implementable without the native library:

* file header: bytes 0-15 of page 1 hold a random 16-byte salt in place
  of the ``SQLite format 3\\0`` magic;
* key derivation: PBKDF2-HMAC-SHA512(passphrase, salt, 256 000 iters,
  32 bytes) — v4 profile; v3 used SHA1 × 64 000.  Raw-key syntax
  ``x'<64 hex>'`` bypasses the KDF, exactly like ``PRAGMA key``;
* HMAC key: PBKDF2(enc_key, salt ⊕ 0x3a, 2 iters, 32 bytes) with the
  same hash;
* page layout: each ``page_size`` page ends with a reserve region of
  ``16 (IV) + hmac_size`` bytes rounded up to a multiple of 16 (v4:
  80).  Content bytes (page 1: from offset 16) are AES-256-CBC
  encrypted under the page IV; HMAC(hash) covers
  ``ciphertext ‖ IV ‖ page_number (le32)``;
* decryption emits a standard SQLite file: magic restored on page 1,
  reserve regions zeroed (SQLite never reads reserve content — the
  header's reserve-size byte, inside the decrypted region, already
  says 80).

Interop caveat, stated honestly: with no SQLCipher build in the
container, cross-implementation tests can't run here; the codec is
pinned by the published format constants, roundtrip tests, wrong-key
and tamper rejection, and a fixture whose layout (salt placement,
reserve sizing, header bytes) is asserted structurally.

``prepare_reserve`` reformats a plaintext DB with the per-page reserve
space encryption needs (SQLITE_FCNTL_RESERVE_BYTES + VACUUM via ctypes
— the same thing SQLCipher's ``sqlcipher_export`` does internally).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import hmac as _hmac
import os
import re
import sqlite3
import struct

SALT_SZ = 16
IV_SZ = 16
KEY_SZ = 32
HMAC_SALT_MASK = 0x3A
SQLITE_MAGIC = b"SQLite format 3\x00"
_RAW_KEY_RE = re.compile(r"^x'([0-9a-fA-F]{64})'$")

# profile name -> (kdf_iter, hash_name, hmac_size)
PROFILES = {
    "v4": (256_000, "sha512", 64),
    "v3": (64_000, "sha1", 20),
}


def _require_crypto():
    try:
        from cryptography.hazmat.primitives import hashes  # noqa: F401
    except ImportError as e:  # pragma: no cover - env guard
        raise NotImplementedError(
            "SQLCipher codec needs the 'cryptography' package"
        ) from e


def reserve_size(hmac_size: int) -> int:
    """IV + HMAC, rounded up to a multiple of 16 (v4: 80, v3: 48)."""
    raw = IV_SZ + hmac_size
    return (raw + 15) // 16 * 16


def _hashalg(name: str):
    from cryptography.hazmat.primitives import hashes

    return {"sha1": hashes.SHA1, "sha256": hashes.SHA256, "sha512": hashes.SHA512}[
        name
    ]()


def derive_keys(
    key: str | bytes, salt: bytes, kdf_iter: int, hash_name: str
) -> tuple[bytes, bytes]:
    """(encryption key, hmac key).  ``key`` is a passphrase, raw bytes,
    or SQLCipher raw-key syntax ``x'<64 hex>'`` (skips the KDF)."""
    from cryptography.hazmat.primitives.kdf.pbkdf2 import PBKDF2HMAC

    if isinstance(key, str):
        m = _RAW_KEY_RE.match(key)
        if m:
            enc_key = bytes.fromhex(m.group(1))
        else:
            enc_key = PBKDF2HMAC(
                algorithm=_hashalg(hash_name),
                length=KEY_SZ,
                salt=salt,
                iterations=kdf_iter,
            ).derive(key.encode("utf-8"))
    else:
        enc_key = (
            key
            if len(key) == KEY_SZ
            else PBKDF2HMAC(
                algorithm=_hashalg(hash_name),
                length=KEY_SZ,
                salt=salt,
                iterations=kdf_iter,
            ).derive(key)
        )
    hmac_salt = bytes(b ^ HMAC_SALT_MASK for b in salt)
    hmac_key = PBKDF2HMAC(
        algorithm=_hashalg(hash_name), length=KEY_SZ, salt=hmac_salt, iterations=2
    ).derive(enc_key)
    return enc_key, hmac_key


def _page_hmac(hmac_key: bytes, hash_name: str, ct: bytes, iv: bytes, pgno: int) -> bytes:
    return _hmac.new(
        hmac_key, ct + iv + struct.pack("<I", pgno), hash_name
    ).digest()


def _aes_cbc(enc_key: bytes, iv: bytes):
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    return Cipher(algorithms.AES(enc_key), modes.CBC(iv))


def decrypt_db(
    src: str,
    key: str | bytes,
    dst: str,
    profile: str = "v4",
) -> str:
    """Decrypt a SQLCipher file into a standard SQLite file at ``dst``.

    Raises ``ValueError`` on HMAC mismatch (wrong key or tampered page)
    naming the failing page.  Returns ``dst``."""
    _require_crypto()
    kdf_iter, hash_name, hmac_sz = PROFILES[profile]
    reserve = reserve_size(hmac_sz)
    with open(src, "rb") as fh:
        raw = fh.read()
    if len(raw) < SALT_SZ or raw[:SALT_SZ] == SQLITE_MAGIC:
        raise ValueError(f"{src}: not a SQLCipher database (plaintext magic)")
    salt = raw[:SALT_SZ]
    # page size lives at header offset 16-17 of the DECRYPTED page 1, so
    # it is unknowable up front; SQLCipher's own default (and the
    # reference wallets') is 4096 — try it first, fall back to the other
    # legal sizes on page-1 HMAC failure rather than failing blind.
    enc_key, hmac_key = derive_keys(key, salt, kdf_iter, hash_name)
    last_err: Exception | None = None
    for page_size in (4096, 512, 1024, 2048, 8192, 16384, 32768, 65536):
        if len(raw) % page_size:
            continue
        try:
            out = _decrypt_pages(
                raw, page_size, reserve, hmac_sz, hash_name, enc_key, hmac_key
            )
        except ValueError as e:
            last_err = e
            continue
        with open(dst, "wb") as fh:
            fh.write(out)
        return dst
    raise ValueError(
        f"{src}: HMAC verification failed for every candidate page size — "
        f"wrong key, wrong profile, or corrupted file ({last_err})"
    )


def _decrypt_pages(
    raw: bytes,
    page_size: int,
    reserve: int,
    hmac_sz: int,
    hash_name: str,
    enc_key: bytes,
    hmac_key: bytes,
) -> bytes:
    n_pages = len(raw) // page_size
    out = bytearray()
    for pgno in range(1, n_pages + 1):
        page = raw[(pgno - 1) * page_size : pgno * page_size]
        start = SALT_SZ if pgno == 1 else 0
        ct = page[start : page_size - reserve]
        iv = page[page_size - reserve : page_size - reserve + IV_SZ]
        tag = page[
            page_size - reserve + IV_SZ : page_size - reserve + IV_SZ + hmac_sz
        ]
        want = _page_hmac(hmac_key, hash_name, ct, iv, pgno)
        if not _hmac.compare_digest(tag, want):
            raise ValueError(f"page {pgno}: HMAC mismatch (wrong key or tampered)")
        dec = _aes_cbc(enc_key, iv).decryptor()
        pt = dec.update(ct) + dec.finalize()
        if pgno == 1:
            out += SQLITE_MAGIC + pt + b"\x00" * reserve
        else:
            out += pt + b"\x00" * reserve
    return bytes(out)


def encrypt_db(
    src: str,
    key: str | bytes,
    dst: str,
    profile: str = "v4",
    salt: bytes | None = None,
) -> str:
    """Encrypt a plaintext SQLite file into SQLCipher layout at ``dst``.

    ``src`` must already carry the profile's per-page reserve space
    (header byte 20 == reserve) — run ``prepare_reserve`` first; this is
    exactly what SQLCipher's export does before encrypting."""
    _require_crypto()
    kdf_iter, hash_name, hmac_sz = PROFILES[profile]
    reserve = reserve_size(hmac_sz)
    with open(src, "rb") as fh:
        raw = fh.read()
    if raw[:SALT_SZ] != SQLITE_MAGIC:
        raise ValueError(f"{src}: not a SQLite database")
    page_size = struct.unpack(">H", raw[16:18])[0]
    if page_size == 1:
        page_size = 65536
    if raw[20] != reserve:
        raise ValueError(
            f"{src}: needs {reserve} reserve bytes/page (header says "
            f"{raw[20]}); run prepare_reserve(path, {reserve}) first"
        )
    salt = salt or os.urandom(SALT_SZ)
    enc_key, hmac_key = derive_keys(key, salt, kdf_iter, hash_name)
    n_pages = len(raw) // page_size
    out = bytearray()
    for pgno in range(1, n_pages + 1):
        page = raw[(pgno - 1) * page_size : pgno * page_size]
        start = SALT_SZ if pgno == 1 else 0
        pt = page[start : page_size - reserve]
        iv = os.urandom(IV_SZ)
        enc = _aes_cbc(enc_key, iv).encryptor()
        ct = enc.update(pt) + enc.finalize()
        tag = _page_hmac(hmac_key, hash_name, ct, iv, pgno)
        pad = b"\x00" * (reserve - IV_SZ - hmac_sz)
        if pgno == 1:
            out += salt + ct + iv + tag + pad
        else:
            out += ct + iv + tag + pad
    with open(dst, "wb") as fh:
        fh.write(bytes(out))
    return dst


SQLITE_FCNTL_RESERVE_BYTES = 38


def prepare_reserve(db_path: str, reserve: int = 80) -> None:
    """Rewrite a plaintext SQLite DB so every page carries ``reserve``
    spare bytes (where the IV+HMAC will live once encrypted).  Uses
    SQLITE_FCNTL_RESERVE_BYTES + VACUUM through the system libsqlite3 —
    no SQL surface exists for this."""
    libname = ctypes.util.find_library("sqlite3")
    if libname is None:  # pragma: no cover - env guard
        raise NotImplementedError("libsqlite3 not found for prepare_reserve")
    lib = ctypes.CDLL(libname)
    db = ctypes.c_void_p()
    rc = lib.sqlite3_open(db_path.encode(), ctypes.byref(db))
    try:
        if rc != 0:
            raise ValueError(f"sqlite3_open({db_path}) rc={rc}")
        n = ctypes.c_int(reserve)
        rc = lib.sqlite3_file_control(
            db, b"main", SQLITE_FCNTL_RESERVE_BYTES, ctypes.byref(n)
        )
        if rc != 0:
            raise ValueError(f"file_control(RESERVE_BYTES) rc={rc}")
        rc = lib.sqlite3_exec(db, b"VACUUM", None, None, None)
        if rc != 0:
            raise ValueError(f"VACUUM rc={rc}")
    finally:
        lib.sqlite3_close(db)
    with open(db_path, "rb") as fh:
        hdr = fh.read(24)
    if hdr[20] != reserve:  # pragma: no cover - libsqlite3 too old
        raise NotImplementedError(
            "libsqlite3 ignored SQLITE_FCNTL_RESERVE_BYTES"
        )


def verify_key(db_path: str, key: str | bytes, profile: str = "v4") -> bool:
    """Cheap key check: derive keys and HMAC-verify page 1 only."""
    _require_crypto()
    kdf_iter, hash_name, hmac_sz = PROFILES[profile]
    reserve = reserve_size(hmac_sz)
    with open(db_path, "rb") as fh:
        raw = fh.read(65536 + SALT_SZ)
    salt = raw[:SALT_SZ]
    enc_key, hmac_key = derive_keys(key, salt, kdf_iter, hash_name)
    for page_size in (4096, 512, 1024, 2048, 8192, 16384, 32768, 65536):
        if len(raw) < page_size:
            continue
        ct = raw[SALT_SZ : page_size - reserve]
        iv = raw[page_size - reserve : page_size - reserve + IV_SZ]
        tag = raw[
            page_size - reserve + IV_SZ : page_size - reserve + IV_SZ + hmac_sz
        ]
        if _hmac.compare_digest(tag, _page_hmac(hmac_key, hash_name, ct, iv, 1)):
            return True
    return False
