"""Column-level AES encryption compatible with the reference utility.

Reference parity: /root/reference/src/main/utility/encrypt_decrypt.py:24-40
derives an AES-256 key with PBKDF2 (HMAC-SHA1, 1000 iterations, 64-byte
derived key, first 32 bytes kept), encrypts with AES-CBC under a fixed
16-byte IV, pads PKCS7, and base64-encodes the bare ciphertext (the IV
is configuration, not part of the payload).

Spark-first design: the KDF runs ONCE on the driver (`hashlib`, stdlib)
— it is configuration-time scalar work, exactly like the reference
reading key/iv/salt from config — and the per-row cipher work is the
JVM-side `aes_encrypt`/`aes_decrypt` built-ins, so encryption of a
100 TB column stays inside whole-stage codegen with zero Python on the
hot path. Spark's CBC envelope is `iv || ciphertext`; the wrappers
slice/prepend the IV to speak the reference's bare-ciphertext format.

Parity envelope (non-ASCII): the reference's pad() counts Python CHARS
but encrypts UTF-8 BYTES (`encrypt_decrypt.py:21`). Whenever the UTF-8
byte length is congruent to the char length mod 16 — all ASCII, plus
non-ASCII whose multibyte overage is a multiple of 16 — the appended
pad is exactly standard byte-PKCS7 (pad value == pad count), so our
output is byte-identical and decrypt_col reads the payload. For every
OTHER non-ASCII input the reference's own AES call raises (data not
block-aligned), so no such legacy payload can exist: this module is a
strict superset — it encrypts everything the reference does (byte-
identically) plus the inputs the reference crashes on. Pinned by
tests/test_crypto.py::TestCharCountPaddingEnvelope against a
char-count-faithful replica of the reference's pad().
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

_IV_LEN = 16


def derive_key(passphrase: str, salt: str) -> bytes:
    """PBKDF2-HMAC-SHA1, 1000 rounds, dkLen 64, first 32 bytes — the
    reference's get_private_key() (PyCryptodome PBKDF2 defaults)."""
    dk = hashlib.pbkdf2_hmac(
        "sha1", passphrase.encode("utf-8"), salt.encode("utf-8"), 1000, dklen=64
    )
    return dk[:32]


def encrypt_col(col: Column, passphrase: str, iv: str, salt: str) -> Column:
    """Base64(AES-256-CBC(PKCS7(col))) under the PBKDF2-derived key and
    the fixed config IV — byte-identical to the reference's encrypt().
    Spark prepends the IV to its CBC output, so slice it off."""
    key = derive_key(passphrase, salt)
    ivb = iv.encode("utf-8")
    if len(ivb) != _IV_LEN:
        raise ValueError(f"iv must be {_IV_LEN} bytes, got {len(ivb)}")
    envelope = F.aes_encrypt(
        col.cast("string"),
        F.lit(key),
        F.lit("CBC"),
        F.lit("PKCS"),
        F.lit(ivb),
    )
    ct = F.substring(envelope, _IV_LEN + 1, 2_000_000_000)
    # Spark's base64() MIME-chunks output at 76 chars with \r\n (the
    # legacy chunkBase64String behavior; session-conf dependent). The
    # reference writes unchunked b64encode, so strip line breaks — a
    # codegen projection, deterministic under ANY session conf (the
    # driver runs a vanilla session where the legacy conf is unset).
    return F.regexp_replace(F.base64(ct), "[\\r\\n]", "")


def decrypt_col(col: Column, passphrase: str, iv: str, salt: str) -> Column:
    """Inverse of encrypt_col for reference-format payloads: prepend the
    config IV to the bare ciphertext so aes_decrypt sees Spark's
    envelope, then unpad/decode (PKCS handled by the builtin)."""
    key = derive_key(passphrase, salt)
    ivb = iv.encode("utf-8")
    if len(ivb) != _IV_LEN:
        raise ValueError(f"iv must be {_IV_LEN} bytes, got {len(ivb)}")
    envelope = F.concat(F.lit(ivb), F.unbase64(col))
    return F.aes_decrypt(
        envelope, F.lit(key), F.lit("CBC"), F.lit("PKCS")
    ).cast("string")
