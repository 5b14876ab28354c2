"""functions/crypto.py vs an independent replica of the reference
scheme (/root/reference/src/main/utility/encrypt_decrypt.py:24-40):
PBKDF2-HMAC-SHA1(1000, dkLen 64)[:32] -> AES-256-CBC(fixed IV) ->
PKCS7 -> base64 of the bare ciphertext. The replica uses the
`cryptography` package (different implementation from both the
reference's PyCryptodome and Spark's JVM cipher), so agreement is a
genuine cross-implementation known-answer check."""

from __future__ import annotations

import base64

import pytest
from pyspark.sql import functions as F

from sales_data_pipeline_spark.functions import crypto

try:
    from cryptography.hazmat.primitives.ciphers import (
        Cipher,
        algorithms,
        modes,
    )

    HAVE_CRYPTOGRAPHY = True
except ImportError:  # pragma: no cover
    HAVE_CRYPTOGRAPHY = False

PASSPHRASE = "spark-graft-demo-key"
IV = "0123456789abcdef"
SALT = "pipeline-demo-salt"


def _reference_encrypt(plaintext: str) -> str:
    """Independent replica of the reference's encrypt()."""
    key = crypto.derive_key(PASSPHRASE, SALT)
    raw = plaintext.encode("utf-8")
    padlen = 16 - len(raw) % 16
    padded = raw + bytes([padlen]) * padlen
    enc = Cipher(
        algorithms.AES(key), modes.CBC(IV.encode("utf-8"))
    ).encryptor()
    ct = enc.update(padded) + enc.finalize()
    return base64.b64encode(ct).decode("ascii")


@pytest.mark.skipif(not HAVE_CRYPTOGRAPHY, reason="cryptography absent")
class TestReferenceByteCompat:
    SAMPLES = [
        "hello world",
        "",  # pads to one full block, like the reference's pad()
        "exactly 16 bytes",  # boundary: PKCS7 adds a full extra block
        "Customer#000000042",
        "unicode: café ☃",
    ]

    def test_encrypt_matches_reference_scheme(self, spark):
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(self.SAMPLES)], "i long, pt string"
        )
        out = {
            r.i: r.ct
            for r in df.select(
                "i",
                crypto.encrypt_col(
                    F.col("pt"), PASSPHRASE, IV, SALT
                ).alias("ct"),
            ).collect()
        }
        for i, s in enumerate(self.SAMPLES):
            assert out[i] == _reference_encrypt(s), s

    def test_decrypt_reads_reference_payloads(self, spark):
        # payloads produced by the independent replica (what the
        # reference pipeline would have written) must decrypt
        rows = [
            (i, _reference_encrypt(s)) for i, s in enumerate(self.SAMPLES)
        ]
        df = spark.createDataFrame(rows, "i long, ct string")
        out = {
            r.i: r.pt
            for r in df.select(
                "i",
                crypto.decrypt_col(
                    F.col("ct"), PASSPHRASE, IV, SALT
                ).alias("pt"),
            ).collect()
        }
        assert out == dict(enumerate(self.SAMPLES))


class TestRoundTripAndPlan:
    def test_round_trip_identity(self, spark):
        df = spark.range(50).select(
            F.concat(F.lit("row-"), F.col("id")).alias("pt")
        )
        enc = crypto.encrypt_col(F.col("pt"), PASSPHRASE, IV, SALT)
        out = df.select(
            "pt",
            crypto.decrypt_col(enc, PASSPHRASE, IV, SALT).alias("back"),
        )
        assert out.filter(F.col("pt") != F.col("back")).count() == 0

    def test_bad_iv_length_rejected(self):
        with pytest.raises(ValueError):
            crypto.encrypt_col(F.lit("x"), PASSPHRASE, "short", SALT)

    def test_cipher_stays_in_codegen(self, spark):
        """No Python on the hot path: the per-row cipher is the JVM
        aes_encrypt/aes_decrypt builtin (SURVEY §2.11 discipline)."""
        df = spark.range(10).select(F.col("id").cast("string").alias("pt"))
        enc = crypto.encrypt_col(F.col("pt"), PASSPHRASE, IV, SALT)
        plan = df.select(enc.alias("ct"))._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        # renders as static_invoke(ExpressionImplUtils.aesEncrypt(...))
        # inside a WholeStageCodegen Project
        assert "aesEncrypt" in plan
        assert plan.lstrip().startswith("*"), plan[:200]
