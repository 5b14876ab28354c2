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
        # > 57 bytes -> ciphertext whose base64 crosses the 76-char MIME
        # chunk boundary: pins that encrypt_col strips Spark's \r\n
        # chunking and stays byte-identical to the reference's unchunked
        # b64encode on long payloads
        "long payload " * 10,
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


def _reference_faithful_encrypt(plaintext: str) -> str:
    """CHAR-COUNT-faithful replica of the reference's pad()+encrypt():
    pad length computed from len(str) (not UTF-8 bytes), exactly like
    /root/reference/src/main/utility/encrypt_decrypt.py:21. For inputs
    whose byte length is not char-congruent mod 16 the cipher raises —
    the same failure the reference itself hits."""
    key = crypto.derive_key(PASSPHRASE, SALT)
    padlen = 16 - len(plaintext) % 16  # chars, like the reference
    padded = (plaintext + chr(padlen) * padlen).encode("utf-8")
    enc = Cipher(
        algorithms.AES(key), modes.CBC(IV.encode("utf-8"))
    ).encryptor()
    ct = enc.update(padded) + enc.finalize()
    return base64.b64encode(ct).decode("ascii")


@pytest.mark.skipif(not HAVE_CRYPTOGRAPHY, reason="cryptography absent")
class TestCharCountPaddingEnvelope:
    """The reference pads by CHAR count but encrypts UTF-8 BYTES. The
    parity envelope this pins: byte-aligned inputs (byte_len == char_len
    mod 16) give byte-identical output; everything else CRASHES the
    reference, so no incompatible legacy payload can exist."""

    # 16 two-byte chars -> multibyte overage 16 == 0 (mod 16): the
    # reference succeeds and its char-count pad is exactly byte-PKCS7
    ALIGNED = "é" * 16 + " accents aplenty"
    # same overage-multiple-of-16 premise but char_len % 16 != 0
    # (19 chars / 35 bytes): the surviving-payload shape where the pad
    # count is NON-trivial (13, = '\r' repeated) on both schemes — pins
    # that parity doesn't depend on the pad being a full 16-byte block
    ALIGNED_ODD_PAD = "é" * 16 + "abc"
    # 1 two-byte char -> overage 1: the reference's AES call rejects it
    MISALIGNED = "café"

    def test_aligned_non_ascii_byte_identical(self, spark):
        raw = self.ALIGNED.encode("utf-8")
        assert (len(raw) - len(self.ALIGNED)) % 16 == 0  # premise
        expected = _reference_faithful_encrypt(self.ALIGNED)
        df = spark.createDataFrame([(self.ALIGNED,)], "pt string")
        (got,) = df.select(
            crypto.encrypt_col(F.col("pt"), PASSPHRASE, IV, SALT).alias(
                "ct"
            )
        ).collect()
        assert got.ct == expected
        # and the legacy payload decrypts through the Spark path
        (back,) = spark.createDataFrame(
            [(expected,)], "ct string"
        ).select(
            crypto.decrypt_col(F.col("ct"), PASSPHRASE, IV, SALT).alias(
                "pt"
            )
        ).collect()
        assert back.pt == self.ALIGNED

    def test_aligned_odd_pad_byte_identical(self, spark):
        raw = self.ALIGNED_ODD_PAD.encode("utf-8")
        assert (len(raw) - len(self.ALIGNED_ODD_PAD)) % 16 == 0  # premise
        assert len(self.ALIGNED_ODD_PAD) % 16 != 0  # pad count != 16
        expected = _reference_faithful_encrypt(self.ALIGNED_ODD_PAD)
        df = spark.createDataFrame([(self.ALIGNED_ODD_PAD,)], "pt string")
        (got,) = df.select(
            crypto.encrypt_col(F.col("pt"), PASSPHRASE, IV, SALT).alias(
                "ct"
            )
        ).collect()
        assert got.ct == expected
        (back,) = spark.createDataFrame(
            [(expected,)], "ct string"
        ).select(
            crypto.decrypt_col(F.col("ct"), PASSPHRASE, IV, SALT).alias(
                "pt"
            )
        ).collect()
        assert back.pt == self.ALIGNED_ODD_PAD

    def test_misaligned_non_ascii_crashes_reference(self, spark):
        # the reference cannot produce a payload for this input at all
        with pytest.raises(ValueError):
            _reference_faithful_encrypt(self.MISALIGNED)
        # ours encrypts and round-trips it — strict superset
        df = spark.createDataFrame([(self.MISALIGNED,)], "pt string")
        enc = crypto.encrypt_col(F.col("pt"), PASSPHRASE, IV, SALT)
        (row,) = df.select(
            crypto.decrypt_col(enc, PASSPHRASE, IV, SALT).alias("back")
        ).collect()
        assert row.back == self.MISALIGNED


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
