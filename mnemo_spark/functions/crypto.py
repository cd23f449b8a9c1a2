"""Encryption + provenance primitives (reference F3/F4).

- AES-GCM content encryption (encryption.rs:14-110; applied at
  remember.rs:161-165, decrypted at recall.rs:795-817): Spark's
  builtin `aes_encrypt`/`aes_decrypt` (JVM-side), base64-wrapped like
  the reference's `nonce(12) ‖ ct+tag` envelope. ORDERING CONTRACT
  (SURVEY §7): embed-then-encrypt — embeddings are computed over
  plaintext BEFORE this column replaces content.
- HMAC-SHA256 read-provenance receipts (provenance.rs:111-188):
  no JVM builtin → stdlib-`hmac` pandas UDF (Arrow-batched; receipts
  are emitted per recall batch, so the Python hop is off the hot
  scan path).
"""

from __future__ import annotations

import hashlib
import hmac as _hmac

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def encrypt_content(content: Column, key: str) -> Column:
    """AES-256-GCM encrypt → base64 text (random IV per row, prepended
    by Spark's aes_encrypt exactly like the reference's nonce‖ct)."""
    return F.base64(
        F.aes_encrypt(content.cast("binary"), F.lit(key), F.lit("GCM"))
    )


def decrypt_content(wrapped: Column, key: str) -> Column:
    return F.aes_decrypt(
        F.unbase64(wrapped), F.lit(key), F.lit("GCM")
    ).cast("string")


def hmac_receipt(key: str, key_id: str):
    """Column function: HMAC-SHA256 over a payload column, emitted as
    '<key_id>:<hex>' — the reference's read-provenance receipt."""
    kb = key.encode()

    @pandas_udf("string")
    def _sign(payload: pd.Series) -> pd.Series:
        return payload.map(
            lambda p: key_id
            + ":"
            + _hmac.new(kb, (p or "").encode(), hashlib.sha256).hexdigest()
        )

    return _sign


def verify_receipt(key: str, key_id: str):
    """Column function: receipt + payload → boolean validity."""
    kb = key.encode()

    @pandas_udf("boolean")
    def _check(payload: pd.Series, receipt: pd.Series) -> pd.Series:
        def ok(p, r):
            want = key_id + ":" + _hmac.new(
                kb, (p or "").encode(), hashlib.sha256
            ).hexdigest()
            return _hmac.compare_digest(want, r or "")

        return pd.Series([ok(p, r) for p, r in zip(payload, receipt)])

    return _check
