"""Envelope encrypt+sign (SURVEY §2.6 K7), Spark-native.

The reference encrypts each serialized event with a NaCl SecretBox and
signs it with Ed25519 before publishing (`publisher.py:121-131`);
clients verify+decrypt (`utils/__init__.py:168-185`).  The Spark-first
re-expression uses the engine's built-in ``aes_encrypt`` in GCM mode —
*authenticated* encryption, so confidentiality and integrity (the
encrypt + sign pair) collapse into one JVM-side expression: tampering
with a single ciphertext byte fails decryption outright, exactly like a
bad signature fails the reference's client check.

Whole pipeline stays in whole-stage codegen — no Python, no UDF.  The
key is passed as a column literal for the demo surface; on a real
cluster inject it via ``spark.conf`` from a credential provider rather
than baking it into the plan.

GCM generates a random IV per row, so ciphertexts are intentionally
nondeterministic; the contract is round-trip equality and
tamper-rejection (both tested), not byte-stable output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: envelope fields serialized into the protected payload — same
#: canonical order as the Kafka/HTTP publishers (K6 serializer)
from ..streaming.kafka_sink import _PAYLOAD_COLS


def encrypt_envelopes(
    env: DataFrame, key: str, keep_cols=("conv_id", "turn_idx")
) -> DataFrame:
    """Envelope rows → ``(…keep_cols, ciphertext)``.

    ``ciphertext`` is base64(AES-GCM(canonical-JSON envelope)).  The
    key must be 16/24/32 bytes (AES-128/192/256).
    """
    payload = F.struct(*[F.col(c) for c in _PAYLOAD_COLS if c in env.columns])
    value = F.to_json(payload, {"ignoreNullFields": "false"})
    return env.select(
        *[F.col(c) for c in keep_cols],
        F.base64(
            F.aes_encrypt(value.cast("binary"), F.lit(key).cast("binary"), F.lit("GCM"))
        ).alias("ciphertext"),
    )


def decrypt_envelopes(df: DataFrame, key: str) -> DataFrame:
    """Inverse of :func:`encrypt_envelopes`: adds a ``payload_json``
    column (the canonical envelope JSON).  Raises on tampered
    ciphertext — GCM authentication is the signature check."""
    return df.withColumn(
        "payload_json",
        F.aes_decrypt(
            F.unbase64(F.col("ciphertext")),
            F.lit(key).cast("binary"),
            F.lit("GCM"),
        ).cast("string"),
    )
