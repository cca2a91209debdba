"""Column-level encryption roundtrip — the PII-protection surface
(`aes_encrypt`/`aes_decrypt`), the function family a lakehouse uses
to store sensitive columns encrypted at rest while keeping the rest
of the row queryable.

Determinism discipline: GCM (the secure default) generates a random
IV per call, so the CIPHERTEXT is intentionally nondeterministic —
the oracle therefore checks (a) the decrypt∘encrypt roundtrip
restores the exact plaintext (aggregated checksums over the
decrypted column match checksums computed straight from the source),
and (b) the GCM framing overhead is the fixed 28 bytes (12-byte IV +
16-byte tag) per value — a structural constant that IS deterministic
even though the bytes aren't.

Scale posture: pure per-row codegen expressions (JVM AES-NI);
nothing shuffles but the final aggregate. Key management is the
caller's problem by design — the key here is a fixture.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_KEY = "0123456789abcdef"  # 16-byte AES-128 fixture key

_CRYPTO_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS sum_plain_chars,
       CAST(SUM(length(text) * (doc_id % 97)) AS BIGINT) AS weighted_checksum,
       CAST(COUNT(*) * 28 AS BIGINT) AS sum_cipher_overhead
FROM documents
GROUP BY lang
"""


@register("crypto_roundtrip_pii", _CRYPTO_ORACLE)
def crypto_roundtrip_pii(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    enc = d.select(
        "doc_id",
        "lang",
        F.length("text").alias("plain_len"),
        F.expr(f"aes_encrypt(text, '{_KEY}')").alias("ct"),
    )
    dec = enc.select(
        "doc_id",
        "lang",
        "plain_len",
        F.expr(f"CAST(aes_decrypt(ct, '{_KEY}') AS STRING)").alias("pt"),
        (F.length("ct") - F.col("plain_len")).alias("overhead"),
    )
    return dec.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("pt")).cast("bigint").alias("sum_plain_chars"),
        F.sum(F.length("pt") * (F.col("doc_id") % 97))
        .cast("bigint")
        .alias("weighted_checksum"),
        F.sum("overhead").cast("bigint").alias("sum_cipher_overhead"),
    )
