"""[EXT] MinHash calibration report — the DQ-of-the-dedup-pipeline:
for every planted near-dup pair, the ESTIMATED Jaccard (matching
signature components / k, the unbiased MinHash estimator) next to the
EXACT Jaccard from the fingerprint sets. This is how a production
pipeline validates its banding parameters before trusting
`dedup_minhash_lsh` at corpus scale: if est and true diverge beyond
binomial noise, the hash family or shingle width is wrong.

Everything is exact integer arithmetic on OUR multiply-mod hash
family (ext_dedup's _A/_B over 48-bit fingerprints) — the estimator
itself is deterministic, so the whole report is hash-checkable.
Reuses the session-persisted fingerprint table and the same
`minhash_signatures` operator the LSH query banded.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from .ext_dedup import (
    _A,
    _B,
    _M,
    _SQL_CORPUS,
    _SQL_SHINGLE_HASHES,
    N_HASHES,
    minhash_signatures,
    planted_corpus_fingerprints,
)

_SIG_COLS_SQL = ",\n         ".join(
    f"MIN(({_A[j]} * h + {_B[j]}) % {_M}) AS m{j}" for j in range(N_HASHES)
)
_MATCHES_SQL = " + ".join(
    f"CASE WHEN sa.m{j} = sb.m{j} THEN 1 ELSE 0 END" for j in range(N_HASHES)
)

_CALIBRATION_ORACLE = f"""
WITH corpus AS ({_SQL_CORPUS}),
fp AS ({_SQL_SHINGLE_HASHES}),
cand AS (
  SELECT doc_id AS doc_a, doc_id + 2000000 AS doc_b
  FROM documents WHERE doc_id % 7 = 0
),
sig AS (
  SELECT doc_id,
         {_SIG_COLS_SQL}
  FROM fp GROUP BY doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM fp GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN fp a ON a.doc_id = c.doc_a
  JOIN fp b ON b.doc_id = c.doc_b AND b.h = a.h
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST({_MATCHES_SQL} AS BIGINT) AS sig_matches,
       CAST({_MATCHES_SQL} AS BIGINT) * 1000000 // {N_HASHES} AS est_ppm,
       i.n_common * 1000000 // (sa2.n + sb2.n - i.n_common) AS true_ppm
FROM inter i
JOIN sig sa ON sa.doc_id = i.doc_a
JOIN sig sb ON sb.doc_id = i.doc_b
JOIN sizes sa2 ON sa2.doc_id = i.doc_a
JOIN sizes sb2 ON sb2.doc_id = i.doc_b
"""


@register("dedup_minhash_calibration", _CALIBRATION_ORACLE)
def dedup_minhash_calibration(spark, sf_dir):
    fp = planted_corpus_fingerprints(spark, sf_dir)
    sig = minhash_signatures(fp)
    sizes = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    cand = (
        fp.select("doc_id")
        .distinct()
        .filter((F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 2000000))
        .select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + 2000000).alias("doc_b"),
        )
    )
    a = fp.select(F.col("doc_id").alias("doc_a"), "h")
    b = fp.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    matches = sum(
        F.when(F.col(f"sa.m{j}") == F.col(f"sb.m{j}"), 1).otherwise(0)
        for j in range(N_HASHES)
    )
    return (
        inter.join(
            sig.alias("sa"), F.col("doc_a") == F.col("sa.doc_id")
        )
        .join(sig.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            matches.cast("bigint").alias("sig_matches"),
            # 1e6/16 = 62500 exactly, so the estimator ppm is a pure
            # integer product (matches the oracle's // 16 bit-for-bit)
            (matches.cast("bigint") * F.lit(62500))
            .cast("bigint")
            .alias("est_ppm"),
            F.expr("n_common * 1000000 DIV (n_a + n_b - n_common)").alias(
                "true_ppm"
            ),
        )
    )
