"""[EXT] Rolling-hash document fingerprinting with winnowing —
Schleimer/Wilkerson/Aiken SIGMOD'03 (the MOSS algorithm), the local
fingerprinting scheme plagiarism/near-copy detection is built on, and
the rolling-hash counterpart to the whole-document md5 fingerprint in
ext_text.py.

Hash: the Rabin–Karp polynomial over character K-grams,
``h_i = (Σ_j code(s[i+j])·B^(K−1−j)) mod M``. Sequential engines
compute it with the O(1) rolling recurrence; the recurrence is an
optimization, the polynomial is the definition — both engines here
evaluate the same positional polynomial with precomputed ``B^j mod M``
constants, so every value is integer-exact and engine-identical
(codes ≤ Unicode max ≈ 2²¹, B^j < M = 2³¹−1, 16-term sums < 2⁵⁶ —
no BIGINT overflow anywhere).

Winnowing: over every window of W consecutive K-gram hashes keep the
minimum; the DISTINCT selected minima are the document's
fingerprints. The guarantee (the paper's Theorem): any shared
substring of length ≥ W+K−1 between two documents yields at least
one shared fingerprint, while storage is ~2/(W+1) of all positions.

Scale shape: fingerprinting is a pure per-document map (transform +
slice + array_min higher-order expressions — no UDF, no shuffle);
the DISTINCT aggregates on (doc_id, fp). Downstream near-copy
detection joins on fp exactly like the shingle pipeline — bounded
candidate lists, never n².
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

K = 16  # k-gram length in characters
W = 8  # winnowing window (positions)
B = 257  # polynomial base
M = (1 << 31) - 1  # Mersenne prime modulus

# B^(K-1-j) mod M for j = 0..K-1 — highest power first, matching the
# textbook big-endian polynomial.
_POW = [pow(B, K - 1 - j, M) for j in range(K)]


def _poly_sql(var: str, idx: str) -> str:
    """`Σ_j ascii(substr(var, idx+j+1, 1)) * B^(K-1-j)` (1-based
    substr). Every term promotes to BIGINT up front: ascii() is INT
    and the power constants are INT-ranged, so a bare INT×INT product
    overflows under Spark's ANSI arithmetic (and DuckDB's INT32)."""
    return " + ".join(
        f"CAST(ascii(substr({var}, {idx}+{j + 1}, 1)) AS BIGINT)"
        f" * CAST({_POW[j]} AS BIGINT)"
        for j in range(K)
    )


_WINNOW_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lower(trim(text)) AS s FROM documents
  WHERE length(lower(trim(text))) >= {K + W - 1}
),
h AS (
  SELECT doc_id,
         list_transform(range(length(s) - {K} + 1),
                        i -> CAST(({_poly_sql('s', 'i')}) % {M} AS BIGINT)) AS hs
  FROM t
),
mins AS (
  SELECT doc_id,
         list_transform(range(len(hs) - {W} + 1),
                        sidx -> list_min(hs[sidx+1 : sidx+{W}])) AS ms
  FROM h
)
SELECT DISTINCT doc_id, m.fp AS fingerprint
FROM mins, UNNEST(ms) AS m(fp)
"""


@register("text_winnow_fingerprints", _WINNOW_ORACLE)
def text_winnow_fingerprints(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.trim("text")).alias("s")
    )
    d = d.filter(F.length("s") >= K + W - 1)
    hs = F.expr(
        f"transform(sequence(0, length(s) - {K}),"
        f" i -> CAST(({_poly_sql('s', 'i')}) % {M} AS BIGINT))"
    )
    mins = F.expr(
        f"transform(sequence(0, size(hs) - {W}),"
        f" sidx -> array_min(slice(hs, sidx + 1, {W})))"
    )
    # Materialization barrier between the two transforms: projection
    # collapse would otherwise inline the FULL hash-array expression
    # into the window-min lambda, re-evaluating all ~n K-gram hashes
    # once per window position (O(n²·K) per document instead of
    # O(n·K) — measured as minutes at sf0.01).
    hashed = d.withColumn("hs", hs).localCheckpoint()
    return (
        hashed.withColumn("ms", mins)
        .select("doc_id", F.explode("ms").alias("fingerprint"))
        .distinct()
    )
