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

Scale shape (round-6 rewrite): positions EXPLODE map-side and the
polynomial is a flat 16-term whole-stage-codegen expression per
exploded row; the winnowing minimum is a sliding ROWS-frame window
min on the doc_id partition. The first form — nested
transform/slice/array_min higher-order lambdas per document —
evaluated every term interpreted (the same HOF pitfall
ext_graph3.copurchase_pairs documents) and cost 26 s at sf0.1; the
exploded codegen form is ~20×. Only (doc_id, pos, hash) ever
shuffles; DISTINCT aggregates on (doc_id, fp). Downstream near-copy
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
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.trim("text")).alias("s")
    )
    d = d.filter(F.length("s") >= K + W - 1)
    # spread documents across cores BEFORE the CPU-heavy map: the
    # sf-dir corpus is one parquet file → one input partition, and
    # hashing is per-doc work that parallelizes perfectly
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = d.repartition(n_part, "doc_id")
    # char codes ONCE per document (substr(s, i, 1) inside the gram
    # polynomial is O(i) on UTF8 strings — evaluating it per term made
    # the whole query O(n²·K) bytes scanned per doc); gram hashes then
    # read the codes array with O(1) element_at lookups in one flat
    # codegen expression per exploded position
    codes = F.expr("transform(split(s, ''), c -> ascii(c))")
    poly = " + ".join(
        f"CAST(element_at(cs, i + {j + 1}) AS BIGINT)"
        f" * CAST({_POW[j]} AS BIGINT)"
        for j in range(K)
    )
    g = d.select(
        "doc_id",
        (F.length("s") - K + 1).alias("n_grams"),
        codes.alias("cs"),
    ).select(
        "doc_id",
        "n_grams",
        "cs",
        F.explode(F.expr(f"sequence(0, n_grams - 1)")).alias("i"),
    ).select(
        "doc_id",
        "n_grams",
        "i",
        F.expr(f"CAST(({poly}) % {M} AS BIGINT)").alias("h"),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.currentRow, W - 1)
    )
    return (
        g.withColumn("fp", F.min("h").over(win))
        # windows that would run past the last gram are not selected
        .filter(F.col("i") <= F.col("n_grams") - W)
        .select("doc_id", F.col("fp").alias("fingerprint"))
        .distinct()
    )
