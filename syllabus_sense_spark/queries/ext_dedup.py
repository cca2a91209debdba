"""[EXT] Near-duplicate detection: MinHash + LSH banding, n-gram
Jaccard verification, and embedding-cosine near-dup — the core dedup
toolkit of a 100 TB training-data pipeline.

Design for scale (this is the real production shape, not a toy):

1. shingle: word 3-grams per doc (JVM higher-order functions, no UDF);
2. signature: k=16 MinHashes = min(md5(seed:shingle)) — one hash-agg
   shuffle keyed by doc_id; md5 is deterministic across engines, so
   the DuckDB oracle reproduces signatures bit-for-bit;
3. band: 4 bands x 4 rows; band hash = md5(concat of 4 mins). Docs
   agreeing on any band become candidates — the self-join is on
   (band_idx, band_hash), i.e. the shuffle key is a 128-bit hash with
   near-uniform distribution: no skew, no O(n^2) blowup;
4. verify: exact Jaccard on candidate pairs only.

The harness corpus is duplicate-free, so each query deterministically
plants near-dups (text || suffix) and must find exactly those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..tables import load
from . import register

# 8 bands x 2 rows: band-collision probability 1-(1-j^2)^8 keeps
# recall >= 0.99 even for short docs whose planted-dup Jaccard dips to
# ~0.7; false candidates from unrelated docs (j ~ 0.15) stay bounded
# and the exact-Jaccard verify stage prunes them.
N_HASHES = 16
N_BANDS = 8
ROWS_PER_BAND = 2
_DUP_SUFFIX = " near duplicate variant tokens appended"

# --- shared corpus/shingle derivation (Spark + SQL kept in lockstep) --------

_SQL_CORPUS = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text || '{_DUP_SUFFIX}' AS text
  FROM documents WHERE doc_id % 7 = 0
"""

def sql_shingles(n: int = 3) -> str:
    """DuckDB twin of ``shingle_docs`` for word n-grams (keep in
    lockstep with it)."""
    toks = "list_filter(string_split(c.text, ' '), x -> length(x) > 0)"
    gram = " || ' ' || ".join(f"{toks}[i+{j + 1}]" for j in range(n))
    return f"""
  SELECT DISTINCT c.doc_id, s.shingle
  FROM corpus c,
  UNNEST(
    CASE WHEN len({toks}) >= {n}
         THEN list_transform(range(len({toks}) - {n - 1}), i -> {gram})
         ELSE [] END
  ) AS s(shingle)
"""


_SQL_SHINGLES = sql_shingles(3)


def _corpus(spark, sf_dir) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_DUP_SUFFIX)).alias("text"),
    )
    return d.unionByName(dupes)


def shingle_docs(corpus: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams — pure built-ins.

    Tokens are materialized as a column before the shingle transform:
    referencing the tokenize expression inside the lambda would
    re-evaluate split+filter for every element_at call (O(tokens²)
    per row).
    """
    tokenized = corpus.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: F.length(x) > 0).alias("toks"),
    )
    toks = F.col("toks")
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # sequence(0, size-n) yields size-n+1 shingles; the SQL twin uses
    # range(size-(n-1)) = same count. Keep n=3 aligned with _SQL_SHINGLES.
    return (
        tokenized.select("doc_id", F.explode(shingles).alias("shingle")).distinct()
    )


def minhash_signatures(shingled: DataFrame, k: int = N_HASHES) -> DataFrame:
    """k MinHashes per doc: min over md5('<seed>:'||shingle). One
    hash-agg shuffle; signature width is k*32 bytes regardless of doc
    size."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"m{j}")
        for j in range(k)
    ]
    return shingled.groupBy("doc_id").agg(*aggs)


def lsh_bands(sigs: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_val): band hash over each run of
    ROWS_PER_BAND signature rows."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat(
                        *[F.col(f"m{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
                    )
                ).alias("band_val"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sigs.select("doc_id", F.explode(bands).alias("band")).select(
        "doc_id", F.col("band.band_idx").alias("band_idx"), F.col("band.band_val").alias("band_val")
    )


def candidate_pairs(bands: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) agreeing on at least one band."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, shingled: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard on candidates only: |A∩B| via a shingle equi-join,
    sizes via one count per doc. All joins are equi-joins on hashes/ids."""
    sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    s1 = shingled.alias("s1")
    s2 = shingled.alias("s2")
    inter = (
        pairs.alias("c")
        .join(s1, F.col("s1.doc_id") == F.col("c.doc_a"))
        .join(
            s2,
            (F.col("s2.doc_id") == F.col("c.doc_b"))
            & (F.col("s2.shingle") == F.col("s1.shingle")),
        )
        .groupBy("c.doc_a", "c.doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.alias("na")
    nb = sizes.alias("nb")
    return (
        inter.join(na, F.col("na.doc_id") == F.col("doc_a"))
        .join(nb, F.col("nb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("na.n_shingles") + F.col("nb.n_shingles") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


_MINHASH_ORACLE = f"""
WITH corpus AS ({_SQL_CORPUS}),
sh AS ({_SQL_SHINGLES}),
sigs AS (
  SELECT doc_id,
    {', '.join(f"MIN(md5('{j}:' || shingle)) AS m{j}" for j in range(N_HASHES))}
  FROM sh GROUP BY doc_id
),
bands AS (
  {' UNION ALL '.join(
      "SELECT doc_id, " + str(b) + " AS band_idx, md5("
      + " || ".join(f"m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
      + ") AS band_val FROM sigs"
      for b in range(N_BANDS)
  )}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.doc_a
  JOIN sh s2 ON s2.doc_id = c.doc_b AND s2.shingle = s1.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT
  i.doc_a,
  i.doc_b,
  CAST(i.n_common AS DOUBLE) / (na.n_shingles + nb.n_shingles - i.n_common) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE CAST(i.n_common AS DOUBLE) / (na.n_shingles + nb.n_shingles - i.n_common) >= 0.5
"""


@register("dedup_minhash_lsh", _MINHASH_ORACLE)
def dedup_minhash_lsh(spark, sf_dir):
    corpus = _corpus(spark, sf_dir)
    # The distinct (doc, shingle) set feeds three consumers (signatures,
    # sizes, intersection join) — cache it so the explode+distinct
    # shuffle happens once. At cluster scale this is the materialized
    # shingle table a production dedup would persist anyway.
    shingled = shingle_docs(corpus).cache()
    sigs = minhash_signatures(shingled)
    pairs = candidate_pairs(lsh_bands(sigs))
    return jaccard_verify(pairs, shingled, threshold=0.5)


_NGRAM_JACCARD_ORACLE = f"""
WITH corpus AS ({_SQL_CORPUS}),
sh AS ({_SQL_SHINGLES}),
cand AS (
  SELECT doc_id AS doc_a, doc_id + 2000000 AS doc_b
  FROM documents WHERE doc_id % 7 = 0
),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.doc_a
  JOIN sh s2 ON s2.doc_id = c.doc_b AND s2.shingle = s1.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT
  i.doc_a,
  i.doc_b,
  i.n_common,
  na.n_shingles AS n_a,
  nb.n_shingles AS n_b,
  CAST(i.n_common AS DOUBLE) / (na.n_shingles + nb.n_shingles - i.n_common) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
"""


@register("dedup_ngram_jaccard", _NGRAM_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard on a known candidate set (the planted
    dup pairs) — the verification stage of near-dedup, standalone."""
    corpus = _corpus(spark, sf_dir)
    shingled = shingle_docs(corpus)
    d = load(spark, sf_dir, "documents")
    cand = d.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 2000000).alias("doc_b")
    )
    sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    s1 = shingled.alias("s1")
    s2 = shingled.alias("s2")
    inter = (
        cand.alias("c")
        .join(s1, F.col("s1.doc_id") == F.col("c.doc_a"))
        .join(
            s2,
            (F.col("s2.doc_id") == F.col("c.doc_b"))
            & (F.col("s2.shingle") == F.col("s1.shingle")),
        )
        .groupBy("c.doc_a", "c.doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.alias("na")
    nb = sizes.alias("nb")
    return (
        inter.join(na, F.col("na.doc_id") == F.col("doc_a"))
        .join(nb, F.col("nb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            F.col("na.n_shingles").alias("n_a"),
            F.col("nb.n_shingles").alias("n_b"),
            (
                F.col("n_common").cast("double")
                / (F.col("na.n_shingles") + F.col("nb.n_shingles") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
