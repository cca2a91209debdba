"""[EXT] Incremental near-dedup: match a NEW document batch against
the existing corpus via the inverted fingerprint index — the online
form of dedup (ext_dedup.py is the offline self-join form).

Production shape: the corpus's distinct (doc_id, shingle-fingerprint)
table is a persisted index; an arriving batch shingles itself (tiny),
joins the index on the 48-bit fingerprint key to discover candidate
matches, counts shared fingerprints per (new, old) pair, and verifies
exact Jaccard using both documents' shingle counts. Cost is
|batch shingles| + the index probe — the corpus is never self-joined,
and the batch side broadcasts. A hit means "drop (or link) the new
doc before it enters the corpus".

The harness corpus is duplicate-free, so the query plants the new
batch deterministically: every 13th document re-appears with an
appended revision suffix, and must match exactly its original.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from .ext_dedup import _SQL_SHINGLE_HASHES, shingle_hashes

_SUFFIX = " incremental batch revision tokens"
_NEW_BASE = 3000000
_TAU = 0.5

# The oracle's shingle machinery expects a CTE named ``corpus``;
# build one per side.
_OLD_SQL = "SELECT doc_id, text FROM documents"
_NEW_SQL = f"""
  SELECT doc_id + {_NEW_BASE} AS doc_id, text || '{_SUFFIX}' AS text
  FROM documents WHERE doc_id % 13 = 0
"""

_INCR_ORACLE = f"""
WITH old_sh AS (
  WITH corpus AS ({_OLD_SQL})
  {_SQL_SHINGLE_HASHES}
),
new_sh AS (
  WITH corpus AS ({_NEW_SQL})
  {_SQL_SHINGLE_HASHES}
),
old_sizes AS (SELECT doc_id, COUNT(*) AS n FROM old_sh GROUP BY doc_id),
new_sizes AS (SELECT doc_id, COUNT(*) AS n FROM new_sh GROUP BY doc_id),
inter AS (
  SELECT n.doc_id AS new_id, o.doc_id AS old_id, COUNT(*) AS n_common
  FROM new_sh n JOIN old_sh o ON o.h = n.h
  GROUP BY n.doc_id, o.doc_id
)
SELECT
  i.new_id,
  i.old_id,
  CAST(i.n_common AS DOUBLE) / (ns.n + os.n - i.n_common) AS jaccard
FROM inter i
JOIN new_sizes ns ON ns.doc_id = i.new_id
JOIN old_sizes os ON os.doc_id = i.old_id
WHERE CAST(i.n_common AS DOUBLE) / (ns.n + os.n - i.n_common) >= {_TAU}
"""


@register("dedup_incremental_index", _INCR_ORACLE)
def dedup_incremental_index(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    new_batch = d.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + _NEW_BASE).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_SUFFIX)).alias("text"),
    )
    index = shingle_hashes(d)  # the persisted corpus index at scale
    new_sh = shingle_hashes(new_batch)

    old_sizes = index.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_old"))
    new_sizes = new_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_new"))
    inter = (
        F.broadcast(new_sh.select(F.col("doc_id").alias("new_id"), "h"))
        .join(index.select(F.col("doc_id").alias("old_id"), "h"), "h")
        .groupBy("new_id", "old_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(new_sizes.select(F.col("doc_id").alias("new_id"), "n_new")),
            "new_id",
        )
        .join(old_sizes.select(F.col("doc_id").alias("old_id"), "n_old"), "old_id")
        .select(
            "new_id",
            "old_id",
            (
                F.col("n_common").cast("double")
                / (F.col("n_new") + F.col("n_old") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _TAU)
    )


