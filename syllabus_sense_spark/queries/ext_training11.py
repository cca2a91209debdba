"""[EXT] Stratified sampling that EXECUTES the Hamilton plan — the
end-to-end composition of `training_quota_apportionment` (decide an
exact integer quota per (source, lang) cell) with deterministic
bottom-k selection inside each cell (rank by OUR multiply-mod hash of
doc_id (id reduced mod p before the multiply, so the product stays
inside BIGINT at any id range), the same re-runnable-order family as
`sample_reservoir_per_group`). A cell whose quota exceeds its
population yields the whole cell — the gap is visible in the output
(`n_selected < quota`), not silently rebalanced.

Output per cell: quota, population, selected count, and a modular
checksum of the selected doc_ids (sum mod 1e9+7 — overflow-proof at
any corpus size) so the oracle pins the exact membership, not just
the counts.

Scale posture: quotas come from the pre-reduced cell table; ranking
is one window per cell partition (the check-scale form — at corpus
scale the production path is the reservoir query's two-pass hash
threshold, which this shares its ordering family with, so the chosen
sets are identical).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from .ext_training9 import _APPORTION_ORACLE, training_quota_apportionment

_K = 2654435761  # Knuth multiplicative constant
_P = 2147483647  # 2^31 - 1
_MOD = 1_000_000_007

_STRAT_ORACLE = f"""
WITH quotas AS ({_APPORTION_ORACLE}),
ranked AS (
  SELECT source, lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source, lang
           ORDER BY ((doc_id % {_P}) * {_K}) % {_P}, doc_id
         ) AS rn
  FROM documents
),
sel AS (
  SELECT r.source, r.lang, q.quota, r.doc_id
  FROM ranked r JOIN quotas q
    ON q.source = r.source AND q.lang = r.lang
  WHERE r.rn <= q.quota
),
pop AS (
  SELECT source, lang, COUNT(*) AS population
  FROM documents GROUP BY source, lang
)
SELECT p.source, p.lang,
       CAST(q.quota AS BIGINT) AS quota,
       CAST(p.population AS BIGINT) AS population,
       CAST(COALESCE(s.n_selected, 0) AS BIGINT) AS n_selected,
       CAST(COALESCE(s.id_checksum, 0) AS BIGINT) AS id_checksum
FROM pop p
JOIN quotas q ON q.source = p.source AND q.lang = p.lang
LEFT JOIN (
  SELECT source, lang, COUNT(*) AS n_selected,
         SUM(doc_id % {_MOD}) % {_MOD} AS id_checksum
  FROM sel GROUP BY source, lang
) s ON s.source = p.source AND s.lang = p.lang
"""


@register("sample_stratified_hamilton", _STRAT_ORACLE)
def sample_stratified_hamilton(spark, sf_dir):
    quotas = training_quota_apportionment(spark, sf_dir).select(
        "source", "lang", "quota"
    )
    docs = load(spark, sf_dir, "documents").select("source", "lang", "doc_id")
    w = Window.partitionBy("source", "lang").orderBy(
        F.expr(f"((doc_id % {_P}) * {_K}) % {_P}"), F.col("doc_id")
    )
    ranked = docs.withColumn("rn", F.row_number().over(w))
    sel = ranked.join(F.broadcast(quotas), ["source", "lang"]).filter(
        F.col("rn") <= F.col("quota")
    )
    pop = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("population")
    )
    sel_agg = sel.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.expr(f"SUM(doc_id % {_MOD}) % {_MOD}").alias("id_checksum"),
    )
    return (
        pop.join(F.broadcast(quotas), ["source", "lang"])
        .join(sel_agg, ["source", "lang"], "left")
        .select(
            "source",
            "lang",
            F.col("quota").cast("bigint").alias("quota"),
            F.col("population").cast("bigint").alias("population"),
            F.coalesce(F.col("n_selected"), F.lit(0))
            .cast("bigint")
            .alias("n_selected"),
            F.coalesce(F.col("id_checksum"), F.lit(0))
            .cast("bigint")
            .alias("id_checksum"),
        )
    )
