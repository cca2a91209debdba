"""[EXT] Data card — the per-source datasheet a training-data
release publishes (Datasheets for Datasets, Gebru et al. 2018;
the composition/statistics tables of the Pile/Dolma/RefinedWeb
release reports).

One query emits the whole per-source profile, every column exact:

- volume: document count, char mass, whitespace token mass;
- language mix: distinct langs and the majority language with its
  share in ppm (deterministic mode: count DESC, lang ASC tiebreak);
- duplication: exact-duplicate fraction in ppm (docs whose text
  digest appears more than once CORPUS-WIDE, attributed to their
  source — cross-source duplication is the interesting signal);
- length distribution: exact median n_chars (lower median — the
  ordered-statistic discipline of agg_weighted_median).

Everything is a first-class operator elsewhere in the registry
(dedup_exact_hash, text token stats, mode aggregate, exact
percentiles); the data card is the composition a release pipeline
actually runs — and proving the COMPOSITION hash-exact is the point:
aggregation boundaries, join attribution, and tiebreaks all have to
line up at once.

Scale posture: two passes over documents metadata (one groupBy
source for volume/length, one digest groupBy for dup marking joined
back by digest — ids+digests only, text never shuffles), plus a
lang-mix groupBy; all map-side combined, output one row per source.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register

_DATACARD_ORACLE = """
WITH base AS (
  SELECT doc_id, source, lang, text, n_chars,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
         md5(text) AS digest
  FROM documents
),
dupmark AS (
  SELECT b.doc_id, b.source,
         CASE WHEN d.cnt > 1 THEN 1 ELSE 0 END AS is_dup
  FROM base b
  JOIN (SELECT digest, COUNT(*) AS cnt FROM base GROUP BY digest) d
    ON d.digest = b.digest
),
langmix AS (
  SELECT source, lang, COUNT(*) AS n,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY COUNT(*) DESC, lang ASC
         ) AS rn
  FROM base GROUP BY source, lang
),
medians AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM base
)
SELECT v.source,
       CAST(v.n_docs AS BIGINT) AS n_docs,
       CAST(v.sum_chars AS BIGINT) AS sum_chars,
       CAST(v.sum_tokens AS BIGINT) AS sum_tokens,
       CAST(v.n_langs AS BIGINT) AS n_langs,
       l.lang AS top_lang,
       CAST(l.n * 1000000 // v.n_docs AS BIGINT) AS top_lang_ppm,
       CAST(d.n_dups * 1000000 // v.n_docs AS BIGINT) AS dup_ppm,
       CAST(m.median_chars AS BIGINT) AS median_chars
FROM (
  SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars,
         SUM(n_tokens) AS sum_tokens, COUNT(DISTINCT lang) AS n_langs
  FROM base GROUP BY source
) v
JOIN (SELECT source, lang, n FROM langmix WHERE rn = 1) l ON l.source = v.source
JOIN (SELECT source, SUM(is_dup) AS n_dups FROM dupmark GROUP BY source) d
  ON d.source = v.source
JOIN (SELECT source, MIN(n_chars) AS median_chars FROM medians
      WHERE 2 * rn >= n GROUP BY source) m ON m.source = v.source
"""


@register("documents_data_card", _DATACARD_ORACLE)
def documents_data_card(spark, sf_dir):
    base = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        (
            F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "))) + 1
        ).alias("n_tokens"),
        F.md5("text").alias("digest"),
    )

    vol = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.countDistinct("lang").alias("n_langs"),
    )

    digest_counts = base.groupBy("digest").agg(F.count(F.lit(1)).alias("cnt"))
    dups = (
        base.select("source", "digest")
        .join(digest_counts, "digest")
        .groupBy("source")
        .agg(F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("n_dups"))
    )

    w_lang = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("lang"))
    langmix = (
        base.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(w_lang))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"), F.col("n").alias("top_n"))
    )

    w_med = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    w_cnt = Window.partitionBy("source")
    medians = (
        base.select(
            "source",
            "n_chars",
            F.row_number().over(w_med).alias("rn"),
            F.count(F.lit(1)).over(w_cnt).alias("n"),
        )
        .filter(2 * F.col("rn") >= F.col("n"))
        .groupBy("source")
        .agg(F.min("n_chars").alias("median_chars"))
    )

    return (
        vol.join(F.broadcast(langmix), "source")
        .join(F.broadcast(dups), "source")
        .join(F.broadcast(medians), "source")
        .select(
            "source",
            "n_docs",
            "sum_chars",
            "sum_tokens",
            F.col("n_langs").cast("bigint").alias("n_langs"),
            "top_lang",
            F.expr("top_n * 1000000 DIV n_docs").alias("top_lang_ppm"),
            F.expr("n_dups * 1000000 DIV n_docs").alias("dup_ppm"),
            F.col("median_chars").cast("bigint").alias("median_chars"),
        )
    )
