"""[EXT] Text analysis, part 12: n-gram novelty — the memorization-
risk / contamination data-card metric: what fraction of a document's
3-gram fingerprints appear in at least one OTHER document?

``text_ngram_novelty`` runs over the planted near-dup corpus (the
dedup harness corpus, ext_dedup.py:56): per document, the distinct
3-gram fingerprint count ``n_shingles``, the count whose document
frequency is >= 2 (``n_shared``), and the integer novelty ratio
``novelty_ppm = (n_shingles - n_shared) * 1e6 DIV n_shingles``.
Planted duplicates surface with near-zero novelty; organic docs score
by how much boilerplate they share — the signal an LLM-data curation
pass uses to down-weight memorization-prone/boilerplate documents
(the complement of the winnowing/containment family's pairwise view;
this is the corpus-wide per-doc marginal).

Scale: probes the session-persisted fingerprint artifact
(ext_dedup.planted_corpus_fingerprints); the df table is one
map-side-combinable groupBy on the 48-bit key; the join back is a
bigint equi-join. Everything is O(total shingles), nothing pairwise.

Reference anchor: none ([EXT] per SURVEY.md §2 — text-analysis
family).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from .ext_dedup import (
    _SQL_SHINGLE_HASHES,
    planted_corpus_doc_freq,
    planted_corpus_fingerprints,
)

_NOVELTY_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         text || ' near duplicate variant tokens appended' AS text
  FROM documents WHERE doc_id % 7 = 0
),
fp AS ({_SQL_SHINGLE_HASHES}),
df AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS df FROM fp GROUP BY h)
SELECT fp.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       CAST(((COUNT(*) - SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END))
             * 1000000) // COUNT(*) AS BIGINT) AS novelty_ppm
FROM fp JOIN df ON df.h = fp.h
GROUP BY fp.doc_id
"""


@register("text_ngram_novelty", _NOVELTY_ORACLE)
def text_ngram_novelty(spark, sf_dir):
    fp = planted_corpus_fingerprints(spark, sf_dir)
    df = planted_corpus_doc_freq(spark, sf_dir)
    per_doc = (
        fp.join(df, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_shared",
        F.expr(
            "CAST(((n_shingles - n_shared) * 1000000) DIV n_shingles AS BIGINT)"
        ).alias("novelty_ppm"),
    )
