"""[EXT] Near-dup cluster report — the rollup a curation run records
after clustering: per duplicate-cluster size, canonical member, and
character mass, for the "what did dedup actually remove" audit.
Composes the full pipeline (shingles → MinHash → LSH bands →
Jaccard verify → connected components, all reused from ext_dedup /
ext_graph) and reduces the cluster labels — so this one row-set
certifies the composition end-to-end, not a re-implementation.

Savings accounting: keeping the canonical (min doc_id) member of
each cluster drops `total_chars − canonical_chars` characters;
singleton clusters (docs with no near-dup) are excluded map-side so
the report is |clusters with size ≥ 2| rows at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from .ext_dedup import _corpus
from .ext_graph import _COMPONENTS_ORACLE, dedup_components

_CLUSTER_REPORT_ORACLE = f"""
WITH comp AS ({_COMPONENTS_ORACLE}),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         text || ' near duplicate variant tokens appended' AS text
  FROM documents WHERE doc_id % 7 = 0
),
sized AS (
  SELECT c.component_id, c.doc_id, length(co.text) AS n_chars
  FROM comp c JOIN corpus co ON co.doc_id = c.doc_id
),
clusters AS (
  SELECT component_id,
         COUNT(*) AS cluster_size,
         MIN(doc_id) AS canonical_doc,
         SUM(n_chars) AS total_chars,
         MIN(n_chars) AS min_chars,
         MAX(n_chars) AS max_chars
  FROM sized GROUP BY component_id
)
SELECT CAST(component_id AS BIGINT) AS component_id,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(canonical_doc AS BIGINT) AS canonical_doc,
       CAST(total_chars AS BIGINT) AS total_chars,
       CAST(min_chars AS BIGINT) AS min_chars,
       CAST(max_chars AS BIGINT) AS max_chars
FROM clusters WHERE cluster_size >= 2
"""


@register("dedup_cluster_report", _CLUSTER_REPORT_ORACLE)
def dedup_cluster_report(spark, sf_dir):
    comp = dedup_components(spark, sf_dir)
    sized = comp.join(
        _corpus(spark, sf_dir).select(
            "doc_id", F.length("text").alias("n_chars")
        ),
        "doc_id",
    )
    return (
        sized.groupBy("component_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .filter(F.col("cluster_size") >= 2)
        .select(
            F.col("component_id").cast("bigint").alias("component_id"),
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            "canonical_doc",
            "total_chars",
            "min_chars",
            "max_chars",
        )
    )
