"""[EXT] Dataset release manifest — the reproducibility artifact a
training run records before touching data: per split (from
`split_group_aware`'s leakage-proof assignment), document count,
total bytes, source count, and a modular membership checksum — so a
re-run, a migration, or an auditor can verify "the same dataset"
without comparing documents. Pairs with `documents_data_card` (what's
IN the data) as the what-exactly-shipped record.

All integer: bytes from n_chars, checksum Σ(doc_id mod p) mod p per
split (term-wise reduction — overflow-proof at any corpus size,
same discipline as `sample_stratified_hamilton`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_MOD = 1_000_000_007

_MANIFEST_ORACLE = f"""
WITH g AS (
  SELECT doc_id, source, n_chars,
         CAST(concat('0x', substr(md5(source), 1, 12)) AS BIGINT) % 10
           AS bucket
  FROM documents
),
s AS (
  SELECT CASE WHEN bucket < 8 THEN 'train'
              WHEN bucket = 8 THEN 'val'
              ELSE 'test' END AS split,
         doc_id, source, n_chars
  FROM g
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
       CAST(SUM(doc_id % {_MOD}) % {_MOD} AS BIGINT) AS id_checksum,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM s GROUP BY split
"""


@register("training_dataset_manifest", _MANIFEST_ORACLE)
def training_dataset_manifest(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5("source"), 1, 12), 16, 10).cast("bigint")
        % 10
    )
    s = docs.select(
        F.when(bucket < 8, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
        "doc_id",
        "source",
        "n_chars",
    )
    return s.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
        F.sum("n_chars").cast("bigint").alias("total_bytes"),
        F.expr(f"SUM(doc_id % {_MOD}) % {_MOD}")
        .cast("bigint")
        .alias("id_checksum"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    )
