"""Source batch 2 — cross-format federation: ONE query reading the
same logical table from three physical formats (parquet source, an
ORC export, a JSONL export) and unioning them with format tags — the
lakehouse reality where history lives in one format and fresh data
in another, and the engine must read both in one plan. Certifies
that format choice is value-transparent: per-format counts and
checksums must be identical triples.

Exports land in a uuid-fresh temp dir per run; the checksum is the
modular event_id sum (term-wise reduction, overflow-proof).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import scratch_dir

_MOD = 1_000_000_007

_FEDERATED_ORACLE = f"""
WITH base AS (
  SELECT event_id, user_id, event_type FROM events
),
one AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(event_id % {_MOD}) % {_MOD} AS BIGINT) AS id_checksum,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
  FROM base
)
SELECT 'parquet' AS fmt, n_rows, id_checksum, n_types FROM one
UNION ALL
SELECT 'orc', n_rows, id_checksum, n_types FROM one
UNION ALL
SELECT 'jsonl', n_rows, id_checksum, n_types FROM one
"""


@register("source_federated_union", _FEDERATED_ORACLE)
def source_federated_union(spark, sf_dir):
    cols = ["event_id", "user_id", "event_type"]
    base = load(spark, sf_dir, "events").select(*cols)
    root = scratch_dir("federated_")
    orc_dir = os.path.join(root, "orc")
    jsonl_dir = os.path.join(root, "jsonl")
    base.write.mode("overwrite").orc(orc_dir)
    base.write.mode("overwrite").json(jsonl_dir)
    tagged = (
        base.withColumn("fmt", F.lit("parquet"))
        .unionByName(
            spark.read.orc(orc_dir).select(*cols).withColumn(
                "fmt", F.lit("orc")
            )
        )
        .unionByName(
            spark.read.schema(
                "event_id long, user_id long, event_type string"
            )
            .json(jsonl_dir)
            .select(*cols)
            .withColumn("fmt", F.lit("jsonl"))
        )
    )
    return tagged.groupBy("fmt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr(f"CAST(SUM(event_id % {_MOD}) % {_MOD} AS BIGINT)").alias(
            "id_checksum"
        ),
        F.count_distinct("event_type").cast("bigint").alias("n_types"),
    )
