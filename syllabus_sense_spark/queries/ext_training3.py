"""[EXT] Training ops batch 3: deterministic epoch shuffle into
shards — the "global random order without a global sort" every
training-data pipeline needs.

A training epoch wants each worker to read one shard whose contents
are (a) pseudo-random with respect to source/time ordering, (b) stable
across reruns, and (c) producible without totally ordering 100 TB.
The standard trick: key every document by a seeded hash, route it to
``shard = hash mod n_shards``, and order *within* the shard by the
remaining hash bits. That is one shuffle on the (uniform) shard key
plus per-shard local sorts — no global exchange, no RNG state, and a
different ``seed`` reshuffles every epoch reproducibly.

Cross-engine: the md5→bigint bridge (ext_dedup fingerprint trick)
makes the hash identical in Spark and DuckDB; ordering ties are
impossible because the full 48-bit hash is unique per (seed, doc) at
harness scale and doc_id breaks any residual collision.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register

_N_SHARDS = 8
_SEED = 17

_SHUFFLE_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, source,
         CAST(concat('0x', substr(md5(concat('{_SEED}:', CAST(doc_id AS VARCHAR))),
                                  1, 12)) AS BIGINT) AS h
  FROM documents
)
SELECT
  doc_id,
  source,
  CAST(h % {_N_SHARDS} AS BIGINT) AS shard_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY h % {_N_SHARDS}
                          ORDER BY h, doc_id) AS BIGINT) AS position
FROM keyed
"""


@register("training_shuffle_shards", _SHUFFLE_ORACLE)
def training_shuffle_shards(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{_SEED}:"), F.col("doc_id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h")
    )
    keyed = d.select("doc_id", "source", h)
    w = Window.partitionBy(F.col("h") % _N_SHARDS).orderBy("h", "doc_id")
    return keyed.select(
        "doc_id",
        "source",
        (F.col("h") % _N_SHARDS).cast("bigint").alias("shard_id"),
        F.row_number().over(w).cast("bigint").alias("position"),
    )


