"""[DQ] Join-key skew diagnostics — the pre-flight check a 100 TB
join runs before choosing a strategy (AQE skew split, salting, or
broadcast): the per-key row-count distribution, folded into log2
histogram buckets.

A key with 2^20 rows in a shuffle join means one task gets 2^20
rows — this profile is how you *see* that before paying for it. The
repo's salted-join operator (operators/skew.py) is the cure; this is
the diagnosis, over both fact-table join keys the engine actually
shuffles on (lineitem.l_orderkey, events.user_id).

floor(log2(cnt)) is computed as ``length(bin(cnt)) - 1`` — exact
integer arithmetic on the binary representation, because float
``log2`` is not guaranteed correctly rounded and flips the bucket at
exact powers of two (log(8)/log(2) = 2.9999…96 in a log-ratio
implementation). Everything BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..tables import load
from . import register

_SKEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey
),
ev AS (
  SELECT user_id AS key, COUNT(*) AS cnt FROM events GROUP BY user_id
),
keyed AS (
  SELECT 'lineitem.l_orderkey' AS rel, CAST(length(bin(cnt)) - 1 AS BIGINT)
           AS bucket_log2, cnt
  FROM li
  UNION ALL
  SELECT 'events.user_id', CAST(length(bin(cnt)) - 1 AS BIGINT), cnt
  FROM ev
)
SELECT rel, bucket_log2,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(MAX(cnt) AS BIGINT) AS max_rows_per_key
FROM keyed GROUP BY rel, bucket_log2
"""


def _profile(df: DataFrame, key: str, rel: str) -> DataFrame:
    counts = df.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.select(
        F.lit(rel).alias("rel"),
        (F.length(F.bin("cnt")) - 1).cast("long").alias("bucket_log2"),
        "cnt",
    )


@register("dq_join_skew_profile", _SKEW_ORACLE)
def dq_join_skew_profile(spark, sf_dir):
    li = _profile(
        load(spark, sf_dir, "lineitem"), "l_orderkey", "lineitem.l_orderkey"
    )
    ev = _profile(load(spark, sf_dir, "events"), "user_id", "events.user_id")
    return (
        li.unionByName(ev)
        .groupBy("rel", "bucket_log2")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
            F.max("cnt").alias("max_rows_per_key"),
        )
    )
