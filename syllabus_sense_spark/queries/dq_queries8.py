"""Data-quality part 8: Merkle-style table fingerprint — the
anti-entropy / replica-verification primitive a 100 TB lake needs:
two sides (primary vs replica, pre- vs post-migration) each compute
64 bucket digests locally and compare 64 rows instead of shipping
data.

``dq_table_fingerprint``: every order row is canonicalized to a
delimiter-joined string of its business columns, digested to a 48-bit
integer (md5 prefix — the repo's engine-portable hash, ext_dedup.py's
``_fingerprint``), and folded per bucket (o_orderkey % 64) with
bit_xor + count + sum. XOR is the scale-safe fold (order-independent,
never overflows); the 48-bit sum is kept alongside because XOR alone
is blind to duplicated-row pairs (two copies of a row XOR to 0 —
count and sum both move, so the triple detects every single-row
difference and all duplication patterns). Bucketing by key hash means
the digest table stays 64 rows at any scale and each side computes it
with one map-side-combinable aggregation — no shuffle of row data,
only of 64 partial states.

Exactness: md5 hex is identical across engines; the 48-bit truncation
keeps SUM within BIGINT for up to ~2^15 rows per bucket at test SFs
(and the XOR lane is the scale answer); date canonicalization goes
through CAST(ts AS DATE) -> string, identical in both engines.

Reference anchor: none ([EXT] per SURVEY.md §2 — DQ family).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_N_BUCKETS = 64

_CANON_SQL = (
    "concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),"
    " o_orderstatus,"
    " CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR),"
    " CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderpriority)"
)

_FINGERPRINT_ORACLE = f"""
WITH digests AS (
  SELECT CAST(o_orderkey % {_N_BUCKETS} AS INT) AS bucket,
         CAST(concat('0x', substr(md5({_CANON_SQL}), 1, 12)) AS BIGINT) AS d
  FROM orders
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(d) AS BIGINT) AS xor_digest,
       CAST(SUM(d) AS BIGINT) AS sum_digest
FROM digests
GROUP BY bucket
"""


@register("dq_table_fingerprint", _FINGERPRINT_ORACLE)
def dq_table_fingerprint(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .cast("string"),
        F.col("o_orderdate").cast("date").cast("string"),
        F.col("o_orderpriority"),
    )
    d = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("bigint")
    return (
        o.select(
            (F.col("o_orderkey") % _N_BUCKETS).cast("int").alias("bucket"),
            d.alias("d"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(d)").cast("bigint").alias("xor_digest"),
            F.sum("d").cast("bigint").alias("sum_digest"),
        )
    )
