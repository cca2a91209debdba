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
from ._util import cents

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
        cents("o_totalprice")
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


# ---------------------------------------------------------------------------
# distribution drift between two time slices (total-variation distance)

_DRIFT_SPLIT = "1998-07-01"
_DRIFT_BAND_CENTS = 10_000_000

_DRIFT_ORACLE = f"""
WITH bucketed AS (
  SELECT CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              // {_DRIFT_BAND_CENTS} AS INT) AS band,
         CASE WHEN CAST(o_orderdate AS DATE) < DATE '{_DRIFT_SPLIT}'
              THEN 0 ELSE 1 END AS half
  FROM orders
),
hist AS (
  SELECT band,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_second
  FROM bucketed GROUP BY band
),
tot AS (
  SELECT SUM(n_first) AS t_a, SUM(n_second) AS t_b FROM hist
)
SELECT h.band, h.n_first, h.n_second,
       CAST((abs(h.n_first * tot.t_b - h.n_second * tot.t_a) * 1000000)
            // (2 * tot.t_a * tot.t_b) AS BIGINT) AS drift_ppm
FROM hist h CROSS JOIN tot
"""


@register("dq_histogram_drift_tvd", _DRIFT_ORACLE)
def dq_histogram_drift_tvd(spark, sf_dir):
    """Distribution-drift monitor: total-variation distance between
    the price-band histograms of two time slices, per band, in exact
    cross-multiplied integers (|n_a*T_b - n_b*T_a| avoids the two
    divisions — same SCALE.md rational-comparison recipe as the
    importance scores; summing ``drift_ppm`` gives the truncated TVD).
    This is the scheduled "did the feature distribution move"
    check between a reference window and a fresh ingest — two
    map-side-combined histogram passes plus a 1-row scalar broadcast,
    O(bands) output at any scale (BIGINT holds |n·T| up to ~3e18;
    beyond that the DECIMAL(38,0) lane applies as usual)."""
    o = load(spark, sf_dir, "orders")
    bucketed = o.select(
        F.expr(
            f"CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            f" DIV {_DRIFT_BAND_CENTS} AS INT)"
        ).alias("band"),
        F.when(
            F.col("o_orderdate").cast("date") < F.lit(_DRIFT_SPLIT).cast("date"),
            0,
        )
        .otherwise(1)
        .alias("half"),
    )
    hist = bucketed.groupBy("band").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_first"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_second"),
    )
    tot = hist.agg(
        F.sum("n_first").alias("t_a"), F.sum("n_second").alias("t_b")
    )
    return hist.crossJoin(F.broadcast(tot)).select(
        "band",
        "n_first",
        "n_second",
        F.expr(
            "CAST((abs(n_first * t_b - n_second * t_a) * 1000000)"
            " DIV (2 * t_a * t_b) AS BIGINT)"
        ).alias("drift_ppm"),
    )
