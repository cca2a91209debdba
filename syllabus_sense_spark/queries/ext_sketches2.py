"""[EXT] Count-Min sketch heavy hitters — mergeable frequency
estimation with engine-independent hashes.

Completes the sketch family: HLL/KLL (ext_sketches.py) are rows-only
because they ride engine-specific hash families; this one is FULLY
oracle-checked because the sketch hashes are our own fixed
multiply-mod functions, h_i(x) = ((a_i·x + b_i) mod p) mod w with
p = 2^31−1 — the classic pairwise-independent CM construction
(Cormode & Muthukrishnan 2005), exact BIGINT arithmetic in any
engine.

Shape:
1. exact per-key counts (one map-side-combined groupBy) — at 100 TB
   this partial-agg step is what a per-partition sketch build does;
2. the sketch: d=4 rows × w=512 buckets, cell(i, b) = Σ counts of
   keys hashing to b under h_i — built as one union'd groupBy, at
   most d·w = 2048 cells regardless of data size (the "store small,
   merge later" property; cells from different partitions/days add);
3. the check: for the true top-20 keys (total tiebreak: count DESC,
   key ASC), estimate = min_i cell(i, h_i(key)) via a broadcast join
   of the 2048-cell sketch onto the 80 probe rows.

Output (key, true count, CM estimate) makes the CM guarantee
auditable: est ≥ true always (law-tested), and the overestimate is
the collision mass the 512-bucket width admits.

Scale posture: nothing in the plan is larger than the key-count
table; the sketch itself is O(d·w) and broadcast. This is the
operator a 100 TB pipeline uses to find hot keys (for salting — see
operators/skew.py) without a full sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_P = 2_147_483_647  # 2^31 - 1, Mersenne prime
_W = 512
_TOPK = 20
# fixed odd multipliers / offsets (any a in [1,p), b in [0,p))
_ROWS = [
    (1_431_655_765, 104_729),
    (2_654_435_761 % _P, 224_737),
    (1_583_420_449, 350_377),
    (1_103_515_245, 479_909),
]


def _bucket_sql(i: int, col: str) -> str:
    a, b = _ROWS[i]
    return f"(({a} * {col} + {b}) % {_P}) % {_W}"


_CM_ORACLE = f"""
WITH cnt AS (
  SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM lineitem GROUP BY l_partkey
),
cells AS (
  {" UNION ALL ".join(
      f"SELECT {i} AS row_i, {_bucket_sql(i, 'key')} AS bucket,"
      f" CAST(SUM(true_cnt) AS BIGINT) AS cell FROM cnt GROUP BY 2"
      for i in range(len(_ROWS))
  )}
),
top AS (
  SELECT key, true_cnt FROM cnt
  ORDER BY true_cnt DESC, key ASC LIMIT {_TOPK}
),
probe AS (
  {" UNION ALL ".join(
      f"SELECT key, true_cnt, {i} AS row_i, {_bucket_sql(i, 'key')} AS bucket"
      f" FROM top"
      for i in range(len(_ROWS))
  )}
)
SELECT p.key AS l_partkey, p.true_cnt,
       CAST(MIN(c.cell) AS BIGINT) AS cm_estimate
FROM probe p JOIN cells c ON c.row_i = p.row_i AND c.bucket = p.bucket
GROUP BY p.key, p.true_cnt
"""


@register("sketch_countmin_heavy_hitters", _CM_ORACLE)
def sketch_countmin_heavy_hitters(spark, sf_dir):
    cnt = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    from ._util import rotate_checkpoint

    # shared by sketch build + top-k probe; rotated — backs the
    # returned result, released by the next invocation
    cnt = rotate_checkpoint(
        "ext_sketches2.countmin.cnt", cnt.localCheckpoint()
    )

    # r15 (guide §2.4): the d sketch rows were a d-way UNION of
    # separate groupBys (d exchanges over the key-count table) and the
    # probe side re-ran the top-k sort once per union branch (d
    # TakeOrdered jobs). Exploding the d (row_i, bucket) pairs per key
    # instead makes the sketch ONE exchange with map-side partial
    # aggregation (≤ d·w cells per task) and the probe ONE top-k pass
    # — identical cell/probe sets, identical oracle.
    bucket_structs = F.array(
        *[
            F.struct(
                F.lit(i).cast("bigint").alias("row_i"),
                F.expr(_bucket_sql(i, "key")).cast("bigint").alias("bucket"),
            )
            for i in range(len(_ROWS))
        ]
    )
    cells = (
        cnt.select("true_cnt", F.explode(bucket_structs).alias("rb"))
        .groupBy(
            F.col("rb.row_i").alias("row_i"),
            F.col("rb.bucket").alias("bucket"),
        )
        .agg(F.sum("true_cnt").alias("cell"))
    )

    top = cnt.orderBy(F.desc("true_cnt"), F.asc("key")).limit(_TOPK)
    probe = top.select(
        "key", "true_cnt", F.explode(bucket_structs).alias("rb")
    ).select(
        "key",
        "true_cnt",
        F.col("rb.row_i").alias("row_i"),
        F.col("rb.bucket").alias("bucket"),
    )

    return (
        probe.join(F.broadcast(cells), ["row_i", "bucket"])
        .groupBy(F.col("key").alias("l_partkey"), "true_cnt")
        .agg(F.min("cell").alias("cm_estimate"))
    )
