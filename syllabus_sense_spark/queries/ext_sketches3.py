"""[EXT] KMV (k-minimum-values) distinct-count sketch — the
deterministic, fully oracle-checked member of the cardinality-sketch
family.

`approx_sketches` (HLL/KLL) ride engine-specific hash families and
are rows-only by cause; KMV (Bar-Yossef et al. 2002, the bottom-k
theta-sketch core) needs only A hash — so with the house Knuth
multiplicative hash both engines compute the identical sketch and
the identical estimate, giving the driver a hash-green row for an
APPROXIMATE distinct counter:

- sketch of a set = its k smallest distinct hash values;
- estimate = (k−1)·M / h_(k) (integer division; exact count when the
  set has fewer than k distinct members — the sketch IS the set);
- sketches MERGE by union→bottom-k — the store-small/merge-later
  property: per-day / per-partition sketches of 64 BIGINTs union
  into the global estimate without re-touching the data.

Output: per event_type (and the merged '__all__' row) the exact
distinct-user count, the kept size, the k-th minimum hash, and the
KMV estimate — so the error the k=64 sketch admits is visible in the
checked data rather than asserted away.

Scale posture: one map-side-combined distinct per type (the same
pre-aggregation a per-partition sketch build performs), bottom-k via
a rank window on the (type, hash) table — each type's k survivors
are 64 rows regardless of user count; the merge row unions the
survivors only, never the raw data.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register

_K = 64
_KNUTH = 2_654_435_761
_M = (1 << 31) - 1

_HASH = f"(user_id * {_KNUTH}) % {_M}"
# (k-1)*M precomputed: a bare INT*INT literal product overflows under ANSI
_KM = (_K - 1) * _M

_KMV_ORACLE = f"""
WITH uh AS (
  SELECT DISTINCT event_type, {_HASH} AS h FROM events
),
ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_exact
  FROM uh
),
kept AS (SELECT * FROM ranked WHERE rn <= {_K}),
per_type AS (
  SELECT event_type,
         CAST(MAX(n_exact) AS BIGINT) AS n_exact,
         CAST(COUNT(*) AS BIGINT) AS n_kept,
         CAST(MAX(h) AS BIGINT) AS kth_hash,
         CAST(CASE WHEN MAX(n_exact) < {_K} THEN MAX(n_exact)
                   ELSE {_KM} // MAX(h) END AS BIGINT) AS kmv_estimate
  FROM kept GROUP BY event_type
),
g AS (
  SELECT DISTINCT h FROM kept
),
granked AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM g
),
gkept AS (SELECT * FROM granked WHERE rn <= {_K}),
gexact AS (SELECT CAST(COUNT(DISTINCT {_HASH}) AS BIGINT) AS n FROM events)
SELECT * FROM per_type
UNION ALL
SELECT '__all__' AS event_type,
       (SELECT n FROM gexact) AS n_exact,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MAX(h) AS BIGINT) AS kth_hash,
       CAST(CASE WHEN (SELECT n FROM gexact) < {_K} THEN (SELECT n FROM gexact)
                 ELSE {_KM} // MAX(h) END AS BIGINT) AS kmv_estimate
FROM gkept
"""


@register("sketch_kmv_distinct", _KMV_ORACLE)
def sketch_kmv_distinct(spark, sf_dir):
    uh = (
        load(spark, sf_dir, "events")
        .select("event_type", F.expr(_HASH).alias("h"))
        .distinct()
    )
    w_rank = Window.partitionBy("event_type").orderBy("h")
    w_all = Window.partitionBy("event_type")
    ranked = uh.select(
        "event_type",
        "h",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_exact"),
    )
    from ._util import rotate_checkpoint

    # rotated: backs the returned result; next invocation releases it
    kept = rotate_checkpoint(
        "ext_sketches3.kmv.kept",
        ranked.filter(F.col("rn") <= _K).localCheckpoint(),
    )

    per_type = kept.groupBy("event_type").agg(
        F.max("n_exact").cast("bigint").alias("n_exact"),
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").cast("bigint").alias("kth_hash"),
    ).select(
        "event_type",
        "n_exact",
        "n_kept",
        "kth_hash",
        F.when(F.col("n_exact") < _K, F.col("n_exact"))
        .otherwise(F.expr(f"{_KM} DIV kth_hash"))
        .cast("bigint")
        .alias("kmv_estimate"),
    )

    # merge: union the per-type survivors only (64 rows each), then
    # bottom-k of the union — the sketch-merge path, data untouched
    g = kept.select("h").distinct()
    gkept = (
        g.select("h", F.row_number().over(Window.orderBy("h")).alias("rn"))
        .filter(F.col("rn") <= _K)
    )
    gexact = (
        load(spark, sf_dir, "events")
        .select(F.expr(_HASH).alias("h"))
        .agg(F.countDistinct("h").cast("bigint").alias("n_exact"))
    )
    merged = (
        gkept.agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").cast("bigint").alias("kth_hash"),
        )
        .crossJoin(F.broadcast(gexact))
        .select(
            F.lit("__all__").alias("event_type"),
            "n_exact",
            "n_kept",
            "kth_hash",
            F.when(F.col("n_exact") < _K, F.col("n_exact"))
            .otherwise(F.expr(f"{_KM} DIV kth_hash"))
            .cast("bigint")
            .alias("kmv_estimate"),
        )
    )
    return per_type.unionByName(merged)
