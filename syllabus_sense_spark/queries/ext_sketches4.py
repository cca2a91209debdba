"""[EXT] KMV set-operation estimates — the theta-sketch trick on top
of `sketch_kmv_distinct`: from two bottom-k sketches alone (128
BIGINTs), estimate |A∪B| and |A∩B| without re-touching the data.

Method (Beyer et al. 2007 / theta sketches): the union sketch is the
bottom-k of the merged survivor lists (estimate (k−1)·M / h_(k));
the Jaccard estimate is the fraction of the union sketch's k
survivors present in BOTH input sketches; the intersection estimate
is jaccard_est · union_est — here kept in pure integer arithmetic
(common·est_union DIV k) so both engines agree bit-for-bit. The
exact counts ride along, so the admitted error is data, not an
assertion.

Sets: purchase-users vs view-users — the audience-overlap question
`events_audience_overlap` answers exactly, answered again from
128 integers of mergeable state.
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
_KM = (_K - 1) * _M

_SETOPS_ORACLE = f"""
WITH a AS (
  SELECT DISTINCT {_HASH} AS h FROM events WHERE event_type = 'purchase'
),
b AS (
  SELECT DISTINCT {_HASH} AS h FROM events WHERE event_type = 'view'
),
ka AS (
  SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) rn FROM a)
  WHERE rn <= {_K}
),
kb AS (
  SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) rn FROM b)
  WHERE rn <= {_K}
),
ku AS (
  SELECT h FROM (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) rn
    FROM (SELECT h FROM ka UNION SELECT h FROM kb)
  ) WHERE rn <= {_K}
),
stats AS (
  SELECT
    (SELECT COUNT(*) FROM a) AS n_a_exact,
    (SELECT COUNT(*) FROM b) AS n_b_exact,
    (SELECT COUNT(*) FROM a JOIN b USING (h)) AS n_inter_exact,
    (SELECT COUNT(*) FROM (SELECT h FROM a UNION SELECT h FROM b))
      AS n_union_exact,
    (SELECT COUNT(*) FROM ku) AS k_union,
    (SELECT MAX(h) FROM ku) AS kth_union,
    (SELECT COUNT(*) FROM ku
      WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb))
      AS n_common_sketch
)
SELECT CAST(n_a_exact AS BIGINT) AS n_a_exact,
       CAST(n_b_exact AS BIGINT) AS n_b_exact,
       CAST(n_inter_exact AS BIGINT) AS n_inter_exact,
       CAST(n_union_exact AS BIGINT) AS n_union_exact,
       CAST(CASE WHEN k_union < {_K} THEN k_union
                 ELSE {_KM} // kth_union END AS BIGINT) AS est_union,
       CAST(CASE WHEN k_union < {_K} THEN n_common_sketch
                 ELSE n_common_sketch * ({_KM} // kth_union) // k_union
            END AS BIGINT) AS est_inter
FROM stats
"""


@register("sketch_kmv_set_ops", _SETOPS_ORACLE)
def sketch_kmv_set_ops(spark, sf_dir):
    e = load(spark, sf_dir, "events")

    def sketch(tp):
        s = (
            e.filter(F.col("event_type") == tp)
            .select(F.expr(_HASH).alias("h"))
            .distinct()
        )
        w = Window.orderBy("h")
        return s, s.select(
            "h", F.row_number().over(w).alias("rn")
        ).filter(F.col("rn") <= _K).select("h")

    a, ka = sketch("purchase")
    b, kb = sketch("view")
    union_sketch_in = ka.unionByName(kb).distinct()
    ku = (
        union_sketch_in.select(
            "h", F.row_number().over(Window.orderBy("h")).alias("rn")
        )
        .filter(F.col("rn") <= _K)
        .select("h")
    )
    common = ku.join(ka, "h", "left_semi").join(kb, "h", "left_semi")
    stats = (
        a.agg(F.count(F.lit(1)).alias("n_a_exact"))
        .join(b.agg(F.count(F.lit(1)).alias("n_b_exact")))
        .join(a.join(b, "h").agg(F.count(F.lit(1)).alias("n_inter_exact")))
        .join(
            a.unionByName(b)
            .distinct()
            .agg(F.count(F.lit(1)).alias("n_union_exact"))
        )
        .join(
            ku.agg(
                F.count(F.lit(1)).alias("k_union"),
                F.max("h").alias("kth_union"),
            )
        )
        .join(common.agg(F.count(F.lit(1)).alias("n_common_sketch")))
    )
    return stats.select(
        F.col("n_a_exact").cast("bigint").alias("n_a_exact"),
        F.col("n_b_exact").cast("bigint").alias("n_b_exact"),
        F.col("n_inter_exact").cast("bigint").alias("n_inter_exact"),
        F.col("n_union_exact").cast("bigint").alias("n_union_exact"),
        F.when(F.col("k_union") < _K, F.col("k_union"))
        .otherwise(F.expr(f"{_KM} DIV kth_union"))
        .cast("bigint")
        .alias("est_union"),
        F.when(F.col("k_union") < _K, F.col("n_common_sketch"))
        .otherwise(
            F.expr(f"n_common_sketch * ({_KM} DIV kth_union) DIV k_union")
        )
        .cast("bigint")
        .alias("est_inter"),
    )
