"""[EXT] Link prediction — common-neighbors scoring over the
co-purchase graph (Liben-Nowell & Kleinberg 2003's strongest simple
baseline): for node pairs NOT currently connected, count shared
neighbors; high counts are the recommended "customers also bought"
edges. Sixth graph-family member (components → ranking → motifs →
communities → peeling → now prediction).

The wedge join IS the candidate generator: every open wedge a–m–b
(enumerated at its middle node, the triangle census's shape with the
closing check inverted) yields a candidate pair; one groupBy counts
common neighbors; an anti-join against the edge list removes pairs
already connected. Never a cross product — candidate volume is
Σ_m deg(m)², the same wedge bound as the census, with the support
threshold as the degree cap.

Output: top-25 predicted links by (common neighbors DESC, pair ASC),
plus each endpoint's degree — exact integers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from .ext_graph3 import _MIN_SUPPORT, copurchase_edges

_TOP = 25

_LINKPRED_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {_MIN_SUPPORT}
),
adj AS (
  SELECT pa AS node, pb AS nbr FROM e
  UNION ALL
  SELECT pb AS node, pa AS nbr FROM e
),
deg AS (SELECT node, COUNT(*) AS deg FROM adj GROUP BY node),
wedges AS (
  SELECT x.nbr AS a, y.nbr AS b, x.node AS mid
  FROM adj x JOIN adj y ON y.node = x.node AND x.nbr < y.nbr
),
cand AS (
  SELECT a, b, COUNT(*) AS common_nbrs
  FROM wedges w
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = w.a AND e.pb = w.b)
  GROUP BY a, b
)
SELECT c.a AS part_a, c.b AS part_b,
       CAST(c.common_nbrs AS BIGINT) AS common_nbrs,
       CAST(da.deg AS BIGINT) AS deg_a,
       CAST(db.deg AS BIGINT) AS deg_b
FROM cand c
JOIN deg da ON da.node = c.a
JOIN deg db ON db.node = c.b
ORDER BY c.common_nbrs DESC, c.a ASC, c.b ASC
LIMIT {_TOP}
"""


@register("graph_link_prediction", _LINKPRED_ORACLE)
def graph_link_prediction(spark, sf_dir):
    edges = copurchase_edges(spark, sf_dir)
    adj = edges.select(
        F.col("pa").alias("node"), F.col("pb").alias("nbr")
    ).unionByName(
        edges.select(F.col("pb").alias("node"), F.col("pa").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    x = adj.select(F.col("node").alias("mid"), F.col("nbr").alias("a"))
    y = adj.select(F.col("node").alias("mid"), F.col("nbr").alias("b"))
    wedges = x.join(y, "mid").filter(F.col("a") < F.col("b"))
    cand = (
        wedges.join(
            edges.select(
                F.col("pa").alias("a"), F.col("pb").alias("b")
            ),
            ["a", "b"],
            "left_anti",
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common_nbrs"))
    )
    scored = (
        cand.join(
            deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a")),
            "a",
        )
        .join(
            deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b")),
            "b",
        )
        .select(
            F.col("a").alias("part_a"),
            F.col("b").alias("part_b"),
            F.col("common_nbrs").cast("bigint").alias("common_nbrs"),
            F.col("deg_a").cast("bigint").alias("deg_a"),
            F.col("deg_b").cast("bigint").alias("deg_b"),
        )
    )
    return scored.orderBy(
        F.desc("common_nbrs"), F.asc("part_a"), F.asc("part_b")
    ).limit(_TOP)
