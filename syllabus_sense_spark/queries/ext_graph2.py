"""[EXT] Iterative graph ranking — PageRank over the customer ⇄
supplier trade graph, in exact integer arithmetic.

Companion to the min-label connected components in ext_graph.py: that
one proves convergence-loop plumbing; this one proves *fixed-point
iteration with value redistribution* — the Pregel/GraphX pattern a
curation pipeline uses for domain-authority scoring (rank a source
domain by who links to it, then weight documents by domain rank).

The graph: one undirected edge per distinct (customer, supplier) pair
that traded (orders × lineitem), suppliers offset by +1,000,000 into
a shared node-id space. Three damped iterations (d = 0.85 = 17/20):

    r₀(v)    = 1_000_000                                 (micro-units)
    rₖ₊₁(v) = 150_000 + Σ_{u→v} (rₖ(u) · 17) DIV (20 · outdeg(u))

Everything stays BIGINT: the per-edge share uses *integer* division,
so the result is bit-identical regardless of engine, partitioning, or
summation order — which is what makes an iterative float algorithm
oracle-checkable at all (double-precision PageRank would diverge from
any other engine in the last ulp and never hash-match). The DuckDB
oracle unrolls the same three iterations as chained CTEs.

Scale posture: each iteration is one equi-join (edges ⋈ ranks on src,
both sides partitioned by the join key) plus one groupBy(dst) with
map-side partial sums — the textbook distributed PageRank shape. The
rank table is one row per node (≪ edges); lineage is truncated with
``localCheckpoint`` per iteration so the plan stays flat however many
iterations run. No driver-side state beyond the loop counter.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_SUPP_OFFSET = 1_000_000
_ITER = 3


def _oracle() -> str:
    head = f"""
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
und AS (
  SELECT cust AS src, supp + {_SUPP_OFFSET} AS dst FROM edges
  UNION ALL
  SELECT supp + {_SUPP_OFFSET} AS src, cust AS dst FROM edges
),
deg AS (SELECT src, COUNT(*) AS od FROM und GROUP BY src),
e2 AS (SELECT u.src, u.dst, d.od FROM und u JOIN deg d USING (src)),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg)"""
    steps = []
    for k in range(1, _ITER + 1):
        steps.append(
            f""",
r{k} AS (
  SELECT e2.dst AS node,
         CAST(150000 + SUM((p.r * 17) // (20 * e2.od)) AS BIGINT) AS r
  FROM e2 JOIN r{k - 1} p ON p.node = e2.src
  GROUP BY e2.dst
)"""
        )
    return head + "".join(steps) + f"\nSELECT node, r AS rank_micro FROM r{_ITER}"


@register("graph_pagerank_trade", _oracle())
def graph_pagerank_trade(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_suppkey").alias("supp"),
        )
        .distinct()
    )
    und = edges.select(
        F.col("cust").alias("src"),
        (F.col("supp") + _SUPP_OFFSET).alias("dst"),
    ).unionByName(
        edges.select(
            (F.col("supp") + _SUPP_OFFSET).alias("src"),
            F.col("cust").alias("dst"),
        )
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    # Edge list with the sender's out-degree attached, materialized
    # once — every iteration re-joins against this same table.
    e2 = und.join(deg, "src").localCheckpoint()
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(1_000_000).cast("long").alias("r")
    )
    for _ in range(_ITER):
        ranks = (
            e2.join(ranks, e2.src == ranks.node)
            .select("dst", F.expr("(r * 17) DIV (20 * od)").alias("share"))
            .groupBy("dst")
            .agg((F.lit(150_000) + F.sum("share")).alias("r"))
            .select(F.col("dst").alias("node"), F.col("r"))
            .localCheckpoint()
        )
    return ranks.select("node", F.col("r").alias("rank_micro"))
