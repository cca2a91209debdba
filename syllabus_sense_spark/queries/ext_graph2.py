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
    # Session-persisted graph snapshot: the distinct (cust, supp)
    # trade pairs feed four consumers (two degree aggs + both edge
    # directions) within the query AND repeated ranking runs in one
    # session — materialized once per (app, sf) like the fingerprint
    # artifacts, probed thereafter.
    from .ext_dedup import session_artifact

    def _build_edges():
        orders = load(spark, sf_dir, "orders")
        lineitem = load(spark, sf_dir, "lineitem")
        return (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .select(
                F.col("o_custkey").alias("cust"),
                F.col("l_suppkey").alias("supp"),
            )
            .distinct()
            .localCheckpoint()
        )

    edges = session_artifact(
        spark, sf_dir, "trade_edges", _build_edges, persist=False
    )
    # Out-degrees come from the *directed* edge list (the undirected
    # doubling makes node out-degree = its edge count on either side):
    # two per-node-count aggregates, each ≪ edges, broadcast back onto
    # the edge list — so the degree attachment is map-side, never a
    # shuffle join of the doubled edge table against itself. (At
    # web-graph scale where even the node table outgrows broadcast,
    # drop the hints: the joins fall back to a shuffle on the same
    # keys and nothing else changes.)
    cdeg = edges.groupBy("cust").agg(F.count(F.lit(1)).alias("od"))
    sdeg = edges.groupBy("supp").agg(F.count(F.lit(1)).alias("od"))
    fwd = edges.join(F.broadcast(cdeg), "cust").select(
        F.col("cust").alias("src"),
        (F.col("supp") + _SUPP_OFFSET).alias("dst"),
        "od",
    )
    rev = edges.join(F.broadcast(sdeg), "supp").select(
        (F.col("supp") + _SUPP_OFFSET).alias("src"),
        F.col("cust").alias("dst"),
        "od",
    )
    # Edge list with the sender's out-degree attached. Left lazy on
    # purpose: it appears once per iteration in the DAG, but its
    # upstream is the *checkpointed* edge table plus two broadcast
    # joins — re-deriving it per iteration is map-side-only work,
    # cheaper than materializing a second 2|E|-row checkpoint.
    e2 = fwd.unionByName(rev)
    ranks = cdeg.select(F.col("cust").alias("node")).unionByName(
        sdeg.select((F.col("supp") + _SUPP_OFFSET).alias("node"))
    ).withColumn("r", F.lit(1_000_000).cast("long"))
    # The iteration chain stays LAZY: rank(k) feeds rank(k+1) as a
    # linear plan (no recomputation), so the whole fixed-point runs as
    # one pipelined job — one shuffle per iteration (the groupBy), and
    # the rank side enters each join as a broadcast (one row per node,
    # ≪ edges; at web-graph scale drop the hint and AQE falls back to
    # a shuffle join on the same keys). For convergence-style loops of
    # unknown depth, per-iteration localCheckpoint + a changed-count
    # action is the posture (see ext_graph.connected_components);
    # a fixed 3-step unroll doesn't need it.
    for _ in range(_ITER):
        ranks = (
            e2.join(F.broadcast(ranks), e2.src == ranks.node)
            .select("dst", F.expr("(r * 17) DIV (20 * od)").alias("share"))
            .groupBy("dst")
            .agg((F.lit(150_000) + F.sum("share")).alias("r"))
            .select(F.col("dst").alias("node"), F.col("r"))
        )
    return ranks.select("node", F.col("r").alias("rank_micro"))
