"""[EXT] ML pipeline metrics, part 6: retrieval evaluation (MRR /
hit@k) and robust feature scaling — the measurement and normalization
ops around an embedding-based retrieval/dedup stack.

``ml_eval_retrieval_mrr``: for every held-out query vector
(vec_id % 100 == 0), rank the whole corpus by exact cosine (the
hash-green brute-force scorer of ext_similarity.py — identical
left-associated double arithmetic in both engines) and find the rank
of the first SAME-LABEL neighbor. Reported per query label as exact
integers: query count, hits@5, truncated mean reciprocal rank in ppm
(sum of 1e6 DIV rank, then DIV n — fully integer, so the hash is
stable), and truncated mean first-hit rank in milli-units. This is
the recall/MRR measurement a retrieval index is graded with, as a
first-class query instead of a test-only assertion.

``ml_feature_robust_scaler``: per embedding dimension over milli-unit
integer codes: discrete quartiles (percentile_disc — SELECTS an
existing code, so casting Spark's DOUBLE return back to BIGINT is
exact), IQR, and the Tukey outlier count at 1.5*IQR computed in
doubled integers (2*c < 2*p25 - 3*iqr) to avoid the fractional
bound. The median/IQR table is what a robust scaler persists to
normalize features without being dragged by outliers.

Scale posture: the eval set is the bounded side (eval corpora are
thousands of queries, not billions) — corpus x query-set broadcast
join, ranking windows partition by query_id. The scaler is one
posexplode pass + a 64-key ordered-set aggregate + one broadcast-back
join for the outlier count — O(dims) state, two corpus passes.

Reference anchor: none ([EXT] per SURVEY.md §2 — similarity-search /
data-quality families).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from .ext_similarity import _SQL_COSINE, _dot_unrolled, _norm

_K = 5


def _sq_sum(col: str):
    """Squared norm as a compact fold — the ZERO-NORM GUARD expression.

    Why not ``_norm(col) > 0`` (the unrolled 64-term tree): a Filter
    predicate is pushed into the scan stage by substituting the alias,
    so the giant unrolled expression lands in the generated code
    twice over — measured ~17 s of Janino COMPILE time for the scan
    stage at every fresh plan (bench/harness runs construct the plan
    per iteration, so this is paid per run; the query itself went
    7.7 s → 26 s warm at sf1 before this was caught). ``F.aggregate``
    generates a loop instead of an inlined tree: compile time is back
    to normal and the guard costs one 64-iteration fold per ROW (not
    per pair).

    Semantics match the oracle's ``list_dot_product(v, v) > 0``
    exactly, NaN included (a NaN element → NaN sum → ``NaN > 0`` is
    false in both engines → dropped). The guard exists because sim is
    NaN for a zero-norm vector, and NaN ordering is where the
    two-aggregate rank rewrite diverges from the old row_number form
    (DESC sort ranks NaN first; min(struct) avoids NaN and the
    strictly-ahead count treats NaN rows as behind) — excluding
    un-normalizable vectors makes the metric well-defined and the
    rewrite exact."""
    return F.aggregate(
        F.col(col), F.lit(0.0), lambda acc, x: acc + x * x
    )

_MRR_ORACLE = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
           WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM e
      WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.query_id, q.qlabel, c.vec_id AS neighbor_id, c.label AS nlabel,
         {_SQL_COSINE.format(a="q.qv", b="c.v")} AS sim
  FROM q JOIN e c ON c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, qlabel, nlabel,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS BIGINT)
           AS rank
  FROM scored
),
firsts AS (
  SELECT query_id, qlabel, CAST(MIN(rank) AS BIGINT) AS first_rank
  FROM ranked WHERE nlabel = qlabel
  GROUP BY query_id, qlabel
)
SELECT qlabel AS label,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(CASE WHEN first_rank <= {_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS hits_at_{_K},
       CAST(SUM(1000000 // first_rank) // COUNT(*) AS BIGINT) AS mrr_ppm,
       CAST(SUM(first_rank * 1000) // COUNT(*) AS BIGINT) AS mean_rank_milli
FROM firsts
GROUP BY qlabel
"""


@register("ml_eval_retrieval_mrr", _MRR_ORACLE)
def ml_eval_retrieval_mrr(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.col("vec_id") % 100 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("qlabel"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
        .withColumn("qn", _norm("qv"))
        .filter(_sq_sum("qv") > 0)
    )
    # Candidate-side fan-out + narrow pre-window projection (the
    # exact-scorer rules from ext_similarity.py); the norm
    # materializes BEFORE the exchange so the BNLJ's output project
    # stays inside codegen (see similarity_topk_bruteforce).
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("nlabel"),
        F.col("embedding").cast("array<double>").alias("cv"),
    ).withColumn("cn", _norm("cv")).filter(_sq_sum("cv") > 0).repartition(
        spark.sparkContext.defaultParallelism
    )
    scored = c.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "qlabel",
        "neighbor_id",
        "nlabel",
        (_dot_unrolled("qv", "cv") / (F.col("qn") * F.col("cn"))).alias(
            "sim"
        ),
    )
    # first_rank WITHOUT the rank window: the window form shuffles and
    # sorts every scored pair (Q×N rows — 40M at sf1, 2 GB exchange;
    # the r10 sweep measured 16.5 s / 21.7x per decade). The metric
    # only needs the rank OF the best same-label candidate, which is
    # 1 + |{candidates strictly ahead of it in (sim DESC, neighbor_id)
    # order}| — two map-side-combinable aggregations over the scored
    # stream, no sort, no wide exchange. The scorer join runs twice
    # (Catalyst re-executes per consumer), but 2x the dot FLOPs is
    # cheap next to sorting Q×N rows, and at 100x scale the sort is
    # the one that dies first. Tie semantics are the window's exactly:
    # struct(-sim, neighbor_id) ascending == ORDER BY sim DESC,
    # neighbor_id (IEEE negation is exact; sim is never -0.0 here —
    # the left-assoc dot starts at +0.0 and x+(-0.0)==x).
    best = (
        scored.filter(F.col("nlabel") == F.col("qlabel"))
        .groupBy("query_id", "qlabel")
        .agg(
            F.min(
                F.struct(
                    (-F.col("sim")).alias("neg_sim"),
                    F.col("neighbor_id").alias("nid"),
                )
            ).alias("b")
        )
        .select(
            "query_id",
            "qlabel",
            F.col("b.neg_sim").alias("neg_star"),
            F.col("b.nid").alias("id_star"),
        )
    )
    firsts = (
        scored.select("query_id", "sim", "neighbor_id")
        .join(F.broadcast(best), "query_id")
        .groupBy("query_id", "qlabel")
        .agg(
            (
                F.sum(
                    F.when(
                        F.struct(
                            (-F.col("sim")).alias("neg_sim"),
                            F.col("neighbor_id").alias("nid"),
                        )
                        < F.struct(
                            F.col("neg_star").alias("neg_sim"),
                            F.col("id_star").alias("nid"),
                        ),
                        1,
                    ).otherwise(0)
                )
                + 1
            ).alias("first_rank")
        )
    )
    return firsts.groupBy(F.col("qlabel").alias("label")).agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(F.when(F.col("first_rank") <= _K, 1).otherwise(0)).alias(
            f"hits_at_{_K}"
        ),
        F.expr("CAST(SUM(1000000 DIV first_rank) DIV COUNT(*) AS BIGINT)").alias(
            "mrr_ppm"
        ),
        F.expr("CAST(SUM(first_rank * 1000) DIV COUNT(*) AS BIGINT)").alias(
            "mean_rank_milli"
        ),
    )


_SCALER_ORACLE = """
WITH codes AS (
  SELECT CAST(i.i AS INT) AS dim,
         CAST(floor(CAST(embedding[i.i + 1] AS DOUBLE) * 1000.0 + 0.5)
              AS BIGINT) AS c
  FROM embeddings, UNNEST(range(64)) AS i(i)
),
quart AS (
  SELECT dim,
         CAST(quantile_disc(c, 0.25) AS BIGINT) AS p25,
         CAST(quantile_disc(c, 0.50) AS BIGINT) AS p50,
         CAST(quantile_disc(c, 0.75) AS BIGINT) AS p75
  FROM codes GROUP BY dim
)
SELECT q.dim, q.p25, q.p50, q.p75,
       q.p75 - q.p25 AS iqr,
       CAST(SUM(CASE WHEN 2 * c.c < 2 * q.p25 - 3 * (q.p75 - q.p25)
                       OR 2 * c.c > 2 * q.p75 + 3 * (q.p75 - q.p25)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM codes c JOIN quart q ON q.dim = c.dim
GROUP BY q.dim, q.p25, q.p50, q.p75
"""


@register("ml_feature_robust_scaler", _SCALER_ORACLE)
def ml_feature_robust_scaler(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    codes = e.select(
        F.posexplode(
            F.expr(
                "transform(embedding, x -> "
                "CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))"
            )
        ).alias("dim", "c")
    )
    # percentile_disc SELECTS an existing integer code; Spark returns
    # DOUBLE — cast back to BIGINT, exact (SCALE.md percentile trap).
    quart = codes.groupBy("dim").agg(
        F.expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY c) AS BIGINT)")
        .alias("p25"),
        F.expr("CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY c) AS BIGINT)")
        .alias("p50"),
        F.expr("CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY c) AS BIGINT)")
        .alias("p75"),
    )
    return (
        codes.join(F.broadcast(quart), "dim")
        .groupBy("dim", "p25", "p50", "p75")
        .agg(
            F.sum(
                F.when(
                    (2 * F.col("c") < 2 * F.col("p25") - 3 * (F.col("p75") - F.col("p25")))
                    | (2 * F.col("c") > 2 * F.col("p75") + 3 * (F.col("p75") - F.col("p25"))),
                    1,
                ).otherwise(0)
            ).alias("n_outliers")
        )
        .select(
            F.col("dim").cast("int").alias("dim"),
            "p25",
            "p50",
            "p75",
            (F.col("p75") - F.col("p25")).alias("iqr"),
            "n_outliers",
        )
    )
