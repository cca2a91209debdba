"""[EXT] Semantic deduplication (SemDeDup-style): near-duplicate
*meaning*, not near-duplicate *text* — embedding-space clusters of
high-cosine vectors collapse to one canonical representative.

Pipeline shape (the published SemDeDup recipe, Spark-first):

1. coarse-quantize every vector to its TWO nearest centroid cells
   (broadcast centroid set, cosine rank ≤ 2 — multi-probe assignment:
   single-probe misses pairs that straddle a cell boundary, which the
   +0.05 perturbation reliably manufactures for near-boundary
   vectors);
2. find intra-cell pairs with cosine >= τ — an equi-join on cell_id
   with a DISTINCT over pairs found in both shared cells; pair search
   cost is 4·n²/n_cells, never corpus-quadratic;
3. connected components over the pair graph (the min-label propagation
   operator from ext_graph.py);
4. keep the minimum vec_id per component.

The harness embeddings are unit-norm near-random (background cosine
< 0.3), so the query deterministically plants near-duplicates —
``v + 0.05`` per coordinate gives cosine ≈ 0.92 against the original —
and must find exactly those groups at τ = 0.9.

Cross-engine exactness: float→double casts are exact, the planted
perturbation is one identical IEEE op, and the dot product is a
left-associated unrolled sum in Spark matching DuckDB's
``list_dot_product`` fold — so the >= τ edge predicate decides
identically in both engines and the component structure is hashable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from .ext_graph import connected_components
from .ext_similarity import _SQL_COSINE, _dot_unrolled, _norm

_TAU = 0.9
_DELTA = 0.05
_PLANT_BASE = 1000000
_CENTROID_PRED = "vec_id % 251 = 0"

_SQL_CORPUS = f"""
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + {_PLANT_BASE} AS vec_id,
         list_transform(embedding::DOUBLE[], x -> x + {_DELTA}) AS v
  FROM embeddings WHERE vec_id % 11 = 0
"""

_SEMDEDUP_ORACLE = f"""
WITH RECURSIVE corpus AS ({_SQL_CORPUS}),
cent AS (
  SELECT vec_id AS cent_id, v AS cv FROM corpus WHERE {_CENTROID_PRED}
),
assigned AS (
  SELECT vec_id, v, cent_id,
    ROW_NUMBER() OVER (
      PARTITION BY vec_id
      ORDER BY {_SQL_COSINE.format(a="v", b="cv")} DESC, cent_id
    ) AS cent_rank
  FROM corpus CROSS JOIN cent
),
cells AS (SELECT vec_id, v, cent_id FROM assigned WHERE cent_rank <= 2),
pairs AS (
  SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM cells a JOIN cells b
    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
  WHERE {_SQL_COSINE.format(a="a.v", b="b.v")} >= {_TAU}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
),
comp AS (SELECT src AS vec_id, MIN(dst) AS component_id FROM reach GROUP BY src)
SELECT
  component_id,
  COUNT(*) AS cluster_size,
  COUNT(CASE WHEN vec_id = component_id THEN 1 END) AS n_kept,
  CAST(COUNT(CASE WHEN vec_id >= {_PLANT_BASE} THEN 1 END) AS BIGINT)
    AS n_planted
FROM comp GROUP BY component_id
"""


def _corpus_vec(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    planted = e.filter(F.col("vec_id") % 11 == 0).select(
        (F.col("vec_id") + _PLANT_BASE).alias("vec_id"),
        F.transform(F.col("v"), lambda x: x + F.lit(_DELTA)).alias("v"),
    )
    return e.unionByName(planted)


@register("dedup_semantic_clusters", _SEMDEDUP_ORACLE)
def dedup_semantic_clusters(spark, sf_dir):
    corpus = _corpus_vec(spark, sf_dir).withColumn("nrm", _norm("v"))
    cent = corpus.filter(F.expr(_CENTROID_PRED)).select(
        F.col("vec_id").alias("cent_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    from pyspark.sql import Window

    sim_to_cent = _dot_unrolled("v", "cv") / (
        F.col("nrm") * F.col("cnrm")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        sim_to_cent.desc(), F.col("cent_id")
    )
    # Checkpointed: the assignment (broadcast cross + per-vector rank
    # window) feeds BOTH sides of the pair self-join — materialize it
    # once instead of recomputing per side.
    cells = (
        corpus.crossJoin(F.broadcast(cent))
        .withColumn("cent_rank", F.row_number().over(w_assign))
        .filter(F.col("cent_rank") <= 2)
        .select("vec_id", "v", "nrm", "cent_id")
        .localCheckpoint()
    )
    a = cells.alias("a")
    b = cells.alias("b")
    # Arrow-batched verify, NOT the unrolled JVM dot: a both-sides
    # similarity predicate would be pushed into the join condition and
    # evaluated via the interpreted Predicate path (~40 s per million
    # candidate pairs at dim 64); the Pandas-UDF predicate provably
    # evaluates after the join in one vectorized operator and is
    # bit-identical (functions/vectors.cosine_sim_arrow).
    from ..functions.vectors import cosine_sim_arrow

    sim = cosine_sim_arrow(
        F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")
    )
    pairs = (
        a.join(
            b,
            (F.col("a.cent_id") == F.col("b.cent_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(sim >= _TAU)
        .select(F.col("a.vec_id").alias("doc_a"), F.col("b.vec_id").alias("doc_b"))
        .distinct()
    )
    comp = connected_components(pairs).select(
        F.col("doc_id").alias("vec_id"), "component_id"
    )
    return comp.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.count(F.when(F.col("vec_id") == F.col("component_id"), 1)).alias("n_kept"),
        F.count(F.when(F.col("vec_id") >= _PLANT_BASE, 1))
        .cast("bigint")
        .alias("n_planted"),
    )


