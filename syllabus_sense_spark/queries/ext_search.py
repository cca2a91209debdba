"""[EXT] End-to-end semantic document retrieval — the RAG query: a
query vector finds its nearest documents AND returns their text, i.e.
the embeddings index joined back to the corpus store.

Shape at scale: candidate scoring is the ANN problem (here the exact
cosine baseline over a broadcast query set — swap in the IVF/PQ paths
from ext_similarity/operators.pq for the approximate tier); the final
hydration join fetches full text for only `k` hits per query — a
broadcast of the (tiny) hit list against the corpus, never a shuffle
of the text column through the scoring stage. Keeping text OUT of the
scoring dataflow is the point: at 100 TB the index (ids + vectors) and
the store (ids + text) are separate scans, and only hit ids bridge
them.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from .ext_similarity import _SQL_COSINE, _dot_unrolled, _norm

_SEARCH_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id % 100 = 0
),
c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
scored AS (
  SELECT q.query_id, c.vec_id AS doc_id,
         {_SQL_COSINE.format(a="q.qv", b="c.cv")} AS sim
  FROM q JOIN c ON c.vec_id <> q.query_id
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY sim DESC, doc_id) AS BIGINT) AS rank
  FROM scored
)
SELECT r.query_id, r.doc_id, r.rank,
       CAST(floor(r.sim * 1e6) AS BIGINT) AS sim_e6,
       d.source, substr(d.text, 1, 40) AS snippet
FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
WHERE r.rank <= 3
"""


@register("search_semantic_docs", _SEARCH_ORACLE)
def search_semantic_docs(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nrm", _norm("v"))
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    # Candidate-side fan-out + narrow pre-window projection — the two
    # exact-scorer rules from ext_similarity.py (bytes-sized splits
    # under-parallelize the Q×N dot fan-out; the rank window must not
    # drag the 64-double vectors through its exchange).
    scored = e.repartition(spark.sparkContext.defaultParallelism).join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        (_dot_unrolled("qv", "v") / (F.col("qn") * F.col("nrm"))).alias(
            "sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    hits = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("query_id", F.col("vec_id").alias("doc_id"), "rank", "sim")
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.substring("text", 1, 40).alias("snippet")
    )
    return (
        F.broadcast(hits)
        .join(docs, "doc_id")
        .select(
            "query_id",
            "doc_id",
            "rank",
            F.floor(F.col("sim") * F.lit(1e6)).cast("bigint").alias("sim_e6"),
            "source",
            "snippet",
        )
    )


