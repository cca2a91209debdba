"""[EXT] Hybrid retrieval with reciprocal-rank fusion — the
two-ranker RAG front-end (keyword recall ∪ semantic recall → RRF).

`search_semantic_docs` is the dense tier; production retrieval runs
a sparse keyword tier beside it and fuses ranks, because the two
fail differently (lexical match vs embedding neighborhood). RRF
(Cormack et al. 2009) is the standard no-tuning fusion:
score(d) = Σ_rankers 1/(K + rank_r(d)), K = 60.

Determinism: ranks are integers from ROW_NUMBER with total
tiebreaks; the fused score is a FIXED-ORDER two-term expression
(coalesce(1/(K+rk),0) + coalesce(1/(K+rs),0)) — two IEEE divisions
and one addition on identical inputs, bit-identical in any engine —
then integer-scaled for the checked output.

The rankers:
- keyword: shared-distinct-token count between query doc and
  candidate, computed via the INVERTED INDEX shape — explode query
  tokens, equi-join the token→doc postings, groupBy(query, doc) —
  never a text×text cross join; top-20 per query kept;
- semantic: the exact cosine tier over a broadcast query set (same
  expression as search_semantic_docs; swap in IVF/PQ for the
  approximate tier at scale); top-20 per query kept.

Fusion joins two (query, doc, rank) lists of ≤20 rows per query —
trivially broadcastable; text hydration never touches the rankers.

Scale posture: the keyword side is one postings equi-join (token
key, bounded by document frequency — cap hot tokens via max-df
filtering, here df ≤ half the corpus); the dense side inherits the
similarity family's broadcast-bounded design. The fused output is
rank-k per query.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from .ext_similarity import _SQL_COSINE, _dot_unrolled, _norm

_K_RRF = 60
_PER_RANKER = 20
_TOPK = 3
# drop tokens appearing in more than half the docs (stopword guard —
# and the df cap that bounds the postings join at scale)
_MAX_DF_DIV = 2

_HYBRID_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 100 = 0
),
toks AS (
  SELECT DISTINCT d.doc_id, t.tok
  FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(tok)
  WHERE t.tok <> ''
),
df AS (
  SELECT tok FROM toks GROUP BY tok
  HAVING COUNT(*) * {_MAX_DF_DIV} <= (SELECT COUNT(*) FROM documents)
),
postings AS (SELECT t.tok, t.doc_id FROM toks t JOIN df USING (tok)),
kw_scored AS (
  SELECT q.query_id, p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM q
  JOIN postings qp ON qp.doc_id = q.query_id
  JOIN postings p ON p.tok = qp.tok AND p.doc_id <> q.query_id
  GROUP BY q.query_id, p.doc_id
),
kw AS (
  SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY n_shared DESC, doc_id
         ) AS BIGINT) AS rk
  FROM kw_scored QUALIFY rk <= {_PER_RANKER}
),
qv AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id % 100 = 0
),
cv AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
sem_scored AS (
  SELECT qv.query_id, cv.vec_id AS doc_id,
         {_SQL_COSINE.format(a="qv.qv", b="cv.cv")} AS sim
  FROM qv JOIN cv ON cv.vec_id <> qv.query_id
),
sem AS (
  SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY sim DESC, doc_id
         ) AS BIGINT) AS rs
  FROM sem_scored QUALIFY rs <= {_PER_RANKER}
),
fused AS (
  SELECT COALESCE(kw.query_id, sem.query_id) AS query_id,
         COALESCE(kw.doc_id, sem.doc_id) AS doc_id,
         kw.rk, sem.rs,
         COALESCE(1.0 / ({_K_RRF} + kw.rk), 0.0)
           + COALESCE(1.0 / ({_K_RRF} + sem.rs), 0.0) AS rrf
  FROM kw FULL OUTER JOIN sem
    ON sem.query_id = kw.query_id AND sem.doc_id = kw.doc_id
)
SELECT query_id, doc_id,
       CAST(COALESCE(rk, 0) AS BIGINT) AS kw_rank,
       CAST(COALESCE(rs, 0) AS BIGINT) AS sem_rank,
       CAST(floor(rrf * 1e9) AS BIGINT) AS rrf_e9
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rn
  FROM fused
) WHERE rn <= {_TOPK}
"""


@register("search_hybrid_rrf", _HYBRID_ORACLE)
def search_hybrid_rrf(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()

    toks = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    df_ok = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") * _MAX_DF_DIV <= n_docs)
        .select("tok")
    )
    from ._util import rotate_checkpoint, ser_checkpoint

    # rotated: backs the returned result; next invocation releases it
    postings = rotate_checkpoint(
        "ext_search2.postings", ser_checkpoint(toks.join(df_ok, "tok"))
    )

    q_ids = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 100 == 0)
        .select(F.col("vec_id").alias("query_id"))
    )
    q_postings = postings.join(
        F.broadcast(q_ids), postings.doc_id == q_ids.query_id
    ).select("query_id", "tok")
    kw_scored = (
        postings.join(F.broadcast(q_postings), "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    w_kw = Window.partitionBy("query_id").orderBy(F.desc("n_shared"), "doc_id")
    kw = (
        kw_scored.withColumn("rk", F.row_number().over(w_kw).cast("long"))
        .filter(F.col("rk") <= _PER_RANKER)
        .select("query_id", "doc_id", "rk")
    )

    e = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("nrm", _norm("v"))
    )
    qv = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    # Candidate-side fan-out + narrow pre-window projection (the
    # exact-scorer rules from ext_similarity.py): the semantic ranker
    # was the hybrid's sf1 wall-clock for the same two reasons as
    # search_semantic_docs.
    sem_scored = e.repartition(spark.sparkContext.defaultParallelism).join(
        F.broadcast(qv), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        (_dot_unrolled("qv", "v") / (F.col("qn") * F.col("nrm"))).alias(
            "sim"
        ),
    )
    w_sem = Window.partitionBy("query_id").orderBy(F.desc("sim"), "vec_id")
    sem = (
        sem_scored.withColumn("rs", F.row_number().over(w_sem).cast("long"))
        .filter(F.col("rs") <= _PER_RANKER)
        .select("query_id", F.col("vec_id").alias("doc_id"), "rs")
    )

    fused = kw.join(sem, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        "rk",
        "rs",
        (
            F.coalesce(1.0 / (_K_RRF + F.col("rk")), F.lit(0.0))
            + F.coalesce(1.0 / (_K_RRF + F.col("rs")), F.lit(0.0))
        ).alias("rrf"),
    )
    w_f = Window.partitionBy("query_id").orderBy(F.desc("rrf"), "doc_id")
    return (
        fused.withColumn("rn", F.row_number().over(w_f))
        .filter(F.col("rn") <= _TOPK)
        .select(
            "query_id",
            "doc_id",
            F.coalesce("rk", F.lit(0)).cast("bigint").alias("kw_rank"),
            F.coalesce("rs", F.lit(0)).cast("bigint").alias("sem_rank"),
            F.floor(F.col("rrf") * F.lit(1e9)).cast("bigint").alias("rrf_e9"),
        )
    )
