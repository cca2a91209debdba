"""[EXT] Training-data batch: group-aware splits and ANN hard-negative
mining — the two selection ops contrastive/pretraining pipelines run
after dedup and before packing.

`split_group_aware`: train/val/test split keyed on the GROUP (source),
not the row — the leakage guard: documents from one source can never
straddle splits, so eval never sees train-adjacent material. The
split decision is a 48-bit md5 fingerprint of the source name
(`ext_dedup`'s public fingerprint idiom — no engine hash family)
reduced mod 10 → 8/1/1. One map-side-combined groupBy; the split of
a group is a pure function of its name, so adding a shard of new
data never reshuffles existing assignments.

`training_hard_negatives`: for each query vector, the top-3 most
similar corpus vectors with a DIFFERENT label — the classic hard
negatives for contrastive training (high-similarity, wrong class).
Same broadcast-query exact-scoring skeleton as
`similarity_topk_bruteforce` (unrolled JVM dot, fixed-order IEEE,
floor-scaled sim) with the label-mismatch predicate in the join; at
corpus scale the exact scorer swaps for the IVF/PQ tiers exactly as
in `search_semantic_docs_pq`.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from .ext_similarity import _dot_unrolled, _norm, _SQL_COSINE

_SPLIT_ORACLE = """
WITH g AS (
  SELECT source, lang, n_chars,
         CAST(concat('0x', substr(md5(source), 1, 12)) AS BIGINT) % 10
           AS bucket
  FROM documents
),
s AS (
  SELECT CASE WHEN bucket < 8 THEN 'train'
              WHEN bucket = 8 THEN 'val'
              ELSE 'test' END AS split,
         source, n_chars
  FROM g
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY split
"""


@register("split_group_aware", _SPLIT_ORACLE)
def split_group_aware(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5("source"), 1, 12), 16, 10).cast("bigint")
        % 10
    )
    s = docs.select(
        F.when(bucket < 8, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
        "source",
        "n_chars",
    )
    return s.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


_HARDNEG_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS query_label,
         embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id % 100 = 0
),
c AS (SELECT vec_id, label, embedding::DOUBLE[] AS cv FROM embeddings),
scored AS (
  SELECT q.query_id, q.query_label,
         c.vec_id AS negative_id, c.label AS negative_label,
         {_SQL_COSINE.format(a="q.qv", b="c.cv")} AS sim
  FROM q JOIN c ON c.label <> q.query_label
),
ranked AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY sim DESC, negative_id
    ) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, query_label, negative_id, negative_label, rank,
       CAST(floor(sim * 1e6) AS BIGINT) AS sim_e6
FROM ranked WHERE rank <= 3
"""


@register("training_hard_negatives", _HARDNEG_ORACLE)
def training_hard_negatives(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.col("vec_id") % 100 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("query_label"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
        .withColumn("qn", _norm("qv"))
    )
    # Same candidate-side fan-out as similarity_topk_bruteforce: splits
    # are bytes-sized, but each candidate row pays |Q| dots, so the
    # scorer must be spread over cores explicitly (sf1 measured the
    # whole Q×N scorer on one 15 MB split's single task). The norm
    # materializes BEFORE the exchange — attached after it, the
    # nested-loop join re-evaluates it per OUTPUT row and the widened
    # project falls out of codegen (see similarity_topk_bruteforce).
    c = e.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        F.col("embedding").cast("array<double>").alias("cv"),
    ).withColumn("cn", _norm("cv")).repartition(
        spark.sparkContext.defaultParallelism
    )
    # Narrow projection before the rank window (same fix as
    # similarity_topk_bruteforce): without it every scored row drags
    # both 64-double vectors through the window's hash exchange.
    scored = c.join(
        F.broadcast(q), F.col("negative_label") != F.col("query_label")
    ).select(
        "query_id",
        "query_label",
        "negative_id",
        "negative_label",
        (_dot_unrolled("qv", "cv") / (F.col("qn") * F.col("cn"))).alias(
            "sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("negative_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id",
            "query_label",
            "negative_id",
            "negative_label",
            "rank",
            F.floor(F.col("sim") * F.lit(1e6)).cast("bigint").alias("sim_e6"),
        )
    )


# --------------------------------------------------------------------------
# The 100 TB path of the miner above, as a REGISTERED query with its
# own driver row (round-9 verdict item 6): candidate generation swaps
# the exact Q×N scorer for the IVF index — each query scores only the
# corpus vectors in its 2 nearest cells (equi-join on cell id, never a
# cross join), the label-mismatch predicate rides the same join. The
# index is the deterministic seeded-centroid IVF from ext_similarity
# (session artifact, shared with similarity_ivf_cells), which is fully
# derivable in SQL — so unlike most ANN paths this one is HASH-checked
# end-to-end, not just recall-bounded: the DuckDB oracle mirrors the
# quantization, the probe, and the ranking exactly. Recall vs the
# exact tier is additionally asserted in
# tests/test_dedup_similarity.py (planted structure: a query's own
# cell contains its high-sim neighborhood by construction).
# --------------------------------------------------------------------------

_HARDNEG_IVF_ORACLE = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id % 251 = 0),
assigned AS (
  SELECT vec_id, label, v, cent_id,
    ROW_NUMBER() OVER (
      PARTITION BY vec_id
      ORDER BY {_SQL_COSINE.format(a="v", b="cv")} DESC, cent_id
    ) AS cent_rank
  FROM e CROSS JOIN cent
),
cells AS (SELECT vec_id, label, v, cent_id FROM assigned WHERE cent_rank = 1),
q AS (
  SELECT vec_id AS query_id, label AS query_label, v AS qv,
         cent_id AS qcell
  FROM assigned WHERE vec_id % 100 = 0 AND cent_rank <= 2
),
scored AS (
  SELECT q.query_id, q.query_label,
         c.vec_id AS negative_id, c.label AS negative_label,
         {_SQL_COSINE.format(a="q.qv", b="c.v")} AS sim
  FROM q JOIN cells c
    ON c.cent_id = q.qcell AND c.label <> q.query_label
),
ranked AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY sim DESC, negative_id
    ) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, query_label, negative_id, negative_label, rank,
       CAST(floor(sim * 1e6) AS BIGINT) AS sim_e6
FROM ranked WHERE rank <= 3
"""


@register("training_hard_negatives_ivf", _HARDNEG_IVF_ORACLE)
def training_hard_negatives_ivf(spark, sf_dir):
    from .ext_similarity import _IVF_NPROBE, ivf_assignments

    assigned = ivf_assignments(spark, sf_dir)
    cells = assigned.filter(F.col("cent_rank") == 1).drop("cent_rank")
    q = assigned.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("cent_rank") <= _IVF_NPROBE)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("cent_id").alias("qcell"),
    )
    # Cells are disjoint, so each (query, candidate) pair appears at
    # most once across the 2 probes; the label-mismatch predicate
    # subsumes the self-exclusion (a vector never mismatches its own
    # label).
    scored = cells.join(
        F.broadcast(q),
        (F.col("cent_id") == F.col("qcell"))
        & (F.col("label") != F.col("query_label")),
    ).select(
        "query_id",
        "query_label",
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        (_dot_unrolled("qv", "v") / (F.col("qn") * F.col("nrm"))).alias(
            "sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("negative_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id",
            "query_label",
            "negative_id",
            "negative_label",
            "rank",
            F.floor(F.col("sim") * F.lit(1e6)).cast("bigint").alias("sim_e6"),
        )
    )
