"""[EXT] Deterministic negative sampling — the contrastive-pair
builder (anchor, negatives) an embedding-training job consumes.

Contrastive/triplet training needs, per anchor document, k negatives
drawn from a candidate pool (here: same language — so the negative
is not trivially distinguishable — but a different source, so it is
very unlikely to be a paraphrase). Production samplers must be
RE-RUNNABLE — the same anchors must get the same negatives on retry
or the training set silently shifts — so selection is a rank over a
PAIR hash (Knuth multiplicative over a collision-free pair code),
not engine RNG: deterministic, partitioning-independent, and
different anchors get independent orderings (a single per-candidate
hash would hand every anchor the same negatives).

Output: (anchor_id, rank, neg_id) for k=3 — the exact pair list,
hash-checked.

Scale posture: anchors are a hash-selected slice (broadcast);
candidates join on the language key only; ranking is a top-k window
per anchor (bounded state). The candidate pool is never self-joined
and text never moves — ids, lang, source only.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register

_K_NEG = 3
_KNUTH = 2_654_435_761
_MOD = 1_000_000_007
# pair code: anchor_id * CODE + cand_id (injective while doc_id <
# CODE), reduced mod M BEFORE the Knuth multiply so the product
# stays inside BIGINT at any id range; hash ties break on neg_id
_CODE = 1_000_003

_NEG_ORACLE = f"""
WITH anchors AS (
  SELECT doc_id AS anchor_id, lang, source
  FROM documents WHERE doc_id % 50 = 0
),
cand AS (
  SELECT a.anchor_id, d.doc_id AS neg_id,
         (((a.anchor_id * {_CODE} + d.doc_id) % {_MOD}) * {_KNUTH}) % {_MOD} AS h
  FROM anchors a
  JOIN documents d
    ON d.lang = a.lang AND d.source <> a.source AND d.doc_id <> a.anchor_id
)
SELECT anchor_id, CAST(rn AS BIGINT) AS rank, neg_id
FROM (
  SELECT anchor_id, neg_id,
         ROW_NUMBER() OVER (
           PARTITION BY anchor_id ORDER BY h, neg_id
         ) AS rn
  FROM cand
) WHERE rn <= {_K_NEG}
"""


@register("training_negative_sampling", _NEG_ORACLE)
def training_negative_sampling(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    anchors = d.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("anchor_id"),
        F.col("lang").alias("a_lang"),
        F.col("source").alias("a_source"),
    )
    # Candidate-side fan-out (the exact-scorer rule from
    # ext_similarity.py): the broadcast join inherits the documents
    # file's byte-sized splits, but every candidate row fans out to
    # |anchors-per-lang| hash evaluations — sf1 measured the whole
    # 10M-row candidate stage on a handful of tasks (38 s; ~3 s after).
    cand = (
        d.repartition(spark.sparkContext.defaultParallelism)
        .join(F.broadcast(anchors), d.lang == anchors.a_lang)
        .filter(
            (F.col("source") != F.col("a_source"))
            & (F.col("doc_id") != F.col("anchor_id"))
        )
        .select(
            "anchor_id",
            F.col("doc_id").alias("neg_id"),
            F.expr(
                f"(((anchor_id * {_CODE} + doc_id) % {_MOD}) * {_KNUTH}) % {_MOD}"
            ).alias("h"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy("h", "neg_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _K_NEG)
        .select("anchor_id", F.col("rn").cast("bigint").alias("rank"), "neg_id")
    )
