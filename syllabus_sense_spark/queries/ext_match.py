"""[EXT] Entity resolution and weighted corpus sampling.

``match_fuzzy_parts`` — blocked fuzzy-match join, the classic entity-
resolution shape: generate candidate pairs only *within* a blocking
key (brand + first name token), then verify each candidate with an
edit-distance predicate. Pair generation is an equi-join on the block
key, so the cost is sum(block_size²) — never the n² all-pairs join.
The verify step (threshold ``levenshtein``) runs JVM-side on
candidates only, the same candidates-only discipline as
dedup_minhash_lsh's Jaccard verify.

Scale posture: a FIXED-cardinality blocking key means block occupancy
grows linearly with the corpus and sum(block²) stays quadratic — the
r10 sweep measured exactly that (20×/decade after the fan-out +
threshold-DP fixes took the constant down 19×). That is the inherent
trade of this ER design, and the standard remedies are blocking-KEY
refinement (brand + first + last token → cardinality grows with the
vocabulary) or block purging/splitting at a size cap (the SimHash
MAX_BUCKET guard, ext_simhash.py) — both RECALL-changing decisions a
production pipeline makes explicitly, so this query keeps the simple
key and documents the cliff instead of silently dropping pairs.

``sample_weighted_bernoulli`` — weight-proportional Bernoulli
sampling with a deterministic seeded-hash coin: include a document
iff ``md5(seed:doc_id) mod M < weight·scale``, weight = capped text
length. Integer-exact (no float RNG), reproducible across engines
and reruns, embarrassingly parallel (pure filter, no shuffle) — the
production way to bias a training mixture toward longer documents
without a per-epoch RNG state. Same cross-engine hash discipline as
training_shuffle_shards (ext_training3.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_EDIT_MAX = 3

_FUZZY_ORACLE = f"""
WITH p AS (
  SELECT p_partkey, p_brand, p_name, split_part(p_name, ' ', 1) AS blk
  FROM part
)
SELECT a.p_partkey AS a_partkey,
       b.p_partkey AS b_partkey,
       a.p_brand,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM p a
JOIN p b
  ON a.p_brand = b.p_brand AND a.blk = b.blk AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= {_EDIT_MAX}
"""


@register("match_fuzzy_parts", _FUZZY_ORACLE)
def match_fuzzy_parts(spark, sf_dir):
    # Spread the block table over the core count BY THE BLOCK KEY
    # before the self-join: the r10 full-registry sweep caught this
    # query at 156 s / 119x per decade at sf1 — the part table is one
    # 1.6 MB split, so the whole sum(block_size²) pair verification ran
    # on ONE core of 32 (the round-9 single-split disease, here on the
    # verify stage). Partitioning by the join keys co-locates the
    # self-join, so this is the only shuffle in the plan; at 100 TB
    # files fill their splits and it degenerates to a cheap
    # key-aligned exchange.
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_name",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk"),
    ).repartition(
        spark.sparkContext.defaultParallelism, "p_brand", "blk"
    )
    a = p.select(
        F.col("p_partkey").alias("a_partkey"),
        "p_brand",
        "blk",
        F.col("p_name").alias("a_name"),
    )
    b = p.select(
        F.col("p_partkey").alias("b_partkey"),
        "p_brand",
        "blk",
        F.col("p_name").alias("b_name"),
    )
    pairs = a.join(b, ["p_brand", "blk"]).filter(
        F.col("a_partkey") < F.col("b_partkey")
    )
    # Threshold levenshtein (Spark ≥3.5): the banded DP early-exits
    # once the distance provably exceeds _EDIT_MAX and returns -1 —
    # O(threshold·min_len) per pair instead of O(len²). Within the
    # threshold the value is exact, so results are identical to the
    # oracle's plain levenshtein ≤ _EDIT_MAX (r10 sweep: the full DP
    # was ~8x of the per-pair cost on ~35-char names).
    return (
        pairs.withColumn(
            "edit_dist",
            F.levenshtein("a_name", "b_name", _EDIT_MAX).cast("bigint"),
        )
        .filter(
            (F.col("edit_dist") >= 0) & (F.col("edit_dist") <= _EDIT_MAX)
        )
        .select("a_partkey", "b_partkey", "p_brand", "edit_dist")
    )


_WS_SEED = "ws:"
_WS_MOD = 100_000
_WS_CAP = 600
_WS_SCALE = 100

_WSAMPLE_ORACLE = f"""
SELECT doc_id, source,
       CAST(LEAST(length(text), {_WS_CAP}) AS BIGINT) AS weight
FROM documents
WHERE CAST(concat('0x', substr(md5(concat('{_WS_SEED}', CAST(doc_id AS VARCHAR))),
                               1, 12)) AS BIGINT) % {_WS_MOD}
      < LEAST(length(text), {_WS_CAP}) * {_WS_SCALE}
"""


@register("sample_weighted_bernoulli", _WSAMPLE_ORACLE)
def sample_weighted_bernoulli(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_WS_SEED), F.col("doc_id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("bigint")
    )
    weight = F.least(F.length("text"), F.lit(_WS_CAP)).cast("bigint")
    return d.filter((h % _WS_MOD) < weight * _WS_SCALE).select(
        "doc_id", "source", weight.alias("weight")
    )
