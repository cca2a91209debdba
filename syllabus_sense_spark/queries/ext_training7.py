"""[EXT] Deterministic per-group reservoir sampling — fixed-size
samples per stratum without a global sort.

The training-ops sampling family covers rate-based membership
(`sample_weighted_bernoulli`, `training_temperature_mixture`,
`mixture_resample_to_target` — each doc independently kept with some
probability). This adds the other sampler a curation pipeline needs:
EXACTLY k documents per source (dashboards, eval slices, human
review queues), reproducible across re-runs and partitionings.

Classic reservoir sampling is sequential (stream order + RNG); the
distributed, deterministic equivalent is bottom-k by a keyed hash:
rank docs within each source by the Knuth multiplicative hash of
their stable doc_id (total tiebreak on doc_id) and keep rank ≤ k.
Same guarantees as a reservoir — uniform over the group given the
hash, exactly k rows — plus determinism, which engine RNG
(rand(seed)) cannot give across partitionings.

Output = the per-source audit aggregate (n kept, id checksum, hash
ceiling of the kept set). The hash ceiling is the bottom-k
threshold — persisting it is what makes the sample INCREMENTABLE: a
new doc enters the sample iff its hash beats the ceiling (the same
store-small/merge-later trick as the sketches).

Scale posture: one hash-partition shuffle on source, per-partition
top-k heap under the window TakeOrdered; no global sort, no second
pass. Skew note: a single giant source funnels to one partition —
for that shape, pre-aggregate bottom-k per map partition first
(operators/skew.py salting composes here).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register

_K = 20
_KNUTH = 2_654_435_761
_MOD = 1_000_000_007

_RESERVOIR_ORACLE = f"""
WITH ranked AS (
  SELECT source, doc_id,
         (doc_id * {_KNUTH}) % {_MOD} AS h,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY (doc_id * {_KNUTH}) % {_MOD}, doc_id
         ) AS rn
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(MAX(h) AS BIGINT) AS hash_ceiling
FROM ranked
WHERE rn <= {_K}
GROUP BY source
"""


@register("sample_reservoir_per_group", _RESERVOIR_ORACLE)
def sample_reservoir_per_group(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        ((F.col("doc_id") * _KNUTH) % _MOD).alias("h"),
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _K)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("doc_id").alias("sum_doc_id"),
            F.max("h").cast("bigint").alias("hash_ceiling"),
        )
    )
