"""[EXT] Embedding compression: int8 scalar quantization.

Production ANN at 100 TB stores vectors quantized (int8 scalar codes
cut memory/IO 4x vs float32 and are what IVF/HNSW serving tiers scan).
This implements the classic symmetric scalar quantizer:

    scale  = max(|x|) over the whole corpus          (pass 1, scalar)
    code_i = floor(127 * x_i / scale + 0.5)          (pass 2, per dim)

Pass 1 is one tiny aggregate broadcast back; pass 2 is a pure
higher-order-function projection (`transform`/`aggregate`) — no UDF,
no shuffle, fully whole-stage-codegen. `floor(z + 0.5)` is used
instead of `round` because engines disagree on round-half-even vs
half-up, while floor of identical IEEE doubles is bit-stable.

The registered query surfaces per-vector code statistics (sum, min,
max, saturation count) rather than the code arrays themselves —
complex outputs stay out of oracle-checked results by registry
discipline (queries/__init__.py docstring).

Reference anchor: none (capability extension per SURVEY.md §2 [EXT]);
quantization recipe follows the standard faiss-style scalar
quantizer as published (Johnson et al., "Billion-scale similarity
search with GPUs", 2017).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_QUANT_ORACLE = """
WITH scale AS (
  SELECT MAX(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))))
           AS s
  FROM embeddings
),
codes AS (
  SELECT e.vec_id,
         list_transform(
           e.embedding,
           x -> CAST(floor(127.0 * CAST(x AS DOUBLE) / sc.s + 0.5) AS BIGINT)
         ) AS code
  FROM embeddings e, scale sc
)
SELECT vec_id,
       CAST(list_sum(code) AS BIGINT) AS code_sum,
       CAST(list_min(code) AS BIGINT) AS code_min,
       CAST(list_max(code) AS BIGINT) AS code_max,
       CAST(len(list_filter(code, c -> abs(c) >= 127)) AS BIGINT) AS n_saturated
FROM codes
"""


@register("embedding_quantize_int8", _QUANT_ORACLE)
def embedding_quantize_int8(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    scale = emb.agg(
        F.max(
            F.array_max(
                F.transform("embedding", lambda x: F.abs(x.cast("double")))
            )
        ).alias("s")
    )
    codes = emb.crossJoin(F.broadcast(scale)).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(
                F.lit(127.0) * x.cast("double") / F.col("s") + F.lit(0.5)
            ),
        ).alias("code"),
    )
    return codes.select(
        "vec_id",
        F.aggregate(
            "code", F.lit(0).cast("bigint"), lambda acc, c: acc + c
        ).alias("code_sum"),
        F.array_min("code").alias("code_min"),
        F.array_max("code").alias("code_max"),
        F.size(F.filter("code", lambda c: F.abs(c) >= 127))
        .cast("bigint")
        .alias("n_saturated"),
    )
