"""[EXT] Per-source length-distribution drift vs the pooled corpus —
the quantile-alignment report behind quantile normalization. For
each source and decile d, the source's decile length sits next to
the pooled corpus decile; the shift column is the per-decile bias a
normalizer would correct. Everything is ``percentile_disc`` on
integer lengths (value-selecting, exact) — the source-side agg is
one small groupBy, the 9-row pooled table broadcasts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_DECILES = [d / 10 for d in range(1, 10)]

_SRC_COLS = ", ".join(
    f"CAST(quantile_disc(n_chars, {d}) AS BIGINT) AS q{i + 1}"
    for i, d in enumerate(_DECILES)
)
_POOL_COLS = ", ".join(
    f"CAST(quantile_disc(n_chars, {d}) AS BIGINT) AS q{i + 1}"
    for i, d in enumerate(_DECILES)
)
_UNPIVOT = " UNION ALL ".join(
    f"SELECT source, {i + 1} AS decile, q{i + 1} AS src_len FROM s"
    for i in range(9)
)
_POOL_UNPIVOT = " UNION ALL ".join(
    f"SELECT {i + 1} AS decile, q{i + 1} AS pooled_len FROM p"
    for i in range(9)
)

_SHIFT_ORACLE = f"""
WITH d AS (SELECT source, length(text) AS n_chars FROM documents),
s AS (SELECT source, {_SRC_COLS} FROM d GROUP BY source),
p AS (SELECT {_POOL_COLS} FROM d),
su AS ({_UNPIVOT}),
pu AS ({_POOL_UNPIVOT})
SELECT su.source, CAST(su.decile AS INT) AS decile,
       CAST(su.src_len AS BIGINT) AS src_len,
       CAST(pu.pooled_len AS BIGINT) AS pooled_len,
       CAST(su.src_len - pu.pooled_len AS BIGINT) AS shift
FROM su JOIN pu ON pu.decile = su.decile
"""


@register("text_length_quantile_shift", _SHIFT_ORACLE)
def text_length_quantile_shift(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "source", F.length("text").alias("n_chars")
    )

    def pd(p):
        return (
            F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY n_chars)")
            .cast("bigint")
        )

    qcols = [pd(p).alias(f"q{i + 1}") for i, p in enumerate(_DECILES)]
    s = d.groupBy("source").agg(*qcols)
    p = d.agg(*qcols)

    def unpivot(df, keys):
        pairs = F.array(
            *[
                F.struct(
                    F.lit(i + 1).alias("decile"), F.col(f"q{i + 1}").alias("v")
                )
                for i in range(9)
            ]
        )
        return df.select(*keys, F.explode(pairs).alias("e")).select(
            *keys,
            F.col("e.decile").cast("int").alias("decile"),
            F.col("e.v").alias("v"),
        )

    su = unpivot(s, ["source"]).withColumnRenamed("v", "src_len")
    pu = unpivot(p, []).withColumnRenamed("v", "pooled_len")
    return su.join(F.broadcast(pu), "decile").select(
        "source",
        "decile",
        F.col("src_len").cast("bigint").alias("src_len"),
        F.col("pooled_len").cast("bigint").alias("pooled_len"),
        (F.col("src_len") - F.col("pooled_len"))
        .cast("bigint")
        .alias("shift"),
    )
