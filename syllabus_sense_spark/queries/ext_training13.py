"""[EXT] Packing efficiency report + over-dispersion test — two
closing-the-loop reports.

`training_pack_efficiency`: the fill/waste accounting on top of
`pack_sequences_greedy` (same operator, same capacity): sequences
used, token mass packed, fill ppm, docs per sequence min/max — the
number a training budget review asks for ("how much of each 4096-token
sequence is real data?"). Composition certifies the packing operator
end-to-end through a second independent aggregation.

`events_dispersion_test`: the variance-to-mean ratio (index of
dispersion) of daily event counts — the Poisson-ness screen behind
burst alarms (D ≫ 1 ⇒ bursty, D ≈ 1 ⇒ Poisson-like). Uses the
integer identity n·Σx² − (Σx)² = n²·Var, so the statistic is
computed from exact sums (the squared term in DECIMAL(38,0), since
Σx² overflows BIGINT once daily counts pass ~3e9) with ONE
fixed-order IEEE floor-scaling at the end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import epoch_us
from .ext_training2 import _PACK_CAPACITY, pack_sequences_greedy

_PACK_EFF_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, (n_chars + 3) // 4 AS n_tok FROM documents
),
packed AS (
  SELECT source,
         COALESCE(SUM(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {_PACK_CAPACITY} AS pack_id,
         n_tok
  FROM d
),
per_seq AS (
  SELECT source, pack_id, COUNT(*) AS n_docs, SUM(n_tok) AS toks
  FROM packed GROUP BY source, pack_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sequences,
       CAST(SUM(toks) AS BIGINT) AS total_tokens,
       CAST(SUM(toks) * 1000000 // (COUNT(*) * {_PACK_CAPACITY}) AS BIGINT)
         AS fill_ppm,
       CAST(MIN(n_docs) AS BIGINT) AS min_docs_per_seq,
       CAST(MAX(n_docs) AS BIGINT) AS max_docs_per_seq
FROM per_seq
"""


@register("training_pack_efficiency", _PACK_EFF_ORACLE)
def training_pack_efficiency(spark, sf_dir):
    packed = pack_sequences_greedy(spark, sf_dir)
    # pack_id is the block holding each doc's FIRST token (docs can
    # spill across block boundaries), so per-block token mass may
    # exceed capacity on boundary blocks and fill_ppm is the honest
    # assignment-level fill, not a <=1e6 bound
    per_seq = packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("toks")
    )
    return per_seq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sequences"),
        F.sum("toks").cast("bigint").alias("total_tokens"),
        F.expr(
            f"CAST(SUM(toks) * 1000000 DIV (COUNT(*) * {_PACK_CAPACITY})"
            f" AS BIGINT)"
        ).alias("fill_ppm"),
        F.min("n_docs").cast("bigint").alias("min_docs_per_seq"),
        F.max("n_docs").cast("bigint").alias("max_docs_per_seq"),
    )


_US_PER_DAY = 86_400_000_000

_DISPERSION_ORACLE = f"""
WITH d AS (
  SELECT epoch_us(ts) // {_US_PER_DAY} AS day, COUNT(*) AS x
  FROM events GROUP BY 1
),
s AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx,
         SUM(CAST(x AS DECIMAL(19,0)) * x) AS sxx FROM d
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(sx AS BIGINT) AS total_events,
       CAST(sx * 1000000 // n AS BIGINT) AS mean_e6,
       CAST(FLOOR(CAST(n * sxx - CAST(sx AS DECIMAL(19,0)) * sx AS DOUBLE)
                  * 1000000.0
                  / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))) AS BIGINT)
         AS dispersion_e6
FROM s
"""


@register("events_dispersion_test", _DISPERSION_ORACLE)
def events_dispersion_test(spark, sf_dir):
    d = (
        load(spark, sf_dir, "events")
        .select(epoch_us(F.col("ts")).alias("us"))
        .select(F.expr(f"us DIV {_US_PER_DAY}").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    s = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x")).alias("sxx"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.col("sx").cast("bigint").alias("total_events"),
        F.expr("sx * 1000000 DIV n").alias("mean_e6"),
        F.expr(
            "CAST(FLOOR(CAST(n * sxx - CAST(sx AS DECIMAL(19,0)) * sx"
            " AS DOUBLE) * 1000000.0"
            " / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))) AS BIGINT)"
        ).alias("dispersion_e6"),
    )
