"""[EXT] Sampling-quota apportionment — the largest-remainder
(Hamilton) allocation of a fixed sample budget across (source, lang)
cells, proportional to corpus mass. This is the planning step in
front of `mixture_resample_to_target` / `training_temperature_mixture`:
given "draw exactly Q documents", decide the per-cell integer quota
so the quotas sum to EXACTLY Q (floor-only allocation undershoots;
independent rounding misses Q in either direction).

All arithmetic is exact BIGINT: masses are reduced to kilochar units
first (mass_k = cell_mass DIV 1000) so the Hamilton product
mass_k·Q stays far inside BIGINT at any corpus size (at 100 TB,
mass_k ≈ 1e11 × Q 1e5 = 1e16 ≪ 2⁶³; the unreduced product would
overflow) — Hamilton on coarser units is still exact Hamilton.
Remainder ties break on (source, lang) totally.

Scale posture: ONE map-side-combined groupBy reduces the corpus to
the cell table (|sources|·|langs| rows — dozens at any scale); every
window below runs on that pre-reduced table only.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register

_Q = 100_000  # total sample budget

_APPORTION_ORACLE = f"""
WITH cells AS (
  SELECT source, lang, SUM(n_chars) // 1000 AS mass_k
  FROM documents GROUP BY source, lang
),
tot AS (
  SELECT source, lang, mass_k,
         SUM(mass_k) OVER () AS m_total
  FROM cells
),
base AS (
  SELECT source, lang, mass_k, m_total,
         mass_k * {_Q} // m_total AS base_q,
         mass_k * {_Q} - (mass_k * {_Q} // m_total) * m_total AS rem
  FROM tot
),
ranked AS (
  SELECT source, lang, mass_k, base_q, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC, lang ASC) AS rk,
         {_Q} - SUM(base_q) OVER () AS leftover
  FROM base
)
SELECT source, lang, CAST(mass_k AS BIGINT) AS mass_k,
       CAST(base_q AS BIGINT) AS base_q,
       CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
       CAST(base_q + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS quota
FROM ranked
"""


@register("training_quota_apportionment", _APPORTION_ORACLE)
def training_quota_apportionment(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(
        F.expr("SUM(n_chars) DIV 1000").alias("mass_k")
    )
    # every window below is over the pre-reduced cell table (dozens
    # of rows at any corpus size) — the one place global windows are
    # the right plan
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    base = cells.select(
        "source",
        "lang",
        "mass_k",
        F.sum("mass_k").over(w_all).alias("m_total"),
    ).select(
        "source",
        "lang",
        "mass_k",
        F.expr(f"mass_k * {_Q} DIV m_total").alias("base_q"),
        F.expr(
            f"mass_k * {_Q} - (mass_k * {_Q} DIV m_total) * m_total"
        ).alias("rem"),
    )
    ranked = base.select(
        "source",
        "lang",
        "mass_k",
        "base_q",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.asc("source"), F.asc("lang")))
        .alias("rk"),
        (F.lit(_Q) - F.sum("base_q").over(w_all)).alias("leftover"),
    )
    return ranked.select(
        "source",
        "lang",
        F.col("mass_k").cast("bigint").alias("mass_k"),
        F.col("base_q").cast("bigint").alias("base_q"),
        F.when(F.col("rk") <= F.col("leftover"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("extra"),
        (
            F.col("base_q")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("quota"),
    )
