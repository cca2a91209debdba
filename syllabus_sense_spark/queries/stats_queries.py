"""Deterministic Poisson bootstrap — the production way to put a
confidence interval on a statistic at 100 TB.

The classic n-out-of-n bootstrap needs global coordination (sample
WITH replacement across the whole dataset); the Poisson bootstrap
(Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
Google 2012) replaces it with an independent per-row replicate
weight w ~ Poisson(1) — embarrassingly parallel, one pass, exact
same asymptotics. Here even the randomness is removed: w is derived
from a multiply-mod universal hash of (event_id, replicate), with
the Poisson(1) CDF embedded as integer thresholds — both engines
compute bit-identical weights, so the whole CI is hash-checkable.

Scale shape: 32× map-side fan-out of the purchase rows collapses
immediately into the per-replicate partial aggregate (map-side
combine -> 32 rows per partition), then one 32-row final reduce.
No shuffle grows with data size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2

_P = (1 << 31) - 1  # Mersenne prime 2^31-1
_N_REPS = 32

# Per-replicate LARGE odd multipliers (2^29..2^31 range): the product
# ((id + c) mod p) · a wraps mod p thousands of times even for small
# ids, so consecutive event_ids land uniformly over [0, p). (The
# dedup family's < 2^14 multipliers are NOT reusable here — they
# never wrap for small ids and every Poisson weight would floor to
# the same bucket. Caught by the weight-distribution law test.)
# Overflow bound: ((id + c) mod p) ≤ p−1 ≈ 2.15e9, a < 1.6e9 →
# product < 3.4e18 < 2^63 in both engines.
_A = [536870923 + b * 33554432 for b in range(_N_REPS)]
_C = [40503, 988471, 52361, 739393, 17029, 654435, 92821, 33301,
      77023, 508349, 26041, 871733, 14407, 623171, 68483, 91193,
      55331, 902413, 31607, 747731, 20201, 668813, 84131, 37517,
      60493, 514229, 28657, 832041, 12343, 639901, 75577, 98947]
assert len(_A) == len(_C) == _N_REPS
assert all(a % 2 == 1 and a < _P for a in _A)

# Poisson(1) CDF as integer thresholds over [0, p): u < T[k] → w = k.
# floor(p · P(X ≤ k)) for k = 0..3; u ≥ T[3] → w = 4 (tail capped,
# P ≈ 1.9 %; the cap is part of the spec, identical in both engines).
import math as _math

_CDF = [sum(_math.exp(-1) / _math.factorial(i) for i in range(k + 1))
        for k in range(4)]
_T = [int(c * _P) for c in _CDF]

_WEIGHT_SQL = (
    f"CASE WHEN u < {_T[0]} THEN 0 WHEN u < {_T[1]} THEN 1 "
    f"WHEN u < {_T[2]} THEN 2 WHEN u < {_T[3]} THEN 3 ELSE 4 END"
)

_REPS_VALUES = ", ".join(
    f"({b}, {_A[b]}, {_C[b]})" for b in range(_N_REPS)
)

_BOOTSTRAP_ORACLE = f"""
WITH purch AS (
  SELECT event_id % {_P} AS id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
reps(b, a, c) AS (VALUES {_REPS_VALUES}),
weighted AS (
  SELECT r.b, ((p.id + r.c) % {_P}) * r.a % {_P} AS u, p.cents
  FROM purch p CROSS JOIN reps r
),
rep_means AS (
  SELECT b,
         SUM(({_WEIGHT_SQL}) * cents) AS wsum,
         SUM({_WEIGHT_SQL}) AS w
  FROM weighted GROUP BY b
),
rm AS (
  SELECT b, wsum // w AS mean_cents FROM rep_means WHERE w > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
       CAST(quantile_disc(mean_cents, 0.05) AS BIGINT) AS ci_lo_cents,
       CAST(quantile_disc(mean_cents, 0.50) AS BIGINT) AS ci_mid_cents,
       CAST(quantile_disc(mean_cents, 0.95) AS BIGINT) AS ci_hi_cents,
       CAST(MIN(mean_cents) AS BIGINT) AS min_cents,
       CAST(MAX(mean_cents) AS BIGINT) AS max_cents
FROM rm
"""


@register("stat_bootstrap_poisson_ci", _BOOTSTRAP_ORACLE)
def stat_bootstrap_poisson_ci(spark, sf_dir):
    purch = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            (F.col("event_id") % _P).alias("id"),
            cents("value").alias("cents"),
        )
    )
    reps = F.array(
        *[
            F.struct(
                F.lit(b).alias("b"),
                F.lit(_A[b]).alias("a"),
                F.lit(_C[b]).alias("c"),
            )
            for b in range(_N_REPS)
        ]
    )
    weighted = purch.select(
        "id", "cents", F.explode(reps).alias("r")
    ).select(
        F.col("r.b").alias("b"),
        F.expr(f"((id + r.c) % {_P}) * r.a % {_P}").alias("u"),
        "cents",
    )
    rep_means = (
        weighted.groupBy("b")
        .agg(
            F.expr(f"SUM(({_WEIGHT_SQL}) * cents)").alias("wsum"),
            F.expr(f"SUM({_WEIGHT_SQL})").alias("w"),
        )
        .filter(F.col("w") > 0)
        .select(F.expr("wsum DIV w").alias("mean_cents"))
    )
    pd = "percentile_disc({p}) WITHIN GROUP (ORDER BY mean_cents)"
    return rep_means.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_replicates"),
        F.expr(pd.format(p=0.05)).cast("bigint").alias("ci_lo_cents"),
        F.expr(pd.format(p=0.50)).cast("bigint").alias("ci_mid_cents"),
        F.expr(pd.format(p=0.95)).cast("bigint").alias("ci_hi_cents"),
        F.min("mean_cents").cast("bigint").alias("min_cents"),
        F.max("mean_cents").cast("bigint").alias("max_cents"),
    )
