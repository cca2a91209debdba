"""Aggregate families beyond the core set: bitwise/boolean reducers,
order-deterministic string aggregation, and exact second-moment
statistics (covariance / correlation / regression slope).

The statistics queries deliberately avoid the engine's float
``covar_pop``/``corr``/``regr_*`` built-ins in the *oracle-checked*
path: those reduce doubles in partition order, so their low bits vary
run-to-run and engine-to-engine. Instead both engines compute the
identical closed forms from EXACT decimal sums (Σx, Σy, Σxy, Σx²) and
perform the final arithmetic in double — bit-stable everywhere, and at
scale it is the same single hash-aggregate shuffle the built-ins use.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import dec2

# --- bitwise & boolean aggregation ----------------------------------------

_BITWISE_ORACLE = """
SELECT
  event_type,
  CAST(bit_and(user_id) AS BIGINT) AS band,
  CAST(bit_or(user_id) AS BIGINT) AS bor,
  CAST(bit_xor(user_id) AS BIGINT) AS bxor,
  bool_and(value >= 0) AS all_nonneg,
  bool_or(value > 99) AS any_large
FROM events
GROUP BY event_type
"""


@register("agg_bitwise_boolean", _BITWISE_ORACLE)
def agg_bitwise_boolean(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bit_and("user_id").cast("long").alias("band"),
        F.bit_or("user_id").cast("long").alias("bor"),
        F.bit_xor("user_id").cast("long").alias("bxor"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 99).alias("any_large"),
    )


# --- order-deterministic string aggregation -------------------------------
# listagg/string_agg is order-sensitive; both sides sort the distinct
# values first, so the concatenation is a pure function of the set.

_STRAGG_ORACLE = """
SELECT
  r.r_name,
  string_agg(DISTINCT n.n_name, ',' ORDER BY n.n_name) AS nations_csv
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


@register("agg_string_concat_sorted", _STRAGG_ORACLE)
def agg_string_concat_sorted(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("n_name")), ","
            ).alias("nations_csv")
        )
    )


# --- exact covariance / correlation / slope -------------------------------

_COVAR_ORACLE = """
WITH s AS (
  SELECT
    l_returnflag,
    COUNT(*) AS n,
    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT
  l_returnflag,
  n,
  CAST(floor(
    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / n
    * 1e4) AS BIGINT) AS covar_pop_e4,
  CAST(floor(
    (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (SQRT(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       * SQRT(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
    * 1e6) AS BIGINT) AS corr_e6,
  CAST(floor(
    (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
    * 1e6) AS BIGINT) AS slope_e6
FROM s
"""


@register("agg_covar_corr_exact", _COVAR_ORACLE)
def agg_covar_corr_exact(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    x, y = dec2("l_quantity"), dec2("l_extendedprice")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    return s.select(
        "l_returnflag",
        "n",
        F.floor(((sxy - sx * sy / n) / n) * F.lit(1e4))
        .cast("bigint")
        .alias("covar_pop_e4"),
        F.floor(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
            * F.lit(1e6)
        )
        .cast("bigint")
        .alias("corr_e6"),
        F.floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * F.lit(1e6))
        .cast("bigint")
        .alias("slope_e6"),
    )
