"""Classic BI analytics operators the reference's users would reach
for next: Pareto/skyline, revenue concentration (Lorenz/ABC), and a
deterministic A/B proportion test.

Reference parity note: the reference pipeline ends at per-topic
aggregates (workflow.py); these are the standard downstream analyses
over the same star schema, re-expressed as single-pass Spark plans.

Exactness discipline (see queries/_util.py): money flows as integer
cents (dec2 × 100 → BIGINT), shares as integer ppm via BIGINT DIV
where products provably fit, and the one statistical score (z²) as
the documented fixed-order IEEE expression → floor-scaled integer —
the same pattern as search_hybrid_rrf's fused score.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import cents, dec2, xsum_total

# --- 1. Pareto frontier (2-D skyline) --------------------------------
#
# Skyline of parts under (maximize p_size, minimize p_retailprice).
# The naive form is the O(n²) dominance anti-join; the distributed
# form exploits that a 2-D skyline is computable from the per-size
# minimum price: reduce to one row per distinct size (ONE map-side
# combined groupBy — the only full-data shuffle), then a running
# strict min over the size-level table (tiny: |distinct sizes|,
# ~50 rows at any data scale) ordered by size DESC decides dominance.
# A size's min price survives iff it beats every strictly-larger
# size's min price.

_PARETO_ORACLE = """
WITH per_size AS (
  SELECT p_size,
         MIN(CAST(p_retailprice AS DECIMAL(18,2))) AS min_price,
         COUNT(*) AS n_parts
  FROM part GROUP BY p_size
),
run AS (
  SELECT p_size, min_price, n_parts,
         MIN(min_price) OVER (
           ORDER BY p_size DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS best_larger
  FROM per_size
),
sky AS (
  SELECT p_size, min_price FROM run
  WHERE best_larger IS NULL OR min_price < best_larger
)
SELECT CAST(s.p_size AS INT) AS p_size,
       CAST(s.min_price * 100 AS BIGINT) AS price_cents,
       CAST(COUNT(*) AS BIGINT) AS n_at_point,
       CAST(MIN(p.p_partkey) AS BIGINT) AS rep_partkey
FROM sky s
JOIN part p ON p.p_size = s.p_size
          AND CAST(p.p_retailprice AS DECIMAL(18,2)) = s.min_price
GROUP BY s.p_size, s.min_price
"""


@register("part_pareto_frontier", _PARETO_ORACLE)
def part_pareto_frontier(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    per_size = part.groupBy("p_size").agg(
        F.min(dec2("p_retailprice")).alias("min_price"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    # strict-prefix running min over the ~|sizes|-row table only
    w = Window.orderBy(F.desc("p_size")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky = (
        per_size.withColumn("best_larger", F.min("min_price").over(w))
        .filter(
            F.col("best_larger").isNull()
            | (F.col("min_price") < F.col("best_larger"))
        )
        .select(
            F.col("p_size").alias("s_size"), F.col("min_price").alias("s_price")
        )
    )
    # hydrate the frontier points (broadcast: |skyline| ≤ |sizes|)
    return (
        part.join(
            F.broadcast(sky),
            (F.col("p_size") == F.col("s_size"))
            & (dec2("p_retailprice") == F.col("s_price")),
        )
        .groupBy("s_size", "s_price")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_at_point"),
            F.min("p_partkey").cast("bigint").alias("rep_partkey"),
        )
        .select(
            F.col("s_size").cast("int").alias("p_size"),
            (F.col("s_price") * 100).cast("bigint").alias("price_cents"),
            "n_at_point",
            "rep_partkey",
        )
    )


# --- 2. Revenue concentration (Lorenz deciles / ABC) -----------------
#
# Customers ranked by lifetime revenue DESC (custkey ASC tiebreak),
# cut into 10 equal-count bands; per band: customers, revenue cents,
# cumulative revenue share. The global sort runs on the PRE-AGGREGATED
# customer table (orders are reduced by the groupBy first — at 100 TB
# that's ~1e8 narrow rows, the standard ranking posture), never the
# fact table. Cumulative share is floor-scaled ppm via one fixed-order
# IEEE multiply+divide on exact integer cents (the BIGINT product
# cum·1e6 would overflow at ~9.2e12 cents total, so the double form
# is the scale-safe one).

_LORENZ_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT cents,
         NTILE(10) OVER (ORDER BY cents DESC, o_custkey ASC) AS band
  FROM rev
),
bands AS (
  SELECT band, COUNT(*) AS n_customers, SUM(cents) AS band_cents
  FROM ranked GROUP BY band
)
SELECT CAST(band AS INT) AS band,
       CAST(n_customers AS BIGINT) AS n_customers,
       CAST(band_cents AS BIGINT) AS band_cents,
       CAST(FLOOR(CAST(SUM(band_cents) OVER (
              ORDER BY band ROWS UNBOUNDED PRECEDING) AS DOUBLE)
            * 1000000.0
            / CAST(SUM(band_cents) OVER () AS DOUBLE)) AS BIGINT)
         AS cum_share_ppm
FROM bands
"""


@register("customer_revenue_concentration", _LORENZ_ORACLE)
def customer_revenue_concentration(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        xsum_total(cents("o_totalprice")).cast("long").alias("cents")
    )
    ranked = rev.select(
        "cents",
        F.ntile(10)
        .over(Window.orderBy(F.desc("cents"), F.asc("o_custkey")))
        .alias("band"),
    )
    bands = ranked.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("band_cents"),
    )
    w_cum = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return bands.select(
        F.col("band").cast("int").alias("band"),
        F.col("n_customers").cast("bigint").alias("n_customers"),
        F.col("band_cents").cast("bigint").alias("band_cents"),
        F.floor(
            F.sum("band_cents").over(w_cum).cast("double")
            * F.lit(1000000.0)
            / F.sum("band_cents").over(w_all).cast("double")
        )
        .cast("bigint")
        .alias("cum_share_ppm"),
    )


# --- 3. Deterministic A/B proportion test ----------------------------
#
# Variant assignment is OUR OWN multiply-mod hash of user_id (no
# engine RNG/hash family — the rerunnable-experiment requirement).
# "Converted" = the user logged strictly more purchases than errors —
# a scale-free predicate that stays non-degenerate at every SF (a
# fixed absolute threshold saturates to all-1s as events-per-user
# grow). Per-user reduce (ONE shuffle on user_id), variant-level
# counts map-side combined from it, then the two-proportion pooled z²
# on the 2-row variant table. conv_ppm is exact BIGINT arithmetic; z²
# is the documented fixed-order IEEE expression floor-scaled to 1e6
# (operands are exact integers, so both engines round the identical
# expression tree), with the degenerate all-convert / none-convert
# experiment pinned to 0 (the statistic is undefined there).

_AB_K = 2654435761  # Knuth multiplicative constant
_AB_P = 2147483647  # 2^31 - 1

_AB_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         CAST((user_id * {_AB_K}) % {_AB_P} % 2 AS INT) AS variant,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 > SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
v AS (
  SELECT variant, COUNT(*) AS n_users,
         CAST(SUM(converted) AS BIGINT) AS n_conv
  FROM u GROUP BY variant
),
wide AS (
  SELECT
    MAX(CASE WHEN variant = 0 THEN n_users END) AS n_a,
    MAX(CASE WHEN variant = 0 THEN n_conv END) AS c_a,
    MAX(CASE WHEN variant = 1 THEN n_users END) AS n_b,
    MAX(CASE WHEN variant = 1 THEN n_conv END) AS c_b
  FROM v
)
SELECT CAST(n_a AS BIGINT) AS n_a, c_a,
       CAST(n_b AS BIGINT) AS n_b, c_b,
       c_a * 1000000 // n_a AS conv_a_ppm,
       c_b * 1000000 // n_b AS conv_b_ppm,
       CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN CAST(0 AS BIGINT)
       ELSE CAST(FLOOR(
         ((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
           - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
          * (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
         / ((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
            * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
            * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
         * 1000000.0) AS BIGINT) END AS z2_e6
FROM wide
"""


@register("events_ab_test_proportions", _AB_ORACLE)
def events_ab_test_proportions(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            > F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)),
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select(
        F.expr(f"CAST((user_id * {_AB_K}) % {_AB_P} % 2 AS INT)").alias(
            "variant"
        ),
        "converted",
    )
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_conv"),
    )
    wide = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("n_conv"))).alias("c_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("n_conv"))).alias("c_b"),
    )
    d = "CAST({} AS DOUBLE)"
    p_a = f"{d.format('c_a')} / {d.format('n_a')}"
    p_b = f"{d.format('c_b')} / {d.format('n_b')}"
    p_pool = f"{d.format('c_a + c_b')} / {d.format('n_a + n_b')}"
    return wide.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        "c_a",
        F.col("n_b").cast("bigint").alias("n_b"),
        "c_b",
        F.expr("c_a * 1000000 DIV n_a").alias("conv_a_ppm"),
        F.expr("c_b * 1000000 DIV n_b").alias("conv_b_ppm"),
        F.expr(
            f"CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b"
            f" THEN CAST(0 AS BIGINT)"
            f" ELSE CAST(FLOOR((({p_a} - {p_b}) * ({p_a} - {p_b}))"
            f" / (({p_pool}) * (1.0 - {p_pool})"
            f" * (1.0 / {d.format('n_a')} + 1.0 / {d.format('n_b')}))"
            f" * 1000000.0) AS BIGINT) END"
        ).alias("z2_e6"),
    )
