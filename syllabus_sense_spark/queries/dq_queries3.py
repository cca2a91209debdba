"""DQ batch 3: cross-table financial reconciliation and
distribution-drift detection — the two remaining checks a production
data-quality gate runs that the rule-list (`dq_check_orders`),
FK-integrity (`dq_check_fk_integrity`), and skew-profile
(`dq_join_skew_profile`) operators don't cover.

Reconciliation (`dq_reconcile_orders_lineitem`): does the order
header's total match the sum of its lines? The accounting join every
warehouse runs nightly. Exact decimal discipline end-to-end (the q1
charge expression summed per order, compared against the header in
DECIMAL — the 1% tolerance test is `100·|diff| ≤ expected`, integer
× decimal, engine-identical); headers with no lines are their own
status. One key-partitioned join + one tiny status rollup. The
synthetic headers do NOT reconcile (their totals are independent of
the lines) — which is exactly what the gate must report, rather than
a vacuous all-green.

Drift (`dq_distribution_drift`): compare the `value` distribution of
two event cohorts (stable A/B split on event_id parity — re-runnable)
over fixed bins; emit per-bin shares in integer ppm and the |Δ| ppm
per bin (the L1 drift mass a monitor alerts on; PSI's log-ratio term
is deliberately avoided — engine log rounding would flap the hash,
and the consumer can compute it from the emitted shares). Two
map-side-combined groupBys + a broadcast of the 2-row cohort-count
table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import dec2, rate

_RECON_ORACLE = """
WITH line_tot AS (
  SELECT l_orderkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(3,2))
             * CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(3,2)))
           AS computed
  FROM lineitem GROUP BY l_orderkey
),
recon AS (
  SELECT o.o_orderkey,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS header,
         t.computed,
         CASE
           WHEN t.l_orderkey IS NULL THEN 'no_lines'
           WHEN 100 * ABS(CAST(o.o_totalprice AS DECIMAL(18,2)) - t.computed)
                <= CAST(o.o_totalprice AS DECIMAL(18,2)) THEN 'within_1pct'
           ELSE 'mismatched'
         END AS recon_status,
         ABS(CAST(o.o_totalprice AS DECIMAL(18,2)) - COALESCE(t.computed, 0))
           AS abs_diff
  FROM orders o LEFT JOIN line_tot t ON t.l_orderkey = o.o_orderkey
)
SELECT recon_status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(abs_diff) AS DOUBLE) AS total_abs_diff
FROM recon GROUP BY recon_status
"""


@register("dq_reconcile_orders_lineitem", _RECON_ORACLE)
def dq_reconcile_orders_lineitem(spark, sf_dir):
    charge = dec2("l_extendedprice") * rate("l_discount") * rate("l_tax", plus=True)
    line_tot = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(charge).alias("computed"))
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", dec2("o_totalprice").alias("header")
    )
    recon = o.join(
        line_tot, o.o_orderkey == line_tot.l_orderkey, "left"
    ).select(
        "header",
        "computed",
        F.when(F.col("l_orderkey").isNull(), "no_lines")
        .when(
            100 * F.abs(F.col("header") - F.col("computed")) <= F.col("header"),
            "within_1pct",
        )
        .otherwise("mismatched")
        .alias("recon_status"),
        F.abs(
            F.col("header") - F.coalesce(F.col("computed"), F.lit(0))
        ).alias("abs_diff"),
    )
    return recon.groupBy("recon_status").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("abs_diff").cast("double").alias("total_abs_diff"),
    )


_N_BINS = 10
_BIN_WIDTH = 10  # value units per bin; last bin absorbs the tail

_DRIFT_ORACLE = f"""
WITH binned AS (
  SELECT event_id % 2 AS cohort,
         LEAST({_N_BINS - 1},
               GREATEST(0, CAST(FLOOR(value / {_BIN_WIDTH}) AS BIGINT))) AS bin
  FROM events
),
counts AS (
  SELECT cohort, bin, CAST(COUNT(*) AS BIGINT) AS n
  FROM binned GROUP BY cohort, bin
),
tot AS (SELECT cohort, CAST(SUM(n) AS BIGINT) AS t FROM counts GROUP BY cohort),
shares AS (
  SELECT c.bin, c.cohort, (c.n * 1000000) // t.t AS ppm
  FROM counts c JOIN tot t ON t.cohort = c.cohort
)
SELECT bin,
       CAST(COALESCE(SUM(CASE WHEN cohort = 0 THEN ppm END), 0) AS BIGINT)
         AS share_a_ppm,
       CAST(COALESCE(SUM(CASE WHEN cohort = 1 THEN ppm END), 0) AS BIGINT)
         AS share_b_ppm,
       CAST(ABS(COALESCE(SUM(CASE WHEN cohort = 0 THEN ppm END), 0)
                - COALESCE(SUM(CASE WHEN cohort = 1 THEN ppm END), 0))
            AS BIGINT) AS drift_ppm
FROM shares GROUP BY bin
"""


@register("dq_distribution_drift", _DRIFT_ORACLE)
def dq_distribution_drift(spark, sf_dir):
    binned = load(spark, sf_dir, "events").select(
        (F.col("event_id") % 2).alias("cohort"),
        F.least(
            F.lit(_N_BINS - 1),
            F.greatest(
                F.lit(0), F.floor(F.col("value") / _BIN_WIDTH).cast("bigint")
            ),
        ).alias("bin"),
    )
    counts = binned.groupBy("cohort", "bin").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.groupBy("cohort").agg(F.sum("n").alias("t"))
    shares = counts.join(F.broadcast(tot), "cohort").select(
        "bin", "cohort", F.expr("(n * 1000000) DIV t").alias("ppm")
    )
    # conditional aggregation instead of a cohort self-join: one
    # groupBy(bin) pass emits both shares and the |Δ|
    pa = F.coalesce(F.sum(F.when(F.col("cohort") == 0, F.col("ppm"))), F.lit(0))
    pb = F.coalesce(F.sum(F.when(F.col("cohort") == 1, F.col("ppm"))), F.lit(0))
    return shares.groupBy("bin").agg(
        pa.cast("bigint").alias("share_a_ppm"),
        pb.cast("bigint").alias("share_b_ppm"),
        F.abs(pa - pb).cast("bigint").alias("drift_ppm"),
    )
