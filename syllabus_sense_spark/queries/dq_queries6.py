"""DQ batch 6 — declarative rules engine: the expectations surface
(`syllabus_sense_spark.expectations`, pytest-certified) as a
driver-visible query. A RULE TABLE of (rule_id, predicate) pairs is
compiled into ONE conditional-aggregation pass over orders — the
single-scan evaluation a 100 TB gate requires (evaluating rules one
scan each re-reads the fact table |rules| times; the compiled form
costs one). Output per rule: evaluated count, violations, pass ppm —
the report a data contract publishes per batch.

Rules are ordinary SQL predicates, so the oracle IS the same rule
set inlined — the compilation step (rows → columns → stack) is what
is being certified.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

# (rule_id, SQL predicate over orders) — violation = predicate FALSE
_RULES: list[tuple[str, str]] = [
    ("totalprice_positive", "o_totalprice > 0"),
    ("status_known", "o_orderstatus IN ('O', 'F', 'P')"),
    ("priority_wellformed", "o_orderpriority RLIKE '^[1-5]-'"),
    ("orderdate_in_range", "o_orderdate >= TIMESTAMP '1990-01-01'"),
    ("custkey_positive", "o_custkey > 0"),
]

_RULES_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{rid}' AS rule_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {pred.replace("RLIKE", "SIMILAR TO").replace("'^[1-5]-'", "'[1-5]-.*'")} THEN 0 ELSE 1 END) AS BIGINT)
         AS n_violations,
       CAST(SUM(CASE WHEN {pred.replace("RLIKE", "SIMILAR TO").replace("'^[1-5]-'", "'[1-5]-.*'")} THEN 1 ELSE 0 END) AS BIGINT)
         * 1000000 // COUNT(*) AS pass_ppm
FROM orders"""
    for rid, pred in _RULES
)


@register("dq_rules_engine", _RULES_ORACLE)
def dq_rules_engine(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.expr(f"CASE WHEN {pred} THEN 0 ELSE 1 END")).alias(
                f"v_{i}"
            )
            for i, (_, pred) in enumerate(_RULES)
        ],
    )
    stack = ", ".join(
        f"'{rid}', v_{i}" for i, (rid, _) in enumerate(_RULES)
    )
    return agg.select(
        F.expr(f"stack({len(_RULES)}, {stack}) AS (rule_id, n_violations)"),
        "n_rows",
    ).select(
        "rule_id",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
        F.expr(
            "(n_rows - n_violations) * 1000000 DIV n_rows"
        ).alias("pass_ppm"),
    )
