"""Spark 4 surfaces, part 6: the POLYMORPHIC Python UDTF — a table
function whose output schema is computed at plan time by a static
``analyze()`` from its literal arguments, consuming a TABLE(...)
input with PARTITION BY so ``eval`` streams one partition's rows and
``terminate`` emits the per-partition result.

`udtf_table_partition_stats`: called as

    SELECT * FROM partition_stats(
        TABLE(orders_cents) PARTITION BY user_id, 'cnt,sum,max')

the stat list is a LITERAL the planner hands to ``analyze()``, which
builds the output schema dynamically (ask for 'cnt,max' and the sum
column doesn't exist — schema polymorphism, not nullable padding).
Every stat is exact BIGINT over integer cents, so the UDTF carries a
full DuckDB oracle (plain GROUP BY) — the hash match certifies the
partition routing (no row leaks across PARTITION BY groups), the
streaming eval/terminate protocol, and the analyze-time schema.

Scale posture: TABLE + PARTITION BY shuffles once on the key and
streams each group through Python without materializing it (eval is
row-at-a-time but O(1) state per row — the protocol cost, paid only
where per-group logic genuinely needs Python; everything SQL-capable
stays in the engine per the repo rule). Output is O(groups).

Reference anchor: A9's per-group plan node
(syllabus_ai_graph.py:92-144) — a whole-group → one-result Python
function, here as the engine-native table-function form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_STATS = "cnt,sum,max"

_UDTF_STATS_ORACLE = """
SELECT o_custkey AS user_id,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS sum_cents,
       CAST(MAX(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS max_cents
FROM orders
GROUP BY o_custkey
"""


def _make_udtf():
    from pyspark.sql.types import LongType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeResult

    class PartitionStats:
        @staticmethod
        def analyze(table_arg, stats_arg):
            # Plan-time schema from the literal stat list: the schema
            # IS a function of the argument (polymorphic UDTF).
            names = [s.strip() for s in stats_arg.value.split(",")]
            fields = [StructField("user_id", LongType())]
            mapping = {
                "cnt": "cnt",
                "sum": "sum_cents",
                "max": "max_cents",
            }
            for n in names:
                if n not in mapping:
                    raise ValueError(f"unknown stat: {n!r}")
                fields.append(StructField(mapping[n], LongType()))
            return AnalyzeResult(schema=StructType(fields))

        def __init__(self):
            self._key = None
            self._cnt = 0
            self._sum = 0
            self._max = None
            self._stats = None

        def eval(self, row, stats):
            if self._stats is None:
                self._stats = [s.strip() for s in stats.split(",")]
            self._key = row["user_id"]
            c = row["cents"]
            self._cnt += 1
            self._sum += c
            self._max = c if self._max is None or c > self._max else self._max

        def terminate(self):
            if self._key is None:
                return
            out = [self._key]
            for s in self._stats:
                out.append(
                    {"cnt": self._cnt, "sum": self._sum, "max": self._max}[s]
                )
            yield tuple(out)

    return PartitionStats


@register("udtf_table_partition_stats", _UDTF_STATS_ORACLE)
def udtf_table_partition_stats(spark, sf_dir):
    from pyspark.sql.functions import udtf

    stats_udtf = udtf(_make_udtf())
    spark.udtf.register("partition_stats", stats_udtf)
    load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    ).createOrReplaceTempView("_udtf_orders_cents")
    return spark.sql(
        f"""
        SELECT * FROM partition_stats(
            TABLE(_udtf_orders_cents) PARTITION BY (user_id),
            '{_STATS}')
        """
    )
