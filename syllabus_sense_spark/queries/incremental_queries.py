"""Driver-verifiable incremental rollup maintenance — converts the
operators/incremental.py pytest evidence into a CORRECTNESS row (the
last Table B component without one).

The query stages the real maintenance lifecycle in a temp workspace:

1. land the events table as a day-partitioned parquet layout (the
   standing pipeline's source);
2. seed the rollup table from the FIRST half of the days (yesterday's
   state);
3. run ``incremental_rollup`` — it must diff partitions, scan ONLY the
   missing later days (partition pruning), and append their
   aggregates; the query asserts the processed-partition list is
   exactly the later half;
4. read the final rollup back and return it — the DuckDB oracle is the
   straight full recompute over events, so the hash match proves
   incremental maintenance ≡ full recompute.

Aggregates follow the exact-decimal discipline (SUM of DECIMAL(18,2),
one final double cast). The only driver-side materializations are the
day list and the processed-partition list — metadata-sized, the
allowlisted shape.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..operators.incremental import incremental_rollup
from ..tables import load
from . import register
from ._util import scratch_dir

_INC_ORACLE = """
SELECT CAST(ts AS DATE) AS day,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("incremental_rollup_daily", _INC_ORACLE)
def incremental_rollup_daily(spark, sf_dir):
    e = load(spark, sf_dir, "events").withColumn("day", F.col("ts").cast("date"))
    tmp = scratch_dir("inc_rollup_")
    src_path = os.path.join(tmp, "events_by_day")
    roll_path = os.path.join(tmp, "rollup")
    e.write.partitionBy("day").mode("overwrite").parquet(src_path)

    def agg(df):
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("dec_total"),
        )

    days = sorted(r.day for r in e.select("day").distinct().collect())
    split = days[len(days) // 2]
    agg(e.filter(F.col("day") <= F.lit(split))).write.partitionBy("day").mode(
        "overwrite"
    ).parquet(roll_path)
    processed = incremental_rollup(spark, src_path, roll_path, "day", agg)
    expect = [str(d) for d in days if d > split]
    assert processed == expect, (
        f"incremental step touched {processed}, expected exactly the "
        f"missing later partitions {expect}"
    )
    out = spark.read.parquet(roll_path)
    return out.select(
        F.col("day").cast("date").alias("day"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("dec_total").cast("double").alias("total_value"),
    )
