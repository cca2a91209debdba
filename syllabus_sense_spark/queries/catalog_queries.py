"""Managed-table catalog lifecycle — `saveAsTable` → SQL `INSERT
INTO … SELECT` → read back through the catalog.

Every other storage query addresses files by path; production Spark
addresses TABLES through a catalog (names, schemas, partitions,
INSERT INTO semantics). This query exercises that whole path in the
session catalog: create a partitioned managed table from one slice
of events, append a second slice with SQL DML, and aggregate the
read-back via ``spark.table`` — the oracle recomputes the union
straight from the source, so a hash match certifies (a) managed
CTAS writes all rows/partitions, (b) INSERT INTO appends without
clobbering, (c) the catalog read path resolves to the same data.

A uuid table name keeps repeated harness runs independent (each
check gets a fresh table in the warehouse dir); the table is dropped
by the next session teardown, not mid-query — the returned DataFrame
is lazy and must stay readable.

Scale posture: both writes are the ordinary partitioned parquet
append under a catalog entry; partition pruning on `event_type` is
what the catalog buys at 100 TB (the aggregate here reads all
partitions deliberately, proving completeness rather than pruning —
pruning evidence lives in tools/explain.py and the z-order tests).
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from ..tables import load
from . import register

_CATALOG_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id
FROM events
WHERE event_id % 3 IN (0, 1)
GROUP BY event_type
"""


@register("catalog_managed_table_roundtrip", _CATALOG_ORACLE)
def catalog_managed_table_roundtrip(spark, sf_dir):
    e = load(spark, sf_dir, "events").select("event_id", "event_type")
    tbl = f"events_cat_{uuid.uuid4().hex[:12]}"
    e.filter(F.col("event_id") % 3 == 0).write.partitionBy(
        "event_type"
    ).saveAsTable(tbl)
    e.filter(F.col("event_id") % 3 == 1).createOrReplaceTempView(f"{tbl}_batch2")
    spark.sql(f"INSERT INTO {tbl} SELECT event_id, event_type FROM {tbl}_batch2")
    return (
        spark.table(tbl)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("event_id").alias("sum_event_id"),
        )
    )
