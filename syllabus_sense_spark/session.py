"""SparkSession factory.

Reference parity note: the reference is single-threaded pure Python
(`/root/reference/README.md:42` lists async/distribution as future
work). Here the execution engine is Spark; this module centralizes the
conf we rely on: AQE (runtime re-planning, skew-join handling,
partition coalescing), Arrow (vectorized Python interop for the few
UDF stages), and UTC session time so timestamp semantics match the
DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs we also apply defensively to sessions we
# did not create (the driver hands us its own SparkSession).
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Coalesce post-shuffle partitions by target size, not local
    # parallelism: tiny shuffles collapse to one task instead of 32,
    # and at cluster scale reducers get full 64MB-targeted partitions.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The harness events.parquet stores TIMESTAMP(NANOS), which the
    # vectorized reader rejects; read as long and convert in the loader.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf to an existing session (idempotent)."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Some confs may be fixed by the owner of the session; the
            # engine still works, just potentially less optimally.
            pass
    return spark


def get_spark(app_name: str = "syllabus-sense-spark") -> SparkSession:
    """Create (or fetch) a SparkSession tuned for this engine.

    Local test runs honor ``SPARK_GRAFT_CPUS`` (default: all cores).
    On a real cluster the master/memory come from spark-submit; only
    the SQL confs below matter there.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
