"""Schema evolution: read parquet written under drifting schemas and
conform it to a declared target.

Long-lived corpora accumulate files written by different pipeline
versions (new quality columns, dropped fields, widened types). Two
pieces:

- ``read_merged``: ``mergeSchema=true`` parquet read — Spark unions
  the footers' schemas; files lacking a column yield nulls. Footer
  merging is distributed (one task per footer), so the read scales
  with file count.
- ``conform``: project any DataFrame onto a declared target schema —
  missing columns appear as typed nulls, extra columns are dropped,
  matching columns are cast. A pure ``select`` (zero shuffle), so it
  composes with any downstream plan and keeps column pruning intact.

Reference anchor: the reference declares fixed Pydantic schemas and
maps nonconforming payloads to empty/default values
(syllabus_ai_graph.py:88-90); ``conform`` is the columnar version of
that discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..session import tune


def read_merged(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files disagree on schema."""
    tune(spark)
    return spark.read.option("mergeSchema", "true").parquet(path)


def conform(df: DataFrame, target: StructType) -> DataFrame:
    """Project ``df`` onto ``target``: cast matches, null-fill gaps,
    drop extras. Column matching is case-insensitive (parquet's
    resolution default)."""
    have = {f.name.lower(): f.name for f in df.schema.fields}
    cols = []
    for field in target.fields:
        src = have.get(field.name.lower())
        if src is None:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.col(src).cast(field.dataType).alias(field.name))
    return df.select(*cols)
