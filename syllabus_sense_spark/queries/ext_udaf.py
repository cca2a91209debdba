"""[EXT] Grouped-aggregate pandas UDF — the last UDF flavor in the
engine's matrix (scalar `pandas_udf` → `pandas_udf_vowel_count`,
grouped-map `applyInPandas` → pipeline plan stage, 1→N `mapInPandas` →
DOCX scan / multimodal, UDTF → `udtf_chunk_documents`, stateful
`applyInPandasWithState` → streaming/stateful.py; GROUPED_AGG was the
one missing). The Spark-side shape: the whole group's column arrives
as one Arrow-backed pandas Series at the aggregation point — a custom
UDAF without writing a JVM Aggregator.

Determinism discipline: the aggregate must be ORDER-INDEPENDENT,
because the Series order reflects upstream partition arrival, which
Spark does not guarantee. A Python `sum()` over the Series would be
summation-order-dependent and could flap the oracle hash between
runs; `np.median` sorts internally, so it is a pure function of the
group's multiset. The same rule the JVM side follows (exact decimal
sums) applied to the Python seam.

Scale posture: grouped-agg UDFs get the normal partial-free hash
aggregate shuffle (all rows of a group to one task, Arrow-batched).
That is inherent to an arbitrary-function UDAF — fine for bounded
groups (5 event types here); for unbounded groups the move is a
two-level pre-bucket (operators/packing.py shows the pattern).

Oracle: DuckDB's exact `median` — both engines average the two middle
doubles for even counts with identical IEEE arithmetic, and the
output ships integer-scaled (floor(x*1e6) of bit-identical doubles)
per the repo's no-float-rounding rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..tables import load
from . import register

_MEDIAN_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(FLOOR(median(value) * 1000000) AS BIGINT) AS median_value_e6
FROM events
GROUP BY event_type
"""


def _udafs():
    # defined lazily: the decorator parses the DDL return type, which
    # needs an active SparkSession (module import happens before one
    # exists under the harness). Both aggregates are pandas UDFs:
    # Spark disallows mixing GROUPED_AGG pandas UDFs with built-in
    # aggregate functions in one agg ([INVALID_PANDAS_UDF_PLACEMENT]),
    # so the group count is a pandas aggregate too.
    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        # np.median sorts — order-independent, see module docstring
        return float(np.median(v.to_numpy()))

    @pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        return int(len(v))

    return median_udaf, count_udaf


@register("pandas_udaf_median_value", _MEDIAN_ORACLE)
def pandas_udaf_median_value(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    med, cnt = _udafs()
    return (
        e.groupBy("event_type")
        .agg(
            cnt(F.col("value")).alias("n_events"),
            med(F.col("value")).alias("med"),
        )
        .select(
            "event_type",
            "n_events",
            F.floor(F.col("med") * F.lit(1e6)).cast("bigint").alias(
                "median_value_e6"
            ),
        )
    )
