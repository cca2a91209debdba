"""Plan batching — the reference's pagination loop, recast as data.

Reference behavior (syllabus_ai_graph.py:146-182): consume the plan in
slices of ``batch_size`` (default 5, _base_syllabus_ai_graph_template.py:53),
advancing a cursor until exhausted; selected rows get
``status='generating'`` (:175-176).

Spark recasting: there is no cursor. A deterministic ``batch_id`` =
floor((row_number-1)/batch_size) over (group, order) turns the loop
into group parallelism — every batch is processed in one shuffle, and
the loop-decision node (A17) disappears from the plan entirely.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_batches(
    plan: DataFrame,
    batch_size: int = 5,
    group_cols: Sequence[str] = ("topic",),
    order_col: str = "question_id",
) -> DataFrame:
    """Add ``batch_id`` (0-based) within each group.

    All-but-last batches have exactly ``batch_size`` rows — the
    invariant the reference logs at syllabus_ai_graph.py:169-173.
    """
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    rn = F.row_number().over(w)
    return plan.withColumn("batch_id", F.floor((rn - F.lit(1)) / F.lit(batch_size)))


def mark_batch_status(plan: DataFrame, batch_id: int | None = None, status: str = "generating") -> DataFrame:
    """Conditional status update (reference: syllabus_ai_graph.py:175-176).

    With ``batch_id=None`` every row is marked (the batch-parallel
    semantics); otherwise only the selected batch.
    """
    cond = F.lit(True) if batch_id is None else (F.col("batch_id") == F.lit(batch_id))
    return plan.withColumn(
        "status", F.when(cond, F.lit(status)).otherwise(F.col("status"))
    )
