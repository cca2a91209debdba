"""Marker-based sessionization — the core "GROUP BY" of the reference.

Reference behavior (document_parser/syllabus_parser.py:118-154): walk
elements in document order; each marker row starts a new topic; every
following row belongs to that topic until the next marker; rows before
the first marker are discarded (:147-149).

Spark recasting: a running count of marker rows over a window
partitioned by document gives each element its topic ordinal; the
pre-marker preamble is exactly ``topic_id == 0``. This is one shuffle
on ``doc_id`` and scales horizontally: at 100 TB the window never sees
more than one document per partition group, so no global sort exists
anywhere in the plan (SURVEY.md §7 risk 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_elements(
    elements: DataFrame,
    marker_col: str = "is_topic_marker",
    doc_col: str = "doc_id",
    order_col: str = "element_idx",
) -> DataFrame:
    """Assign each element a ``topic_id`` (marker ordinal within doc).

    Rows before the first marker get ``topic_id == 0`` and are dropped,
    mirroring the reference's preamble discard
    (syllabus_parser.py:147-149).
    """
    w = (
        Window.partitionBy(doc_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return elements.withColumn(
        "topic_id", F.sum(F.col(marker_col).cast("long")).over(w)
    ).filter(F.col("topic_id") > 0)


def extract_title(text_col, marker: str):
    """Title = marker text minus the identifier, trimmed of ``\" -:\"``.

    Mirrors syllabus_parser.py:85-93 (substring removal + strip of
    spaces, dashes and colons) as built-in expressions.
    """
    stripped = F.regexp_replace(text_col, F.lit(marker), F.lit(""))
    return F.regexp_replace(stripped, r"^[\s\-:]+|[\s\-:]+$", "")


def group_topics(
    sessionized: DataFrame,
    marker: str = "Core element",
    doc_col: str = "doc_id",
    order_col: str = "element_idx",
) -> DataFrame:
    """Collapse sessionized elements into one row per topic.

    Output mirrors ``SyllabusTopic.to_dict()``
    (document_parser/data_types.py:100-120): title from the marker row,
    non-marker elements nested in document order. ``sort_array`` over
    ``struct(element_idx, ...)`` keeps intra-topic order deterministic
    without any global sort.
    """
    title = F.first(
        F.when(F.col("is_topic_marker"), extract_title(F.col("text"), marker)),
        ignorenulls=True,
    ).alias("title")
    elements = F.transform(
        F.sort_array(
            F.collect_list(
                F.when(
                    ~F.col("is_topic_marker"),
                    F.struct(
                        F.col(order_col).alias("idx"),
                        F.col("element_type").alias("type"),
                        F.col("text").alias("text"),
                        F.col("rows").alias("rows"),
                    ),
                )
            )
        ),
        lambda e: F.struct(e["type"].alias("type"), e["text"].alias("text"), e["rows"].alias("rows")),
    ).alias("elements")
    return sessionized.groupBy(doc_col, "topic_id").agg(title, elements)
