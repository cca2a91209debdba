"""Spark 4 surfaces, part 5: the Arrow-native grouped-map UDF family
— ``groupBy().applyInArrow`` and
``groupBy().cogroup(...).applyInArrow`` — completing the UDF matrix
(scalar pandas / grouped-map pandas / mapInPandas / mapInArrow /
UDTF / pandas UDAF / stateful already driver-checked; these are the
zero-pandas grouped forms: one pyarrow.Table per group, no
DataFrame materialization, the lowest-overhead Python seam Spark
offers for per-group logic).

Both queries keep every computation in exact integers inside
pyarrow.compute, so unlike most UDF seams they carry full DuckDB
oracles — the hash match certifies the Arrow path end to end
(grouping, batch assembly, int64 arithmetic, schema mapping).

`arrow_grouped_doc_stats`: per-language doc stats with the packed
integer argmax for the longest document.

`arrow_cogroup_order_event_stats`: cogrouped per-customer
order-count × event-count — the FULL OUTER shape (a key present on
either side produces a row; the absent side contributes zero), which
is exactly what cogroup gives for free and a single groupBy cannot.

Scale posture: one shuffle per grouped input (cogroup co-partitions
both sides on the key); each group crosses into Python once as an
Arrow batch; outputs are O(groups). At 100 TB the per-group tables
must fit a worker — true here (groups are per-lang / per-customer),
and the docstring contract the API itself carries.

Reference anchor: A8/A9/A13 seams (syllabus_ai_graph.py:45-271) —
the reference's per-group Python nodes, in their cheapest Spark form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_PACK = 10_000_000

_GROUPED_ORACLE = f"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(MAX(n_chars * {_PACK} + doc_id) % {_PACK} AS BIGINT)
         AS longest_doc
FROM documents
GROUP BY lang
"""


@register("arrow_grouped_doc_stats", _GROUPED_ORACLE)
def arrow_grouped_doc_stats(spark, sf_dir):
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(table: pa.Table) -> pa.Table:
        packed = pc.add(
            pc.multiply(table["n_chars"], pa.scalar(_PACK, pa.int64())),
            table["doc_id"],
        )
        return pa.table(
            {
                "lang": pa.array([table["lang"][0].as_py()], pa.string()),
                "n_docs": pa.array([table.num_rows], pa.int64()),
                "total_chars": pa.array(
                    [pc.sum(table["n_chars"]).as_py()], pa.int64()
                ),
                "max_chars": pa.array(
                    [pc.max(table["n_chars"]).as_py()], pa.int64()
                ),
                "longest_doc": pa.array(
                    [pc.max(packed).as_py() % _PACK], pa.int64()
                ),
            }
        )

    d = load(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    return d.groupBy("lang").applyInArrow(
        stats,
        schema=(
            "lang string, n_docs long, total_chars long, max_chars long,"
            " longest_doc long"
        ),
    )


_COGROUP_ORACLE = """
WITH o AS (
  SELECT o_custkey AS user_id, COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
),
e AS (
  SELECT user_id, COUNT(*) AS n_events
  FROM events GROUP BY user_id
)
SELECT COALESCE(o.user_id, e.user_id) AS user_id,
       CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events
FROM o FULL OUTER JOIN e ON o.user_id = e.user_id
"""


@register("arrow_cogroup_order_event_stats", _COGROUP_ORACLE)
def arrow_cogroup_order_event_stats(spark, sf_dir):
    import pyarrow as pa

    def combine(left: pa.Table, right: pa.Table) -> pa.Table:
        key = (
            left["user_id"][0].as_py()
            if left.num_rows
            else right["user_id"][0].as_py()
        )
        return pa.table(
            {
                "user_id": pa.array([key], pa.int64()),
                "n_orders": pa.array([left.num_rows], pa.int64()),
                "n_events": pa.array([right.num_rows], pa.int64()),
            }
        )

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id")
    )
    e = load(spark, sf_dir, "events").select("user_id")
    return (
        o.groupBy("user_id")
        .cogroup(e.groupBy("user_id"))
        .applyInArrow(
            combine, schema="user_id long, n_orders long, n_events long"
        )
    )
