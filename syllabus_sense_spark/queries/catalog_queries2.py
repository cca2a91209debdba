"""Catalog batch 2 — layered temp VIEWs: the analyst-facing surface
where queries run against named views of views, not paths. Certifies
Catalyst's view resolution + inlining: a three-layer stack (filtered
base view → join view → aggregate view) must plan exactly like the
hand-inlined query — views are expansion-time macros, so predicate
pushdown and column pruning cross view boundaries for free (the
oracle IS the inlined form).

View names are uuid-fresh per run (harness sessions are shared);
views are dropped in a finally block so repeated runs don't leak
catalog entries.
"""

from __future__ import annotations

import uuid

from ..tables import load
from . import register

_VIEW_STACK_ORACLE = """
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
         AS cents
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
WHERE o.o_orderstatus = 'F'
GROUP BY c.c_mktsegment
"""


@register("catalog_view_stack", _VIEW_STACK_ORACLE)
def catalog_view_stack(spark, sf_dir):
    tag = uuid.uuid4().hex[:8]
    v_base, v_join, v_agg = (
        f"finished_orders_{tag}",
        f"orders_enriched_{tag}",
        f"segment_rollup_{tag}",
    )
    load(spark, sf_dir, "orders").createOrReplaceTempView(f"orders_{tag}")
    load(spark, sf_dir, "customer").createOrReplaceTempView(
        f"customer_{tag}"
    )
    try:
        spark.sql(
            f"CREATE OR REPLACE TEMP VIEW {v_base} AS "
            f"SELECT * FROM orders_{tag} WHERE o_orderstatus = 'F'"
        )
        spark.sql(
            f"CREATE OR REPLACE TEMP VIEW {v_join} AS "
            f"SELECT o.*, c.c_mktsegment FROM {v_base} o "
            f"JOIN customer_{tag} c ON c.c_custkey = o.o_custkey"
        )
        spark.sql(
            f"CREATE OR REPLACE TEMP VIEW {v_agg} AS "
            f"SELECT c_mktsegment AS segment, "
            f"CAST(COUNT(*) AS BIGINT) AS n_orders, "
            f"CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
            f" AS cents "
            f"FROM {v_join} GROUP BY c_mktsegment"
        )
        # materialize through the stack before the views are dropped;
        # rotated — the tiny result checkpoint is released when the
        # query next runs
        from ._util import rotate_checkpoint

        out = rotate_checkpoint(
            "catalog_queries2.view_stack.out",
            spark.table(v_agg).localCheckpoint(),
        )
    finally:
        for v in (v_agg, v_join, v_base, f"orders_{tag}", f"customer_{tag}"):
            spark.catalog.dropTempView(v)
    return out
