"""Spark 4 API surfaces, batch 2: the Arrow-native UDF variant and
the SQL LATERAL correlated subquery.

- `arrow_udf_doc_stats` — `mapInArrow`: the zero-pandas UDF tier
  (RecordBatch in, RecordBatch out, pyarrow.compute kernels, no
  pandas conversion cost), completing the Python-seam matrix:
  scalar pandas_udf / grouped-map / GROUPED_AGG / mapInPandas /
  UDTF / stateful — and now raw Arrow. The kernel computes exact
  integer per-doc token (single-space convention of the corpus) and
  char counts, so the Python seam stays hash-checkable: the DuckDB
  oracle reproduces the counts with plain string SQL. At scale this
  is the seam for vectorized tokenizers/featurizers that speak Arrow
  natively (HF tokenizers, polars) — the batch never materializes as
  pandas objects.
- `sql_lateral_topn` — correlated LATERAL subquery with ORDER
  BY/LIMIT: top-2 nations per region by customer count, the SQL-2016
  lateral form of top-n-per-group (the window formulation is covered
  by queries/windows.py; this certifies the *parser/decorrelation*
  path — Catalyst rewrites the lateral into the same join+window
  shape, `DomainJoin` decorrelation).

Reference parity: the reference has no Arrow/SQL surface at all;
these are engine-surface rows in SURVEY Table B (UDF matrix / SQL
dialect coverage).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_ARROW_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT)
         AS sum_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars
FROM documents
GROUP BY lang
"""


def _doc_stats_batches(batches):
    import pyarrow as pa
    import pyarrow.compute as pc

    for b in batches:
        text = b.column("text")
        spaces = pc.count_substring(text, " ")
        yield pa.RecordBatch.from_arrays(
            [
                b.column("lang"),
                pc.add(pc.cast(spaces, pa.int64()), 1),
                pc.cast(pc.utf8_length(text), pa.int64()),
            ],
            ["lang", "n_tokens", "n_chars"],
        )


@register("arrow_udf_doc_stats", _ARROW_ORACLE)
def arrow_udf_doc_stats(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("lang", "text")
    stats = d.mapInArrow(
        _doc_stats_batches, "lang string, n_tokens long, n_chars long"
    )
    return stats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.sum("n_chars").alias("sum_chars"),
    )


_LATERAL_SQL = """
SELECT r.r_name, l.n_name, l.n_customers
FROM {region} r, LATERAL (
  SELECT n.n_name, CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers
  FROM {nation} n JOIN {customer} c ON c.c_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name
  ORDER BY n_customers DESC, n.n_name
  LIMIT 2
) l
"""

_LATERAL_ORACLE = _LATERAL_SQL.format(
    region="region", nation="nation", customer="customer"
)


@register("sql_lateral_topn", _LATERAL_ORACLE)
def sql_lateral_topn(spark, sf_dir):
    for t in ("region", "nation", "customer"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"lat6_{t}")
    return spark.sql(
        _LATERAL_SQL.format(
            region="lat6_region", nation="lat6_nation", customer="lat6_customer"
        )
    )
