"""Scalar/aggregate function batch 3 — Spark 4 serialization surfaces
(XML, CSV single-row codecs) and bitmap-based exact distinct counts.

Oracle strategy: the XML/CSV strings themselves are engine-specific
formatting, so the queries ROUNDTRIP (struct → string → struct) and
output the extracted scalars — the DuckDB twin simply selects the
source columns, which is exactly what a correct roundtrip must equal.
The bitmap query's oracle is COUNT(DISTINCT ...): the bitmap pipeline
(bucket → construct_agg → or_agg → count) must reproduce the exact
distinct count, which is the whole point of the pattern — it is the
pre-aggregable form of COUNT(DISTINCT) (store per-bucket bitmaps,
merge later — same shape as the HLL sketches in ext_sketches.py but
EXACT, at bitmap-storage cost).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_XML_ORACLE = """
SELECT o_orderkey,
       o_orderstatus,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
FROM orders WHERE o_orderkey % 100 = 0
"""


@register("xml_functions_roundtrip", _XML_ORACLE)
def xml_functions_roundtrip(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    schema = "o_orderkey bigint, o_orderstatus string, total_price double"
    packed = o.select(
        F.to_xml(
            F.struct(
                F.col("o_orderkey"),
                F.col("o_orderstatus"),
                F.col("o_totalprice")
                .cast("decimal(18,2)")
                .cast("double")
                .alias("total_price"),
            )
        ).alias("xml")
    )
    return packed.select(
        F.from_xml(F.col("xml"), schema).alias("s")
    ).select("s.o_orderkey", "s.o_orderstatus", "s.total_price")


_CSV_ORACLE = """
SELECT o_orderkey,
       o_orderstatus,
       concat(CAST(o_orderkey AS VARCHAR), ',', o_orderstatus) AS csv_line
FROM orders WHERE o_orderkey % 100 = 0
"""


@register("csv_functions_roundtrip", _CSV_ORACLE)
def csv_functions_roundtrip(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    packed = o.select(
        F.to_csv(F.struct(F.col("o_orderkey"), F.col("o_orderstatus"))).alias(
            "csv_line"
        )
    )
    return packed.select(
        F.from_csv(F.col("csv_line"), "o_orderkey bigint, o_orderstatus string").alias(
            "s"
        ),
        "csv_line",
    ).select("s.o_orderkey", "s.o_orderstatus", "csv_line")


# bitmap_bit_position is 1-based (position x-1 for value x), so shift
# ids by +1 to keep id ranges starting at 0 exact.
_BITMAP_ORACLE = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_users
FROM events GROUP BY event_type
"""


@register("bitmap_distinct_users", _BITMAP_ORACLE)
def bitmap_distinct_users(spark, sf_dir):
    e = load(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") + 1).alias("uid")
    )
    per_bucket = e.groupBy(
        "event_type", F.expr("bitmap_bucket_number(uid)").alias("bucket")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(uid))").alias("bm"))
    return per_bucket.groupBy("event_type").agg(
        F.expr("sum(bitmap_count(bm))").cast("bigint").alias("n_distinct_users")
    )


