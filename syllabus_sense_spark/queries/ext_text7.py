"""[EXT] Collocation mining — adjacent-bigram lift over the document
corpus, the statistical companion to `bpe_first_merge_pairs` (raw
pair counts) and `text_tfidf_top_term` (term salience).

PMI's log is engine-rounding-prone, but its RANKING is preserved by
the raw lift p(xy)/(p(x)p(y)) — computed here entirely from the
bigram contingency table: lift = cnt_xy·N / (row_total·col_total)
with positional marginals (bigrams starting with x / ending with y),
so no separate unigram pass is needed and the marginals are exact by
construction. Emitted floor-scaled (×1e6) from one fixed-order IEEE
expression over exact integers (the BIGINT product cnt_xy·N·1e6
overflows beyond ~3e6 bigrams; double is the scale-safe form).

Scale posture: bigrams are generated map-side from each document
(posexplode over the token array — text never shuffles), reduced by
ONE map-side-combined groupBy; marginals are windows PARTITIONED by
the bigram's own keys (no global window); N joins in as a broadcast
1-row aggregate. Top-30 by (lift, pair) total order.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register

_MIN_COUNT = 5
_TOP = 30

_LIFT_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS ts FROM documents
),
big AS (
  SELECT ts[i] AS x, ts[i + 1] AS y
  FROM toks, UNNEST(range(1, len(ts))) AS t(i)
  WHERE ts[i] <> '' AND ts[i + 1] <> ''
),
cnt AS (
  SELECT x, y, COUNT(*) AS cnt_xy FROM big GROUP BY x, y
),
m AS (
  SELECT x, y, cnt_xy,
         SUM(cnt_xy) OVER (PARTITION BY x) AS cnt_x,
         SUM(cnt_xy) OVER (PARTITION BY y) AS cnt_y,
         (SELECT SUM(cnt_xy) FROM cnt) AS n_total
  FROM cnt
)
SELECT x, y, CAST(cnt_xy AS BIGINT) AS cnt_xy,
       CAST(cnt_x AS BIGINT) AS cnt_x, CAST(cnt_y AS BIGINT) AS cnt_y,
       CAST(FLOOR(CAST(cnt_xy AS DOUBLE) * CAST(n_total AS DOUBLE)
                  / (CAST(cnt_x AS DOUBLE) * CAST(cnt_y AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS lift_e6
FROM m
WHERE cnt_xy >= {_MIN_COUNT}
ORDER BY lift_e6 DESC, x ASC, y ASC
LIMIT {_TOP}
"""


@register("text_pmi_collocations", _LIFT_ORACLE)
def text_pmi_collocations(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("ts")
    )
    big = (
        docs.select(
            F.posexplode("ts").alias("i", "x"),
            F.col("ts"),
        )
        .select(
            "x", F.try_element_at("ts", F.col("i") + 2).alias("y")
        )
        .filter((F.col("x") != "") & F.col("y").isNotNull() & (F.col("y") != ""))
    )
    cnt = big.groupBy("x", "y").agg(F.count(F.lit(1)).alias("cnt_xy"))
    total = cnt.agg(F.sum("cnt_xy").alias("n_total"))
    m = (
        cnt.withColumn(
            "cnt_x", F.sum("cnt_xy").over(Window.partitionBy("x"))
        )
        .withColumn("cnt_y", F.sum("cnt_xy").over(Window.partitionBy("y")))
        .join(F.broadcast(total))
    )
    scored = m.filter(F.col("cnt_xy") >= _MIN_COUNT).select(
        "x",
        "y",
        F.col("cnt_xy").cast("bigint").alias("cnt_xy"),
        F.col("cnt_x").cast("bigint").alias("cnt_x"),
        F.col("cnt_y").cast("bigint").alias("cnt_y"),
        F.expr(
            "CAST(FLOOR(CAST(cnt_xy AS DOUBLE) * CAST(n_total AS DOUBLE)"
            " / (CAST(cnt_x AS DOUBLE) * CAST(cnt_y AS DOUBLE))"
            " * 1000000.0) AS BIGINT)"
        ).alias("lift_e6"),
    )
    return scored.orderBy(
        F.desc("lift_e6"), F.asc("x"), F.asc("y")
    ).limit(_TOP)
