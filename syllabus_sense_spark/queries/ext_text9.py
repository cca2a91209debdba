"""[EXT] Zipf rank-frequency profile — the second corpus-statistics
law check beside `text_vocab_growth` (Heaps): top-50 terms by
frequency with their rank and the rank·frequency product (constant
under ideal Zipf — drift in the product is the template-corpus /
boilerplate smell test, no logarithms needed).

ONE map-side-combined token count, then a top-k (TakeOrdered — never
a global sort of the vocabulary); total (freq DESC, token ASC) order
makes ranks deterministic.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register

_TOP = 50

_ZIPF_ORACLE = f"""
WITH toks AS (
  SELECT UNNEST(list_filter(string_split(text, ' '),
                            x -> length(x) > 0)) AS tok
  FROM documents
),
freq AS (
  SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok
),
ranked AS (
  SELECT tok, freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, tok ASC) AS rank
  FROM freq
)
SELECT tok, CAST(rank AS BIGINT) AS rank, CAST(freq AS BIGINT) AS freq,
       CAST(rank * freq AS BIGINT) AS rank_freq_product
FROM ranked WHERE rank <= {_TOP}
"""


@register("text_zipf_profile", _ZIPF_ORACLE)
def text_zipf_profile(spark, sf_dir):
    toks = load(spark, sf_dir, "documents").select(
        F.explode(
            F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
        ).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    top = freq.orderBy(F.desc("freq"), F.asc("tok")).limit(_TOP)
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    return top.select(
        "tok",
        F.row_number().over(w).cast("bigint").alias("rank"),
        F.col("freq").cast("bigint").alias("freq"),
        (F.row_number().over(w) * F.col("freq"))
        .cast("bigint")
        .alias("rank_freq_product"),
    )
