"""[EXT] Classifier evaluation — the row/column-normalized confusion matrix
for the language-ID heuristic (diagonal cells read directly as
per-class recall and precision) against the corpus's
ground-truth labels. Model evaluation is itself a first-class
pipeline operator (every curation classifier ships with this exact
report); composing the REGISTERED predictor query keeps one source
of truth for the model, and integer-ppm metrics keep the report
hash-checkable.

One pass over the predictor output: matrix counts from one groupBy,
class totals via windows partitioned on the matrix's own keys.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import register
from .pipeline_udf import _LANG_ORACLE, text_lang_id_heuristic

_CONFUSION_ORACLE = f"""
WITH pred AS ({_LANG_ORACLE}),
m AS (
  SELECT lang AS true_lang, lang_guess AS pred_lang, COUNT(*) AS n
  FROM pred GROUP BY 1, 2
)
SELECT true_lang, pred_lang, CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY true_lang)
            AS BIGINT) AS true_share_ppm,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY pred_lang)
            AS BIGINT) AS pred_share_ppm
FROM m
"""


@register("ml_eval_confusion_matrix", _CONFUSION_ORACLE)
def ml_eval_confusion_matrix(spark, sf_dir):
    pred = text_lang_id_heuristic(spark, sf_dir)
    m = pred.groupBy(
        F.col("lang").alias("true_lang"),
        F.col("lang_guess").alias("pred_lang"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w_true = Window.partitionBy("true_lang")
    w_pred = Window.partitionBy("pred_lang")
    return m.select(
        "true_lang",
        "pred_lang",
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "n * 1000000 DIV SUM(n) OVER (PARTITION BY true_lang)"
        ).alias("true_share_ppm"),
        F.expr(
            "n * 1000000 DIV SUM(n) OVER (PARTITION BY pred_lang)"
        ).alias("pred_share_ppm"),
    )
