"""Text-analysis function behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from syllabus_sense_spark.functions.text import (
    lang_id_heuristic,
    quality_score,
    token_count,
)


def test_token_count_and_quality(spark):
    df = spark.createDataFrame(
        [("one two  three",), ("",), ("a a a a",)], "text string"
    )
    rows = df.select(
        token_count(F.col("text")).alias("n"),
        quality_score(F.col("text")).alias("q"),
    ).collect()
    assert [r.n for r in rows] == [3, 0, 4]
    assert all(0.0 <= r.q <= 1.0 for r in rows)
    # Repetitive text scores below diverse text.
    assert rows[2].q < rows[0].q


def test_lang_id_cues(spark):
    df = spark.createDataFrame(
        [
            ("the thing and the king going strong",),
            ("der schlange ungefähr der schule",),
        ],
        "text string",
    )
    rows = df.select(lang_id_heuristic(F.col("text")).alias("g")).collect()
    assert rows[0].g == "en"
    assert rows[1].g == "de"


def test_lang_id_null_returns_und_sentinel(spark):
    # Public contract (round-11 ADVICE): NULL text must resolve to the
    # 'und' sentinel, never fall through the CASE chain to a concrete
    # language. Empty/cue-free text still argmaxes over zero scores
    # (ties -> lexicographically first lang), unchanged.
    df = spark.createDataFrame([(None,), ("",)], "text string")
    rows = df.select(lang_id_heuristic(F.col("text")).alias("g")).collect()
    assert rows[0].g == "und"
    assert rows[1].g == "de"
