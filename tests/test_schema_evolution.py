"""Schema-evolution reads: mergeSchema union + conform projection."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from syllabus_sense_spark.sources.evolution import conform, read_merged

TARGET = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("quality", DoubleType()),
    ]
)


@pytest.fixture()
def drifting_dir(spark, tmp_path):
    path = str(tmp_path / "corpus")
    v1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    v1.write.mode("append").parquet(path)
    # later pipeline version added lang + quality (as float, narrower
    # than the declared double — mergeSchema unions added columns;
    # type widening is conform's job)
    v2 = spark.createDataFrame(
        [(3, "gamma", "en", 0.5)],
        "doc_id long, text string, lang string, quality float",
    )
    v2.write.mode("append").parquet(path)
    return path


def test_merge_schema_unions_columns(spark, drifting_dir):
    df = read_merged(spark, drifting_dir)
    assert {f.name for f in df.schema.fields} == {
        "doc_id",
        "text",
        "lang",
        "quality",
    }
    rows = {r.doc_id: r for r in df.collect()}
    assert rows[1].lang is None and rows[1].quality is None
    assert rows[3].lang == "en"


def test_conform_casts_fills_and_drops(spark, drifting_dir):
    df = read_merged(spark, drifting_dir).withColumn("extra", F.lit(1))
    out = conform(df, TARGET)
    assert out.schema == TARGET
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[3].quality == 0.5 and isinstance(rows[3].quality, float)
    assert "extra" not in out.columns


def test_conform_on_empty_source_yields_typed_nulls(spark):
    df = spark.createDataFrame([(7,)], "doc_id long")
    out = conform(df, TARGET)
    assert out.schema == TARGET
    row = out.collect()[0]
    assert row.text is None and row.quality is None
