"""Capstone integration: the full training-data path on real files —
JSONL ingest (with quarantine) → quality/lang filter → exact dedup →
deterministic split → balanced shard export → small-file compaction.

Every stage is an engine operator already verified in isolation; this
test proves they compose on disk artifacts the way a production run
would chain them.
"""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F

from syllabus_sense_spark.sinks.compact import compact_partitioned, partition_file_stats
from syllabus_sense_spark.sinks.shards import write_shards
from syllabus_sense_spark.sources.jsonl import read_documents_jsonl, split_quarantine
from syllabus_sense_spark.tables import load


def test_ingest_curate_export_roundtrip(spark, sf_dir, tmp_path):
    # 1. Stage a JSONL dump from the harness docs, with duplicates and
    #    a corrupt line mixed in (at-least-once + dirty reality).
    docs = [
        {"doc_id": r.doc_id, "source": r.source, "lang": r.lang, "text": r.text}
        for r in load(spark, sf_dir, "documents").collect()
    ]
    dump = tmp_path / "dump.jsonl"
    with open(dump, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
        for d in docs[::3]:  # re-delivered records (same content)
            f.write(json.dumps(d) + "\n")
        f.write("CORRUPT {not json\n")

    # 2. Ingest with quarantine.
    clean, quarantined = split_quarantine(read_documents_jsonl(spark, str(dump)))
    assert quarantined.count() == 1
    assert clean.count() == len(docs) + len(docs[::3])

    # 3. Curate: lang/quality filter, exact dedup by content hash.
    toks = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    quality = clean.filter(F.col("lang").isin("en", "fr", "es")).filter(
        F.size(toks) >= 5
    )
    curated = quality.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id"), F.first("lang").alias("lang")
    )
    n_curated = curated.count()
    # Dedup removed every re-delivered copy.
    assert n_curated == quality.select("text").distinct().count()

    # 4. Export as 4 balanced shards; read back and verify integrity.
    out = str(tmp_path / "export")
    write_shards(curated.select("doc_id", "lang"), out, n_shards=4)
    back = spark.read.parquet(out)
    assert back.count() == n_curated
    assert back.select("doc_id").distinct().count() == n_curated
    assert len(glob.glob(f"{out}/shard=*/*.parquet")) == 4

    # 5. Fragment one shard with extra appends, then compact it back.
    for i in range(3):
        spark.createDataFrame(
            [(10_000_000 + i, "en")], "doc_id long, lang string"
        ).withColumn("shard", F.lit(0)).write.partitionBy("shard").mode(
            "append"
        ).parquet(out)
    frag = partition_file_stats(out)["shard=0"][0]
    assert frag >= 4
    compacted = compact_partitioned(spark, out, ["shard"], target_file_bytes=1 << 26)
    assert "shard=0" in compacted
    spark.catalog.clearCache()
    assert partition_file_stats(out)["shard=0"][0] == 1
    assert spark.read.parquet(out).count() == n_curated + 3
