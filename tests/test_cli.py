"""CLI parity with the reference driver script (main.py:14-22):
document in, topic-partitioned questions out."""

from __future__ import annotations

from pyspark.sql import functions as F

from syllabus_sense_spark.__main__ import main

REFERENCE_DOCX = "/root/reference/chemistry_form_1_2.docx"


def test_cli_end_to_end_real_document(spark, tmp_path):
    out = str(tmp_path / "questions")
    assert main([REFERENCE_DOCX, out]) == 0
    q = spark.read.parquet(out)
    assert q.count() > 0
    assert "topic" in q.columns  # partition column round-trips
    bad = q.filter(
        (F.size("choices") != 4)
        | (F.size(F.filter("choices", lambda c: c["is_correct"])) != 1)
    ).count()
    assert bad == 0


def test_cli_topics_limit(spark, tmp_path):
    full = str(tmp_path / "full")
    limited = str(tmp_path / "limited")
    assert main([REFERENCE_DOCX, full]) == 0
    assert main([REFERENCE_DOCX, limited, "--topics", "1"]) == 0
    q_full = spark.read.parquet(full)
    q_lim = spark.read.parquet(limited)
    assert q_lim.select("topic").distinct().count() == 1
    assert q_full.select("topic").distinct().count() > 1
    assert q_lim.count() < q_full.count()


def test_cli_curate_subcommand(spark, sf_dir, tmp_path, capsys):
    """curate: JSONL dump → quarantine/filter/dedup/pack/shards, with
    a one-line JSON funnel report."""
    import json as _json

    from syllabus_sense_spark.tables import load

    docs = [
        {"doc_id": r.doc_id, "source": r.source, "lang": r.lang, "text": r.text}
        for r in load(spark, sf_dir, "documents").limit(100).collect()
    ]
    dump = tmp_path / "corpus.jsonl"
    with open(dump, "w") as f:
        for d in docs:
            f.write(_json.dumps(d) + "\n")
        for d in docs[::4]:  # duplicates
            f.write(_json.dumps(d) + "\n")
        f.write("BROKEN {line\n")
    out = str(tmp_path / "shards")
    assert main(["curate", str(dump), out, "--shards", "4"]) == 0
    report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["quarantined"] == 1
    assert report["ingested"] == len(docs) + len(docs[::4])
    assert report["deduped"] <= len(docs)
    back = spark.read.parquet(out)
    assert back.count() == report["deduped"]
    assert {r["shard"] for r in back.select("shard").distinct().collect()} <= set(range(4))
    assert {"pack_id", "pack_offset"} <= set(back.columns)
