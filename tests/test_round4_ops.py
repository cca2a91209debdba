"""Law tests for the round-4 operators (each also oracle-checked via
the harness; these assert the *structural* invariants the hash can't
express)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_semantic_dedup_finds_every_planted_pair(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_semdedup import (
        _PLANT_BASE,
        dedup_semantic_clusters,
    )
    from syllabus_sense_spark.tables import load

    res = dedup_semantic_clusters(spark, sf_dir).collect()
    n_planted_docs = (
        load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 11 == 0).count()
    )
    # every planted copy landed in some cluster...
    assert sum(r.n_planted for r in res) == n_planted_docs
    # ...each cluster keeps exactly one canonical representative and
    # has at least one partner for every planted member
    for r in res:
        assert r.n_kept == 1
        assert r.cluster_size >= 2


def test_shuffle_shards_contiguous_and_deterministic(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_training3 import (
        _N_SHARDS,
        training_shuffle_shards,
    )

    a = training_shuffle_shards(spark, sf_dir).collect()
    b = training_shuffle_shards(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # rerun-stable
    by_shard: dict[int, list[int]] = {}
    for r in a:
        assert 0 <= r.shard_id < _N_SHARDS
        by_shard.setdefault(r.shard_id, []).append(r.position)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_incremental_dedup_matches_each_planted_revision(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_dedup2 import (
        _NEW_BASE,
        dedup_incremental_index,
    )
    from syllabus_sense_spark.tables import load

    res = dedup_incremental_index(spark, sf_dir).collect()
    planted = {
        r.doc_id
        for r in load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 13 == 0)
        .select("doc_id")
        .collect()
    }
    # every revised arrival matched its own original above threshold
    self_matches = {
        (r.new_id - _NEW_BASE)
        for r in res
        if r.old_id == r.new_id - _NEW_BASE
    }
    assert self_matches == planted
    assert all(0 < r.jaccard <= 1.0 for r in res)


def test_conversion_rates_are_consistent(spark, sf_dir):
    from syllabus_sense_spark.queries.events5 import events_conversion_within_7d

    rows = events_conversion_within_7d(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_conversions <= r.n_views
        assert r.conversion_rate == r.n_conversions / r.n_views


def test_fk_integrity_all_pass_on_clean_harness(spark, sf_dir):
    from syllabus_sense_spark.queries.dq_queries import dq_check_fk_integrity

    rows = dq_check_fk_integrity(spark, sf_dir).collect()
    assert len(rows) == 4
    assert all(r.passed and r.n_orphans == 0 for r in rows)


def test_compression_ratio_laws(spark, sf_dir):
    from syllabus_sense_spark.queries.ext_text4 import text_compression_ratio

    rows = text_compression_ratio(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.compression_ratio < 1.5
    # the harness corpus draws from a ~30-word vocabulary: repetitive
    # text must compress well on average
    avg = sum(r.compression_ratio for r in rows) / len(rows)
    assert avg < 0.7


def test_compression_ratio_pins_zlib_output_exactly(spark, sf_dir):
    """zlib is deterministic at a fixed level: the query's ratio must
    equal round(len(zlib.compress(text, 6)) / len(text), 6) replayed
    independently here — an exact check, not a band (the strongest
    check a no-zlib-in-DuckDB rows-only query can bear)."""
    import zlib

    from syllabus_sense_spark.queries.ext_text4 import text_compression_ratio
    from syllabus_sense_spark.tables import load

    texts = {
        r.doc_id: r.text
        for r in load(spark, sf_dir, "documents")
        .filter("doc_id < 25")
        .select("doc_id", "text")
        .collect()
    }
    rows = text_compression_ratio(spark, sf_dir).filter("doc_id < 25").collect()
    assert len(rows) == len(texts) > 0
    for r in rows:
        t = texts[r.doc_id]
        expected = (
            round(len(zlib.compress(t.encode("utf-8"), 6)) / len(t), 6)
            if t
            else None
        )
        assert r.compression_ratio == expected, r.doc_id


def test_compression_ratio_orders_repetitive_below_random(spark):
    import hashlib

    from syllabus_sense_spark.queries.ext_text4 import text_compression_ratio

    # planted: pure repetition vs a deterministic high-entropy string
    # (md5 chain — ~4 bits/char, incompressible for zlib)
    rep = "spark " * 200
    rng = "".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(40)
    )
    df = spark.createDataFrame(
        [(1, rep, "s"), (2, rng, "s")], "doc_id long, text string, source string"
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        from syllabus_sense_spark.tables import load as _load  # cache-key by dir

        rows = {
            r.doc_id: r.compression_ratio
            for r in text_compression_ratio(spark, td).collect()
        }
    assert rows[1] < 0.05
    assert rows[2] > rows[1] * 5
