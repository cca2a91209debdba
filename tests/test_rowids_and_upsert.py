"""Scale-pattern operators: global row ids without a single-task
window; partition-scoped copy-on-write upsert."""

from __future__ import annotations

from pyspark.sql import functions as F

from syllabus_sense_spark.operators.rowids import stable_row_ids
from syllabus_sense_spark.sinks.upsert import apply_changes, upsert_partitioned
from syllabus_sense_spark.tables import load


def test_stable_row_ids_ordered(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    withids = stable_row_ids(o, order_by=["o_totalprice", "o_orderkey"], num_partitions=8)
    rows = withids.orderBy("row_id").collect()
    n = len(rows)
    assert [r.row_id for r in rows] == list(range(n))
    # ids follow the requested global order.
    keys = [(r.o_totalprice, r.o_orderkey) for r in rows]
    assert keys == sorted(keys)


def test_stable_row_ids_unordered_contiguous(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id")
    ids = sorted(r.row_id for r in stable_row_ids(d).collect())
    assert ids == list(range(len(ids)))


def test_upsert_partition_scoped(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    base = (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.col("o_orderstatus").alias("part"),
        )
    )
    base.write.partitionBy("part").mode("overwrite").parquet(path)
    before = {r.o_orderkey: r.o_totalprice for r in spark.read.parquet(path).collect()}

    # Partition-scoped MERGE: change rows must target the key's actual
    # partition (as CDC feeds do) — pick victims that live in 'F'.
    some = [
        r.o_orderkey
        for r in spark.read.parquet(path).filter(F.col("part") == "F").limit(2).collect()
    ]
    changes = spark.createDataFrame(
        [
            (some[0], 1.5, "F", False),   # update
            (some[1], 0.0, "F", True),    # delete
            (99999999, 42.0, "F", False), # insert
        ],
        "o_orderkey long, o_totalprice double, part string, _deleted boolean",
    )
    touched = upsert_partitioned(spark, path, changes, ["o_orderkey"], "part")
    assert touched == ["F"]

    spark.catalog.clearCache()
    after = {r.o_orderkey: r.o_totalprice for r in spark.read.parquet(path).collect()}
    assert after[some[0]] == 1.5
    assert some[1] not in after
    assert after[99999999] == 42.0
    # Untouched keys (and untouched partitions byte-wise) unchanged.
    untouched = set(before) - {some[0], some[1]}
    assert all(after[k] == before[k] for k in untouched)


def test_apply_changes_pure_merge(spark):
    cur = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    ch = spark.createDataFrame(
        [(2, "B", False), (3, "c", False), (1, None, True)],
        "k long, v string, _deleted boolean",
    )
    out = {r.k: r.v for r in apply_changes(cur, ch, ["k"]).collect()}
    assert out == {2: "B", 3: "c"}


def test_apply_changes_version_dedup(spark):
    """A CDC batch holding several changes for one key resolves to the
    greatest version tuple when version_cols is passed; without it the
    documented precondition (one row per key) applies."""
    cur = spark.createDataFrame([(1, "a", 0)], "k long, v string, ver long")
    ch = spark.createDataFrame(
        [(1, "old", 1), (1, "new", 2), (2, "x", 1)],
        "k long, v string, ver long",
    )
    out = {r.k: (r.v, r.ver) for r in
           apply_changes(cur, ch, ["k"], version_cols=["ver"]).collect()}
    assert out == {1: ("new", 2), 2: ("x", 1)}
