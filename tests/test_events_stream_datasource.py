"""DSv2 streaming Python DataSource contract tests: offset purity,
row-range partition planning, slice reads, and the end-to-end drain
equalling the batch table."""

from __future__ import annotations

from pyspark.sql import functions as F

from syllabus_sense_spark.sources.events_stream_datasource import (
    EventsReplayStreamReader,
    _RowRangePartition,
)


def _reader(sf_dir, **opts):
    options = {"path": f"{sf_dir}/events.parquet"}
    options.update({k.lower(): str(v) for k, v in opts.items()})
    return EventsReplayStreamReader(options)


def test_offsets_advance_by_batch_and_saturate(sf_dir):
    r = _reader(sf_dir, batchRows=400)
    assert r.initialOffset() == {"row": 0}
    offs = [r.latestOffset()["row"] for _ in range(100)]
    assert offs[0] == 400
    assert offs == sorted(offs)  # monotone
    assert offs[-1] == r._total  # saturates at the table size
    assert r.latestOffset()["row"] == r._total  # stable once drained


def test_partitions_cover_range_exactly(sf_dir):
    r = _reader(sf_dir, batchRows=1000, numPartitions=4)
    parts = r.partitions({"row": 100}, {"row": 1000})
    spans = [(p.start, p.end) for p in parts]
    assert spans[0][0] == 100 and spans[-1][1] == 1000
    for (_, a_end), (b_start, _) in zip(spans, spans[1:]):
        assert a_end == b_start  # contiguous, no gap/overlap
    # pure function of offsets: same inputs, same plan (replayability)
    assert spans == [(p.start, p.end) for p in r.partitions({"row": 100}, {"row": 1000})]


def test_slice_read_matches_row_range(spark, sf_dir):
    r = _reader(sf_dir)
    rows = list(r.read(_RowRangePartition(f"{sf_dir}/events.parquet", 5, 12)))
    assert len(rows) == 7
    empty = list(r.read(_RowRangePartition(f"{sf_dir}/events.parquet", 5, 5)))
    assert empty == []


def test_drain_equals_batch_table(spark, sf_dir):
    from syllabus_sense_spark.queries import QUERIES, load_all_queries
    from syllabus_sense_spark.tables import load

    load_all_queries()
    got = {
        r.event_type: (r.n_events, r.sum_user_id)
        for r in QUERIES["streaming_dsv2_replay_drain"](spark, sf_dir).collect()
    }
    want = {
        r.event_type: (r.n, r.s)
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("user_id").cast("bigint")).alias("s"),
        )
        .collect()
    }
    assert got == want
