"""Events replay as a streaming Python DataSource (DSv2 streaming API)
— the custom streaming connector surface, closing the one deferred
source-API row in SURVEY §2.

``spark.readStream.format("events_replay").option("path", dir)`` reads
the static events parquet as an offset-tracked micro-batch stream: the
driver plans row-range offsets, each micro-batch splits its range into
``numPartitions`` slices, and every task reads ONLY its slice via
pyarrow (row-group pruned) — so ingest parallelizes executor-side like
a real source, unlike the driver-prefetching
``SimpleDataSourceStreamReader``.

Offset model (the part the DSv2 contract is really about):
``{"row": n}`` = "rows [0, n) are ingested". ``latestOffset`` advances
by ``batchRows`` per micro-batch, so a drain replays the table in
deterministic chunks; restart-from-checkpoint replays exactly the
committed row ranges because ``partitions(start, end)`` is a pure
function of the offsets. At 100 TB the same model holds with file
(path, row-group) pairs instead of global row numbers.

Reference parity: the reference's only iterator source is the
topic-at-a-time document cursor (syllabus_parser.py:97-116); this is
that cursor as a Spark streaming connector with replayable offsets.

Columns exclude ``ts`` deliberately: the two shipped physical ts
encodings are a batch-loader concern (tables.load); the connector
certifies the offset/partition/read contract, not timestamp decode.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENTS_REPLAY_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

_COLUMNS = [f.name for f in EVENTS_REPLAY_SCHEMA.fields]


class _RowRangePartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class EventsReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("events_replay requires .option('path', <events.parquet>)")
        self._batch_rows = int(options.get("batchrows", 4096))
        self._num_partitions = int(options.get("numpartitions", 8))
        self._total = self._count_rows()

    def _count_rows(self) -> int:
        # Metadata-only: parquet footer row count, no data read.
        import pyarrow.parquet as pq

        return pq.ParquetFile(self._path).metadata.num_rows

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        # Advance one batch per micro-batch; a live source would return
        # its current high-watermark here instead.
        if not hasattr(self, "_current"):
            self._current = 0
        self._current = min(self._current + self._batch_rows, self._total)
        return {"row": self._current}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["row"]), int(end["row"])
        if hi <= lo:
            return [_RowRangePartition(self._path, lo, lo)]
        span = max(1, (hi - lo + self._num_partitions - 1) // self._num_partitions)
        return [
            _RowRangePartition(self._path, s, min(s + span, hi))
            for s in range(lo, hi, span)
        ]

    def read(self, partition: _RowRangePartition) -> Iterator[tuple]:
        # Executor-side: read only this slice's row groups, then trim
        # to the exact range — pyarrow skips row groups entirely
        # outside [start, end).
        import pyarrow.parquet as pq

        if partition.end <= partition.start:
            return iter(())
        pf = pq.ParquetFile(partition.path)
        out = []
        row0 = 0
        for rg in range(pf.metadata.num_row_groups):
            n = pf.metadata.row_group(rg).num_rows
            rg_lo, rg_hi = row0, row0 + n
            row0 += n
            if rg_hi <= partition.start or rg_lo >= partition.end:
                continue
            tbl = pf.read_row_group(rg, columns=_COLUMNS)
            lo = max(partition.start - rg_lo, 0)
            hi = min(partition.end - rg_lo, n)
            out.append(tbl.slice(lo, hi - lo))
        for tbl in out:
            yield from zip(*(tbl.column(c).to_pylist() for c in _COLUMNS))

    def commit(self, end: dict) -> None:
        pass


class EventsReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self) -> StructType:
        return EVENTS_REPLAY_SCHEMA

    def streamReader(self, schema: StructType) -> EventsReplayStreamReader:
        return EventsReplayStreamReader(self.options)


def register_events_replay(spark) -> None:
    """Idempotent format registration."""
    spark.dataSource.register(EventsReplayDataSource)
