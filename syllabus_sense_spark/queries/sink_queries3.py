"""Snapshot DIFF — the audit companion of the manifest sink: what
changed between two published versions of a table.

`sink_snapshot_timetravel` proves version pinning; this proves the
DIFF story a lakehouse debugging session actually needs ("what did
yesterday's job change?"): publish v1, OVERWRITE with v2 that both
drops and adds rows, then compute added/removed row sets by reading
the two manifests and anti-joining on the key — pure key-column
work, never a text/full-row shuffle (the same ids-only discipline as
the dedup family). A hash match against an oracle that rebuilds the
same two sets relationally certifies that overwrite-mode publish
replaces the referenced file set exactly (no leakage of v1 files
into v2, no loss of shared rows).

Scale posture: both snapshot reads prune to the key + group columns
(column-pruned parquet scans of only the files each manifest
references); the two anti joins shuffle ids only; the output is a
2×type rollup. Diff-at-scale is a key-partitioned anti join — the
one shape that does NOT need the table format to store row-level
change logs.
"""

from __future__ import annotations


from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import scratch_dir

# v1 = ids ≡ 0 (mod 3); v2 drops ids ≡ 0 (mod 15) and adds ids ≡ 1 (mod 3)
_DIFF_ORACLE = """
SELECT 'added' AS change_type, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS sum_event_id
FROM events WHERE event_id % 3 = 1 GROUP BY event_type
UNION ALL
SELECT 'removed', event_type,
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(event_id) AS BIGINT)
FROM events WHERE event_id % 15 = 0 GROUP BY event_type
"""


@register("sink_snapshot_diff", _DIFF_ORACLE)
def sink_snapshot_diff(spark, sf_dir):
    from ..sinks.snapshots import read_snapshot, write_snapshot

    e = load(spark, sf_dir, "events").select("event_id", "event_type")
    table = scratch_dir("snap_diff_")
    v1_rows = e.filter(F.col("event_id") % 3 == 0)
    v2_rows = e.filter(
        ((F.col("event_id") % 3 == 0) & (F.col("event_id") % 15 != 0))
        | (F.col("event_id") % 3 == 1)
    )
    v1 = write_snapshot(v1_rows, table)
    v2 = write_snapshot(v2_rows, table, mode="overwrite")
    assert (v1, v2) == (1, 2), (v1, v2)

    old = read_snapshot(spark, table, version=1).select("event_id", "event_type")
    new = read_snapshot(spark, table, version=2).select("event_id", "event_type")

    def rollup(df, tag):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("event_id").alias("sum_event_id"),
        ).select(
            F.lit(tag).alias("change_type"), "event_type", "n_rows", "sum_event_id"
        )

    added = new.join(old.select("event_id"), "event_id", "left_anti")
    removed = old.join(new.select("event_id"), "event_id", "left_anti")
    return rollup(added, "added").unionByName(rollup(removed, "removed"))
