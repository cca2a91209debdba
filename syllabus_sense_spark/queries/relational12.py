"""Runtime bloom-filter join pruning — Spark's row-level runtime
filter (SPARK-32268): when a shuffle join's build side carries a
selective predicate, the optimizer injects a `bloom_filter_agg` of
the build-side join keys and wraps the probe-side scan in
`might_contain`, so most non-matching lineitem rows are dropped AT
THE SCAN before paying the shuffle. At 100 TB this is the difference
between shuffling the full fact table and shuffling ~the matching
fraction — the single biggest lever on selective fact-dim shuffle
joins after partition pruning.

Harness posture: the feature is size-gated (application side must
look big, creation side small, and the join must not be about to
broadcast), so the query scopes the three gating confs to its own
execution — disabling auto-broadcast so the join genuinely shuffles,
thresholds widened so the tiny harness tables qualify — materializes
the (5-row) aggregate under those confs via `localCheckpoint`, then
RESTORES every conf before returning, so no other query's plan is
perturbed. Production keeps the defaults: real fact tables clear the
10 GB application-side bar on their own. The bloom filter is
semantically transparent (false positives only pre-filter; the join
still verifies), so the DuckDB oracle is the plain join — the hash
match certifies transparency while tests/test_round7_ops.py pins the
plan shape (bloom_filter_agg + might_contain present under the
scoped confs).

Reference anchor: none ([EXT] engine surface per SURVEY.md §2
Table B joins).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register
from ._util import dec2

_BLOOM_ORACLE = """
SELECT
  l.l_returnflag,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
       AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l.l_returnflag
"""

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def bloom_joined(spark, sf_dir):
    """The join+agg expression; callers scope the gating confs."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum((dec2("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
    )


class scoped_confs:
    """Set confs for a block, restoring prior values (or unsetting)."""

    def __init__(self, spark, confs):
        self.spark, self.confs, self.saved = spark, confs, {}

    def __enter__(self):
        for k, v in self.confs.items():
            self.saved[k] = self.spark.conf.get(k, None)
            self.spark.conf.set(k, v)
        return self

    def __exit__(self, *exc):
        for k, old in self.saved.items():
            if old is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, old)
        return False


@register("join_bloom_runtime_filter", _BLOOM_ORACLE)
def join_bloom_runtime_filter(spark, sf_dir):
    with scoped_confs(spark, _CONFS):
        # localCheckpoint materializes under the scoped confs (the
        # optimizer injects the bloom filter at this action); the
        # returned handle no longer depends on them. Rotated: the tiny
        # result checkpoint is released when the query next runs.
        from ._util import rotate_checkpoint

        return rotate_checkpoint(
            "relational12.join_bloom_runtime_filter",
            bloom_joined(spark, sf_dir).localCheckpoint(),
        )
