"""[EXT] Bloom-filter pre-filter for dedup-against-index — the
semi-join reduction that keeps an incremental dedup from shuffling
the whole batch.

`dedup_incremental_index` (ext_dedup2.py) probes a persisted
fingerprint index with an equi-join. At 100 TB the cheap win BEFORE
that join is a Bloom filter on the index: a bit-set small enough to
broadcast, such that a batch document whose bits are not all set
provably has no match and never enters the join. Spark injects this
pattern itself at the storage layer (runtime bloom pruning,
tests/test_join_hints.py); this operator is the USER-LEVEL mergeable
version with engine-independent hashes, so the filter can be built
once, persisted next to the index, and OR-merged across index
shards.

Construction (all exact integer arithmetic):
- key: 48-bit content fingerprint (md5 prefix — the convention every
  dedup operator here shares, ext_dedup.py:91);
- k=3 bit positions per key: pos_j = ((c_j · x) mod p) mod m with
  m = 16384, p = 2^31−1 — the Kirsch-Mitzenmacher style fixed
  multiplier family;
- the filter = the DISTINCT set of positions over the index half
  (docs with even doc_id); broadcast. (In production the positions
  aggregate into an m-bit bitmap — `bitmap_construct_agg` — the
  distinct-position table here is the same set in its oracle-exact
  form; membership semantics are identical.)
- probe: a batch doc (odd doc_id) is bloom-POSITIVE iff all 3 of its
  positions are set — counted via one broadcast join on position.

Output per probe doc: (doc_id, bloom_pos, is_dup) with is_dup the
ground truth (fingerprint present in the index). The Bloom contract
is visible in the data: is_dup = 1 ⇒ bloom_pos = 1 (no false
negatives — law-tested), while bloom_pos = 1 ∧ is_dup = 0 rows are
the false-positive mass the m/n ratio admits.

Scale posture: the filter is O(m) regardless of index size and
broadcast once; the probe side is filter + broadcast join + groupBy
on doc_id (no shuffle of the index, no shuffle of batch text).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_P = 2_147_483_647
_M = 16_384
_K_MULTS = [1_431_655_765, 1_583_420_449, 1_103_515_245]

# DuckDB spelling of the 48-bit md5-prefix fingerprint; the Spark
# side uses conv(hex, 16, 10) — same convention as ext_dedup.py:92.
_FP_SQL = "CAST(concat('0x', substr(md5(text), 1, 12)) AS BIGINT)"
_FP_SPARK = "CAST(conv(substr(md5(text), 1, 12), 16, 10) AS BIGINT)"


def _pos_sql(c: int, col: str) -> str:
    # reduce the 48-bit fp mod p FIRST so c·x stays inside BIGINT
    return f"(({c} * ({col} % {_P})) % {_P}) % {_M}"


_BLOOM_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, {_FP_SQL} AS fp FROM documents
),
index_bits AS (
  {" UNION ".join(
      f"SELECT DISTINCT {_pos_sql(c, 'fp')} AS pos FROM keyed WHERE doc_id % 2 = 0"
      for c in _K_MULTS
  )}
),
index_fps AS (
  SELECT DISTINCT fp FROM keyed WHERE doc_id % 2 = 0
),
probe AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, fp, {_pos_sql(c, 'fp')} AS pos FROM keyed WHERE doc_id % 2 = 1"
      for c in _K_MULTS
  )}
),
hits AS (
  SELECT p.doc_id, p.fp, COUNT(b.pos) AS n_set
  FROM probe p LEFT JOIN index_bits b ON b.pos = p.pos
  GROUP BY p.doc_id, p.fp
)
SELECT h.doc_id,
       CAST(CASE WHEN h.n_set = {len(_K_MULTS)} THEN 1 ELSE 0 END AS BIGINT)
         AS bloom_pos,
       CAST(CASE WHEN i.fp IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dup
FROM hits h LEFT JOIN index_fps i ON i.fp = h.fp
"""


@register("dedup_bloom_prefilter", _BLOOM_ORACLE)
def dedup_bloom_prefilter(spark, sf_dir):
    keyed = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_FP_SPARK).alias("fp")
    )
    index = keyed.filter(F.col("doc_id") % 2 == 0)
    batch = keyed.filter(F.col("doc_id") % 2 == 1)

    bits = None
    for c in _K_MULTS:
        b = index.select(F.expr(_pos_sql(c, "fp")).cast("bigint").alias("pos"))
        bits = b if bits is None else bits.unionAll(b)
    bits = bits.distinct()

    probe = None
    for c in _K_MULTS:
        p = batch.select(
            "doc_id", "fp", F.expr(_pos_sql(c, "fp")).cast("bigint").alias("pos")
        )
        probe = p if probe is None else probe.unionAll(p)

    hits = (
        probe.join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("doc_id", "fp")
        .agg(F.count(F.lit(1)).alias("n_set"))
    )
    # left join back so probes with zero set bits keep a row
    all_probes = batch.select("doc_id", "fp").distinct()
    index_fps = index.select("fp").distinct()
    return (
        all_probes.join(F.broadcast(hits.select("doc_id", "n_set")), "doc_id", "left")
        .join(
            F.broadcast(index_fps.withColumn("hit", F.lit(1))), "fp", "left"
        )
        .select(
            "doc_id",
            F.when(F.coalesce("n_set", F.lit(0)) == len(_K_MULTS), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("bloom_pos"),
            F.when(F.col("hit").isNotNull(), 1).otherwise(0).cast("bigint").alias("is_dup"),
        )
    )
