"""[EXT] Training-data curation primitives, batch 2: source-mixture
resampling and sequence packing — the two steps between a curated
corpus and an actual training run.

- ``mixture_resample_to_target``: rebalance the corpus toward a
  target mixture (uniform across sources here) under a global token
  budget. Per-source keep-rates are *data-dependent* (computed from
  the observed source sizes), unlike the fixed-rate stratified
  sampler in ext_training.py. Two passes at scale: a tiny per-source
  stats aggregate (broadcast back), then a pure hash-filter pass —
  no shuffle of the corpus itself, reproducible across engines and
  cluster sizes because the sample predicate is md5(doc_id), not RNG.
- ``pack_sequences_greedy``: concatenate-and-chunk packing — assign
  every document a training-sequence id and offset as if the corpus
  were tokenized, concatenated in (source, doc_id) order, and cut
  into fixed 4096-token blocks (documents may straddle blocks, the
  GPT-style packing). One window cumsum per source partition; exact
  integer math end-to-end, so the oracle matches bit-for-bit.

Reference anchor: the reference's batching (syllabus_ai_graph.py:163-167)
slices work into fixed-size batches; packing is the corpus-scale
analogue with a capacity measured in tokens, not rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

# --- mixture resampling under a token budget -------------------------------
# Budget = 50% of total corpus chars, spread uniformly over sources;
# sources smaller than their allotment are kept whole (rate capped at
# 1), large sources are hash-downsampled. All doubles derive from
# exact BIGINT sums through an identical operation sequence in both
# engines, and the keep threshold is floored to an integer before the
# compare — no float-boundary flakiness.

_MIXTURE_ORACLE = """
WITH stats AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS src_chars
  FROM documents GROUP BY source
),
rates AS (
  SELECT source, n_docs, src_chars,
         CAST(floor(least(
           1.0,
           (CAST((SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents) AS DOUBLE)
             * 0.5 / (SELECT COUNT(*) FROM stats))
             / CAST(src_chars AS DOUBLE)
         ) * 1000000) AS BIGINT) AS keep_ppm
  FROM stats
),
kept AS (
  SELECT d.source, d.n_chars
  FROM documents d
  JOIN rates r ON r.source = d.source
  WHERE CAST(concat('0x', substr(md5(concat('mix:', CAST(d.doc_id AS VARCHAR))), 1, 12))
          AS BIGINT) % 1000000 < r.keep_ppm
)
SELECT r.source, r.n_docs, r.src_chars, r.keep_ppm,
       COUNT(k.n_chars) AS n_kept,
       CAST(COALESCE(SUM(k.n_chars), 0) AS BIGINT) AS chars_kept
FROM rates r
LEFT JOIN kept k ON k.source = r.source
GROUP BY r.source, r.n_docs, r.src_chars, r.keep_ppm
"""


@register("mixture_resample_to_target", _MIXTURE_ORACLE)
def mixture_resample_to_target(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    stats = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("src_chars"),
    )
    totals = stats.agg(
        F.sum("src_chars").cast("bigint").alias("total_chars"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    rates = stats.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "src_chars",
        F.floor(
            F.least(
                F.lit(1.0),
                (F.col("total_chars").cast("double") * 0.5 / F.col("n_sources"))
                / F.col("src_chars").cast("double"),
            )
            * 1000000
        )
        .cast("bigint")
        .alias("keep_ppm"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )
    kept = (
        d.select("source", "n_chars", bucket.alias("bucket"))
        .join(F.broadcast(rates.select("source", "keep_ppm")), "source")
        .filter(F.col("bucket") < F.col("keep_ppm"))
    )
    kept_agg = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept_raw"),
        F.sum("n_chars").cast("bigint").alias("chars_kept_raw"),
    )
    return (
        rates.join(F.broadcast(kept_agg), "source", "left")
        .select(
            "source",
            "n_docs",
            "src_chars",
            "keep_ppm",
            F.coalesce(F.col("n_kept_raw"), F.lit(0)).alias("n_kept"),
            F.coalesce(F.col("chars_kept_raw"), F.lit(0))
            .cast("bigint")
            .alias("chars_kept"),
        )
    )


# --- concatenate-and-chunk sequence packing --------------------------------
# Token proxy: ceil(n_chars / 4) — a fixed chars-per-token estimate,
# exact in integer arithmetic. Capacity 4096 tokens per training
# sequence. pack_id is the block containing the document's FIRST
# token; pack_offset its position inside that block.

_PACK_CAPACITY = 4096

_PACK_ORACLE = f"""
SELECT doc_id, source,
       (n_chars + 3) // 4 AS n_tok,
       CAST(COALESCE(SUM((n_chars + 3) // 4) OVER (
         PARTITION BY source ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         // {_PACK_CAPACITY} AS BIGINT) AS pack_id,
       CAST(COALESCE(SUM((n_chars + 3) // 4) OVER (
         PARTITION BY source ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         % {_PACK_CAPACITY} AS BIGINT) AS pack_offset
FROM documents
"""


@register("pack_sequences_greedy", _PACK_ORACLE)
def pack_sequences_greedy(spark, sf_dir):
    from ..operators.packing import pack_sequences

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", ((F.col("n_chars") + 3) / 4).cast("bigint").alias("n_tok")
    )
    return pack_sequences(
        d, size_col="n_tok", capacity=_PACK_CAPACITY, n_buckets=1
    )
