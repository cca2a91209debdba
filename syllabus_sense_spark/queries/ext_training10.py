"""[EXT] Training-data batch: group-aware splits and ANN hard-negative
mining — the two selection ops contrastive/pretraining pipelines run
after dedup and before packing.

`split_group_aware`: train/val/test split keyed on the GROUP (source),
not the row — the leakage guard: documents from one source can never
straddle splits, so eval never sees train-adjacent material. The
split decision is a 48-bit md5 fingerprint of the source name
(`ext_dedup`'s public fingerprint idiom — no engine hash family)
reduced mod 10 → 8/1/1. One map-side-combined groupBy; the split of
a group is a pure function of its name, so adding a shard of new
data never reshuffles existing assignments.

`training_hard_negatives`: for each query vector, the top-3 most
similar corpus vectors with a DIFFERENT label — the classic hard
negatives for contrastive training (high-similarity, wrong class).
Same Arrow matrix-scorer skeleton as `similarity_topk_bruteforce`
(per-dimension accumulated outer product — fixed-order IEEE, so
bit-identical to the unrolled dot — local top-3 per partition) with
the label-mismatch predicate as a mask inside the kernel; at corpus
scale the exact scorer swaps for the IVF/PQ tiers exactly as in
`search_semantic_docs_pq`.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..tables import load
from . import register
from .ext_similarity import _dot_unrolled, _SQL_COSINE

_SPLIT_ORACLE = """
WITH g AS (
  SELECT source, lang, n_chars,
         CAST(concat('0x', substr(md5(source), 1, 12)) AS BIGINT) % 10
           AS bucket
  FROM documents
),
s AS (
  SELECT CASE WHEN bucket < 8 THEN 'train'
              WHEN bucket = 8 THEN 'val'
              ELSE 'test' END AS split,
         source, n_chars
  FROM g
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY split
"""


@register("split_group_aware", _SPLIT_ORACLE)
def split_group_aware(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5("source"), 1, 12), 16, 10).cast("bigint")
        % 10
    )
    s = docs.select(
        F.when(bucket < 8, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
        "source",
        "n_chars",
    )
    return s.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


_HARDNEG_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS query_label,
         embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id % 100 = 0
),
c AS (SELECT vec_id, label, embedding::DOUBLE[] AS cv FROM embeddings),
scored AS (
  SELECT q.query_id, q.query_label,
         c.vec_id AS negative_id, c.label AS negative_label,
         {_SQL_COSINE.format(a="q.qv", b="c.cv")} AS sim
  FROM q JOIN c ON c.label <> q.query_label
),
ranked AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY sim DESC, negative_id
    ) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, query_label, negative_id, negative_label, rank,
       CAST(floor(sim * 1e6) AS BIGINT) AS sim_e6
FROM ranked WHERE rank <= 3
"""


@register("training_hard_negatives", _HARDNEG_ORACLE)
def training_hard_negatives(spark, sf_dir):
    """Exact hard-negative miner. r14 shape — the same mapInArrow matrix
    kernel as ``similarity_topk_bruteforce`` (which this scorer always
    mirrored), with the label-mismatch predicate as a mask inside the
    kernel instead of a broadcast nested-loop join condition: each task
    scores its candidate batch against the full query set as a per-
    dimension accumulated outer product (identical left-associated IEEE
    sums to the unrolled JVM dot / DuckDB's list_dot_product) and emits
    only its LOCAL top-3 per query, so the rank window's exchange
    carries ≤ 3·|Q| rows per partition instead of every cross-label
    pair. Local-then-global top-3 is lossless under the shared
    (sim DESC, negative_id ASC) total order."""
    import numpy as np
    import pyarrow as pa

    from .ext_similarity import DIM, _query_set

    e = load(spark, sf_dir, "embeddings")
    # query tier from the session memo (r15): one collect per
    # (session, sf_dir) instead of one corpus scan per invocation
    qids, qlabels, qmat, qn = _query_set(spark, sf_dir)

    def _topk_batches(it):
        for b in it:
            n = len(b)
            if n == 0 or len(qids) == 0:
                continue
            ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            labels = b.column("label").to_numpy(zero_copy_only=False)
            flat = b.column("embedding").flatten().to_numpy(
                zero_copy_only=False
            )
            cmat = flat.reshape(n, DIM).astype(np.float64)
            cacc = cmat[:, 0] * cmat[:, 0]
            dots = np.outer(cmat[:, 0], qmat[:, 0])
            for i in range(1, DIM):
                cacc = cacc + cmat[:, i] * cmat[:, i]
                dots = dots + np.outer(cmat[:, i], qmat[:, i])
            cn = np.sqrt(cacc)
            sims = dots / np.outer(cn, qn)
            out_q, out_ql, out_id, out_lab, out_sim = [], [], [], [], []
            for j in range(len(qids)):
                mask = labels != qlabels[j]
                cand_ids = ids[mask]
                if cand_ids.size == 0:
                    continue
                cand_sims = sims[mask, j]
                order = np.lexsort((cand_ids, -cand_sims))[:3]
                out_q.append(np.full(order.size, qids[j], dtype=np.int64))
                out_ql.append(
                    np.full(order.size, qlabels[j], dtype=np.int32)
                )
                out_id.append(cand_ids[order])
                out_lab.append(labels[mask][order])
                out_sim.append(cand_sims[order])
            if not out_q:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_q), type=pa.int64()),
                    pa.array(np.concatenate(out_ql), type=pa.int32()),
                    pa.array(np.concatenate(out_id), type=pa.int64()),
                    pa.array(np.concatenate(out_lab), type=pa.int32()),
                    pa.array(np.concatenate(out_sim), type=pa.float64()),
                ],
                names=[
                    "query_id",
                    "query_label",
                    "negative_id",
                    "negative_label",
                    "sim",
                ],
            )

    # Scale-adaptive candidate fan-out, same heuristic as
    # similarity_topk_bruteforce: one task per ~50M pairwise flops,
    # capped at core count — sf0.1 runs 1 task, sf1+ fills every core.
    import os as _os

    from ..tables import _disk_size

    rows_est = max(
        1, _disk_size(_os.path.join(sf_dir, "embeddings.parquet")) // 300
    )
    flops_est = rows_est * rows_est * DIM // 100
    parts = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            int(flops_est // 50_000_000) + 1,
        ),
    )
    cand = e.select("vec_id", "label", "embedding").repartition(parts)
    scored = cand.mapInArrow(
        _topk_batches,
        "query_id long, query_label int, negative_id long, "
        "negative_label int, sim double",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("negative_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id",
            "query_label",
            "negative_id",
            "negative_label",
            "rank",
            F.floor(F.col("sim") * F.lit(1e6)).cast("bigint").alias("sim_e6"),
        )
    )


# --------------------------------------------------------------------------
# The 100 TB path of the miner above, as a REGISTERED query with its
# own driver row (round-9 verdict item 6): candidate generation swaps
# the exact Q×N scorer for the IVF index — each query scores only the
# corpus vectors in its 2 nearest cells (equi-join on cell id, never a
# cross join), the label-mismatch predicate rides the same join. The
# index is the deterministic seeded-centroid IVF from ext_similarity
# (session artifact, shared with similarity_ivf_cells), which is fully
# derivable in SQL — so unlike most ANN paths this one is HASH-checked
# end-to-end, not just recall-bounded: the DuckDB oracle mirrors the
# quantization, the probe, and the ranking exactly. Recall vs the
# exact tier is additionally asserted in
# tests/test_dedup_similarity.py (planted structure: a query's own
# cell contains its high-sim neighborhood by construction).
# --------------------------------------------------------------------------

_HARDNEG_IVF_ORACLE = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id % 251 = 0),
assigned AS (
  SELECT vec_id, label, v, cent_id,
    ROW_NUMBER() OVER (
      PARTITION BY vec_id
      ORDER BY {_SQL_COSINE.format(a="v", b="cv")} DESC, cent_id
    ) AS cent_rank
  FROM e CROSS JOIN cent
),
cells AS (SELECT vec_id, label, v, cent_id FROM assigned WHERE cent_rank = 1),
q AS (
  SELECT vec_id AS query_id, label AS query_label, v AS qv,
         cent_id AS qcell
  FROM assigned WHERE vec_id % 100 = 0 AND cent_rank <= 2
),
scored AS (
  SELECT q.query_id, q.query_label,
         c.vec_id AS negative_id, c.label AS negative_label,
         {_SQL_COSINE.format(a="q.qv", b="c.v")} AS sim
  FROM q JOIN cells c
    ON c.cent_id = q.qcell AND c.label <> q.query_label
),
ranked AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY sim DESC, negative_id
    ) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, query_label, negative_id, negative_label, rank,
       CAST(floor(sim * 1e6) AS BIGINT) AS sim_e6
FROM ranked WHERE rank <= 3
"""


@register("training_hard_negatives_ivf", _HARDNEG_IVF_ORACLE)
def training_hard_negatives_ivf(spark, sf_dir):
    from .ext_similarity import _IVF_NPROBE, ivf_assignments

    assigned = ivf_assignments(spark, sf_dir)
    cells = assigned.filter(F.col("cent_rank") == 1).drop("cent_rank")
    q = assigned.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("cent_rank") <= _IVF_NPROBE)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("cent_id").alias("qcell"),
    )
    # Cells are disjoint, so each (query, candidate) pair appears at
    # most once across the 2 probes; the label-mismatch predicate
    # subsumes the self-exclusion (a vector never mismatches its own
    # label).
    scored = cells.join(
        F.broadcast(q),
        (F.col("cent_id") == F.col("qcell"))
        & (F.col("label") != F.col("query_label")),
    ).select(
        "query_id",
        "query_label",
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        (_dot_unrolled("qv", "v") / (F.col("qn") * F.col("nrm"))).alias(
            "sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("negative_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id",
            "query_label",
            "negative_id",
            "negative_label",
            "rank",
            F.floor(F.col("sim") * F.lit(1e6)).cast("bigint").alias("sim_e6"),
        )
    )
