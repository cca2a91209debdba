"""[EXT] Near-duplicate clustering: connected components over the
MinHash dup-pair graph — the step a production dedup runs after pair
finding, so each cluster keeps one canonical document.

This is the engine's one genuinely *iterative* algorithm: min-label
propagation (the Pregel/GraphX pattern) as a driver-coordinated loop
of DataFrame joins. Each iteration is one shuffle join on the edge
list; ``localCheckpoint`` truncates lineage so the plan does not grow
with iterations. Convergence in O(graph diameter) rounds — the dup
graph's components are tiny (planted pairs plus incidental chains),
so 2-3 rounds in practice; at 100 TB the same loop holds because
every round is a pure equi-join + min-agg, and the label table stays
one row per *duplicated* doc (a small fraction of the corpus).

Oracle: DuckDB computes the same components by recursive transitive
closure (WITH RECURSIVE) over the identical pair list — tractable
because the pair graph, not the corpus, is the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import register
from .ext_dedup import (
    _MINHASH_ORACLE,
    _corpus,
    candidate_pairs,
    jaccard_verify,
    lsh_bands,
    minhash_signatures,
    shingle_hashes,
)


def connected_components(
    edges: DataFrame, max_iter: int = 20, dedup_edges: bool = True
) -> DataFrame:
    """Min-label propagation over an undirected edge list
    ``(doc_a, doc_b)`` → ``(doc_id, component_id)`` where
    ``component_id`` is the smallest doc_id reachable from ``doc_id``.

    Runs Spark jobs while building (the convergence test is an
    action); returns the converged label table, localCheckpoint-ed so
    downstream consumers see a flat plan.

    Each round does neighbor-min propagation AND pointer jumping
    (label := label of my label): plain propagation moves the min one
    HOP per round, so a path-shaped component of diameter d needs d
    rounds — the sorted-neighborhood match graph (stride ≤ CAP-1
    within 1000-row blocks at sf1) measured ~16 rounds / 20+ s before
    the shortcut. Pointer jumping halves the remaining distance each
    round (O(log d) total) and runs over the LABEL table only (one
    row per node — a small self-join next to the edge join), the
    Shiloach-Vishkin/GraphFrames recipe. The converged fixpoint (min
    reachable id) is identical either way.

    ``dedup_edges=False`` skips the union-distinct exchange for
    callers whose pair list is unique-by-construction (every match
    query emits ``a < b`` pairs exactly once); duplicates would only
    inflate join input, never change the fixpoint.
    """
    # Materialize the edge input ONCE before deriving both directions:
    # the union's two branches each contain the caller's (possibly
    # expensive — semdedup's pair search) edge subtree, so without the
    # checkpoint the first action computes it twice.
    edges = edges.localCheckpoint()
    fwd = edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    rev = edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    und = fwd.unionByName(rev)
    if dedup_edges:
        und = und.distinct()
    und = und.localCheckpoint()
    labels = (
        und.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component_id", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # Broadcast the LABEL side: labels are one compact row per
        # node-with-an-edge (checkpointed RDDs carry no stats, so the
        # auto-broadcast threshold never fires), while the edge table
        # is the big side — without the hint every iteration re-
        # shuffles the static 2|E| edge rows for a sort-merge join
        # (measured: the dominant cost on the sf1 match graph, 15.7M
        # edges × ~6 rounds). With it, iterations are map-side joins
        # plus one partial-aggregated min shuffle. At a scale where
        # the label table outgrows broadcast, this loop's posture
        # (like the module docstring says) hands off to partition-
        # aligned pregel — the dup/match graph label table is a small
        # fraction of the corpus by construction.
        neighbor_min = (
            und.join(F.broadcast(labels), und.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("component_id").alias("nbr_min"))
        )
        # Pointer jump: resolve each node's label through its label's
        # label. component_id always holds a node id that is <= the
        # node's own id and in its component, so the lookup join hits
        # every row; least() keeps monotone descent.
        hop = labels.select(
            F.col("doc_id").alias("mid"),
            F.col("component_id").alias("mid_label"),
        )
        # Carry the old label through the update so convergence is a
        # cheap filter-count over the checkpointed result — folding
        # what used to be a separate labels⨝new_labels shuffle join
        # into the iteration's one materialization.
        upd = (
            labels.join(neighbor_min, "doc_id", "left")
            .join(hop, labels.component_id == hop.mid, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component_id"),
                    F.coalesce(F.col("nbr_min"), F.col("component_id")),
                    F.coalesce(F.col("mid_label"), F.col("component_id")),
                ).alias("component_id"),
                F.col("component_id").alias("prev_id"),
            )
            .localCheckpoint()
        )
        changed = upd.filter(F.col("component_id") != F.col("prev_id")).count()
        labels = upd.select("doc_id", "component_id")
        if changed == 0:
            break
    return labels


_COMPONENTS_ORACLE = f"""
WITH RECURSIVE dups AS ({_MINHASH_ORACLE}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM dups
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM dups
),
reach(src, dst) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
)
SELECT src AS doc_id, MIN(dst) AS component_id
FROM reach GROUP BY src
"""


@register("dedup_components", _COMPONENTS_ORACLE)
def dedup_components(spark, sf_dir):
    corpus = _corpus(spark, sf_dir)
    hashed = shingle_hashes(corpus).cache()
    sigs = minhash_signatures(hashed).cache()
    pairs = candidate_pairs(lsh_bands(sigs))
    dups = jaccard_verify(pairs, hashed, threshold=0.5)
    return connected_components(dups.select("doc_a", "doc_b"))


_CANONICAL_ORACLE = f"""
WITH RECURSIVE dups AS ({_MINHASH_ORACLE}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM dups
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM dups
),
reach(src, dst) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
),
comp AS (SELECT src AS doc_id, MIN(dst) AS component_id FROM reach GROUP BY src)
SELECT
  component_id,
  COUNT(*) AS cluster_size,
  COUNT(CASE WHEN doc_id = component_id THEN 1 END) AS n_kept
FROM comp GROUP BY component_id
"""


@register("dedup_canonical_keep", _CANONICAL_ORACLE)
def dedup_canonical_keep(spark, sf_dir):
    """Cluster summary: per component, how many docs collapse into the
    canonical representative (the min doc_id). The "keep one per
    cluster" decision of a production dedup, as an aggregation over
    the component labels."""
    comp = dedup_components(spark, sf_dir)
    return comp.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.count(F.when(F.col("doc_id") == F.col("component_id"), 1)).alias("n_kept"),
    )
