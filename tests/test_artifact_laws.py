"""Artifact doctrine laws (r14 judge item 7).

The doctrine (README "Session-artifact doctrine"): a session artifact
may only be a CORPUS-PURE INDEX — something a production deployment
would persist beside the data and every query merely probes — never
any part of a query's own result path. The memo is within-session
only (keyed on (applicationId, sf_dir, kind)); every cold run pays
every build, and `clear_session_artifacts()` lets audits prove it.

Two law families here:

1. ENUMERATION — a source scan extracts every artifact kind ever
   passed to `session_artifact`/`_persisted_fingerprints` and asserts
   the set exactly equals the doctrine table below. A new artifact
   that is not added here (with its classification) fails the suite,
   so no artifact can land lawless.
2. BUILD-COUNT — for the artifacts the r14 verdict called out as
   lawless (trade_deg, match_ranked_blocks, srp_lsh_buckets,
   importance_vocab, bpe_word_types, lpa_adj): a second invocation of
   the consumer query performs ZERO artifact builds (the first
   invocation's build is reused), and the artifact is present in the
   session memo under its kind key.
"""

from __future__ import annotations

import os
import re

import pytest

# kind -> (defining module, what corpus-pure index it is)
ARTIFACT_KINDS: dict[str, tuple[str, str]] = {
    "base": ("ext_dedup", "raw-corpus shingle fingerprints (doc_id, h)"),
    "planted_dupes": ("ext_dedup", "planted-corpus duplicate-pair seed fingerprints"),
    "planted_all": ("ext_dedup", "planted-corpus shingle fingerprints"),
    "planted_all_df": ("ext_dedup", "per-fingerprint document frequency"),
    "planted_all_arrays": ("ext_dedup", "doc-major fingerprint arrays (raw+planted)"),
    "planted_fp_arrays": ("ext_dedup", "doc-major fingerprint arrays (planted)"),
    "planted_kept_bands": ("ext_dedup", "capped MinHash-LSH band table (the LSH index)"),
    "prefix_index": ("ext_dedup3", "df-capped prefix postings index"),
    "containment_groups": ("ext_dedup5", "containment candidate groups index"),
    "containment_sizes": ("ext_dedup5", "per-doc kept-fingerprint counts"),
    "semdedup_cells": ("ext_semdedup", "semantic-dedup cell assignments"),
    "simhash_fp": ("ext_simhash", "56-bit SimHash fingerprint table"),
    "copurchase_pairs_n": ("ext_graph3", "support-counted co-purchase edges"),
    "trade_edges_ser": ("ext_graph2", "trade-graph edge snapshot"),
    "trade_und_part": ("ext_graph2", "symmetrized trade edges, key-partitioned"),
    "trade_deg": ("ext_graph2", "trade-graph out-degree table"),
    "lpa_adj": ("ext_graph4", "symmetrized co-purchase adjacency for LPA"),
    "match_ranked_blocks": ("ext_match", "sorted-neighborhood blocking index"),
    "importance_vocab": ("ext_training17", "DSIR importance vocabulary counts"),
    "bpe_word_types": ("ext_training6", "BPE word-type frequency table"),
    "srp_lsh_buckets": ("ext_similarity", "SRP-LSH bucket assignments"),
    "ivf_cell_assign": ("ext_similarity", "IVF centroid cell assignments"),
    "pq_centroids": ("ext_pq", "PQ codebook centroids"),
    "pq_codes": ("ext_pq", "PQ code table"),
    "kmeans_ivf_cells_k{n_cells}": ("ml/embeddings", "k-means IVF cell assignments"),
    "kmeans_ivf_cent_k{n_cells}": ("ml/embeddings", "k-means IVF centroids"),
}

_PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "syllabus_sense_spark")


def _scan_artifact_kinds() -> set[str]:
    """Every string literal passed as the `kind` argument of
    session_artifact/_persisted_fingerprints anywhere in the package.
    The call shapes in-tree are all `(spark, sf_dir, "kind"` or
    `(aspark, sf_dir, f"kind{param}"` possibly split across lines."""
    call = re.compile(
        r"(?:session_artifact|_persisted_fingerprints)\(\s*"
        r"a?spark,\s*sf_dir,\s*f?\"([a-z_0-9{}]+)\"",
        re.S,
    )
    kinds: set[str] = set()
    for root, _dirs, files in os.walk(_PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            src = open(os.path.join(root, fname)).read()
            kinds.update(call.findall(src))
    return kinds


def test_every_artifact_kind_is_enumerated_with_its_doctrine_row():
    found = _scan_artifact_kinds()
    declared = set(ARTIFACT_KINDS)
    assert found == declared, (
        f"artifact kinds without a doctrine row: {sorted(found - declared)}; "
        f"doctrine rows without a source artifact: {sorted(declared - found)} "
        "— update ARTIFACT_KINDS (and the README doctrine table) in the "
        "same change that adds/removes an artifact."
    )
    # the count is asserted too, so a refactor that changes the call
    # shape (defeating the scan) fails loudly instead of passing empty
    assert len(found) == len(ARTIFACT_KINDS) >= 26


# consumer query that probes each r14-verdict-named artifact
_BUILD_LAW_CONSUMERS = [
    ("trade_deg", "graph_pagerank_trade"),
    ("match_ranked_blocks", "match_fuzzy_parts_capped"),
    ("srp_lsh_buckets", "similarity_ann_lsh"),
    ("importance_vocab", "training_importance_selection"),
    ("bpe_word_types", "training_bpe_merges"),
    ("lpa_adj", "graph_label_propagation"),
]


@pytest.mark.parametrize("kind,query", _BUILD_LAW_CONSUMERS)
def test_second_invocation_builds_nothing(spark, sf_dir, kind, query):
    from syllabus_sense_spark import queries as q
    from syllabus_sense_spark.queries import ext_dedup

    q.load_all_queries()
    fn = q.QUERIES[query]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    assert any(k[2] == kind for k in ext_dedup._FP_CACHE), (
        f"{query} did not register artifact {kind!r}"
    )
    builds_after_first = ext_dedup._FP_BUILDS
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    assert ext_dedup._FP_BUILDS == builds_after_first, (
        f"second {query} invocation rebuilt a session artifact"
    )
