from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def pq_parts(spark):
    from syllabus_sense_spark.operators.pq import (
        assign_codes,
        subvectors,
        train_codebook,
    )
    from syllabus_sense_spark.tables import load

    emb = load(spark, SF01, "embeddings").select("vec_id", "embedding")
    subs = subvectors(emb, dim=64)
    centroids = train_codebook(subs)
    codes = assign_codes(subs, centroids)
    return emb, subs, centroids, codes


def test_pq_shapes(pq_parts):
    emb, subs, centroids, codes = pq_parts
    n = emb.count()
    assert subs.count() == n * 8
    # full codebook: 8 subspaces x 16 codes, 8-dim centroids
    cent = centroids.collect()
    assert len(cent) == 8 * 16
    assert all(len(r.centroid) == 8 for r in cent)
    # every vector gets exactly one code per subspace, in [0, 16)
    assert codes.count() == n * 8
    rng = codes.agg(F.min("code"), F.max("code")).first()
    assert rng[0] >= 0 and rng[1] < 16


def test_pq_adc_equals_sum_of_subspace_distances(spark, pq_parts):
    """ADC law: the approx distance of (query, vec) equals the sum over
    subspaces of ||q_sub - centroid[code(vec, j)]||^2."""
    from syllabus_sense_spark.operators.pq import adc_topk, subvectors

    emb, subs, centroids, codes = pq_parts
    queries = emb.filter(F.col("vec_id") < 2)
    qsubs = subvectors(queries, dim=64).select(
        F.col("vec_id").alias("query_id"), "j", F.col("sub").alias("qsub")
    )
    topk = adc_topk(codes, centroids, qsubs, k=5).collect()

    cent = {(r.j, r.code): np.array(r.centroid) for r in centroids.collect()}
    code_map = {(r.vec_id, r.j): r.code for r in codes.collect()}
    q = {r.vec_id: np.array(r.embedding) for r in queries.collect()}
    for row in topk:
        expected = sum(
            float(
                np.sum(
                    (
                        q[row.query_id][j * 8 : (j + 1) * 8]
                        - cent[(j, code_map[(row.vec_id, j)])]
                    )
                    ** 2
                )
            )
            for j in range(8)
        )
        assert row.approx_d == pytest.approx(expected, rel=1e-4)


def test_pq_rerank_recall_vs_bruteforce(spark, pq_parts):
    """The full PQ pipeline (ADC shortlist + exact re-rank) must
    recover most of the exact L2 top-10 — far above both the random
    baseline (10/500) and the shortlist-free ADC accuracy."""
    from syllabus_sense_spark.operators.pq import pq_search

    emb, subs, centroids, codes = pq_parts
    vecs = {r.vec_id: np.array(r.embedding) for r in emb.collect()}
    queries = emb.filter(F.col("vec_id") < 5)
    result = pq_search(emb, codes, centroids, queries, dim=64, k=10).collect()
    got = {}
    for r in result:
        got.setdefault(r.query_id, set()).add(r.vec_id)

    ids = sorted(vecs)
    mat = np.stack([vecs[i] for i in ids])
    recalls = []
    for qid in range(5):
        d = np.sum((mat - vecs[qid]) ** 2, axis=1)
        exact = {ids[i] for i in np.argsort(d, kind="stable")[:10]}
        recalls.append(len(exact & got[qid]) / 10)
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_pq_rerank_distances_are_exact(spark, pq_parts):
    """Re-ranked distances are true L2 distances (rounded to 6dp)."""
    from syllabus_sense_spark.operators.pq import pq_search

    emb, subs, centroids, codes = pq_parts
    vecs = {r.vec_id: np.array(r.embedding) for r in emb.collect()}
    queries = emb.filter(F.col("vec_id") < 2)
    for r in pq_search(emb, codes, centroids, queries, dim=64, k=5).collect():
        expected = float(np.sum((vecs[r.query_id] - vecs[r.vec_id]) ** 2))
        assert r.dist == pytest.approx(expected, abs=2e-6)


def test_subvectors_partition_the_vector(spark):
    """Property: the 8 subvectors concatenated in j order reconstruct
    the original vector exactly, for arbitrary float contents."""
    from syllabus_sense_spark.operators.pq import subvectors

    rows = [(i, [float(((i * 31 + j * 7) % 97) - 48) / 7.0 for j in range(64)])
            for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    subs = subvectors(df, dim=64).collect()
    by_id: dict[int, dict[int, list[float]]] = {}
    for r in subs:
        by_id.setdefault(r.vec_id, {})[r.j] = list(r.sub)
    for vec_id, emb in rows:
        got = [x for j in range(8) for x in by_id[vec_id][j]]
        assert got == emb


def test_assign_codes_picks_nearest_centroid(spark):
    """Property: every assigned code is the true argmin over the
    centroid set (checked exhaustively against numpy)."""
    from syllabus_sense_spark.operators.pq import (
        assign_codes,
        subvectors,
        train_codebook,
    )

    rows = [(i, [float(((i * 13 + j * 5) % 89) - 44) / 9.0 for j in range(64)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    subs = subvectors(df, dim=64)
    cents = train_codebook(subs)
    codes = assign_codes(subs, cents)
    cent_map = {(r.j, r.code): np.array(r.centroid) for r in cents.collect()}
    sub_map = {(r.vec_id, r.j): np.array(r.sub) for r in subs.collect()}
    for r in codes.collect():
        s = sub_map[(r.vec_id, r.j)]
        dists = {
            code: float(np.sum((s - c) ** 2))
            for (j, code), c in cent_map.items()
            if j == r.j
        }
        best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))[0]
        assert r.code == best


def test_pq_pipeline_is_deterministic_run_to_run(spark, sf_dir):
    """'Deterministic once seeded' pinned: two independent builds of
    the full PQ pipeline — fresh codebook training each time, straight
    through the operators so the session artifact memo can't mask a
    nondeterministic trainer — return the IDENTICAL row multiset
    (seeds are lowest vec_ids, argmin ties break on code index, no
    RNG anywhere)."""
    from syllabus_sense_spark.operators.pq import (
        assign_codes,
        pq_search,
        subvectors,
        train_codebook,
    )
    from syllabus_sense_spark.tables import load

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5)

    def build():
        subs = subvectors(emb, dim=64)
        cents = train_codebook(subs)
        codes = assign_codes(subs, cents)
        return sorted(
            map(tuple, pq_search(emb, codes, cents, queries, dim=64, k=10).collect())
        )

    assert build() == build()


def test_search_semantic_docs_pq_recall_vs_exact(spark, sf_dir):
    """The PQ-backed RAG query must recover ≥0.7 of the exact
    retrieval's top-3 doc ids per query and return hydrated rows
    (source + snippet) for every hit."""
    from syllabus_sense_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    exact_rows = QUERIES["search_semantic_docs"](spark, sf_dir).collect()
    exact = {}
    for r in exact_rows:
        exact.setdefault(r.query_id, set()).add(r.doc_id)
    pq_rows = QUERIES["search_semantic_docs_pq"](spark, sf_dir).collect()
    got = {}
    for r in pq_rows:
        got.setdefault(r.query_id, set()).add(r.doc_id)
        assert r.source is not None and r.snippet is not None
    recalls = [len(got.get(k, set()) & v) / len(v) for k, v in exact.items()]
    recall = sum(recalls) / len(recalls)
    assert recall >= 0.7, f"pq rag recall@3 {recall}"
