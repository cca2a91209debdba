"""MLlib pipelines agree with the hand-rolled, oracle-checked
variants — the built-in vs custom cross-check."""

from __future__ import annotations

from pyspark.sql import functions as F

from syllabus_sense_spark.ml.embeddings import (
    brp_lsh_neighbors,
    ml_minhash_dup_pairs,
    tfidf_embeddings,
)
from syllabus_sense_spark.queries.ext_dedup import _corpus
from syllabus_sense_spark.tables import load


def test_tfidf_unit_norm(spark, sf_dir):
    emb = tfidf_embeddings(
        load(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    )
    sq = emb.select(
        F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x).alias("n2")
    )
    bad = sq.filter(F.abs(F.col("n2") - 1.0) > 1e-9).count()
    assert bad == 0


def test_ml_minhash_finds_planted_dups(spark, sf_dir):
    """Every planted near-dup (doc, doc+2000000) must surface; the
    MLlib LSH may add extra (true, sub-threshold-distance) pairs but
    must not miss plants."""
    corpus = _corpus(spark, sf_dir)
    pairs = ml_minhash_dup_pairs(corpus, threshold=0.5)
    found = {
        (r.doc_a, r.doc_b)
        for r in pairs.collect()
    }
    planted = {
        (r.doc_id, r.doc_id + 2000000)
        for r in load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select("doc_id")
        .collect()
    }
    missed = planted - found
    assert len(missed) <= max(1, len(planted) // 20), missed  # ≥95% recall


def test_brp_lsh_recall_vs_bruteforce(spark, sf_dir):
    """Top-1 Euclidean-LSH neighbor is the true cosine top-1 for most
    queries (unit-norm ⇒ rankings agree; LSH is approximate)."""
    from syllabus_sense_spark.queries.ext_similarity import similarity_topk_bruteforce

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    ann = {
        (r.query_id, r.neighbor_id)
        for r in brp_lsh_neighbors(e, q, k=1).filter(F.col("rank") == 1).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity_topk_bruteforce(spark, sf_dir)
        .filter(F.col("rank") == 1)
        .collect()
    }
    n_q = len(exact)
    assert n_q > 0
    hits = len(ann & exact)
    assert hits >= int(0.8 * n_q), (hits, n_q)


def test_kmeans_ivf_recall_vs_bruteforce(spark, sf_dir):
    """Learned-centroid IVF: the top-1 in-cell neighbor matches the
    true cosine top-1 for most queries (IVF misses only when the true
    neighbor landed in a different cell)."""
    from syllabus_sense_spark.ml.embeddings import kmeans_ivf_neighbors
    from syllabus_sense_spark.queries.ext_similarity import similarity_topk_bruteforce

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    ann = {
        (r.query_id, r.neighbor_id)
        for r in kmeans_ivf_neighbors(e, q, k=1).filter(F.col("rank") == 1).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity_topk_bruteforce(spark, sf_dir)
        .filter(F.col("rank") == 1)
        .collect()
    }
    n_q = len(exact)
    assert n_q > 0
    hits = len(ann & exact)
    assert hits >= int(0.6 * n_q), (hits, n_q)
