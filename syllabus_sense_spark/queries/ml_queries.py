"""MLlib-pipeline queries (rows-only: HashingTF/IDF/LSH internals are
engine-specific, so no SQL oracle exists; agreement with the
hand-rolled oracle-checked variants is asserted in
``tests/test_ml_embeddings.py``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..ml.embeddings import brp_lsh_neighbors, ml_minhash_dup_pairs, tfidf_embeddings
from ..tables import load
from . import register
from .ext_dedup import _corpus


@register("ml_tfidf_embeddings")  # rows-only
def ml_tfidf_embeddings(spark, sf_dir):
    """Embedding generation: one L2-normalized tf-idf vector per doc;
    surfaced as summary stats (wire-stable, no VectorUDT in output).

    The stats reduce the SPARSE vector (unwrap_udt → stored values,
    ~100/row), not the 16384-wide densified array — the r10 sweep
    measured the dense path at 80 s for 63k docs at sf1, ~99% of the
    interpreted higher-order work spent summing zeros. Bit-identical:
    the skipped elements contribute x*x = 0.0, and IEEE a + 0.0 == a
    for every non-negative accumulator, so the left-to-right partial
    sums are unchanged."""
    emb = tfidf_embeddings(
        load(spark, sf_dir, "documents").select("doc_id", "text"),
        dense=False,
    )
    vals = F.col("u").getField("values")
    nnz = F.size(F.filter(vals, lambda x: x != 0.0))
    return emb.select(
        "doc_id", F.unwrap_udt("embedding").alias("u")
    ).select(
        "doc_id",
        nnz.alias("n_active_terms"),
        F.round(F.aggregate(vals, F.lit(0.0), lambda a, x: a + x * x), 6)
        .alias("sq_norm_r"),
    )


@register("ml_minhash_lsh_dupes")  # rows-only
def ml_minhash_lsh_dupes(spark, sf_dir):
    """MLlib MinHashLSH near-dup pairs on the same planted-dup corpus
    as ``dedup_minhash_lsh`` — the built-in vs hand-rolled cross-check."""
    pairs = ml_minhash_dup_pairs(_corpus(spark, sf_dir), threshold=0.5)
    return pairs.select(
        "doc_a", "doc_b", F.round("jaccard_dist", 6).alias("jaccard_dist_r")
    )


@register("ml_brp_lsh_neighbors")  # rows-only
def ml_brp_lsh_neighbors(spark, sf_dir):
    """Distributed Euclidean-LSH k-NN over the embeddings table for
    the harness query set (vec_id % 100 == 0)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    nn = brp_lsh_neighbors(e, q, k=5)
    return nn.select(
        "query_id", "neighbor_id", "rank", F.round("dist", 6).alias("dist_r")
    )


@register("similarity_ivf_kmeans")  # rows-only: learned centroids
def similarity_ivf_kmeans(spark, sf_dir):
    """IVF ANN with k-means-learned cells (the 100 TB path where the
    coarse quantizer is trained, not seeded); recall vs brute force is
    asserted in tests/test_ml_embeddings.py."""
    from ..ml.embeddings import kmeans_ivf_neighbors

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    nn = kmeans_ivf_neighbors(e, q, k=3, artifact=(spark, sf_dir))
    return nn.select(
        "query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim_r")
    )
