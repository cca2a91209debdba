"""MLlib-backed feature/embedding pipelines (BASELINE.json north star:
"DataFrame ETL + MLlib embeddings over document store")."""

from .embeddings import (  # noqa: F401
    brp_lsh_neighbors,
    ml_minhash_dup_pairs,
    tfidf_embeddings,
)
