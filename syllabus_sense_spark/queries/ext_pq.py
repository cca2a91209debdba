"""[EXT] Product-quantization ANN over the embeddings table — the
memory-bound scale path beyond IVF: 64-float vectors compress to 8
one-byte codes and queries scan codes with ADC lookup tables
(operators/pq.py).

Rows-only: codebook training averages doubles (engine-ordered
reduction), so distances are not bit-stable across engines; the
operator's laws (recall vs exact brute force, ADC==sum-of-subspace
distances) are asserted in tests/test_pq.py instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.pq import assign_codes, pq_search, subvectors, train_codebook
from ..tables import load
from . import register

_N_QUERIES = 5
_DIM = 64


@register("similarity_pq_adc")  # rows-only: float-reduction training
def similarity_pq_adc(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    subs = subvectors(emb, dim=_DIM)
    centroids = train_codebook(subs)
    codes = assign_codes(subs, centroids)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return pq_search(emb, codes, centroids, queries, dim=_DIM, k=10)


