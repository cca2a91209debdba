"""Margin law for the semdedup GEMM assignment (sixth-decade fix).

The coarse assignment selects each vector's top-2 centroid cells from
BLAS-computed cosines, while the DuckDB oracle computes the same
cosines as a left-fold. Summation order differs, so cross-engine
parity of the SELECTION relies on a margin argument (the same
epistemics as the τ predicate in ext_semdedup's GEMM pair stage):
the gap between the rank-2 and rank-3 centroid cosines must exceed
the O(1e-13) relative drift reordered float-64 summation can produce.

This law measures the actual minimum boundary gap over every corpus
vector (exact replay of the assignment in numpy) and pins a floor
six orders of magnitude above the drift — if a future corpus or
centroid change produces genuinely near-tied cells, this fails
before a flaky oracle hash does.
"""

import numpy as np

from syllabus_sense_spark.queries import ext_semdedup
from syllabus_sense_spark.queries.ext_semdedup import _corpus_vec, _norm

from pyspark.sql import functions as F

_GAP_FLOOR = 1e-7  # drift is ~1e-13 relative; measured gap ~1e-2


def test_rank_boundary_gap_dwarfs_float_drift(spark):
    # sf0.1: the smallest tier whose centroid set (C >= 3) exercises a
    # real rank-2/rank-3 boundary (sf0.001/sf0.01 have 2 centroids —
    # stride 251 over <=220 corpus ids)
    corpus = _corpus_vec(spark, "/root/testdata/sf0.1").withColumn(
        "nrm", _norm("v")
    )
    rows = corpus.select("vec_id", "v", "nrm").collect()
    cent = [r for r in rows if eval_centroid(r.vec_id)]
    cent.sort(key=lambda r: r.vec_id)
    cmat = np.array([r.v for r in cent], dtype=np.float64)
    cnrm = np.array([r.nrm for r in cent], dtype=np.float64)
    m = np.stack([r.v for r in rows]).astype(np.float64)
    nrm = np.array([r.nrm for r in rows], dtype=np.float64)
    s = (m @ cmat.T) / np.outer(nrm, cnrm)
    s_sorted = -np.sort(-s, axis=1)
    # the selection boundary: rank-2 vs rank-3 (0-indexed 1 vs 2)
    gaps = s_sorted[:, 1] - s_sorted[:, 2]
    min_gap = float(gaps.min())
    assert min_gap > _GAP_FLOOR, (
        f"rank-2/rank-3 cosine gap {min_gap:.2e} too small: the GEMM "
        f"assignment's cross-engine margin argument no longer holds"
    )


def eval_centroid(vec_id: int) -> bool:
    # mirror of _CENTROID_PRED ("vec_id % 251 = 0")
    assert ext_semdedup._CENTROID_PRED == "vec_id % 251 = 0"
    return vec_id % 251 == 0


def test_ivf_rank_boundary_gap_dwarfs_float_drift(spark):
    """Same law for ivf_assignments' GEMM (plain embeddings corpus,
    its own centroid matrix): the NPROBE-boundary gap must dwarf
    cross-engine summation drift."""
    from syllabus_sense_spark.queries.ext_similarity import (
        _IVF_CENTROID_PRED,
        _IVF_NPROBE,
        _norm,
    )
    from syllabus_sense_spark.tables import load

    assert _IVF_CENTROID_PRED == "vec_id % 251 = 0"
    e = (
        load(spark, "/root/testdata/sf0.1", "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("nrm", _norm("v"))
    )
    rows = e.select("vec_id", "v", "nrm").collect()
    cent = sorted(
        (r for r in rows if r.vec_id % 251 == 0), key=lambda r: r.vec_id
    )
    cmat = np.array([r.v for r in cent], dtype=np.float64)
    cnrm = np.array([r.nrm for r in cent], dtype=np.float64)
    m = np.stack([r.v for r in rows]).astype(np.float64)
    nrm = np.array([r.nrm for r in rows], dtype=np.float64)
    s = (m @ cmat.T) / np.outer(nrm, cnrm)
    s_sorted = -np.sort(-s, axis=1)
    gaps = s_sorted[:, _IVF_NPROBE - 1] - s_sorted[:, _IVF_NPROBE]
    min_gap = float(gaps.min())
    assert min_gap > _GAP_FLOOR, (
        f"IVF NPROBE-boundary cosine gap {min_gap:.2e} too small for "
        f"the cross-engine margin argument"
    )
