"""[EXT] PCA power iteration (two exact steps) — exact to the last
bit. The embedding-whitening step of a semantic-dedup / retrieval
pipeline (SemDeDup centers+rotates before clustering): iterate
v <- G v toward the dominant principal direction of the 64-dim
embedding cloud. The contract is the exact two-step power iterate
v2 = G^2 * 1 (Rayleigh quotient provably nondecreasing per step for
PSD G — law-tested); convergence to the top eigenvector additionally
needs an eigengap, which near-isotropic clouds (like the synthetic
harness embeddings, lambda1/lambda2 ~ 1.07) don't have — real
embedding clouds do (anisotropy of learned embeddings is
well-documented).

Everything is integer arithmetic end to end, which is what makes an
EIGENVECTOR oracle-checkable at all (float PCA differs in the last
ulp per engine/partitioning and would never hash-match):

1. codes: c_i = floor(x_i·1e3 + 0.5) — milli-unit integers.
2. Gram via VECTORIZED partial aggregation: an Arrow-batched
   mapInPandas computes each partition's exact int64 X^T X (numpy
   integer matmul — associative, so partition order is irrelevant)
   and emits 64² + 64 partial rows; a map-side-combined groupBy(i,j)
   folds the partials. One pass, O(dims²) rows per PARTITION (not per
   vector — the first cut posexploded 4096 rows per vector, which is
   the correct relational shape but 64× more shuffle input than the
   BLAS-style partials). Centering without division:
   G_ij = N·Σc_i c_j − (Σc_i)(Σc_j), the covariance scaled by N² —
   exact BIGINT (per-partition products ≤ 1e6·rows, never near 2^63).
3. Two power steps in DECIMAL(38,0): v1 = G·1, v2 = G·v1. The 128-bit
   decimal lane holds the growth (|v2| ≲ 1e28 ≪ 1e38) with no
   intermediate normalization to break exactness.
4. Report the direction as sign-safe integer ratios
   r_i = sign(v2_i)·(|v2_i|·1e6 DIV max|v2|) — the SCALE.md DIV trap
   honored (Spark DIV truncates, DuckDB // floors; on |·| they agree).

Scale posture: the only data-scale stage is the outer-product pass —
64² lightweight rows per vector with map-side partial aggregation
into 4096 cells (at 100 TB: a single combine-heavy shuffle of 4096
keys). The power iteration itself runs on the bounded 4096-row Gram
table (join + groupBy on 64 keys — O(dims²) work, corpus-size
independent). Reference anchor: none ([EXT] per SURVEY.md §2;
method: classic power iteration, e.g. Golub & Van Loan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import load
from . import register

_D = 64
_SCALE = 1_000_000

_PCA_ORACLE = f"""
WITH codes AS (
  SELECT list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)) AS c
  FROM embeddings
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM codes),
sums AS (
  SELECT i.i, CAST(SUM(c[i.i + 1]) AS BIGINT) AS s
  FROM codes, UNNEST(range({_D})) AS i(i)
  GROUP BY i.i
),
gram_raw AS (
  SELECT i.i, j.j, CAST(SUM(c[i.i + 1] * c[j.j + 1]) AS BIGINT) AS p
  FROM codes, UNNEST(range({_D})) AS i(i), UNNEST(range({_D})) AS j(j)
  GROUP BY i.i, j.j
),
gram AS (
  -- HUGEINT (int128) is DuckDB's exact wide lane; Spark's is
  -- DECIMAL(38,0) — same values, different spellings.
  SELECT g.i, g.j,
         CAST(n.n AS HUGEINT) * g.p
           - CAST(si.s AS HUGEINT) * sj.s AS g
  FROM gram_raw g
  JOIN sums si ON si.i = g.i
  JOIN sums sj ON sj.i = g.j
  CROSS JOIN n
),
v1 AS (
  SELECT i, CAST(SUM(g) AS HUGEINT) AS v FROM gram GROUP BY i
),
v2 AS (
  SELECT gram.i, CAST(SUM(gram.g * v1.v) AS HUGEINT) AS v
  FROM gram JOIN v1 ON v1.i = gram.j
  GROUP BY gram.i
),
mx AS (SELECT MAX(abs(v)) AS m FROM v2)
SELECT v2.i AS dim,
       CAST(CASE WHEN v2.v < 0 THEN -1 ELSE 1 END
            * ((abs(v2.v) * {_SCALE}) // mx.m) AS BIGINT) AS ratio_ppm
FROM v2 CROSS JOIN mx
"""


@register("ml_pca_power_iteration", _PCA_ORACLE)
def ml_pca_power_iteration(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")

    def partial_gram(batches):
        import numpy as np
        import pandas as pd

        # One exact int64 X^T X per Arrow batch: the float work
        # (floor-scale) is elementwise IEEE-identical to the SQL
        # expression; the matmul is integer, so per-partition partials
        # fold associatively regardless of partitioning.
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.floor(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                * 1000.0
                + 0.5
            ).astype(np.int64)
            G = X.T @ X  # (64, 64), entries ≤ 1e6·rows — far from 2^63
            s = X.sum(axis=0)
            i, j = np.indices(G.shape)
            # One extra (-1, -1, batch_rows) row per batch: summed by
            # the same groupBy fold it yields N — the corpus count —
            # without a second scan of the embeddings table.
            yield pd.DataFrame(
                {
                    "i": np.concatenate([i.ravel(), np.arange(X.shape[1]), [-1]]),
                    "j": np.concatenate([j.ravel(), np.full(X.shape[1], -1), [-1]]),
                    "p": np.concatenate([G.ravel(), s, [X.shape[0]]]),
                }
            )

    partials = emb.select("embedding").mapInPandas(
        partial_gram, "i int, j int, p long"
    )
    # ONE distributed job: scan + per-batch GEMM + map-side-combined
    # fold into ≤ dims² + dims + 1 = 4161 cells, a size that is
    # CORPUS-INDEPENDENT (the 100 TB run collects the same 33 KB).
    # The power iteration itself is O(dims²) arithmetic over that
    # bounded table — finishing it driver-side in exact Python ints
    # (arbitrary precision ⊇ the DECIMAL(38,0) lane) replaces the old
    # lazy 6-stage join/agg cascade whose every reference re-ran the
    # full scan + Arrow GEMM pass (32 parquet scans / 24 MapInPandas
    # nodes in the r14 before-plan) and whose per-stage scheduling
    # overhead dominated even checkpointed (guide §1.2: the bounded
    # tail of a distributed aggregate is driver work, like the
    # centroid tables). Exactness: n·p − sᵢ·sⱼ, the two matvecs, and
    # the final |v|·1e6 // mx are integer ops — Python `//` on
    # non-negative ints is the same truncating DIV both engines use.
    cells = partials.groupBy("i", "j").agg(F.sum("p").alias("p")).collect()
    n = 0
    s = [0] * _D
    gp = {}
    for r in cells:
        if r.j >= 0:
            gp[(r.i, r.j)] = r.p
        elif r.i >= 0:
            s[r.i] = r.p
        else:
            n = r.p
    out_schema = "dim long, ratio_ppm long"
    if not gp:
        return spark.createDataFrame([], out_schema)
    g = [[n * gp.get((i, j), 0) - s[i] * s[j] for j in range(_D)] for i in range(_D)]
    v1 = [sum(row) for row in g]
    v2 = [sum(gi[j] * v1[j] for j in range(_D)) for gi in g]
    mx = max(abs(v) for v in v2)
    return spark.createDataFrame(
        [(i, (-1 if v < 0 else 1) * ((abs(v) * _SCALE) // mx)) for i, v in enumerate(v2)],
        out_schema,
    )
