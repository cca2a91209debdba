"""[EXT] Random-projection embedding compression — the
Johnson-Lindenstrauss / sign-random-projection (SRP) pair every
billion-vector ANN stack uses in front of the index:

`embedding_random_projection`: project the 64-dim float embedding to
8 dims with a Rademacher (±1) matrix — the JL transform variant that
needs no float matrix at all (Achlioptas 2001, "Database-friendly
random projections"). The sign matrix is derived from md5 at module
load and inlined into both engines' queries (DuckDB: signed-index
literal arrays; Spark: a ±1 int64 sign matrix driving an exact GEMM —
see `_project_batches`), so there is no RNG in either engine.
Arithmetic is exact: each float is scaled to an
integer micro-unit code first (`floor(x·1e6 + 0.5)` — the repo's
engine-stable rounding device, see ext_similarity2.py), then the
projection is a ±1 signed BIGINT sum — bit-identical under any
partitioning or summation order.

`similarity_srp_buckets`: the SRP-LSH bucket table — bit_j =
(proj_j ≥ 0), 8-bit bucket code, then per-bucket occupancy and label
purity (majority label via the packed `max(cnt·PACK + label)` integer
argmax). This is the oracle-checkable counterpart of the rows-only
MLlib `similarity_ann_lsh`: same hyperplane-LSH semantics, exact
arithmetic end to end.

Scale posture: the projection is a pure per-batch map — no shuffle;
at 100 TB it pipelines with the scan, and the per-batch cost is one
vectorized elementwise pass plus a (batch×64)@(64×8) int64 GEMM
(guide §4.2). The bucket rollup is ONE map-side-combined
groupBy on an 8-bit key (≤256 groups at any scale); the label-purity
layer groups on (code, label) first — still bounded by 256·|labels|.
Reference anchor: none (capability extension per SURVEY.md §2 [EXT]).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ..tables import load
from . import register

_IN_DIM = 64
_OUT_DIM = 8
_PACK = 1_000_000


def _signed_indices(j: int) -> list[int]:
    """±(i+1) for input dim i under output dim j — sign from md5, fixed
    at module load, inlined identically into both engines' queries."""
    out = []
    for i in range(_IN_DIM):
        h = hashlib.md5(f"rp:{j}:{i}".encode()).hexdigest()
        sign = 1 if int(h[:2], 16) % 2 == 0 else -1
        out.append(sign * (i + 1))
    return out


_SELS = [_signed_indices(j) for j in range(_OUT_DIM)]

# Integer micro-unit codes for the float embedding: floor(x*1e6 + 0.5)
# on the identical IEEE double is bit-stable across engines (round()
# is not — engines disagree on half-even vs half-up).
_CODES_DUCK = (
    "list_transform(embedding, x -> "
    "CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))"
)


# Vectorized form of the projection (r14, guide §4.2 "hand whole
# batches to vectorized native libraries"): the original spelled the
# fold as higher-order `aggregate`/`transform` expressions, which run
# on Catalyst's interpreted lambda path — per row that was 64 lambda
# evals for the codes array plus 8×(64 transform + 64 fold) ≈ 1100
# interpreted calls, ~2.5 s of the sf0.1 bench; a flat 8×64-term
# codegen Project halves that but pays ~0.9 s of plan/codegen
# processing per run. The mapInArrow kernel below is the FAISS shape
# this repo already uses for IVF coarse assignment: per Arrow batch,
# codes = floor(emb·1e6 + 0.5) elementwise in float64 (bit-identical
# to the SQL expression — same IEEE ops in the same order), then one
# (batch×64)@(64×8) signed int64 GEMM. Integer addition is
# associative, so the GEMM total equals the SQL fold exactly — the
# A/B collect at sf0.1 matched the expression plan bit-for-bit.
_SIGNS = None


def _sign_matrix():
    global _SIGNS
    if _SIGNS is None:
        import numpy as np

        m = np.zeros((_IN_DIM, _OUT_DIM), dtype=np.int64)
        for j in range(_OUT_DIM):
            for i, t in enumerate(_SELS[j]):
                m[i, j] = 1 if t > 0 else -1
        _SIGNS = m
    return _SIGNS


_PROJ_SCHEMA = "vec_id long, label int, " + ", ".join(
    f"proj_{j} long" for j in range(_OUT_DIM)
)


def _project_batches(it):
    import numpy as np
    import pyarrow as pa

    signs = _sign_matrix()
    names = ["vec_id", "label"] + [f"proj_{j}" for j in range(_OUT_DIM)]
    for b in it:
        flat = b.column("embedding").flatten().to_numpy(zero_copy_only=False)
        mat = flat.reshape(len(b), _IN_DIM).astype(np.float64)
        codes = np.floor(mat * 1000000.0 + 0.5).astype(np.int64)
        proj = codes @ signs
        cols = [b.column("vec_id"), b.column("label")] + [
            pa.array(proj[:, j], type=pa.int64()) for j in range(_OUT_DIM)
        ]
        yield pa.RecordBatch.from_arrays(cols, names=names)


def _proj_duck(j: int) -> str:
    sel = ", ".join(str(t) for t in _SELS[j])
    return (
        f"CAST(list_sum(list_transform([{sel}], t -> "
        "CASE WHEN t > 0 THEN c[t] ELSE -c[-t] END)) AS BIGINT)"
    )


_PROJ_COLS_DUCK = ",\n       ".join(
    f"{_proj_duck(j)} AS proj_{j}" for j in range(_OUT_DIM)
)
_ABS_SUM_DUCK = " + ".join(f"abs(proj_{j})" for j in range(_OUT_DIM))

_RP_ORACLE = f"""
WITH codes AS (
  SELECT vec_id, {_CODES_DUCK} AS c FROM embeddings
),
proj AS (
  SELECT vec_id,
       {_PROJ_COLS_DUCK}
  FROM codes
)
SELECT vec_id,
       {", ".join(f"proj_{j}" for j in range(_OUT_DIM))},
       CAST({_ABS_SUM_DUCK} AS BIGINT) AS l1_micro
FROM proj
"""


def _projected(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    return emb.mapInArrow(_project_batches, _PROJ_SCHEMA)


@register("embedding_random_projection", _RP_ORACLE)
def embedding_random_projection(spark, sf_dir):
    proj = _projected(spark, sf_dir)
    l1 = None
    for j in range(_OUT_DIM):
        term = F.abs(F.col(f"proj_{j}"))
        l1 = term if l1 is None else l1 + term
    return proj.select(
        "vec_id",
        *[f"proj_{j}" for j in range(_OUT_DIM)],
        l1.cast("long").alias("l1_micro"),
    )


_BIT_SUM_DUCK = " + ".join(
    f"(CASE WHEN proj_{j} >= 0 THEN {1 << j} ELSE 0 END)"
    for j in range(_OUT_DIM)
)

_SRP_ORACLE = f"""
WITH codes AS (
  SELECT vec_id, label, {_CODES_DUCK} AS c FROM embeddings
),
proj AS (
  SELECT vec_id, label,
       {_PROJ_COLS_DUCK}
  FROM codes
),
sig AS (
  SELECT vec_id, label, CAST({_BIT_SUM_DUCK} AS BIGINT) AS bucket
  FROM proj
),
per_label AS (
  SELECT bucket, label, COUNT(*) AS cnt
  FROM sig GROUP BY bucket, label
)
SELECT bucket,
       CAST(SUM(cnt) AS BIGINT) AS n_vecs,
       CAST(COUNT(*) AS BIGINT) AS n_labels,
       CAST(MAX(cnt * {_PACK} + label) % {_PACK} AS BIGINT) AS top_label,
       CAST(MAX(cnt * {_PACK} + label) // {_PACK} AS BIGINT) AS top_label_cnt
FROM per_label
GROUP BY bucket
"""


@register("similarity_srp_buckets", _SRP_ORACLE)
def similarity_srp_buckets(spark, sf_dir):
    proj = _projected(spark, sf_dir)
    bucket = None
    for j in range(_OUT_DIM):
        term = F.when(F.col(f"proj_{j}") >= 0, F.lit(1 << j)).otherwise(0)
        bucket = term if bucket is None else bucket + term
    per_label = (
        proj.select(bucket.cast("long").alias("bucket"), "label")
        .groupBy("bucket", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    packed = F.max(F.col("cnt") * _PACK + F.col("label"))
    return per_label.groupBy("bucket").agg(
        F.sum("cnt").cast("long").alias("n_vecs"),
        F.count(F.lit(1)).cast("long").alias("n_labels"),
        (packed % _PACK).cast("long").alias("top_label"),
        F.expr(f"max(cnt * {_PACK} + label) DIV {_PACK}")
        .cast("long")
        .alias("top_label_cnt"),
    )
