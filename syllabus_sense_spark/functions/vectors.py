"""Vector column functions over array<float>/array<double> embeddings.

JVM higher-order functions (zip_with/aggregate) — Arrow never ships
the vectors to Python. Folds are left-to-right, so results are
deterministic and reproducible across runs and engines.

One deliberate exception: ``cosine_sim_arrow``. When a pairwise
similarity PREDICATE references both sides of a join, Catalyst pushes
it into the join condition, and join conditions evaluate through the
interpreted Predicate path — a 64-dim unrolled dot there costs ~40 s
per million pairs where the same expression in a whole-stage-codegen
projection costs well under a second. A Pandas-UDF predicate cannot
live in a join condition, so Catalyst provably evaluates it AFTER the
join in one Arrow-batched operator — ~10× faster for this shape, and
bit-identical: numpy multiplies element-wise (exact per IEEE op) and
``cumsum`` accumulates left-associated, the same add order as the
unrolled JVM expression and the DuckDB oracle's fold.
"""

# NOTE: no `from __future__ import annotations` here — it would turn
# the Pandas-UDF type hints into strings, which pandas_udf cannot
# parse ([UNSUPPORTED_SIGNATURE]).
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def _cos_arrow_kernel():
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series, na: pd.Series, nb: pd.Series) -> pd.Series:
        A = np.stack(va.to_numpy())
        B = np.stack(vb.to_numpy())
        # cumsum, not sum: numpy's sum is pairwise-reassociated; the
        # running sum is left-associated, matching the unrolled JVM
        # expression bit-for-bit.
        dots = np.cumsum(A * B, axis=1)[:, -1]
        return pd.Series(dots / (na.to_numpy() * nb.to_numpy()))

    return _cos


_COS_ARROW = None


def cosine_sim_arrow(va: Column, vb: Column, na: Column, nb: Column) -> Column:
    """Arrow-batched cosine from precomputed norms — for similarity
    predicates/projections over JOINED pairs (see module docstring).
    Bit-identical to ``dot/(na*nb)`` with a left-associated dot."""
    global _COS_ARROW
    if _COS_ARROW is None:
        _COS_ARROW = _cos_arrow_kernel()
    return _COS_ARROW(va, vb, na, nb)
