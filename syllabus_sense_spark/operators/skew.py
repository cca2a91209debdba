"""Skew-handling join: salting for hot keys.

AQE's skew-join handles most cases (enabled in session.RUNTIME_CONF);
salting is the explicit fallback when one key dominates so heavily
that even split shuffle blocks overload a reducer, or when the join
is not a sort-merge join AQE can split.

Mechanics: replicate each right-side row SALT times with a salt
column; tag each left row with a deterministic salt in [0, SALT);
join on (key, salt). The hot key's rows spread across SALT reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join on ``on`` with ``salt``-way key splitting.

    ``left`` is the large/skewed side (salt assigned by a hash of the
    whole row via monotonically-increasing id is NOT deterministic;
    use a stable hash of the key plus a per-row component — here
    xxhash64 over all left columns, which is deterministic for
    deterministic input).
    """
    left_salt = (
        F.abs(F.xxhash64(*[F.col(c) for c in left.columns])) % salt
    ).alias("__salt")
    salted_left = left.select("*", left_salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    salted_right = right.select("*", salts)
    out = salted_left.join(
        salted_right,
        [on, "__salt"],
        how,
    )
    return out.drop("__salt")
