"""Bit-identity law for the Arrow cosine kernel
(functions/vectors.cosine_sim_arrow): on the SAME pairs it must equal
the unrolled JVM expression EXACTLY (==, not approx) — the kernel's
whole claim is that numpy cumsum preserves the left-associated add
order, so swapping it into a query cannot move any oracle hash.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _spark():
    from syllabus_sense_spark.session import get_spark

    return get_spark("arrow-cos")


def test_arrow_cosine_bit_identical_to_unrolled():
    import numpy as np

    from syllabus_sense_spark.functions.vectors import cosine_sim_arrow
    from syllabus_sense_spark.queries.ext_similarity import _dot_unrolled, _norm

    spark = _spark()
    rng = np.random.default_rng(7)
    rows = [
        (int(i), rng.standard_normal(64).tolist(), rng.standard_normal(64).tolist())
        for i in range(500)
    ]
    df = (
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["pid", "va", "vb"]),
            "pid long, va array<double>, vb array<double>",
        )
        .withColumn("na", _norm("va"))
        .withColumn("nb", _norm("vb"))
    )
    jvm_sim = (_dot_unrolled("va", "vb") / (F.col("na") * F.col("nb"))).alias("s_jvm")
    arrow_sim = cosine_sim_arrow(
        F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
    ).alias("s_arrow")
    out = df.select("pid", jvm_sim, arrow_sim).collect()
    assert len(out) == 500
    mismatches = [
        (r.pid, r.s_jvm, r.s_arrow) for r in out if r.s_jvm != r.s_arrow
    ]
    assert not mismatches, f"bit drift on {len(mismatches)} pairs: {mismatches[:3]}"
