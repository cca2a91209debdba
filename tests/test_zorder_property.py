"""Property test: the Catalyst Morton expression equals the obvious
Python reference for arbitrary in-grid coordinates (hypothesis drives
the coordinates; one Spark round-trip per example batch)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from syllabus_sense_spark.functions.zorder import zvalue


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_zvalue_matches_python_reference(spark, pairs):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pairs)], "i long, x long, y long"
    )
    got = {
        r["i"]: r["z"]
        for r in df.select("i", zvalue("x", "y", bits=16).alias("z")).collect()
    }
    for i, (x, y) in enumerate(pairs):
        assert got[i] == _morton_ref(x, y, 16), (x, y)
