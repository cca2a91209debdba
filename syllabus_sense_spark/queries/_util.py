"""Cross-engine numeric discipline.

Double summation is order-dependent, and Spark's reduction order is
nondeterministic across runs — so any query whose output came from
``SUM(double)`` could never hash-match a DuckDB oracle reliably. The
discipline used by every registered query:

1. cast 2-dp source doubles (money, quantities, rates) to
   ``DECIMAL(18,2)`` — exact, identical in both engines;
2. aggregate in decimal — exact, order-independent;
3. cast the final aggregate to double / do a single double division —
   single IEEE op on identical inputs → bit-identical outputs.

Multiplication chains keep factors narrow (rates as ``DECIMAL(3,2)``)
so products stay within 38 digits — no precision-loss divergence.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: str | Column) -> Column:
    """Exact integer microseconds since epoch, NTZ-safe.

    The harness parquet stores ``timestamp[us]`` without a timezone
    annotation, which Spark 4 reads as TIMESTAMP_NTZ — a type
    ``unix_micros`` rejects. The session timezone is pinned to UTC
    (session.py RUNTIME_CONF), so casting NTZ → TIMESTAMP is
    value-preserving and the result matches DuckDB ``epoch_us``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def dec2(col: str | Column) -> Column:
    """Exact 2-dp decimal view of a money/quantity/rate column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def rate(col: str | Column, plus: bool = False) -> Column:
    """``1 - x`` (or ``1 + x``) as a narrow exact decimal factor."""
    c = dec2(col)
    expr = (F.lit(1) + c) if plus else (F.lit(1) - c)
    return expr.cast("decimal(3,2)")


def dsum(col: Column) -> Column:
    """Exact decimal sum surfaced as double (bit-stable)."""
    return F.sum(col).cast("double")


def davg(col: Column) -> Column:
    """Exact-sum / count in double — one IEEE division, bit-stable."""
    return F.sum(col).cast("double") / F.count(F.lit(1))


# DuckDB-side equivalents (string templates for oracle SQL)
SQL_DEC2 = "CAST({c} AS DECIMAL(18,2))"
SQL_ONE_MINUS = "CAST(1 - CAST({c} AS DECIMAL(18,2)) AS DECIMAL(3,2))"
SQL_ONE_PLUS = "CAST(1 + CAST({c} AS DECIMAL(18,2)) AS DECIMAL(3,2))"
