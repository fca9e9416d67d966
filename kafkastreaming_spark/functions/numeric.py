"""Cross-engine deterministic numeric aggregation helpers.

Problem (SURVEY.md §5.4): parallel double summation is order-dependent;
Spark's partial/final HashAggregate and DuckDB's per-thread states merge in
different orders, so ``sum(double)`` can differ by ~sqrt(n)·ulp between the
engines — enough to break a 6-decimal value hash at sf≥0.01.

Fix: route money-like sums through *exact* decimal arithmetic.

1. per-row cast double → DECIMAL(24,8).  Inputs are ≤2-decimal values and
   their 2-way/3-way products (≤6 decimals exact); the double representation
   sits within ~1e-11 of the exact 1e-6-grid point, far from any 5e-9 tie
   boundary of the 1e-8 grid, so both engines round to the identical decimal.
2. SUM over decimals — exact integer arithmetic, order-independent.
3. ROUND(·, 2) then CAST AS DOUBLE — the rounded decimal ×100 fits in 2^53,
   so the decimal→double conversion is a single exact step in both engines.

The same scheme gives deterministic averages: exact-decimal sum (as double)
divided by the count, rounded to 6dp — identical IEEE operations on
identical inputs in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(24,8)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent sum of a money-like double column, 2dp, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)), 2).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent average: exact decimal sum / count, rounded 6dp."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.round(F.sum(c.cast(DEC)), 6).cast("double")
    return F.round(total / F.count(F.lit(1)), 6).alias(alias)


def oracle_dsum(expr: str, alias: str) -> str:
    """DuckDB spelling of :func:`dsum` (identical value path)."""
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(24,8))), 2) AS DOUBLE) AS {alias}"


def oracle_davg(expr: str, alias: str) -> str:
    """DuckDB spelling of :func:`davg` (identical value path)."""
    return (
        f"ROUND(CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(24,8))), 6) AS DOUBLE)"
        f" / COUNT(*), 6) AS {alias}"
    )
