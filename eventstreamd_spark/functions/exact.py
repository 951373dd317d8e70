"""Engine-exact float aggregation helpers.

Summing doubles is order-dependent, and Spark's parallel partial
aggregation will not add in the same order as DuckDB's — so any
``SUM(double)`` in a driver-checked query would hash-mismatch on the last
few ULPs.  The fix is exact arithmetic: cast the operand to DECIMAL,
aggregate exactly (associative + commutative, order-independent), and
cast the final result back to DOUBLE.  Both engines then produce the
*same real number* and therefore the same double bits.

The driver's money-ish columns (prices, discounts, quantities) carry at
most 2 decimal digits, so DECIMAL(18,4) loses nothing; products get
scale 8+, still exact.

This is also the right call at 100 TB: decimal aggregation keeps
map-side partial aggregation (no ordering constraint), costs a few
percent over double sums, and removes a whole class of
non-reproducibility between runs with different partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(18,4)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent exact sum of a 2-dp double column -> double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def dsum_expr(col: Column, alias: str) -> Column:
    """Exact sum of an already-decimal product expression -> double."""
    return F.sum(col).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """avg as exact-sum / count, divided in DOUBLE (identical on both
    engines because both operands are bit-identical)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def dmul(a: Column, b: Column) -> Column:
    """Exact decimal product of two 2-dp doubles."""
    return a.cast(DEC) * b.cast(DEC)


def one_minus(c: Column) -> Column:
    return F.lit(1).cast(DEC) - c.cast(DEC)


# --- DuckDB twins -----------------------------------------------------------


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"(CAST(sum(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) / count({expr})) AS {alias}"
    )


def sql_dmul(a: str, b: str) -> str:
    return f"(CAST({a} AS DECIMAL(18,4)) * CAST({b} AS DECIMAL(18,4)))"


def sql_one_minus(expr: str) -> str:
    return f"(CAST(1 AS DECIMAL(18,4)) - CAST({expr} AS DECIMAL(18,4)))"
