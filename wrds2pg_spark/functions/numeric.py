"""Deterministic floating-point aggregation helpers.

Summing doubles is order-dependent in the last ULP, and Spark's partial
aggregation order differs from any single-threaded engine — so a raw
``SUM(double)`` can never hash-match an oracle exactly.  The fix is the
classic exact-decimal trick: cast each addend to a DECIMAL with enough
scale to represent it exactly (money has 2 decimals; a price*(1-disc)
product has 4; *(1+tax) has 6), sum exactly (decimal addition is
associative), and cast the final sum back to double.  The result is
bit-identical regardless of partitioning, in Spark and in DuckDB, as
long as the oracle SQL applies the same casts.

Tie-safety: a double can never be exactly representable at ``.xx5`` for
scale≥1 (binary fractions), so the decimal cast's rounding mode can
never be exercised at a tie — both engines produce the same decimal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dsum", "davg", "DSUM_SQL", "DAVG_SQL"]


def dsum(col: Column, scale: int = 2, precision: int = 22) -> Column:
    """Order-independent sum of a double column, returned as double."""
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column, scale: int = 2, precision: int = 22) -> Column:
    """Order-independent mean of a double column, returned as double."""
    return dsum(col, scale, precision) / F.count(col).cast("double")


def DSUM_SQL(expr: str, scale: int = 2, precision: int = 22) -> str:
    """DuckDB-side equivalent of :func:`dsum` for oracle strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def DAVG_SQL(expr: str, scale: int = 2, precision: int = 22) -> str:
    """DuckDB-side equivalent of :func:`davg`."""
    return (
        f"({DSUM_SQL(expr, scale, precision)} / "
        f"CAST(COUNT({expr}) AS DOUBLE))"
    )
