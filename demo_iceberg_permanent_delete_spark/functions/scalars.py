"""Scalar helper columns shared across operators.

Exactness helpers keep Spark results bit-identical to the DuckDB oracle:
double aggregation order differs between engines, so money/quantity math is
done in DECIMAL (exact) and cast to DOUBLE only at the output edge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale-6 decimal: enough for the testdata's 2dp money and 2dp-ish rates.
DEC = "decimal(18,6)"
# Rate factors like (1 - discount) live in [0, 2] — decimal(8,6) is exact.
RATE = "decimal(8,6)"


def dec(col: str | Column) -> Column:
    """Exact-decimal view of a double column (deterministic cast)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def rate(expr: Column) -> Column:
    """Exact-decimal rate factor, e.g. (1 - l_discount)."""
    return expr.cast(RATE)


def dsum(col: str | Column) -> Column:
    """Exact decimal sum surfaced as double (bit-stable across engines)."""
    return F.sum(dec(col)).cast("double")


def checked_narrow(raw_sum: Column, scale_ddl: str, name: str) -> Column:
    """Narrow an aggregated decimal to its true value scale, surfacing an
    ERROR (not a silent NULL) if the narrowing cast overflows.

    Under non-ANSI Spark a decimal overflow casts to NULL; summing ~1e4
    rows of 18-digit money per sf unit, decimal(18,*) overflows around
    sf≈17 — this guard turns that silent corruption into a loud failure.
    Separately, cross-engine bit-equality of the final DOUBLE holds only
    while the narrowed unscaled value stays under 2^53 (≈ sf 0.2 for
    scale-6 charge sums): above that, decimal→double conversion rounds
    with engine-specific last-ulp behavior. That ceiling is inherent to
    comparing as double; compare decimals directly in the oracle to go
    past it."""
    narrowed = raw_sum.cast(scale_ddl)
    return F.when(raw_sum.isNull() | narrowed.isNotNull(), narrowed).otherwise(
        F.raise_error(
            F.lit(
                f"{name}: decimal narrowing to {scale_ddl} overflowed — "
                "scale factor exceeds the documented decimal(18,*) ceiling"
            )
        )
    )


def davg(col: str | Column) -> Column:
    """Exact average: decimal sum / count, evaluated in double."""
    return F.sum(dec(col)).cast("double") / F.count(F.lit(1))
