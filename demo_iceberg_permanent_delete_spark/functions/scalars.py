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


# Historical note (r2 ADVICE): money *product* sums used to be decimal
# aggregates narrowed to their true scale before the double cast — a form
# whose decimal(18,*) narrowing silently NULLed on overflow (~sf 17 under
# non-ANSI Spark) and whose decimal→double conversion drifted by an
# engine-specific ulp once the unscaled sum passed 2^53 (~sf 0.2). Both
# ceilings are gone: product sums now run on scaled bigints (``cents``),
# where the engines share one exact int64 sum and one IEEE int64→double
# conversion.


def davg(col: str | Column) -> Column:
    """Exact average: decimal sum / count, evaluated in double."""
    return F.sum(dec(col)).cast("double") / F.count(F.lit(1))


def cents(col: str | Column) -> Column:
    """Scaled-bigint view of a 2dp money/rate double: round(x*100) as
    long. Exact for 2dp values, and ~3x cheaper per row than decimal(38)
    arithmetic in the aggregate hot path (the sums stay plain int64).

    Cross-engine parity is *stronger* than the decimal path: both engines
    produce the identical int64 sum, and int64→double conversion is the
    same IEEE operation everywhere — no engine-specific decimal→double
    last-ulp behavior, so bit-equality holds even past 2^53 unscaled.
    Ceiling: int64 overflow of the summed products (silent wrap in
    non-ANSI Spark, error in DuckDB) at roughly sf 150 for Q1-shaped
    three-factor charge sums — far beyond any fixture."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")
