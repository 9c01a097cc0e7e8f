"""Multi-dimensional write clustering: z-order for rewrite_data_files.

Plain compaction (binpack) and single-column range clustering make file
min/max bounds tight on ONE dimension. When scans filter on several
independent columns (the 100 TB case: time AND tenant AND key), interleaved
bit ordering — z-order, the strategy Iceberg/Delta expose on their rewrite
procedures — gives every listed column partially-tight bounds, so manifest
pruning works for any of them.

Shape: one tiny global min/max aggregate (1 row to the driver) to fix the
normalization, then a pure-projection z-value column (shifts/masks inside
whole-stage codegen), ``repartitionByRange`` on it (one shuffle — the same
shuffle any compaction rewrite pays) + ``sortWithinPartitions``. No UDFs,
no collect of data rows.

Supported column types: integral, floating, decimal, date and timestamp
(normalized via epoch / fractional scaling). Strings are rejected —
order-preserving fixed-width encodes of collated text aren't expressible
as a cheap projection; hash-encoding would silently destroy locality.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ZORDER_BITS = 16  # per-dimension resolution: 65536 rank buckets


def _numeric_rank(col: Column, dtype: T.DataType, lo, hi, bits: int) -> Column:
    """Scale a value into [0, 2^bits) using the global [lo, hi] range."""
    top = (1 << bits) - 1
    if isinstance(dtype, T.TimestampType):
        col, lo, hi = F.unix_micros(col), _us(lo), _us(hi)
    elif isinstance(dtype, T.DateType):
        col, lo, hi = F.datediff(col, F.lit("1970-01-01")), lo.toordinal() - 719163, hi.toordinal() - 719163
    if hi == lo:
        return F.lit(0).cast("long")
    scaled = F.floor((col.cast("double") - float(lo)) * (top / (float(hi) - float(lo))))
    return F.greatest(F.lit(0), F.least(F.lit(top), scaled)).cast("long")


def _us(ts) -> int:
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1, tzinfo=ts.tzinfo) if ts.tzinfo else dt.datetime(1970, 1, 1)
    return int((ts - epoch).total_seconds() * 1_000_000)


def zorder_value(df: DataFrame, columns: list[str], *, bits: int = ZORDER_BITS) -> Column:
    """Interleaved-bit z-value over ``columns`` (long, NULLs rank lowest).

    Runs one small min/max aggregate over ``df`` to fix each dimension's
    normalization range, then returns a pure-projection expression.
    """
    if not columns:
        raise ValueError("zorder needs at least one column")
    schema = {f.name: f.dataType for f in df.schema.fields}
    for c in columns:
        if c not in schema:
            raise ValueError(f"unknown zorder column {c!r}")
        ok = isinstance(
            schema[c],
            (T.NumericType, T.TimestampType, T.DateType),
        )
        if not ok:
            raise ValueError(
                f"zorder column {c!r} has unsupported type {schema[c].simpleString()}"
            )
    stats = df.agg(
        *[F.min(c).alias(f"lo_{i}") for i, c in enumerate(columns)],
        *[F.max(c).alias(f"hi_{i}") for i, c in enumerate(columns)],
    ).collect()[0]

    k = len(columns)
    ranks = []
    for i, c in enumerate(columns):
        lo, hi = stats[f"lo_{i}"], stats[f"hi_{i}"]
        if lo is None or hi is None:  # all-NULL column: constant rank
            ranks.append(F.lit(0).cast("long"))
        else:
            rank = _numeric_rank(F.col(c), schema[c], lo, hi, bits)
            ranks.append(F.coalesce(rank, F.lit(0).cast("long")))

    def bit(i: int, b: int) -> Column:
        # bit b of dimension i, placed at interleaved position b*k + i
        return F.shiftleft(
            F.shiftright(ranks[i], b).bitwiseAND(F.lit(1)), b * k + i
        )

    parts = [bit(i, b) for b in range(bits) for i in range(k)]
    return reduce(lambda a, x: a + x, parts).cast("long")


def cluster_by_zorder(
    df: DataFrame, columns: list[str], num_partitions: int, *, bits: int = ZORDER_BITS
) -> DataFrame:
    """Range-partition + sort ``df`` by its z-value so each output partition
    (→ data file) covers a narrow z-range, i.e. a small hyper-rectangle of
    the listed columns — manifest min/max bounds then prune on ANY of them."""
    z = zorder_value(df, columns, bits=bits)
    return (
        df.withColumn("__z", z)
        .repartitionByRange(max(1, num_partitions), "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
