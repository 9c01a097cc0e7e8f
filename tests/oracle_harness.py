"""Driver-mimicking comparison: run a registered Spark query and its DuckDB
oracle side by side and compare row count, column-name set, and
order-insensitive values (columns sorted by name, rows sorted, exact
equality after light normalization).

This is deliberately *stricter* than approximate float comparison — the
engine's convention is exact decimal arithmetic surfaced as double, so values
must match bit-for-bit (see registry.py conventions).
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any


def _norm(v: Any) -> Any:
    if isinstance(v, float) and math.isnan(v):
        return "__NaN__"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _sorted_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def compare(spark_df, duck_con, oracle: str) -> None:
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]

    res = duck_con.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _sorted_rows(spark_cols, spark_rows)
    d = _sorted_rows(duck_cols, duck_rows)
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b]
    assert not mismatches, f"{len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
