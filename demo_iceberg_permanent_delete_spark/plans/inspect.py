"""Physical-plan inspection utilities (SURVEY.md §4).

The 100 TB story rests on Catalyst doing four things for every query:
push filters into the parquet scan, prune columns at the reader, broadcast
dimension joins, and keep expressions inside whole-stage codegen. These
helpers turn those properties into assertions (used by
tests/test_plans.py) so a regression in plan shape fails CI instead of
silently costing a full-table scan at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (explain() only prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (column pruning)."""
    text = explain_str(df)
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_whole_stage_codegen(df: DataFrame) -> bool:
    # Under AQE the formatted pre-execution plan hides codegen spans;
    # codegen mode prints "Found N WholeStageCodegen subtrees".
    return "WholeStageCodegen" in explain_str(df, "codegen")
