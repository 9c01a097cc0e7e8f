"""Plan-inspection helpers: assert that Catalyst produced the plan we
designed for (pushdown, pruning, broadcast, codegen) instead of hoping."""

from demo_iceberg_permanent_delete_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    has_whole_stage_codegen,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "has_whole_stage_codegen",
    "pushed_filters",
    "read_schema_columns",
]
