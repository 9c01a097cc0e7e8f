"""Shared pytest fixtures: one tuned SparkSession per test run, DuckDB
connection with the testdata views pre-registered (mirrors the driver's
oracle harness)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from demo_iceberg_permanent_delete_spark.session import get_spark  # noqa: E402
from demo_iceberg_permanent_delete_spark.sources.tables import TABLES, table_path  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(SF_ORACLE, name)}'"
        )
    yield con
    con.close()
