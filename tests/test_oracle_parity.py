"""Every registered hash-checkable query must match its DuckDB oracle at
sf0.01 — the same gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from demo_iceberg_permanent_delete_spark.registry import all_oracles, all_queries
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare

_QUERIES = all_queries()
_ORACLES = all_oracles()


# slow: this is the driver's own CORRECTNESS gate re-run in pytest (all 50
# composites vs DuckDB) — several minutes; the fast subset keeps
# test_entry_smoke as the contract canary.
@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(name, spark, duck):
    df = _QUERIES[name](spark, SF_ORACLE)
    compare(df, duck, _ORACLES[name])


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = _QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
