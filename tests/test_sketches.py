"""The approx sketch battery (X8) must agree with its hash-checked exact
twin within bounded error — the accuracy contract that used to run as an
in-query self-check (moved here so the bench/driver entry doesn't pay a
second full scan per invocation; same split as cosine_topk vs BLAS)."""

from __future__ import annotations

from demo_iceberg_permanent_delete_spark.operators.sketches import (
    sketch_approx_summary,
    sketch_exact_summary,
)
from tests.conftest import SF_ORACLE


def test_approx_battery_tracks_exact_twin(spark):
    exact = {
        r["l_returnflag"]: r
        for r in sketch_exact_summary(spark, SF_ORACLE).collect()
    }
    approx = {
        r["l_returnflag"]: r
        for r in sketch_approx_summary(spark, SF_ORACLE).collect()
    }
    assert set(exact) == set(approx) and exact
    for flag, r in exact.items():
        a = approx[flag]
        assert abs(a["n_parts_approx"] - r["n_parts"]) <= 0.05 * r["n_parts"]
        assert (
            abs(a["n_suppliers_approx"] - r["n_suppliers"])
            <= 0.05 * r["n_suppliers"]
        )
        spread = r["max_price"] - r["min_price"]
        assert abs(a["p50_price_approx"] - r["p50_price"]) <= 0.05 * spread
        assert abs(a["p95_price_approx"] - r["p95_price"]) <= 0.05 * spread
        assert a["n_rows"] == r["n_rows"]
