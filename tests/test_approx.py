"""Approximate aggregates have engine-specific algorithms, so the driver
records them rows-only; here we bound their error against the exact answer
(the reference does the same in TestApproximate* operator tests)."""

from __future__ import annotations

from tests.conftest import SF_DIR
from witdb_spark.queries import QUERIES


def test_approx_sketches_close_to_exact(spark, oracle):
    row = QUERIES["agg_approx_sketches"].fn(spark, SF_DIR).collect()[0]
    exact_orders, exact_parts = oracle.execute(
        "SELECT COUNT(DISTINCT l_orderkey), COUNT(DISTINCT l_partkey) FROM lineitem"
    ).fetchone()
    exact_median = oracle.execute(
        "SELECT median(l_extendedprice) FROM lineitem"
    ).fetchone()[0]
    assert abs(row.approx_orders - exact_orders) / exact_orders < 0.05
    assert abs(row.hll_parts - exact_parts) / exact_parts < 0.05
    assert abs(row.approx_median_price - exact_median) / exact_median < 0.05
