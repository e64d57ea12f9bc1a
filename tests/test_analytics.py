"""Parity tests for the ETL/analytics core (SURVEY §2, batch 1).

Every registered query runs against the sf0.01 parquet on Spark and
its oracle SQL on DuckDB; results must match exactly (mirrors the
driver's t2 gate)."""

from __future__ import annotations

import pytest

from selfhealingdatapipeline_gcp_spark import registry

from conftest import SF_ORACLE, assert_parity

ANALYTICS = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "q10_returned_items",
    "top_customers_per_segment",
    "order_priority_check",
    "etl_orders_enriched",
]


@pytest.mark.parametrize("name", ANALYTICS)
def test_parity(name, spark, duck):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_parity(q(spark, SF_ORACLE), duck, sql)


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns
