"""Parity + behavior tests for the extra TPC-H-shape analytics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from selfhealingdatapipeline_gcp_spark import registry

from conftest import SF_ORACLE, assert_parity

TPCH_EXTRA = [
    "q9_profit_by_nation_year",
    "q11_important_parts",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q19_bracket_revenue",
    "q22_dormant_customers",
    "q2_cheapest_supplier",
]


@pytest.mark.parametrize("name", TPCH_EXTRA)
def test_parity(name, spark, duck):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_parity(q(spark, SF_ORACLE), duck, sql)


def test_q13_distribution_accounts_for_all_customers(spark):
    from selfhealingdatapipeline_gcp_spark import catalog
    rows = registry.queries()["q13_customer_distribution"](
        spark, SF_ORACLE).collect()
    total = sum(r.custdist for r in rows)
    assert total == catalog.load(spark, SF_ORACLE, "customer").count()


def test_q15_is_the_maximum(spark):
    from selfhealingdatapipeline_gcp_spark import catalog
    from selfhealingdatapipeline_gcp_spark.functions import money
    top = registry.queries()["q15_top_supplier"](spark, SF_ORACLE).collect()
    assert len(top) >= 1
    li = catalog.load(spark, SF_ORACLE, "lineitem")
    rev = (
        li.filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
        .groupBy("l_suppkey")
        .agg(money.sum_revenue_e4(F.col("l_extendedprice"),
                                  F.col("l_discount")).alias("r"))
        .agg(F.max("r")).collect()[0][0]
    )
    assert top[0].total_revenue == rev


def test_q22_dormant_excludes_recent_buyers(spark):
    from selfhealingdatapipeline_gcp_spark import catalog
    rows = registry.queries()["q22_dormant_customers"](
        spark, SF_ORACLE).collect()
    assert rows and sum(r.n_custs for r in rows) > 0
    # dormant set must be smaller than the customer base
    n_cust = catalog.load(spark, SF_ORACLE, "customer").count()
    assert sum(r.n_custs for r in rows) < n_cust


def test_hypertable_rollup_cascade_consistency(spark, duck):
    assert_parity(
        registry.queries()["hypertable_rollup"](spark, SF_ORACLE), duck,
        registry.oracle_sql()["hypertable_rollup"])
    rows = registry.queries()["hypertable_rollup"](
        spark, SF_ORACLE).collect()
    by_grain = {}
    for r in rows:
        g = by_grain.setdefault(r.grain, {"n": 0, "s": 0.0})
        g["n"] += r.n_events
        g["s"] += r.sum_value
    # cascading re-aggregation must conserve totals exactly
    assert (by_grain["minute"]["n"] == by_grain["hour"]["n"]
            == by_grain["day"]["n"])
    assert abs(by_grain["minute"]["s"] - by_grain["day"]["s"]) < 1e-6


def test_cohort_retention_invariants(spark, duck):
    assert_parity(
        registry.queries()["cohort_retention"](spark, SF_ORACLE), duck,
        registry.oracle_sql()["cohort_retention"])
    rows = registry.queries()["cohort_retention"](
        spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_users <= r.cohort_size
        assert 0 < r.retention_pct <= 100.0
        if r.week_offset == 0:
            assert r.n_users == r.cohort_size  # offset-0 IS the cohort


def test_q22_anti_join_plan(spark):
    df = registry.queries()["q22_dormant_customers"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
