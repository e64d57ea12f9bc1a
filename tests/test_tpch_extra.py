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
    "q12_ship_delay_priority",
    "q16_part_supplier_variety",
    "q20_part_volume_suppliers",
    "q21_waiting_suppliers",
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


def test_q21_matches_exists_formulation(spark, duck):
    """The single-aggregation q21 must equal the classical
    EXISTS/NOT-EXISTS triple-join formulation (counting distinct
    waiting orders per supplier) — the semantics, independently
    derived."""
    rows = registry.queries()["q21_waiting_suppliers"](
        spark, SF_ORACLE).collect()
    got = {(r.s_suppkey, r.numwait) for r in rows}
    classical = duck.execute("""
        SELECT l1.l_suppkey AS s_suppkey,
               count(DISTINCT l1.l_orderkey) AS numwait
        FROM lineitem l1
        JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
        WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey != l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey != l1.l_suppkey
              AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1 ORDER BY numwait DESC, s_suppkey LIMIT 100
    """).fetchall()
    assert got == {(s, n) for s, n in classical}


def test_q16_exclusions_hold(spark):
    rows = registry.queries()["q16_part_supplier_variety"](
        spark, SF_ORACLE).collect()
    assert rows, "q16 returned nothing"
    for r in rows:
        assert r.p_brand != "Brand#5"
        assert not r.p_type.startswith("PROMO")
        assert r.supplier_cnt >= 1


def test_q20_share_threshold_holds(spark, duck):
    """Every returned supplier really moves >30% of some matching
    part's 1997 volume (recomputed independently)."""
    rows = registry.queries()["q20_part_volume_suppliers"](
        spark, SF_ORACLE).collect()
    assert rows, "q20 returned nothing"
    ok = {r[0] for r in duck.execute("""
        WITH per_ps AS (
          SELECT l_partkey, l_suppkey,
                 sum(CAST(round(l_quantity) AS BIGINT)) AS sq
          FROM lineitem
          WHERE year(l_shipdate) = 1997
            AND l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'red%')
          GROUP BY 1, 2)
        SELECT DISTINCT l_suppkey FROM per_ps a
        WHERE sq * 100 > (SELECT sum(sq) FROM per_ps b
                          WHERE b.l_partkey = a.l_partkey) * 30
    """).fetchall()}
    assert {r.s_suppkey for r in rows} == ok
