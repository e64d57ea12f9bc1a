"""DECIMAL(38,0) money-accumulator mode (VERDICT r2 #8 / SURVEY §3):
below the int64 boundary both accumulators are bit-identical; past it
the bigint path overflows (ANSI: raises) while decimal stays exact.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from selfhealingdatapipeline_gcp_spark import registry
from selfhealingdatapipeline_gcp_spark.functions import money

from conftest import SF_ORACLE


@pytest.fixture
def decimal_mode():
    money.set_decimal_mode(True)
    yield
    money.set_decimal_mode(False)


def test_q1_parity_across_accumulators(spark, decimal_mode):
    """The flagship scan-agg produces IDENTICAL rows in decimal mode
    (integer sums are exact in both representations)."""
    assert money.decimal_mode()
    dec_rows = sorted(map(tuple, registry.queries()["q1_pricing_summary"](
        spark, SF_ORACLE).collect()))
    money.set_decimal_mode(False)
    int_rows = sorted(map(tuple, registry.queries()["q1_pricing_summary"](
        spark, SF_ORACLE).collect()))
    assert dec_rows == int_rows


def test_overflow_boundary_decimal_survives(spark, decimal_mode):
    """At ~9e14 dollars per group the e4 path exceeds int64
    (module docstring boundary): 25 rows of $4e13 sum to 1e19 e4-units
    > 2^63-1. Decimal mode returns the exact total; the bigint
    accumulator overflows (ANSI: ARITHMETIC_OVERFLOW)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(4.0e13, 0.0)] * 25, "p double, d double")
    got = df.agg(money.sum_revenue_e4(F.col("p"), F.col("d"))
                 .alias("rev")).collect()[0].rev
    assert got == 25 * 4.0e13  # exact in double (integer < 2^53 * scale)

    money.set_decimal_mode(False)
    with pytest.raises(Exception, match="(?i)overflow"):
        df.agg(money.sum_revenue_e4(F.col("p"), F.col("d"))
               .alias("rev")).collect()


SUMSQ_QUERIES = [
    "supplier_concentration_hhi",
    "event_rate_cusum",
    "revenue_anomaly",
    "revenue_anomaly_deseasonal",
]


@pytest.mark.parametrize("name", SUMSQ_QUERIES)
def test_sumsq_queries_identical_across_accumulators(name, spark,
                                                     decimal_mode):
    """Every Σx² consumer (variance windows, HHI, CUSUM) produces
    IDENTICAL rows in decimal mode below the int64 boundary — the
    widening changes headroom, never values (VERDICT r5 #1)."""
    assert money.decimal_mode()
    dec_rows = sorted(map(tuple, registry.queries()[name](
        spark, SF_ORACLE).collect()))
    money.set_decimal_mode(False)
    int_rows = sorted(map(tuple, registry.queries()[name](
        spark, SF_ORACLE).collect()))
    assert dec_rows == int_rows


def test_sumsq_decimal_survives_int64_overflow(spark, decimal_mode):
    """An HHI-shaped input whose per-supplier dollar totals square
    past int64 (d = 4e9 → d² = 1.6e19 > 2^63-1) runs exact in
    decimal mode and throws loud ANSI overflow in int mode — the
    sf30 ceiling from BASELINE.md R5, now survivable."""
    from pyspark.sql import functions as F

    from selfhealingdatapipeline_gcp_spark.operators import analytics

    # one supplier with $4e9 of flow (4 lineitems of $1e9)
    li = spark.createDataFrame(
        [(1, 1.0e9)] * 4, "l_suppkey int, l_extendedprice double")
    supp = spark.createDataFrame([(1, 0)], "s_suppkey int, s_nationkey int")
    nat = spark.createDataFrame([(0, "ZERO")],
                                "n_nationkey int, n_name string")
    row = analytics.supplier_concentration_hhi(li, supp, nat).collect()[0]
    assert row.n_suppliers == 1
    assert row.total_dollars == 4.0e9
    assert row.hhi == 1.0  # single supplier: Σd²/(Σd)² = 1 exactly

    money.set_decimal_mode(False)
    with pytest.raises(Exception, match="(?i)overflow"):
        analytics.supplier_concentration_hhi(li, supp, nat).collect()


def test_sumsq_windowed_decimal_survives_overflow(spark, decimal_mode):
    """The windowed form (revenue_anomaly's trailing Σx²) also
    widens: 40 days of $1e11 revenue put 1e18-sized squares in a
    30-day window (Σ ≈ 3e19 > int64) — decimal mode yields the
    z-scores, int mode throws."""
    import datetime as dt

    from selfhealingdatapipeline_gcp_spark.operators import detectors

    rows = [((dt.date(2020, 1, 1) + dt.timedelta(days=i)).isoformat(),
             1.0e11) for i in range(40)]
    df = spark.createDataFrame(rows, "o_orderdate string, "
                                     "o_totalprice double")
    out = detectors.revenue_anomaly(df).collect()
    assert len(out) > 0
    assert all(r.z_score is not None for r in out)

    money.set_decimal_mode(False)
    with pytest.raises(Exception, match="(?i)overflow"):
        detectors.revenue_anomaly(df).collect()


def test_sumsq_decimal_plan_pinned(spark, decimal_mode):
    """The widened accumulator must actually be in the plan: decimal
    mode's analyzed plan carries decimal(38,0); int mode's does not."""
    from conftest import SF_ORACLE as SF

    df = registry.queries()["supplier_concentration_hhi"](spark, SF)
    dec_plan = df._jdf.queryExecution().analyzed().toString()
    assert "decimal(38,0)" in dec_plan
    money.set_decimal_mode(False)
    df = registry.queries()["supplier_concentration_hhi"](spark, SF)
    int_plan = df._jdf.queryExecution().analyzed().toString()
    assert "decimal(38,0)" not in int_plan


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**7), min_size=1,
                max_size=30),
       st.integers(min_value=0, max_value=100))
def test_sum_money_matches_python_int_arithmetic(spark, cents_list, disc):
    """Property: both accumulator modes equal exact Python-int
    arithmetic for in-range inputs."""
    from pyspark.sql import functions as F
    rows = [(c / 100.0, disc / 100.0) for c in cents_list]
    df = spark.createDataFrame(rows, "p double, d double")
    expect = sum(c * (100 - disc) for c in cents_list) / 10000.0
    for mode in (False, True):
        money.set_decimal_mode(mode)
        try:
            got = df.agg(money.sum_revenue_e4(F.col("p"), F.col("d"))
                         .alias("r")).collect()[0].r
        finally:
            money.set_decimal_mode(False)
        assert got == expect, (mode, cents_list, disc)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=1, max_size=25))
def test_sum_sq_matches_python_int_arithmetic(spark, xs):
    """Property: Σx² equals exact Python-int arithmetic in BOTH
    accumulator modes for in-range inputs (the per-row square stays
    below int64 at |x| ≤ 1e9; the decimal path must agree exactly)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(x,) for x in xs], "x bigint")
    expect = sum(x * x for x in xs)
    for mode in (False, True):
        money.set_decimal_mode(mode)
        try:
            got = df.agg(money.sum_sq(F.col("x")).alias("s")) \
                .collect()[0].s
        finally:
            money.set_decimal_mode(False)
        assert int(got) == expect, (mode, xs)
