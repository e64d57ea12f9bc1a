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
