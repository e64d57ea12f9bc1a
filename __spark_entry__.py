"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``selfhealingdatapipeline_gcp_spark.registry`` — the
engine keeps each Spark builder and its DuckDB oracle side by side
there so they cannot drift.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from selfhealingdatapipeline_gcp_spark import registry  # noqa: E402
from selfhealingdatapipeline_gcp_spark.operators import analytics  # noqa: E402
from selfhealingdatapipeline_gcp_spark import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    lineitem = catalog.load(spark, "/root/testdata/sf0.001", "lineitem")
    return analytics.q1_pricing_summary(lineitem)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()


def queries_by_family() -> dict[str, list[str]]:
    """Optional metadata surface: registry names grouped by operator
    family (tiers via ``registry.entries()``) — lets a driver or user
    sample the 247-query namespace by structure instead of position."""
    return registry.queries_by_family()
