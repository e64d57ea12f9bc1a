"""Persisted monitoring state (reference:
monitoring/setup_bigquery.sql:45-70 — the ``monitoring_alerts`` alert
audit table and the ``baseline_metrics`` precomputed-baseline table).

The reference keeps alert history in BigQuery so duplicate
suppression survives restarts; here the same tables are
date-partitioned parquet, written through the standard sink so the
audit trail is itself a queryable dataset. Timestamps are always
caller-provided (the event-time anchor) — never wall clock — so
round-trips are deterministic and replayable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from selfhealingdatapipeline_gcp_spark.sources import writers

ALERTS_SUBDIR = "monitoring_alerts"
BASELINES_SUBDIR = "baseline_metrics"

_HISTORY_SCHEMA = T.StructType([
    T.StructField("detector", T.StringType()),
    T.StructField("alert_key", T.StringType()),
    T.StructField("severity", T.StringType()),
    T.StructField("detail", T.StringType()),
    T.StructField("sent_ts", T.TimestampType()),
])


def write_alert_history(alerts: DataFrame, root: str, sent_ts) -> None:
    """Append delivered alerts to the monitoring_alerts sink
    (setup_bigquery.sql:45-58: alert id/type/severity/details +
    created_at, partitioned by day). Partition column = sent day so
    retention (the reference's 180-day partition expiry) is a
    partition drop, not a rewrite."""
    out = (
        alerts.select("detector", "alert_key", "severity", "detail")
        .withColumn("sent_ts", F.lit(sent_ts).cast("timestamp"))
        .withColumn("sent_date", F.to_date("sent_ts"))
    )
    writers.write_parquet(out, os.path.join(root, ALERTS_SUBDIR),
                          mode="append", partition_by=("sent_date",))


def read_alert_history(spark: SparkSession, root: str) -> DataFrame:
    """Alert history in dedup_against_history's shape
    (detector, alert_key, sent_ts); empty relation when no run has
    persisted yet — first sweep suppresses nothing."""
    path = os.path.join(root, ALERTS_SUBDIR)
    try:
        return spark.read.parquet(path).select(
            "detector", "alert_key", "sent_ts")
    except Exception:
        return spark.createDataFrame([], T.StructType([
            _HISTORY_SCHEMA["detector"],
            _HISTORY_SCHEMA["alert_key"],
            _HISTORY_SCHEMA["sent_ts"],
        ]))


def baseline_metrics_from(revenue_daily: DataFrame, anchor_date) -> DataFrame:
    """One precomputed-baseline row per metric
    (setup_bigquery.sql:61-70: metric_name, metric_date,
    baseline_value/std_dev/min/max/sample_size) from the daily-revenue
    relation — the stats detectors otherwise recompute inline every
    run. Day-grain input, single tiny agg."""
    stats = revenue_daily.agg(
        F.avg("revenue").alias("baseline_value"),
        F.stddev_samp("revenue").alias("std_dev"),
        F.min("revenue").alias("min_value"),
        F.max("revenue").alias("max_value"),
        F.count(F.lit(1)).alias("sample_size"),
    )
    return stats.select(
        F.lit("daily_revenue").alias("metric_name"),
        F.lit(anchor_date).cast("date").alias("metric_date"),
        "baseline_value", "std_dev", "min_value", "max_value",
        "sample_size",
    )


def write_baseline_metrics(baselines: DataFrame, root: str) -> None:
    writers.write_parquet(
        baselines, os.path.join(root, BASELINES_SUBDIR),
        mode="append", partition_by=("metric_date",))


def read_baseline_metrics(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, BASELINES_SUBDIR))
