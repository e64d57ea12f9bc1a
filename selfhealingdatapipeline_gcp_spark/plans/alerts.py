"""Alert severity model + routing (reference:
monitoring/alerts/alert_manager.py — severity routing and alert
dedup over detector outputs).

Detector DataFrames flow in; alerts come out as rows (a DataFrame
sink, not side-channel prints) so downstream routing is itself a
Spark job at scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEVERITIES = ("NONE", "LOW", "MEDIUM", "HIGH", "CRITICAL")


def severity_from_deviation(deviation_pct_col) -> object:
    """The reference's shared severity ladder
    (revenue_detector.py:273-282): ≥30 CRITICAL, ≥20 HIGH,
    ≥10 MEDIUM, else LOW."""
    d = F.abs(deviation_pct_col)
    return (F.when(d >= 30, "CRITICAL")
             .when(d >= 20, "HIGH")
             .when(d >= 10, "MEDIUM")
             .otherwise("LOW"))


@dataclass(frozen=True)
class AlertRule:
    detector: str                      # registry query name
    flag_column: str                   # boolean column marking a firing row
    deviation_column: str | None = None  # drives severity when present
    key_columns: tuple[str, ...] = ()  # identity for dedup


DEFAULT_RULES = (
    AlertRule("revenue_anomaly", "is_anomaly", "z_score", ("d",)),
    AlertRule("transaction_volume_anomaly", "is_anomaly", "z_score", ("hour",)),
    AlertRule("pattern_break_region", "is_break", "deviation_pct", ("region",)),
    AlertRule("pattern_break_product", "is_break", "deviation_pct", ("brand",)),
    AlertRule("reconciliation_orders_lineitem", "is_mismatch",
              "discrepancy_pct", ("d",)),
    AlertRule("freshness_check", "is_stale", None, ("source",)),
    AlertRule("sla_processing_velocity", "sla_breach", None, ()),
)


def alerts_from(detector_name: str, df: DataFrame, rule: AlertRule) -> DataFrame:
    """Project a detector output into the uniform alert schema:
    (detector, alert_key, severity, detail). Only firing rows."""
    fired = df.filter(F.col(rule.flag_column))
    key = (F.concat_ws("|", *[F.col(c).cast("string") for c in rule.key_columns])
           if rule.key_columns else F.lit(""))
    severity = (severity_from_deviation(F.col(rule.deviation_column) * 10)
                if rule.deviation_column else F.lit("HIGH"))
    detail = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return fired.select(
        F.lit(detector_name).alias("detector"),
        key.alias("alert_key"),
        severity.alias("severity"),
        detail.alias("detail"),
    )


def collect_alerts(named_outputs: dict[str, DataFrame],
                   rules: tuple[AlertRule, ...] = DEFAULT_RULES) -> DataFrame:
    """Union all firing detectors into one alert stream, deduplicated
    on (detector, alert_key) — alert_manager's dedup, as a plan."""
    parts = [
        alerts_from(r.detector, named_outputs[r.detector], r)
        for r in rules if r.detector in named_outputs
    ]
    if not parts:
        raise ValueError("no detector outputs matched the rule set")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(["detector", "alert_key"])
