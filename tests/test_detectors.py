"""Parity tests for the monitoring-detector suite (SURVEY §2 batch 2)."""

from __future__ import annotations

import pytest

from selfhealingdatapipeline_gcp_spark import registry

from conftest import SF_ORACLE, assert_parity

DETECTORS = [
    "revenue_daily",
    "revenue_anomaly",
    "revenue_breakdown",
    "transaction_volume_anomaly",
    "pattern_break_region",
    "pattern_break_product",
    "reconciliation_orders_lineitem",
    "freshness_check",
    "feed_status",
    "sla_processing_velocity",
    "quality_null_trend",
    "quality_duplicate_trend",
    "quality_null_profile",
    "quality_completeness",
    "revenue_forecast",
    "transaction_breakdown",
    "reconciliation_hourly_breakdown",
    "feed_trends",
    "revenue_dow_context",
    "feed_historical_context",
    "event_anomaly_mad",
    "value_outlier_iqr",
    "orders_backlog_aging",
    "benford_first_digit",
    "event_rate_cusum",
    "revenue_weekly_seasonality",
    "revenue_anomaly_deseasonal",
]


@pytest.mark.parametrize("name", DETECTORS)
def test_parity(name, spark, duck):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_parity(q(spark, SF_ORACLE), duck, sql)


def test_revenue_anomaly_flags_something_sane(spark):
    df = registry.queries()["revenue_anomaly"](spark, SF_ORACLE)
    rows = df.collect()
    assert len(rows) > 100
    # z-scores are finite and the anomaly flag matches its definition
    for r in rows[:50]:
        assert r.is_anomaly == (abs(r.z_score) > 2.5) or r.baseline_std == 0.0


def test_parity_key_skew_profile(spark, duck):
    from conftest import SF_ORACLE as SF, assert_parity as ap
    q = registry.queries()["key_skew_profile"]
    ap(q(spark, SF), duck, registry.oracle_sql()["key_skew_profile"])


def test_revenue_forecast_projection_is_consistent(spark):
    r = registry.queries()["revenue_forecast"](spark, SF_ORACLE).collect()
    assert len(r) == 1
    row = r[0]
    assert row.forecast_days == 7
    assert row.n_history_days >= 7
    # total ≈ daily × days (both floor-truncated at 4 places)
    assert abs(row.forecast_total - row.forecast_daily_avg * 7) < 1e-2


def test_hourly_breakdown_localizes_loss(spark):
    """dest drops value<10 rows, so every discrepancy is positive and
    source_count >= dest_count on every emitted hour."""
    rows = registry.queries()["reconciliation_hourly_breakdown"](
        spark, SF_ORACLE).collect()
    assert rows, "lossy dest must produce discrepancies"
    for r in rows:
        assert r.discrepancy == r.source_count - r.dest_count > 0


def test_sla_scaling_recommendation_matches_reference(spark):
    """Mirror of sla_detector.py:113-124 _calculate_required_scaling:
    required_rate = remaining/sla_hours, scaling_factor =
    required/current (0 when idle), recommended_workers =
    int(scaling_factor) + 1."""
    import math

    row = registry.queries()["sla_processing_velocity"](
        spark, SF_ORACLE).collect()[0]
    remaining, sla_hours = row.backlog_1h, 4.0
    current = row.velocity_per_hour
    required = remaining / sla_hours
    scaling = required / current if current > 0 else 0.0
    assert row.required_rate == math.floor(required * 1e4) / 1e4
    assert abs(row.scaling_factor - math.floor(scaling * 1e4) / 1e4) < 1e-3
    assert row.recommended_workers == int(scaling) + 1


def test_drift_tv_parity(spark, duck):
    from conftest import SF_ORACLE, assert_parity

    from selfhealingdatapipeline_gcp_spark import registry
    assert_parity(registry.queries()["quality_drift_tv"](spark, SF_ORACLE),
                  duck, registry.oracle_sql()["quality_drift_tv"])


def test_drift_tv_detects_injected_shift(spark):
    """A distribution that jumps between halves must read as drifted;
    a stationary one must not."""
    import datetime as dt

    from selfhealingdatapipeline_gcp_spark.operators import quality

    base = dt.datetime(2020, 1, 1)
    rows = []
    for i in range(2000):
        ts = base + dt.timedelta(minutes=i)
        # 'shift': values 0-10 in the first half, 90-100 in the second
        rows.append((ts, "shift",
                     float(i % 10) if i < 1000 else 90.0 + i % 10))
        # 'flat': same uniform 0-10 in both halves
        rows.append((ts, "flat", float(i % 10)))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, "
                                     "value double")
    out = {r.event_type: r for r in quality.drift_tv(df).collect()}
    assert out["shift"].drifted and out["shift"].tv_e6 > 900_000
    assert not out["flat"].drifted and out["flat"].tv_e6 < 50_000


def test_event_rate_cusum_matches_recursion(spark):
    """The windowed closed form (cum - running_min) must equal the
    textbook recursion S_t = max(0, S_{t-1} + x_t - drift_floor),
    re-derived independently from the emitted totals."""
    rows = registry.queries()["event_rate_cusum"](
        spark, SF_ORACLE).collect()
    assert len(rows) > 0
    xs = [r.total_value for r in rows]
    mean = sum(xs) / len(xs)
    var = (sum(x * x for x in xs) - sum(xs) * mean) / len(xs)
    import math
    drift_floor = math.floor(mean + 0.5 * math.sqrt(max(var, 0.0)))
    s = 0
    for r in rows:
        s = max(0, s + r.total_value - drift_floor)
        assert r.cusum == s
        assert r.is_alarm == (s > r.alarm_threshold)


def test_benford_handles_negative_and_subunit_amounts(spark):
    """Negative amounts ('-' first char) and amounts < 1 (digit 0)
    must be excluded from both the digit counts and the share
    denominator, not produce NULL rows (ADVICE r5)."""
    from selfhealingdatapipeline_gcp_spark.operators import detectors

    df = spark.createDataFrame(
        [(-123.0,), (0.45,), (1.0,), (250.0,), (999.0,), (-0.2,)],
        "o_totalprice double")
    rows = detectors.benford_first_digit(df).collect()
    # -123 counts under digit 1 via abs(); 0.45 and -0.2 are dropped
    by = {r.digit: r for r in rows}
    assert set(by) == {1, 2, 9}
    assert by[1].n == 2 and by[2].n == 1 and by[9].n == 1
    total = sum(r.n for r in rows)
    assert total == 4  # denominator excludes the sub-unit rows
    for r in rows:
        assert r.benford_e6 is not None and r.is_deviant is not None


def test_deseasonal_zero_index_guard(spark):
    """A day-of-week stratum whose index floors to 0 must not raise
    (ANSI divide-by-zero / floor(inf)) — the clamp treats it as 1
    (ADVICE r5)."""
    import datetime as dt

    from selfhealingdatapipeline_gcp_spark.operators import detectors

    # 60 days; Sundays get ~zero revenue so their seasonal index
    # floors to 0 while other days carry the total
    rows = []
    base = dt.date(2020, 1, 5)  # a Sunday
    for i in range(60):
        d = base + dt.timedelta(days=i)
        amt = 0.000001 if d.isoweekday() == 7 else 50000.0
        rows.append((d.isoformat(), amt))
    df = spark.createDataFrame(rows, "o_orderdate string, "
                                     "o_totalprice double")
    out = detectors.revenue_anomaly_deseasonal(df).collect()
    assert len(out) > 0  # no ANSI error; rows survive


def test_weekly_seasonality_index_centers_on_1e6(spark):
    """Indices weighted by day counts must average ~1e6 (the overall
    mean is the weighted mean of the dow means), every dow appears,
    and revenue partitions the total."""
    rows = registry.queries()["revenue_weekly_seasonality"](
        spark, SF_ORACLE).collect()
    assert {r.dow for r in rows} == set(range(1, 8))
    n_total = sum(r.n_dow for r in rows)
    weighted = sum(r.index_e6 * r.n_dow for r in rows) / n_total
    assert abs(weighted - 1_000_000) < 10  # floor loss only


def test_deseasonal_anomaly_consistency(spark):
    """The adjusted series must be the raw series divided by its dow
    index (re-derived independently), and the windows run over the
    adjusted values — checked by recomputing one day's z from the
    emitted adjusted history."""
    rows = registry.queries()["revenue_anomaly_deseasonal"](
        spark, SF_ORACLE).collect()
    assert len(rows) > 100
    season = {r.dow: r.index_e6 for r in registry.queries()[
        "revenue_weekly_seasonality"](spark, SF_ORACLE).collect()}
    import math
    for r in rows[:20]:
        dow = r.d.isoweekday() % 7 + 1  # python Mon=1 -> Spark Sun=1
        assert r.index_e6 == season[dow]
        whole = int(r.revenue)  # rev_usd floor to whole dollars
        assert r.adj_revenue == math.floor(whole * 1e6 / r.index_e6)
    # one z re-derivation from the emitted series, following the
    # hundred-dollar accumulator discipline the operator uses
    series = {r.d: r.adj_revenue for r in rows}
    days = sorted(series)
    target = rows[len(rows) // 2]
    hist = [series[d] // 100 for d in days if d < target.d][-30:]
    n = len(hist)
    mean = sum(hist) / n * 100.0
    var = (sum(x * x for x in hist) - sum(hist) * (sum(hist) / n)) \
        / (n - 1)
    std = math.sqrt(max(var, 0.0)) * 100.0
    z = (target.adj_revenue - mean) / std if std > 0 else 0.0
    assert abs(target.z_score - math.floor(z * 1e4) / 1e4) < 1e-4


def test_interarrival_parity_and_order(spark, duck):
    assert_parity(registry.queries()["feed_interarrival_stats"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["feed_interarrival_stats"])
    for r in registry.queries()["feed_interarrival_stats"](
            spark, SF_ORACLE).collect():
        assert 0 <= r.p50_gap_s <= r.p95_gap_s <= r.max_gap_s
        assert r.n_gaps > 0


def test_schema_drift_report_classifies_changes(spark, duck):
    """Strict parity, plus classification checks on a fabricated
    drift: added column, type narrowing, and a null-rate jump."""
    from conftest import SF_ORACLE, assert_parity

    from selfhealingdatapipeline_gcp_spark import registry
    assert_parity(registry.queries()["quality_schema_drift"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["quality_schema_drift"])
    rows = {r.column: r for r in registry.queries()[
        "quality_schema_drift"](spark, SF_ORACLE).collect()}
    assert rows["o_orderpriority"].status == "added"
    assert rows["o_custkey"].type_changed
    assert rows["o_orderstatus"].null_rate_old_e6 > 100_000
    assert rows["o_orderstatus"].null_rate_delta_e6 < 0


def test_revenue_volume_correlation_parity_and_decoupling(spark, duck):
    """Strict parity; a fabricated series where revenue tracks volume
    then decouples must flag exactly the decoupled regime."""
    import datetime as dt

    from selfhealingdatapipeline_gcp_spark.operators import detectors

    assert_parity(registry.queries()["revenue_volume_correlation"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["revenue_volume_correlation"])

    rows = []
    base = dt.date(2020, 1, 1)
    for i in range(110):
        d = base + dt.timedelta(days=i)
        n = 20 + (i % 7) * 5                 # weekly volume cycle
        if i < 50:
            amt = 500.0                       # revenue tracks volume
        else:
            # revenue moves AGAINST volume: high on quiet days —
            # strongly negative r, unambiguously decoupled
            amt = (45 - (i % 7) * 5) * 100.0 / n
        rows += [(d.isoformat(), amt)] * n
    df = spark.createDataFrame(rows, "o_orderdate string, "
                                     "o_totalprice double")
    out = detectors.revenue_volume_correlation(df).collect()
    coupled = [r for r in out if r.d < base + dt.timedelta(days=45)]
    decoupled = [r for r in out if r.d >= base + dt.timedelta(days=85)]
    assert coupled and decoupled
    assert all(r.corr_30d > 0.9 for r in coupled)
    assert all(r.is_decoupled and r.corr_30d < 0 for r in decoupled)


def test_user_burstiness_constant_vs_bursty(spark):
    """A metronome user scores CV=0; a bursty user crosses CV>1; a
    2-event user (one gap) is excluded."""
    import datetime as dt
    from selfhealingdatapipeline_gcp_spark.operators import detectors
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(5):                       # user 1: constant 10s
        rows.append((eid, t0 + dt.timedelta(seconds=10 * i), 1,
                     "view", 1.0, "{}")); eid += 1
    for s in (0, 1, 2, 3, 300):              # user 2: 1,1,1,297 gaps
        rows.append((eid, t0 + dt.timedelta(seconds=s), 2,
                     "view", 1.0, "{}")); eid += 1
    for s in (0, 50):                        # user 3: one gap only
        rows.append((eid, t0 + dt.timedelta(seconds=s), 3,
                     "view", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {r.user_id: r for r in detectors.user_burstiness(df).collect()}
    assert set(out) == {1, 2}
    m = out[1]
    assert (m.n_events, m.n_gaps, m.mean_gap_s) == (5, 4, 10)
    assert m.cv_e6 == 0 and not m.is_bursty
    b = out[2]
    # gaps 1,1,1,297: n=4, s1=300, s2=88212
    # cv_e6 = floor(sqrt(4*88212 - 90000)*1e6/300)
    import math
    want = math.floor(math.sqrt(4 * 88212 - 90000) * 1e6 / 300)
    assert b.cv_e6 == want and b.is_bursty


def test_user_burstiness_parity(spark, duck):
    assert_parity(registry.queries()["user_burstiness"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["user_burstiness"])


def test_revenue_changepoint_planted_step(spark):
    """30 days at $100/day then 30 at $200/day: the argmax split must
    name the last day of the low regime with the exact segment
    means."""
    import datetime as dt
    from selfhealingdatapipeline_gcp_spark.operators import detectors
    base = dt.date(2024, 1, 1)
    rows = []
    for i in range(60):
        price = 100.0 if i < 30 else 200.0
        rows.append((i, base + dt.timedelta(days=i), price))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double")
    out = detectors.revenue_changepoint(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.changepoint_day == base + dt.timedelta(days=29)
    assert (r.n_days, r.mean_before_c, r.mean_after_c) \
        == (60, 10_000, 20_000)
    assert r.score_e6 > 0


def test_revenue_changepoint_parity(spark, duck):
    assert_parity(registry.queries()["revenue_changepoint"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["revenue_changepoint"])


def test_quality_drift_ks_planted_shift(spark):
    """Type 'shift' moves every value 1.0→2.0 across the time
    midpoint (KS = 1e6, drifted); type 'same' keeps the identical
    distribution in both halves (KS = 0)."""
    import datetime as dt
    from selfhealingdatapipeline_gcp_spark.operators import quality
    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for i in range(20):
        rows.append((eid, t0 + dt.timedelta(hours=i), 1,
                     "shift", 1.0 if i < 10 else 2.0, "{}")); eid += 1
    for i in range(20):
        rows.append((eid, t0 + dt.timedelta(hours=i), 1,
                     "same", float(i % 2), "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {r.event_type: r for r in quality.drift_ks(df).collect()}
    s = out["shift"]
    assert (s.n_first, s.n_second, s.ks_e6, bool(s.drifted)) \
        == (10, 10, 1_000_000, True)
    z = out["same"]
    assert z.ks_e6 == 0 and not z.drifted


def test_quality_drift_ks_parity(spark, duck):
    assert_parity(registry.queries()["quality_drift_ks"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["quality_drift_ks"])


def test_quality_expectations_planted_violations(spark):
    """A fabricated feed with one duplicate key, one negative amount,
    and one out-of-domain status must fail exactly the uniqueness /
    positivity / domain rules and pass the rest."""
    import datetime as dt
    from selfhealingdatapipeline_gcp_spark.operators import quality
    base = dt.date(2024, 1, 1)
    rows = [(i, base, 100.0, "O") for i in range(97)]
    rows.append((0, base, 50.0, "O"))        # duplicate key
    rows.append((200, base, -5.0, "O"))      # negative amount
    rows.append((201, base, 10.0, "X"))      # bad status
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double, "
              "o_orderstatus string")
    out = {r.rule_id: r for r in quality.expectations_orders(df).collect()}
    assert all(r.n_rows == 100 for r in out.values())
    assert out["r1"].passed and out["r1"].observed_e6 == 1_000_000
    assert not out["r2"].passed and out["r2"].observed_e6 == 990_000
    assert not out["r3"].passed and out["r3"].observed_e6 == 990_000
    assert not out["r4"].passed and out["r4"].observed_e6 == 990_000
    assert out["r5"].passed


def test_quality_expectations_parity(spark, duck):
    assert_parity(registry.queries()["quality_expectations"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["quality_expectations"])


def test_streaming_expectations_guard_parity(spark, duck):
    assert_parity(
        registry.queries()["streaming_expectations_guard"](
            spark, SF_ORACLE), duck,
        registry.oracle_sql()["streaming_expectations_guard"])


def test_streaming_expectations_guard_chop_invariance(spark, tmp_path):
    """A 3-file source with maxFilesPerTrigger=1 runs >= 2
    micro-batches; rule counts are sums and uniqueness is a distinct
    over the key union — including a DUPLICATE KEY SPLIT ACROSS
    EPOCHS, which per-epoch distinct counts alone would miss; the
    accumulated report must equal batch quality_expectations row
    for row."""
    import os
    from pyspark.sql import functions as F
    from selfhealingdatapipeline_gcp_spark import catalog
    from selfhealingdatapipeline_gcp_spark.operators import quality
    from selfhealingdatapipeline_gcp_spark.streaming import monitors

    src = str(tmp_path / "sf_expect")
    os.makedirs(src)
    orders = catalog.load(spark, SF_ORACLE, "orders")
    # plant a cross-file duplicate: copy one order row, force the two
    # copies into different files via repartition on a synthetic col
    dup = orders.limit(1)
    (orders.unionByName(dup).repartition(3)
     .write.parquet(f"{src}/orders.parquet"))

    streamed = [tuple(r) for r in monitors.streaming_expectations_guard(
        spark, src, max_files_per_trigger=1).collect()]
    batch = [tuple(r) for r in quality.expectations_orders(
        catalog.load(spark, src, "orders")).collect()]
    assert streamed == batch and len(batch) == 5
    by_rule = {t[0]: t for t in streamed}
    assert by_rule["r2"][5] is False  # the planted dup fails uniqueness


def test_quantile_sketch_audit_known_distribution(spark):
    """Uniform 1..1000-cent values: with 1024 buckets over a ~999-cent
    span each bucket holds <1 cent, so the histogram estimate must sit
    within one bucket width (<=1 cent) of the exact percentile; a
    constant-valued type degenerates to zero error by definition."""
    from selfhealingdatapipeline_gcp_spark.operators import quality

    rows = [("uni", i / 100.0) for i in range(1, 1001)]
    rows += [("flat", 7.77)] * 50
    df = spark.createDataFrame(rows, ["event_type", "value"])
    out = quality.quantile_sketch_audit(df).collect()
    assert [(r.event_type, r.q) for r in out] == [
        ("flat", 50), ("flat", 90), ("flat", 99),
        ("uni", 50), ("uni", 90), ("uni", 99)]
    for r in out:
        if r.event_type == "flat":
            assert r.exact_c == 777 and r.est_c == 777 and r.abs_err_c == 0
        else:
            assert r.n == 1000
            # exact p50 of 1..1000 cents = 500 (floor of 500.5)
            assert r.abs_err_c <= 1


def test_quantile_sketch_audit_parity(spark, duck):
    assert_parity(registry.queries()["quantile_sketch_audit"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["quantile_sketch_audit"])


def test_streaming_quantile_guard_chop_invariance(spark, tmp_path):
    """A 3-file source with maxFilesPerTrigger=1 runs >= 2
    micro-batches; (type, cent, count) partials are associative, so
    the summed epochs must reproduce batch quantile_sketch_audit row
    for row."""
    import os
    from selfhealingdatapipeline_gcp_spark import catalog
    from selfhealingdatapipeline_gcp_spark.operators import quality
    from selfhealingdatapipeline_gcp_spark.streaming import monitors

    src = str(tmp_path / "sf_qg")
    os.makedirs(src)
    events = catalog.load(spark, SF_ORACLE, "events")
    events.repartition(3).write.parquet(f"{src}/events.parquet")

    streamed = [tuple(r) for r in monitors.streaming_quantile_guard(
        spark, src, max_files_per_trigger=1).collect()]
    batch = [tuple(r) for r in quality.quantile_sketch_audit(
        catalog.load(spark, src, "events")).collect()]
    assert streamed == batch and len(batch) == 15


def test_streaming_quantile_guard_parity(spark, duck):
    assert_parity(registry.queries()["streaming_quantile_guard"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["streaming_quantile_guard"])


def test_distinct_kmv_audit_small_exact_large_bounded(spark):
    """A type with fewer distinct keys than k must be answered
    EXACTLY (the sketch holds every hash); a 5000-key type must land
    within the KMV error envelope (rsd ~ 1/sqrt(k-2) ~ 13% at k=64;
    assert a generous 3-sigma-ish 50%). Deterministic md5 hashes make
    the measured error itself reproducible."""
    from selfhealingdatapipeline_gcp_spark.operators import quality

    rows = [("small", i % 40) for i in range(200)]
    rows += [("big", 1000 + i) for i in range(5000)]
    df = spark.createDataFrame(rows, ["event_type", "user_id"])
    out = {r.event_type: r for r in quality.distinct_kmv_audit(df).collect()}
    assert out["small"].exact_distinct == 40
    assert out["small"].kmv_estimate == 40 and out["small"].err_e6 == 0
    assert out["big"].exact_distinct == 5000
    assert out["big"].err_e6 < 500_000


def test_distinct_kmv_audit_parity(spark, duck):
    assert_parity(registry.queries()["distinct_kmv_audit"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["distinct_kmv_audit"])


def test_streaming_kmv_guard_chop_invariance(spark, tmp_path):
    """A 3-file source with maxFilesPerTrigger=1 runs >= 2
    micro-batches; the distinct-hash relation is a union of per-epoch
    distinct sets, so the accumulated state must reproduce batch
    distinct_kmv_audit row for row."""
    import os
    from selfhealingdatapipeline_gcp_spark import catalog
    from selfhealingdatapipeline_gcp_spark.operators import quality
    from selfhealingdatapipeline_gcp_spark.streaming import monitors

    src = str(tmp_path / "sf_kmv")
    os.makedirs(src)
    events = catalog.load(spark, SF_ORACLE, "events")
    events.repartition(3).write.parquet(f"{src}/events.parquet")

    streamed = [tuple(r) for r in monitors.streaming_kmv_guard(
        spark, src, max_files_per_trigger=1).collect()]
    batch = [tuple(r) for r in quality.distinct_kmv_audit(
        catalog.load(spark, src, "events")).collect()]
    assert streamed == batch and len(batch) == 5


def test_streaming_kmv_guard_parity(spark, duck):
    assert_parity(registry.queries()["streaming_kmv_guard"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["streaming_kmv_guard"])


def test_join_skew_advisor_planted_hot_key(spark):
    """One user with 100x the activity of everyone else must rank
    first with a salt factor near its multiple of the mean; uniform
    keys must recommend salt 1-2 (ceiling of ~1x mean)."""
    from selfhealingdatapipeline_gcp_spark.operators import quality

    ev = [(0, 9_999)] * 2000 + [(u, u) for u in range(1, 41)
                                for _ in range(20)]
    orders = [(k, k) for k in range(0, 41) for _ in range(3)]
    edf = spark.createDataFrame(ev, ["user_id", "x"])
    odf = spark.createDataFrame(orders, ["o_custkey", "y"])
    out = quality.join_skew_advisor(edf, odf).collect()
    assert out[0].key == 0 and out[0].rank == 1
    assert out[0].out_rows == 6000 and out[0].na == 2000
    # mean out = (6000 + 40*60)/41 = 205 -> salt ~ ceil(6000/205) = 30
    assert 20 <= out[0].salt_factor <= 40
    assert all(r.salt_factor <= 2 for r in out[1:])


def test_join_skew_advisor_parity(spark, duck):
    assert_parity(registry.queries()["join_skew_advisor"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["join_skew_advisor"])


def test_forecast_backtest_fabricated_series(spark):
    """40 days of constant $100 revenue with a $200 spike on the last
    day: every method forecasts the constant exactly, so all error
    mass comes from the spike — MAE floor(10000/12)=833, signed bias
    floor(-10000/12)=-834 (FLOOR, not truncation — the negative case
    is exactly where engines diverge), MAPE floor(500000/12)=41666."""
    import datetime as dt
    from selfhealingdatapipeline_gcp_spark.operators import detectors

    d0 = dt.date(2024, 1, 1)
    rows = [(i, 1, "O", 200.0 if i == 39 else 100.0,
             dt.datetime.combine(d0 + dt.timedelta(days=i),
                                 dt.time()), "1-URGENT")
            for i in range(40)]
    orders = spark.createDataFrame(
        rows, ["o_orderkey", "o_custkey", "o_orderstatus",
               "o_totalprice", "o_orderdate", "o_orderpriority"])
    out = {r.method: r
           for r in detectors.forecast_backtest_report(orders).collect()}
    assert set(out) == {"naive_1", "seasonal_7", "trailing_mean_28",
                        "ewma_14"}
    for m, r in out.items():
        assert r.n_days == 12, m          # obs 29..40 have full history
        assert r.mae_cents == 833, m
        assert r.bias_cents == -834, m    # floor(-10000/12)
        assert r.mape_e6 == 41666, m


def test_forecast_backtest_parity(spark, duck):
    from conftest import assert_parity
    assert_parity(
        registry.queries()["forecast_backtest_report"](spark, SF_ORACLE),
        duck, registry.oracle_sql()["forecast_backtest_report"])


def test_k_anonymity_fabricated_groups(spark):
    """3 QI classes of sizes 1, 3, 6: k=2 flags the singleton (1 row),
    k=5 flags sizes 1+3 (4 rows), k=10/25 flag all (10 rows)."""
    from selfhealingdatapipeline_gcp_spark.operators import quality

    rows = ([(i, "c", 0, 100.0, "SEG_A") for i in range(1)]
            + [(10 + i, "c", 0, 2100.0, "SEG_A") for i in range(3)]
            + [(20 + i, "c", 1, 100.0, "SEG_B") for i in range(6)])
    cust = spark.createDataFrame(
        rows, ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
               "c_mktsegment"])
    out = {r.k: r for r in quality.k_anonymity_audit(cust).collect()}
    assert set(out) == {2, 5, 10, 25}
    for r in out.values():
        assert r.n_groups == 3 and r.n_rows == 10
    assert (out[2].n_groups_below_k, out[2].n_rows_below_k) == (1, 1)
    assert (out[5].n_groups_below_k, out[5].n_rows_below_k) == (2, 4)
    assert (out[10].n_groups_below_k, out[10].n_rows_below_k) == (3, 10)
    assert out[2].at_risk_rate_e6 == 100_000      # floor(1e6/10)
    assert out[10].at_risk_rate_e6 == 1_000_000


def test_k_anonymity_parity(spark, duck):
    assert_parity(
        registry.queries()["k_anonymity_audit"](spark, SF_ORACLE),
        duck, registry.oracle_sql()["k_anonymity_audit"])


def test_fk_orphan_fabricated_edges(spark):
    """Two edges, one with 2 of 5 child rows orphaned, one clean —
    and a duplicate parent key that must NOT double-count matches."""
    from selfhealingdatapipeline_gcp_spark.operators import quality

    child = spark.createDataFrame(
        [(i, i % 5) for i in range(5)], ["id", "fk"])
    # parent holds keys 0,1,2 with key 1 duplicated
    parent = spark.createDataFrame(
        [(0,), (1,), (1,), (2,)], ["pk"])
    out = quality.fk_orphan_audit([
        (child, "child", "fk", parent, "parent", "pk"),
        (child, "child", "id", child, "child", "id"),
    ]).collect()
    by_edge = {(r.child_table, r.fk_col): r for r in out}
    orphaned = by_edge[("child", "fk")]
    assert orphaned.n_child_rows == 5          # dup parent key: still 5
    assert orphaned.n_orphans == 2             # fks 3 and 4
    assert orphaned.orphan_rate_e6 == 400_000
    clean = by_edge[("child", "id")]
    assert clean.n_orphans == 0 and clean.orphan_rate_e6 == 0


def test_fk_orphan_parity(spark, duck):
    assert_parity(
        registry.queries()["fk_orphan_audit"](spark, SF_ORACLE),
        duck, registry.oracle_sql()["fk_orphan_audit"])


def test_sax_fabricated_two_level_series(spark):
    """28 days: $100/day for 14, $500/day for 14 → rev_h ∈ {1, 5},
    mean 3, population σ 2, so the four 7-day PAA windows z to
    exactly -1, -1, +1, +1 → symbols a, a, d, d."""
    import datetime as dt
    from selfhealingdatapipeline_gcp_spark.operators import detectors

    d0 = dt.date(2024, 3, 1)
    rows = [(i, 1, "O", 100.0 if i < 14 else 500.0,
             dt.datetime.combine(d0 + dt.timedelta(days=i), dt.time()),
             "1-URGENT")
            for i in range(28)]
    orders = spark.createDataFrame(
        rows, ["o_orderkey", "o_custkey", "o_orderstatus",
               "o_totalprice", "o_orderdate", "o_orderpriority"])
    out = detectors.series_sax_symbols(orders).collect()
    assert [r.symbol for r in out] == ["a", "a", "d", "d"]
    assert [r.n_obs for r in out] == [7, 7, 7, 7]
    assert [r.paa_h for r in out] == [1, 1, 5, 5]
    assert out[0].z_e6 == -1_000_000 and out[3].z_e6 == 1_000_000


def test_sax_constant_series_is_all_c(spark):
    """Zero variance → the σ=0 guard pins z to 0 → symbol 'c'."""
    import datetime as dt
    from selfhealingdatapipeline_gcp_spark.operators import detectors

    d0 = dt.date(2024, 3, 1)
    rows = [(i, 1, "O", 250.0,
             dt.datetime.combine(d0 + dt.timedelta(days=i), dt.time()),
             "1-URGENT") for i in range(10)]
    orders = spark.createDataFrame(
        rows, ["o_orderkey", "o_custkey", "o_orderstatus",
               "o_totalprice", "o_orderdate", "o_orderpriority"])
    out = detectors.series_sax_symbols(orders).collect()
    assert len(out) == 2 and {r.symbol for r in out} == {"c"}
    assert {r.z_e6 for r in out} == {0}


def test_sax_parity(spark, duck):
    assert_parity(
        registry.queries()["series_sax_symbols"](spark, SF_ORACLE),
        duck, registry.oracle_sql()["series_sax_symbols"])


def test_sax_motif_novelty_planted_discord(spark):
    """35 days: weeks alternate $100/$500 except week 3 ($900 — a
    level never repeated). Symbols: a c a d a → trailing 4-grams
    'acad' (win 3) and 'cada' (win 4), each unique → both novel; the
    series head (wins 0-2) has no full word and must NOT appear."""
    import datetime as dt
    from selfhealingdatapipeline_gcp_spark.operators import detectors

    d0 = dt.date(2024, 5, 1)
    week_price = [100.0, 500.0, 100.0, 900.0, 100.0]
    rows = [(i, 1, "O", week_price[i // 7],
             dt.datetime.combine(d0 + dt.timedelta(days=i), dt.time()),
             "1-URGENT") for i in range(35)]
    orders = spark.createDataFrame(
        rows, ["o_orderkey", "o_custkey", "o_orderstatus",
               "o_totalprice", "o_orderdate", "o_orderpriority"])
    out = detectors.sax_motif_novelty(orders).collect()
    assert [r.win_idx for r in out] == [3, 4]
    assert all(r.is_novel and r.n_occurrences == 1 for r in out)
    syms = {r.win_idx: r.symbol
            for r in detectors.series_sax_symbols(orders).collect()}
    assert "".join(syms[i] for i in range(5)) == out[0].motif + syms[4]


def test_sax_motif_novelty_parity(spark, duck):
    assert_parity(
        registry.queries()["sax_motif_novelty"](spark, SF_ORACLE),
        duck, registry.oracle_sql()["sax_motif_novelty"])


def test_catalog_stats_fabricated_table(spark):
    """Known stats: 4 rows, one NULL segment, money min/max as exact
    cents strings — the planner-facing numbers are checkable by
    hand."""
    from selfhealingdatapipeline_gcp_spark.operators import quality

    cust = spark.createDataFrame(
        [(1, "a", 0, 10.50, "AUTO"), (2, "b", 0, -3.25, "AUTO"),
         (3, "c", 1, 99.99, None), (4, "d", 1, 10.50, "HOUSE")],
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
         "c_mktsegment"])
    out = {r.col_name: r for r in quality.catalog_stats_report(
        {"customer": cust}).collect()}
    assert set(out) == {"c_custkey", "c_nationkey", "c_mktsegment",
                        "c_acctbal_cents"}
    seg = out["c_mktsegment"]
    assert (seg.n_rows, seg.n_nulls, seg.n_distinct) == (4, 1, 2)
    bal = out["c_acctbal_cents"]
    assert (bal.min_value, bal.max_value) == ("-325", "9999")
    assert bal.n_distinct == 3


def test_catalog_stats_parity(spark, duck):
    assert_parity(
        registry.queries()["catalog_stats_report"](spark, SF_ORACLE),
        duck, registry.oracle_sql()["catalog_stats_report"])


def test_incident_rollup_is_union_of_parents(spark):
    """Internal consistency on real data: every rollup row appears in
    its parent's flagged set, and the counts add up exactly."""
    from selfhealingdatapipeline_gcp_spark.operators import detectors
    from selfhealingdatapipeline_gcp_spark import catalog

    orders = catalog.load(spark, SF_ORACLE, "orders")
    events = catalog.load(spark, SF_ORACLE, "events")
    roll = detectors.detector_incident_rollup(orders, events).collect()
    by_det = {}
    for r in roll:
        by_det.setdefault(r.detector, set()).add(r.d)
    parents = {
        "revenue_z": {r.d for r in detectors.revenue_anomaly(orders)
                      .collect() if r.is_anomaly},
        "revenue_z_deseasonal": {
            r.d for r in detectors.revenue_anomaly_deseasonal(orders)
            .collect() if r.is_anomaly},
        "event_value_cusum": {r.d for r in detectors.event_rate_cusum(
            events).collect() if r.is_alarm},
        "event_value_mad": {r.d for r in detectors.event_anomaly_mad(
            events).collect() if r.is_outlier},
    }
    assert len(roll) == sum(len(v) for v in parents.values())
    for det, days in by_det.items():
        assert days == parents[det], det
    assert roll == sorted(roll, key=lambda r: (r.d, r.detector))


def test_incident_rollup_parity(spark, duck):
    assert_parity(
        registry.queries()["detector_incident_rollup"](spark, SF_ORACLE),
        duck, registry.oracle_sql()["detector_incident_rollup"])
