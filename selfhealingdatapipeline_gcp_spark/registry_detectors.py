"""Registry entries for the monitoring detectors + data quality
(SURVEY.md §2). Oracle SQL mirrors each Spark plan expression by
expression — same anchors, same guards, same rounding."""

from __future__ import annotations

from selfhealingdatapipeline_gcp_spark import catalog
from selfhealingdatapipeline_gcp_spark.operators import detectors, quality
from selfhealingdatapipeline_gcp_spark.registry import register


def _t(spark, sf, *names):
    return [catalog.load(spark, sf, n) for n in names]


register(
    "revenue_daily",
    lambda spark, sf: detectors.revenue_daily(*_t(spark, sf, "orders")),
    """
    SELECT CAST(o_orderdate AS DATE) AS d,
           (sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0) AS revenue,
           count(*) AS n_txn
    FROM orders
    GROUP BY 1
    """,
)

register(
    "revenue_anomaly",
    lambda spark, sf: detectors.revenue_anomaly(*_t(spark, sf, "orders")),
    '\n    WITH daily AS (\n      SELECT CAST(o_orderdate AS DATE) AS d,\n             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c\n      FROM orders GROUP BY 1\n    ), daily2 AS (\n      SELECT d, rev_c,\n             CAST((rev_c - (rev_c % 100)) / 100 AS BIGINT) AS rev_usd\n      FROM daily\n    ), daily3 AS (\n      SELECT d, rev_c,\n             CAST((rev_usd - (rev_usd % 100)) / 100 AS BIGINT) AS rev_h\n      FROM daily2\n    ), win AS (\n      SELECT d, rev_c,\n             CAST(sum(rev_h)         OVER w AS DOUBLE) AS sum_u,\n             CAST(sum(rev_h * rev_h) OVER w AS DOUBLE) AS sumsq_u,\n             CAST(count(rev_h)       OVER w AS DOUBLE) AS n_hist\n      FROM daily3\n      WINDOW w AS (ORDER BY d ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)\n    )\n    SELECT d,\n           (rev_c / 100.0) AS revenue,\n           (floor((sum_u / n_hist * 100.0) * 10000.0) / 10000.0) AS baseline_avg,\n           (floor(((sqrt(greatest((sumsq_u - sum_u * sum_u / n_hist) / (n_hist - 1), 0.0))) * 100.0) * 10000.0) / 10000.0) AS baseline_std,\n           (floor((CASE WHEN (sqrt(greatest((sumsq_u - sum_u * sum_u / n_hist) / (n_hist - 1), 0.0)) * 100.0) > 0 THEN ((rev_c / 100.0) - (sum_u / n_hist * 100.0)) / (sqrt(greatest((sumsq_u - sum_u * sum_u / n_hist) / (n_hist - 1), 0.0)) * 100.0) ELSE 0.0 END) * 10000.0) / 10000.0) AS z_score,\n           (abs(CASE WHEN (sqrt(greatest((sumsq_u - sum_u * sum_u / n_hist) / (n_hist - 1), 0.0)) * 100.0) > 0 THEN ((rev_c / 100.0) - (sum_u / n_hist * 100.0)) / (sqrt(greatest((sumsq_u - sum_u * sum_u / n_hist) / (n_hist - 1), 0.0)) * 100.0) ELSE 0.0 END) > 2.5) AS is_anomaly\n    FROM win\n    WHERE n_hist >= 7\n    ',
)

register(
    "revenue_breakdown",
    lambda spark, sf: detectors.revenue_breakdown(
        *_t(spark, sf, "orders", "lineitem", "part", "customer",
            "nation", "region")),
    """
    SELECT r_name AS region, p_brand AS brand,
           count(*) AS transaction_count,
           (sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0) AS category_revenue,
           (floor(((sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0) / count(*)) * 10000.0) / 10000.0)
             AS avg_transaction_value
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= (SELECT max(o_orderdate) FROM orders) - INTERVAL 30 DAY
    GROUP BY 1, 2
    ORDER BY category_revenue DESC, region, brand
    LIMIT 10
    """,
)

register(
    "revenue_forecast",
    lambda spark, sf: detectors.revenue_forecast(*_t(spark, sf, "orders")),
    """
    WITH a AS (SELECT CAST(max(o_orderdate) AS DATE) AS anchor_day FROM orders),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders, a
      WHERE CAST(o_orderdate AS DATE) >= anchor_day - INTERVAL 30 DAY
      GROUP BY 1
    ), r AS (
      SELECT d, rev_c, row_number() OVER (ORDER BY d DESC) AS rn,
             count(*) OVER () AS n_hist
      FROM daily
    ), t AS (
      SELECT CAST(sum(rev_c) AS BIGINT) AS s,
             CAST(max(n_hist) AS BIGINT) AS n_history_days
      FROM r WHERE rn <= 7
    )
    SELECT (floor((s / 7.0 / 100.0) * 10000.0) / 10000.0) AS forecast_daily_avg,
           CAST(7 AS BIGINT) AS forecast_days,
           (floor(((s / 7.0 / 100.0) * 7.0) * 10000.0) / 10000.0) AS forecast_total,
           n_history_days
    FROM t WHERE n_history_days >= 7
    """,
)

register(
    "transaction_breakdown",
    lambda spark, sf: detectors.transaction_breakdown(
        *_t(spark, sf, "orders", "lineitem", "part", "customer",
            "nation", "region")),
    """
    SELECT r_name AS region, p_brand AS category,
           count(*) AS txn_count,
           (sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0) AS revenue
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= (SELECT max(o_orderdate) FROM orders) - INTERVAL 72 HOUR
    GROUP BY 1, 2
    ORDER BY txn_count DESC, region, category
    LIMIT 10
    """,
)

register(
    "revenue_dow_context",
    lambda spark, sf: detectors.revenue_dow_context(*_t(spark, sf, "orders")),
    """
    WITH a AS (SELECT CAST(max(o_orderdate) AS DATE) AS anchor_day FROM orders),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             (sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT d, dayname(d) AS day_of_week, revenue
    FROM daily, a
    WHERE dayofweek(d) = dayofweek(anchor_day)
      AND d < anchor_day
      AND d >= anchor_day - INTERVAL 90 DAY
    ORDER BY d DESC LIMIT 12
    """,
)

register(
    "feed_historical_context",
    lambda spark, sf: detectors.feed_historical_context(
        *_t(spark, sf, "events")),
    """
    WITH g AS (SELECT max(ts) AS now_ts FROM events)
    SELECT event_type AS feed_id,
           count(*) AS total_arrivals,
           count(DISTINCT CAST(ts AS DATE)) AS days_arrived,
           max(ts) AS last_seen,
           (floor((avg(extract(hour FROM ts))) * 10000.0) / 10000.0)
             AS avg_arrival_hour
    FROM events, g
    WHERE ts >= now_ts - INTERVAL 30 DAY
    GROUP BY 1
    """,
)

register(
    "transaction_volume_anomaly",
    lambda spark, sf: detectors.transaction_volume_anomaly(
        *_t(spark, sf, "events")),
    '\n    WITH hourly AS (\n      SELECT CAST(ts AS DATE) AS d, CAST(extract(hour FROM ts) AS INT) AS h,\n             count(*) AS cnt\n      FROM events GROUP BY 1, 2\n    ), a AS (\n      SELECT CAST(max(ts) AS DATE) AS anchor_day FROM events\n    ), baseline AS (\n      SELECT h,\n             CAST(sum(cnt) AS DOUBLE) AS s1,\n             CAST(sum(cnt * cnt) AS DOUBLE) AS s2,\n             CAST(count(*) AS DOUBLE) AS nb\n      FROM hourly, a WHERE d < anchor_day GROUP BY h\n    )\n    SELECT c.h AS hour, c.cnt AS txn_count,\n           (floor(((s1 / nb)) * 10000.0) / 10000.0) AS baseline_avg,\n           (floor(((CASE WHEN nb > 1 THEN sqrt(greatest((s2 - s1 * s1 / nb) / (nb - 1), 0.0)) END)) * 10000.0) / 10000.0) AS baseline_std,\n           (floor((CASE WHEN (CASE WHEN nb > 1 THEN sqrt(greatest((s2 - s1 * s1 / nb) / (nb - 1), 0.0)) END) > 0 THEN (c.cnt - (s1 / nb)) / (CASE WHEN nb > 1 THEN sqrt(greatest((s2 - s1 * s1 / nb) / (nb - 1), 0.0)) END) ELSE 0.0 END) * 10000.0) / 10000.0) AS z_score,\n           (abs(CASE WHEN (CASE WHEN nb > 1 THEN sqrt(greatest((s2 - s1 * s1 / nb) / (nb - 1), 0.0)) END) > 0 THEN (c.cnt - (s1 / nb)) / (CASE WHEN nb > 1 THEN sqrt(greatest((s2 - s1 * s1 / nb) / (nb - 1), 0.0)) END) ELSE 0.0 END) > 2.5) AS is_anomaly\n    FROM hourly c, a\n    JOIN baseline ON c.h = baseline.h\n    WHERE c.d = anchor_day\n    ',
)

_DEV = ("CASE WHEN baseline_daily > 0 THEN "
        "(recent_daily - baseline_daily) / baseline_daily * 100.0 ELSE 0.0 END")
register(
    "pattern_break_region",
    lambda spark, sf: detectors.pattern_break_region(
        *_t(spark, sf, "orders", "customer", "nation", "region")),
    f"""
    WITH a AS (
      SELECT CAST(max(o_orderdate) AS DATE) AS anchor_day FROM orders
    ), counts AS (
      SELECT CAST(o_orderdate AS DATE) AS d, r_name AS region, count(*) AS cnt
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY 1, 2
    ), agg AS (
      SELECT region,
             sum(CASE WHEN d >  anchor_day - INTERVAL 7 DAY THEN cnt ELSE 0 END) / 7.0  AS recent_daily,
             sum(CASE WHEN d <= anchor_day - INTERVAL 7 DAY THEN cnt ELSE 0 END) / 30.0 AS baseline_daily
      FROM counts, a
      WHERE d > anchor_day - INTERVAL 37 DAY
      GROUP BY region
    )
    SELECT region,
           (floor((recent_daily) * 10000.0) / 10000.0) AS recent_daily,
           (floor((baseline_daily) * 10000.0) / 10000.0) AS baseline_daily,
           (floor(({_DEV}) * 10000.0) / 10000.0) AS deviation_pct,
           (abs({_DEV}) > 50.0) AS is_break
    FROM agg
    """,
)

register(
    "pattern_break_product",
    lambda spark, sf: detectors.pattern_break_product(
        *_t(spark, sf, "lineitem", "part")),
    f"""
    WITH a AS (
      SELECT CAST(max(l_shipdate) AS DATE) AS anchor_day FROM lineitem
    ), counts AS (
      SELECT CAST(l_shipdate AS DATE) AS d, p_brand AS brand, count(*) AS cnt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    ), agg AS (
      SELECT brand,
             sum(CASE WHEN d >  anchor_day - INTERVAL 7 DAY THEN cnt ELSE 0 END) / 7.0  AS recent_daily,
             sum(CASE WHEN d <= anchor_day - INTERVAL 7 DAY THEN cnt ELSE 0 END) / 30.0 AS baseline_daily
      FROM counts, a
      WHERE d > anchor_day - INTERVAL 37 DAY
      GROUP BY brand
    )
    SELECT brand,
           (floor((recent_daily) * 10000.0) / 10000.0) AS recent_daily,
           (floor((baseline_daily) * 10000.0) / 10000.0) AS baseline_daily,
           (floor(({_DEV}) * 10000.0) / 10000.0) AS deviation_pct,
           (abs({_DEV}) > 50.0) AS is_break
    FROM agg
    """,
)

register(
    "reconciliation_orders_lineitem",
    lambda spark, sf: detectors.reconciliation_orders_lineitem(
        *_t(spark, sf, "orders", "lineitem")),
    """
    WITH w AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
      FROM orders
      WHERE o_orderdate > (SELECT max(o_orderdate) FROM orders) - INTERVAL 90 DAY
    ), src AS (
      SELECT d, count(*) AS n_source FROM w GROUP BY d
    ), m AS (
      SELECT d, count(*) AS n_dest FROM w
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      GROUP BY d
    )
    SELECT src.d, n_source,
           coalesce(n_dest, 0) AS n_dest,
           (floor(((n_source - coalesce(n_dest, 0)) * 100.0 / n_source) * 10000.0) / 10000.0)
             AS discrepancy_pct,
           (n_source != coalesce(n_dest, 0)) AS is_mismatch
    FROM src LEFT JOIN m ON src.d = m.d
    """,
)

register(
    # source = all events; destination simulates partial load loss
    # (rows with value < 10 dropped) so the hour-grain discrepancy
    # localization actually exercises the FULL OUTER path on testdata;
    # the operator itself is generic over any source/dest pair
    "reconciliation_hourly_breakdown",
    lambda spark, sf: detectors.reconciliation_hourly_breakdown(
        catalog.load(spark, sf, "events"),
        catalog.load(spark, sf, "events").filter("value >= 10")),
    """
    WITH a AS (SELECT CAST(max(ts) AS DATE) AS anchor_day FROM events),
    s AS (
      SELECT CAST(extract(hour FROM ts) AS INT) AS hour, count(*) AS c
      FROM events, a WHERE CAST(ts AS DATE) = anchor_day GROUP BY 1
    ), d AS (
      SELECT CAST(extract(hour FROM ts) AS INT) AS hour, count(*) AS c
      FROM events, a
      WHERE CAST(ts AS DATE) = anchor_day AND value >= 10 GROUP BY 1
    )
    SELECT coalesce(s.hour, d.hour) AS hour,
           CAST(coalesce(s.c, 0) AS BIGINT) AS source_count,
           CAST(coalesce(d.c, 0) AS BIGINT) AS dest_count,
           CAST(coalesce(s.c, 0) - coalesce(d.c, 0) AS BIGINT) AS discrepancy
    FROM s FULL OUTER JOIN d ON s.hour = d.hour
    WHERE coalesce(s.c, 0) - coalesce(d.c, 0) != 0
    ORDER BY hour
    """,
)

register(
    "feed_trends",
    lambda spark, sf: detectors.feed_trends(*_t(spark, sf, "events")),
    """
    WITH a AS (SELECT max(ts) AS now_ts FROM events)
    SELECT CAST(ts AS DATE) AS d,
           count(DISTINCT event_type) AS feed_count,
           count(*) AS total_arrivals
    FROM events, a
    WHERE ts >= now_ts - INTERVAL 30 DAY
    GROUP BY 1
    """,
)

register(
    "freshness_check",
    lambda spark, sf: detectors.freshness_check(*_t(spark, sf, "events")),
    """
    WITH per_source AS (
      SELECT event_type AS source, max(ts) AS last_update
      FROM events GROUP BY 1
    ), g AS (SELECT max(ts) AS now_ts FROM events)
    SELECT source, last_update,
           (floor(((epoch_us(now_ts) - epoch_us(last_update)) / 60000000.0) * 10000.0) / 10000.0)
             AS age_minutes,
           ((epoch_us(now_ts) - epoch_us(last_update)) / 60000000.0 > 60.0)
             AS is_stale
    FROM per_source, g
    """,
)

register(
    "feed_status",
    lambda spark, sf: detectors.feed_status(*_t(spark, sf, "events")),
    """
    WITH expected AS (
      SELECT DISTINCT event_type AS feed_id FROM events
    ), a AS (SELECT CAST(max(ts) AS DATE) AS anchor_day FROM events),
    today AS (
      SELECT event_type AS feed_id, max(ts) AS last_arrival,
             count(*) AS n_arrivals
      FROM events, a
      WHERE CAST(ts AS DATE) = anchor_day AND extract(hour FROM ts) < 17
      GROUP BY 1
    )
    SELECT e.feed_id, t.last_arrival,
           coalesce(t.n_arrivals, 0) AS n_arrivals,
           t.last_arrival IS NOT NULL AS arrived,
           t.last_arrival IS NULL AS is_missing
    FROM expected e LEFT JOIN today t ON e.feed_id = t.feed_id
    """,
)

register(
    "sla_processing_velocity",
    lambda spark, sf: detectors.sla_processing_velocity(
        *_t(spark, sf, "events")),
    """
    WITH g AS (SELECT max(ts) AS now_ts FROM events),
    agg AS (
      SELECT
        CAST(sum(CASE WHEN ts > now_ts - INTERVAL 24 HOUR THEN 1 ELSE 0 END) AS BIGINT) AS n_24h,
        CAST(sum(CASE WHEN ts > now_ts - INTERVAL 1 HOUR THEN 1 ELSE 0 END) AS BIGINT) AS backlog_1h
      FROM events, g
    )
    SELECT (floor((n_24h / 24.0) * 10000.0) / 10000.0) AS velocity_per_hour,
           backlog_1h,
           (floor((CASE WHEN n_24h / 24.0 > 0 THEN backlog_1h / (n_24h / 24.0) ELSE 0.0 END) * 10000.0) / 10000.0)
             AS projected_hours,
           (CASE WHEN n_24h / 24.0 > 0
                 THEN backlog_1h / (n_24h / 24.0) ELSE 0.0 END > 4.0)
             AS sla_breach,
           (floor((backlog_1h / 4.0) * 10000.0) / 10000.0) AS required_rate,
           (floor((CASE WHEN n_24h / 24.0 > 0
                        THEN (backlog_1h / 4.0) / (n_24h / 24.0)
                        ELSE 0.0 END) * 10000.0) / 10000.0) AS scaling_factor,
           CAST(floor(CASE WHEN n_24h / 24.0 > 0
                           THEN (backlog_1h / 4.0) / (n_24h / 24.0)
                           ELSE 0.0 END) + 1 AS INT) AS recommended_workers
    FROM agg
    """,
)

register(
    "quality_null_trend",
    lambda spark, sf: detectors.quality_null_trend(*_t(spark, sf, "events")),
    """
    WITH a AS (SELECT CAST(max(ts) AS DATE) AS anchor_day FROM events),
    w AS (
      SELECT
        sum(CASE WHEN CAST(ts AS DATE) = anchor_day AND value IS NULL THEN 1 ELSE 0 END) * 100.0
          / sum(CASE WHEN CAST(ts AS DATE) = anchor_day THEN 1 ELSE 0 END) AS value_today,
        sum(CASE WHEN CAST(ts AS DATE) != anchor_day AND value IS NULL THEN 1 ELSE 0 END) * 100.0
          / sum(CASE WHEN CAST(ts AS DATE) != anchor_day THEN 1 ELSE 0 END) AS value_base,
        sum(CASE WHEN CAST(ts AS DATE) = anchor_day AND props IS NULL THEN 1 ELSE 0 END) * 100.0
          / sum(CASE WHEN CAST(ts AS DATE) = anchor_day THEN 1 ELSE 0 END) AS props_today,
        sum(CASE WHEN CAST(ts AS DATE) != anchor_day AND props IS NULL THEN 1 ELSE 0 END) * 100.0
          / sum(CASE WHEN CAST(ts AS DATE) != anchor_day THEN 1 ELSE 0 END) AS props_base
      FROM events, a
    ), long AS (
      SELECT 'value' AS col_name, value_today AS t, value_base AS b FROM w
      UNION ALL
      SELECT 'props', props_today, props_base FROM w
    )
    SELECT col_name,
           (floor((t) * 10000.0) / 10000.0) AS today_null_pct,
           (floor((b) * 10000.0) / 10000.0) AS baseline_null_pct,
           (floor((t - b) * 10000.0) / 10000.0) AS delta_pct,
           coalesce((floor((t - b) * 10000.0) / 10000.0) > 1.0, FALSE)
             AS is_degraded
    FROM long
    """,
)

register(
    "quality_duplicate_trend",
    lambda spark, sf: detectors.quality_duplicate_trend(
        *_t(spark, sf, "events")),
    """
    WITH day AS (
      SELECT CAST(ts AS DATE) AS d,
             count(*) AS n_rows,
             count(*) - count(DISTINCT (user_id, event_type, value)) AS n_dup,
             CAST(floor((count(*) - count(DISTINCT (user_id, event_type, value))) * 1000000.0 / count(*)) AS BIGINT) AS dup_e4
      FROM events
      WHERE CAST(ts AS DATE) >
            CAST((SELECT max(ts) FROM events) - INTERVAL 14 DAY AS DATE)
      GROUP BY 1
    ), win AS (
      SELECT d, n_rows, n_dup, dup_e4,
             CAST(sum(dup_e4) OVER w AS DOUBLE)
               / CAST(count(dup_e4) OVER w AS DOUBLE) AS base_e4
      FROM day
      WINDOW w AS (ORDER BY d ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
    )
    SELECT d, n_rows, n_dup,
           (dup_e4 / 10000.0) AS dup_pct,
           (floor(base_e4) / 10000.0) AS baseline_dup_pct,
           (floor(dup_e4 - base_e4) / 10000.0) AS increase_pct,
           coalesce((dup_e4 - base_e4) > 5000.0, FALSE) AS is_degraded
    FROM win
    """,
)

_ORDER_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority")
_NULL_SUMS = ",\n        ".join(
    f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS {c}_nulls"
    for c in _ORDER_COLS)
_NULL_UNION = "\n      UNION ALL\n      ".join(
    f"SELECT '{c}' AS col_name, {c}_nulls AS n_null, __n FROM w"
    for c in _ORDER_COLS)
register(
    "quality_null_profile",
    lambda spark, sf: quality.null_profile(
        catalog.load(spark, sf, "orders"), list(_ORDER_COLS)),
    f"""
    WITH w AS (
      SELECT count(*) AS __n,
        {_NULL_SUMS}
      FROM orders
    ), long AS (
      {_NULL_UNION}
    )
    SELECT col_name, n_null, __n AS n_rows,
           round(n_null * 100.0 / __n, 4) AS null_pct
    FROM long
    """,
)

register(
    "quality_completeness",
    lambda spark, sf: quality.completeness_check(
        *_t(spark, sf, "orders", "customer")),
    """
    SELECT count(*) AS n_rows,
           count(DISTINCT o_orderkey) AS n_distinct_keys,
           CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_fk,
           CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bad_status,
           CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonpositive
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
)

_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus",
                 "o_orderdate", "o_orderpriority")
_PROFILE_UNION = "\n      UNION ALL\n      ".join(
    f"SELECT '{c}' AS col_name, CAST(min({c}) AS VARCHAR) AS min_value, "
    f"CAST(max({c}) AS VARCHAR) AS max_value, "
    f"count(DISTINCT {c}) AS n_distinct FROM orders"
    for c in _PROFILE_COLS)
register(
    "quality_column_profile",
    lambda spark, sf: quality.column_profile(
        catalog.load(spark, sf, "orders"), list(_PROFILE_COLS)),
    f"""
    {_PROFILE_UNION}
    """,
)

register(
    "key_skew_profile",
    lambda spark, sf: quality.key_skew_profile(
        catalog.load(spark, sf, "lineitem"), "l_orderkey"),
    """
    WITH counts AS (
      SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY 1
    )
    SELECT count(*) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           max(cnt) AS max_key_rows,
           quantile_cont(cnt, 0.5) AS p50_key_rows,
           quantile_cont(cnt, 0.99) AS p99_key_rows,
           (floor(max(cnt) * 1000000.0 / sum(cnt)) / 1000000.0)
             AS top_key_share
    FROM counts
    """,
)


register(
    "event_anomaly_mad",
    lambda spark, sf: detectors.event_anomaly_mad(*_t(spark, sf, "events")),
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             sum(CAST(floor(value * 1e6) AS BIGINT)) AS tot_u
      FROM events GROUP BY 1
    ), med AS (
      SELECT quantile_cont(tot_u, 0.5) AS med_u FROM daily
    ), dev AS (
      SELECT d, tot_u, med_u, abs(tot_u - med_u) AS abs_dev_u
      FROM daily, med
    ), mad AS (
      SELECT quantile_cont(abs_dev_u, 0.5) AS mad_u FROM dev
    )
    SELECT d,
           (tot_u / 1e6) AS total_value,
           (med_u / 1e6) AS median_value,
           (mad_u / 1e6) AS mad_value,
           (abs_dev_u > 3.0 * 1.4826 * mad_u) AS is_outlier
    FROM dev, mad
    ORDER BY d
    """,
)


register(
    "value_outlier_iqr",
    lambda spark, sf: detectors.value_outlier_iqr(*_t(spark, sf, "events")),
    """
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    ), f AS (
      SELECT event_type, q1, q3,
             (q1 - 1.5 * (q3 - q1)) AS lo_fence,
             (q3 + 1.5 * (q3 - q1)) AS hi_fence
      FROM b
    )
    SELECT events.event_type,
           count(*) AS n_events,
           CAST(sum(CASE WHEN value < lo_fence OR value > hi_fence
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           max(q1) AS q1, max(q3) AS q3,
           max(lo_fence) AS lo_fence, max(hi_fence) AS hi_fence
    FROM events JOIN f ON events.event_type = f.event_type
    GROUP BY events.event_type
    ORDER BY events.event_type
    """,
)

register(
    "orders_backlog_aging",
    lambda spark, sf: detectors.orders_backlog_aging(
        *_t(spark, sf, "orders")),
    """
    WITH anc AS (
      SELECT max(CAST(o_orderdate AS DATE)) AS anchor FROM orders
    ), aged AS (
      SELECT CASE
               WHEN date_diff('day', CAST(o_orderdate AS DATE), anchor) <= 30
                 THEN '00-030d'
               WHEN date_diff('day', CAST(o_orderdate AS DATE), anchor) <= 90
                 THEN '031-090d'
               WHEN date_diff('day', CAST(o_orderdate AS DATE), anchor) <= 365
                 THEN '091-365d'
               ELSE '365d+' END AS age_bucket,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders, anc
      WHERE o_orderstatus != 'F'
    )
    SELECT age_bucket,
           count(*) AS n_orders,
           (sum(cents) / 100.0) AS backlog_value
    FROM aged
    GROUP BY age_bucket
    ORDER BY age_bucket
    """,
)


register(
    "quality_drift_tv",
    lambda spark, sf: quality.drift_tv(_t(spark, sf, "events")[0]),
    """
    WITH bounds AS (
      SELECT event_type, min(value) AS mn, max(value) AS mx,
             CAST(floor((min(epoch_us(ts)) + max(epoch_us(ts))) / 2)
                  AS BIGINT) AS mid_us
      FROM events GROUP BY 1
    ), binned AS (
      SELECT e.event_type,
             CASE WHEN b.mx = b.mn THEN 0
                  ELSE least(9, CAST(floor((e.value - b.mn) * 10
                                           / (b.mx - b.mn)) AS INT))
             END AS bin,
             (epoch_us(e.ts) < b.mid_us) AS is_first
      FROM events e JOIN bounds b USING (event_type)
    ), per_bin AS (
      SELECT event_type, bin,
             CAST(sum(CASE WHEN is_first THEN 1 ELSE 0 END) AS BIGINT)
               AS cnt,
             CAST(sum(CASE WHEN is_first THEN 0 ELSE 1 END) AS BIGINT)
               AS dnt
      FROM binned GROUP BY 1, 2
    ), totals AS (
      SELECT event_type, CAST(sum(cnt) AS BIGINT) AS p_total,
             CAST(sum(dnt) AS BIGINT) AS q_total
      FROM per_bin GROUP BY 1
    )
    SELECT p.event_type, t.p_total AS n_first, t.q_total AS n_second,
           CAST(floor(CAST(sum(abs(p.cnt * t.q_total - p.dnt * t.p_total))
                           AS DOUBLE) * 1e6
                      / (2.0 * t.p_total * t.q_total)) AS BIGINT) AS tv_e6,
           (CAST(floor(CAST(sum(abs(p.cnt * t.q_total - p.dnt * t.p_total))
                            AS DOUBLE) * 1e6
                       / (2.0 * t.p_total * t.q_total)) AS BIGINT)
            > 200000) AS drifted
    FROM per_bin p JOIN totals t USING (event_type)
    GROUP BY 1, t.p_total, t.q_total
    ORDER BY event_type
    """,
)


register(
    "benford_first_digit",
    lambda spark, sf: detectors.benford_first_digit(*_t(spark, sf, "orders")),
    """
    WITH d0 AS (
      SELECT CAST(substr(CAST(CAST(floor(abs(o_totalprice)) AS BIGINT)
                              AS VARCHAR),
                         1, 1) AS INTEGER) AS digit
      FROM orders
    ), c AS (
      SELECT digit, count(*) AS n
      FROM d0 WHERE digit BETWEEN 1 AND 9 GROUP BY 1
    ), t AS (
      SELECT CAST(sum(n) AS BIGINT) AS total FROM c
    ), s AS (
      SELECT digit, n,
             CAST(floor(n * 1e6 / total) AS BIGINT) AS share_e6,
             CAST(CASE digit
                  WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
                  WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
                  WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757
                  END AS BIGINT) AS benford_e6
      FROM c, t
    )
    SELECT digit, n, share_e6, benford_e6,
           abs(share_e6 - benford_e6) AS dev_e6,
           (abs(share_e6 - benford_e6) > 15000) AS is_deviant
    FROM s
    ORDER BY digit
    """,
)


register(
    "event_rate_cusum",
    lambda spark, sf: detectors.event_rate_cusum(*_t(spark, sf, "events")),
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1
    ), st AS (
      SELECT CAST(sum(x) AS BIGINT) AS s1,
             CAST(sum(x * x) AS BIGINT) AS s2,
             count(*) AS n
      FROM daily
    ), ref AS (
      SELECT CAST(floor(s1 / n + 0.5 * sqrt(greatest(
                    (s2 - s1 * (s1 / n)) / n, 0.0))) AS BIGINT)
               AS drift_floor,
             CAST(floor(5.0 * sqrt(greatest(
                    (s2 - s1 * (s1 / n)) / n, 0.0))) AS BIGINT)
               AS alarm_u
      FROM st
    ), c AS (
      SELECT d, x, alarm_u,
             CAST(sum(x - drift_floor)
                  OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum
      FROM daily, ref
    ), r AS (
      SELECT d, x, alarm_u, cum,
             least(CAST(min(cum)
                        OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                        AS BIGINT), 0) AS run_min
      FROM c
    )
    SELECT d, x AS total_value, cum - run_min AS cusum,
           alarm_u AS alarm_threshold,
           (cum - run_min > alarm_u) AS is_alarm
    FROM r ORDER BY d
    """,
)


register(
    "revenue_weekly_seasonality",
    lambda spark, sf: detectors.revenue_weekly_seasonality(
        *_t(spark, sf, "orders")),
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), per AS (
      -- DuckDB dayofweek is 0=Sunday..6; Spark's is 1=Sunday..7
      SELECT (dayofweek(d) + 1) AS dow,
             CAST(sum(cents) AS BIGINT) AS sum_dow,
             count(*) AS n_dow
      FROM daily GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(cents) AS BIGINT) AS total, count(*) AS n_days
      FROM daily
    )
    SELECT dow, n_dow,
           (sum_dow / 100.0) AS dow_revenue,
           CAST(floor(CAST(sum_dow AS DOUBLE) * CAST(n_days AS DOUBLE)
                      * 1e6 / (CAST(n_dow AS DOUBLE)
                               * CAST(total AS DOUBLE))) AS BIGINT)
             AS index_e6
    FROM per, tot
    ORDER BY dow
    """,
)



register(
    "revenue_anomaly_deseasonal",
    lambda spark, sf: detectors.revenue_anomaly_deseasonal(
        *_t(spark, sf, "orders")),
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1
    ), daily2 AS (
      SELECT d, rev_c,
             CAST((rev_c - (rev_c % 100)) / 100 AS BIGINT) AS rev_usd,
             (dayofweek(d) + 1) AS dow
      FROM daily
    ), per AS (
      SELECT dow, CAST(sum(rev_c) AS BIGINT) AS sum_dow,
             count(*) AS n_dow
      FROM daily2 GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(rev_c) AS BIGINT) AS total, count(*) AS n_days
      FROM daily2
    ), idx AS (
      SELECT dow,
             CAST(floor(CAST(sum_dow AS DOUBLE) * CAST(n_days AS DOUBLE)
                        * 1e6 / (CAST(n_dow AS DOUBLE)
                                 * CAST(total AS DOUBLE))) AS BIGINT)
               AS index_e6
      FROM per, tot
    ), adj AS (
      SELECT d, rev_c, index_e6,
             CAST(floor(rev_usd * 1000000.0 / greatest(index_e6, 1))
                  AS BIGINT) AS adj_u
      FROM daily2 JOIN idx USING (dow)
    ), adj2 AS (
      SELECT d, rev_c, index_e6, adj_u,
             CAST((adj_u - (adj_u % 100)) / 100 AS BIGINT) AS adj_h
      FROM adj
    ), win AS (
      SELECT d, rev_c, index_e6, adj_u,
             CAST(sum(adj_h)         OVER w AS DOUBLE) AS sum_u,
             CAST(sum(adj_h * adj_h) OVER w AS DOUBLE) AS sumsq_u,
             CAST(count(adj_h)       OVER w AS DOUBLE) AS n_hist
      FROM adj2
      WINDOW w AS (ORDER BY d ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
    )
    SELECT d,
           (rev_c / 100.0) AS revenue,
           index_e6,
           adj_u AS adj_revenue,
           (floor((sum_u / n_hist * 100.0) * 10000.0) / 10000.0) AS baseline_avg,
           (floor(sqrt(greatest((sumsq_u - sum_u * sum_u / n_hist)
                                / (n_hist - 1), 0.0)) * 100.0 * 10000.0)
            / 10000.0) AS baseline_std,
           (floor((CASE WHEN sqrt(greatest((sumsq_u - sum_u * sum_u / n_hist)
                                           / (n_hist - 1), 0.0)) * 100.0 > 0
                        THEN (CAST(adj_u AS DOUBLE)
                              - (sum_u / n_hist * 100.0))
                             / (sqrt(greatest((sumsq_u - sum_u * sum_u
                                               / n_hist)
                                              / (n_hist - 1), 0.0)) * 100.0)
                        ELSE 0.0 END) * 10000.0) / 10000.0) AS z_score,
           (abs(CASE WHEN sqrt(greatest((sumsq_u - sum_u * sum_u / n_hist)
                                        / (n_hist - 1), 0.0)) * 100.0 > 0
                     THEN (CAST(adj_u AS DOUBLE) - (sum_u / n_hist * 100.0))
                          / (sqrt(greatest((sumsq_u - sum_u * sum_u
                                            / n_hist)
                                           / (n_hist - 1), 0.0)) * 100.0)
                     ELSE 0.0 END) > 2.5) AS is_anomaly
    FROM win
    WHERE n_hist >= 7
    ORDER BY d
    """,
)


register(
    "feed_interarrival_stats",
    lambda spark, sf: detectors.feed_interarrival_stats(
        *_t(spark, sf, "events")),
    """
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY event_type ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT event_type AS feed_id,
           count(*) AS n_gaps,
           round(quantile_cont(gap_us, 0.5) / 1000000.0, 6) AS p50_gap_s,
           round(quantile_cont(gap_us, 0.95) / 1000000.0, 6) AS p95_gap_s,
           round(max(gap_us) / 1000000.0, 6) AS max_gap_s
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY 1 ORDER BY feed_id
    """,
)


register(
    "revenue_volume_correlation",
    lambda spark, sf: detectors.revenue_volume_correlation(
        *_t(spark, sf, "orders")),
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c,
             count(*) AS y
      FROM orders GROUP BY 1
    ), daily2 AS (
      SELECT d, rev_c, y,
             CAST((rev_c - (rev_c % 10000)) / 10000 AS BIGINT) AS x
      FROM daily
    ), win AS (
      SELECT d, rev_c, y,
             CAST(count(*)     OVER w AS BIGINT) AS n,
             CAST(sum(x)       OVER w AS BIGINT) AS sx,
             CAST(sum(y)       OVER w AS BIGINT) AS sy,
             CAST(sum(x * x)   OVER w AS BIGINT) AS sxx,
             CAST(sum(y * y)   OVER w AS BIGINT) AS syy,
             CAST(sum(x * y)   OVER w AS BIGINT) AS sxy
      FROM daily2
      WINDOW w AS (ORDER BY d ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    ), r AS (
      SELECT d, rev_c, y, n,
             CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                   AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                  THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                 - CAST(sy AS DOUBLE)
                                   * CAST(sy AS DOUBLE)))
                  ELSE 0.0 END AS r_raw
      FROM win
    )
    SELECT d, (rev_c / 100.0) AS revenue, y AS n_txn,
           (floor(r_raw * 1000000.0) / 1000000.0) AS corr_30d,
           ((floor(r_raw * 1000000.0) / 1000000.0) < 0.3)
             AS is_decoupled
    FROM r WHERE n >= 10 ORDER BY d
    """,
)


register(
    "user_burstiness",
    lambda spark, sf: detectors.user_burstiness(
        *_t(spark, sf, "events")),
    """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      FROM events
    ), gs AS (
      SELECT user_id, CAST(floor(gap_us / 1000000.0) AS BIGINT) AS gap_s
      FROM g WHERE gap_us IS NOT NULL
    ), per AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(gap_s) AS BIGINT) AS s1,
             CAST(sum(gap_s * gap_s) AS BIGINT) AS s2
      FROM gs GROUP BY 1
    ), cv AS (
      SELECT user_id, n_gaps, s1,
             CASE WHEN s1 > 0
                  THEN CAST(floor(sqrt(greatest(
                         CAST(n_gaps * s2 - s1 * s1 AS DOUBLE), 0.0))
                       * 1000000.0 / s1) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS cv_e6
      FROM per WHERE n_gaps >= 2
    )
    SELECT user_id, CAST(n_gaps + 1 AS BIGINT) AS n_events, n_gaps,
           CAST(floor(s1 / n_gaps) AS BIGINT) AS mean_gap_s,
           cv_e6, (cv_e6 > 1000000) AS is_bursty
    FROM cv ORDER BY user_id
    """,
)


register(
    "revenue_changepoint",
    lambda spark, sf: detectors.revenue_changepoint(
        _t(spark, sf, "orders")[0]),
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ), xs AS (
      SELECT d, CAST((rev_c - (rev_c % 10000)) / 10000 AS BIGINT) AS x
      FROM daily
    ), pref AS (
      SELECT d,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
             CAST(sum(x) OVER (ORDER BY d
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum
      FROM xs
    ), totals AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS tot
      FROM xs
    ), scored AS (
      SELECT p.d AS changepoint_day, t.n AS n_days,
             CAST(floor(abs(CAST(p.cum AS DOUBLE) / CAST(p.i AS DOUBLE)
                            - CAST(t.tot - p.cum AS DOUBLE)
                              / CAST(t.n - p.i AS DOUBLE))
                        * sqrt(CAST(p.i AS DOUBLE)
                               * CAST(t.n - p.i AS DOUBLE)
                               / CAST(t.n AS DOUBLE))
                        * 1000000.0) AS BIGINT) AS score_e6,
             CAST(floor(p.cum * 10000.0 / p.i) AS BIGINT)
               AS mean_before_c,
             CAST(floor((t.tot - p.cum) * 10000.0 / (t.n - p.i))
                  AS BIGINT) AS mean_after_c
      FROM pref p CROSS JOIN totals t
      WHERE p.i >= 7 AND p.i <= t.n - 7
    )
    SELECT * FROM scored ORDER BY score_e6 DESC, changepoint_day
    LIMIT 1
    """,
)


register(
    "quality_drift_ks",
    lambda spark, sf: quality.drift_ks(_t(spark, sf, "events")[0]),
    """
    WITH mids AS (
      SELECT event_type,
             CAST(floor((min(epoch_us(ts)) + max(epoch_us(ts))) / 2)
                  AS BIGINT) AS mid_us
      FROM events GROUP BY 1
    ), per_cent AS (
      SELECT e.event_type,
             CAST(round(e.value * 100) AS BIGINT) AS v_c,
             CAST(sum(CASE WHEN epoch_us(e.ts) < m.mid_us
                           THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN epoch_us(e.ts) < m.mid_us
                           THEN 0 ELSE 1 END) AS BIGINT) AS c2
      FROM events e JOIN mids m USING (event_type)
      GROUP BY 1, 2
    ), cum AS (
      SELECT event_type,
             CAST(sum(c1) OVER (PARTITION BY event_type ORDER BY v_c
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum1,
             CAST(sum(c2) OVER (PARTITION BY event_type ORDER BY v_c
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum2
      FROM per_cent
    ), totals AS (
      SELECT event_type, CAST(sum(c1) AS BIGINT) AS n_first,
             CAST(sum(c2) AS BIGINT) AS n_second
      FROM per_cent GROUP BY 1
    ), ks AS (
      SELECT c.event_type, t.n_first, t.n_second,
             CAST(max(abs(c.cum1 * t.n_second - c.cum2 * t.n_first))
                  AS BIGINT) AS num
      FROM cum c JOIN totals t USING (event_type)
      GROUP BY 1, 2, 3
    )
    SELECT event_type, n_first, n_second,
           CAST(floor(num * 1000000.0 / (n_first * n_second)) AS BIGINT)
             AS ks_e6,
           (CAST(floor(num * 1000000.0 / (n_first * n_second)) AS BIGINT)
            > 100000) AS drifted
    FROM ks ORDER BY event_type
    """,
)


from selfhealingdatapipeline_gcp_spark.streaming import monitors as _monitors  # noqa: E402


register(
    "streaming_expectations_guard",
    _monitors.streaming_expectations_guard,
    # chop-invariant by associativity (sums + distinct-of-union):
    # shares the batch oracle
    """
    WITH wide AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderkey IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS r1,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS r2,
             CAST(sum(CASE WHEN o_totalprice > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS r3,
             CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                           THEN 1 ELSE 0 END) AS BIGINT) AS r4,
             CAST(sum(CASE WHEN o_orderdate
                           BETWEEN DATE '1992-01-01'
                               AND DATE '2026-12-31'
                           THEN 1 ELSE 0 END) AS BIGINT) AS r5
      FROM orders
    ), long AS (
      SELECT 'r1' AS rule_id, 'o_orderkey_not_null' AS rule,
             CAST(1000000 AS BIGINT) AS threshold_e6, r1 AS hits, n
      FROM wide
      UNION ALL
      SELECT 'r2', 'o_orderkey_unique', 1000000, r2, n FROM wide
      UNION ALL
      SELECT 'r3', 'o_totalprice_positive', 999000, r3, n FROM wide
      UNION ALL
      SELECT 'r4', 'o_orderstatus_in_domain', 1000000, r4, n FROM wide
      UNION ALL
      SELECT 'r5', 'o_orderdate_in_window', 1000000, r5, n FROM wide
    )
    SELECT rule_id, rule, n AS n_rows,
           CAST(floor(hits * 1000000.0 / greatest(1, n)) AS BIGINT)
             AS observed_e6,
           threshold_e6,
           (CAST(floor(hits * 1000000.0 / greatest(1, n)) AS BIGINT)
            >= threshold_e6) AS passed
    FROM long ORDER BY rule_id
    """,
)


register(
    "quality_expectations",
    lambda spark, sf: quality.expectations_orders(
        _t(spark, sf, "orders")[0]),
    """
    WITH wide AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderkey IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS r1,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS r2,
             CAST(sum(CASE WHEN o_totalprice > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS r3,
             CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                           THEN 1 ELSE 0 END) AS BIGINT) AS r4,
             CAST(sum(CASE WHEN o_orderdate
                           BETWEEN DATE '1992-01-01'
                               AND DATE '2026-12-31'
                           THEN 1 ELSE 0 END) AS BIGINT) AS r5
      FROM orders
    ), long AS (
      SELECT 'r1' AS rule_id, 'o_orderkey_not_null' AS rule,
             CAST(1000000 AS BIGINT) AS threshold_e6, r1 AS hits, n
      FROM wide
      UNION ALL
      SELECT 'r2', 'o_orderkey_unique', 1000000, r2, n FROM wide
      UNION ALL
      SELECT 'r3', 'o_totalprice_positive', 999000, r3, n FROM wide
      UNION ALL
      SELECT 'r4', 'o_orderstatus_in_domain', 1000000, r4, n FROM wide
      UNION ALL
      SELECT 'r5', 'o_orderdate_in_window', 1000000, r5, n FROM wide
    )
    SELECT rule_id, rule, n AS n_rows,
           CAST(floor(hits * 1000000.0 / greatest(1, n)) AS BIGINT)
             AS observed_e6,
           threshold_e6,
           (CAST(floor(hits * 1000000.0 / greatest(1, n)) AS BIGINT)
            >= threshold_e6) AS passed
    FROM long ORDER BY rule_id
    """,
)


_QUANTILE_AUDIT_SQL = """
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c
      FROM events
    ), bounds AS (
      SELECT event_type, CAST(min(v_c) AS BIGINT) AS mn,
             CAST(max(v_c) AS BIGINT) AS mx,
             CAST(count(*) AS BIGINT) AS n
      FROM c GROUP BY 1
    ), exact AS (
      SELECT event_type,
             CAST(floor(quantile_cont(v_c, 0.50)) AS BIGINT) AS e50,
             CAST(floor(quantile_cont(v_c, 0.90)) AS BIGINT) AS e90,
             CAST(floor(quantile_cont(v_c, 0.99)) AS BIGINT) AS e99
      FROM c GROUP BY 1
    ), hist AS (
      SELECT c.event_type,
             CASE WHEN b.mx = b.mn THEN 0
                  ELSE CAST(least(1023,
                       CAST(floor(((c.v_c - b.mn) * 1024)
                                  / (b.mx - b.mn)) AS BIGINT)) AS INT)
             END AS bkt,
             CAST(count(*) AS BIGINT) AS cnt
      FROM c JOIN bounds b USING (event_type)
      GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, bkt,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bkt
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM hist
    ), est AS (
      SELECT m.event_type, t.q, m.n, m.mn, m.mx,
             CAST(min(m.bkt) AS BIGINT) AS b_hit
      FROM (SELECT cu.*, b.mn, b.mx, b.n
            FROM cum cu JOIN bounds b USING (event_type)) m
      CROSS JOIN (SELECT unnest([50, 90, 99]) AS q) t
      WHERE m.cum * 100 >= t.q * m.n
      GROUP BY 1, 2, 3, 4, 5
    ), scored AS (
      SELECT event_type, q, n,
             CASE WHEN mx = mn THEN mn
                  ELSE mn + CAST(floor(((2 * b_hit + 1) * (mx - mn))
                                       / 2048) AS BIGINT)
             END AS est_c
      FROM est
    ), long_exact AS (
      SELECT event_type, 50 AS q, e50 AS exact_c FROM exact
      UNION ALL
      SELECT event_type, 90, e90 FROM exact
      UNION ALL
      SELECT event_type, 99, e99 FROM exact
    )
    SELECT s.event_type, CAST(s.q AS INT) AS q, s.n,
           x.exact_c, CAST(s.est_c AS BIGINT) AS est_c,
           CAST(abs(CAST(s.est_c AS BIGINT) - x.exact_c) AS BIGINT)
             AS abs_err_c
    FROM scored s JOIN long_exact x USING (event_type, q)
    ORDER BY s.event_type, s.q
    """

register(
    "quantile_sketch_audit",
    lambda spark, sf: quality.quantile_sketch_audit(
        _t(spark, sf, "events")[0]),
    _QUANTILE_AUDIT_SQL,
)

register(
    "streaming_quantile_guard",
    _monitors.streaming_quantile_guard,
    # chop-invariant by associativity (value-count partials sum into
    # the factored core's input relation): shares the batch oracle
    _QUANTILE_AUDIT_SQL,
)


from selfhealingdatapipeline_gcp_spark.registry_data_ops import _md5int as _m  # noqa: E402

# the Spark side's salted two-phase min-k provably equals the
# single-window form, so the oracle uses the latter
_KMV_AUDIT_SQL = f"""
    WITH d AS (
      SELECT DISTINCT event_type,
             ({_m("CAST(user_id AS VARCHAR)")}) AS h
      FROM events
    ), exact AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS exact_distinct
      FROM d GROUP BY 1
    ), kth AS (
      SELECT event_type, h AS h_k FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h)
                 AS r2
        FROM d
      ) WHERE r2 = 64
    ), est AS (
      SELECT e.event_type, e.exact_distinct,
             CASE WHEN k.h_k IS NULL THEN e.exact_distinct
                  ELSE CAST(17732923532771328 // greatest(k.h_k, 1)
                            AS BIGINT)
             END AS kmv_estimate
      FROM exact e LEFT JOIN kth k USING (event_type)
    )
    SELECT event_type, exact_distinct, kmv_estimate,
           CAST(abs(kmv_estimate - exact_distinct) AS BIGINT) AS abs_err,
           CAST(floor(abs(kmv_estimate - exact_distinct) * 1000000.0
                      / greatest(1, exact_distinct)) AS BIGINT)
             AS err_e6
    FROM est ORDER BY event_type
    """

register(
    "distinct_kmv_audit",
    lambda spark, sf: quality.distinct_kmv_audit(
        _t(spark, sf, "events")[0]),
    _KMV_AUDIT_SQL,
)

register(
    "streaming_kmv_guard",
    _monitors.streaming_kmv_guard,
    # chop-invariant by associativity (distinct of a union of
    # per-epoch distinct sets): shares the batch oracle
    _KMV_AUDIT_SQL,
)


register(
    "join_skew_advisor",
    lambda spark, sf: quality.join_skew_advisor(
        *_t(spark, sf, "events", "orders")),
    """
    WITH a AS (
      SELECT user_id AS key, CAST(count(*) AS BIGINT) AS na
      FROM events GROUP BY 1
    ), b AS (
      SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS nb
      FROM orders GROUP BY 1
    ), pk AS (
      SELECT key, na, nb, CAST(na * nb AS BIGINT) AS out_rows
      FROM a JOIN b USING (key)
    ), t AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(out_rows) AS BIGINT) AS total_out
      FROM pk
    ), top AS (
      SELECT pk.*, t.n_keys, t.total_out,
             CAST(row_number() OVER (ORDER BY out_rows DESC, key)
                  AS INT) AS rank
      FROM pk, t ORDER BY out_rows DESC, key LIMIT 10
    )
    SELECT rank, key, na, nb, out_rows,
           CAST(floor(out_rows * 1000000.0 / total_out) AS BIGINT)
             AS out_share_e6,
           CAST((out_rows + (total_out // n_keys) - 1)
                // (total_out // n_keys) AS BIGINT) AS salt_factor
    FROM top ORDER BY rank
    """,
)


def _backtest_sql() -> str:
    """Twin of detectors.forecast_backtest_report: same EWMA_W_E6
    integer literals, same pmod floor-division idiom (DuckDB % is
    sign-of-dividend, so the pmod is spelled ((x % n) + n) % n where
    the numerator can be negative)."""
    w = detectors.EWMA_W_E6
    ewma_num = " + ".join(
        f"lag(rev_c, {j}) OVER (ORDER BY d) * {we}"
        for j, we in enumerate(w, start=1))
    wsum = sum(w)
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1
    ), win AS (
      SELECT d, rev_c,
             count(rev_c) OVER w28 AS n28,
             lag(rev_c, 1) OVER (ORDER BY d) AS fc_naive,
             lag(rev_c, 7) OVER (ORDER BY d) AS fc_seasonal7,
             sum(rev_c) OVER w28 AS s28,
             {ewma_num} AS enum
      FROM daily
      WINDOW w28 AS (ORDER BY d ROWS BETWEEN 28 PRECEDING
                     AND 1 PRECEDING)
    ), fc AS (
      SELECT d, rev_c,
             CAST(fc_naive AS BIGINT) AS fc_naive,
             CAST(fc_seasonal7 AS BIGINT) AS fc_seasonal7,
             CAST((s28 - (s28 % 28)) / 28 AS BIGINT) AS fc_trail28,
             CAST((enum - (enum % {wsum})) / {wsum} AS BIGINT)
               AS fc_ewma
      FROM win WHERE n28 = 28
    ), long AS (
      SELECT rev_c, 'naive_1' AS method, fc_naive AS fc FROM fc
      UNION ALL
      SELECT rev_c, 'seasonal_7', fc_seasonal7 FROM fc
      UNION ALL
      SELECT rev_c, 'trailing_mean_28', fc_trail28 FROM fc
      UNION ALL
      SELECT rev_c, 'ewma_14', fc_ewma FROM fc
    ), err AS (
      SELECT method, fc - rev_c AS err_c, abs(fc - rev_c) AS abs_c,
             CASE WHEN rev_c > 0 THEN CAST(
               ((abs(fc - rev_c) * 1000000)
                - ((abs(fc - rev_c) * 1000000) % rev_c)) / rev_c
               AS BIGINT) END AS ape_e6
      FROM long
    )
    SELECT method,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST((sum(abs_c) - (sum(abs_c) % count(*))) / count(*)
                AS BIGINT) AS mae_cents,
           CAST((sum(err_c)
                 - (((sum(err_c) % count(*)) + count(*)) % count(*)))
                / count(*) AS BIGINT) AS bias_cents,
           CAST((sum(ape_e6) - (sum(ape_e6) % count(ape_e6)))
                / count(ape_e6) AS BIGINT) AS mape_e6
    FROM err GROUP BY method ORDER BY method
    """


register(
    "forecast_backtest_report",
    lambda spark, sf: detectors.forecast_backtest_report(
        *_t(spark, sf, "orders")),
    _backtest_sql(),
)


_KA_THRESHOLDS = (2, 5, 10, 25)
_KA_STACK = "\n      UNION ALL\n      ".join(
    f"SELECT {k} AS k, g{k} AS n_groups_below_k, r{k} AS n_rows_below_k, "
    "n_groups, n_rows FROM w" for k in _KA_THRESHOLDS)
_KA_AGGS = ",\n        ".join(
    f"CAST(count(*) FILTER (n < {k}) AS BIGINT) AS g{k}, "
    f"CAST(coalesce(sum(n) FILTER (n < {k}), 0) AS BIGINT) AS r{k}"
    for k in _KA_THRESHOLDS)
register(
    "k_anonymity_audit",
    # QI-class sizes in one aggregate, every threshold in the same
    # pass over the bounded class-size relation (operators/quality.py
    # k_anonymity_audit)
    lambda spark, sf: quality.k_anonymity_audit(
        *_t(spark, sf, "customer")),
    f"""
    WITH sizes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS kb,
             CAST(count(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2, 3
    ), w AS (
      SELECT CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n) AS BIGINT) AS n_rows,
        {_KA_AGGS}
      FROM sizes
    ), long AS (
      {_KA_STACK}
    )
    SELECT CAST(k AS INT) AS k, n_groups, n_rows,
           n_groups_below_k, n_rows_below_k,
           CAST(floor(n_rows_below_k * 1000000.0 / n_rows) AS BIGINT)
             AS at_risk_rate_e6
    FROM long ORDER BY k
    """,
)


#: the declared FK graph of the driver schema — child table, fk col,
#: parent table, pk col (TPC-H edges + events→customer)
FK_EDGES = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"),
)


def _fk_audit_spark(spark, sf):
    edges = []
    for child, fk, parent, pk in FK_EDGES:
        c, p = _t(spark, sf, child, parent)
        edges.append((c, child, fk, p, parent, pk))
    return quality.fk_orphan_audit(edges)


_FK_UNION = "\n      UNION ALL\n      ".join(
    f"""SELECT '{child}' AS child_table, '{fk}' AS fk_col,
             '{parent}' AS parent_table,
             CAST(count(*) AS BIGINT) AS n_child_rows,
             CAST(sum(CASE WHEN p.__pk IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orphans
      FROM {child} c LEFT JOIN
        (SELECT DISTINCT {pk} AS __pk FROM {parent}) p
        ON c.{fk} = p.__pk"""
    for child, fk, parent, pk in FK_EDGES)
register(
    "fk_orphan_audit",
    # whole-schema referential-integrity report: one row per FK edge
    # (operators/quality.py fk_orphan_audit)
    _fk_audit_spark,
    f"""
    WITH legs AS (
      {_FK_UNION}
    )
    SELECT child_table, fk_col, parent_table, n_child_rows, n_orphans,
           CAST(floor(n_orphans * 1000000.0
                      / greatest(1, n_child_rows)) AS BIGINT)
             AS orphan_rate_e6
    FROM legs ORDER BY child_table, fk_col
    """,
)


#: DuckDB twin of detectors.series_sax_symbols — shared by the
#: symbol registration and the motif-novelty composition
_SAX_SQL = """
    WITH daily0 AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1
    ), daily1 AS (
      SELECT d, CAST((rev_c - (rev_c % 100)) / 100 AS BIGINT) AS rev_usd
      FROM daily0
    ), daily AS (
      SELECT d, CAST((rev_usd - (rev_usd % 100)) / 100 AS BIGINT) AS rev_h
      FROM daily1
    ), idx AS (
      SELECT d, rev_h,
             CAST(floor((row_number() OVER (ORDER BY d) - 1) / 7.0)
                  AS BIGINT) AS win_idx
      FROM daily
    ), per_win AS (
      SELECT win_idx, min(d) AS start_day,
             CAST(count(*) AS BIGINT) AS n_obs,
             CAST(sum(rev_h) AS BIGINT) AS p_h
      FROM idx GROUP BY 1
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rev_h) AS BIGINT) AS s_h,
             CAST(sum(rev_h * rev_h) AS BIGINT) AS q_h
      FROM daily
    ), z AS (
      SELECT win_idx, start_day, n_obs, p_h,
             CASE WHEN sqrt(greatest(
                    (CAST(q_h AS DOUBLE)
                     - CAST(s_h AS DOUBLE) * CAST(s_h AS DOUBLE)
                       / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE),
                    0.0)) > 0
                  THEN (CAST(p_h AS DOUBLE) / CAST(n_obs AS DOUBLE)
                        - CAST(s_h AS DOUBLE) / CAST(n AS DOUBLE))
                       / sqrt(greatest(
                           (CAST(q_h AS DOUBLE)
                            - CAST(s_h AS DOUBLE) * CAST(s_h AS DOUBLE)
                              / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE),
                           0.0))
                  ELSE 0.0 END AS zval
      FROM per_win, stats
    )
    SELECT win_idx, start_day, n_obs,
           CAST((p_h - (p_h % n_obs)) / n_obs AS BIGINT) AS paa_h,
           CAST(floor(zval * 1000000) AS BIGINT) AS z_e6,
           CASE WHEN floor(zval * 1000000) < -674500 THEN 'a'
                WHEN floor(zval * 1000000) < 0 THEN 'b'
                WHEN floor(zval * 1000000) < 674500 THEN 'c'
                ELSE 'd' END AS symbol
    FROM z ORDER BY win_idx
"""

register(
    "series_sax_symbols",
    # SAX symbolization of daily revenue (operators/detectors.py
    # series_sax_symbols): PAA over 7-observation windows, whole-series
    # z-normalization, 4-letter alphabet at +-0.6745/0 — expression-
    # mirrored doubles, symbols bucketed on the FLOORED e6 z
    lambda spark, sf: detectors.series_sax_symbols(
        *_t(spark, sf, "orders")),
    _SAX_SQL,
)


register(
    "sax_motif_novelty",
    # SAX-discord at word grain: trailing 4-symbol motifs, series-wide
    # occurrence counts, novelty = count 1 (operators/detectors.py
    # sax_motif_novelty). || propagates NULL in DuckDB exactly like
    # F.concat on the Spark side — head windows drop identically.
    lambda spark, sf: detectors.sax_motif_novelty(
        *_t(spark, sf, "orders")),
    """
    WITH sax AS ({_SAX_INNER}),
    m AS (
      SELECT win_idx, start_day,
             lag(symbol, 3) OVER w || lag(symbol, 2) OVER w
               || lag(symbol, 1) OVER w || symbol AS motif
      FROM sax
      WINDOW w AS (ORDER BY win_idx)
    ), f AS (
      SELECT * FROM m WHERE motif IS NOT NULL
    )
    SELECT win_idx, start_day, motif,
           CAST(count(*) OVER (PARTITION BY motif) AS BIGINT)
             AS n_occurrences,
           (count(*) OVER (PARTITION BY motif) = 1) AS is_novel
    FROM f ORDER BY win_idx
    """.replace("{_SAX_INNER}", _SAX_SQL),
)


def _catalog_stats_sql() -> str:
    """Twin of quality.catalog_stats_report: one single-pass wide
    aggregate CTE per table, stacked to long by per-column SELECTs."""
    derived_sql = {
        "c_acctbal_cents": "CAST(round(c_acctbal * 100) AS BIGINT)",
        "o_totalprice_cents": "CAST(round(o_totalprice * 100) AS BIGINT)",
        "value_e6": "CAST(round(value * 1000000) AS BIGINT)",
    }
    ctes, legs = [], []
    for tname, cols in quality.CATALOG_STATS_COLS.items():
        proj = ["*"] + [f"{expr} AS {name}"
                        for name, expr in derived_sql.items()
                        if name in cols]
        aggs = ["CAST(count(*) AS BIGINT) AS __n"]
        for c in cols:
            aggs += [
                f"CAST(min({c}) AS VARCHAR) AS {c}__min",
                f"CAST(max({c}) AS VARCHAR) AS {c}__max",
                f"CAST(count(DISTINCT {c}) AS BIGINT) AS {c}__nd",
                f"CAST(coalesce(sum(CASE WHEN {c} IS NULL THEN 1 "
                f"ELSE 0 END), 0) AS BIGINT) AS {c}__nulls",
            ]
        ctes.append(
            f"w_{tname} AS (SELECT {', '.join(aggs)} FROM "
            f"(SELECT {', '.join(proj)} FROM {tname}))")
        for c in cols:
            legs.append(
                f"SELECT '{tname}' AS table_name, '{c}' AS col_name, "
                f"__n AS n_rows, {c}__nulls AS n_nulls, "
                f"{c}__nd AS n_distinct, {c}__min AS min_value, "
                f"{c}__max AS max_value FROM w_{tname}")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(legs)
            + "\nORDER BY table_name, col_name")


register(
    "catalog_stats_report",
    # ANALYZE-style whole-catalog column statistics
    # (operators/quality.py catalog_stats_report)
    lambda spark, sf: quality.catalog_stats_report(
        catalog.load_all(spark, sf)),
    _catalog_stats_sql(),
)


def _incident_rollup_sql() -> str:
    """Compose the parents' REGISTERED oracle SQL verbatim — the
    rollup's oracle cannot drift from the detectors it unions."""
    from selfhealingdatapipeline_gcp_spark.registry import _REGISTRY
    o = {n: _REGISTRY[n].oracle for n in
         ("revenue_anomaly", "revenue_anomaly_deseasonal",
          "event_rate_cusum", "event_anomaly_mad")}
    return f"""
    SELECT d, 'revenue_z' AS detector,
           CAST(revenue AS DOUBLE) AS observed,
           CAST(z_score AS DOUBLE) AS score
    FROM ({o['revenue_anomaly']}) WHERE is_anomaly
    UNION ALL
    SELECT d, 'revenue_z_deseasonal',
           CAST(adj_revenue AS DOUBLE), CAST(z_score AS DOUBLE)
    FROM ({o['revenue_anomaly_deseasonal']}) WHERE is_anomaly
    UNION ALL
    SELECT d, 'event_value_cusum',
           CAST(total_value AS DOUBLE), CAST(cusum AS DOUBLE)
    FROM ({o['event_rate_cusum']}) WHERE is_alarm
    UNION ALL
    SELECT d, 'event_value_mad',
           CAST(total_value AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM ({o['event_anomaly_mad']}) WHERE is_outlier
    ORDER BY d, detector
    """


register(
    "detector_incident_rollup",
    # the detectors' flagged rows as one incident stream
    # (operators/detectors.py detector_incident_rollup)
    lambda spark, sf: detectors.detector_incident_rollup(
        *_t(spark, sf, "orders", "events")),
    _incident_rollup_sql(),
)


_LD_THRESHOLDS = (2, 3, 5, 10)
_LD_STACK = "\n      UNION ALL\n      ".join(
    f"SELECT {t} AS l, g{t} AS n_groups_below_l, r{t} AS n_rows_below_l, "
    "n_groups, n_rows FROM w" for t in _LD_THRESHOLDS)
_LD_AGGS = ",\n        ".join(
    f"CAST(count(*) FILTER (l_div < {t}) AS BIGINT) AS g{t}, "
    f"CAST(coalesce(sum(n) FILTER (l_div < {t}), 0) AS BIGINT) AS r{t}"
    for t in _LD_THRESHOLDS)
register(
    "l_diversity_audit",
    # per-QI-class exact distinct-sensitive counts in one aggregate,
    # every threshold in the same pass (operators/quality.py
    # l_diversity_audit — the k_anonymity_audit discipline)
    lambda spark, sf: quality.l_diversity_audit(
        *_t(spark, sf, "customer")),
    f"""
    WITH sizes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT CAST(floor(c_acctbal / 1000)
                                      AS BIGINT)) AS BIGINT) AS l_div
      FROM customer GROUP BY 1, 2
    ), w AS (
      SELECT CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n) AS BIGINT) AS n_rows,
        {_LD_AGGS}
      FROM sizes
    ), long AS (
      {_LD_STACK}
    )
    SELECT CAST(l AS INT) AS l, n_groups, n_rows,
           n_groups_below_l, n_rows_below_l,
           CAST(floor(n_rows_below_l * 1000000.0 / n_rows) AS BIGINT)
             AS at_risk_rate_e6
    FROM long ORDER BY l
    """,
)
