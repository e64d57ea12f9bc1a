"""Registry entries for the extended analytics surface: more TPC-H
shapes, pivot/rollup/window analytics, feature engineering, and the
as-of join (SURVEY.md §2 additions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from selfhealingdatapipeline_gcp_spark import catalog
from selfhealingdatapipeline_gcp_spark.operators import analytics, asof
from selfhealingdatapipeline_gcp_spark.registry import register


def _t(spark, sf, *names):
    return [catalog.load(spark, sf, n) for n in names]


register(
    "q6_forecast_revenue",
    lambda spark, sf: analytics.q6_forecast_revenue(*_t(spark, sf, "lineitem")),
    """
    SELECT (sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0) AS revenue_effect
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)

register(
    "q14_promo_revenue",
    lambda spark, sf: analytics.q14_promo_revenue(
        *_t(spark, sf, "lineitem", "part")),
    """
    WITH agg AS (
      SELECT
        (sum(CASE WHEN p_type = 'PROMO'
             THEN CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) ELSE 0 END) / 10000.0)
          AS promo_revenue,
        (sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0) AS total_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    )
    SELECT promo_revenue, total_revenue,
           (floor((promo_revenue * 100.0 / total_revenue) * 10000.0) / 10000.0) AS promo_pct
    FROM agg
    """,
)

register(
    "q18_large_orders",
    lambda spark, sf: analytics.q18_large_orders(
        *_t(spark, sf, "customer", "orders", "lineitem")),
    """
    WITH big AS (
      SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING round(sum(l_quantity), 2) > 150.0
    )
    SELECT c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           total_qty
    FROM big
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
)

_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")
_PIVOT_SQL = ",\n           ".join(
    f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS n_{t}"
    for t in _PIVOT_TYPES)
register(
    "pivot_event_daily",
    lambda spark, sf: analytics.pivot_event_daily(*_t(spark, sf, "events")),
    f"""
    SELECT CAST(ts AS DATE) AS d,
           {_PIVOT_SQL}
    FROM events
    GROUP BY 1
    """,
)

register(
    "rollup_revenue_region_nation",
    lambda spark, sf: analytics.rollup_revenue_region_nation(
        *_t(spark, sf, "orders", "customer", "nation", "region")),
    """
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(n_name, 'ALL') AS nation,
           (sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0) AS revenue,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)

register(
    "revenue_moving_avg",
    lambda spark, sf: analytics.revenue_moving_avg(*_t(spark, sf, "orders")),
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             (sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0) AS revenue
      FROM orders GROUP BY 1
    ), win AS (
      SELECT d, revenue,
             avg(revenue) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING
                                AND CURRENT ROW) AS ma7_raw,
             lag(revenue, 7) OVER (ORDER BY d) AS prev
      FROM daily
    )
    SELECT d, revenue,
           (floor(ma7_raw * 10000.0) / 10000.0) AS ma7,
           (floor((CASE WHEN prev > 0
                   THEN (revenue - prev) * 100.0 / prev ELSE 0.0 END)
                  * 10000.0) / 10000.0) AS wow_pct
    FROM win
    """,
)

register(
    "user_activity_summary",
    lambda spark, sf: analytics.user_activity_summary(*_t(spark, sf, "events")),
    """
    SELECT user_id,
           count(*) AS n_events,
           count(DISTINCT event_type) AS n_types,
           (sum(CAST(round(value * 100) AS BIGINT)) / 100.0) AS total_value,
           min(ts) AS first_seen,
           max(ts) AS last_seen,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS n_purchases,
           round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0, 6)
             AS lifespan_s
    FROM events
    GROUP BY user_id
    """,
)


def _asof_purchase_attribution(spark, sf):
    events = catalog.load(spark, sf, "events")
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    clicks = (events.filter(F.col("event_type") == "click")
              .select("user_id", F.col("ts").alias("c_ts"),
                      F.col("event_id").alias("c_id")))
    joined = asof.asof_join(purchases, clicks, on="user_id",
                            left_ts="ts", right_ts="c_ts",
                            right_cols=("c_ts", "c_id"))
    # round at 6 decimals = the value's exact µs precision; rounding
    # below it (e.g. 4) hits the .5 boundary systematically and
    # Spark (shortest-decimal) vs DuckDB (binary) disagree there
    gap = (F.unix_micros("ts") - F.unix_micros("asof_c_ts")) / 1e6
    return joined.select(
        "event_id", "user_id", "ts",
        F.col("asof_c_ts").alias("prev_click_ts"),
        F.col("asof_c_id").alias("prev_click_id"),
        F.round(gap, 6).alias("gap_s"),
    )


register(
    "asof_purchase_attribution",
    _asof_purchase_attribution,
    # ASOF picks the latest prior ts; the cmin join-back resolves
    # SEVERAL clicks at that tied (user, ts) to min event_id — the
    # Spark side's struct-MIN tiebreaker (ADVICE r7: ASOF alone picks
    # arbitrarily on ties)
    """
    WITH c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
    cmin AS (SELECT user_id, ts, min(event_id) AS c_id
             FROM c GROUP BY user_id, ts),
    nxt AS (
      SELECT p.event_id, p.user_id, p.ts, c.ts AS prev_click_ts
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase') p
      ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND p.ts > c.ts
    )
    SELECT n.event_id, n.user_id, n.ts, n.prev_click_ts,
           cmin.c_id AS prev_click_id,
           round((epoch_us(n.ts) - epoch_us(n.prev_click_ts))
                 / 1000000.0, 6) AS gap_s
    FROM nxt n
    LEFT JOIN cmin ON cmin.user_id = n.user_id
                  AND cmin.ts = n.prev_click_ts
    """,
)

register(
    "q7_nation_trade_volume",
    lambda spark, sf: analytics.q7_nation_trade_volume(
        *_t(spark, sf, "supplier", "lineitem", "orders", "customer",
            "nation")),
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           (sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)

register(
    "q8_brand_market_share",
    lambda spark, sf: analytics.q8_brand_market_share(
        *_t(spark, sf, "lineitem", "part", "orders", "customer",
            "nation", "region")),
    """
    WITH agg AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             (sum(CASE WHEN p_brand = 'Brand#1'
                  THEN CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) ELSE 0 END) / 10000.0)
               AS brand_revenue,
             (sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0) AS total_revenue
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY 1
    )
    SELECT o_year, brand_revenue, total_revenue,
           (floor((brand_revenue * 100.0 / total_revenue) * 10000.0)
            / 10000.0) AS market_share_pct
    FROM agg
    ORDER BY o_year
    """,
)

register(
    "event_value_percentiles",
    lambda spark, sf: analytics.event_value_percentiles(
        *_t(spark, sf, "events")),
    """
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99,
           min(value) AS v_min,
           max(value) AS v_max
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)

register(
    "approx_distinct_stats",
    # the registered projection keeps only deterministic columns: the
    # exact NDV plus the two error-bound property booleans (VERDICT
    # r9 #5 — upgraded from rows-only to a strict value gate; the
    # engine-specific sketch VALUES stay on the operator's full
    # output for error inspection, outside the hash)
    lambda spark, sf: analytics.approx_distinct_stats(
        *_t(spark, sf, "events")).select(
            "event_type", "exact_users", "hll_ok", "p90_ok"),
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS hll_ok,
           TRUE AS p90_ok
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)

register(
    "parts_supplier_stats",
    lambda spark, sf: analytics.parts_supplier_stats(
        *_t(spark, sf, "part", "lineitem")),
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)

register(
    "q17_small_quantity_revenue",
    lambda spark, sf: analytics.q17_small_quantity_revenue(
        *_t(spark, sf, "lineitem", "part")),
    """
    WITH lines AS (
      SELECT l_partkey, l_quantity, l_extendedprice,
             sum(l_quantity) OVER (PARTITION BY l_partkey) AS part_qty_sum,
             count(*)        OVER (PARTITION BY l_partkey) AS part_qty_n
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#3'
    )
    SELECT CAST(floor((sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                       / 100.0 / 7.0) * 100.0) AS BIGINT)
             AS avg_yearly_cents
    FROM lines
    WHERE l_quantity < 0.2 * (part_qty_sum / part_qty_n)
    """,
)

register(
    "funnel_view_click_purchase",
    lambda spark, sf: analytics.funnel_view_click_purchase(
        *_t(spark, sf, "events")),
    """
    WITH pu AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS view_ts
      FROM events GROUP BY user_id
    ), fc AS (
      SELECT pu.user_id, pu.view_ts, min(e.ts) AS click_ts
      FROM pu JOIN events e
        ON e.user_id = pu.user_id AND e.event_type = 'click'
       AND e.ts > pu.view_ts
      GROUP BY pu.user_id, pu.view_ts
    ), fp AS (
      SELECT fc.user_id, min(e.ts) AS purchase_ts
      FROM fc JOIN events e
        ON e.user_id = fc.user_id AND e.event_type = 'purchase'
       AND e.ts > fc.click_ts
      GROUP BY fc.user_id
    )
    SELECT stage, n_users FROM (
      SELECT '1_view' AS stage, count(*) AS n_users FROM pu
       WHERE view_ts IS NOT NULL
      UNION ALL
      SELECT '2_click', count(*) FROM fc
      UNION ALL
      SELECT '3_purchase', count(*) FROM fp
    ) ORDER BY stage
    """,
)

register(
    "cube_orders_status_priority",
    lambda spark, sf: analytics.cube_orders_status_priority(
        *_t(spark, sf, "orders")),
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           (sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0) AS revenue,
           count(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)

register(
    "event_props_stats",
    lambda spark, sf: analytics.event_props_stats(*_t(spark, sf, "events")),
    """
    WITH parsed AS (
      SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           count(*) AS n_events,
           sum(k) AS sum_k,
           min(k) AS min_k,
           max(k) AS max_k,
           count(DISTINCT k) AS n_distinct_k,
           (floor(sum(k) * 10000.0 / count(*)) / 10000.0) AS avg_k
    FROM parsed
    GROUP BY event_type
    ORDER BY event_type
    """,
)

register(
    "customers_without_orders",
    lambda spark, sf: analytics.customers_without_orders(
        *_t(spark, sf, "customer", "orders")),
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)

register(
    "missing_order_days",
    lambda spark, sf: analytics.missing_order_days(*_t(spark, sf, "orders")),
    """
    WITH bounds AS (
      SELECT CAST(min(o_orderdate) AS DATE) AS d_min,
             CAST(max(o_orderdate) AS DATE) AS d_max
      FROM orders
    ), calendar AS (
      SELECT CAST(unnest(generate_series(d_min, d_max, INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    )
    SELECT d FROM calendar
    WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE CAST(o_orderdate AS DATE) = d
    )
    ORDER BY d
    """,
)

register(
    "session_duration_stats",
    lambda spark, sf: analytics.session_duration_stats(
        *_t(spark, sf, "events")),
    """
    WITH x AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ), y AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM x
    ), sess AS (
      SELECT user_id, sid,
             (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0 AS dur_s,
             count(*) AS n_events
      FROM y GROUP BY user_id, sid
    )
    SELECT count(*) AS n_sessions,
           sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS n_singleton,
           quantile_cont(dur_s, 0.5) AS p50_duration_s,
           quantile_cont(dur_s, 0.9) AS p90_duration_s,
           max(dur_s) AS max_duration_s,
           quantile_cont(n_events, 0.9) AS p90_events
    FROM sess
    """,
)

register(
    "sliding_event_rate",
    lambda spark, sf: analytics.sliding_event_rate(*_t(spark, sf, "events")),
    # epoch-aligned integer arithmetic reproduces Spark's window
    # assignment exactly: base bucket minus i slides, kept while the
    # event still falls inside the 1h window
    """
    WITH ex AS (
      SELECT user_id, epoch_us(ts) AS us,
             epoch_us(ts) - (epoch_us(ts) % 900000000) AS base_us
      FROM events
    ), w AS (
      SELECT make_timestamp(base_us - i.i * 900000000) AS window_start,
             us, user_id
      FROM ex, (SELECT unnest(range(0, 4)) AS i) AS i
      WHERE us >= base_us - i.i * 900000000
        AND us <  base_us - i.i * 900000000 + 3600000000
    )
    SELECT window_start, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM w
    GROUP BY 1
    """,
)


register(
    "range_join_purchase_context",
    lambda spark, sf: asof.range_join_purchase_context(
        *_t(spark, sf, "events")),
    """
    WITH purch AS (
      SELECT DISTINCT user_id, ts AS p_ts FROM events
      WHERE event_type = 'purchase'
    ), prior AS (
      SELECT user_id, ts, event_type FROM events
      WHERE event_type IN ('view', 'click')
    ), agg AS (
      SELECT p.user_id, p.p_ts,
             CAST(sum(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_views,
             CAST(sum(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_clicks
      FROM purch p JOIN prior e ON p.user_id = e.user_id
        AND e.ts >= p.p_ts - INTERVAL 1 HOUR AND e.ts < p.p_ts
      GROUP BY 1, 2
    )
    SELECT p.user_id, p.p_ts,
           coalesce(a.n_views, 0) AS n_views,
           coalesce(a.n_clicks, 0) AS n_clicks
    FROM purch p LEFT JOIN agg a
      ON p.user_id = a.user_id AND p.p_ts = a.p_ts
    """,
)


register(
    "hypertable_rollup",
    lambda spark, sf: analytics.hypertable_rollup(*_t(spark, sf, "events")),
    """
    WITH minute AS (
      SELECT date_trunc('minute', ts) AS bucket,
             count(*) AS n_events,
             sum(CAST(round(value * 100) AS BIGINT)) AS s,
             min(CAST(round(value * 100) AS BIGINT)) AS mn,
             max(CAST(round(value * 100) AS BIGINT)) AS mx
      FROM events GROUP BY 1
    ), hr AS (
      SELECT date_trunc('hour', bucket) AS bucket,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             CAST(sum(s) AS BIGINT) AS s, min(mn) AS mn, max(mx) AS mx
      FROM minute GROUP BY 1
    ), dy AS (
      SELECT date_trunc('day', bucket) AS bucket,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             CAST(sum(s) AS BIGINT) AS s, min(mn) AS mn, max(mx) AS mx
      FROM hr GROUP BY 1
    )
    SELECT 'minute' AS grain, bucket, n_events,
           (s / 100.0) AS sum_value, (mn / 100.0) AS min_value,
           (mx / 100.0) AS max_value
    FROM minute
    UNION ALL
    SELECT 'hour', bucket, n_events, (s / 100.0), (mn / 100.0), (mx / 100.0)
    FROM hr
    UNION ALL
    SELECT 'day', bucket, n_events, (s / 100.0), (mn / 100.0), (mx / 100.0)
    FROM dy
    """,
)


register(
    "cohort_retention",
    lambda spark, sf: analytics.cohort_retention(*_t(spark, sf, "events")),
    """
    WITH weeks AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    ), first AS (
      SELECT user_id, min(w) AS cohort_week FROM weeks GROUP BY 1
    ), per AS (
      SELECT cohort_week,
             CAST((w - cohort_week) / 7 AS INT) AS week_offset,
             count(DISTINCT weeks.user_id) AS n_users
      FROM weeks JOIN first ON weeks.user_id = first.user_id
      GROUP BY 1, 2
    ), size AS (
      SELECT cohort_week, n_users AS cohort_size FROM per
      WHERE week_offset = 0
    )
    SELECT per.cohort_week AS cohort_week, week_offset, n_users,
           cohort_size,
           (floor((n_users * 100.0 / cohort_size) * 10000.0) / 10000.0)
             AS retention_pct
    FROM per JOIN size ON per.cohort_week = size.cohort_week
    ORDER BY per.cohort_week, week_offset
    """,
)


register(
    "customer_rfm",
    lambda spark, sf: analytics.customer_rfm(*_t(spark, sf, "orders")),
    """
    WITH anc AS (
      SELECT max(CAST(o_orderdate AS DATE)) AS anchor FROM orders
    ), pc AS (
      SELECT o_custkey,
             date_diff('day', max(CAST(o_orderdate AS DATE)), anchor)
               AS recency_days,
             count(*) AS frequency,
             (sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0)
               AS monetary
      FROM orders, anc
      GROUP BY o_custkey, anchor
    ), b AS (
      SELECT quantile_cont(recency_days, 0.25) AS r25,
             quantile_cont(recency_days, 0.5)  AS r50,
             quantile_cont(recency_days, 0.75) AS r75,
             quantile_cont(frequency, 0.25) AS f25,
             quantile_cont(frequency, 0.5)  AS f50,
             quantile_cont(frequency, 0.75) AS f75,
             quantile_cont(monetary, 0.25) AS m25,
             quantile_cont(monetary, 0.5)  AS m50,
             quantile_cont(monetary, 0.75) AS m75
      FROM pc
    ), scored AS (
      SELECT o_custkey, recency_days, frequency, monetary,
             CASE WHEN recency_days <= r25 THEN 4
                  WHEN recency_days <= r50 THEN 3
                  WHEN recency_days <= r75 THEN 2 ELSE 1 END AS r_score,
             CASE WHEN frequency <= f25 THEN 1
                  WHEN frequency <= f50 THEN 2
                  WHEN frequency <= f75 THEN 3 ELSE 4 END AS f_score,
             CASE WHEN monetary <= m25 THEN 1
                  WHEN monetary <= m50 THEN 2
                  WHEN monetary <= m75 THEN 3 ELSE 4 END AS m_score
      FROM pc, b
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           (CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
            || CAST(m_score AS VARCHAR)) AS rfm
    FROM scored
    ORDER BY o_custkey
    """,
)


register(
    "event_transition_matrix",
    lambda spark, sf: analytics.event_transition_matrix(
        *_t(spark, sf, "events")),
    """
    WITH seq AS (
      SELECT event_type,
             lead(event_type, 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, count(*) AS n_transitions
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY n_transitions DESC, event_type, next_type
    LIMIT 50
    """,
)

register(
    "source_token_stats",
    lambda spark, sf: analytics.source_token_stats(
        *_t(spark, sf, "documents")),
    """
    WITH d AS (
      SELECT source,
             len(list_filter(str_split(text, ' '), x -> x != ''))
               AS n_tokens,
             n_chars
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           (floor(sum(n_tokens) * 1e4 / count(*)) / 1e4)
             AS avg_tokens_per_doc
    FROM d
    GROUP BY source
    ORDER BY source
    """,
)


register(
    "brand_price_trend",
    lambda spark, sf: analytics.brand_price_trend(
        *_t(spark, sf, "lineitem", "part")),
    """
    WITH monthly AS (
      SELECT p_brand AS brand,
             (year(l_shipdate) * 12 + month(l_shipdate) - 1) AS am,
             CAST(floor(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        / 100) AS BIGINT) AS y
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    ), base AS (SELECT min(am) AS m0 FROM monthly),
    pts AS (
      SELECT brand, (am - m0) AS x, y FROM monthly, base
    ), agg AS (
      SELECT brand,
             count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM pts GROUP BY brand
    )
    SELECT brand,
           n AS n_months,
           (sy * 1.0 / n) AS avg_monthly_revenue,
           CASE WHEN (n * sxx - sx * sx) != 0
                THEN floor((n * sxy - sx * sy) * 1e4
                           / (n * sxx - sx * sx)) / 1e4
                ELSE 0.0 END AS slope_dollars_per_month
    FROM agg
    ORDER BY brand
    """,
)

register(
    "supplier_concentration_hhi",
    lambda spark, sf: analytics.supplier_concentration_hhi(
        *_t(spark, sf, "lineitem", "supplier", "nation")),
    """
    WITH per_supp AS (
      SELECT l_suppkey,
             CAST(floor(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        / 100) AS BIGINT) AS d
      FROM lineitem GROUP BY 1
    ), per_nation AS (
      SELECT s_nationkey,
             count(*) AS n_suppliers,
             CAST(sum(d) AS BIGINT) AS total_d,
             CAST(sum(d * d) AS BIGINT) AS sum_d2
      FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1
    )
    SELECT n_name AS nation,
           n_suppliers,
           CAST(total_d AS DOUBLE) AS total_dollars,
           CASE WHEN total_d > 0
                THEN floor(sum_d2 * 1e6 / (CAST(total_d AS DOUBLE)
                                            * CAST(total_d AS DOUBLE))) / 1e6
                ELSE 0.0 END AS hhi
    FROM per_nation JOIN nation ON s_nationkey = n_nationkey
    ORDER BY nation
    """,
)


register(
    "event_hourly_heatmap",
    lambda spark, sf: analytics.event_hourly_heatmap(
        *_t(spark, sf, "events")),
    """
    SELECT dayofweek(ts) + 1 AS dow,
           hour(ts) AS hour,
           count(*) AS n_events,
           (sum(CAST(floor(value * 1e6) AS BIGINT)) / 1e6) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY dow, hour
    """,
)


from selfhealingdatapipeline_gcp_spark.operators import cdc  # noqa: E402


register(
    "cdc_latest_snapshot",
    lambda spark, sf: cdc.latest_snapshot_det(
        *_t(spark, sf, "events"), "user_id", "ts", "event_id"),
    """
    SELECT event_id, ts, user_id, event_type, value, props FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)


register(
    "cdc_scd2_from_log",
    lambda spark, sf: cdc.scd2_from_log(
        _t(spark, sf, "events")[0].filter(
            F.col("event_type") == "purchase"),
        "user_id", "ts", "event_id", ("value",)),
    """
    SELECT user_id, value, ts AS effective_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS effective_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              IS NULL) AS is_current
    FROM events WHERE event_type = 'purchase'
    """,
)


def _snapshot_old(spark, sf):
    """Fabricated prior snapshot: 10% of keys absent (added later),
    and status rewritten for keys % 7 == 0 (changed rows)."""
    orders = _t(spark, sf, "orders")[0]
    return (
        orders.filter("o_orderkey % 10 != 0")
        .withColumn("o_orderstatus",
                    F.when(F.col("o_orderkey") % 7 == 0, F.lit("X"))
                     .otherwise(F.col("o_orderstatus")))
    )


register(
    "cdc_snapshot_diff",
    lambda spark, sf: cdc.snapshot_diff(
        _snapshot_old(spark, sf),
        _t(spark, sf, "orders")[0].filter("o_orderkey % 13 != 0"),
        "o_orderkey",
        ("o_orderstatus", "o_orderpriority")),
    """
    WITH old AS (
      SELECT o_orderkey AS key,
             md5(concat(
                 coalesce(md5(CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                              ELSE o_orderstatus END),
                          repeat('N', 32)),
                 coalesce(md5(o_orderpriority), repeat('N', 32))
             )) AS fp_old
      FROM orders WHERE o_orderkey % 10 != 0
    ), new AS (
      SELECT o_orderkey AS key,
             md5(concat(
                 coalesce(md5(o_orderstatus), repeat('N', 32)),
                 coalesce(md5(o_orderpriority), repeat('N', 32))
             )) AS fp_new
      FROM orders WHERE o_orderkey % 13 != 0
    )
    SELECT key,
           CASE WHEN fp_old IS NULL THEN 'added'
                WHEN fp_new IS NULL THEN 'removed'
                WHEN fp_old != fp_new THEN 'changed'
                ELSE 'unchanged' END AS change_type
    FROM old FULL OUTER JOIN new USING (key)
    ORDER BY key
    """,
)


from selfhealingdatapipeline_gcp_spark.operators import quality  # noqa: E402


def _schema_old(spark, sf):
    """Fabricated prior table version: o_orderpriority absent (so the
    current version reads as 'added'), o_custkey narrowed to int
    (type change), and o_orderstatus nulled for %7 keys (null-rate
    drift)."""
    orders = _t(spark, sf, "orders")[0]
    return (
        orders.drop("o_orderpriority")
        .withColumn("o_custkey", F.col("o_custkey").cast("int"))
        .withColumn("o_orderstatus",
                    F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
                     .otherwise(F.col("o_orderstatus")))
    )


register(
    "quality_schema_drift",
    lambda spark, sf: quality.schema_drift_report(
        _schema_old(spark, sf), _t(spark, sf, "orders")[0]),
    """
    WITH agg AS (
      SELECT count(*) AS n,
             CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS nn_status
      FROM orders
    )
    SELECT * FROM (
      SELECT 'o_custkey' AS "column", 'common' AS status,
             'int' AS dtype_old, 'bigint' AS dtype_new,
             TRUE AS type_changed,
             CAST(0 AS BIGINT) AS null_rate_old_e6,
             CAST(0 AS BIGINT) AS null_rate_new_e6,
             CAST(0 AS BIGINT) AS null_rate_delta_e6
      FROM agg
      UNION ALL
      SELECT 'o_orderdate', 'common', 'timestamp_ntz', 'timestamp_ntz', FALSE,
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM agg
      UNION ALL
      SELECT 'o_orderkey', 'common', 'bigint', 'bigint', FALSE,
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM agg
      UNION ALL
      SELECT 'o_orderpriority', 'added', NULL, 'string', FALSE,
             CAST(NULL AS BIGINT), CAST(0 AS BIGINT),
             CAST(NULL AS BIGINT)
      FROM agg
      UNION ALL
      SELECT 'o_orderstatus', 'common', 'string', 'string', FALSE,
             CAST(floor(nn_status * 1000000.0 / greatest(n, 1))
                  AS BIGINT),
             CAST(0 AS BIGINT),
             CAST(0 AS BIGINT)
               - CAST(floor(nn_status * 1000000.0 / greatest(n, 1))
                      AS BIGINT)
      FROM agg
      UNION ALL
      SELECT 'o_totalprice', 'common', 'double', 'double', FALSE,
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM agg
    ) ORDER BY "column"
    """,
)


register(
    "user_activity_salted",
    lambda spark, sf: analytics.user_activity_salted(
        *_t(spark, sf, "events")),
    # IDENTICAL oracle to user_activity_summary: the salted two-phase
    # combine must be value-invisible
    """
    SELECT user_id,
           count(*) AS n_events,
           count(DISTINCT event_type) AS n_types,
           (sum(CAST(round(value * 100) AS BIGINT)) / 100.0) AS total_value,
           min(ts) AS first_seen,
           max(ts) AS last_seen,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS n_purchases,
           round((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0, 6)
             AS lifespan_s
    FROM events
    GROUP BY user_id
    """,
)


register(
    "brand_affinity",
    lambda spark, sf: analytics.brand_affinity(
        *_t(spark, sf, "lineitem", "part")),
    """
    WITH ob AS (
      SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), per_brand AS (
      SELECT brand, CAST(count(*) AS BIGINT) AS n FROM ob GROUP BY 1
    ), tot AS (
      SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_total FROM ob
    ), pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM ob a JOIN ob b
        ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, n_both,
           pa.n AS n_a, pb.n AS n_b,
           CAST(floor(CAST(n_both AS DOUBLE) * 1000000.0
                      / CAST(n_total AS DOUBLE)) AS BIGINT)
             AS support_e6,
           CAST(floor(CAST(n_both AS DOUBLE) * 1000000.0
                      / CAST(pa.n AS DOUBLE)) AS BIGINT)
             AS confidence_a_to_b_e6,
           CAST(floor(CAST(n_both AS DOUBLE) * CAST(n_total AS DOUBLE)
                      / (CAST(pa.n AS DOUBLE) * CAST(pb.n AS DOUBLE))
                      * 1000000.0) AS BIGINT) AS lift_e6
    FROM pairs
    JOIN per_brand pa ON pa.brand = pairs.brand_a
    JOIN per_brand pb ON pb.brand = pairs.brand_b
    CROSS JOIN tot
    WHERE n_both >= 5
    ORDER BY brand_a, brand_b
    """,
)


register(
    # the Spark side stitches (user, day)-bucketed windows for skew
    # safety; the oracle is the naive single-window form — the plans
    # differ, the VALUES must not (user_activity_salted discipline)
    "event_trigram_paths",
    lambda spark, sf: analytics.event_trigram_paths(
        *_t(spark, sf, "events")),
    """
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), tri AS (
      SELECT event_type AS step_1, t2 AS step_2, t3 AS step_3
      FROM s WHERE t3 IS NOT NULL
    ), agg AS (
      SELECT step_1, step_2, step_3,
             CAST(count(*) AS BIGINT) AS n_paths
      FROM tri GROUP BY 1, 2, 3
    ), t AS (
      SELECT CAST(sum(n_paths) AS BIGINT) AS total FROM agg
    )
    SELECT step_1, step_2, step_3, n_paths,
           CAST(floor(n_paths * 1000000.0 / total) AS BIGINT)
             AS share_e6
    FROM agg, t ORDER BY step_1, step_2, step_3
    """,
)


register(
    "cdc_churn_report",
    lambda spark, sf: cdc.churn_report(
        _t(spark, sf, "events")[0].filter(
            F.col("event_type") == "purchase"),
        "user_id"),
    """
    WITH per_key AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_versions
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), hist AS (
      SELECT n_versions, CAST(count(*) AS BIGINT) AS n_keys
      FROM per_key GROUP BY 1
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS total_keys,
             CAST(sum(n_versions) AS BIGINT) AS total_changes
      FROM per_key
    )
    SELECT n_versions, n_keys,
           CAST(n_versions * n_keys AS BIGINT) AS n_changes,
           CAST(floor(n_keys * 1000000.0 / total_keys) AS BIGINT)
             AS keys_share_e6,
           CAST(floor(n_versions * n_keys * 1000000.0 / total_changes)
                AS BIGINT) AS changes_share_e6
    FROM hist CROSS JOIN tot ORDER BY n_versions
    """,
)


register(
    "funnel_time_to_convert",
    lambda spark, sf: analytics.funnel_time_to_convert(
        *_t(spark, sf, "events")),
    """
    WITH first_view AS (
      SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END)
               AS view_ts
      FROM events GROUP BY 1
      HAVING min(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL
    ), conv AS (
      SELECT v.user_id,
             CAST(floor((epoch_us(min(p.ts)) - epoch_us(v.view_ts))
                        / 1000000.0) AS BIGINT) AS lat_s
      FROM first_view v
      JOIN events p ON p.user_id = v.user_id
                    AND p.event_type = 'purchase'
                    AND p.ts > v.view_ts
      GROUP BY v.user_id, v.view_ts
    ), nv AS (
      SELECT CAST(count(*) AS BIGINT) AS n_viewers FROM first_view
    ), cagg AS (
      -- global aggregate FIRST (one row even when conv is empty),
      -- then cross join: the old GROUP BY nv.n_viewers over an empty
      -- conv emitted ZERO rows while Spark's global agg emits one
      -- (n_converters=0, null percentiles) — ADVICE r7 degenerate-
      -- input parity
      SELECT CAST(count(*) AS BIGINT) AS n_converters,
             CAST(floor(quantile_cont(lat_s, 0.5)) AS BIGINT)
               AS p50_latency_s,
             CAST(floor(quantile_cont(lat_s, 0.9)) AS BIGINT)
               AS p90_latency_s,
             CAST(floor(avg(lat_s)) AS BIGINT) AS mean_latency_s
      FROM conv
    )
    SELECT nv.n_viewers, cagg.n_converters,
           CAST(floor(cagg.n_converters * 1000000.0 / nv.n_viewers)
                AS BIGINT) AS conversion_e6,
           cagg.p50_latency_s, cagg.p90_latency_s, cagg.mean_latency_s
    FROM cagg CROSS JOIN nv
    """,
)


register(
    "event_audience_overlap",
    lambda spark, sf: analytics.event_audience_overlap(
        *_t(spark, sf, "events")),
    """
    WITH tu AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), sizes AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
      FROM tu GROUP BY 1
    ), inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM tu a JOIN tu b ON a.user_id = b.user_id
                          AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, sa.n_users AS n_a, sb.n_users AS n_b,
           i.n_both,
           CAST(floor(i.n_both * 1000000.0
                      / (sa.n_users + sb.n_users - i.n_both)) AS BIGINT)
             AS jaccard_e6
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    ORDER BY type_a, type_b
    """,
)


from selfhealingdatapipeline_gcp_spark.operators import layout as _layout  # noqa: E402

register(
    "zorder_layout_plan",
    lambda spark, sf: _layout.zorder_layout_plan(
        *_t(spark, sf, "lineitem")),
    """
    WITH b AS (
      SELECT CAST(min(datediff('day', DATE '1992-01-01', l_shipdate))
                  AS BIGINT) AS mn_dt,
             CAST(max(datediff('day', DATE '1992-01-01', l_shipdate))
                  AS BIGINT) AS mx_dt,
             CAST(min(l_partkey) AS BIGINT) AS mn_pk,
             CAST(max(l_partkey) AS BIGINT) AS mx_pk,
             CAST(min(l_orderkey) AS BIGINT) AS mn_ok,
             CAST(max(l_orderkey) AS BIGINT) AS mx_ok
      FROM lineitem
    ), q AS (
      SELECT CAST(floor((datediff('day', DATE '1992-01-01', l_shipdate)
                         - b.mn_dt) * 65536
                        / (b.mx_dt - b.mn_dt + 1)) AS BIGINT) AS q_dt,
             CAST(floor((l_partkey - b.mn_pk) * 65536
                        / (b.mx_pk - b.mn_pk + 1)) AS BIGINT) AS q_pk,
             CAST(floor((l_orderkey - b.mn_ok) * 64
                        / (b.mx_ok - b.mn_ok + 1)) AS BIGINT) AS nat
      FROM lineitem, b
    ), z AS (
      SELECT q_dt, q_pk, nat,
             ((((q_dt >> 13) >> 0) & 1) << 1) + ((((q_pk >> 13) >> 0) & 1) << 0)
           + ((((q_dt >> 13) >> 1) & 1) << 3) + ((((q_pk >> 13) >> 1) & 1) << 2)
           + ((((q_dt >> 13) >> 2) & 1) << 5) + ((((q_pk >> 13) >> 2) & 1) << 4)
               AS cell
      FROM q
    ), labeled AS (
      SELECT 'natural' AS layout, CAST(nat AS INT) AS file_id,
             q_dt, q_pk FROM z
      UNION ALL
      SELECT 'zorder', CAST(cell AS INT), q_dt, q_pk FROM z
    )
    SELECT layout, file_id, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(q_dt) AS BIGINT) AS dt_min,
           CAST(max(q_dt) AS BIGINT) AS dt_max,
           CAST(min(q_pk) AS BIGINT) AS pk_min,
           CAST(max(q_pk) AS BIGINT) AS pk_max,
           CAST(max(q_dt) - min(q_dt) + 1 AS BIGINT) AS dt_span,
           CAST(max(q_pk) - min(q_pk) + 1 AS BIGINT) AS pk_span
    FROM labeled
    GROUP BY layout, file_id
    ORDER BY layout, file_id
    """,
)


register(
    "range_partition_plan",
    lambda spark, sf: _layout.range_partition_plan(
        *_t(spark, sf, "lineitem")),
    """
    WITH bo AS (
      SELECT CAST(min(l_orderkey) AS BIGINT) AS mn,
             CAST(max(l_orderkey) AS BIGINT) AS mx,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem
    ), h AS (
      SELECT CAST(CASE WHEN bo.mx = bo.mn THEN 0
                  ELSE least(1023, floor((l_orderkey - bo.mn) * 1024
                                         / (bo.mx - bo.mn + 1)))
             END AS INT) AS b,
             bo.n, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem, bo GROUP BY 1, 2
    ), a AS (
      SELECT b, n, cnt,
             CAST(coalesce(sum(cnt) OVER (ORDER BY b
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_before
      FROM h
    ), p AS (
      SELECT CAST(floor(cum_before * 32 / n) AS INT) AS partition_id,
             n, cnt
      FROM a
    )
    SELECT partition_id,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(floor(sum(cnt) * 1000000.0 / max(n)) AS BIGINT)
             AS share_e6,
           CAST(floor(sum(cnt) * 1000000.0 / max(n))
                - floor(1000000.0 / 32) AS BIGINT) AS dev_from_even_e6
    FROM p GROUP BY 1 ORDER BY 1
    """,
)


from selfhealingdatapipeline_gcp_spark.operators import analytics as _an2  # noqa: E402

register(
    "series_downsample_m4",
    lambda spark, sf: _an2.series_downsample_m4(
        *_t(spark, sf, "events")),
    """
    WITH bo AS (
      SELECT event_type,
             CAST(min(epoch_us(ts)) AS BIGINT) AS t0,
             CAST(max(epoch_us(ts)) AS BIGINT) AS t1
      FROM events GROUP BY 1
    ), base AS (
      SELECT e.event_type,
             CAST(epoch_us(e.ts) AS BIGINT) AS t_us,
             CAST(round(e.value * 100) AS BIGINT) AS v_c,
             CAST(e.event_id AS BIGINT) AS eid,
             CAST(floor((epoch_us(e.ts) - bo.t0) * 256
                        / (bo.t1 - bo.t0 + 1)) AS INT) AS bkt
      FROM events e JOIN bo USING (event_type)
    ), ranked AS (
      SELECT *,
        row_number() OVER (PARTITION BY event_type, bkt
                           ORDER BY t_us, eid)             AS r_first,
        row_number() OVER (PARTITION BY event_type, bkt
                           ORDER BY t_us DESC, eid DESC)   AS r_last,
        row_number() OVER (PARTITION BY event_type, bkt
                           ORDER BY v_c, t_us, eid)        AS r_min,
        row_number() OVER (PARTITION BY event_type, bkt
                           ORDER BY v_c DESC, t_us, eid)   AS r_max
      FROM base
    )
    SELECT event_type, bkt, role, t_us, v_c, eid FROM (
      SELECT event_type, bkt, 'first' AS role, t_us, v_c, eid
      FROM ranked WHERE r_first = 1
      UNION ALL
      SELECT event_type, bkt, 'last', t_us, v_c, eid
      FROM ranked WHERE r_last = 1
      UNION ALL
      SELECT event_type, bkt, 'min', t_us, v_c, eid
      FROM ranked WHERE r_min = 1
      UNION ALL
      SELECT event_type, bkt, 'max', t_us, v_c, eid
      FROM ranked WHERE r_max = 1
    ) ORDER BY event_type, bkt, role
    """,
)


def _asof_next_purchase(spark, sf):
    events = catalog.load(spark, sf, "events")
    views = (events.filter(F.col("event_type") == "view")
             .select("event_id", "user_id", "ts"))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("ts").alias("p_ts"),
                         F.col("event_id").alias("p_id")))
    joined = asof.asof_join_forward(
        views, purchases, on="user_id",
        left_ts="ts", right_ts="p_ts", right_cols=("p_ts", "p_id"))
    gap = (F.unix_micros("next_p_ts") - F.unix_micros("ts")) / 1e6
    return joined.select(
        "event_id", "user_id", "ts",
        F.col("next_p_ts").alias("next_purchase_ts"),
        F.col("next_p_id").alias("next_purchase_id"),
        F.round(gap, 6).alias("gap_s"),
    )


register(
    "asof_next_purchase",
    _asof_next_purchase,
    # forward direction: DuckDB ASOF with '<' picks the EARLIEST
    # right row strictly after the probe — the next-event join. The
    # pmin join-back resolves SEVERAL purchases at that tied
    # (user, ts) to min event_id — the Spark side's struct-MIN
    # tiebreaker (ADVICE r7: ASOF alone picks arbitrarily on ties)
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    pmin AS (SELECT user_id, ts, min(event_id) AS p_id
             FROM p GROUP BY user_id, ts),
    nxt AS (
      SELECT v.event_id, v.user_id, v.ts, p.ts AS next_purchase_ts
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'view') v
      ASOF LEFT JOIN p
        ON v.user_id = p.user_id AND v.ts < p.ts
    )
    SELECT n.event_id, n.user_id, n.ts, n.next_purchase_ts,
           pmin.p_id AS next_purchase_id,
           round((epoch_us(n.next_purchase_ts) - epoch_us(n.ts))
                 / 1000000.0, 6) AS gap_s
    FROM nxt n
    LEFT JOIN pmin ON pmin.user_id = n.user_id
                  AND pmin.ts = n.next_purchase_ts
    """,
)


def _ivm_inputs(spark, sf):
    """Fabricated CDC episode over orders, day grain: deletes
    (k%13==0), inserts (k%10==0), price updates +$10 (k%7==0) —
    old snapshot, log old-images, log new-images, new snapshot."""
    orders = _t(spark, sf, "orders")[0]
    base = orders.select(
        F.to_date("o_orderdate").alias("d"),
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("amt"))
    old = base.filter("k % 10 != 0").withColumn(
        "amt", F.when(F.col("k") % 7 == 0, F.col("amt") + 10.0)
                .otherwise(F.col("amt")))
    new = base.filter("k % 13 != 0")
    minus = (old.filter("k % 13 = 0")
             .unionByName(old.filter("k % 7 = 0 AND k % 13 != 0")))
    plus = (new.filter("k % 10 = 0")
            .unionByName(new.filter("k % 7 = 0 AND k % 10 != 0")))
    return old, minus, plus, new


register(
    "cdc_incremental_agg",
    # incremental view maintenance, self-verified: old agg + signed
    # log delta vs recompute from the new snapshot (operators/cdc.py
    # incremental_agg_maintain)
    lambda spark, sf: cdc.incremental_agg_maintain(
        *_ivm_inputs(spark, sf), "d", "amt"),
    """
    WITH base AS (
      SELECT CAST(o_orderdate AS DATE) AS d, o_orderkey AS k,
             o_totalprice AS amt
      FROM orders
    ), old AS (
      SELECT d, k, CASE WHEN k % 7 = 0 THEN amt + 10.0 ELSE amt END AS amt
      FROM base WHERE k % 10 != 0
    ), neww AS (
      SELECT d, k, amt FROM base WHERE k % 13 != 0
    ), minus AS (
      SELECT * FROM old WHERE k % 13 = 0
      UNION ALL
      SELECT * FROM old WHERE k % 7 = 0 AND k % 13 != 0
    ), plus AS (
      SELECT * FROM neww WHERE k % 10 = 0
      UNION ALL
      SELECT * FROM neww WHERE k % 7 = 0 AND k % 10 != 0
    ), a_old AS (
      SELECT d AS g, CAST(count(*) AS BIGINT) AS n_old,
             CAST(sum(CAST(round(amt * 100) AS BIGINT)) AS BIGINT) AS c_old
      FROM old GROUP BY 1
    ), a_m AS (
      SELECT d AS g, CAST(count(*) AS BIGINT) AS n_m,
             CAST(sum(CAST(round(amt * 100) AS BIGINT)) AS BIGINT) AS c_m
      FROM minus GROUP BY 1
    ), a_p AS (
      SELECT d AS g, CAST(count(*) AS BIGINT) AS n_p,
             CAST(sum(CAST(round(amt * 100) AS BIGINT)) AS BIGINT) AS c_p
      FROM plus GROUP BY 1
    ), a_rec AS (
      SELECT d AS g, CAST(count(*) AS BIGINT) AS n_rec,
             CAST(sum(CAST(round(amt * 100) AS BIGINT)) AS BIGINT) AS c_rec
      FROM neww GROUP BY 1
    ), maintained AS (
      SELECT coalesce(a_old.g, a_m.g, a_p.g) AS g,
             CAST(coalesce(n_old, 0) - coalesce(n_m, 0)
                  + coalesce(n_p, 0) AS BIGINT) AS n_rows,
             CAST(coalesce(c_old, 0) - coalesce(c_m, 0)
                  + coalesce(c_p, 0) AS BIGINT) AS amount_cents
      FROM a_old
      FULL JOIN a_m ON a_old.g = a_m.g
      FULL JOIN a_p ON coalesce(a_old.g, a_m.g) = a_p.g
    )
    SELECT coalesce(m.g, r.g) AS d,
           CAST(coalesce(n_rows, 0) AS BIGINT) AS n_rows,
           CAST(coalesce(amount_cents, 0) AS BIGINT) AS amount_cents,
           CAST(coalesce(n_rec, 0) AS BIGINT) AS n_rows_recomputed,
           CAST(coalesce(c_rec, 0) AS BIGINT) AS amount_cents_recomputed,
           (coalesce(n_rows, 0) = coalesce(n_rec, 0)
            AND coalesce(amount_cents, 0) = coalesce(c_rec, 0)) AS matches
    FROM maintained m FULL JOIN a_rec r ON m.g = r.g
    ORDER BY d
    """,
)


register(
    "supplier_scorecard",
    # per-supplier fulfillment dashboard (operators/analytics.py
    # supplier_scorecard)
    lambda spark, sf: analytics.supplier_scorecard(
        *_t(spark, sf, "lineitem", "supplier", "nation")),
    """
    WITH per_supp AS (
      SELECT l_suppkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             (sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
              / 10000.0) AS revenue,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_returned,
             CAST(count(DISTINCT l_partkey) AS BIGINT)
               AS n_distinct_parts,
             CAST(sum(CAST(round(l_discount * 100) AS BIGINT))
                  AS BIGINT) AS disc_c
      FROM lineitem GROUP BY 1
    )
    SELECT s_suppkey AS supplier_key, s_name AS supplier_name,
           n_name AS nation,
           n_lines, revenue, n_distinct_parts,
           CAST(floor(n_returned * 1000000.0 / n_lines) AS BIGINT)
             AS return_rate_e6,
           CAST(floor(disc_c * 100.0 / n_lines) AS BIGINT)
             AS avg_discount_e4
    FROM per_supp
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    ORDER BY supplier_key
    """,
)
