"""Core ETL / analytics operators (reference: scripts/transform_script
and the SQL shapes inside monitoring/detectors/*).

Every operator is a pure logical-plan builder: DataFrames in,
DataFrame out, no actions. Money aggregates use exact integer-cents
sums and ratios floor-truncate (SURVEY.md §3 parity rules); every
computed column carries an explicit alias matching its oracle SQL.

Scale notes (100 TB): nation/region are forced broadcast; orders ⋈
lineitem is a shuffle join on the order key with AQE skew handling;
all filters are expressed on raw columns so they push into the
parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from selfhealingdatapipeline_gcp_spark.functions import money


def _sum_revenue():
    """Exact revenue sum (functions/money.py): integer-cents
    arithmetic, order-independent, oracle-parity-safe."""
    return money.sum_revenue_e4(F.col("l_extendedprice"), F.col("l_discount"))


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 pricing summary report (flagship).

    Single scan → map-side partial agg → 6-group final agg. The
    shipdate predicate pushes into the parquet scan.
    """
    return (
        lineitem
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # quantities are integer-valued: double sums are exact
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            # money: exact integer-cents sums (functions/money.py)
            money.sum_money(F.col("l_extendedprice")).alias("sum_base_price"),
            _sum_revenue().alias("sum_disc_price"),
            money.sum_charge_e6(F.col("l_extendedprice"), F.col("l_discount"),
                                F.col("l_tax")).alias("sum_charge"),
            (F.sum(money.cents(F.col("l_discount"))) / 100.0).alias("__disc_sum"),
            F.count(F.lit(1)).alias("count_order"),
        )
        # ratios: floor-trunc of bit-identical doubles (round() can
        # disagree across engines at .xx5 ties)
        .withColumn("avg_qty",
                    money.trunc(F.col("sum_qty") / F.col("count_order")))
        .withColumn("avg_price",
                    money.trunc(F.col("sum_base_price") / F.col("count_order")))
        .withColumn("avg_disc",
                    money.trunc(F.col("__disc_sum") / F.col("count_order")))
        .drop("__disc_sum")
    )


def q3_shipping_priority(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3 shape: segment filter → 3-way join → top-10 revenue.

    customer is the small side (broadcast via threshold); orders ⋈
    lineitem shuffles on the order key. Deterministic tiebreak on
    l_orderkey.
    """
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_sum_revenue().alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_regional_revenue(customer: DataFrame, orders: DataFrame,
                        lineitem: DataFrame, supplier: DataFrame,
                        nation: DataFrame, region: DataFrame,
                        region_name: str = "ASIA") -> DataFrame:
    """TPC-H Q5 shape: local-supplier revenue per nation in a region.

    nation/region forced broadcast (constant-size dims); supplier is
    broadcast-eligible via the size threshold. The c_nationkey =
    s_nationkey correlation rides on the join output, not a shuffle.
    """
    return (
        customer
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supplier, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == region_name)
        .groupBy("n_name")
        .agg(_sum_revenue().alias("revenue"))
    )


def q10_returned_items(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, nation: DataFrame) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, per customer, top 20."""
    return (
        customer
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_sum_revenue().alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def top_customers_per_segment(customer: DataFrame, k: int = 5) -> DataFrame:
    """Top-k customers by account balance within each market segment.

    Window top-k: one shuffle on the partition key; rank predicate
    prunes before any downstream work.
    """
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey"))
    return (
        customer
        .withColumn("rank_in_segment", F.row_number().over(w))
        .filter(F.col("rank_in_segment") <= k)
        .select("c_mktsegment", "rank_in_segment", "c_custkey", "c_name",
                F.round("c_acctbal", 2).alias("acctbal"))
    )


def order_priority_check(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: orders (in a quarter) having at least one line
    shipped > 30 days after the order date, counted per priority.

    left_semi join = EXISTS — no row multiplication, shuffle only on
    the order key.
    """
    late_lines = (
        lineitem.select("l_orderkey", "l_shipdate")
    )
    window_orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    return (
        window_orders
        .join(late_lines,
              (F.col("o_orderkey") == F.col("l_orderkey"))
              & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
              "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def etl_orders_enriched(orders: DataFrame, customer: DataFrame,
                        nation: DataFrame, region: DataFrame) -> DataFrame:
    """The transform_script payload (reference scripts/transform_script:11-24),
    re-expressed: typed read → cleanse → dim-enrich → sink-ready rows.

    Output is partitionable by order_year for a partitioned parquet /
    warehouse sink. Dim joins broadcast.
    """
    return (
        orders
        .filter(F.col("o_orderkey").isNotNull() & (F.col("o_totalprice") > 0))
        .join(customer.select("c_custkey", "c_name", "c_mktsegment", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            "c_name",
            "c_mktsegment",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            F.to_date("o_orderdate").alias("orderdate"),
            F.year("o_orderdate").alias("order_year"),
            "o_orderstatus",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: potential revenue from discount changes —
    single scan, every predicate pushed into parquet."""
    return (
        lineitem
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(money.cents(F.col("l_extendedprice"))
                   * money.cents(F.col("l_discount"))) / 10000.0)
             .alias("revenue_effect"))
    )


def q14_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share for one month
    (p_type = 'PROMO'); part broadcast, single conditional agg."""
    rev_e4 = (money.cents(F.col("l_extendedprice"))
              * (100 - money.cents(F.col("l_discount"))))
    promo_e4 = F.when(F.col("p_type") == "PROMO", rev_e4).otherwise(F.lit(0))
    return (
        lineitem
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.sum(promo_e4) / 10000.0).alias("promo_revenue"),
            (F.sum(rev_e4) / 10000.0).alias("total_revenue"),
        )
        .withColumn(
            "promo_pct",
            money.trunc(F.col("promo_revenue") * 100.0 / F.col("total_revenue")))
    )


def q18_large_orders(customer: DataFrame, orders: DataFrame,
                     lineitem: DataFrame, min_qty: float = 150.0) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds the
    threshold, with customer context. The lineitem agg runs first
    (map-side combine), then a semi-bounded join to orders."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        big
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_name"),
              F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "o_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


def pivot_event_daily(events: DataFrame) -> DataFrame:
    """Daily event counts pivoted to one column per type (explicit
    pivot values → no extra discovery pass over the data)."""
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events
        .groupBy(F.to_date("ts").alias("d"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .select("d", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
                       for t in types])
    )


def rollup_revenue_region_nation(orders: DataFrame, customer: DataFrame,
                                 nation: DataFrame, region: DataFrame
                                 ) -> DataFrame:
    """Region → nation rollup of order revenue (grouping-sets shape);
    NULL subtotal levels labeled 'ALL' for a stable contract."""
    return (
        orders
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(money.sum_money(F.col("o_totalprice")).alias("revenue"),
             F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "revenue", "n_orders",
        )
    )


def revenue_moving_avg(orders: DataFrame, window_days: int = 7) -> DataFrame:
    """Daily revenue with trailing moving average and week-over-week
    delta (ordered window over the pre-rounded day grain)."""
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(money.sum_money(F.col("o_totalprice")).alias("revenue"))
    )
    # unpartitioned day-grain windows — O(days) rows forever; trailing
    # frames need consecutive days, so partitioning would be wrong
    # (see detectors.revenue_anomaly)
    w_ma = Window.orderBy("d").rowsBetween(-(window_days - 1), 0)
    w_lag = Window.orderBy("d")
    prev = F.lag("revenue", window_days).over(w_lag)
    return daily.select(
        "d", "revenue",
        money.trunc(F.avg("revenue").over(w_ma)).alias("ma7"),
        money.trunc(
            F.when(prev > 0, (F.col("revenue") - prev) * 100.0 / prev)
             .otherwise(F.lit(0.0))).alias("wow_pct"),
    )


def user_activity_summary(events: DataFrame) -> DataFrame:
    """Per-user behavioral features (the feature-engineering shape):
    one shuffle on user_id, everything else map-side.

    Skew note: every aggregate here is algebraic (count / sum / min /
    max; countDistinct rewrites to a two-level aggregate on
    (user_id, event_type)), so Spark partial-aggregates BEFORE the
    exchange — a hot user contributes one partial row per map task,
    not its raw events, and no salting is needed. Asserted in
    tests/test_plan_shapes.py (partial HashAggregate below the
    exchange)."""
    return (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            money.sum_money(F.col("value")).alias("total_value"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
             .alias("n_purchases"),
        )
        # seconds at 6 decimals = exact µs precision (hours at 4
        # decimals lands on cross-engine rounding boundaries whenever
        # the µs gap is a multiple of 0.18 s)
        .withColumn(
            "lifespan_s",
            F.round((F.unix_micros("last_seen") - F.unix_micros("first_seen"))
                    / 1e6, 6))
    )


def user_activity_salted(events: DataFrame,
                         salt_factor: int = 8) -> DataFrame:
    """user_activity_summary through the EXPLICIT two-phase salted
    aggregation (functions/skew.with_salt) — the registry-surfaced
    proof that the skew toolbox preserves exact results: phase 1
    partially aggregates on (user, salt) so one pathological hot
    user spreads over ``salt_factor`` reducers; phase 2 re-combines
    on the true key. Every aggregate re-combines exactly (counts and
    cents sums add; distinct types union through collected sets;
    min/max compose), so the output — and the DuckDB oracle — is
    IDENTICAL to the unsalted operator.

    When to deploy: Spark's partial aggregation already handles
    ordinary skew for algebraic aggs (see user_activity_summary's
    note); the explicit form is for extreme hot keys under
    memory-bounded partials or non-algebraic additions. This query
    exists so the pattern stays parity-tested end to end."""
    from selfhealingdatapipeline_gcp_spark.functions import skew

    salted = skew.with_salt(events, "user_id", salt_factor,
                            salt_source=F.col("event_id"))
    phase1 = (
        salted.groupBy("__salted_key")
        .agg(F.max("user_id").alias("user_id"),
             F.count(F.lit(1)).alias("n"),
             F.collect_set("event_type").alias("types"),
             F.sum(money.cents(F.col("value"))).alias("cents"),
             F.min("ts").alias("mn"),
             F.max("ts").alias("mx"),
             F.sum(F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0)).alias("purch"))
    )
    return (
        phase1.groupBy("user_id")
        .agg(F.sum("n").alias("n_events"),
             F.size(F.array_distinct(F.flatten(F.collect_list("types"))))
              .cast("bigint").alias("n_types"),
             (F.sum("cents") / 100.0).cast("double").alias("total_value"),
             F.min("mn").alias("first_seen"),
             F.max("mx").alias("last_seen"),
             F.sum("purch").alias("n_purchases"))
        .withColumn(
            "lifespan_s",
            F.round((F.unix_micros("last_seen")
                     - F.unix_micros("first_seen")) / 1e6, 6))
    )


def q7_nation_trade_volume(supplier: DataFrame, lineitem: DataFrame,
                           orders: DataFrame, customer: DataFrame,
                           nation: DataFrame) -> DataFrame:
    """TPC-H Q7 shape: shipped revenue between (supplier nation,
    customer nation) pairs per year. nation broadcast twice under
    different aliases; facts shuffle on their natural keys."""
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"),
                       F.col("n_name").alias("cust_nation"))
    return (
        lineitem
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(supplier.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(money.sum_revenue_e4(F.col("l_extendedprice"),
                                 F.col("l_discount")).alias("revenue"))
    )


def q8_brand_market_share(lineitem: DataFrame, part: DataFrame,
                          orders: DataFrame, customer: DataFrame,
                          nation: DataFrame, region: DataFrame,
                          brand: str = "Brand#1",
                          region_name: str = "ASIA") -> DataFrame:
    """TPC-H Q8 shape: one brand's share of a region's yearly revenue
    (conditional agg over the dim-enriched fact)."""
    rev_e4 = (money.cents(F.col("l_extendedprice"))
              * (100 - money.cents(F.col("l_discount"))))
    brand_e4 = F.when(F.col("p_brand") == brand, rev_e4).otherwise(F.lit(0))
    return (
        lineitem
        .join(F.broadcast(part.select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == region_name)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(brand_e4) / 10000.0).alias("brand_revenue"),
            (F.sum(rev_e4) / 10000.0).alias("total_revenue"),
        )
        .withColumn(
            "market_share_pct",
            money.trunc(F.col("brand_revenue") * 100.0
                        / F.col("total_revenue")))
    )


def event_value_percentiles(events: DataFrame) -> DataFrame:
    """Exact percentiles of event value per type (Spark percentile()
    and DuckDB quantile_cont share linear interpolation — verified
    bit-identical). Exact percentile = full sort per group; use
    approx_distinct_stats for the sketch path at scale."""
    return (
        events.groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.9).alias("p90"),
            F.percentile("value", 0.99).alias("p99"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
        )
    )


def approx_distinct_stats(events: DataFrame, rsd_sigma: float = 3.0,
                          accuracy: int = 1000) -> DataFrame:
    """Sketch-based aggregates (the 100 TB path): HyperLogLog++
    distinct counts and approximate percentiles — constant memory per
    group vs full sort/set — WITH their error-bound property gates
    (VERDICT r9 #5, upgraded from rows-only):

    - ``hll_ok``: |approx_users − exact_users| ≤ rsd_sigma · 0.05 ·
      exact_users (approx_count_distinct's documented default rsd is
      0.05; HLL++ is deterministic — hash-based, max-merge — so the
      boolean is stable across partitionings).
    - ``p90_ok``: approx_p90 lies between the EXACT values at ranks
      0.9n ∓ (n/accuracy + 1) — percentile_approx guarantees rank
      error ≤ n/accuracy under any merge order (Greenwald-Khanna),
      the ±1 padding absorbs boundary conventions, so the boolean
      holds by the algorithm's contract even where the raw estimate
      wobbles.

    The exact-rank bracket needs one per-event_type value sort — this
    relation is the sketch VERIFIER (same role as lsh_precision_report
    for banding); the production path at 100 TB reads the sketch
    columns alone and skips the bracket join."""
    sketch = (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
            F.percentile_approx("value", 0.9, accuracy).alias("approx_p90"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    pad = F.ceil(F.col("n") / accuracy) + 1
    bounds = sketch.select(
        "event_type",
        F.greatest(F.lit(1).cast("bigint"),
                   (F.floor(0.9 * F.col("n")) - pad).cast("bigint"))
         .alias("lo_rank"),
        F.least(F.col("n"),
                (F.ceil(0.9 * F.col("n")) + pad).cast("bigint"))
         .alias("hi_rank"))
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = (events.select("event_type", "value")
              .withColumn("r", F.row_number().over(w).cast("bigint")))
    bracket = (
        ranked.join(F.broadcast(bounds), "event_type")
        .filter((F.col("r") == F.col("lo_rank"))
                | (F.col("r") == F.col("hi_rank")))
        .groupBy("event_type")
        .agg(F.min("value").alias("v_lo"), F.max("value").alias("v_hi"))
    )
    return (
        sketch.join(bracket, "event_type")
        .select(
            "event_type", "approx_users", "exact_users", "approx_p90",
            (F.abs(F.col("approx_users") - F.col("exact_users"))
             <= F.lit(rsd_sigma * 0.05) * F.col("exact_users"))
             .alias("hll_ok"),
            ((F.col("approx_p90") >= F.col("v_lo"))
             & (F.col("approx_p90") <= F.col("v_hi"))).alias("p90_ok"))
    )


def parts_supplier_stats(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type,
    size) bucket, observed through lineitem. Distinct-agg shuffles on
    the group key; part stays broadcast."""
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"),
             F.count(F.lit(1)).alias("n_lines"))
    )


def q17_small_quantity_revenue(lineitem: DataFrame, part: DataFrame,
                               brand: str = "Brand#3") -> DataFrame:
    """TPC-H Q17 shape: revenue locked in small-quantity orders of one
    brand — lines with quantity < 20% of that part's average.

    The per-part average is a window over the part key (one shuffle),
    not a correlated subquery re-scan."""
    w = Window.partitionBy("l_partkey")
    lines = (
        lineitem
        .join(F.broadcast(part.select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("p_brand") == brand)
        # quantities are integer-valued: the window sum/count is exact
        .withColumn("part_qty_sum", F.sum("l_quantity").over(w))
        .withColumn("part_qty_n", F.count(F.lit(1)).over(w))
    )
    threshold = 0.2 * (F.col("part_qty_sum") / F.col("part_qty_n"))
    from selfhealingdatapipeline_gcp_spark.functions import money as _m
    return (
        lines
        .filter(F.col("l_quantity") < threshold)
        .agg(
            (F.sum(_m.cents(F.col("l_extendedprice"))) / 100.0 / 7.0)
            .alias("avg_yearly_raw"))
        .select(
            F.floor(F.col("avg_yearly_raw") * 100.0).cast("bigint")
             .alias("avg_yearly_cents"))
    )


def funnel_view_click_purchase(events: DataFrame) -> DataFrame:
    """Per-user conversion funnel: earliest view → first later click →
    first later purchase; counts per completed stage.

    One shuffle on user_id; stage ordering enforced by conditional
    min-timestamps (no self-joins, no per-user loops)."""
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts")))
             .alias("view_ts"),
        )
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("c_ts"))
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
    )
    first_click = (
        per_user.join(clicks, "user_id", "left")
        .filter(F.col("c_ts") > F.col("view_ts"))
        .groupBy("user_id", "view_ts")
        .agg(F.min("c_ts").alias("click_ts"))
    )
    first_purchase = (
        first_click.join(purchases, "user_id", "left")
        .filter(F.col("p_ts") > F.col("click_ts"))
        .groupBy("user_id", "view_ts", "click_ts")
        .agg(F.min("p_ts").alias("purchase_ts"))
    )
    viewed = per_user.filter(F.col("view_ts").isNotNull())
    return (
        viewed.select(F.lit("1_view").alias("stage"),
                      F.col("user_id"))
        .unionByName(first_click.select(F.lit("2_click").alias("stage"),
                                        F.col("user_id")))
        .unionByName(first_purchase.select(F.lit("3_purchase").alias("stage"),
                                           F.col("user_id")))
        .groupBy("stage")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def cube_orders_status_priority(orders: DataFrame) -> DataFrame:
    """CUBE over (status, priority): every grouping-set combination
    with labeled subtotals — the OLAP summary-table shape."""
    return (
        orders
        .cube("o_orderstatus", "o_orderpriority")
        .agg(money.sum_money(F.col("o_totalprice")).alias("revenue"),
             F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "revenue", "n_orders",
        )
    )


def event_props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured processing: parse the JSON ``props`` payload
    (get_json_object → typed column) and aggregate per event type.
    JSON parsing is JVM-side codegen — no Python in the row path."""
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        events
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
        .withColumn("avg_k",
                    F.floor(F.col("sum_k") * 1e4 / F.col("n_events")) / 1e4)
    )


def customers_without_orders(customer: DataFrame,
                             orders: DataFrame) -> DataFrame:
    """Set-difference shape: customers that never ordered
    (left_anti join — the scalable EXCEPT)."""
    return (
        customer
        .join(orders.select("o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def missing_order_days(orders: DataFrame) -> DataFrame:
    """Calendar-gap detection: days in [min, max] with no orders.

    The calendar is generated from the data's own bounds (sequence +
    explode — one row per day, trivially small) and anti-joined
    against the observed days."""
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("d_min"),
        F.max(F.to_date("o_orderdate")).alias("d_max"))
    calendar = bounds.select(
        F.explode(F.sequence("d_min", "d_max")).alias("d"))
    observed = orders.select(F.to_date("o_orderdate").alias("d")).distinct()
    return (
        calendar.join(observed, "d", "left_anti")
    )


def _gap_seconds(gap: str) -> int:
    """Parse a '30 minutes'-style interval literal to seconds."""
    qty, unit = gap.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600}[unit]
    return int(qty) * mult


def _sessionize(events: DataFrame, gap: str,
                bucket: str | None) -> DataFrame:
    """Sessions per user → (user_id, s_start, s_end, n_events).

    ``bucket=None``: one session_window aggregation shuffling on raw
    user_id — fine until one user dominates a partition.

    ``bucket='hour'`` (default): skew-safe two-level cascade. Level 1
    sessionizes within (user_id, time-bucket) — the shuffle key is the
    composite, so a hot user's events spread over its active buckets.
    Level 2 merges adjacent SEGMENTS (gap between consecutive segments
    < ``gap``) with a window at segment grain — per user that's at
    most a few rows per active bucket, orders of magnitude below event
    grain. Exact: within a segment consecutive events are < gap apart
    by construction, so only segment boundaries can break sessions,
    and the level-2 lag sees every boundary."""
    if bucket is None:
        return (
            events
            .groupBy("user_id", F.session_window("ts", gap))
            .agg(
                F.min("ts").alias("s_start"),
                F.max("ts").alias("s_end"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select("user_id", "s_start", "s_end", "n_events")
        )
    seg = (
        events
        .groupBy("user_id", F.date_trunc(bucket, "ts").alias("b"),
                 F.session_window("ts", gap))
        .agg(
            F.min("ts").alias("s_start"),
            F.max("ts").alias("s_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    # segment starts are unique per user (buckets cover disjoint time
    # ranges; within a bucket segments are disjoint), so the order is
    # total and the running sum deterministic
    w = Window.partitionBy("user_id").orderBy("s_start")
    gap_us = _gap_seconds(gap) * 1_000_000
    brk = (
        F.col("prev_end").isNull()
        | ((F.unix_micros("s_start") - F.unix_micros("prev_end"))
           >= gap_us)
    ).cast("int")
    return (
        seg
        .select("user_id", "s_start", "s_end", "n_events",
                F.lag("s_end").over(w).alias("prev_end"))
        .withColumn("sid", F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(F.min("s_start").alias("s_start"),
             F.max("s_end").alias("s_end"),
             F.sum("n_events").alias("n_events"))
        .select("user_id", "s_start", "s_end", "n_events")
    )


def session_duration_stats(events: DataFrame,
                           gap: str = "30 minutes",
                           bucket: str | None = "hour") -> DataFrame:
    """Session-level corpus stats: sessionize, then duration/size
    distribution — the engagement summary every event pipeline
    reports. Sessionization is the skew-safe bucketed cascade by
    default (see _sessionize); ``bucket=None`` restores the
    single-shuffle form."""
    sess = _sessionize(events, gap, bucket)
    dur = (F.unix_micros("s_end") - F.unix_micros("s_start")) / 1e6
    return sess.select(dur.alias("dur_s"), "n_events").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("bigint")).alias("n_singleton"),
        F.percentile("dur_s", 0.5).alias("p50_duration_s"),
        F.percentile("dur_s", 0.9).alias("p90_duration_s"),
        F.max("dur_s").alias("max_duration_s"),
        F.percentile("n_events", 0.9).alias("p90_events"),
    )


def sliding_event_rate(events: DataFrame) -> DataFrame:
    """Sliding-window event rate: 1-hour windows sliding every 15
    minutes (each event lands in 4 windows). The batch form of the
    streaming sliding aggregation — window() explodes memberships,
    then one groupBy; windows align to the unix epoch."""
    return (
        events
        .groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.countDistinct("user_id").alias("n_users"))
        .select(F.col("window.start").alias("window_start"),
                "n_events", "n_users")
    )


def hypertable_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style cascading time rollup (the continuous-
    aggregate pattern): minute-grain partial aggregates computed from
    raw events ONCE, hour aggregates re-aggregated from the minute
    grain, day aggregates from the hour grain. At 100 TB only the
    finest grain ever scans raw data — each coarser level reduces a
    relation ~60× smaller than the one below it, and sum-of-sums /
    min-of-mins / max-of-maxes compose exactly (integer cents, no
    double drift). Output: one long relation tagged by grain.
    """
    minute = (
        events
        .groupBy(F.date_trunc("minute", F.col("ts")).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money.cents(F.col("value"))).alias("sum_value_c"),
            F.min(money.cents(F.col("value"))).alias("min_value_c"),
            F.max(money.cents(F.col("value"))).alias("max_value_c"),
        )
    )
    def cascade(finer: DataFrame, grain: str) -> DataFrame:
        return (
            finer
            .groupBy(F.date_trunc(grain, F.col("bucket")).alias("bucket"))
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value_c").alias("sum_value_c"),
                F.min("min_value_c").alias("min_value_c"),
                F.max("max_value_c").alias("max_value_c"),
            )
        )
    hour = cascade(minute, "hour")
    day = cascade(hour, "day")
    def tag(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"), "bucket", "n_events",
            (F.col("sum_value_c") / 100.0).alias("sum_value"),
            (F.col("min_value_c") / 100.0).alias("min_value"),
            (F.col("max_value_c") / 100.0).alias("max_value"),
        )
    return (
        tag(minute, "minute")
        .unionByName(tag(hour, "hour"))
        .unionByName(tag(day, "day"))
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    distinct active users per (cohort, week offset), retention as a
    share of cohort size. Three shrinking aggregations — (user, week)
    distinct, per-user min, per-cohort counts — all keyed on user_id
    until the final tiny cohort grain; the cohort-size join is
    broadcast (one row per cohort week)."""
    weeks = events.select(
        "user_id",
        F.to_date(F.date_trunc("week", F.col("ts"))).alias("w"),
    ).distinct()
    first = weeks.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    j = weeks.join(first, "user_id")
    offset = (F.datediff(F.col("w"), F.col("cohort_week")) / 7).cast("int")
    per = (
        j.groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    size = (
        per.filter(F.col("week_offset") == 0)
        .select("cohort_week", F.col("n_users").alias("cohort_size"))
    )
    return (
        per.join(F.broadcast(size), "cohort_week")
        .select(
            "cohort_week", "week_offset", "n_users", "cohort_size",
            money.trunc(F.col("n_users") * 100.0 / F.col("cohort_size"))
             .alias("retention_pct"),
        )
    )


def customer_rfm(orders: DataFrame) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary) with
    quartile scores from EXACT percentile boundaries instead of a
    global ntile window — ntile would single-partition-sort every
    customer (a scale-killer at 10^9 customers); three 1-row percentile
    aggregates broadcast back over the scan instead (same Spark
    percentile ↔ DuckDB quantile_cont bit-parity as
    event_value_percentiles). Money in exact integer cents."""
    anchor = orders.agg(F.max(F.to_date("o_orderdate")).alias("anchor"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.max(F.to_date("o_orderdate")).alias("last_order"),
             F.count(F.lit(1)).alias("frequency"),
             F.sum(money.cents(F.col("o_totalprice"))).alias("mon_c"))
        .crossJoin(F.broadcast(anchor))
        .select("o_custkey",
                F.datediff("anchor", "last_order").alias("recency_days"),
                "frequency",
                (F.col("mon_c") / 100.0).alias("monetary"))
    )
    bounds = per_cust.agg(
        F.percentile("recency_days", 0.25).alias("r25"),
        F.percentile("recency_days", 0.5).alias("r50"),
        F.percentile("recency_days", 0.75).alias("r75"),
        F.percentile("frequency", 0.25).alias("f25"),
        F.percentile("frequency", 0.5).alias("f50"),
        F.percentile("frequency", 0.75).alias("f75"),
        F.percentile("monetary", 0.25).alias("m25"),
        F.percentile("monetary", 0.5).alias("m50"),
        F.percentile("monetary", 0.75).alias("m75"),
    )

    def low_good(c, lo, mid, hi):  # recency: smaller is better
        return (F.when(F.col(c) <= F.col(lo), 4)
                 .when(F.col(c) <= F.col(mid), 3)
                 .when(F.col(c) <= F.col(hi), 2).otherwise(1))

    def high_good(c, lo, mid, hi):
        return (F.when(F.col(c) <= F.col(lo), 1)
                 .when(F.col(c) <= F.col(mid), 2)
                 .when(F.col(c) <= F.col(hi), 3).otherwise(4))

    return (
        per_cust.crossJoin(F.broadcast(bounds))
        .select(
            "o_custkey", "recency_days", "frequency", "monetary",
            low_good("recency_days", "r25", "r50", "r75").alias("r_score"),
            high_good("frequency", "f25", "f50", "f75").alias("f_score"),
            high_good("monetary", "m25", "m50", "m75").alias("m_score"),
        )
        .withColumn("rfm",
                    F.concat_ws("", "r_score", "f_score", "m_score"))
    )


def event_transition_matrix(events: DataFrame, k: int = 50,
                            bucket: str | None = "hour") -> DataFrame:
    """Top event-type transition pairs per user journey (the bigram
    matrix behind funnel design: which step actually follows which).
    (ts, event_id) tiebreak so the sequence is total and engine-
    independent; the transition counts partial-aggregate map-side.
    Top-k via TakeOrderedAndProject, no global sort.

    Skew-safe by default: the sequence window partitions on
    (user_id, time-bucket), so a hot user's events spread over its
    active buckets instead of landing in one window task. Within-
    bucket transitions come from the local lead; boundary transitions
    from a bucket-grain stitch — per-(user, bucket) first/last events
    via algebraic min/max of a (ts, event_id, type) struct (computed
    on the window output, so the exchange is reused and the groupBy
    adds no shuffle), then a lead at bucket grain (rows = active
    buckets per user, not events). Exact: per user, within-bucket
    pairs (Σ n_b − 1) + boundary pairs (#buckets − 1) = n − 1.
    ``bucket=None`` restores the single-window form."""
    if bucket is None:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        pairs = (
            events
            .select("user_id", "ts", "event_id", "event_type",
                    F.lead("event_type", 1).over(w).alias("next_type"))
            .filter(F.col("next_type").isNotNull())
            .select("event_type", "next_type")
        )
    else:
        wl = Window.partitionBy("user_id", "b").orderBy("ts", "event_id")
        local = (
            events
            .select("user_id", F.date_trunc(bucket, "ts").alias("b"),
                    "ts", "event_id", "event_type")
            .withColumn("next_type", F.lead("event_type", 1).over(wl))
        )
        within = (local.filter(F.col("next_type").isNotNull())
                  .select("event_type", "next_type"))
        edges = (
            local.groupBy("user_id", "b")
            .agg(F.min(F.struct("ts", "event_id", "event_type"))
                  .alias("first"),
                 F.max(F.struct("ts", "event_id", "event_type"))
                  .alias("last"))
        )
        wb = Window.partitionBy("user_id").orderBy("b")
        boundary = (
            edges
            .select(F.col("last").getField("event_type")
                     .alias("event_type"),
                    F.lead(F.col("first").getField("event_type"), 1)
                     .over(wb).alias("next_type"))
            .filter(F.col("next_type").isNotNull())
        )
        pairs = within.unionByName(boundary)
    return (
        pairs.groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy(F.desc("n_transitions"), "event_type", "next_type")
        .limit(k)
    )


def source_token_stats(documents: DataFrame) -> DataFrame:
    """Per-source corpus profile (docs, token and char volume, average
    doc length) — the table a source_mixing_plan reads when deciding
    sampling rates. One groupBy on source; token counts are
    size(tokens) at scan grain, so the shuffle carries one row per
    source."""
    from selfhealingdatapipeline_gcp_spark.functions import textfn
    toks = F.size(textfn.tokens("text"))
    return (
        documents
        .select("source", toks.alias("n_tokens"), "n_chars")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            (F.floor(F.sum("n_tokens") * 1e4 / F.count(F.lit(1))) / 1e4)
             .alias("avg_tokens_per_doc"),
        )
    )


def brand_price_trend(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Per-brand monthly revenue trend as an OLS slope computed from
    EXACT integer sums: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    with x = months since the corpus's first ship month (small ints)
    and y = monthly revenue in whole dollars (int64-safe products).
    Keeping every accumulator integral makes the slope bit-identical
    across engines — engine-native regr_slope() accumulates doubles
    in engine order and drifts. Two grain-reducing aggregations
    (month, then brand) + a 1-row anchor broadcast; no wide state."""
    m = (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
    monthly = (
        lineitem
        .join(F.broadcast(part.select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"), m.alias("am"))
        .agg(F.floor(F.sum(money.cents(F.col("l_extendedprice"))) / 100)
              .cast("bigint").alias("y"))
    )
    base = monthly.agg(F.min("am").alias("m0"))
    pts = (monthly.crossJoin(F.broadcast(base))
           .select("brand", (F.col("am") - F.col("m0")).alias("x"), "y"))
    agg = pts.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]
    den = agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]
    return (
        agg.select(
            "brand",
            F.col("n").alias("n_months"),
            (F.col("sy") * 1.0 / F.col("n")).alias("avg_monthly_revenue"),
            F.when(den != 0, F.floor(num * 1e4 / den) / 1e4)
             .otherwise(F.lit(0.0)).alias("slope_dollars_per_month"),
        )
    )


def supplier_concentration_hhi(lineitem: DataFrame,
                               supplier: DataFrame,
                               nation: DataFrame) -> DataFrame:
    """Supplier-concentration Herfindahl index per nation: HHI =
    Σ share² over each nation's suppliers. Revenue reduces to whole
    dollars (int64-safe squares to ~sf30; DECIMAL(38,0) — unbounded —
    under money.set_decimal_mode) at supplier grain, then
    one more grain reduction to nations — HHI = Σd² / (Σd)² as a
    single division of exact integers, floor-truncated at 1e6.
    Flags nations where one supplier dominates the flow (the
    concentration-risk counterpart of key_skew_profile)."""
    per_supp = (
        lineitem
        .groupBy("l_suppkey")
        .agg(F.floor(F.sum(money.cents(F.col("l_extendedprice"))) / 100)
              .cast("bigint").alias("d"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        per_supp
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"),
             F.sum("d").alias("total_d"),
             # money.sum_sq: int64 to ~sf30, DECIMAL(38,0) (unbounded
             # at any plausible SF) when set_decimal_mode(True)
             money.sum_sq(F.col("d")).alias("sum_d2"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            (F.col("total_d") * 1.0).alias("total_dollars"),
            F.when(F.col("total_d") > 0,
                   F.floor(F.col("sum_d2") * 1e6
                           / (F.col("total_d").cast("double")
                              * F.col("total_d").cast("double"))) / 1e6)
             .otherwise(F.lit(0.0)).alias("hhi"),
        )
    )


def brand_affinity(lineitem: DataFrame, part: DataFrame,
                   min_pair_orders: int = 5) -> DataFrame:
    """Market-basket brand affinity: support, confidence and lift for
    every brand PAIR co-appearing in orders — the association-mining
    family (cross-sell/assortment analytics; lift ≫ 1 = brands
    bought together beyond chance, ≪ 1 = substitutes).

    Scale shape: facts reduce to DISTINCT (order, brand) — one
    shuffle, 25 brands cap the per-order set — then per-order sorted
    brand sets emit pairs via two generators (the join-free
    bucket-grouped discipline; ≤ C(25,2) pairs per order, O(brand²)
    output forever). Counts are exact integers; lift/support are
    single fixed-order double expressions over them (identical IEEE
    sequence in the oracle — no summation, no drift), floored at e6."""
    ob = (
        lineitem.join(F.broadcast(part.select("p_partkey", "p_brand")),
                      F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("okey"),
                F.col("p_brand").alias("brand"))
        .distinct()
    )
    per_brand = ob.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n_orders"))
    total = ob.agg(F.countDistinct("okey").alias("n_total"))
    sets_ = ob.groupBy("okey").agg(
        F.sort_array(F.collect_set("brand")).alias("brands"))
    pairs = (
        sets_
        .select("okey", F.explode("brands").alias("brand_a"), "brands")
        .select("okey", "brand_a",
                F.explode(F.filter(
                    "brands", lambda b: b > F.col("brand_a")))
                 .alias("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nab = F.col("n_both").cast("double")
    nt = F.col("n_total").cast("double")
    return (
        pairs
        .join(F.broadcast(per_brand.select(
            F.col("brand").alias("brand_a"),
            F.col("n_orders").alias("n_a"))), "brand_a")
        .join(F.broadcast(per_brand.select(
            F.col("brand").alias("brand_b"),
            F.col("n_orders").alias("n_b"))), "brand_b")
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_both") >= min_pair_orders)
        .select(
            "brand_a", "brand_b", "n_both", "n_a", "n_b",
            F.floor(nab * 1e6 / nt).cast("bigint").alias("support_e6"),
            F.floor(nab * 1e6 / na).cast("bigint")
             .alias("confidence_a_to_b_e6"),
            F.floor(nab * nt / (na * nb) * 1e6).cast("bigint")
             .alias("lift_e6"),
        )
    )


def event_hourly_heatmap(events: DataFrame) -> DataFrame:
    """Day-of-week × hour activity heatmap (the ops-dashboard
    staple): one grain-reducing groupBy with map-side combine; the
    output is a constant 168 rows at any scale. dayofweek follows
    the ANSI 1=Sunday convention in both engines."""
    return (
        events
        .groupBy(F.dayofweek("ts").alias("dow"),
                 F.hour("ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.floor(F.col("value") * 1e6).cast("bigint"))
              .alias("__v_u"))
        .select("dow", "hour", "n_events",
                (F.col("__v_u") / 1e6).alias("total_value"))
    )


def event_trigram_paths(events: DataFrame,
                        bucket: str = "day") -> DataFrame:
    """Three-step user journeys: counts and shares of every observed
    (step_1 → step_2 → step_3) event-type sequence — one level past
    event_transition_matrix's bigrams, the relation funnel DESIGN
    reads (the bigram matrix says what follows a click; the trigram
    table says whether view→click→purchase actually happens as one
    path or via a detour). Output is bounded by |event_types|³, so
    the full matrix is emitted (no top-k tie ambiguity).

    Skew-safe like the transition matrix, one order deeper: the
    sequence window partitions on (user_id, time-bucket) so a hot
    user spreads over its active buckets. Within-bucket trigrams
    come from the local lead1/lead2. Trigrams that SPAN buckets are
    recovered from a per-bucket BOUNDARY ZONE — each bucket's first
    two and last two events (≤ 4 rows per active bucket, distinct) —
    re-sequenced per user: a spanning trigram's members are
    necessarily within their buckets' first/last two, it stays
    consecutive in the zone subsequence, and zone trigrams whose
    three members share a bucket are exactly the ones the local pass
    already counted (dropped by the bucket filter). The zone window
    runs over O(active buckets) rows, never events. Exact: per user,
    local (Σ max(n_b − 2, 0)) + spanning = n − 2.

    The oracle is the naive single-window form — semantically equal
    by construction (the user_activity_salted discipline: the
    skew-safe plan must be value-invisible)."""
    ev = events.select("user_id", F.date_trunc(bucket, "ts").alias("b"),
                       "ts", "event_id", "event_type")
    wl = Window.partitionBy("user_id", "b").orderBy("ts", "event_id")
    local = (
        ev.withColumn("t2", F.lead("event_type", 1).over(wl))
          .withColumn("t3", F.lead("event_type", 2).over(wl))
          .withColumn("__rn", F.row_number().over(wl))
          .withColumn("__nb", F.count(F.lit(1)).over(
              Window.partitionBy("user_id", "b")))
    )
    within = (local.filter(F.col("t3").isNotNull())
              .select(F.col("event_type").alias("step_1"),
                      F.col("t2").alias("step_2"),
                      F.col("t3").alias("step_3")))
    zone = (local.filter((F.col("__rn") <= 2)
                         | (F.col("__rn") >= F.col("__nb") - 1))
            .select("user_id", "b", "ts", "event_id", "event_type"))
    wz = Window.partitionBy("user_id").orderBy("ts", "event_id")
    spanning = (
        zone.withColumn("t2", F.lead("event_type", 1).over(wz))
            .withColumn("t3", F.lead("event_type", 2).over(wz))
            .withColumn("b2", F.lead("b", 1).over(wz))
            .withColumn("b3", F.lead("b", 2).over(wz))
            .filter(F.col("t3").isNotNull()
                    & ~((F.col("b") == F.col("b2"))
                        & (F.col("b2") == F.col("b3"))))
            .select(F.col("event_type").alias("step_1"),
                    F.col("t2").alias("step_2"),
                    F.col("t3").alias("step_3")))
    tri = within.unionByName(spanning)
    agg = tri.groupBy("step_1", "step_2", "step_3").agg(
        F.count(F.lit(1)).alias("n_paths"))
    tot = agg.agg(F.sum("n_paths").alias("__total"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select("step_1", "step_2", "step_3", "n_paths",
                F.floor(F.col("n_paths") * 1e6 / F.col("__total"))
                 .cast("bigint").alias("share_e6"))
    )


def funnel_time_to_convert(events: DataFrame) -> DataFrame:
    """View→purchase conversion LATENCY: funnel_view_click_purchase
    counts who converts; the reference's SLA detector asks how LONG
    (/root/reference/monitoring/detectors/sla_detector.py frames
    processing velocity the same way). Per user: earliest view, first
    strictly-later purchase; one row of conversion rate + latency
    percentiles in whole seconds.

    Determinism: latency is an exact bigint microsecond difference
    floored to seconds BEFORE aggregation; percentiles interpolate
    over those integers (Spark percentile == DuckDB quantile_cont),
    then floor back to bigint seconds.

    Scale shape: one shuffle on user_id for the earliest-view agg,
    one shuffled join user_id→purchases (AQE-broadcast when the
    viewer relation is small), one global agg whose partials are six
    numbers per task; the percentile state is per-user-bounded, not
    corpus-bounded."""
    first_view = (
        events.groupBy("user_id")
        .agg(F.min(F.when(F.col("event_type") == "view", F.col("ts")))
              .alias("view_ts"))
        .filter(F.col("view_ts").isNotNull())
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
    )
    conv = (
        first_view.join(purchases, "user_id", "left")
        .filter(F.col("p_ts") > F.col("view_ts"))
        .groupBy("user_id", "view_ts")
        .agg(F.min("p_ts").alias("purchase_ts"))
        .select(
            "user_id",
            F.floor((F.unix_micros("purchase_ts")
                     - F.unix_micros("view_ts")) / 1_000_000)
             .cast("bigint").alias("lat_s"))
    )
    n_viewers = first_view.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_viewers"))
    return (
        conv.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_converters"),
            F.floor(F.percentile("lat_s", 0.5)).cast("bigint")
             .alias("p50_latency_s"),
            F.floor(F.percentile("lat_s", 0.9)).cast("bigint")
             .alias("p90_latency_s"),
            F.floor(F.avg("lat_s")).cast("bigint").alias("mean_latency_s"))
        .crossJoin(F.broadcast(n_viewers))
        .select(
            "n_viewers", "n_converters",
            F.floor(F.col("n_converters") * 1e6 / F.col("n_viewers"))
             .cast("bigint").alias("conversion_e6"),
            "p50_latency_s", "p90_latency_s", "mean_latency_s")
    )


def event_audience_overlap(events: DataFrame) -> DataFrame:
    """Pairwise Jaccard overlap of the USER audiences behind each
    event type — the segmentation companion to
    event_transition_matrix (which chains events within a user;
    this asks whether two event types even share users). A
    purchase/error overlap spike is an incident signal the per-type
    volume detectors cannot see.

    Determinism: set sizes and intersections are exact distinct
    counts; jaccard floors to e6.

    Scale shape: the corpus collapses map-side to the distinct
    (event_type, user_id) relation (one shuffle on user_id); pair
    generation is a per-user explosion bounded by |types|² — with T
    event types a user contributes at most T(T−1)/2 pairs, so the
    pair relation is O(users·T²), never corpus². Per-type sizes ride
    the same distinct relation and broadcast onto the pair
    aggregate (O(T) rows)."""
    tu = events.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"))
    per_user = tu.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("types"))
    pairs = per_user.select(
        F.explode(F.filter(
            F.flatten(F.transform(
                F.col("types"),
                lambda a: F.transform(F.col("types"),
                                      lambda b: F.struct(
                                          a.alias("type_a"),
                                          b.alias("type_b"))))),
            lambda p: p["type_a"] < p["type_b"])).alias("p"))
    inter = (pairs.groupBy(F.col("p.type_a").alias("type_a"),
                           F.col("p.type_b").alias("type_b"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_both")))
    sa = sizes.select(F.col("event_type").alias("type_a"),
                      F.col("n_users").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"),
                      F.col("n_users").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a", "type_b", "n_a", "n_b", "n_both",
            F.floor(F.col("n_both") * 1e6
                    / (F.col("n_a") + F.col("n_b") - F.col("n_both")))
             .cast("bigint").alias("jaccard_e6"))
    )


def series_downsample_m4(events: DataFrame, n_buckets: int = 256
                         ) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014 — the
    standard error-free line-chart reduction): per event type, bucket
    the time axis into ``n_buckets`` equal-width spans and keep only
    each bucket's FIRST, LAST, MIN-value and MAX-value points — the
    four points per pixel column that reproduce the rendered line
    exactly, turning a billion-point series into ≤ 4·W·|types| rows
    for a dashboard. This is the read-side companion of
    hypertable_rollup (which aggregates; M4 selects witnesses).

    Determinism: bucket assignment is integer arithmetic over the
    broadcast per-type time bounds; every role picks its witness by
    row_number over a TOTAL order ((value, ts, id) for min, value
    descending first for max, (ts, id) for first/last) so ties can
    never flip between runs or engines.

    Scale shape: one shuffle on (type, bucket) — the four role
    windows share that partitioning (single Exchange, four sorts over
    pixel-column-sized groups); output is plan-constant per pixel
    budget regardless of corpus size."""
    t_us = F.unix_micros(F.col("ts"))
    v_c = F.round(F.col("value") * 100, 0).cast("bigint")
    bounds = (events.groupBy("event_type")
              .agg(F.min(t_us).alias("t0"), F.max(t_us).alias("t1")))
    bkt = F.floor((t_us - F.col("t0")) * n_buckets
                  / (F.col("t1") - F.col("t0") + 1)).cast("int")
    base = (
        events.join(F.broadcast(bounds), "event_type")
        .select("event_type", t_us.alias("t_us"), v_c.alias("v_c"),
                F.col("event_id").cast("bigint").alias("eid"),
                bkt.alias("bkt"))
    )
    orders = {
        "first": [F.col("t_us").asc(), F.col("eid").asc()],
        "last": [F.col("t_us").desc(), F.col("eid").desc()],
        "min": [F.col("v_c").asc(), F.col("t_us").asc(),
                F.col("eid").asc()],
        "max": [F.col("v_c").desc(), F.col("t_us").asc(),
                F.col("eid").asc()],
    }
    parts = []
    for role, order in orders.items():
        w = Window.partitionBy("event_type", "bkt").orderBy(*order)
        parts.append(
            base.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("event_type", "bkt", F.lit(role).alias("role"),
                    "t_us", "v_c", "eid"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def supplier_scorecard(lineitem: DataFrame, supplier: DataFrame,
                       nation: DataFrame) -> DataFrame:
    """Per-supplier fulfillment scorecard: line count, exact revenue,
    return rate (returnflag = 'R' share, floor-e6), distinct parts
    carried, and mean discount (floor-e4) — the vendor-health
    dashboard the reference's revenue_breakdown slices by region ×
    brand, re-cut along the supply axis (revenue_detector.py:171's
    breakdown family). One lineitem shuffle on l_suppkey (map-side
    partials; the distinct-parts agg rides the same grain), then a
    join to the supplier dim (broadcast at test SF — supplier grows
    with SF but stays ~1e-4 of lineitem, AQE decides at scale) and
    the constant nation dim."""
    per_supp = (
        lineitem.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"),
             money.sum_revenue_e4(F.col("l_extendedprice"),
                                  F.col("l_discount")).alias("revenue"),
             F.sum((F.col("l_returnflag") == "R").cast("bigint"))
              .cast("bigint").alias("n_returned"),
             F.countDistinct("l_partkey").cast("bigint")
              .alias("n_distinct_parts"),
             F.sum(money.cents(F.col("l_discount"))).cast("bigint")
              .alias("disc_c"))
    )
    return (
        per_supp
        .join(F.broadcast(supplier.select("s_suppkey", "s_name",
                                          "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("s_suppkey").alias("supplier_key"),
            F.col("s_name").alias("supplier_name"),
            F.col("n_name").alias("nation"),
            "n_lines", "revenue", "n_distinct_parts",
            F.floor(F.col("n_returned") * 1_000_000 / F.col("n_lines"))
             .cast("bigint").alias("return_rate_e6"),
            # mean discount in e4: disc_c is e2 per line; ×100 / n
            F.floor(F.col("disc_c") * 100 / F.col("n_lines"))
             .cast("bigint").alias("avg_discount_e4"))
    )
