"""TPC-H-shape analytics beyond the reference's own query surface —
the classic warehouse patterns a user migrating off the reference
will reach for next: multi-way profit joins, global-threshold
filters, outer-join distributions, argmax-with-ties, bracketed OR
predicates, anti-join cohorts.

Schema notes: the test tables omit partsupp/shipmode/receiptdate/
phone, so Q9/Q11/Q22 keep the reference plan SHAPE with documented
substitutions (cost proxy = 50% of p_retailprice; inventory derived
from lineitem; market segment instead of phone country code). Money
follows functions/money.py exactly (integer cents, floor-trunc).

Scale design: every dim joins broadcast; global scalars (thresholds,
maxima, averages) are 1-row aggregates broadcast-cross-joined — one
extra scan-level reduction, never a driver round-trip; fact-fact
joins shuffle on their keys only after scan-level filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from selfhealingdatapipeline_gcp_spark.functions import money


def q9_profit_by_nation_year(lineitem: DataFrame, part: DataFrame,
                             supplier: DataFrame, orders: DataFrame,
                             nation: DataFrame,
                             name_like: str = "%ar%") -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per order-year for
    parts matching a name substring. Cost proxy = 50% of retail price
    × quantity (no partsupp table). amount stays an exact e4 integer
    per row; the LIKE filter prunes parts BEFORE the broadcast."""
    p = part.filter(F.col("p_name").like(name_like)) \
            .select("p_partkey", "p_retailprice")
    profit_e4 = (
        money.cents(F.col("l_extendedprice"))
        * (100 - money.cents(F.col("l_discount")))
        - money.cents(F.col("p_retailprice")) * 50
        * F.round(F.col("l_quantity")).cast("bigint")
    )
    return (
        lineitem
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("int").alias("o_year"))
        .agg((F.sum(profit_e4) / 1e4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q11_important_parts(lineitem: DataFrame, part: DataFrame,
                        mean_multiple: float = 1.5) -> DataFrame:
    """TPC-H Q11 shape: parts whose (lineitem-derived) inventory value
    exceeds ``mean_multiple`` × the MEAN per-part value. TPC-H's own
    threshold is SF-dependent (0.0001/SF) precisely because an
    absolute share tightens as the corpus grows; thresholding against
    the mean keeps the selectivity (~top 1–2% of parts) stable at any
    scale. The global total+count is a 1-row aggregate broadcast into
    the per-part relation — the scalar-subquery pattern without any
    driver round-trip. The threshold double is derived identically
    from exact integers on both engines, so the comparison cannot
    drift."""
    vals = (
        lineitem
        .join(F.broadcast(part.select("p_partkey", "p_retailprice")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey")
        .agg(F.sum(money.cents(F.col("p_retailprice"))
                   * F.round(F.col("l_quantity")).cast("bigint"))
              .alias("value_c"))
    )
    total = vals.agg(F.sum("value_c").alias("total_c"),
                     F.count(F.lit(1)).alias("n_parts"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("value_c")
                > F.col("total_c") / F.col("n_parts") * mean_multiple)
        .select("p_partkey", (F.col("value_c") / 100.0).alias("value"))
        .orderBy(F.desc("value"), "p_partkey")
    )


def q13_customer_distribution(customer: DataFrame,
                              orders: DataFrame) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer including the
    zero bucket (LEFT JOIN, count non-null keys, then re-aggregate).
    Two shuffles on shrinking grains — custkey then count."""
    per_cust = (
        customer.select("c_custkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q15_top_supplier(lineitem: DataFrame, supplier: DataFrame,
                     date_lo: str = "1997-01-01",
                     date_hi: str = "1997-04-01") -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue —
    argmax with ties via a broadcast 1-row max joined back on exact
    e4 revenue integers (double equality would be engine-fragile;
    integer equality is not)."""
    rev = (
        lineitem
        .filter((F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
                & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp")))
        .groupBy("l_suppkey")
        .agg(F.sum(money.cents(F.col("l_extendedprice"))
                   * (100 - money.cents(F.col("l_discount"))))
              .alias("rev_e4"))
    )
    top = rev.agg(F.max("rev_e4").alias("max_e4"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("rev_e4") == F.col("max_e4"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("s_suppkey"), F.col("s_name"),
                (F.col("rev_e4") / 1e4).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


def q19_bracket_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue over an OR of three (brand, size,
    quantity) brackets. The whole predicate is one scan-level filter
    after a broadcast part join — Catalyst pushes the part-only
    conjuncts (brand, size) into the broadcast build side."""
    qty = F.col("l_quantity")
    size = F.col("p_size")
    brackets = (
        ((F.col("p_brand") == "Brand#1") & size.between(1, 15)
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & size.between(1, 25)
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & size.between(1, 50)
           & qty.between(20, 30))
    )
    return (
        lineitem
        .join(F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .filter(brackets)
        .agg(money.sum_revenue_e4(F.col("l_extendedprice"),
                                  F.col("l_discount")).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


def q22_dormant_customers(customer: DataFrame, orders: DataFrame,
                          window_days: int = 180) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers with no RECENT orders
    (trailing ``window_days`` from the order anchor — every customer
    in this corpus has some lifetime order, so "dormant" is recency-
    scoped), grouped by market segment (stands in for phone country
    code). The average balance is a broadcast 1-row scalar over
    positive balances; the no-recent-orders check is a left_anti join
    against the windowed orders — never a count subquery per row."""
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(money.cents(F.col("c_acctbal")))
              / (100.0 * F.count(F.lit(1)))).alias("avg_bal"))
    )
    anchor = orders.agg(F.max("o_orderdate").alias("anchor"))
    recent = (
        orders.crossJoin(F.broadcast(anchor))
        .filter(F.col("o_orderdate")
                > F.col("anchor") - F.expr(f"INTERVAL {window_days} DAYS"))
        .select("o_custkey")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_custs"),
             money.sum_money(F.col("c_acctbal")).alias("total_acctbal"))
        .orderBy("segment")
    )


def q2_cheapest_supplier(lineitem: DataFrame, part: DataFrame,
                         supplier: DataFrame, k: int = 100) -> DataFrame:
    """TPC-H Q2 shape: the minimum-cost supplier per part (argmin join
    with deterministic tie-break). The dataset has no partsupp table,
    so the offer price proxies supply cost: the cheapest observed
    lineitem extendedprice per (part, supplier).

    Scale shape: one groupBy shuffle on (partkey, suppkey) with
    map-side partial min, then a window argmin partitioned on the
    SAME leading key (no second shuffle of the big relation under
    AQE's partial-clustering reuse), then two broadcast dim joins.
    Integer-cents min (double min would tie-break engine-fragile)."""
    offer = (
        lineitem
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(money.cents(F.col("l_extendedprice"))).alias("offer_e2"))
    )
    w = Window.partitionBy("l_partkey").orderBy("offer_e2", "l_suppkey")
    best = (
        offer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        best
        .join(F.broadcast(part.select("p_partkey", "p_brand", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_brand", "p_type", "s_suppkey", "s_name",
                (F.col("offer_e2") / 100.0).alias("best_price"))
        .orderBy("p_partkey")
        .limit(k)
    )
