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


def q12_ship_delay_priority(lineitem: DataFrame, orders: DataFrame,
                            year: int = 1997) -> DataFrame:
    """TPC-H Q12 shape: line counts split into priority classes per
    shipping bucket. The dataset has no l_shipmode/l_receiptdate, so
    the ship DELAY bucket (days from order date to ship date: 0-29,
    30-59, 60+) plays the shipmode role — same join + CASE-sum
    conditional aggregation plan.

    Scale shape: fact⋈fact on the order key (neither side
    broadcastable at real SF; the year filter prunes lineitem at scan
    level first), then a 3-group aggregate — map-side partial sums,
    3-row result. The year filter is a RANGE literal, not
    year(l_shipdate) == N: a function over the column defeats parquet
    predicate pushdown and min/max row-group skipping; the range
    reaches the scan (PushedFilters)."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01")
            .cast("timestamp"))) \
        .select("l_orderkey", "l_shipdate")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (F.when(delay < 30, "0-29")
               .when(delay < 60, "30-59")
               .otherwise("60+"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders.select("o_orderkey", "o_orderdate",
                              "o_orderpriority"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"))
        .orderBy("delay_bucket")
    )


def q16_part_supplier_variety(lineitem: DataFrame, part: DataFrame,
                              supplier: DataFrame,
                              exclude_brand: str = "Brand#5",
                              exclude_type_prefix: str = "PROMO") -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each
    (brand, type, size), excluding one brand, one type family, and
    suppliers with "complaints". No partsupp table: the part-supplier
    relation is the DISTINCT (l_partkey, l_suppkey) pairs observed in
    lineitem; the complaint flag is a negative supplier balance.

    Scale shape: the distinct-pairs reduction shuffles the fact once
    on the pair key (map-side partial distinct); the exclusion is a
    broadcast anti-join (supplier is a dim); part prunes brand/type
    BEFORE its broadcast; countDistinct re-shuffles only the already-
    distinct pair relation."""
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    complained = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = (part.filter((F.col("p_brand") != exclude_brand)
                     & ~F.col("p_type").startswith(exclude_type_prefix))
             .select("p_partkey", "p_brand", "p_type", "p_size"))
    return (
        pairs
        .join(F.broadcast(complained),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q20_part_volume_suppliers(lineitem: DataFrame, part: DataFrame,
                              supplier: DataFrame,
                              name_like: str = "red%",
                              year: int = 1997,
                              share_pct: int = 30) -> DataFrame:
    """TPC-H Q20 shape: suppliers who move a dominant share of a
    promoted part family's annual volume. No partsupp availqty: a
    supplier qualifies when its shipped quantity of a matching part
    in ``year`` exceeds ``share_pct``% of that part's total annual
    volume (the original's "availqty > half of shipped" threshold
    re-anchored to observable data).

    Scale shape: matching part keys broadcast into the fact scan
    (semi-join prune), ONE groupBy(part, supplier) shuffle with
    map-side partials; the per-part total is a rollup of that small
    aggregate; the share test compares exact integers
    (qty·100 > total·share_pct — no float drift)."""
    pk = part.filter(F.col("p_name").like(name_like)).select("p_partkey")
    qty = F.round(F.col("l_quantity")).cast("bigint")
    per_ps = (
        # range literal, not year(): pushdown + row-group skipping
        lineitem.filter(
            (F.col("l_shipdate")
             >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("l_shipdate")
               < F.lit(f"{year + 1}-01-01").cast("timestamp")))
        .join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"),
              "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(qty).alias("supp_qty"))
    )
    per_p = per_ps.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("part_qty"))
    return (
        per_ps.join(per_p, "l_partkey")
        .filter(F.col("supp_qty") * 100 > F.col("part_qty") * share_pct)
        .select("l_suppkey").distinct()
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q21_waiting_suppliers(lineitem: DataFrame, orders: DataFrame,
                          supplier: DataFrame, late_days: int = 60,
                          k: int = 100) -> DataFrame:
    """TPC-H Q21 shape — suppliers who single-handedly kept a
    multi-supplier order waiting — re-expressed as ONE aggregation
    instead of the classical EXISTS/NOT-EXISTS triple self-join: for
    finalized ('F') orders, profile each order with conditional
    distinct counts (suppliers, late suppliers, the late supplier id
    when unique) and keep orders where >1 suppliers participated but
    exactly ONE shipped late (ship > order date + ``late_days``).
    "Late" anchors to the order date since the dataset has no
    commit/receipt dates.

    Scale shape: the fact shuffles ONCE on the order key (the triple
    self-join form shuffles it three times); per-order state is three
    counters; the final per-supplier count aggregates a relation
    bounded by |orders|. max(CASE WHEN late THEN suppkey END) is the
    unique late supplier exactly because n_late_supp = 1."""
    base = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders.filter(F.col("o_orderstatus") == "F")
                    .select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
    )
    late = (F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS"))
    prof = base.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey")))
         .alias("n_late_supp"),
        F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
    )
    return (
        prof.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("late_supp") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(k)
    )
