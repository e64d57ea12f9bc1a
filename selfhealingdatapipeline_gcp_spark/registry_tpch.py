"""Registry entries for the extra TPC-H-shape analytics
(operators/tpch_extra.py) with expression-exact DuckDB oracles."""

from __future__ import annotations

from selfhealingdatapipeline_gcp_spark import catalog
from selfhealingdatapipeline_gcp_spark.operators import tpch_extra
from selfhealingdatapipeline_gcp_spark.registry import register


def _t(spark, sf, *names):
    return [catalog.load(spark, sf, n) for n in names]


register(
    "q9_profit_by_nation_year",
    lambda spark, sf: tpch_extra.q9_profit_by_nation_year(
        *_t(spark, sf, "lineitem", "part", "supplier", "orders", "nation")),
    """
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           (sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
                - CAST(round(p_retailprice * 100) AS BIGINT) * 50
                  * CAST(round(l_quantity) AS BIGINT)) / 10000.0) AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%ar%'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)

register(
    "q11_important_parts",
    lambda spark, sf: tpch_extra.q11_important_parts(
        *_t(spark, sf, "lineitem", "part")),
    """
    WITH vals AS (
      SELECT p_partkey,
             sum(CAST(round(p_retailprice * 100) AS BIGINT)
                 * CAST(round(l_quantity) AS BIGINT)) AS value_c
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1
    ), total AS (
      SELECT CAST(sum(value_c) AS BIGINT) AS total_c,
             count(*) AS n_parts FROM vals
    )
    SELECT p_partkey, (value_c / 100.0) AS value
    FROM vals, total
    WHERE value_c > total_c / n_parts * 1.5
    ORDER BY value DESC, p_partkey
    """,
)

register(
    "q13_customer_distribution",
    lambda spark, sf: tpch_extra.q13_customer_distribution(
        *_t(spark, sf, "customer", "orders")),
    """
    WITH per_cust AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY 1
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust
    GROUP BY 1
    ORDER BY custdist DESC, c_count DESC
    """,
)

register(
    "q15_top_supplier",
    lambda spark, sf: tpch_extra.q15_top_supplier(
        *_t(spark, sf, "lineitem", "supplier")),
    """
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, (rev_e4 / 10000.0) AS total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE rev_e4 = (SELECT max(rev_e4) FROM rev)
    ORDER BY s_suppkey
    """,
)

register(
    "q19_bracket_revenue",
    lambda spark, sf: tpch_extra.q19_bracket_revenue(
        *_t(spark, sf, "lineitem", "part")),
    """
    SELECT (sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0)
             AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
           AND l_quantity BETWEEN 20 AND 30)
    """,
)

register(
    "q22_dormant_customers",
    lambda spark, sf: tpch_extra.q22_dormant_customers(
        *_t(spark, sf, "customer", "orders")),
    """
    WITH a AS (
      SELECT (sum(CAST(round(c_acctbal * 100) AS BIGINT))
              / (100.0 * count(*))) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    ), anc AS (SELECT max(o_orderdate) AS anchor FROM orders)
    SELECT c_mktsegment AS segment,
           count(*) AS n_custs,
           (sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0)
             AS total_acctbal
    FROM customer, a, anc
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate > anchor - INTERVAL 180 DAY)
    GROUP BY 1
    ORDER BY segment
    """,
)


register(
    "q2_cheapest_supplier",
    lambda spark, sf: tpch_extra.q2_cheapest_supplier(
        *_t(spark, sf, "lineitem", "part", "supplier")),
    """
    WITH offer AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS offer_e2
      FROM lineitem GROUP BY 1, 2
    ), best AS (
      SELECT * FROM (
        SELECT l_partkey, l_suppkey, offer_e2,
               row_number() OVER (PARTITION BY l_partkey
                    ORDER BY offer_e2, l_suppkey) AS rn
        FROM offer
      ) WHERE rn = 1
    )
    SELECT p_partkey, p_brand, p_type, s_suppkey, s_name,
           (offer_e2 / 100.0) AS best_price
    FROM best
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    ORDER BY p_partkey
    LIMIT 100
    """,
)


register(
    "q12_ship_delay_priority",
    lambda spark, sf: tpch_extra.q12_ship_delay_priority(
        *_t(spark, sf, "lineitem", "orders")),
    """
    SELECT CASE
             WHEN date_diff('day', o_orderdate::DATE, l_shipdate::DATE) < 30
               THEN '0-29'
             WHEN date_diff('day', o_orderdate::DATE, l_shipdate::DATE) < 60
               THEN '30-59'
             ELSE '60+'
           END AS delay_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE year(l_shipdate) = 1997
    GROUP BY 1 ORDER BY delay_bucket
    """,
)


register(
    "q16_part_supplier_variety",
    lambda spark, sf: tpch_extra.q16_part_supplier_variety(
        *_t(spark, sf, "lineitem", "part", "supplier")),
    """
    WITH pairs AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM pairs
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand != 'Brand#5'
      AND p_type NOT LIKE 'PROMO%'
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)


register(
    "q20_part_volume_suppliers",
    lambda spark, sf: tpch_extra.q20_part_volume_suppliers(
        *_t(spark, sf, "lineitem", "part", "supplier")),
    """
    WITH per_ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
               AS supp_qty
      FROM lineitem
      WHERE year(l_shipdate) = 1997
        AND l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'red%')
      GROUP BY 1, 2
    ), per_p AS (
      SELECT l_partkey, CAST(sum(supp_qty) AS BIGINT) AS part_qty
      FROM per_ps GROUP BY 1
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM per_ps
    JOIN per_p USING (l_partkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE supp_qty * 100 > part_qty * 30
    ORDER BY s_suppkey
    """,
)


register(
    "q21_waiting_suppliers",
    lambda spark, sf: tpch_extra.q21_waiting_suppliers(
        *_t(spark, sf, "lineitem", "orders", "supplier")),
    """
    WITH prof AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l_shipdate
                                      > o_orderdate + INTERVAL 60 DAY
                                 THEN l_suppkey END) AS n_late_supp,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN l_suppkey END) AS late_supp
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM prof JOIN supplier ON late_supp = s_suppkey
    WHERE n_supp > 1 AND n_late_supp = 1
    GROUP BY 1, 2
    ORDER BY numwait DESC, s_suppkey
    LIMIT 100
    """,
)
