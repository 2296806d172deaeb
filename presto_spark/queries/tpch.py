"""TPC-H-shaped query suite, adapted to the driver's column-subset schema.

Source texts: reference
presto-benchto-benchmarks/src/main/resources/sql/presto/tpch/q01.sql..q22.sql
(the reference's own macro-benchmark workload, tpch.yaml).  Adaptations:

* driver tables carry a TPC-H column *subset* (no partsupp, no
  comment/address/phone/shipmode/commitdate columns — FIXTURES.md), so
  queries referencing those are re-shaped onto existing columns while
  keeping the same operator skeleton (join graph, subquery form, agg
  pattern).
* date constants moved into the driver data's 1995–2001 range.
* money aggregates use exact DECIMAL casts (see queries/base.py) so the
  DuckDB-oracle value hash is reproducible under any summation order.

All queries here are single-text ANSI SQL accepted by both Spark and
DuckDB — the point of the engine being Spark SQL is that this entire
file is declarative; Catalyst chooses broadcast vs shuffle joins, fuses
scan+filter+project, and pushes every filter below the joins (verified in
tests/test_plans.py).
"""

from presto_spark.queries.base import dual_sql_query, sql_query

# Exact-decimal building blocks (see base.py determinism conventions).
REV = ("CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) "
       "* CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)")

sql_query(
    "q01_pricing_summary",
    f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      {REV}                                                       AS sum_disc_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - l_discount AS DECIMAL(4,2))
               * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE)      AS sum_charge,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)      AS avg_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
      CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*)       AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 (tpch/q01.sql): scan→filter→project→hash-agg→sort; "
        "exercises HashAggregationOperator.java equivalents.",
    tags=("tpch", "bench"),
)

sql_query(
    "q03_shipping_priority",
    f"""
    SELECT
      l_orderkey,
      {REV} AS revenue,
      o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 (tpch/q03.sql): 3-way join + agg + TopN "
        "(TopNOperator.java → TakeOrderedAndProject). Deterministic "
        "tie-break on l_orderkey added for the hash oracle.",
    tags=("tpch", "bench"),
)

sql_query(
    "q04_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity > 45
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 (tpch/q04.sql): EXISTS decorrelated to left-semi join "
        "(HashSemiJoinOperator.java / SemiJoinNode). Predicate adapted: "
        "no commitdate/receiptdate in driver schema.",
    tags=("tpch", "bench"),
)

sql_query(
    "q05_local_supplier_volume",
    f"""
    SELECT n_name, {REV} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 (tpch/q05.sql): 6-way star join; small dims go "
        "broadcast (DetermineJoinDistributionType.java REPLICATED → "
        "Spark BroadcastHashJoin via AQE/threshold).",
    tags=("tpch", "bench"),
)

sql_query(
    "q06_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 (tpch/q06.sql): pure scan+filter+global-agg "
        "(AggregationOperator.java); filters must reach the parquet "
        "reader as PushedFilters.",
    tags=("tpch", "bench"),
)

sql_query(
    "q07_volume_shipping",
    f"""
    SELECT
      supp_nation, cust_nation, l_year, CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT
        n1.n_name AS supp_nation,
        n2.n_name AS cust_nation,
        year(l_shipdate) AS l_year,
        CAST(l_extendedprice AS DECIMAL(12,2))
          * CAST(1 - l_discount AS DECIMAL(4,2)) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey
        AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_19')
          OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_3'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 (tpch/q07.sql): nation-pair disjunctive join filter + "
        "derived-table agg; year() is ANSI-shared.",
    tags=("tpch",),
)

sql_query(
    "q08_market_share",
    f"""
    SELECT
      o_year,
      CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0.00 AS DECIMAL(4,2)) END) AS DOUBLE)
        / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT
        year(o_orderdate) AS o_year,
        CAST(l_extendedprice AS DECIMAL(12,2))
          * CAST(1 - l_discount AS DECIMAL(4,2)) AS volume,
        n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey
        AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r_regionkey
        AND r_name = 'AMERICA'
        AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 (tpch/q08.sql): 8-way join, conditional agg ratio.",
    tags=("tpch",),
)

sql_query(
    "q09_product_type_profit",
    """
    SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT
        n_name AS nation,
        year(o_orderdate) AS o_year,
        CAST(l_extendedprice AS DECIMAL(12,2))
          * CAST(1 - l_discount AS DECIMAL(4,2))
          - CAST(p_retailprice AS DECIMAL(12,2))
            * CAST(l_quantity AS DECIMAL(12,2))
            * CAST(0.10 AS DECIMAL(4,2)) AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey
        AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey
        AND s_nationkey = n_nationkey
        AND p_name LIKE '%a%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 (tpch/q09.sql): profit amount adapted — driver schema "
        "has no partsupp, supplycost modeled as 10% of p_retailprice.",
    tags=("tpch", "bench"),
)

sql_query(
    "q10_returned_items",
    f"""
    SELECT
      c_custkey, c_name, {REV} AS revenue, c_acctbal, n_name
    FROM lineitem, orders, customer, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 (tpch/q10.sql): join+agg+TopN with deterministic "
        "tie-break for the oracle hash.",
    tags=("tpch", "bench"),
)

sql_query(
    "q12_priority_shipping",
    """
    SELECT
      l_linestatus,
      CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    doc="TPC-H Q12 (tpch/q12.sql): shipmode dimension replaced by "
        "l_linestatus (driver schema has no shipmode).",
    tags=("tpch",),
)

sql_query(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus <> 'F'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 (tpch/q13.sql): left outer join with join-time filter "
        "+ double aggregation; comment LIKE replaced by status filter.",
    tags=("tpch", "bench"),
)

sql_query(
    "q14_promo_effect",
    f"""
    SELECT
      100.00 * CAST(sum(CASE WHEN p_type = 'ECONOMY'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - l_discount AS DECIMAL(4,2))
                 ELSE CAST(0.00 AS DECIMAL(4,2)) END) AS DOUBLE)
        / {REV} AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    doc="TPC-H Q14 (tpch/q14.sql): conditional-agg ratio; PROMO type "
        "mapped onto driver p_type domain.",
    tags=("tpch",),
)

sql_query(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {REV} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 (tpch/q15.sql): CTE referenced twice + scalar "
        "subquery — the multi-reference CTE case Presto materializes "
        "(LogicalCteOptimizer.java); Catalyst inlines, still one pass "
        "each side of the join at this shape.",
    tags=("tpch",),
)

sql_query(
    "q16_part_supplier_relation",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 (tpch/q16.sql): DISTINCT aggregate "
        "(MarkDistinctOperator.java → Catalyst RewriteDistinctAggregates); "
        "partsupp replaced by lineitem as the part-supplier relation.",
    tags=("tpch", "bench"),
)

sql_query(
    "q17_small_quantity_order",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
    doc="TPC-H Q17 (tpch/q17.sql): correlated scalar subquery → "
        "decorrelated agg+join (TransformCorrelatedScalarAggregationToJoin.java). "
        "avg(l_quantity) is exact (integral doubles) so the predicate is "
        "deterministic cross-engine. container predicate dropped (no column).",
    tags=("tpch", "bench"),
)

dual_sql_query(
    "q18_large_volume_customer",
    # r15 optimization round (guide §1.2 "the distributed algorithm"):
    # the literal Q18 text planned the IN-subquery aggregate TWICE —
    # Catalyst pushes the semi-join filter into BOTH join inputs, so
    # lineitem was scanned 3x and aggregated 2x (plan pinned in
    # plans/r15/q18_large_volume_customer_before.txt).  Because
    # o_orderkey is in the outer GROUP BY and orders/customer are
    # keyed 1:1, the outer sum per group IS the per-orderkey sum the
    # HAVING already computed — aggregate lineitem ONCE, filter, then
    # join the (small) survivors to orders and customer.  Same rows,
    # same DECIMAL-exact sums; the oracle keeps the literal TPC-H
    # shape, so the driver hash proves the equivalence every round.
    """
    SELECT
      c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      CAST(t.sum_qty_dec AS DOUBLE) AS sum_qty
    FROM (
        SELECT l_orderkey,
               sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty_dec
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150
      ) t
      JOIN orders ON o_orderkey = t.l_orderkey
      JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
    """
    SELECT
      c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150
      )
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 (tpch/q18.sql): IN-subquery with HAVING → semi join "
        "(TransformUncorrelatedInPredicateSubqueryToSemiJoin.java). "
        "Spark side restructured in r15 to aggregate lineitem once "
        "(see inline rationale); the DuckDB oracle keeps the original "
        "correlated text as the equivalence proof.",
    tags=("tpch", "bench"),
)

sql_query(
    "q19_discounted_revenue",
    f"""
    SELECT {REV} AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
            AND l_quantity >= 1 AND l_quantity <= 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
            AND l_quantity >= 10 AND l_quantity <= 20)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
            AND l_quantity >= 20 AND l_quantity <= 30))
    """,
    doc="TPC-H Q19 (tpch/q19.sql): disjunctive join+filter predicate — "
        "tests OR-predicate pushdown through a join.",
    tags=("tpch", "bench"),
)

sql_query(
    "q21_suppliers_who_kept_waiting",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_quantity > 30
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_quantity > 30
      )
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_19'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 (tpch/q21.sql): EXISTS + NOT EXISTS correlated pair "
        "→ left-semi + left-anti joins; receiptdate/commitdate predicate "
        "adapted to quantity (columns absent).",
    tags=("tpch", "bench"),
)

sql_query(
    "q22_global_sales_opportunity",
    """
    SELECT cntrycode, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT c_custkey % 7 AS cntrycode, c_acctbal
      FROM customer
      WHERE c_custkey % 7 IN (1, 3, 5)
        AND c_acctbal > (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
          FROM customer
          WHERE c_acctbal > 0.00 AND c_custkey % 7 IN (1, 3, 5)
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        )
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    doc="TPC-H Q22 (tpch/q22.sql): uncorrelated scalar subquery + NOT "
        "EXISTS anti join; phone-prefix cntrycode replaced by custkey "
        "modulus (no phone column). avg spelled as exact sum/count.",
    tags=("tpch",),
)

sql_query(
    "q02_minimum_cost_supplier",
    """
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part, supplier, lineitem, nation, region
    WHERE p_partkey = l_partkey
      AND s_suppkey = l_suppkey
      AND p_size = 15
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND l_extendedprice = (
        SELECT min(l2.l_extendedprice)
        FROM lineitem l2, supplier s2, nation n2, region r2
        WHERE l2.l_partkey = p_partkey
          AND s2.s_suppkey = l2.l_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey
          AND r2.r_name = 'EUROPE'
      )
    GROUP BY s_acctbal, s_name, n_name, p_partkey, p_name
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 (tpch/q02.sql): correlated scalar MIN subquery over the "
        "same join graph, decorrelated by Catalyst to an aggregate+join "
        "(reference rule: TransformCorrelatedScalarAggregationToJoin.java:66). "
        "partsupp absent → supply cost re-shaped onto lineitem "
        "l_extendedprice; GROUP BY dedups multi-lineitem matches.",
    tags=("tpch", "bench"),
)

sql_query(
    "q11_important_stock",
    """
    SELECT l_partkey, CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                               * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS value
    FROM lineitem, supplier, nation, region
    WHERE l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
    GROUP BY l_partkey
    HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > (
      SELECT 1.5 * avg(v) FROM (
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS v
        FROM lineitem, supplier, nation, region
        WHERE l_suppkey = s_suppkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
        GROUP BY l_partkey
      ) pv
    )
    ORDER BY value DESC, l_partkey
    """,
    doc="TPC-H Q11 (tpch/q11.sql): group-agg HAVING vs uncorrelated "
        "global scalar subquery (EnforceSingleRowOperator.java guard). "
        "partsupp absent → inventory value re-shaped onto lineitem; "
        "nation filter widened to region (sparse suppliers at tiny SF); "
        "threshold is 1.5x mean per-part value — scale-invariant vs the "
        "reference's 0.0001/SF fraction.",
    tags=("tpch", "bench"),
)

sql_query(
    "q20_potential_part_promotion",
    """
    SELECT s_name, s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
          )
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 30
      )
      AND s_nationkey = n_nationkey
    ORDER BY s_name
    """,
    doc="TPC-H Q20 (tpch/q20.sql): nested IN subqueries → semi-join "
        "chain with a grouped-HAVING threshold inside "
        "(TransformUncorrelatedInPredicateSubqueryToSemiJoin.java:56). "
        "partsupp availqty re-shaped onto shipped-quantity sums; "
        "single-nation filter dropped (1 supplier/nation at tiny SF).",
    tags=("tpch", "bench"),
)
