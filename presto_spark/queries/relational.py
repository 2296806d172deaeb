"""Relational operator conformance suite.

One query per operator family from SURVEY.md §2 (reference operator files
cited per query).  These mirror the reference's suites:
AbstractTestJoinQueries.java, AbstractTestWindowQueries.java,
AbstractTestAggregations.java, AbstractTestOrderByQueries.java
(presto-tests/src/main/java/com/facebook/presto/tests/).
"""

from presto_spark.queries.base import dual_sql_query, sql_query

# ---------------------------------------------------------------------------
# Joins (reference: operator/LookupJoinOperator.java, HashBuilderOperator.java,
# NestedLoopJoinOperator.java, HashSemiJoinOperator.java, LookupOuterOperator.java)
# ---------------------------------------------------------------------------

sql_query(
    "join_full_outer",
    """
    SELECT
      coalesce(c.nk, s.nk) AS nationkey,
      c.n_customers,
      s.n_suppliers
    FROM (SELECT c_nationkey AS nk, count(*) AS n_customers
          FROM customer GROUP BY c_nationkey) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, count(*) AS n_suppliers
          FROM supplier GROUP BY s_nationkey) s
      ON c.nk = s.nk
    ORDER BY nationkey
    """,
    doc="FULL OUTER join with unmatched rows on both sides "
        "(LookupOuterOperator.java emits unmatched build rows).",
    tags=("relational", "join"),
)

sql_query(
    "join_right_outer",
    """
    SELECT s_suppkey, s_name, li.cnt
    FROM (SELECT l_suppkey, count(*) AS cnt
          FROM lineitem WHERE l_quantity > 49 GROUP BY l_suppkey) li
    RIGHT OUTER JOIN supplier ON li.l_suppkey = s_suppkey
    ORDER BY s_suppkey
    """,
    doc="RIGHT OUTER join (JoinType.java RIGHT); null-extends probe side.",
    tags=("relational", "join"),
)

sql_query(
    "join_semi_anti",
    """
    SELECT
      (SELECT count(*) FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)) AS n_semi,
      (SELECT count(*) FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)) AS n_anti
    """,
    doc="Semi + anti join via EXISTS / NOT EXISTS "
        "(HashSemiJoinOperator.java:198, SetBuilderOperator.java; "
        "Catalyst → LeftSemi/LeftAnti).",
    tags=("relational", "join"),
)

sql_query(
    "join_cross",
    """
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    ORDER BY from_region, to_region
    """,
    doc="Cross join + residual filter (NestedLoopJoinOperator.java:367).",
    tags=("relational", "join"),
)

sql_query(
    "join_theta_inequality",
    """
    SELECT n_name, r_name
    FROM nation JOIN region ON n_regionkey < r_regionkey
    ORDER BY n_name, r_name
    """,
    doc="Non-equi (theta) join — Presto runs these on the NL join path; "
        "Spark → BroadcastNestedLoopJoin (5-row build side).",
    tags=("relational", "join"),
)

sql_query(
    "join_multi_key_with_residual",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_quantity * 1000 < o_totalprice
    WHERE o_orderstatus = 'F' AND l_linenumber = 1
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Equi join + residual (non-equi) filter — JoinNode equi-criteria "
        "plus filter expression (presto-spi/.../plan/JoinNode.java).",
    tags=("relational", "join"),
)

# ---------------------------------------------------------------------------
# Window functions (reference: operator/WindowOperator.java:947,
# operator/window/*.java, FrameInfo.java)
# ---------------------------------------------------------------------------

sql_query(
    "window_ranking",
    """
    SELECT
      o_orderkey,
      row_number()   OVER w AS rn,
      rank()         OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS rk,
      dense_rank()   OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS drk,
      ntile(4)       OVER w AS nt,
      CAST(round(percent_rank() OVER w, 9) AS DOUBLE) AS prk,
      CAST(round(cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) , 9) AS DOUBLE) AS cd
    FROM orders
    WHERE o_custkey <= 20
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_orderkey
    """,
    doc="Ranking window functions (RowNumberFunction.java, RankFunction.java, "
        "DenseRankFunction.java, NTileFunction.java, PercentRankFunction.java, "
        "CumulativeDistributionFunction.java). rank/cume_dist use a "
        "low-cardinality ORDER BY to exercise peer groups; row_number/ntile "
        "orderings are made total with o_orderkey.",
    tags=("relational", "window"),
)

sql_query(
    "window_value_functions",
    """
    SELECT
      event_id,
      lag(value, 1)        OVER wo AS prev_value,
      lead(value, 2, -1.0) OVER wo AS next2_value,
      first_value(value)   OVER w AS first_v,
      last_value(value)    OVER w AS last_v,
      nth_value(value, 3)  OVER w AS third_v
    FROM events
    WHERE user_id <= 5
    WINDOW wo AS (PARTITION BY user_id ORDER BY ts_ns),
           w AS (PARTITION BY user_id ORDER BY ts_ns
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY event_id
    """,
    oracle="""
    SELECT
      event_id,
      lag(value, 1)        OVER w AS prev_value,
      lead(value, 2, -1.0) OVER w AS next2_value,
      first_value(value)   OVER w AS first_v,
      last_value(value)    OVER w AS last_v,
      nth_value(value, 3)  OVER w AS third_v
    FROM (SELECT event_id, user_id, value, epoch_ns(ts) AS ts_ns FROM events) e
    WHERE user_id <= 5
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY event_id
    """,
    doc="Value window functions with explicit frame (LagFunction.java, "
        "LeadFunction.java w/ default, FirstValueFunction.java, "
        "LastValueFunction.java, NthValueFunction.java). Ordering by raw "
        "nanos (ts_ns) for exact cross-engine order.",
    tags=("relational", "window"),
)

sql_query(
    "window_aggregate_frames",
    """
    SELECT
      event_id,
      CAST(sum(CAST(value AS DECIMAL(12,2)))
           OVER (PARTITION BY user_id ORDER BY ts_ns
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
      count(*) OVER (PARTITION BY user_id ORDER BY ts_ns
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS cnt_3,
      CAST(max(CAST(value AS DECIMAL(12,2)))
           OVER (PARTITION BY user_id ORDER BY ts_ns
                 RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS max_all
    FROM events
    WHERE user_id <= 5
    ORDER BY event_id
    """,
    oracle="""
    SELECT
      event_id,
      CAST(sum(CAST(value AS DECIMAL(12,2)))
           OVER (PARTITION BY user_id ORDER BY ts_ns
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
      count(*) OVER (PARTITION BY user_id ORDER BY ts_ns
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS cnt_3,
      CAST(max(CAST(value AS DECIMAL(12,2)))
           OVER (PARTITION BY user_id ORDER BY ts_ns
                 RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS max_all
    FROM (SELECT event_id, user_id, value, epoch_ns(ts) AS ts_ns FROM events) e
    WHERE user_id <= 5
    ORDER BY event_id
    """,
    doc="Aggregates as window functions over ROWS/RANGE frames "
        "(AggregateWindowFunction.java; FrameInfo.java:26 frame model). "
        "Running sum uses exact decimal so frame-order is hash-stable.",
    tags=("relational", "window"),
)

sql_query(
    "window_top_n_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t
    WHERE rn <= 3
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Rank-filter fused top-k per group (TopNRowNumberOperator.java:382; "
        "WindowFilterPushDown.java:63 → Spark InferWindowGroupLimit does "
        "the same pushdown, verified in test_plans.py).",
    tags=("relational", "window", "bench"),
)

# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube (reference: operator/GroupIdOperator.java:198,
# AggregationNode.java:317 groupingSets)
# ---------------------------------------------------------------------------

sql_query(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           count(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="ROLLUP grouping sets (GroupIdOperator.java; SqlBase.g4:309-311).",
    tags=("relational", "agg"),
)

sql_query(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS cnt,
           grouping(l_returnflag) AS g_rf,
           grouping(l_linestatus) AS g_ls
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Explicit GROUPING SETS + grouping() marker function "
        "(GroupIdOperator.java:198).",
    tags=("relational", "agg"),
)

sql_query(
    "agg_distinct_and_filter",
    """
    SELECT
      l_returnflag,
      count(DISTINCT l_partkey) AS nparts,
      count(DISTINCT l_suppkey) AS nsupps,
      count(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
           FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Multiple DISTINCT aggregates + FILTER clause "
        "(MarkDistinctOperator.java:199, "
        "MultipleDistinctAggregationToMarkDistinct.java, "
        "ImplementFilteredAggregations.java).",
    tags=("relational", "agg", "bench"),
)

# ---------------------------------------------------------------------------
# Set operations (reference: ImplementIntersectAndExceptAsUnion.java:104,
# UnionNode/IntersectNode/ExceptNode)
# ---------------------------------------------------------------------------

sql_query(
    "setop_union_intersect_except",
    """
    SELECT 'union_all' AS op, count(*) AS cnt FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ) u
    UNION ALL
    SELECT 'union_distinct' AS op, count(*) AS cnt FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      UNION
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ) ud
    UNION ALL
    SELECT 'intersect' AS op, count(*) AS cnt FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ) i
    UNION ALL
    SELECT 'except' AS op, count(*) AS cnt FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ) e
    ORDER BY op
    """,
    doc="UNION ALL / UNION / INTERSECT / EXCEPT "
        "(ImplementIntersectAndExceptAsUnion.java:104 → Catalyst "
        "semi/anti-join rewrites).",
    tags=("relational", "setop"),
)

sql_query(
    "setop_intersect_except_all",
    """
    SELECT 'intersect_all' AS op, count(*) AS cnt FROM (
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT ALL
      SELECT l_suppkey FROM lineitem WHERE l_quantity > 40
    ) i
    UNION ALL
    SELECT 'except_all' AS op, count(*) AS cnt FROM (
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
      EXCEPT ALL
      SELECT l_suppkey FROM lineitem WHERE l_quantity > 40
    ) e
    ORDER BY op
    """,
    doc="INTERSECT ALL / EXCEPT ALL multiplicity semantics "
        "(SetOperationNode.java; ALL variants in "
        "ImplementIntersectAndExceptAsUnion.java).",
    tags=("relational", "setop"),
)

# ---------------------------------------------------------------------------
# Unnest / lateral (reference: operator/unnest/UnnestOperator.java:327,
# SqlBase.g4:377 UNNEST, :378 LATERAL)
# ---------------------------------------------------------------------------

dual_sql_query(
    "unnest_with_ordinality",
    """
    SELECT p_partkey, word, ord0 + 1 AS ord
    FROM part
    LATERAL VIEW posexplode(split(p_name, ' ')) t AS ord0, word
    WHERE p_partkey <= 20
    ORDER BY p_partkey, ord
    """,
    """
    SELECT p_partkey, u.word AS word, u.ord AS ord
    FROM (SELECT p_partkey,
                 unnest(list_transform(string_split(p_name, ' '),
                                       (w, i) -> {'word': w, 'ord': i})) AS u
          FROM part WHERE p_partkey <= 20) t
    ORDER BY p_partkey, ord
    """,
    doc="UNNEST WITH ORDINALITY (UnnestOperator.java; ordinality via "
        "posexplode on the Spark side, 1-based to match Presto).",
    tags=("relational", "unnest"),
)

dual_sql_query(
    "unnest_multi_array_zip",
    """
    WITH arrs AS (
      SELECT transform(array_sort(collect_list(struct(r_regionkey, r_name))),
                       s -> s.r_regionkey) AS ks,
             transform(array_sort(collect_list(struct(r_regionkey, r_name))),
                       s -> s.r_name) AS ns
      FROM region)
    SELECT pos + 1 AS idx, z.ks AS r_key, z.ns AS r_name
    FROM arrs LATERAL VIEW posexplode(arrays_zip(ks, ns)) t AS pos, z
    ORDER BY idx
    """,
    """
    WITH arrs AS (SELECT list(r_regionkey ORDER BY r_regionkey) AS ks,
                         list(r_name ORDER BY r_regionkey) AS ns
                  FROM region)
    SELECT u.ord AS idx, u.k AS r_key, u.n AS r_name
    FROM (SELECT unnest(list_transform(list_zip(ks, ns),
                        (z, i) -> {'k': z[1], 'n': z[2], 'ord': i})) AS u
          FROM arrs) t
    ORDER BY idx
    """,
    doc="Multi-argument UNNEST zips arrays positionally "
        "(UnnestOperator.java multi-channel; Spark arrays_zip+posexplode).",
    tags=("relational", "unnest"),
)

# ---------------------------------------------------------------------------
# Sort / limit / offset / distinct-limit (reference: OrderByOperator.java:384,
# LimitOperator.java, OffsetNode, DistinctLimitOperator.java:288)
# ---------------------------------------------------------------------------

sql_query(
    "sort_limit_offset",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15 OFFSET 5
    """,
    doc="Total sort + LIMIT/OFFSET (OrderByOperator.java, OffsetNode, "
        "ImplementOffset.java; Spark TakeOrderedAndProject).",
    tags=("relational", "sort"),
)

sql_query(
    "distinct_limit",
    """
    SELECT count(*) AS n FROM (
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem LIMIT 4
    ) t
    """,
    doc="DISTINCT + LIMIT fusion (DistinctLimitOperator.java:288). Output "
        "is the count (=4) — the chosen rows are engine-dependent, the "
        "cardinality is not.",
    tags=("relational", "sort"),
)

sql_query(
    "sort_nulls_ordering",
    """
    SELECT nk, cnt FROM (
      SELECT CASE WHEN s_nationkey < 10 THEN NULL ELSE s_nationkey END AS nk,
             count(*) AS cnt
      FROM supplier GROUP BY 1
    ) t
    ORDER BY nk ASC NULLS FIRST, cnt
    """,
    doc="Explicit NULLS FIRST ordering — Presto defaults NULLS LAST for "
        "ASC (SortOrder in presto-common), Spark defaults NULLS FIRST; "
        "explicit spelling pins the semantics both sides.",
    tags=("relational", "sort"),
)

# ---------------------------------------------------------------------------
# Subqueries (reference: ApplyNode/LateralJoinNode decorrelation rules:
# TransformCorrelatedScalarAggregationToJoin.java:66,
# TransformExistsApplyToLateralNode.java, EnforceSingleRowOperator.java:128)
# ---------------------------------------------------------------------------

sql_query(
    "subquery_scalar_uncorrelated",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                                     / count(*) FROM orders)
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="Uncorrelated scalar subquery (EnforceSingleRowOperator.java:128).",
    tags=("relational", "subquery"),
)

sql_query(
    "subquery_correlated_scalar",
    """
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                              / count(*)
                       FROM customer c2
                       WHERE c2.c_nationkey = customer.c_nationkey)
      AND c_custkey <= 50
    ORDER BY c_custkey
    """,
    doc="Correlated scalar aggregation subquery → decorrelated to "
        "agg+join (TransformCorrelatedScalarAggregationToJoin.java:66).",
    tags=("relational", "subquery"),
)

sql_query(
    "subquery_in_uncorrelated",
    """
    SELECT count(*) AS n_building_lines
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders, customer
      WHERE o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
    )
    """,
    doc="IN-subquery → semi join "
        "(TransformUncorrelatedInPredicateSubqueryToSemiJoin.java:56).",
    tags=("relational", "subquery"),
)

# ---------------------------------------------------------------------------
# Values / inline tables (reference: operator/ValuesOperator.java:120)
# ---------------------------------------------------------------------------

sql_query(
    "values_inline_table",
    """
    SELECT t.flag, t.label, count(*) AS cnt
    FROM lineitem
    JOIN (VALUES ('A', 'returned-A'), ('N', 'kept-N'), ('R', 'returned-R'))
         AS t(flag, label)
      ON l_returnflag = t.flag
    GROUP BY t.flag, t.label
    ORDER BY t.flag
    """,
    doc="VALUES inline literal table joined against a scan "
        "(ValuesOperator.java; LocalExecutionPlanner.java:1746).",
    tags=("relational",),
)

# ---------------------------------------------------------------------------
# Sample (reference: SampleNode.java:33, ImplementBernoulliSampleAsFilter.java)
# — deterministic envelope check: sampling is seeded differently per engine,
# so the query asserts the *statistical contract*, not exact rows.
# ---------------------------------------------------------------------------

sql_query(
    "sample_bernoulli_envelope",
    """
    SELECT CASE WHEN cnt BETWEEN CAST(0.05 * total AS BIGINT)
                             AND CAST(0.15 * total AS BIGINT)
                THEN true ELSE false END AS within_envelope
    FROM (SELECT (SELECT count(*) FROM lineitem TABLESAMPLE (10 PERCENT)) AS cnt,
                 (SELECT count(*) FROM lineitem) AS total) t
    """,
    oracle="SELECT true AS within_envelope",
    doc="TABLESAMPLE BERNOULLI (SampleNode.java:33) — compared on the "
        "statistical envelope (10% ±5pp) because row selection is "
        "engine-seeded; the oracle pins the expected boolean.",
    tags=("relational",),
)

# ---------------------------------------------------------------------------
# Lateral correlated subquery (reference: LateralJoinNode.java, ApplyNode.java;
# grammar SqlBase.g4:378 LATERAL).
# ---------------------------------------------------------------------------

sql_query(
    "lateral_top_orders_per_nation",
    """
    SELECT n.n_name, t.o_orderkey, t.o_totalprice
    FROM nation n,
         LATERAL (
           SELECT o.o_orderkey, o.o_totalprice
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           WHERE c.c_nationkey = n.n_nationkey
           ORDER BY o.o_totalprice DESC, o.o_orderkey
           LIMIT 2
         ) t
    WHERE n.n_nationkey < 10
    ORDER BY n.n_name, t.o_totalprice DESC, t.o_orderkey
    """,
    doc="LATERAL correlated derived table: top-2 orders per nation "
        "(LateralJoinNode.java / ApplyNode.java; Catalyst decorrelates "
        "to a ranked window join). Same text runs on DuckDB.",
    tags=("relational", "lateral"),
)

# ---------------------------------------------------------------------------
# GROUPS window frame emulation (reference: WindowNode.java:323-330 lists
# ROWS|RANGE|GROUPS; Spark has no GROUPS — emulated via dense_rank+RANGE,
# operators/relational.py groups_frame). DuckDB supports GROUPS natively,
# so the oracle checks the emulation against the real thing.
# ---------------------------------------------------------------------------

def _register_groups_frame():
    from pyspark.sql import functions as F

    from presto_spark.operators.relational import groups_frame
    from presto_spark.queries.base import prepare, register

    @register(
        "window_groups_frame_emulation",
        oracle="""
        WITH t AS (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 dense_rank() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate) AS dr
          FROM orders WHERE o_custkey < 100
        )
        SELECT a.o_custkey, a.o_orderkey,
               CAST(sum(CAST(b.o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
                 AS grp_sum,
               count(*) AS grp_n
        FROM t a JOIN t b
          ON a.o_custkey = b.o_custkey AND b.dr BETWEEN a.dr - 1 AND a.dr
        GROUP BY a.o_custkey, a.o_orderkey
        ORDER BY a.o_custkey, a.o_orderkey
        """,
        doc="GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW emulated with "
            "dense_rank + RANGE (groups_frame). The oracle expands the "
            "frame definition independently as a peer-group self-join — "
            "a from-first-principles differential proof of the "
            "emulation.",
        tags=("window",),
    )
    def window_groups_frame_emulation(spark, sf_dir):
        prepare(spark, sf_dir)
        orders = spark.table("orders").where(F.col("o_custkey") < 100)
        out = groups_frame(
            orders,
            ["o_custkey"],
            "o_orderdate",
            n_preceding=1,
            n_following=0,
            aggs={
                "grp_sum": F.sum(F.col("o_totalprice").cast("decimal(14,2)")),
                "grp_n": F.count(F.lit(1)),
            },
        )
        return out.select(
            "o_custkey", "o_orderkey",
            F.col("grp_sum").cast("double").alias("grp_sum"), "grp_n",
        ).orderBy("o_custkey", "o_orderkey")


_register_groups_frame()

# ---------------------------------------------------------------------------
# Analytics shapes: market basket (self-join), year-over-year growth
# (window over yearly rollup) — classic warehouse workloads exercising
# self-join dedup and lag-over-aggregate.
# ---------------------------------------------------------------------------

sql_query(
    "analytics_market_basket",
    """
    WITH pairs AS (
      SELECT /*+ MERGE(a, b) */ a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, count(*) AS n_orders_together
    FROM pairs
    GROUP BY part_a, part_b
    HAVING count(*) >= 2
    ORDER BY n_orders_together DESC, part_a, part_b
    LIMIT 50
    """,
    doc="Market-basket co-occurrence: self-join lineitem on order key "
        "(a.part < b.part dedups pairs), count pairs, top-k. The "
        "self-join shuffles on l_orderkey once; pair counting is a "
        "second shuffle on the pair key.  r15 (guide §3.1 — pick the "
        "strategy deliberately): the MERGE hint stops the planner "
        "broadcasting a full fact-table side (2.1 s → 0.8 s at sf0.1 "
        "under the session's generous 64 MB auto-broadcast threshold); "
        "a self-join's two sides share ONE exchange+sort via reuse, "
        "and a fact-fact join must never broadcast at scale anyway.  "
        "DuckDB reads the hint as a block comment — one shared text.",
    tags=("relational", "bench"),
)

sql_query(
    "analytics_yoy_growth",
    """
    WITH yearly AS (
      SELECT n_name, year(o_orderdate) AS yr,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      FROM orders, customer, nation
      WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      GROUP BY n_name, year(o_orderdate)
    )
    SELECT n_name, yr, revenue,
           lag(revenue) OVER (PARTITION BY n_name ORDER BY yr) AS prev_revenue,
           CAST(round(
             CASE WHEN lag(revenue) OVER (PARTITION BY n_name ORDER BY yr) > 0
                  THEN (revenue - lag(revenue) OVER (PARTITION BY n_name ORDER BY yr))
                       / lag(revenue) OVER (PARTITION BY n_name ORDER BY yr) * 100
             END, 4) AS DOUBLE) AS yoy_pct
    FROM yearly
    ORDER BY n_name, yr
    """,
    doc="Year-over-year revenue growth per nation: rollup to (nation, "
        "year), then lag window over the aggregate — partial aggregation "
        "shrinks data before the window's small shuffle.",
    tags=("relational", "bench"),
)

dual_sql_query(
    "join_null_safe_equality",
    """
    WITH l AS (SELECT o_orderkey,
                      CASE WHEN o_orderkey % 7 = 0 THEN NULL
                           ELSE o_orderkey % 5 END AS k
               FROM orders WHERE o_orderkey <= 200),
         r AS (SELECT stack(6, 0, 'zero', 1, 'one', 2, 'two', 3, 'three',
                            4, 'four', CAST(NULL AS INT), 'null-bucket')
                 AS (k, label))
    SELECT coalesce(cast(l.k AS STRING), 'NULL') AS k_str, r.label,
           count(*) AS n
    FROM l JOIN r ON l.k <=> r.k
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    """
    WITH l AS (SELECT o_orderkey,
                      CASE WHEN o_orderkey % 7 = 0 THEN NULL
                           ELSE o_orderkey % 5 END AS k
               FROM orders WHERE o_orderkey <= 200),
         r AS (SELECT * FROM (VALUES (0, 'zero'), (1, 'one'), (2, 'two'),
                                     (3, 'three'), (4, 'four'),
                                     (CAST(NULL AS INT), 'null-bucket'))
                 AS t(k, label))
    SELECT coalesce(CAST(l.k AS VARCHAR), 'NULL') AS k_str, r.label,
           count(*) AS n
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="Null-safe join equality: Presto/DuckDB IS NOT DISTINCT FROM = "
        "Spark <=> — NULL keys match the NULL bucket instead of "
        "dropping (JoinNode equi-criteria with null-aware semantics).",
    tags=("relational", "join"),
)

dual_sql_query(
    "unnest_map_entries",
    """
    WITH m AS (
      SELECT n_nationkey AS k,
             map('r', n_regionkey, 'n2', n_nationkey * 2) AS mp
      FROM nation WHERE n_nationkey < 10
    )
    SELECT k, mkey, mval
    FROM m LATERAL VIEW explode(mp) AS mkey, mval
    ORDER BY k, mkey
    """,
    """
    WITH m AS (
      SELECT n_nationkey AS k,
             MAP {'r': n_regionkey, 'n2': n_nationkey * 2} AS mp
      FROM nation WHERE n_nationkey < 10
    )
    SELECT k, unnest(map_keys(mp)) AS mkey, unnest(map_values(mp)) AS mval
    FROM m
    ORDER BY k, mkey
    """,
    doc="UNNEST of a MAP into (key, value) rows (UnnestOperator.java "
        "handles maps; grammar SqlBase.g4:377): Spark LATERAL VIEW "
        "explode ≡ Presto UNNEST(map).",
    tags=("relational", "unnest"),
)

dual_sql_query(
    "fn_struct_suite",
    """
    WITH t AS (
      SELECT n_nationkey,
             named_struct('name', n_name, 'region', n_regionkey,
                          'score', n_nationkey * 1.5) AS info
      FROM nation
    )
    SELECT n_nationkey,
           info.name AS name_field,
           info.region AS region_field,
           CAST(info.score AS DOUBLE) AS score_field,
           named_struct('a', 1, 'b', 'x') = named_struct('a', 1, 'b', 'x')
             AS struct_eq
    FROM t
    ORDER BY n_nationkey
    """,
    """
    WITH t AS (
      SELECT n_nationkey,
             {'name': n_name, 'region': n_regionkey,
              'score': n_nationkey * 1.5} AS info
      FROM nation
    )
    SELECT n_nationkey,
           info.name AS name_field,
           info.region AS region_field,
           CAST(info.score AS DOUBLE) AS score_field,
           {'a': 1, 'b': 'x'} = {'a': 1, 'b': 'x'} AS struct_eq
    FROM t
    ORDER BY n_nationkey
    """,
    doc="ROW type (RowType.java:39 → StructType): construction, named "
        "field access, struct equality.",
    tags=("functions", "struct"),
)

# ---- Recursive CTEs (reference: Presto WITH RECURSIVE expansion,
# SqlQueryExpander / analyzer recursive-reference rules; SURVEY §2.9).
# Spark 4.1 executes WITH RECURSIVE natively as an iterative union-loop
# (UnionLoop node) — each iteration is a distributed step, so depth, not
# data size, bounds the loop: a date spine is O(#months) iterations and a
# hierarchy walk is O(tree height) ≈ log(rows), both scale-safe at 100 TB.

sql_query(
    "recursive_date_spine",
    """
    WITH RECURSIVE months(m) AS (
      SELECT DATE '1995-01-01'
      UNION ALL
      SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
      WHERE m < DATE '1996-12-01'
    ),
    mo AS (
      SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS total
      FROM orders
      WHERE o_orderdate >= DATE '1995-01-01'
        AND o_orderdate < DATE '1997-01-01'
      GROUP BY year(o_orderdate) * 100 + month(o_orderdate)
    )
    SELECT year(m) * 100 + month(m) AS ym,
           CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(total, 0.0) AS DOUBLE) AS total
    FROM months LEFT JOIN mo ON year(m) * 100 + month(m) = mo.ym
    ORDER BY ym
    """,
    doc="WITH RECURSIVE date spine (calendar gap-fill): generate every "
        "month in a range recursively, LEFT JOIN monthly order totals so "
        "zero-order months still appear.  Same text runs on DuckDB.",
    tags=("relational", "recursive", "bench"),
)

sql_query(
    "recursive_tree_rollup",
    """
    WITH RECURSIVE tree(k, depth) AS (
      SELECT CAST(c_custkey AS BIGINT), 1 FROM customer
      WHERE c_custkey BETWEEN 1 AND 9
      UNION ALL
      SELECT CAST(c.c_custkey AS BIGINT), t.depth + 1
      FROM customer c JOIN tree t
        ON CAST(floor(c.c_custkey / 10) AS BIGINT) = t.k
    )
    SELECT depth,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k
    FROM tree GROUP BY depth ORDER BY depth
    """,
    doc="WITH RECURSIVE hierarchy traversal: decimal-digit tree over "
        "c_custkey (parent = floor(key/10)), per-level rollup.  Depth is "
        "log10(rows) — the recursion re-joins the full table each level "
        "but runs only ~7 levels even at 100 TB.",
    tags=("relational", "recursive", "bench"),
)
