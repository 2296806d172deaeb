"""TPC-DS-shaped query subset over the driver schema.

The reference ships a TPC-DS benchmark suite (reference:
presto-benchto-benchmarks/src/main/resources/benchmarks/presto/tpcds.yaml
+ .../sql/presto/tpcds/*.sql, ~90 queries).  The driver's testdata is
TPC-H-shaped, so these re-create the *query shapes* that make TPC-DS
harder than TPC-H — grouping-set/window interplay, multi-bucket
conditional aggregation, week-over-week self-joins, cumulative-window
comparisons, moving averages with deviation filters — over the
available tables.  Each query cites the TPC-DS query whose shape it
exercises.

Determinism follows the engine-wide conventions (queries/base.py):
money math through DECIMAL casts, every computed column aliased
identically on both engines.
"""

from presto_spark.queries.base import dual_sql_query, sql_query

# q88 shape: one scan, many disjoint-range conditional counts.
sql_query(
    "tpcds_multi_bucket_counts",
    """
    SELECT
      count(*) FILTER (WHERE o_orderpriority = '1-URGENT'
                         AND o_totalprice < 100000) AS urgent_small,
      count(*) FILTER (WHERE o_orderpriority = '1-URGENT'
                         AND o_totalprice >= 100000) AS urgent_big,
      count(*) FILTER (WHERE o_orderpriority = '5-LOW'
                         AND o_totalprice < 100000) AS low_small,
      count(*) FILTER (WHERE o_orderpriority = '5-LOW'
                         AND o_totalprice >= 100000) AS low_big,
      count(*) FILTER (WHERE o_orderstatus = 'F') AS finished
    FROM orders
    """,
    doc="TPC-DS q88 shape (8 time-bucket counts in one scan via FILTER "
        "aggregates — ImplementFilteredAggregations.java): one pass, "
        "map-side partials only, no shuffle beyond the single-group agg.",
    tags=("tpcds",),
)

# q36 shape: ROLLUP margins + rank() partitioned by grouping level.
sql_query(
    "tpcds_rollup_rank_interplay",
    """
    WITH m AS (
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS net,
             grouping(l_returnflag) + grouping(l_linestatus) AS lvl
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
    )
    SELECT l_returnflag, l_linestatus, net, lvl,
           rank() OVER (PARTITION BY lvl ORDER BY net DESC) AS rk
    FROM m
    ORDER BY lvl, rk, l_returnflag, l_linestatus
    """,
    doc="TPC-DS q36 shape: ROLLUP(gross-margin hierarchy) + rank() "
        "PARTITION BY grouping level — the grouping-set × window "
        "interplay (GroupIdOperator.java + WindowOperator.java).",
    tags=("tpcds",),
)

# q67 shape: rollup over item hierarchy, top-k rows per group by window.
sql_query(
    "tpcds_rollup_topk_per_group",
    """
    WITH s AS (
      SELECT p_brand, p_type,
             CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sales,
             grouping(p_type) AS g
      FROM part
      GROUP BY ROLLUP(p_brand, p_type)
    ),
    r AS (
      SELECT p_brand, p_type, sales, g,
             row_number() OVER (PARTITION BY p_brand, g
                                ORDER BY sales DESC, p_type) AS rn
      FROM s WHERE p_brand IS NOT NULL
    )
    SELECT p_brand, p_type, sales, g, rn
    FROM r WHERE rn <= 3
    ORDER BY p_brand, g, rn
    """,
    doc="TPC-DS q67 shape: rollup over the item hierarchy then "
        "row_number-limited top-k inside each (brand, grouping-level) "
        "partition (WindowFilterPushDown.java rank-filter fusion).",
    tags=("tpcds",),
)

# q59 shape: week-over-week revenue comparison via self-join.
sql_query(
    "tpcds_week_over_week",
    """
    WITH w AS (
      SELECT year(o_orderdate) AS y, weekofyear(o_orderdate) AS wk,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS rev
      FROM orders
      GROUP BY year(o_orderdate), weekofyear(o_orderdate)
    )
    SELECT a.y AS y, a.wk AS wk, a.rev AS rev_this,
           b.rev AS rev_next,
           CAST(round(b.rev / a.rev, 6) AS DOUBLE) AS wow_ratio
    FROM w a JOIN w b ON a.y = b.y AND b.wk = a.wk + 1
    WHERE a.y = 1995
    ORDER BY a.wk
    """,
    doc="TPC-DS q59 shape: weekly rollup self-joined on (year, week+1) "
        "for week-over-week ratios — one agg shuffle, one small "
        "self-join on the aggregated table.",
    tags=("tpcds",),
)

# q51 shape: two cumulative windows compared row-by-row.
sql_query(
    "tpcds_cumulative_compare",
    """
    WITH d AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS rev
      FROM orders WHERE o_custkey <= 300
      GROUP BY o_custkey, CAST(o_orderdate AS DATE)
    )
    SELECT o_custkey, od,
           CAST(sum(CAST(rev AS DECIMAL(14,2)))
                OVER (PARTITION BY o_custkey ORDER BY od) AS DOUBLE) AS cum_rev,
           CAST(max(CAST(rev AS DECIMAL(14,2)))
                OVER (PARTITION BY o_custkey ORDER BY od) AS DOUBLE) AS run_max,
           CASE WHEN CAST(sum(CAST(rev AS DECIMAL(14,2)))
                     OVER (PARTITION BY o_custkey ORDER BY od) AS DOUBLE)
                     > 2 * CAST(max(CAST(rev AS DECIMAL(14,2)))
                     OVER (PARTITION BY o_custkey ORDER BY od) AS DOUBLE)
                THEN 1 ELSE 0 END AS cum_exceeds_2x_max
    FROM d
    ORDER BY o_custkey, od
    """,
    doc="TPC-DS q51 shape: two cumulative windows (running sum vs "
        "running max) compared per row — exercises ordered-frame "
        "aggregation determinism (decimal inside, double out).",
    tags=("tpcds",),
)

# q47 shape: centered moving average + lag, deviation filter.
sql_query(
    "tpcds_moving_avg_deviation",
    """
    WITH m AS (
      SELECT p_brand,
             month(l_shipdate) AS mo,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE year(l_shipdate) = 1995
      GROUP BY p_brand, month(l_shipdate)
    ),
    w AS (
      SELECT p_brand, mo, rev,
             CAST(sum(CAST(rev AS DECIMAL(14,2)))
                    OVER (PARTITION BY p_brand ORDER BY mo
                          ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
               / count(rev) OVER (PARTITION BY p_brand ORDER BY mo
                                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
               AS mavg,
             lag(rev) OVER (PARTITION BY p_brand ORDER BY mo) AS prev_rev
      FROM m
    )
    SELECT p_brand, mo,
           CAST(round(rev, 2) AS DOUBLE) AS rev,
           CAST(round(mavg, 2) AS DOUBLE) AS mavg,
           CAST(round(coalesce(prev_rev, 0), 2) AS DOUBLE) AS prev_rev
    FROM w
    WHERE rev > 1.2 * mavg
    ORDER BY p_brand, mo
    """,
    doc="TPC-DS q47 shape: centered 3-month moving average + lag with a "
        "deviation predicate over the windowed result (monthly brand "
        "series; v_shape = the classic seasonality-outlier detector).",
    tags=("tpcds",),
)

# q11/q4 shape: year-over-year growth ratio per customer via CTE reuse.
sql_query(
    "tpcds_yoy_growth_ratio",
    """
    WITH yr AS (
      SELECT o_custkey, year(o_orderdate) AS y,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS rev
      FROM orders
      GROUP BY o_custkey, year(o_orderdate)
    )
    SELECT a.o_custkey AS o_custkey, a.y AS y1,
           CAST(round(a.rev, 2) AS DOUBLE) AS rev1,
           CAST(round(b.rev, 2) AS DOUBLE) AS rev2,
           CAST(round(b.rev / a.rev, 6) AS DOUBLE) AS growth
    FROM yr a JOIN yr b
      ON a.o_custkey = b.o_custkey AND b.y = a.y + 1
    WHERE a.y = 1996 AND a.rev > 50000 AND b.rev / a.rev > 1.1
    ORDER BY growth DESC, o_custkey
    """,
    doc="TPC-DS q11/q4 shape: per-customer year buckets self-joined for "
        "YoY growth with a ratio threshold — CTE reused twice "
        "(LogicalCteOptimizer.java materialization candidate).",
    tags=("tpcds",),
)

# q35 shape: EXISTS-gated demographic aggregation.
sql_query(
    "tpcds_exists_gated_stats",
    """
    SELECT n_name,
           count(*) AS n_customers,
           CAST(round(avg(c_acctbal), 2) AS DOUBLE) AS avg_bal,
           CAST(round(max(c_acctbal), 2) AS DOUBLE) AS max_bal,
           CAST(round(min(c_acctbal), 2) AS DOUBLE) AS min_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 150000)
      AND c_mktsegment IN ('BUILDING', 'MACHINERY')
    GROUP BY n_name
    HAVING count(*) > 5
    ORDER BY n_name
    """,
    doc="TPC-DS q35 shape: EXISTS-gated (semi-join) customer stats per "
        "geography with segment filter and HAVING — decorrelated to a "
        "semi join by both engines (TransformExistsApplyToLateralNode).",
    tags=("tpcds",),
)

# q70 shape: grouping sets over geo hierarchy + rank by grouping_id.
sql_query(
    "tpcds_grouping_sets_geo_rank",
    """
    WITH rev AS (
      SELECT r_name, n_name,
             CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
      FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
    )
    SELECT r_name, n_name, total,
           rank() OVER (PARTITION BY (CASE WHEN n_name IS NULL THEN 1 ELSE 0 END)
                                    + (CASE WHEN r_name IS NULL THEN 1 ELSE 0 END)
                        ORDER BY total DESC) AS rk
    FROM rev
    ORDER BY rk, r_name, n_name
    """,
    doc="TPC-DS q70 shape: GROUPING SETS over the geo hierarchy "
        "(nation ⊂ region ⊂ all) + rank within each aggregation level "
        "(GroupIdOperator.java; level derived from the null pattern so "
        "both engines agree without grouping_id numbering).",
    tags=("tpcds",),
)

# q93 shape: returns-adjusted customer spend.
sql_query(
    "tpcds_returns_adjusted_spend",
    """
    WITH adj AS (
      SELECT o_custkey,
             CAST(sum(CASE WHEN l_returnflag = 'R'
                           THEN CAST(0 AS DECIMAL(12,2))
                           ELSE CAST(l_extendedprice AS DECIMAL(12,2)) END)
                  AS DOUBLE) AS kept_spend,
             CAST(sum(CASE WHEN l_returnflag = 'R'
                           THEN CAST(l_extendedprice AS DECIMAL(12,2))
                           ELSE CAST(0 AS DECIMAL(12,2)) END)
                  AS DOUBLE) AS returned_spend
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey
    )
    SELECT o_custkey,
           CAST(round(kept_spend, 2) AS DOUBLE) AS kept_spend,
           CAST(round(returned_spend, 2) AS DOUBLE) AS returned_spend
    FROM adj
    WHERE returned_spend > kept_spend AND returned_spend > 100000
    ORDER BY returned_spend DESC, o_custkey
    LIMIT 50
    """,
    doc="TPC-DS q93 shape: returns-adjusted spend per customer "
        "(conditional decimal sums over the fact join), filtered to "
        "return-heavy customers, top-50.",
    tags=("tpcds",),
)

# q5 shape: multi-channel UNION ALL rolled up with margins.
sql_query(
    "tpcds_channel_union_rollup",
    """
    WITH ch AS (
      SELECT 'orders' AS channel, o_orderpriority AS grp,
             CAST(o_totalprice AS DECIMAL(14,2)) AS amt
      FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT 'returns' AS channel, l_returnflag AS grp,
             CAST(l_extendedprice AS DECIMAL(14,2)) AS amt
      FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT channel, grp,
           CAST(sum(amt) AS DOUBLE) AS total,
           CAST(count(*) AS BIGINT) AS n,
           grouping(channel) + grouping(grp) AS lvl
    FROM ch
    GROUP BY ROLLUP(channel, grp)
    ORDER BY lvl, channel NULLS LAST, grp NULLS LAST
    """,
    doc="TPC-DS q5 shape: two 'channels' unioned (sales vs returns) "
        "then ROLLUP over (channel, group) with per-level margins — "
        "UNION ALL interleaving (LocalExecutionPlanner.java visitUnion) "
        "feeding GroupIdOperator.java expansion.",
    tags=("tpcds",),
)

# q14 shape: cross-channel item intersection feeding an aggregate.
sql_query(
    "tpcds_cross_channel_intersect",
    """
    WITH seg_a AS (
      SELECT DISTINCT l_partkey AS pk
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
    ),
    seg_b AS (
      SELECT DISTINCT l_partkey AS pk
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '5-LOW'
    ),
    both_ch AS (SELECT pk FROM seg_a INTERSECT SELECT pk FROM seg_b)
    SELECT CAST(count(*) AS BIGINT) AS n_cross_parts,
           CAST(round(avg(p_retailprice), 2) AS DOUBLE) AS avg_price,
           CAST(round(max(p_retailprice), 2) AS DOUBLE) AS max_price
    FROM part
    WHERE p_partkey IN (SELECT pk FROM both_ch)
    """,
    doc="TPC-DS q14 shape: the cross-channel item set (INTERSECT of "
        "per-channel DISTINCT part sets — ImplementIntersectAndExcept"
        "AsUnion.java lowering) gating a dimension aggregate via IN "
        "(semi join).",
    tags=("tpcds",),
)

# q86 shape: ROLLUP + rank WITHIN PARENT (window partitioned by the
# grouping level AND the parent key).
sql_query(
    "tpcds_rank_within_parent",
    """
    WITH m AS (
      SELECT r_name, n_name,
             CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal,
             grouping(n_name) AS g
      FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
    )
    SELECT r_name, n_name, bal, g,
           rank() OVER (PARTITION BY g, CASE WHEN g = 0 THEN r_name END
                        ORDER BY bal DESC) AS rank_within_parent
    FROM m
    ORDER BY g DESC, r_name NULLS LAST, rank_within_parent, n_name NULLS LAST
    """,
    doc="TPC-DS q86 shape: rank_within_parent — rollup margins ranked "
        "inside their parent grouping (window PARTITION BY grouping "
        "level + parent key), the canonical windows-over-rollup "
        "interplay (GroupIdOperator.java + WindowOperator.java).",
    tags=("tpcds",),
)

# q12 shape: revenue share via ratio-to-report window over an agg.
sql_query(
    "tpcds_revenue_share_window",
    """
    WITH t AS (
      SELECT l_returnflag,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS rev
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(round(rev, 2) AS DOUBLE) AS rev,
           CAST(round(rev / CAST(sum(CAST(rev AS DECIMAL(18,2))) OVER ()
                              AS DOUBLE), 6) AS DOUBLE) AS share
    FROM t
    ORDER BY l_returnflag
    """,
    doc="TPC-DS q12 shape: ratio-to-report — per-flag revenue divided "
        "by an unpartitioned window total (exact DECIMAL window sum so "
        "the share is order-insensitive across engines).",
    tags=("tpcds",),
)

# q67-adjacent: CUBE margins + dense_rank per grouping-level cell.
sql_query(
    "tpcds_dense_rank_over_cube",
    """
    WITH m AS (
      SELECT l_returnflag AS rf, l_linestatus AS sm,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
             grouping(l_returnflag) AS grf, grouping(l_linestatus) AS gsm
      FROM lineitem
      GROUP BY CUBE(l_returnflag, l_linestatus)
    )
    SELECT rf, sm, qty, grf, gsm,
           dense_rank() OVER (PARTITION BY grf, gsm ORDER BY qty DESC) AS dr
    FROM m
    ORDER BY grf, gsm, dr, rf NULLS LAST, sm NULLS LAST
    """,
    doc="TPC-DS q67-adjacent: CUBE over (returnflag, linestatus) — all "
        "four grouping levels in one pass — then dense_rank within each "
        "level cell; exercises duplicate-total ranking determinism on "
        "rollup margins.",
    tags=("tpcds",),
)
