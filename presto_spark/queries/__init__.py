"""Query registry — importing this package registers all query suites.

The registry is the single source of truth consumed by
``__spark_entry__.py`` (driver contract), ``tests/`` (differential
correctness), and ``bench.py`` (throughput).
"""

from presto_spark.queries.base import REGISTRY, Query

# Importing the suite modules populates REGISTRY via their module-level
# sql_query()/register() calls.
from presto_spark.queries import llm  # noqa: F401,E402
from presto_spark.queries import events_suite  # noqa: F401,E402
from presto_spark.queries import sketch_suite  # noqa: F401,E402
from presto_spark.queries import dml_suite  # noqa: F401,E402
from presto_spark.queries import presto_dialect_suite  # noqa: F401,E402
from presto_spark.queries import tpch  # noqa: F401,E402
from presto_spark.queries import relational  # noqa: F401,E402
from presto_spark.queries import functions_suite  # noqa: F401,E402
from presto_spark.queries import functions_suite2  # noqa: F401,E402
from presto_spark.queries import tpcds_suite  # noqa: F401,E402
from presto_spark.queries import geo_suite  # noqa: F401,E402

# Driver-window rotation: the driver's correctness harness samples the
# first 50 registry entries each round, so registry ORDER decides which
# queries earn a hard CORRECTNESS row.  Cumulative state after round 6:
# every registry query checked at least once, 206/206 green on latest
# status.  Round-7 front (VERDICT r6 #9): the 23 queries written in
# round 7 (SFM sketch family, convex-polygon overlay golden,
# simplify/flatten golden, TPC-DS q5/q29/q49/q63/q14/q51/q17/q39/
# q44/q54/q58/q59/q6/q87/q97/q66/q64) plus geo_union_agg_golden, llm_c4_line_filters,
# and geo_buffer_polygon_golden; 12 re-rows for
# queries whose SEMANTICS changed this round (shift saturation +
# private-IP list + uuid/timezone columns in the function tails,
# classification fail-on-out-of-range + empty-group spine, and the
# two-level bottom-k rebuild under reservoir/theta/setdigest/khll) —
# their recorded greens describe the old texts (fn_binary_suite2
# re-fronts for the round-7 FNV/crc32 columns); and 15 of the 19 rows
# last checked in round 1.  Remaining re-check debt after this window:
# 42 r3-checked + 4 r1 rows (sample_bernoulli_envelope,
# lateral_top_orders_per_nation, window_groups_frame_emulation,
# analytics_market_basket) — they lead the r8 front.
_DRIVER_FRONT = [
    # 23 new round-7 queries (never driver-checked by construction)
    "sketch_sfm_exact_ops",
    "geo_overlay_polygon_golden",
    "geo_simplify_flatten_golden",
    "tpcds_q5_channel_rollup_report",
    "tpcds_q29_sold_returned_resold",
    "tpcds_q49_worst_return_ratios",
    "tpcds_q63_monthly_vs_avg_buckets",
    "tpcds_q14_cross_channel_intersect_sales",
    "tpcds_q51_cumulative_channel_compare",
    "tpcds_q17_quantity_variation_stats",
    "tpcds_q39_consecutive_month_variance",
    "tpcds_q44_best_worst_rank_join",
    "tpcds_q54_spend_segment_histogram",
    "tpcds_q58_channel_parity_band",
    "tpcds_q59_weekday_pivot_yoy",
    "geo_union_agg_golden",
    "llm_c4_line_filters",
    "tpcds_q6_above_category_average",
    "geo_buffer_polygon_golden",
    "tpcds_q87_except_chain_count",
    "tpcds_q97_channel_overlap_matrix",
    "tpcds_q66_monthly_pivot_report",
    "tpcds_q64_cross_year_repeat_purchases",
    # 12 re-rows: semantics/build changed in round 7
    "fn_bitwise_shift_suite",
    "fn_ip_prefix_suite2",
    "fn_misc_scalar_tail",
    "agg_classification_curves",
    "agg_reservoir_sample_envelope",
    "agg_reservoir_vasicek_entropy",
    "sketch_theta_exact_ops",
    "sketch_theta_estimate_envelope",
    "sketch_setdigest_exact_ops",
    "sketch_setdigest_minhash_envelope",
    "sketch_khll_privacy_audit",
    "fn_binary_suite2",
    # 15 stalest rows (last driver row: round 1)
    "window_top_n_per_group",
    "agg_rollup",
    "agg_grouping_sets",
    "agg_distinct_and_filter",
    "setop_union_intersect_except",
    "setop_intersect_except_all",
    "unnest_with_ordinality",
    "unnest_multi_array_zip",
    "sort_limit_offset",
    "distinct_limit",
    "sort_nulls_ordering",
    "subquery_scalar_uncorrelated",
    "subquery_correlated_scalar",
    "subquery_in_uncorrelated",
    "values_inline_table",
]


def _rotate(front: list[str]) -> None:
    missing = [n for n in front if n not in REGISTRY]
    if missing:
        raise KeyError(f"_DRIVER_FRONT names not in REGISTRY: {missing}")
    ordered = {n: REGISTRY[n] for n in front}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_rotate(_DRIVER_FRONT)

__all__ = ["REGISTRY", "Query"]
