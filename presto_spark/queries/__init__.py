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
# queries earn a hard CORRECTNESS row.  After round 5 every registry
# query has at least one driver row (182/182 checked; 179 green).
# Round-6 front: the 3 round-5 red rows, now fixed (ANSI parity +
# try_element_at for the unnest ERR; dtype-stable string/BIGINT
# emission for the two hash flakes) and needing green re-rows; the 24
# queries written in round 6 (theta ×2, KLL, T-Digest, reservoir
# sample, differential entropy ×2, the binary/scalar/bitwise/IP
# tails, geometry aggregates + nearest points + point-tier overlay,
# SQL-invoked plugin tail, classification curves, repetition/PII
# corpus hygiene, geometry validity, TPC-DS q1/q23/q33/q78); and the 23
# stalest rows — all last
# checked in round 1 — so re-check debt stops accumulating at the old
# end of the registry (r5 verdict #9).  The 19 remaining r1-stale rows
# (window_top_n_per_group, agg_rollup, agg_grouping_sets,
# agg_distinct_and_filter,
# setop_union_intersect_except,
# setop_intersect_except_all,
# unnest_with_ordinality,
# unnest_multi_array_zip, sort_limit_offset,
# distinct_limit, sort_nulls_ordering,
# subquery_scalar_uncorrelated, subquery_correlated_scalar,
# subquery_in_uncorrelated, values_inline_table,
# analytics_market_basket, sample_bernoulli_envelope,
# lateral_top_orders_per_nation, window_groups_frame_emulation) lead
# the round-7 front.
_DRIVER_FRONT = [
    # 3 round-5 red rows, fixed this round (VERDICT r5 #1-#3)
    "presto_dialect_unnest_ordinality",
    "agg_misc_suite",
    "fn_decimal_cast_suite",
    # 24 new round-6 queries (never driver-checked by construction)
    "sketch_theta_exact_ops",
    "sketch_theta_estimate_envelope",
    "sketch_kll_exact_ops",
    "sketch_tdigest_exact_ops",
    "agg_reservoir_sample_envelope",
    "agg_differential_entropy_histogram",
    "agg_reservoir_vasicek_entropy",
    "fn_binary_suite2",
    "geo_aggregate_hulls",
    "presto_dialect_sql_invoked_suite3",
    "geo_nearest_expand_golden",
    "geo_overlay_point_tier_golden",
    "geo_validity_golden",
    "tpcds_q23_frequent_items_best_customers",
    "tpcds_q78_channel_ratio",
    "tpcds_q1_above_average_returns",
    "tpcds_q33_multi_channel_union_sum",
    "llm_repetition_filters",
    "llm_pii_redaction",
    "fn_misc_scalar_tail",
    "agg_union_tail_suite",
    "agg_classification_curves",
    "fn_ip_prefix_suite2",
    "fn_bitwise_shift_suite",
    # 23 stalest rows (last driver row: round 1)
    "q02_minimum_cost_supplier",
    "q10_returned_items",
    "q11_important_stock",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_part_supplier_relation",
    "q17_small_quantity_order",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q20_potential_part_promotion",
    "q21_suppliers_who_kept_waiting",
    "q22_global_sales_opportunity",
    "join_full_outer",
    "join_right_outer",
    "join_semi_anti",
    "join_cross",
    "join_theta_inequality",
    "join_multi_key_with_residual",
    "window_ranking",
    "window_value_functions",
    "window_aggregate_frames",
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
