"""Parity pin for the r15 batch-local bottom_k_rank rewrite.

Stage 1 moved from a (group, spark_partition_id) window — which paid a
full Exchange of the raw rows — to a batch-local mapInPandas pass.  The
result must be IDENTICAL to the original two-window form: same rows,
same ranks, including the per-group Column limit, the global (no group
cols) shape, and Spark's NaN-greatest float ordering that pandas does
not share natively.
"""

import math

from pyspark.sql import functions as F

from presto_spark.operators._bottomk import (
    _bottom_k_rank_two_window,
    bottom_k_rank,
)


def _collected(df, keys):
    # repr-compare: NaN != NaN would fail tuple equality on identical rows
    return sorted([tuple(repr(x) for x in r) for r in df.collect()])


def test_bottom_k_rank_batch_local_matches_window(spark):
    rows = [(g, i, (i * 7919 + ord(g) * 104729) % 1000003)
            for g in ("a", "b", "c") for i in range(500)]
    df = spark.createDataFrame(rows, "g string, i long, h long").repartition(7)
    want = _bottom_k_rank_two_window(df, ["g"], ["h"], 17)
    got = bottom_k_rank(df, ["g"], ["h"], 17)
    assert _collected(got, ["g", "h"]) == _collected(want, ["g", "h"])


def test_bottom_k_rank_column_limit(spark):
    rows = [(g, i, (i * 7919 + g * 104729) % 1000003, g + 3)
            for g in (1, 2, 3) for i in range(300)]
    df = spark.createDataFrame(
        rows, "g long, i long, h long, k long").repartition(5)
    want = _bottom_k_rank_two_window(df, ["g"], ["h"], F.col("k"))
    got = bottom_k_rank(df, ["g"], ["h"], F.col("k"))
    assert _collected(got, ["g", "h"]) == _collected(want, ["g", "h"])


def test_bottom_k_rank_global_no_groups(spark):
    rows = [(i, (i * 7919) % 1000003) for i in range(1000)]
    df = spark.createDataFrame(rows, "i long, h long").repartition(6)
    want = _bottom_k_rank_two_window(df, [], ["h"], 25)
    got = bottom_k_rank(df, [], ["h"], 25)
    assert _collected(got, ["h"]) == _collected(want, ["h"])


def test_bottom_k_rank_float_nan_orders_like_spark(spark):
    # Float frames take the two-window fallback (the Arrow round-trip
    # would turn NaN into NULL and pandas' NA position is not Spark's
    # NaN-greatest), so NaN must still sort GREATER than every value:
    # with limit smaller than the non-NaN count no NaN row survives,
    # and with a larger limit NaN rows rank last.
    rows = ([("g", i, float(i)) for i in range(20)]
            + [("g", 100 + i, math.nan) for i in range(5)])
    df = spark.createDataFrame(rows, "g string, i long, v double").repartition(4)
    want = _bottom_k_rank_two_window(df, ["g"], [F.col("v"), F.col("i")], 22)
    got = bottom_k_rank(df, ["g"], [F.col("v"), F.col("i")], 22)
    assert _collected(got, ["v", "i"]) == _collected(want, ["v", "i"])
    small = bottom_k_rank(df, ["g"], [F.col("v"), F.col("i")], 10)
    assert all(not math.isnan(r.v) for r in small.collect())
