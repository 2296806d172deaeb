"""Two-level bottom-k selection — the scale-safe replacement for a
single ``row_number().over(Window.partitionBy(group).orderBy(key))``
over unbounded rows.

A bare per-group rank window sorts EVERY row of a group in ONE task:
for a global sketch/sample build (few or no groups) that is a
single-reducer sort of the whole table — the one shape that falls over
at 100 TB even though it is correct and fast at test scale
(VERDICT r6 "What's wrong #1").

Bottom-k by a total order is associative, so it distributes in two
bounded stages with identical results:

1. each input partition selects its own k-smallest per group locally —
   at most ``num_partitions × k`` rows per group survive;
2. final rank over the survivors with the original per-group window —
   now priced in k × partitions, not data size.

r15 optimization round (guide §2.4 — remove shuffles outright): stage 1
used to be a window keyed on ``(group, spark_partition_id())``, which
still paid a full Exchange of the RAW rows before the partition-local
rank.  It is now a batch-local ``mapInPandas`` pass (the partial-hull
pattern from geo_agg.py): raw rows never cross an exchange at all; only
the bounded survivors feed the final window.  Any partial grouping
composes exactly — bottom-k of bottom-ks over any cover of the input is
the global bottom-k — so batch boundaries (like the old partition
boundaries, which already varied with partitioning) cannot change the
result.

This is the same partial-then-final shape the repo already uses for
quantile sketches (qsketch.py two-level shard build) and geometry
aggregates (geo_agg.py partial hulls), applied to rank selection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bottom_k_rank_two_window(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    limit,
    rank_col: str = "__rk",
) -> DataFrame:
    """Original (r6–r14) form: stage 1 as a (group, partition-id)
    window.  Kept as the parity reference for the batch-local rewrite
    (pinned by test_bottom_k_rank_batch_local_matches_window)."""
    lim = limit if isinstance(limit, Column) else F.lit(limit)
    staged = df.withColumn("__bk_pid", F.spark_partition_id())
    w_part = Window.partitionBy(*group_cols, "__bk_pid").orderBy(*order_cols)
    survivors = (
        staged.withColumn("__bk_rk", F.row_number().over(w_part))
        .filter(F.col("__bk_rk") <= lim)
        .drop("__bk_pid", "__bk_rk")
    )
    w_final = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return survivors.withColumn(rank_col, F.row_number().over(w_final)).filter(
        F.col(rank_col) <= lim
    )


def bottom_k_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    limit,
    rank_col: str = "__rk",
) -> DataFrame:
    """Rows of ``df`` whose ASCENDING rank by ``order_cols`` within
    ``group_cols`` is ≤ ``limit``, with that final rank exposed as
    ``rank_col``.

    ``limit`` is an int or a Column (for per-group limits such as a
    merged sketch's smallest k; it must be constant within each group).
    Equivalent to the naive single window filter, but raw rows never
    cross an exchange: stage 1 keeps each Arrow batch's k-smallest per
    group locally, and only those bounded survivors shuffle into the
    final per-group window.

    Ordering + round-trip contract (what every caller satisfies): plain
    ascending order columns, non-NULL — the keys are md5/xxhash-derived
    longs or null-filtered values.  Frames carrying FLOAT/DOUBLE columns
    take the original two-window form instead: the pandas↔Arrow
    round-trip cannot distinguish NaN from NULL (a NaN value would come
    back NULL, and NaN's Spark sort position — greater than everything —
    is not pandas' NA position), so the batch-local stage is gated to
    the NaN-free-by-construction schemas the sketch/sample operators
    actually pass (longs, strings, decimals, dates).
    """
    lim = limit if isinstance(limit, Column) else F.lit(limit)
    d = df
    # Materialize order expressions and the limit as real columns so the
    # pandas stage sorts the exact values the final window ranks by.
    ocols = []
    for i, oc in enumerate(order_cols):
        name = f"__bk_o{i}"
        d = d.withColumn(name, oc if isinstance(oc, Column) else F.col(oc))
        ocols.append(name)
    d = d.withColumn("__bk_lim", lim.cast("long"))
    schema = d.schema
    if any(f.dataType.typeName() in ("float", "double") for f in schema.fields):
        return _bottom_k_rank_two_window(
            df, group_cols, order_cols, limit, rank_col)
    gcols = list(group_cols)

    def run(batches):
        import numpy as np
        import pandas as pd

        acc = None
        for pdf in batches:
            cur = (pd.concat([acc, pdf], ignore_index=True)
                   if acc is not None else pdf)
            cur = cur.sort_values(ocols, kind="mergesort",
                                  na_position="first")
            if gcols:
                pos = cur.groupby(gcols, sort=False, dropna=False).cumcount()
            else:  # global bottom-k: one implicit group
                pos = pd.Series(np.arange(len(cur)), index=cur.index)
            acc = cur[pos < cur["__bk_lim"]][list(schema.names)]
        if acc is not None and len(acc):
            yield acc

    survivors = d.mapInPandas(run, schema=schema)
    w_final = Window.partitionBy(*gcols).orderBy(*[F.col(c) for c in ocols])
    ranked = (
        survivors.withColumn(rank_col, F.row_number().over(w_final))
        .filter(F.col(rank_col) <= F.col("__bk_lim"))
        .drop("__bk_lim", *ocols)
    )
    # Claim barrier: without it, the window exchange's HashPartitioning
    # claim propagates out of this operator (through aggregates,
    # broadcast-join stream sides and unions), letting a downstream
    # SortMergeJoin elide its exchanges and zip stages with unequal
    # AQE-coalesced partition counts ("Can't zip RDDs with unequal
    # numbers of partitions" — reproduced in the setdigest merge path).
    # coalesce with an unreachable cap is a NARROW no-op that resets
    # the claim to UnknownPartitioning: no data moves, the partition
    # count and parallelism stay whatever the window stage had, and
    # every consumer plans its own exchanges from scratch (sketch-sized
    # input, so those are cheap).
    return ranked.coalesce(1 << 30)
