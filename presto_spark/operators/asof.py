"""As-of (time-travel) join — a custom operator Spark's join menu lacks.

The reference engine has no dedicated as-of/range join either (theta
predicates fall back to nested-loop join — SURVEY §2.3 range-join row),
but a time-ordered "most recent right row at or before each left row"
lookup is the workhorse of event/state enrichment at training-data
scale, so the engine ships it as a first-class operator.

Implementation is the union-marker pattern, NOT a per-key loop or a
range self-join:

  1. union the probe (left) and reference (right) rows with a side
     marker, right rows first within a timestamp tie (backward join is
     inclusive: right.ts == left.ts matches);
  2. one window per key ordered by (ts, side), carrying the last right
     row forward as a SINGLE struct (``last(struct(ts, values...),
     ignorenulls=True)``) — one struct per matched row, so every value
     column comes from the same right row and a legitimately-NULL value
     field of the matched row stays NULL (pandas.merge_asof contract)
     instead of being skipped for an older row's value;
  3. keep only left rows and unpack the struct.

Cost at scale: ONE hash shuffle on the key columns + a per-partition
sort — the same price as a regular sort-merge join, with no risk of
the O(|left| x |right per key|) blowup a range-predicate join incurs.
Skewed keys are AQE's problem, same as any keyed window.

``tolerance`` (seconds) nulls out matches older than the window,
mirroring pandas.merge_asof semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_is_left"
_RTS = "_asof_right_ts"
_PAY = "_asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: tuple[str, ...],
    value_cols: tuple[str, ...],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Enrich each ``left`` row with ``value_cols`` from the most recent
    ``right`` row at-or-before it (``backward``) or the earliest
    at-or-after it (``forward``), per ``by`` key.

    ``value_cols`` must not collide with ``left`` columns — rename on
    the right side first (keeps the collision decision explicit).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {clash}")

    rm = right.select(
        *by, F.col(time_col), *[F.col(c) for c in value_cols]
    ).withColumn(_SIDE, F.lit(0)).withColumn(_RTS, F.col(time_col))
    lm = left.withColumn(_SIDE, F.lit(1))
    u = lm.unionByName(rm, allowMissingColumns=True)

    if direction == "backward":
        # right rows sort before left rows on ties → ts_right == ts_left
        # matches; carry the last right payload forward.
        w = (Window.partitionBy(*by)
             .orderBy(F.col(time_col).asc(), F.col(_SIDE).asc())
             .rowsBetween(Window.unboundedPreceding, 0))
    else:
        w = (Window.partitionBy(*by)
             .orderBy(F.col(time_col).desc(), F.col(_SIDE).asc())
             .rowsBetween(Window.unboundedPreceding, 0))

    # One struct per right row: last(..., ignorenulls) skips left rows
    # (NULL struct) but carries a matched right row whole, NULL fields
    # included.  Per-column carries would skip a NULL payload field and
    # substitute a stale older value — wrong (merge_asof returns the
    # matched row's NULL) and could mix columns from different rows.
    payload = F.when(
        F.col(_SIDE) == 0,
        F.struct(F.col(_RTS).alias(_RTS),
                 *[F.col(c).alias(c) for c in value_cols]),
    )
    u = u.withColumn(_PAY, F.last(payload, ignorenulls=True).over(w))
    u = u.withColumns(
        {c: F.col(f"{_PAY}.{c}") for c in (*value_cols, _RTS)}
    ).drop(_PAY)

    if tolerance_seconds is not None:
        # TIMESTAMP_NTZ has no direct numeric cast — go through the
        # (UTC-session) timestamp to micros; differences are zone-free.
        def _us(c):
            return F.unix_micros(F.col(c).cast("timestamp"))

        gap = F.abs(_us(time_col) - _us(_RTS))
        in_tol = F.col(_RTS).isNotNull() & (
            gap <= F.lit(float(tolerance_seconds) * 1e6))
        u = u.withColumns(
            {c: F.when(in_tol, F.col(c)) for c in value_cols})

    return u.where(F.col(_SIDE) == 1).drop(_SIDE, _RTS)
