"""Range (interval-containment) join — binned, not nested-loop.

Spark lowers a `point BETWEEN start AND end` join predicate to a
broadcast-nested-loop or cartesian plan (the reference does the same —
theta predicates fall back to NestedLoopJoinOperator.java, SURVEY
§2.3), which is O(|points| x |intervals|) and dies at scale.  The
standard scale path is time binning:

  1. every interval is exploded to the bins it overlaps
     (``sequence(floor(start/w), floor(end/w))`` — cheap map-side);
  2. every point lands in exactly ONE bin (``floor(ts/w)``);
  3. equi-join on (keys..., bin) — a plain hash shuffle — then the
     exact BETWEEN predicate filters survivors.

Because each point has one bin, no dedup pass is needed.  Bin width
trades interval-replication (wide intervals / small bins) against
bin-population (narrow intervals / big bins); results are identical
for any width — pinned by a width-independence test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "_rj_bin"
_PID = "_rj_point_id"


def _us(col) -> "F.Column":
    # TIMESTAMP_NTZ → micros via the UTC-session timestamp (differences
    # and bucket ids are zone-free).
    return F.unix_micros(F.col(col).cast("timestamp"))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    by: tuple[str, ...] = (),
    bin_width_seconds: float = 3600.0,
    how: str = "inner",
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row whose
    [start, end] contains its timestamp (inclusive), equi-keyed on
    ``by``.  Column sets must be disjoint apart from ``by``."""
    clash = (set(points.columns) & set(intervals.columns)) - set(by)
    if clash:
        raise ValueError(f"overlapping non-key columns: {clash}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner/left: {how}")
    w = int(bin_width_seconds * 1e6)
    # For how='left' each point row gets a surrogate id BEFORE binning:
    # the unmatched side is then an anti-join on the id alone — null-safe
    # (a column-wise anti-join loses point rows containing NULLs, which
    # never compare equal) and multiplicity-preserving (duplicate point
    # rows stay distinct ids), shuffling one long instead of the full
    # row width.
    src = points if how == "inner" else points.withColumn(
        _PID, F.monotonically_increasing_id())
    iv = intervals.withColumn(
        _BIN,
        F.explode(F.sequence(
            F.floor(_us(start_col) / w), F.floor(_us(end_col) / w))),
    )
    pt = src.withColumn(_BIN, F.floor(_us(point_ts) / w))
    cond = [pt[c] == iv[c] for c in by] + [pt[_BIN] == iv[_BIN]]
    contained = (_us(point_ts) >= _us(start_col)) & (
        _us(point_ts) <= _us(end_col))
    matched = pt.join(iv, cond, "inner").where(contained)
    matched = matched.drop(iv[_BIN]).drop(pt[_BIN]).drop(
        *[iv[c] for c in by])
    if how == "inner":
        return matched
    # left: keep unmatched points with NULL interval columns
    missing = src.join(matched.select(_PID), on=_PID, how="left_anti")
    out = matched.unionByName(missing, allowMissingColumns=True)
    return out.drop(_PID)
