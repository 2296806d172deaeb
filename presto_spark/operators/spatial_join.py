"""Grid-binned spatial join (points-in-polygons at scale).

Reference: SpatialJoinOperator.java + PartitionedSpatialJoin in
presto-main-base (the reference builds an R-tree over the build side
and, in distributed mode, partitions both sides by a KdbTree so each
probe only meets co-located build geometries —
presto-geospatial-toolkit/.../KdbTree.java).

Spark-first equivalent: a uniform grid instead of a KdbTree.

1. Each polygon is exploded to every grid cell its bounding box
   overlaps (bbox from ST_Envelope; replication factor =
   ceil(w/cell) × ceil(h/cell), small for localized geometries).
2. Each point maps to exactly ONE cell.
3. Equi-join on the (cx, cy) cell key — a plain hash shuffle/broadcast
   join, never a cartesian product.
4. Exact even-odd containment verify on the candidates only.

Because a point lives in a single cell, a (point, polygon) pair can
meet in at most one cell — no post-join dedup.  At 100 TB the shuffle
carries points once and polygons ×replication; pick cell_size near the
typical polygon diameter to keep replication O(1) per polygon.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from presto_spark.functions import geo


def _cell(v: Column, cell_size: float) -> Column:
    return F.floor(v / F.lit(float(cell_size))).cast("long")


def spatial_join_points_in_polygons(
    points: DataFrame,
    polygons: DataFrame,
    x_col: str,
    y_col: str,
    geom_col: str,
    cell_size: float,
    broadcast_polygons: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to the polygon rows that contain them.

    ``how='left'`` keeps unmatched points with NULL polygon columns
    (outer-row completion via a unique point id, so duplicate point
    rows keep their multiplicity — same discipline as
    operators/range_join.py).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    g = F.col(geom_col)
    binned_polys = (
        polygons.withColumn("__env", geo.st_envelope(g))
        .withColumn(
            "__cx",
            F.explode(
                F.sequence(
                    _cell(F.col("__env.xmin"), cell_size),
                    _cell(F.col("__env.xmax"), cell_size),
                )
            ),
        )
        .withColumn(
            "__cy",
            F.explode(
                F.sequence(
                    _cell(F.col("__env.ymin"), cell_size),
                    _cell(F.col("__env.ymax"), cell_size),
                )
            ),
        )
        .drop("__env")
    )
    if broadcast_polygons:
        binned_polys = F.broadcast(binned_polys)
    tagged = points.withColumn("__pid", F.monotonically_increasing_id())
    keyed = tagged.withColumn("__cx", _cell(F.col(x_col), cell_size)).withColumn(
        "__cy", _cell(F.col(y_col), cell_size)
    )
    matched = keyed.join(binned_polys, ["__cx", "__cy"]).filter(
        geo.st_contains_point(g, F.col(x_col), F.col(y_col))
    )
    if how == "inner":
        return matched.drop("__cx", "__cy", "__pid")
    unmatched = keyed.join(
        matched.select("__pid").distinct(), "__pid", "left_anti"
    )
    return matched.drop("__cx", "__cy", "__pid").unionByName(
        unmatched.drop("__cx", "__cy", "__pid"), allowMissingColumns=True
    )
