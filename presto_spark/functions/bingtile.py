"""Bing tile functions (Web-Mercator quadtree addressing).

Reference: presto-main-base/.../geospatial/BingTileUtils.java +
BingTile.java + BingTileFunctions.java.  A Bing tile is the quadtree
cell of the Web-Mercator projection at a zoom level (1..23); Presto
uses it as the standard spatial bucketing device (tile-aggregate, tile
join, tile → polygon).

All functions are JVM-side Column expressions over a plain
``struct<x:int, y:int, z:int>`` tile value:

* ``bing_tile(x, y, zoom)`` / ``bing_tile(quadKey)``
  (BingTileFunctions.java toBingTile) — constructor / quadkey parse.
* ``bing_tile_at(lat, lon, zoom)`` (BingTileUtils.java:150-198):
  pixelX = ((lon+180)/360)·mapSize, pixelY from the Mercator
  log-formula, both clipped to [0, mapSize−1], tile = pixel / 256;
  mapSize = 256·2^zoom.  Latitude valid in ±85.05112878
  (BingTileUtils.java:48), zoom ≤ 23 (BingTile.java:32); out-of-range
  → NULL (expression-level spelling of checkCondition).
* ``bing_tile_quadkey(tile)`` (BingTile.java:143-158): base-4 digit
  per zoom bit, x contributes bit 0, y bit 1.
* ``bing_tile_coordinates(tile)`` / ``bing_tile_zoom_level(tile)``.
* ``bing_tile_polygon(tile)`` (BingTileUtils.java:99-132
  tileToEnvelope): the tile's lat/lon rectangle as a POLYGON geometry
  (functions/geo.py representation) — west edge from tileX, north edge
  from tileY via the inverse Mercator formula.
* ``bing_tiles_around(lat, lon, zoom)`` (BingTileFunctions.java
  bingTilesAround): the ≤3×3 neighborhood clipped at the map edge.

Scale: map-side expression work only.  Tile-bucketed aggregation/joins
shuffle on (x, y, z) ints — the same grid-join discipline as
operators/spatial_join.py with Mercator cells instead of uniform ones.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_ZOOM = 23  # BingTile.java:32
MIN_LATITUDE = -85.05112878  # BingTileUtils.java:48-49
MAX_LATITUDE = 85.05112878


def bing_tile(x: Column, y: Column, zoom: Column) -> Column:
    """bing_tile(x, y, zoom) constructor."""
    return F.struct(
        x.cast("int").alias("x"), y.cast("int").alias("y"), zoom.cast("int").alias("z")
    )


def bing_tile_from_quadkey(quadkey: Column) -> Column:
    """bing_tile(quadKey) (BingTile.java:96-120 fromQuadKey): digit i
    (base 4, '0'..'3') carries bit (z−i) of x (low bit) and y (high
    bit).  Invalid digits or length > 23 → NULL."""
    z = F.length(quadkey)
    digits = F.transform(
        F.sequence(F.lit(1), z),
        lambda i: F.ascii(F.substring(quadkey, i, 1)) - 48,
    )
    valid = (z > 0) & (z <= MAX_ZOOM) & F.forall(
        digits, lambda d: (d >= 0) & (d <= 3)
    )
    idx = F.sequence(F.lit(1), z)
    x = F.aggregate(
        idx,
        F.lit(0),
        lambda acc, i: acc
        + (F.element_at(digits, i) % 2)
        * F.pow(F.lit(2.0), (z - i).cast("double")).cast("int"),
    )
    y = F.aggregate(
        idx,
        F.lit(0),
        lambda acc, i: acc
        + F.floor(F.element_at(digits, i) / 2).cast("int")
        * F.pow(F.lit(2.0), (z - i).cast("double")).cast("int"),
    )
    return F.when(valid, bing_tile(x, y, z))


def _axis_to_tile(axis: Column, zoom: Column) -> Column:
    """axisToCoordinates (BingTileUtils.java:192-196): pixel =
    clip(axis·mapSize, 0, mapSize−1), tile = pixel / 256."""
    map_size = 256.0 * F.pow(F.lit(2.0), zoom.cast("double"))
    px = F.least(F.greatest(axis * map_size, F.lit(0.0)), map_size - 1.0)
    return F.floor(px / 256.0).cast("int")


def bing_tile_at(lat: Column, lon: Column, zoom: Column) -> Column:
    """bing_tile_at(latitude, longitude, zoom)
    (BingTileUtils.java:150-198)."""
    valid = (
        (lat >= MIN_LATITUDE)
        & (lat <= MAX_LATITUDE)
        & (lon >= -180)
        & (lon <= 180)
        & (zoom > 0)
        & (zoom <= MAX_ZOOM)
    )
    x_axis = (lon + 180.0) / 360.0
    sin_lat = F.sin(lat * math.pi / 180.0)
    y_axis = 0.5 - F.log((1.0 + sin_lat) / (1.0 - sin_lat)) / (4.0 * math.pi)
    return F.when(
        valid,
        bing_tile(_axis_to_tile(x_axis, zoom), _axis_to_tile(y_axis, zoom), zoom),
    )


def bing_tile_quadkey(tile: Column) -> Column:
    """bing_tile_quadkey(tile) (BingTile.java:143-158)."""
    x, y, z = tile["x"], tile["y"], tile["z"]
    digits = F.transform(
        F.sequence(z, F.lit(1), F.lit(-1)),
        lambda i: F.chr(
            (F.lit(48)
             + (F.floor(x / F.pow(F.lit(2.0), (i - 1).cast("double"))).cast("int") % 2)
             + 2 * (F.floor(y / F.pow(F.lit(2.0), (i - 1).cast("double"))).cast("int") % 2)
             ).cast("bigint")
        ),
    )
    return F.array_join(digits, "")


def bing_tile_coordinates(tile: Column) -> Column:
    """bing_tile_coordinates(tile) → row(x, y)
    (BingTileFunctions.java bingTileCoordinates)."""
    return F.struct(tile["x"].alias("x"), tile["y"].alias("y"))


def bing_tile_zoom_level(tile: Column) -> Column:
    return tile["z"]


def _tile_x_to_longitude(x: Column, zoom: Column) -> Column:
    """West edge longitude (BingTileUtils.java:99-104)."""
    map_tile = F.pow(F.lit(2.0), zoom.cast("double"))
    clipped = F.least(F.greatest(x.cast("double"), F.lit(0.0)), map_tile)
    return 360.0 * (clipped / map_tile - 0.5)


def _tile_y_to_latitude(y: Column, zoom: Column) -> Column:
    """North edge latitude (BingTileUtils.java:109-114)."""
    map_tile = F.pow(F.lit(2.0), zoom.cast("double"))
    clipped = F.least(F.greatest(y.cast("double"), F.lit(0.0)), map_tile)
    yy = 0.5 - clipped / map_tile
    return 90.0 - 360.0 * F.atan(F.exp(-yy * 2.0 * math.pi)) / math.pi


def bing_tile_polygon(tile: Column) -> Column:
    """bing_tile_polygon(tile) (BingTileUtils.java:124-132
    tileToEnvelope) as a POLYGON geometry (functions/geo.py struct)."""
    x, y, z = tile["x"], tile["y"], tile["z"]
    min_x = _tile_x_to_longitude(x, z)
    max_x = _tile_x_to_longitude(x + 1, z)
    max_y = _tile_y_to_latitude(y, z)
    min_y = _tile_y_to_latitude(y + 1, z)
    pt = lambda px, py: F.struct(px.alias("x"), py.alias("y"))  # noqa: E731
    ring = F.array(
        pt(min_x, min_y), pt(max_x, min_y), pt(max_x, max_y),
        pt(min_x, max_y), pt(min_x, min_y),
    )
    return F.struct(F.lit("POLYGON").alias("kind"), F.array(ring).alias("rings"))


def bing_tiles_around(lat: Column, lon: Column, zoom: Column) -> Column:
    """bing_tiles_around(lat, lon, zoom) (BingTileFunctions.java
    bingTilesAround): the center tile's ≤3×3 neighborhood, clipped to
    the [0, 2^zoom) tile grid."""
    center = bing_tile_at(lat, lon, zoom)
    max_tile = F.pow(F.lit(2.0), zoom.cast("double")).cast("int") - 1
    offsets = F.sequence(F.lit(-1), F.lit(1))
    cx, cy = center["x"], center["y"]
    pairs = F.flatten(
        F.transform(
            offsets,
            lambda dx: F.transform(
                offsets,
                lambda dy: F.struct((cx + dx).alias("x"), (cy + dy).alias("y")),
            ),
        )
    )
    kept = F.filter(
        pairs,
        lambda p: (p["x"] >= 0)
        & (p["x"] <= max_tile)
        & (p["y"] >= 0)
        & (p["y"] <= max_tile),
    )
    return F.transform(kept, lambda p: bing_tile(p["x"], p["y"], zoom))


def geometry_to_bing_tiles(geom: Column, zoom: Column) -> Column:
    """geometry_to_bing_tiles(geometry, zoom) →
    array<struct<x,y,z>> (BingTileFunctions.java geometryToBingTiles).

    Pinned deviation: returns the tile cover of the geometry's
    ENVELOPE (the reference refines the envelope cover by per-tile
    geometry intersection; without the overlay algebra the envelope
    cover — a superset, exact for points and rectangles — is the
    honest tier).  Pure Column expressions: two corner tiles plus a
    sequence cross-product, map-side only.
    """
    from presto_spark.functions import geo as _g

    nw = bing_tile_at(_g.st_ymax(geom), _g.st_xmin(geom), zoom)
    se = bing_tile_at(_g.st_ymin(geom), _g.st_xmax(geom), zoom)
    # North (ymax) → smaller tile y: nw.y .. se.y ascends.
    return F.flatten(
        F.transform(
            F.sequence(nw["x"], se["x"]),
            lambda tx: F.transform(
                F.sequence(nw["y"], se["y"]),
                lambda ty: F.struct(
                    tx.cast("int").alias("x"),
                    ty.cast("int").alias("y"),
                    nw["z"].alias("z"),
                ),
            ),
        )
    )


def bing_tile_parent(tile: Column, new_zoom: Column | int | None = None) -> Column:
    """bing_tile_parent(tile[, newZoom]) (BingTileFunctions.java
    parent): the ancestor tile at newZoom (default z−1) — each zoom
    step halves the coordinates.  NULL when newZoom is negative or
    deeper than the tile's own zoom (expression-level checkCondition)."""
    nz = (F.lit(int(new_zoom)) if isinstance(new_zoom, int)
          else new_zoom if new_zoom is not None else tile["z"] - 1)
    shift = F.pow(F.lit(2.0), (tile["z"] - nz).cast("double")).cast("bigint")
    return F.when(
        (nz >= 0) & (nz <= tile["z"]),
        bing_tile((tile["x"] / shift).cast("int"),
                  (tile["y"] / shift).cast("int"), nz),
    )


def bing_tile_children(tile: Column, new_zoom: Column | int | None = None) -> Column:
    """bing_tile_children(tile[, newZoom]) → array of descendant tiles
    at newZoom (default z+1) (BingTileFunctions.java children).  NULL
    when newZoom is above the tile's zoom or beyond MAX_ZOOM."""
    nz = (F.lit(int(new_zoom)) if isinstance(new_zoom, int)
          else new_zoom if new_zoom is not None else tile["z"] + 1)
    span = F.pow(F.lit(2.0), (nz - tile["z"]).cast("double")).cast("bigint")
    base_x = tile["x"].cast("bigint") * span
    base_y = tile["y"].cast("bigint") * span
    return F.when(
        (nz >= tile["z"]) & (nz <= MAX_ZOOM),
        F.flatten(F.transform(
            F.sequence(F.lit(0), span - 1),
            lambda dx: F.transform(
                F.sequence(F.lit(0), span - 1),
                lambda dy: bing_tile(base_x + dx, base_y + dy, nz),
            ),
        )),
    )


def bing_tiles_around_radius(
    lat: Column, lon: Column, zoom: Column, radius_km: Column | float
) -> Column:
    """bing_tiles_around(lat, lon, zoom, radius_km)
    (BingTileFunctions.java:230-365): the center cross — the
    horizontal tile run at the center row and the vertical run at the
    center column, spans from haversine displacements due
    N/S/E/W (:494-542, R = 6371.01 km) — plus every quadrant tile
    whose center-facing corner lies within the great-circle radius
    (the reference's corner-trimming loops, made declarative: the
    include flag there is monotone toward the center, so membership
    reduces to the per-tile corner distance test).  Date-line wrap is
    handled on the x runs via modular tile arithmetic.  NULL for
    invalid lat/lon/zoom or radius outside [0, 1000]
    (expression-level checkCondition)."""
    import math as _m

    from presto_spark.functions.geo import EARTH_RADIUS_KM, great_circle_distance

    r = radius_km if isinstance(radius_km, Column) else F.lit(float(radius_km))
    rr = r / EARTH_RADIUS_KM
    phi = lat * _m.pi / 180.0
    lam = lon * _m.pi / 180.0
    top_lat = F.least(
        F.greatest(
            F.degrees(F.asin(F.sin(phi) * F.cos(rr)
                             + F.cos(phi) * F.sin(rr))),
            F.lit(MIN_LATITUDE)),
        F.lit(MAX_LATITUDE))
    bottom_lat = F.least(
        F.greatest(
            F.degrees(F.asin(F.sin(phi) * F.cos(rr)
                             - F.cos(phi) * F.sin(rr))),
            F.lit(MIN_LATITUDE)),
        F.lit(MAX_LATITUDE))
    dlon = F.atan2(F.sin(rr) * F.cos(phi),
                   F.cos(rr) - F.sin(phi) * F.sin(phi))
    wrap = lambda x: F.when(x > 180.0, x - 360.0).when(  # noqa: E731
        x < -180.0, x + 360.0).otherwise(x)
    center = bing_tile_at(lat, lon, zoom)
    top = bing_tile_at(top_lat, lon, zoom)
    bottom = bing_tile_at(bottom_lat, lon, zoom)
    left = bing_tile_at(lat, wrap(F.degrees(lam - dlon)), zoom)
    right = bing_tile_at(lat, wrap(F.degrees(lam + dlon)), zoom)
    max_tile = F.pow(F.lit(2.0), zoom.cast("double")).cast("bigint") - 1
    cx, cy = center["x"].cast("bigint"), center["y"].cast("bigint")
    # run extents as non-negative counts (modular for the x axis)
    n_right = F.pmod(right["x"].cast("bigint") - cx, max_tile + 1)
    n_left = F.pmod(cx - left["x"].cast("bigint"), max_tile + 1)
    n_up = cy - top["y"].cast("bigint")
    n_down = bottom["y"].cast("bigint") - cy

    def seq(n):
        # sequence(1, 0) would count DOWN — guard emptiness explicitly
        return F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<bigint>"))

    row_run = F.concat(
        F.array(center),
        F.transform(seq(n_right),
                    lambda i: bing_tile(F.pmod(cx + i, max_tile + 1),
                                        cy, zoom)),
        F.transform(seq(n_left),
                    lambda i: bing_tile(F.pmod(cx - i, max_tile + 1),
                                        cy, zoom)),
    )
    col_run = F.concat(
        F.transform(seq(n_up), lambda j: bing_tile(cx, cy - j, zoom)),
        F.transform(seq(n_down), lambda j: bing_tile(cx, cy + j, zoom)),
    )

    def quadrant(nx, ny, x_of, y_of, corner_dx, corner_dy):
        # tiles (x_of(i), y_of(j)) kept when the center-facing corner
        # (tile x+corner_dx, tile y+corner_dy in tile units) lies
        # within the great-circle radius.
        def keep(t):
            corner_lat = _tile_y_to_latitude(
                t["y"].cast("bigint") + corner_dy, zoom)
            corner_lon = _tile_x_to_longitude(
                t["x"].cast("bigint") + corner_dx, zoom)
            return great_circle_distance(
                lat, lon, corner_lat, corner_lon) <= r

        return F.flatten(F.transform(
            seq(nx),
            lambda i: F.filter(
                F.transform(seq(ny), lambda j: bing_tile(
                    F.pmod(x_of(i), max_tile + 1), y_of(j), zoom)),
                keep,
            ),
        ))

    # corner offsets: the corner of the tile CLOSEST to the center
    q_tr = quadrant(n_right, n_up,
                    lambda i: cx + i, lambda j: cy - j, 0, 1)
    q_br = quadrant(n_right, n_down,
                    lambda i: cx + i, lambda j: cy + j, 0, 0)
    q_tl = quadrant(n_left, n_up,
                    lambda i: cx - i, lambda j: cy - j, 1, 1)
    q_bl = quadrant(n_left, n_down,
                    lambda i: cx - i, lambda j: cy + j, 1, 0)
    valid = (r >= 0) & (r <= 1000) & center.isNotNull()
    return F.when(
        valid, F.concat(row_run, col_run, q_tr, q_br, q_tl, q_bl))


def geometry_to_dissolved_bing_tiles(geom: Column, max_zoom: Column) -> Column:
    """geometry_to_dissolved_bing_tiles(geometry, maxZoom)
    (BingTileFunctions.java geometryToDissolvedBingTiles): the
    max-zoom cover with every complete 4-sibling group replaced by its
    parent, repeated up the quadtree.  Same pinned envelope-cover tier
    as geometry_to_bing_tiles (the reference dissolves the true
    geometry cover); the dissolve itself is exact: a bounded fold over
    the ≤23 zoom levels, each level replacing sibling-complete groups
    via membership tests over that level's tiles (O(n²) array work per
    level, priced in cover size)."""
    base = geometry_to_bing_tiles(geom, max_zoom)

    def step(acc, lvl):
        at_z = F.filter(acc, lambda t: t["z"] == lvl)
        rest = F.filter(acc, lambda t: t["z"] != lvl)
        parents = F.array_distinct(F.transform(
            at_z,
            lambda t: F.struct(
                (t["x"].cast("int") / 2).cast("int").alias("x"),
                (t["y"].cast("int") / 2).cast("int").alias("y"),
                (lvl - 1).cast("int").alias("z"),
            ),
        ))

        def has_child(p, dx, dy):
            return F.exists(
                at_z,
                lambda t: (t["x"] == p["x"] * 2 + dx)
                & (t["y"] == p["y"] * 2 + dy),
            )

        complete = F.filter(
            parents,
            lambda p: has_child(p, 0, 0) & has_child(p, 1, 0)
            & has_child(p, 0, 1) & has_child(p, 1, 1),
        )
        kept = F.filter(
            at_z,
            lambda t: ~F.exists(
                complete,
                lambda p: (p["x"] == (t["x"].cast("int") / 2).cast("int"))
                & (p["y"] == (t["y"].cast("int") / 2).cast("int")),
            ),
        )
        return F.concat(rest, kept, complete)

    # levels max_zoom .. 2: dissolving INTO level lvl-1 each step
    levels = F.when(
        max_zoom >= 2,
        F.sequence(max_zoom.cast("int"), F.lit(2), F.lit(-1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.aggregate(levels, base, step)
