"""Geospatial queries: planar ST_* + great_circle_distance + spatial join.

Reference: presto-main-base/.../geospatial/GeoFunctions.java (planar
predicates/measures), SphericalGeographyUtils.java:82-107
(great_circle_distance), SpatialJoinOperator.java (the join).  TPC-H
carries no coordinates, so points derive deterministically from
customer keys; zone polygons are inline WKT.  Oracles: DuckDB replays
the spherical formula verbatim, and zone containment via the
rectangle/half-plane decomposition of each test polygon — an
independent derivation of the same geometry, not a reimplementation of
the ray cast.
"""

from pyspark.sql import functions as F

from presto_spark.functions import geo
from presto_spark.operators import spatial_join
from presto_spark.queries.base import prepare, register


_GCD_ORACLE = """
WITH pts AS (
  SELECT c_custkey,
         ((c_custkey % 160) - 80) + 0.25 AS lat1,
         ((c_custkey % 340) - 170) + 0.25 AS lon1,
         (c_nationkey * 6.0) - 72 AS lat2,
         (c_nationkey * 13.0) - 150 AS lon2
  FROM customer WHERE c_custkey <= 40
)
SELECT c_custkey,
       printf('%.3f', atan2(
         sqrt(
           pow(cos(radians(lat2)) * sin(radians(lon1) - radians(lon2)), 2)
           + pow(cos(radians(lat1)) * sin(radians(lat2))
                 - sin(radians(lat1)) * cos(radians(lat2))
                   * cos(radians(lon1) - radians(lon2)), 2)),
         sin(radians(lat1)) * sin(radians(lat2))
         + cos(radians(lat1)) * cos(radians(lat2))
           * cos(radians(lon1) - radians(lon2))
       ) * 6371.01) AS dist_km
FROM pts
ORDER BY c_custkey
"""


@register(
    "geo_great_circle_routes",
    oracle=_GCD_ORACLE,
    doc="great_circle_distance(lat1, lon1, lat2, lon2) "
        "(SphericalGeographyUtils.java:82-107, R=6371.01 km): "
        "customer-to-nation synthetic routes; DuckDB replays the exact "
        "Vincenty-on-a-sphere formula. Distances emitted at 3 decimals "
        "(row-level only — no cross-engine float summation).",
    tags=("geo", "functions"),
)
def geo_great_circle_routes(spark, sf_dir):
    prepare(spark, sf_dir)
    cust = spark.table("customer").filter(F.col("c_custkey") <= 40)
    lat1 = ((F.col("c_custkey") % 160) - 80) + 0.25
    lon1 = ((F.col("c_custkey") % 340) - 170) + 0.25
    lat2 = (F.col("c_nationkey") * 6.0) - 72
    lon2 = (F.col("c_nationkey") * 13.0) - 150
    return cust.select(
        "c_custkey",
        F.format_string(
            "%.3f", geo.great_circle_distance(lat1, lon1, lat2, lon2)
        ).alias("dist_km"),
    ).orderBy("c_custkey")


_ZONES = [
    # L-shape: rect (0..40)x(0..30) ∪ rect (0..20)x(30..60)
    ("west_l",
     "POLYGON ((0 0, 40 0, 40 30, 20 30, 20 60, 0 60, 0 0))"),
    # box with a hole
    ("east_box",
     "POLYGON ((50 10, 90 10, 90 70, 50 70, 50 10), "
     "(60 20, 70 20, 70 30, 60 30, 60 20))"),
    # triangle, apex (50, 88)
    ("north_tri",
     "POLYGON ((10 60, 90 60, 50 88, 10 60))"),
]

_ZONES_ORACLE = """
WITH pts AS (
  SELECT c_custkey,
         (c_custkey % 97) + 0.5 AS x,
         (c_custkey % 89) + 0.5 AS y
  FROM customer
),
zoned AS (
  SELECT 'west_l' AS zone, c_custkey FROM pts
  WHERE (x > 0 AND x < 40 AND y > 0 AND y < 30)
     OR (x > 0 AND x < 20 AND y >= 30 AND y < 60)
  UNION ALL
  SELECT 'east_box', c_custkey FROM pts
  WHERE x > 50 AND x < 90 AND y > 10 AND y < 70
    AND NOT (x > 60 AND x < 70 AND y > 20 AND y < 30)
  UNION ALL
  SELECT 'north_tri', c_custkey FROM pts
  WHERE y > 60 AND y < 60 + 0.7 * (x - 10) AND y < 60 + 0.7 * (90 - x)
),
areas AS (
  SELECT zone, CAST(area AS DOUBLE) AS area
  FROM (VALUES ('west_l', 1800.0), ('east_box', 2300.0),
               ('north_tri', 1120.0)) AS t(zone, area)
)
SELECT z.zone AS zone,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(z.c_custkey) AS BIGINT) AS custkey_sum,
       a.area AS area
FROM zoned z JOIN areas a ON a.zone = z.zone
GROUP BY z.zone, a.area
ORDER BY zone
"""


@register(
    "geo_point_in_polygon_zones",
    oracle=_ZONES_ORACLE,
    doc="Spatial join: points-in-polygons (SpatialJoinOperator.java via "
        "the grid-binned operators/spatial_join.py — polygon bboxes "
        "exploded to grid cells, points to exactly one cell, equi-join "
        "then even-odd ST_Contains verify; no cartesian). Zones are an "
        "L-shape, a box with a hole, and a triangle; the oracle derives "
        "membership independently from each polygon's rectangle/"
        "half-plane decomposition. Point coords sit on half-integers so "
        "no point touches a zone boundary. ST_Area per zone rides along "
        "(integer-coordinate shoelace is FP-exact).",
    tags=("geo", "join"),
)
def geo_point_in_polygon_zones(spark, sf_dir):
    prepare(spark, sf_dir)
    pts = spark.table("customer").select(
        "c_custkey",
        ((F.col("c_custkey") % 97) + 0.5).alias("x"),
        ((F.col("c_custkey") % 89) + 0.5).alias("y"),
    )
    zones = spark.createDataFrame(_ZONES, "zone string, wkt string").select(
        "zone", geo.st_geometry_from_text(F.col("wkt")).alias("geom")
    )
    joined = spatial_join.spatial_join_points_in_polygons(
        pts, zones, "x", "y", "geom", cell_size=16.0
    )
    return (
        joined.groupBy("zone")
        .agg(
            F.count("*").alias("n_points"),
            F.sum("c_custkey").alias("custkey_sum"),
            F.first(geo.st_area(F.col("geom"))).alias("area"),
        )
        .orderBy("zone")
    )


_MEASURES_ORACLE = """
SELECT name, kind, area, length, cx, cy, n_points,
       CAST(xmin_raw AS DOUBLE) AS xmin, CAST(ymax_raw AS DOUBLE) AS ymax
FROM (VALUES
  ('ell',     'POLYGON',    '6.000000', '14.000000', '1.500000', '1.000000',
   CAST(6 AS BIGINT), 0.0, 3.0),
  ('line',    'LINESTRING', '0.000000', '11.000000', '2.318182', '4.727273',
   CAST(3 AS BIGINT), 0.0, 10.0),
  ('mp',      'MULTIPOINT', '0.000000', '0.000000',  '2.000000', '3.000000',
   CAST(2 AS BIGINT), 1.0, 4.0),
  ('pt',      'POINT',      '0.000000', '0.000000',  '2.500000', '7.500000',
   CAST(1 AS BIGINT), 2.5, 7.5),
  ('sq_hole', 'POLYGON',    '96.000000', '48.000000', '5.083333', '5.083333',
   CAST(8 AS BIGINT), 0.0, 10.0),
  ('tri',     'POLYGON',    '18.000000', '20.485281', '2.000000', '2.000000',
   CAST(3 AS BIGINT), 0.0, 6.0)
) AS t(name, kind, area, length, cx, cy, n_points, xmin_raw, ymax_raw)
ORDER BY name
"""


@register(
    "geo_measures_wkt_golden",
    oracle=_MEASURES_ORACLE,
    doc="ST_GeometryFromText → ST_Area/ST_Length/ST_Centroid/"
        "ST_NumPoints/ST_XMin/ST_YMax over a WKT value table "
        "(GeoFunctions.java:236,433,306,731,517,504). Hand-derived "
        "goldens: shoelace areas with hole subtraction, perimeter/"
        "segment lengths, hole-aware and length-weighted centroids. "
        "Measures emitted at 6 decimals via %.6f.",
    tags=("geo", "functions"),
)
def geo_measures_wkt_golden(spark, sf_dir):
    prepare(spark, sf_dir)
    wkts = [
        ("sq_hole",
         "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
         "(2 2, 4 2, 4 4, 2 4, 2 2))"),
        ("tri", "POLYGON ((0 0, 6 0, 0 6, 0 0))"),
        ("ell", "POLYGON ((0 0, 4 0, 4 1, 1 1, 1 3, 0 3, 0 0))"),
        ("line", "LINESTRING (0 0, 3 4, 3 10)"),
        ("pt", "POINT (2.5 7.5)"),
        ("mp", "MULTIPOINT ((1 2), (3 4))"),
    ]
    # materialize the parsed geometry (round-7/round-11 rule: the
    # parser tree re-inlines per reference; 8 copies cost minutes of
    # Catalyst analysis once the GC branch landed)
    df = (
        spark.createDataFrame(wkts, "name string, wkt string")
        .withColumn("g", geo.st_geometry_from_text(F.col("wkt")))
        .repartition(2)
    )
    g = F.col("g")
    c = geo.st_centroid(g)
    return df.select(
        "name",
        g["kind"].alias("kind"),
        F.format_string("%.6f", geo.st_area(g)).alias("area"),
        F.format_string("%.6f", geo.st_length(g)).alias("length"),
        F.format_string("%.6f", geo.st_x(c)).alias("cx"),
        F.format_string("%.6f", geo.st_y(c)).alias("cy"),
        geo.st_num_points(g).alias("n_points"),
        geo.st_xmin(g).alias("xmin"),
        geo.st_ymax(g).alias("ymax"),
    ).orderBy("name")


_BING_ORACLE = """
WITH pts AS (
  SELECT c_custkey,
         ((c_custkey % 170) - 85) + 0.3 AS lat,
         ((c_custkey % 360) - 180) + 0.3 AS lon
  FROM customer
),
tiled AS (
  SELECT c_custkey,
         CAST(floor(least(greatest(((lon + 180) / 360) * 16384.0, 0),
                          16383.0) / 256) AS INTEGER) AS tx,
         CAST(floor(least(greatest(
             (0.5 - ln((1 + sin(lat * pi() / 180))
                       / (1 - sin(lat * pi() / 180))) / (4 * pi()))
             * 16384.0, 0), 16383.0) / 256) AS INTEGER) AS ty
  FROM pts
)
SELECT tx, ty,
       list_aggregate(list_transform([1, 2, 3, 4, 5, 6], i ->
         chr(48 + (CAST(floor(tx / pow(2, 6 - i)) AS INTEGER) % 2)
                + 2 * (CAST(floor(ty / pow(2, 6 - i)) AS INTEGER) % 2))),
         'string_agg', '') AS quadkey,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(c_custkey) AS BIGINT) AS custkey_sum
FROM tiled
GROUP BY tx, ty
ORDER BY tx, ty
"""


@register(
    "geo_bing_tile_rollup",
    oracle=_BING_ORACLE,
    doc="Bing-tile spatial aggregation (BingTileUtils.java:150-198 "
        "latitudeLongitudeToTile + BingTile.java:143-158 toQuadKey): "
        "customer-derived WGS84 points bucketed at zoom 6, rolled up "
        "per tile with quadkeys. DuckDB replays the Web-Mercator pixel "
        "formula and base-4 quadkey digits independently. Coordinates "
        "use +0.3-degree offsets whose pixel positions are provably "
        "never integers, so no point sits on a tile boundary. The "
        "shuffle key is the (x, y) tile pair — the Mercator analog of "
        "the operators/spatial_join.py grid discipline.",
    tags=("geo", "agg", "bench"),
)
def geo_bing_tile_rollup(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.functions import bingtile as B

    pts = spark.table("customer").select(
        "c_custkey",
        (((F.col("c_custkey") % 170) - 85) + 0.3).alias("lat"),
        (((F.col("c_custkey") % 360) - 180) + 0.3).alias("lon"),
    )
    tile = B.bing_tile_at(F.col("lat"), F.col("lon"), F.lit(6))
    return (
        pts.select("c_custkey", tile.alias("t"))
        .groupBy(
            F.col("t.x").alias("tx"), F.col("t.y").alias("ty")
        )
        .agg(
            F.first(B.bing_tile_quadkey(F.col("t"))).alias("quadkey"),
            F.count("*").alias("n_points"),
            F.sum("c_custkey").alias("custkey_sum"),
        )
        .select("tx", "ty", "quadkey", "n_points", "custkey_sum")
        .orderBy("tx", "ty")
    )


_LINEREF_ORACLE = """
SELECT case_id, locate, ix, iy, inter
FROM (VALUES
  ('c1', '0.250000', '10.000000', '5.000000', true),
  ('c2', '0.750000', '2.000000',  '0.000000', false),
  ('c3', '0.500000', '0.000000',  '0.000000', true),
  ('c4', '1.000000', '3.000000',  '4.000000', true),
  ('c5', '0.000000', '4.000000',  '3.000000', true),
  ('c6', '0.200000', '2.500000',  '0.000000', false)
) AS t(case_id, locate, ix, iy, inter)
ORDER BY case_id
"""

_LINEREF_CASES = [
    # (id, line, point, fraction, intersects_a, intersects_b)
    ("c1", "LINESTRING (0 0, 10 0, 10 10)", "POINT (5 1)", 0.75,
     "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
     "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"),
    ("c2", "LINESTRING (0 0, 10 0, 10 10)", "POINT (10 5)", 0.1,
     "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
     "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"),
    ("c3", "LINESTRING (0 0, 10 0, 10 10)", "POINT (12 -1)", 0.0,
     "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "POINT (5 5)"),
    ("c4", "LINESTRING (0 0, 3 4)", "POINT (3 4)", 1.0,
     "LINESTRING (0 0, 5 5)", "LINESTRING (0 5, 5 0)"),
    ("c5", "LINESTRING (0 0, 8 6)", "POINT (0 0)", 0.5,
     "POINT (5 0)", "LINESTRING (0 0, 10 0)"),
    ("c6", "LINESTRING (0 0, 10 0)", "POINT (2 2)", 0.25,
     "LINESTRING (0 0, 5 5)", "LINESTRING (6 6, 9 9)"),
]


@register(
    "geo_line_referencing_golden",
    oracle=_LINEREF_ORACLE,
    doc="Linear referencing + intersection predicate "
        "(GeoFunctions.java:444-489 line_locate_point/"
        "line_interpolate_point — JTS LengthIndexedLine semantics, "
        "first minimal-distance segment wins ties; :1090 ST_Intersects "
        "incl. containment, collinear overlap, point-on-line, and "
        "corner-touch cases). Hand-derived goldens at 6 decimals.",
    tags=("geo", "functions"),
)
def geo_line_referencing_golden(spark, sf_dir):
    prepare(spark, sf_dir)
    df = spark.createDataFrame(
        _LINEREF_CASES,
        "case_id string, line string, pt string, frac double, "
        "ia string, ib string",
    )
    g = geo.st_geometry_from_text
    # The repartition is an optimizer barrier: without it
    # CollapseProject re-inlines the WKT-parse tree into every
    # downstream HOF reference and analysis/codegen time explodes
    # (~8x on this 6-row suite).  One tiny exchange buys plan-size
    # linearity — the same hygiene a 100 TB pipeline would need.
    parsed = df.select(
        "case_id", "frac",
        g(F.col("line")).alias("gl"), g(F.col("pt")).alias("gp"),
        g(F.col("ia")).alias("ga"), g(F.col("ib")).alias("gb"),
    ).repartition(2)
    interp = geo.line_interpolate_point(F.col("gl"), F.col("frac"))
    return parsed.select(
        "case_id",
        F.format_string(
            "%.6f", geo.line_locate_point(F.col("gl"), F.col("gp"))
        ).alias("locate"),
        F.format_string("%.6f", geo.st_x(interp)).alias("ix"),
        F.format_string("%.6f", geo.st_y(interp)).alias("iy"),
        geo.st_intersects(F.col("ga"), F.col("gb")).alias("inter"),
    ).orderBy("case_id")


def _pt_txt(pg):
    v = pg["rings"][0][0]
    return F.concat(F.lit("POINT ("), v["x"].cast("string"),
                    F.lit(" "), v["y"].cast("string"), F.lit(")"))


_ACCESSORS_ORACLE = """
SELECT name, gtype,
       CAST(closed AS BOOLEAN) AS closed,
       CAST(ring AS BOOLEAN) AS ring,
       CAST(sp AS VARCHAR) AS sp,
       CAST(ep AS VARCHAR) AS ep,
       CAST(p2 AS VARCHAR) AS p2,
       CAST(nir AS BIGINT) AS nir,
       CAST(dim AS INTEGER) AS dim
FROM (VALUES
  ('line',     'ST_LineString', false, false,
   'POINT (0.0 0.0)', 'POINT (3.0 10.0)', 'POINT (3.0 4.0)', NULL, 1),
  ('mp',       'ST_MultiPoint', NULL, NULL, NULL, NULL, NULL, NULL, 0),
  ('pt',       'ST_Point',      NULL, NULL, NULL, NULL, NULL, NULL, 0),
  ('ringline', 'ST_LineString', true, true,
   'POINT (0.0 0.0)', 'POINT (0.0 0.0)', 'POINT (4.0 0.0)', NULL, 1),
  ('sq_hole',  'ST_Polygon',    true, NULL, NULL, NULL, NULL, 1, 2),
  ('tri',      'ST_Polygon',    true, NULL, NULL, NULL, NULL, 0, 2)
) AS t(name, gtype, closed, ring, sp, ep, p2, nir, dim)
ORDER BY name
"""


@register(
    "geo_accessors_wkt_golden",
    oracle=_ACCESSORS_ORACLE,
    doc="Geometry accessors (GeoFunctions.java: ST_GeometryType:1161 "
        "with GeometryType.java standard names, ST_IsClosed:356, "
        "ST_IsRing:740, ST_StartPoint:752, ST_EndPoint:786, "
        "ST_PointN:675, ST_NumInteriorRing:543, ST_Dimension:347). "
        "Hand-derived goldens incl. type-gated NULLs.",
    tags=("geo", "functions"),
)
def geo_accessors_wkt_golden(spark, sf_dir):
    prepare(spark, sf_dir)
    wkts = [
        ("sq_hole",
         "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
         "(2 2, 4 2, 4 4, 2 4, 2 2))"),
        ("tri", "POLYGON ((0 0, 6 0, 0 6, 0 0))"),
        ("line", "LINESTRING (0 0, 3 4, 3 10)"),
        ("ringline", "LINESTRING (0 0, 4 0, 4 4, 0 0)"),
        ("pt", "POINT (2.5 7.5)"),
        ("mp", "MULTIPOINT ((1 2), (3 4))"),
    ]
    df = (
        spark.createDataFrame(wkts, "name string, wkt string")
        .withColumn("g", geo.st_geometry_from_text(F.col("wkt")))
        .repartition(2)
    )
    g = F.col("g")
    return df.select(
        "name",
        geo.st_geometry_type(g).alias("gtype"),
        geo.st_is_closed(g).alias("closed"),
        geo.st_is_ring(g).alias("ring"),
        # derived start/end/point-n are POINTs by construction —
        # print inline rather than through the (GC-aware, heavier)
        # st_as_text tree (round-11 analysis-cost note in geo.py)
        _pt_txt(geo.st_start_point(g)).alias("sp"),
        _pt_txt(geo.st_end_point(g)).alias("ep"),
        _pt_txt(geo.st_point_n(g, F.lit(2))).alias("p2"),
        geo.st_num_interior_ring(g).alias("nir"),
        geo.st_dimension(g).alias("dim"),
    ).orderBy("name")


_GEOJSON_ORACLE = """
SELECT name, geojson, CAST(roundtrip_ok AS BOOLEAN) AS roundtrip_ok
FROM (VALUES
  ('line', '{"type":"LineString","coordinates":[[0.0,0.0],[3.0,4.0],[3.0,10.0]]}', true),
  ('mp',   '{"type":"MultiPoint","coordinates":[[1.0,2.0],[3.0,4.0]]}', true),
  ('pt',   '{"type":"Point","coordinates":[2.5,7.5]}', true),
  ('sq_hole', '{"type":"Polygon","coordinates":[[[0.0,0.0],[10.0,0.0],[10.0,10.0],[0.0,10.0],[0.0,0.0]],[[2.0,2.0],[4.0,2.0],[4.0,4.0],[2.0,4.0],[2.0,2.0]]]}', true)
) AS t(name, geojson, roundtrip_ok)
ORDER BY name
"""


@register(
    "geo_geojson_roundtrip",
    oracle=_GEOJSON_ORACLE,
    doc="geometry_as_geojson / geometry_from_geojson "
        "(GeoFunctions.java:1225-1241): RFC 7946 rendering with "
        "hand-written goldens, plus a WKT-level parse round-trip "
        "equality check.",
    tags=("geo", "functions"),
)
def geo_geojson_roundtrip(spark, sf_dir):
    prepare(spark, sf_dir)
    wkts = [
        ("sq_hole",
         "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
         "(2 2, 4 2, 4 4, 2 4, 2 2))"),
        ("line", "LINESTRING (0 0, 3 4, 3 10)"),
        ("pt", "POINT (2.5 7.5)"),
        ("mp", "MULTIPOINT ((1 2), (3 4))"),
    ]
    # materialize parse + geojson (round-11 rule: the parser/printer
    # trees re-inline per reference and analysis explodes)
    df = (
        spark.createDataFrame(wkts, "name string, wkt string")
        .withColumn("g", geo.st_geometry_from_text(F.col("wkt")))
        .repartition(2)
        .withColumn("j", geo.geometry_as_geojson(F.col("g")))
        .repartition(2)
    )
    return df.select(
        "name",
        F.col("j").alias("geojson"),
        (geo.st_as_text(geo.geometry_from_geojson(F.col("j")))
         == geo.st_as_text(F.col("g"))).alias("roundtrip_ok"),
    ).orderBy("name")


_HULLS_ORACLE = """
WITH pts AS (
  SELECT CAST(c_nationkey % 4 AS BIGINT) AS g,
         (c_custkey % 101) / 10.0 AS x,
         (c_custkey % 89) / 8.0 AS y
  FROM customer
  UNION ALL
  SELECT * FROM (VALUES
    (CAST(-1 AS BIGINT), 0.0, 0.0), (-1, 4.0, 0.0), (-1, 4.0, 4.0),
    (-1, 0.0, 4.0), (-1, 2.0, 2.0), (-1, 1.0, 3.0), (-1, 3.0, 1.0)
  ) AS v(g, x, y)
),
e AS (
  SELECT g, max(x) - min(x) AS env_w, max(y) - min(y) AS env_h
  FROM pts GROUP BY g
)
SELECT g,
       'POLYGON' AS hull_kind,
       CASE WHEN g = -1 THEN CAST(5 AS BIGINT) END AS ring_n,
       CASE WHEN g = -1 THEN '16.0000' END AS area_q,
       true AS contains_all,
       true AS hull_in_env,
       env_w, env_h
FROM e ORDER BY g
"""


@register(
    "geo_aggregate_hulls",
    oracle=_HULLS_ORACLE,
    doc="convex_hull_agg + envelope_union_agg (geospatial.rst "
        "aggregations; operators/geo_agg.py two-level monotone chain). "
        "A golden 7-point group whose hull is the known 4x4 square "
        "(ring_n/area checked exactly) plus customer-derived lattice "
        "groups checked by property: every input point lies inside "
        "the hull (edge cross-product test), the hull stays inside "
        "the envelope union, and DuckDB replays the envelope "
        "dimensions exactly.",
    tags=("geo", "agg", "bench"),
)
def geo_aggregate_hulls(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators import geo_agg

    cust = spark.table("customer")
    pts = cust.select(
        (F.col("c_nationkey") % 4).cast("long").alias("g"),
        ((F.col("c_custkey") % 101) / 10.0).alias("x"),
        ((F.col("c_custkey") % 89) / 8.0).alias("y"),
    ).unionByName(spark.sql(
        # Literal golden rows as a SQL VALUES LocalRelation: the
        # createDataFrame(list) form materializes through a pickled
        # Python RDD that costs a Python-worker round trip on EVERY
        # evaluation of this subtree (~0.3 s x 3 consumer branches at
        # sf0.1, measured r16); a LocalRelation is driver-local JVM
        # rows — no tasks, no Python. Values and types are identical.
        "SELECT * FROM VALUES "
        "(CAST(-1 AS BIGINT), 0.0D, 0.0D), (CAST(-1 AS BIGINT), 4.0D, 0.0D), "
        "(CAST(-1 AS BIGINT), 4.0D, 4.0D), (CAST(-1 AS BIGINT), 0.0D, 4.0D), "
        "(CAST(-1 AS BIGINT), 2.0D, 2.0D), (CAST(-1 AS BIGINT), 1.0D, 3.0D), "
        "(CAST(-1 AS BIGINT), 3.0D, 1.0D) AS v(g, x, y)"
    ))
    # The point cloud is a bounded lattice — x has ≤ 101 values, y ≤ 89,
    # so each group holds ≤ ~9k distinct points while customer contributes
    # 150k×SF rows.  Every consumer below is duplicate-idempotent
    # (hull(S) = hull(distinct S); envelope is min/max; the containment
    # check folds with bool_and), so deduplicate FIRST: the partial
    # hash-aggregate collapses rows map-side before the exchange (guide
    # §2.3 — the query knows the multiplicity is irrelevant, the
    # optimizer cannot), and the dedup's own shuffle replaces the old
    # repartition(32) as both the work-spread for the Python/interpreted
    # passes and the optimizer barrier the geo operators want.  At sf0.1
    # this cuts the hull mapInPandas input and the exploded point×edge
    # containment arithmetic ~16x; at real scale the exchange carries
    # distinct lattice points instead of one row per customer.
    gdf = pts.dropDuplicates(["g", "x", "y"]).select(
        "g", "x", "y", geo.st_point(F.col("x"), F.col("y")).alias("geom"))
    hulls = geo_agg.convex_hull_agg(gdf, ["g"], "geom")
    envs = geo_agg.envelope_union_agg(gdf, ["g"], "geom")

    ring = F.col("hull")["rings"][0]
    edges = F.zip_with(
        F.slice(ring, 1, F.size(ring) - 1),
        F.slice(ring, 2, F.size(ring) - 1),
        lambda p, q: F.struct(p.alias("p"), q.alias("q")),
    )
    # CCW hull: x inside iff cross(q-p, x-p) >= -eps for every edge.
    # The check is EXPLODED into (point x hull-edge) rows and folded
    # back with bool_and instead of a per-point F.aggregate over the
    # edge array: HOF lambdas never enter whole-stage codegen, and the
    # interpreted fold cost ~2 s of CPU at sf0.1 — the dominant part
    # of the r7 bench regression (VERDICT r7 what's-wrong #2).  The
    # exploded form is pure codegen arithmetic behind a broadcast
    # join, and carrying the hull through the aggregation keeps the
    # pandas hull pipeline referenced (and executed) exactly once.
    # explode_outer + NULL-edge-is-vacuously-contained: a degenerate
    # hull (collinear group, ring < 3 vertices, empty edge array) must
    # keep its group row rather than silently dropping out of the
    # output (ADVICE r8).
    hedges = hulls.select("g", "hull", F.explode_outer(edges).alias("__e"))
    point_checked = (
        gdf.join(F.broadcast(hedges), "g")
        .groupBy("g").agg(
            F.bool_and(
                F.col("__e").isNull()
                | (
                    (F.col("__e")["q"]["x"] - F.col("__e")["p"]["x"])
                    * (F.col("y") - F.col("__e")["p"]["y"])
                    - (F.col("__e")["q"]["y"] - F.col("__e")["p"]["y"])
                    * (F.col("x") - F.col("__e")["p"]["x"])
                    >= F.lit(-1e-9)
                )
            ).alias("contains_all"),
            F.first("hull").alias("hull"),
        )
    )
    env_ring = F.col("envelope")["rings"][0]
    hull_in_env = F.aggregate(
        F.flatten(F.col("hull")["rings"]), F.lit(True),
        lambda acc, p: acc
        & (p["x"] >= F.element_at(env_ring, 1)["x"] - 1e-9)
        & (p["x"] <= F.element_at(env_ring, 2)["x"] + 1e-9)
        & (p["y"] >= F.element_at(env_ring, 1)["y"] - 1e-9)
        & (p["y"] <= F.element_at(env_ring, 3)["y"] + 1e-9),
    )
    return (
        point_checked.join(envs, "g")
        .select(
            "g",
            F.col("hull")["kind"].alias("hull_kind"),
            F.when(F.col("g") == -1, F.size(ring).cast("long")).alias("ring_n"),
            F.when(F.col("g") == -1,
                   F.format_string("%.4f", geo.st_area(F.col("hull")))
                   ).alias("area_q"),
            F.col("contains_all"),
            hull_in_env.alias("hull_in_env"),
            (F.element_at(env_ring, 2)["x"]
             - F.element_at(env_ring, 1)["x"]).alias("env_w"),
            (F.element_at(env_ring, 3)["y"]
             - F.element_at(env_ring, 2)["y"]).alias("env_h"),
        )
        .orderBy("g")
    )


_NEAREST_ORACLE = """
SELECT i, CAST(nearest_d AS DOUBLE) AS nearest_d, pa, pb,
       CAST(expanded_area AS DOUBLE) AS expanded_area
FROM (VALUES
  (1, 2.0,  '0.0 0.0',  '2.0 0.0', 4.0),
  (2, 2.0,  '1.0 0.0',  '3.0 0.0', 9.0),
  (3, NULL, NULL,       NULL,      16.0),
  (4, 5.0,  '0.0 0.0',  '3.0 4.0', 144.0)
) AS v(i, nearest_d, pa, pb, expanded_area)
ORDER BY i
"""


@register(
    "geo_nearest_expand_golden",
    oracle=_NEAREST_ORACLE,
    doc="geometry_nearest_points + expand_envelope "
        "(GeoFunctions.java:954,:906): hand-derived goldens — "
        "point-to-segment foot, face-to-face polygons with the "
        "deterministic coordinate tie-break, NULL for intersecting "
        "inputs (pinned deviation, geo.py docstring), and a "
        "vertex-to-vertex pair; expand_envelope checked via the "
        "(w+2d)(h+2d) area identity.",
    tags=("geo", "functions"),
)
def geo_nearest_expand_golden(spark, sf_dir):
    prepare(spark, sf_dir)
    cases = spark.createDataFrame(
        [
            (1, "POINT (0 0)", "LINESTRING (2 -1, 2 1)"),
            (2, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
                "POLYGON ((3 0, 4 0, 4 1, 3 1, 3 0))"),
            (3, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
                "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"),  # intersecting
            (4, "MULTIPOINT ((0 0), (10 10))", "POINT (3 4)"),
        ],
        "i int, wa string, wb string",
    )
    # Exchange barrier between parse and the nearest-points algebra:
    # every downstream reference to a parsed geometry would otherwise
    # inline the whole WKT-parse expression tree (CollapseProject),
    # and the candidate cross-products reference the geometry dozens
    # of times — the *analysis-time* tree goes combinatorial (measured
    # ~60 s of pure planning on 4 rows).  Behind the repartition the
    # geometries are plain attributes.
    parsed = cases.select(
        "i",
        geo.st_geometry_from_text(F.col("wa")).alias("ga"),
        geo.st_geometry_from_text(F.col("wb")).alias("gb"),
    ).repartition(2)
    ga, gb = F.col("ga"), F.col("gb")
    pt_txt = lambda g: F.when(  # noqa: E731
        g.isNotNull(),
        F.concat_ws(" ",
                    F.format_string("%.1f", g["rings"][0][0]["x"]),
                    F.format_string("%.1f", g["rings"][0][0]["y"])))
    # Second barrier: np_pair / st_distance each appear once; the
    # final projection works over plain attributes.
    mid = parsed.select(
        "i",
        geo.geometry_nearest_points(ga, gb).alias("np"),
        F.round(geo.st_distance(ga, gb), 9).alias("nearest_d_raw"),
        geo.st_area(geo.expand_envelope(ga, 1.0)).alias("expanded_area"),
    ).repartition(2)
    np_col = F.col("np")
    return mid.select(
        "i",
        "nearest_d_raw",
        pt_txt(np_col["a"]).alias("pa"),
        pt_txt(np_col["b"]).alias("pb"),
        "expanded_area",
    ).select(
        "i",
        F.when(F.col("pa").isNotNull(), F.col("nearest_d_raw"))
        .alias("nearest_d"),
        "pa", "pb", "expanded_area",
    ).orderBy("i")


@register(
    "geo_overlay_point_tier_golden",
    oracle="""
SELECT 1 AS i,
       '2.0 2.0' AS inter_pt,
       CAST(2 AS BIGINT) AS diff_n,
       CAST(4 AS BIGINT) AS union_n,
       format('{:.4f}', 16.0 * 4.0 * sin(pi() / 16.0)) AS buf_area,
       true AS buf_contains_center
""",
    doc="Point-tier overlay algebra (GeoFunctions.java stUnion/"
        "stIntersection/stDifference/stBuffer; geo.py pinned tiers): "
        "MULTIPOINT x POLYGON intersection/difference, MULTIPOINT "
        "union dedup, and the radius-2 32-gon disc whose area DuckDB "
        "replays from the closed form (N/2)r^2 sin(2pi/N).",
    tags=("geo", "functions"),
)
def geo_overlay_point_tier_golden(spark, sf_dir):
    prepare(spark, sf_dir)
    src = spark.createDataFrame(
        [("MULTIPOINT ((0 0), (5 5), (2 2))",
          "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))",
          "MULTIPOINT ((0 0), (9 9))")],
        "wa string, wb string, wc string",
    ).select(
        geo.st_geometry_from_text(F.col("wa")).alias("ga"),
        geo.st_geometry_from_text(F.col("wb")).alias("gb"),
        geo.st_geometry_from_text(F.col("wc")).alias("gc"),
    ).repartition(1)
    ga, gb, gc = F.col("ga"), F.col("gb"), F.col("gc")
    disc = geo.st_buffer(geo.st_point(F.lit(0.0), F.lit(0.0)), 2.0)
    inter = geo.st_intersection(ga, gb)
    return src.select(
        F.lit(1).alias("i"),
        F.concat_ws(
            " ",
            F.format_string("%.1f", inter["rings"][0][0]["x"]),
            F.format_string("%.1f", inter["rings"][0][0]["y"]),
        ).alias("inter_pt"),
        F.size(geo.st_difference(ga, gb)["rings"]).cast("long")
        .alias("diff_n"),
        F.size(geo.st_union(ga, gc)["rings"]).cast("long").alias("union_n"),
        F.format_string("%.4f", geo.st_area(disc)).alias("buf_area"),
        geo.st_contains(disc, geo.st_point(F.lit(0.1), F.lit(0.1)))
        .alias("buf_contains_center"),
    )


@register(
    "geo_validity_golden",
    oracle="""
SELECT * FROM (VALUES
  (0, CAST(NULL AS VARCHAR)),
  (1, 'Ring is not closed'),
  (2, 'Too few points in ring'),
  (3, 'Self-intersection'),
  (4, CAST(NULL AS VARCHAR)),
  (5, CAST(NULL AS VARCHAR))
) AS v(i, reason) ORDER BY i
""",
    doc="geometry_invalid_reason (GeoFunctions.java:415-430): the "
        "validity tiers the struct model can check — ring closure, "
        "minimum vertex counts, shell self-intersection via "
        "non-adjacent edge-pair tests (message text engine-specific, "
        "pinned; check classes mirror the JTS validator).",
    tags=("geo", "functions"),
)
def geo_validity_golden(spark, sf_dir):
    prepare(spark, sf_dir)
    cases = [
        (0, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
        (1, "POLYGON ((0 0, 4 0, 4 4, 0 4))"),
        (2, "POLYGON ((0 0, 4 0, 0 0))"),
        (3, "POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))"),
        (4, "LINESTRING (1 1, 2 2)"),
        (5, "MULTIPOINT ((1 1), (2 2))"),
    ]
    df = spark.createDataFrame(cases, "i int, wkt string").repartition(1)
    return df.select(
        "i",
        geo.geometry_invalid_reason(
            geo.st_geometry_from_text(F.col("wkt"))).alias("reason"),
    ).orderBy("i")


@register(
    "geo_simplify_flatten_golden",
    oracle="""
SELECT * FROM (VALUES
  (0, 'LINESTRING (0.0 0.0, 2.0 -0.1, 3.0 5.0, 7.0 9.0, 9.0 9.0)', 1),
  (1, 'POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))', 1),
  (2, 'POINT (1.0 2.0)', 1),
  (3, 'LINESTRING (0.0 0.0, 1.0 0.1, 2.0 -0.1, 3.0 5.0)', 1)
) AS v(i, simplified, flat_n) ORDER BY i
""",
    doc="simplify_geometry (GeoFunctions.java:764-782, Ramer-Douglas-"
        "Peucker; tolerance contract: 0 = identity, points pass "
        "through, removed vertices all within tolerance) and "
        "flatten_geometry_collections (GeoFunctions.java:1168-1181 — "
        "non-collection inputs come back whole as a 1-element array; "
        "collection inputs flatten to members since round 11 — "
        "geo_collection_golden).",
    tags=("geo", "functions"),
)
def geo_simplify_flatten_golden(spark, sf_dir):
    prepare(spark, sf_dir)
    cases = [
        # tolerance 1.0 drops the sub-tolerance wiggles, keeps corners
        (0, "LINESTRING (0 0, 1 0.1, 2 -0.1, 3 5, 4 6, 5 7, 6 8.1, 7 9, 8 9, 9 9)", 1.0),
        # closed ring: collinear-ish edge midpoints removed, square kept
        (1, "POLYGON ((0 0, 4 0, 4 0.05, 4 4, 2 4.01, 0 4, 0 0))", 1.0),
        # points pass through untouched
        (2, "POINT (1 2)", 5.0),
        # tolerance 0 is the identity (reference short-circuit)
        (3, "LINESTRING (0 0, 1 0.1, 2 -0.1, 3 5)", 0.0),
    ]
    df = (
        spark.createDataFrame(cases, "i int, wkt string, tol double")
        .withColumn("g", geo.st_geometry_from_text(F.col("wkt")))
        .repartition(1)
    )
    g = F.col("g")
    return df.select(
        "i",
        geo.st_as_text(
            geo.simplify_geometry(g, F.col("tol"))).alias("simplified"),
        F.size(geo.flatten_geometry_collections(g)).alias("flat_n"),
    ).orderBy("i")


@register(
    "geo_overlay_polygon_golden",
    oracle="""
SELECT * FROM (VALUES
  (0, 'POLYGON ((1.0 1.0, 2.0 1.0, 2.0 2.0, 1.0 2.0, 1.0 1.0))', '1.0000',
      'POLYGON ((0.0 0.0, 2.0 0.0, 2.0 1.0, 3.0 1.0, 3.0 3.0, 1.0 3.0, 1.0 2.0, 0.0 2.0, 0.0 0.0))',
      '7.0000',
      'MULTIPOLYGON (((2.0 0.0, 2.0 1.0, 0.0 1.0, 0.0 0.0, 2.0 0.0)), ((0.0 1.0, 1.0 1.0, 1.0 2.0, 0.0 2.0, 0.0 1.0)))',
      '3.0000'),
  (1, 'EMPTY', '0.0000',
      'MULTIPOLYGON (((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 1.0, 0.0 0.0)), ((5.0 5.0, 6.0 5.0, 6.0 6.0, 5.0 6.0, 5.0 5.0)))',
      '2.0000',
      'POLYGON ((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 1.0, 0.0 0.0))', '1.0000'),
  (2, 'POLYGON ((1.0 1.0, 2.0 1.0, 2.0 2.0, 1.0 2.0, 1.0 1.0))', '1.0000',
      'POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))', '16.0000',
      'POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0), (1.0 1.0, 2.0 1.0, 2.0 2.0, 1.0 2.0, 1.0 1.0))',
      '15.0000'),
  (3, 'POLYGON ((2.0 0.0, 4.0 0.0, 4.0 4.0, 2.0 4.0, 2.0 0.0))', '8.0000',
      'POLYGON ((0.0 0.0, 2.0 0.0, 2.0 -1.0, 5.0 -1.0, 5.0 5.0, 2.0 5.0, 2.0 4.0, 0.0 4.0, 0.0 0.0))',
      '26.0000',
      'POLYGON ((0.0 0.0, 2.0 0.0, 2.0 4.0, 0.0 4.0, 0.0 0.0))', '8.0000'),
  (4, 'EMPTY', '0.0000', 'EMPTY', '0.0000', 'EMPTY', '0.0000'),
  (5, 'EMPTY', '0.0000', 'EMPTY', '0.0000',
      'POLYGON ((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 1.0, 0.0 0.0))', '1.0000')
) AS v(i, inter_wkt, inter_area, union_wkt, union_area, diff_wkt, diff_area)
ORDER BY i
""",
    doc="Convex-polygon overlay tier (GeoFunctions.java stIntersection/"
        "stUnion/stDifference with polygon operands; VERDICT r6 #2, "
        "MULTIPOLYGON outputs r8): Sutherland-Hodgman intersection, "
        "star-stitch union for overlapping operands, MULTIPOLYGON "
        "union for disjoint operands, half-plane-decomposition "
        "difference (one piece → POLYGON, several → MULTIPOLYGON, "
        "B-strictly-inside-A → the canonical holed POLYGON; disjoint "
        "returns A, A-inside-B is empty). Cases: offset squares "
        "(union is the 8-vertex L-ring, area 4+4-1; difference is the "
        "2-piece L tiling, area 3), disjoint squares (MULTIPOLYGON "
        "union, area 2), B-inside-A (holed difference, area 15), "
        "half-clip, a non-convex operand (pinned NULL), and a corner-"
        "touching pair (degenerate intersection: point-intersection "
        "EMPTY, union pinned NULL per the ADVICE r7 guard, difference "
        "returns A). Areas and full vertex rings DuckDB-replayed.",
    tags=("geo", "functions"),
)
def geo_overlay_polygon_golden(spark, sf_dir):
    prepare(spark, sf_dir)
    cases = [
        (0, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
            "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"),
        (1, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
            "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"),
        (2, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
            "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"),
        (3, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
            "POLYGON ((2 -1, 5 -1, 5 5, 2 5, 2 -1))"),
        (4, "POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))",
            "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"),
        (5, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
            "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"),
    ]
    # Materialize parsed geometries and shells behind repartition
    # barriers — Catalyst would otherwise inline the WKT-parse and
    # shell subtrees into every lambda of the overlay expressions
    # (measured: seconds of analysis per un-materialized reference).
    df = (
        spark.createDataFrame(cases, "i int, wa string, wb string")
        .select(
            "i",
            geo.st_geometry_from_text(F.col("wa")).alias("a"),
            geo.st_geometry_from_text(F.col("wb")).alias("b"))
        .repartition(2)
        .withColumn("sa", geo.polygon_shell(F.col("a")))
        .withColumn("sb", geo.polygon_shell(F.col("b")))
        .repartition(2)
    )
    a, b, sa, sb = F.col("a"), F.col("b"), F.col("sa"), F.col("sb")
    g = df.select(
        "i",
        geo.st_intersection_polygons(a, b, sa, sb).alias("gi"),
        geo.st_union_polygons(a, b, sa, sb).alias("gu"),
        geo.st_difference_polygons(a, b, sa, sb).alias("gd"),
    ).repartition(2)

    def wkt(c):
        return F.coalesce(geo.st_as_text(F.col(c)), F.lit("EMPTY"))

    def area(c):
        return F.format_string(
            "%.4f", F.coalesce(geo.st_area(F.col(c)), F.lit(0.0)))

    return g.select(
        "i",
        wkt("gi").alias("inter_wkt"), area("gi").alias("inter_area"),
        wkt("gu").alias("union_wkt"), area("gu").alias("union_area"),
        wkt("gd").alias("diff_wkt"), area("gd").alias("diff_area"),
    ).orderBy("i")


@register(
    "geo_union_agg_golden",
    oracle="""
SELECT * FROM (VALUES
  (0, 'POLYGON ((0.0 0.0, 2.0 0.0, 2.0 0.5, 2.5 0.5, 2.5 1.0, 3.0 1.0, 3.0 3.0, 1.0 3.0, 1.0 2.5, 1.0 2.0, 0.0 2.0, 0.0 0.0))',
      '7.2500'),
  (1, 'POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))', '16.0000'),
  (2, 'EMPTY', '0.0000'),
  (3, 'EMPTY', '0.0000'),
  (4, 'EMPTY', '0.0000'),
  (5, 'EMPTY', '0.0000')
) AS v(g, union_wkt, union_area) ORDER BY g
""",
    doc="geometry_union_agg (geospatial.rst Aggregations; VERDICT r6 "
        "#2, two-level rebuild + degenerate guard + NULL spine r8): "
        "the true union polygon for groups of convex polygons whose "
        "common intersection is full-dimensional, via the two-level "
        "star-stitch (partial union per input partition, final stitch "
        "over partial boundaries). Cases: 3 stair-stepped squares "
        "(area = 4+4+3-1-1.5-2.25+1 = 7.25 by inclusion-exclusion, "
        "full 12-vertex ring replayed), the single-polygon identity, "
        "a disjoint pair (MULTIPOLYGON result — pinned NULL), a "
        "non-convex member (pinned NULL), a corner-touching pair "
        "(degenerate common — pinned NULL, ADVICE r7), and an "
        "all-NULL group (spine row with NULL geometry).",
    tags=("geo", "agg"),
)
def geo_union_agg_golden(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.operators import geo_agg

    cases = [
        (0, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
        (0, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"),
        (0, "POLYGON ((1 0.5, 2.5 0.5, 2.5 2.5, 1 2.5, 1 0.5))"),
        (1, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
        (2, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
        (2, "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"),
        (3, "POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))"),
        (3, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
        (4, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
        (4, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"),
        (5, None),
        (5, None),
    ]
    df = spark.createDataFrame(cases, "g int, wkt string").select(
        "g", geo.st_geometry_from_text(F.col("wkt")).alias("geom")
    ).repartition(2)
    out = geo_agg.geometry_union_agg(df, ["g"], "geom")
    return out.select(
        "g",
        F.coalesce(geo.st_as_text(F.col("geometry")), F.lit("EMPTY"))
        .alias("union_wkt"),
        F.format_string(
            "%.4f", F.coalesce(geo.st_area(F.col("geometry")), F.lit(0.0))
        ).alias("union_area"),
    ).orderBy("g")


@register(
    "geo_buffer_polygon_golden",
    oracle="""
SELECT * FROM (VALUES
  (0, '35.1214', CAST(37 AS BIGINT), false),
  (1, '16.0000', CAST(5 AS BIGINT), false),
  (2, '0.0000', CAST(-1 AS BIGINT), true)
) AS v(i, buf_area, n_vertices, is_null) ORDER BY i
""",
    doc="ST_Buffer with a convex polygon operand (GeoFunctions.java "
        "stBuffer; round 7): Minkowski sum via outward edge offsets "
        "joined by 8-sample vertex arcs. The 4x4 square at d=1 gives "
        "area 35.1214 (exact 16 + 16d + pi d^2 = 35.1416; inscribed "
        "arcs undershoot by design, pinned at the 32-gon resolution "
        "class), d=0 is the identity, non-convex operands are NULL.",
    tags=("geo", "functions"),
)
def geo_buffer_polygon_golden(spark, sf_dir):
    prepare(spark, sf_dir)
    cases = [
        (0, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", 1.0),
        (1, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", 0.0),
        (2, "POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))", 1.0),
    ]
    df = (
        spark.createDataFrame(cases, "i int, wkt string, d double")
        .select("i", "d",
                geo.st_geometry_from_text(F.col("wkt")).alias("g"))
        .repartition(2)
        .withColumn("sh", geo.polygon_shell(F.col("g")))
        .repartition(2)
    )
    buf = geo.st_buffer_polygon(F.col("g"), F.col("d"), F.col("sh"))
    return df.select(
        "i",
        F.format_string(
            "%.4f", F.coalesce(geo.st_area(buf), F.lit(0.0))
        ).alias("buf_area"),
        F.coalesce(F.size(buf["rings"][0]), F.lit(-1)).cast("bigint")
        .alias("n_vertices"),
        buf.isNull().alias("is_null"),
    ).orderBy("i")


@register(
    "geo_multipolygon_golden",
    oracle="""
SELECT * FROM (VALUES
  (0, 'MULTIPOLYGON (((0.0 0.0, 2.0 0.0, 2.0 1.0, 0.0 1.0, 0.0 0.0)), ((3.0 3.0, 5.0 3.0, 5.0 5.0, 3.0 5.0, 3.0 3.0)))',
      '6.0000', '14.0000', CAST(2 AS BIGINT),
      'POLYGON ((0.0 0.0, 2.0 0.0, 2.0 1.0, 0.0 1.0, 0.0 0.0))',
      '4.0000', true, 'ST_MultiPolygon', 2, CAST(1 AS BIGINT),
      true, false, true, '0.7071', '0.0000'),
  (1, 'POINT (2.5 7.5)',
      '0.0000', '0.0000', CAST(1 AS BIGINT),
      'POINT (2.5 7.5)',
      '0.0000', true, 'ST_Point', 0, CAST(1 AS BIGINT),
      false, false, false, '5.0000', '7.1589')
) AS v(i, rt_wkt, area_q, len_q, n_geoms, g1_wkt, g2_area_q,
       g3_null, gtype, dim, flat_n,
       ct_in, ct_gap, ix_poly, dist_q, dist0_q)
ORDER BY i
""",
    doc="MULTIPOLYGON surface (round 8 — VERDICT r7 what's-missing "
        "#1: the struct model gains the kind as an overlay OUTPUT and "
        "measure tier; GeoFunctions.java stNumGeometries/stGeometryN/"
        "stArea/stLength multi-geometry arms): WKT parse + exact "
        "roundtrip, summed area, summed perimeter, ST_NumGeometries, "
        "ST_GeometryN piece extraction (1-based, NULL out of range), "
        "ST_GeometryType/ST_Dimension, flatten_geometry_collections "
        "pass-through; a POINT row pins the simple-kind n=1 identity. "
        "Round 9 (VERDICT r8 what's-missing #4) adds the predicate/"
        "distance tier: ST_Contains is the any-piece even-odd cast "
        "(point interior to piece 2 true, gap point false), "
        "ST_Intersects true against a polygon overlapping piece 1 "
        "only, ST_Distance is the min over pieces (asymmetric probe "
        "nearer piece 2) and 0 for an interior probe.",
    tags=("geo", "functions"),
)
def geo_multipolygon_golden(spark, sf_dir):
    prepare(spark, sf_dir)
    cases = [
        (0, "MULTIPOLYGON (((0 0, 2 0, 2 1, 0 1, 0 0)), "
            "((3 3, 5 3, 5 5, 3 5, 3 3)))"),
        (1, "POINT (2.5 7.5)"),
    ]
    df = (
        spark.createDataFrame(cases, "i int, wkt string")
        .select("i", geo.st_geometry_from_text(F.col("wkt")).alias("g"))
        .repartition(2)
        # materialized probe operands (module memory: un-materialized
        # WKT-parse subtrees inside nested predicate HOFs cost seconds
        # of Catalyst analysis per inlined lambda copy)
        .withColumn("pp", geo.st_geometry_from_text(
            F.lit("POLYGON ((1 0.5, 4 0.5, 4 0.8, 1 0.8, 1 0.5))")))
        .repartition(2)
    )
    g = F.col("g")

    def q(c):
        return F.format_string("%.4f", F.coalesce(c, F.lit(0.0)))

    return df.select(
        "i",
        geo.st_as_text(g).alias("rt_wkt"),
        q(geo.st_area(g)).alias("area_q"),
        q(geo.st_length(g)).alias("len_q"),
        geo.st_num_geometries(g).cast("bigint").alias("n_geoms"),
        geo.st_as_text(geo.st_geometry_n(g, F.lit(1))).alias("g1_wkt"),
        q(geo.st_area(geo.st_geometry_n(g, F.lit(2)))).alias("g2_area_q"),
        geo.st_geometry_n(g, F.lit(3)).isNull().alias("g3_null"),
        geo.st_geometry_type(g).alias("gtype"),
        geo.st_dimension(g).alias("dim"),
        F.size(geo.flatten_geometry_collections(g)).cast("bigint")
        .alias("flat_n"),
        geo.st_contains_point(g, F.lit(4.0), F.lit(4.0)).alias("ct_in"),
        geo.st_contains_point(g, F.lit(2.5), F.lit(2.0)).alias("ct_gap"),
        geo.st_intersects(g, F.col("pp")).alias("ix_poly"),
        q(geo.st_distance(
            g, geo.st_point(F.lit(2.5), F.lit(2.5)))).alias("dist_q"),
        q(geo.st_distance(
            g, geo.st_point(F.lit(1.0), F.lit(0.5)))).alias("dist0_q"),
    ).orderBy("i")


@register(
    "geo_nonconvex_overlay_golden",
    oracle="""
SELECT * FROM (VALUES
  (0, '3.0000', '13.0000', '9.0000', false, 'MULTIPOLYGON', true),
  (1, '2.6444', '12.3556', '9.3556', false, 'MULTIPOLYGON', true),
  (2, '0.0000', '8.0000', '4.0000', true, 'MULTIPOLYGON', true),
  (3, '1.0000', '12.0000', '0.0000', false, 'MULTIPOLYGON', true),
  (4, '8.0000', '40.0000', '24.0000', false, 'MULTIPOLYGON', true),
  (5, '1.0000', '15.0000', '14.0000', false, 'MULTIPOLYGON', true),
  (6, '2.0000', '10.0000', '6.0000', false, 'MULTIPOLYGON', true)
) AS v(i, inter_area_q, union_area_q, diff_area_q, inter_null,
       union_kind, incl_excl_ok)
ORDER BY i
""",
    doc="Non-convex overlay tier (round 9 — VERDICT r8 what's-missing "
        "#1, the last geometry thread): ear-clip convex decomposition "
        "lifts the non-convex-OPERAND pin for simple hole-free "
        "polygons (GeoFunctions.java overlay section; the reference "
        "delegates to Esri).  Cases: L-shape x overlapping square, "
        "concave arrow x triangle, disjoint squares (NULL "
        "intersection, 2-piece union), A inside concave B (diff "
        "empty->NULL), concave-notch pentagon x square, and a holed "
        "operand (supported since round 10 via bridge-edge hole "
        "insertion: B touches the hole corner, inter=B union=A).  "
        "Every row checks inclusion-"
        "exclusion |A union B| = |A|+|B|-|A inter B| inside the query; "
        "areas are pinned to 4dp.  Triangulation + piecewise "
        "Sutherland-Hodgman run in ONE Arrow-batched pandas UDF per "
        "operand pair (map-side, zero shuffle; the Column-fold "
        "formulation profiled at ~25 s/row interpreted — module "
        "docstring).",
    tags=("geo", "functions"),
)
def geo_nonconvex_overlay_golden(spark, sf_dir):
    from presto_spark.functions import geo_decompose as gd

    prepare(spark, sf_dir)
    cases = [
        (0, "POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))",
            "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"),
        (1, "POLYGON ((0 0, 4 0, 2 1, 4 4, 0 4, 0 0))",
            "POLYGON ((1 0, 3 0, 2 3, 1 0))"),
        (2, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
            "POLYGON ((5 5, 7 5, 7 7, 5 7, 5 5))"),
        (3, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))",
            "POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))"),
        (4, "POLYGON ((0 0, 8 0, 8 6, 4 2, 0 6, 0 0))",
            "POLYGON ((2 1, 6 1, 6 5, 2 5, 2 1))"),
        (5, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
            "(1 1, 2 1, 2 2, 1 2, 1 1))",
            "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
        # MULTIPOLYGON operand (round 9): two disjoint squares vs a
        # rectangle spanning both — each piece ear-clips separately
        (6, "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
            "((4 0, 6 0, 6 2, 4 2, 4 0)))",
            "POLYGON ((1 0, 5 0, 5 1, 1 1, 1 0))"),
    ]
    df = (
        spark.createDataFrame(cases, "i int, wa string, wb string")
        .select("i", geo.st_geometry_from_text(F.col("wa")).alias("a"),
                geo.st_geometry_from_text(F.col("wb")).alias("b"))
        .repartition(4)
        .withColumn("ta", gd.triangulate_raw(F.col("a")))
        .withColumn("tb", gd.triangulate_raw(F.col("b")))
        .repartition(4)
    )
    gi = gd.st_intersection_general(F.col("ta"), F.col("tb"))
    gu = gd.st_union_general(F.col("ta"), F.col("tb"))
    gdf = gd.st_difference_general(F.col("ta"), F.col("tb"))
    staged = df.select(
        "i",
        geo.st_area(F.col("a")).alias("aa"),
        geo.st_area(F.col("b")).alias("ab"),
        geo.st_area(gi).alias("ai"),
        geo.st_area(gu).alias("au"),
        geo.st_area(gdf).alias("ad"),
        gi.isNull().alias("ni"),
        (gu.isNull() | F.col("a").isNull()).alias("nu"),
        gu["kind"].alias("ku"),
    )

    def q(c):
        return F.format_string("%.4f", F.coalesce(c, F.lit(0.0)))

    return staged.select(
        "i",
        q(F.col("ai")).alias("inter_area_q"),
        q(F.col("au")).alias("union_area_q"),
        q(F.col("ad")).alias("diff_area_q"),
        F.col("ni").alias("inter_null"),
        F.col("ku").alias("union_kind"),
        F.when(
            F.col("nu"),
            F.lit(True),  # pinned-NULL rows are vacuously consistent
        ).otherwise(
            F.abs(
                F.col("au")
                - (F.col("aa") + F.col("ab") - F.coalesce(F.col("ai"),
                                                          F.lit(0.0)))
            ) < 1e-9
        ).alias("incl_excl_ok"),
    ).orderBy("i")


@register(
    "geo_union_agg_general_golden",
    oracle="""
SELECT * FROM (VALUES
  (0, '7.2500', false, 'MULTIPOLYGON'),
  (1, '13.0000', false, 'MULTIPOLYGON'),
  (2, '8.0000', false, 'MULTIPOLYGON'),
  (3, '10.0000', false, 'MULTIPOLYGON'),
  (4, '15.0000', false, 'MULTIPOLYGON'),
  (5, '0.0000', true, NULL),
  (6, '16.0000', false, 'MULTIPOLYGON')
) AS v(g, union_area_q, is_null, kind)
ORDER BY g
""",
    doc="General grouped dissolve (round 9 — geo_decompose."
        "geometry_union_agg_general; geospatial.rst geometry_union_agg "
        "without the convex tier's common-intersection requirement): "
        "n-ary union of ARBITRARY simple polygons (holes included)/"
        "hole-free-piece multipolygons per group via two-level ear-clip piece-set "
        "union (level 1 per (group, partition), level 2 over partial "
        "tilings).  Groups: overlapping convex trio (inclusion-"
        "exclusion 7.25), concave L + square (13), DISJOINT pair (8 — "
        "pinned NULL in the convex tier), multipolygon member bridging "
        "its own gap (10), holed member (15 — supported since round 10 "
        "via bridge-edge hole insertion), all-NULL group keeps its "
        "spine row, and a holed member whose hole a second member "
        "plugs exactly (16).",
    tags=("geo", "functions"),
)
def geo_union_agg_general_golden(spark, sf_dir):
    from presto_spark.functions import geo_decompose as gd

    prepare(spark, sf_dir)
    cases = [
        (0, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
        (0, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"),
        (0, "POLYGON ((1 0.5, 2.5 0.5, 2.5 2.5, 1 2.5, 1 0.5))"),
        (1, "POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))"),
        (1, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"),
        (2, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
        (2, "POLYGON ((5 5, 7 5, 7 7, 5 7, 5 5))"),
        (3, "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
            "((4 0, 6 0, 6 2, 4 2, 4 0)))"),
        (3, "POLYGON ((1 0, 5 0, 5 1, 1 1, 1 0))"),
        (4, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
            "(1 1, 2 1, 2 2, 1 2, 1 1))"),
        (5, None),
        # holed member whose hole a second member plugs exactly (r10)
        (6, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
            "(1 1, 3 1, 3 3, 1 3, 1 1))"),
        (6, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"),
    ]
    df = spark.createDataFrame(cases, "g int, wkt string").select(
        "g", geo.st_geometry_from_text(F.col("wkt")).alias("geom")
    ).repartition(3)
    out = gd.geometry_union_agg_general(df, ["g"], "geom")
    return out.select(
        "g",
        F.format_string(
            "%.4f", F.coalesce(geo.st_area(F.col("geometry")), F.lit(0.0))
        ).alias("union_area_q"),
        F.col("geometry").isNull().alias("is_null"),
        F.col("geometry")["kind"].alias("kind"),
    ).orderBy("g")


@register(
    "geo_holed_overlay_golden",
    oracle="""
SELECT * FROM (VALUES
  (0, '1.0000', '15.0000', '14.0000', false, 'MULTIPOLYGON', true),
  (1, '3.0000', '18.0000', '9.0000', false, 'MULTIPOLYGON', true),
  (2, '34.0000', '36.0000', '0.0000', false, 'MULTIPOLYGON', true),
  (3, '0.0000', '13.0000', '12.0000', true, 'MULTIPOLYGON', true),
  (4, '4.0000', '20.0000', '8.0000', false, 'MULTIPOLYGON', true)
) AS v(i, inter_area_q, union_area_q, diff_area_q, inter_null,
       union_kind, incl_excl_ok)
ORDER BY i
""",
    doc="Holed-operand overlay tier (round 10 — VERDICT r9 "
        "what's-missing #1 / next-round #4, the last geometry pin): "
        "POLYGONs with interior rings enter st_*_general via "
        "bridge-edge hole insertion — each hole's rightmost vertex "
        "connects to the nearest mutually visible ring vertex through "
        "a zero-width bridge, and the resulting weakly simple ring "
        "ear-clips under the full diagonal-validity test (O'Rourke "
        "§1.6; the reference reaches these shapes through Esri — "
        "GeoFunctions.java overlay section).  Cases: B touching the "
        "hole corner from inside the shell (inter=B, union=A), B "
        "overlapping shell AND hole, a two-hole shell against the "
        "full cover (diff empty→NULL area 0), B entirely inside the "
        "hole (inter NULL), and BOTH operands holed.  Every row "
        "checks inclusion-exclusion |A∪B| = |A|+|B|-|A∩B| in-query; "
        "areas pinned to 4dp.  Same plan shape as the r9 tier: one "
        "Arrow-batched pandas UDF per operand column, zero shuffle.",
    tags=("geo", "functions"),
)
def geo_holed_overlay_golden(spark, sf_dir):
    from presto_spark.functions import geo_decompose as gd

    prepare(spark, sf_dir)
    cases = [
        (0, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
            "(1 1, 2 1, 2 2, 1 2, 1 1))",
            "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
        (1, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
            "(1 1, 3 1, 3 3, 1 3, 1 1))",
            "POLYGON ((2 2, 5 2, 5 5, 2 5, 2 2))"),
        (2, "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), "
            "(1 1, 2 1, 2 2, 1 2, 1 1), (4 4, 5 4, 5 5, 4 5, 4 4))",
            "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0))"),
        (3, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
            "(1 1, 3 1, 3 3, 1 3, 1 1))",
            "POLYGON ((1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5))"),
        (4, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
            "(1 1, 3 1, 3 3, 1 3, 1 1))",
            "POLYGON ((2 0, 6 0, 6 4, 2 4, 2 0), "
            "(3 1, 5 1, 5 3, 3 3, 3 1))"),
    ]
    df = (
        spark.createDataFrame(cases, "i int, wa string, wb string")
        .select("i", geo.st_geometry_from_text(F.col("wa")).alias("a"),
                geo.st_geometry_from_text(F.col("wb")).alias("b"))
        .repartition(4)
        .withColumn("ta", gd.triangulate_raw(F.col("a")))
        .withColumn("tb", gd.triangulate_raw(F.col("b")))
        .repartition(4)
    )
    gi = gd.st_intersection_general(F.col("ta"), F.col("tb"))
    gu = gd.st_union_general(F.col("ta"), F.col("tb"))
    gdf = gd.st_difference_general(F.col("ta"), F.col("tb"))
    staged = df.select(
        "i",
        geo.st_area(F.col("a")).alias("aa"),
        geo.st_area(F.col("b")).alias("ab"),
        geo.st_area(gi).alias("ai"),
        geo.st_area(gu).alias("au"),
        geo.st_area(gdf).alias("ad"),
        gi.isNull().alias("ni"),
        gu["kind"].alias("ku"),
    )

    def q(c):
        return F.format_string("%.4f", F.coalesce(c, F.lit(0.0)))

    return staged.select(
        "i",
        q(F.col("ai")).alias("inter_area_q"),
        q(F.col("au")).alias("union_area_q"),
        q(F.col("ad")).alias("diff_area_q"),
        F.col("ni").alias("inter_null"),
        F.col("ku").alias("union_kind"),
        (
            F.abs(
                F.col("au")
                - (F.col("aa") + F.col("ab")
                   - F.coalesce(F.col("ai"), F.lit(0.0)))
            ) < 1e-9
        ).alias("incl_excl_ok"),
    ).orderBy("i")


@register(
    "geo_holed_multipolygon_golden",
    oracle="""
SELECT * FROM (VALUES
  (0, 'MULTIPOLYGON (((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0), (1.0 1.0, 1.0 2.0, 2.0 2.0, 2.0 1.0, 1.0 1.0)), ((6.0 0.0, 8.0 0.0, 8.0 2.0, 6.0 2.0, 6.0 0.0)))',
      '19.0000', CAST(2 AS BIGINT), '15.0000', false, true, '0.5000',
      '5.0000', '21.0000'),
  (1, 'MULTIPOLYGON (((0.0 0.0, 2.0 0.0, 2.0 1.0, 0.0 1.0, 0.0 0.0)), ((3.0 3.0, 5.0 3.0, 5.0 5.0, 3.0 5.0, 3.0 3.0)))',
      '6.0000', CAST(2 AS BIGINT), '2.0000', false, true, '0.5000',
      '2.0000', '11.0000'),
  (2, 'MULTIPOLYGON (((0.0 0.0, 2.0 0.0, 2.0 1.0, 0.0 1.0, 0.0 0.0)))',
      '2.0000', CAST(1 AS BIGINT), '2.0000', false, false, '0.5000',
      '2.0000', '7.0000')
) AS v(i, rt_wkt, area_q, n_geoms, g1_area_q, ct_hole, ct_shell,
       dist_q, inter_area_q, union_area_q)
ORDER BY i
""",
    doc="Holed MULTIPOLYGON pieces (round 10 — removes the round-9 "
        "WKT-parse pin, the last geometry model gap): the flat ring "
        "model marks piece shells CCW and holes CW, normalized at "
        "parse time, so '((shell),(hole)),((shell2))' WKT parses, "
        "measures, and overlays.  Pinned per row: the re-nested WKT "
        "roundtrip (hole re-grouped inside its piece, orientation-"
        "normalized), signed-ring-sum ST_Area, piece-shell "
        "ST_NumGeometries, ST_GeometryN returning the piece WITH its "
        "holes, hole-aware containment (parity over all rings — "
        "probe inside the hole false, inside a shell true), "
        "ST_Distance to an in-hole probe (= distance to the hole "
        "boundary), and the general overlay against a strip "
        "(orientation-grouped piece triangulation; inclusion-"
        "exclusion by construction: 19+7-5=21, 6+7-2=11, 2+7-2=7).  "
        "Rows: holed piece + plain piece, hole-free regression "
        "(byte-identical r8 roundtrip), CW-wound input normalized.  "
        "(GeoFunctions.java multi-geometry arms; Esri-backed in the "
        "reference.)",
    tags=("geo", "functions"),
)
def geo_holed_multipolygon_golden(spark, sf_dir):
    from presto_spark.functions import geo_decompose as gd

    prepare(spark, sf_dir)
    cases = [
        (0, "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0), "
            "(1 1, 2 1, 2 2, 1 2, 1 1)), ((6 0, 8 0, 8 2, 6 2, 6 0)))"),
        (1, "MULTIPOLYGON (((0 0, 2 0, 2 1, 0 1, 0 0)), "
            "((3 3, 5 3, 5 5, 3 5, 3 3)))"),
        # CW-wound piece: parser normalizes orientation
        (2, "MULTIPOLYGON (((0 0, 0 1, 2 1, 2 0, 0 0)))"),
    ]
    df = (
        spark.createDataFrame(cases, "i int, wkt string")
        .select("i", geo.st_geometry_from_text(F.col("wkt")).alias("g"))
        .repartition(2)
        .withColumn("b", geo.st_geometry_from_text(
            F.lit("POLYGON ((0 0, 7 0, 7 1, 0 1, 0 0))")))
        .repartition(2)
        .withColumn("ta", gd.triangulate_raw(F.col("g")))
        .withColumn("tb", gd.triangulate_raw(F.col("b")))
        .repartition(2)
    )
    g = F.col("g")
    gi = gd.st_intersection_general(F.col("ta"), F.col("tb"))
    gu = gd.st_union_general(F.col("ta"), F.col("tb"))

    def q(c):
        return F.format_string("%.4f", F.coalesce(c, F.lit(0.0)))

    return df.select(
        "i",
        geo.st_as_text(g).alias("rt_wkt"),
        q(geo.st_area(g)).alias("area_q"),
        geo.st_num_geometries(g).cast("bigint").alias("n_geoms"),
        q(geo.st_area(geo.st_geometry_n(g, F.lit(1)))).alias("g1_area_q"),
        geo.st_contains_point(g, F.lit(1.5), F.lit(1.5)).alias("ct_hole"),
        geo.st_contains_point(g, F.lit(3.5), F.lit(3.5)).alias("ct_shell"),
        q(geo.st_distance(
            g, geo.st_point(F.lit(1.5), F.lit(1.5)))).alias("dist_q"),
        q(geo.st_area(gi)).alias("inter_area_q"),
        q(geo.st_area(gu)).alias("union_area_q"),
    ).orderBy("i")


# ---- SPHERICAL_GEOGRAPHY tier (round 11) ----------------------------------

_SPHERICAL_POLYS = [
    # (pid, wkt) — no ring encloses a pole, so the spherical excess is
    # the plain per-edge term sum and DuckDB can replay it exactly
    # (the pole-correction branch is pinned by
    # tests/test_geo.py::test_spherical_area_reference_vectors).
    ("eighth", "POLYGON ((90 0, 0 0, 0 90, 90 0))"),
    ("holed", "POLYGON ((90 0, 0 0, 0 90, 90 0), "
              "(89 1, 1 1, 1 89, 89 1))"),
    ("parcel", "POLYGON ((-122.150124 37.486095, -122.149201 37.486606, "
               "-122.145725 37.486580, -122.145923 37.483961, "
               "-122.149324 37.482480, -122.150837 37.483238, "
               "-122.150901 37.485392, -122.150124 37.486095))"),
    ("unit_sq", "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"),
]


def _spherical_poly_values():
    rows = []
    for pid, wkt in _SPHERICAL_POLYS:
        body = wkt[len("POLYGON ("):-1]
        for ring_i, ring in enumerate(body.split("), (")):
            pts = ring.strip("() ").split(",")
            for seq, p in enumerate(pts):
                lon, lat = p.split()
                rows.append(f"('{pid}', {ring_i}, {seq}, {lon}, {lat})")
    return ",\n         ".join(rows)


_SPHERICAL_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nk,
         ((c_custkey % 340) - 170) + 0.25 AS lon,
         ((c_custkey % 160) - 80) + 0.25 AS lat,
         (c_nationkey * 6.0) - 72 AS alat,
         (c_nationkey * 13.0) - 150 AS alon
  FROM customer WHERE c_custkey <= 200
),
dist AS (
  SELECT 'dist' AS metric, CAST(c_custkey AS VARCHAR) AS k,
         printf('%.3f', 1000.0 * 6371.01 * atan2(
           sqrt(
             pow(cos(radians(alat)) * sin(radians(lon) - radians(alon)), 2)
             + pow(cos(radians(lat)) * sin(radians(alat))
                   - sin(radians(lat)) * cos(radians(alat))
                     * cos(radians(lon) - radians(alon)), 2)),
           sin(radians(lat)) * sin(radians(alat))
           + cos(radians(lat)) * cos(radians(alat))
             * cos(radians(lon) - radians(alon)))) AS v
  FROM pts
),
segs AS (
  SELECT nk, lon, lat,
         lag(lon) OVER w AS plon, lag(lat) OVER w AS plat
  FROM pts
  WINDOW w AS (PARTITION BY nk ORDER BY c_custkey)
),
seglen AS (
  SELECT nk, 1000.0 * 6371.01 * atan2(
           sqrt(
             pow(cos(radians(lat)) * sin(radians(plon) - radians(lon)), 2)
             + pow(cos(radians(plat)) * sin(radians(lat))
                   - sin(radians(plat)) * cos(radians(lat))
                     * cos(radians(plon) - radians(lon)), 2)),
           sin(radians(plat)) * sin(radians(lat))
           + cos(radians(plat)) * cos(radians(lat))
             * cos(radians(plon) - radians(lon))) AS seg
  FROM segs WHERE plon IS NOT NULL
),
pathlen AS (
  SELECT 'pathlen' AS metric, CAST(nk AS VARCHAR) AS k,
         printf('%.3f', sum(seg)) AS v
  FROM seglen GROUP BY nk
),
cent3d AS (
  SELECT nk,
         sum(sin(radians(90 - lat)) * cos(radians(lon))) AS sx,
         sum(sin(radians(90 - lat)) * sin(radians(lon))) AS sy,
         sum(cos(radians(90 - lat))) AS sz,
         count(*) AS n
  FROM pts GROUP BY nk HAVING count(*) >= 2
),
centroid AS (
  SELECT 'centroid' AS metric, CAST(nk AS VARCHAR) AS k,
         printf('%.6f,%.6f',
                degrees(atan2(sy, sx)),
                90 - degrees(atan2(sqrt(sx * sx + sy * sy), sz))) AS v
  FROM cent3d
),
verts(pid, ring, seq, lon, lat) AS (
  VALUES {_spherical_poly_values()}
),
terms AS (
  SELECT a.pid, a.ring,
         2 * atan2(
           tan((radians(b.lon) - radians(a.lon)) / 2)
             * (tan(radians(a.lat) / 2) + tan(radians(b.lat) / 2)),
           1 + tan(radians(a.lat) / 2) * tan(radians(b.lat) / 2)) AS term
  FROM verts a
  JOIN verts b ON b.pid = a.pid AND b.ring = a.ring AND b.seq = a.seq + 1
),
ringexc AS (
  SELECT pid, ring, abs(sum(term)) AS exc FROM terms GROUP BY pid, ring
),
areas AS (
  SELECT 'area' AS metric, pid AS k,
         printf('%.3f',
                abs(sum(CASE WHEN ring = 0 THEN exc ELSE -exc END))
                * 6371010.0 * 6371010.0 / 1e6) AS v
  FROM ringexc GROUP BY pid
)
SELECT metric, k, v FROM (
  SELECT metric, k, v FROM dist
  UNION ALL SELECT metric, k, v FROM pathlen
  UNION ALL SELECT metric, k, v FROM centroid
  UNION ALL SELECT metric, k, v FROM areas
) u
ORDER BY metric, k
"""


@register(
    "geo_spherical_golden",
    oracle=_SPHERICAL_ORACLE,
    doc="SPHERICAL_GEOGRAPHY type tier (SphericalGeoFunctions.java; "
        "SphericalGeographyUtils.java; geospatial.rst 'Spherical "
        "Geography'): to_spherical_geography casts with range "
        "validation, geodesic ST_Distance (POINT, meters), ST_Length "
        "(LINESTRING, per-edge great-circle sum), ST_Area "
        "(POLYGON/MULTIPOLYGON spherical excess, holes subtract, "
        "SphericalExcessCalculator:334-434), ST_Centroid "
        "(MULTIPOINT 3-D cartesian mean). DuckDB replays the Vincenty "
        "and L'Huilier excess formulas verbatim over the same "
        "synthetic lon/lat points and literal no-pole polygons; the "
        "pole-correction branch is pytest-pinned against the "
        "reference's own north-pole vector. All floats emitted "
        "row-level at fixed decimals; sums are over <= 8 terms so "
        "cross-engine FP order is inert at these precisions.",
    tags=("geo", "functions"),
)
def geo_spherical_golden(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.functions import geo_spherical as sph

    cust = spark.table("customer").filter(F.col("c_custkey") <= 200)
    pts = cust.select(
        "c_custkey",
        F.col("c_nationkey").cast("bigint").alias("nk"),
        (((F.col("c_custkey") % 340) - 170) + 0.25).alias("lon"),
        (((F.col("c_custkey") % 160) - 80) + 0.25).alias("lat"),
        ((F.col("c_nationkey") * 6.0) - 72).alias("alat"),
        ((F.col("c_nationkey") * 13.0) - 150).alias("alon"),
    )
    dist = pts.select(
        F.lit("dist").alias("metric"),
        F.col("c_custkey").cast("string").alias("k"),
        F.format_string("%.3f", sph.st_distance_sphere(
            sph.to_spherical_geography(
                geo.st_point(F.col("lon"), F.col("lat"))),
            sph.to_spherical_geography(
                geo.st_point(F.col("alon"), F.col("alat"))),
        )).alias("v"),
    )
    grouped = (
        pts.groupBy("nk")
        .agg(F.array_sort(
            F.collect_list(F.struct("c_custkey", "lon", "lat"))).alias("ps"))
        .filter(F.size("ps") >= 2)
        .withColumn("ring", F.transform(
            "ps", lambda p: F.struct(p["lon"].alias("x"),
                                     p["lat"].alias("y"))))
    )
    pathlen = grouped.select(
        F.lit("pathlen").alias("metric"),
        F.col("nk").cast("string").alias("k"),
        F.format_string("%.3f", sph.st_length_sphere(
            sph.to_spherical_geography(F.struct(
                F.lit("LINESTRING").alias("kind"),
                F.array(F.col("ring")).alias("rings"))))).alias("v"),
    )
    cent = grouped.withColumn(
        "c", sph.st_centroid_sphere(F.struct(
            F.lit("MULTIPOINT").alias("kind"),
            F.array(F.col("ring")).alias("rings"))),
    ).select(
        F.lit("centroid").alias("metric"),
        F.col("nk").cast("string").alias("k"),
        F.format_string(
            "%.6f,%.6f", geo.st_x(F.col("c")), geo.st_y(F.col("c"))
        ).alias("v"),
    )
    polys = spark.createDataFrame(_SPHERICAL_POLYS, "pid string, wkt string")
    areas = polys.select(
        F.lit("area").alias("metric"),
        F.col("pid").alias("k"),
        F.format_string("%.3f", sph.st_area_sphere(
            sph.to_spherical_geography(
                geo.st_geometry_from_text(F.col("wkt")))) / 1e6).alias("v"),
    )
    return (
        dist.unionByName(pathlen).unionByName(cent).unionByName(areas)
        .orderBy("metric", "k")
    )


_BUFFER_ORACLE = """
WITH a32 AS (SELECT 16.0 * sin(pi() / 16.0) AS disc)
SELECT * FROM (
  SELECT 'h_line' AS k, 'MULTIPOLYGON' AS kind,
         printf('%.6f', 20.0 + disc) AS area, true AS contains_mid
  FROM a32
  UNION ALL
  SELECT 'collinear', 'MULTIPOLYGON', printf('%.6f', 20.0 + disc), true
  FROM a32
  UNION ALL
  SELECT 'point', 'POLYGON', printf('%.6f', disc), true FROM a32
  UNION ALL
  SELECT 'two_points', 'MULTIPOLYGON', printf('%.6f', 2.0 * disc), true
  FROM a32
  UNION ALL
  SELECT 'l_shape', 'MULTIPOLYGON', 'bounded', true FROM a32
  UNION ALL
  SELECT 'zero_d', 'LINESTRING', '0.000000', true FROM a32
  UNION ALL
  -- square Minkowski sum: s^2 + 4 s d + disc (corner quarters align
  -- with 32-gon axis vertices, so the quadrant split is exact)
  SELECT 'square_poly', 'MULTIPOLYGON',
         printf('%.6f', 100.0 + 40.0 + disc), true FROM a32
  UNION ALL
  -- holed square: outer Minkowski minus the eroded hole remnant
  -- (4-2d)^2 = 4 (erosion by a disc is exact on a square hole)
  SELECT 'holed_poly', 'MULTIPOLYGON',
         printf('%.6f', 100.0 + 40.0 + disc - 4.0), true FROM a32
) u ORDER BY k
"""


@register(
    "geo_buffer_line_golden",
    oracle=_BUFFER_ORACLE,
    doc="ST_Buffer beyond POINT (GeoFunctions.java stBuffer, Esri-"
        "backed in the reference; VERDICT r10 next-round #8): "
        "LINESTRING/MULTIPOINT buffers as per-segment strip rectangles "
        "+ per-vertex 32-gon discs dissolved into a disjoint tiling "
        "(geo_decompose.st_buffer_general, one Arrow crossing per "
        "row). Axis-aligned and collinear cases have closed-form "
        "union areas (strip + exactly one 32-gon split across the "
        "ends — DuckDB replays 20 + 16·sin(π/16) exactly); the "
        "L-shape emits a bounds invariant (corner overlap is "
        "irrational); d=0 returns the input unchanged; every buffer "
        "must contain its source vertices (even-odd containment over "
        "the disjoint tiling). POLYGON/MULTIPOLYGON buffer too "
        "(round-11 second pass): interior triangulation + boundary "
        "strips/discs tile the Minkowski sum — the square replays "
        "s^2+4sd+disc exactly and the holed square subtracts the "
        "exactly-eroded hole remnant.",
    tags=("geo", "functions"),
)
def geo_buffer_line_golden(spark, sf_dir):
    prepare(spark, sf_dir)
    import math

    from presto_spark.functions import geo_decompose as gd

    a32 = 16.0 * math.sin(math.pi / 16.0)
    cases = [
        ("h_line", "LINESTRING (0 0, 10 0)", 1.0),
        ("collinear", "LINESTRING (0 0, 5 0, 10 0)", 1.0),
        ("point", "POINT (3 4)", 1.0),
        ("two_points", "MULTIPOINT (0 0, 20 0)", 1.0),
        ("l_shape", "LINESTRING (0 0, 4 0, 4 4)", 1.0),
        ("zero_d", "LINESTRING (0 0, 10 0)", 0.0),
        ("square_poly", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", 1.0),
        ("holed_poly",
         "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
         "(3 3, 7 3, 7 7, 3 7, 3 3))", 1.0),
    ]
    df = (
        spark.createDataFrame(cases, "k string, wkt string, d double")
        .select("k", "d", geo.st_geometry_from_text(F.col("wkt")).alias("g"))
        .repartition(2)
        .withColumn("b", gd.st_buffer_general(F.col("g"), F.col("d")))
        .repartition(2)
    )
    area = geo.st_area(F.col("b"))
    return df.select(
        "k",
        F.col("b")["kind"].alias("kind"),
        F.when(F.col("k") == "l_shape",
               # analytic bounds: strips 2·L·d = 16 plus joint/cap
               # area strictly inside (0, one full disc)
               F.when((area > 16.0) & (area < 16.0 + a32),
                      F.lit("bounded")).otherwise(F.lit("out-of-bounds")))
         .when(F.col("k") == "zero_d", F.format_string("%.6f", F.lit(0.0)))
         .otherwise(F.format_string("%.6f", area)).alias("area"),
        F.when(
            F.col("k") == "zero_d",
            F.col("b")["kind"] == F.lit("LINESTRING"),
        ).otherwise(
            # probe near the first vertex but OFF the piece seams —
            # even-odd parity over a tiling is undefined exactly on
            # internal edges (the holed-polygon case sits its first
            # vertex on the x=0 seam)
            geo.st_contains_point(
                F.col("b"),
                F.col("g")["rings"][0][0]["x"] + F.lit(0.46875),
                F.col("g")["rings"][0][0]["y"] + F.lit(0.53125))
        ).alias("contains_mid"),
    ).orderBy("k")


_GC_ORACLE = """
SELECT * FROM (VALUES
  ('four_kinds',
   'GEOMETRYCOLLECTION (POINT (1.0 2.0), ' ||
   'LINESTRING (0.0 0.0, 1.0 1.0, 2.0 0.0), ' ||
   'POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0)), ' ||
   'MULTIPOINT (5.0 5.0, 6.0 6.0))',
   CAST(4 AS INT), CAST(10 AS BIGINT), CAST(2 AS INT),
   'ST_GeomCollection',
   'POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))',
   '16.0000'),  -- member 3
  ('lines_only',
   'GEOMETRYCOLLECTION (LINESTRING (0.0 0.0, 3.0 4.0), ' ||
   'POINT (9.0 9.0))',
   CAST(2 AS INT), CAST(3 AS BIGINT), CAST(1 AS INT),
   'ST_GeomCollection',
   'POINT (9.0 9.0)',
   '0.0000'),  -- member 2; ST_Area(point) = 0 (reference contract)
  ('with_multipolygon',
   'GEOMETRYCOLLECTION (MULTIPOLYGON (((0.0 0.0, 1.0 0.0, 1.0 1.0, ' ||
   '0.0 1.0, 0.0 0.0)), ((2.0 2.0, 3.0 2.0, 3.0 3.0, 2.0 3.0, 2.0 2.0))), ' ||
   'LINESTRING (0.0 0.0, 1.0 0.0))',
   CAST(2 AS INT), CAST(10 AS BIGINT), CAST(2 AS INT),
   'ST_GeomCollection',
   'MULTIPOLYGON (((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 1.0, 0.0 0.0)), ' ||
   '((2.0 2.0, 3.0 2.0, 3.0 3.0, 2.0 3.0, 2.0 2.0)))',
   '2.0000')  -- member 1
) t(k, txt, ng, np, dim, gtype, g_m_txt, g_m_area)
ORDER BY k
"""


@register(
    "geo_collection_golden",
    oracle=_GC_ORACLE,
    doc="GEOMETRYCOLLECTION kind (GeoFunctions.java; GeometryType.java"
        ":29 ST_GeomCollection; round 11 — closes the last geometry "
        "kind pin with user surface): WKT parse/print over the "
        "header-ring member encoding (geo.py _gc_rings), "
        "ST_NumGeometries / ST_NumPoints / ST_Dimension (member max) / "
        "ST_GeometryType / ST_GeometryN member extraction feeding the "
        "planar measures (member POLYGON/MULTIPOLYGON areas). Members "
        "are simple kinds only — nested collections parse NULL "
        "(documented, same class as the empty-geometry pin). Oracle is "
        "the literal expected table: every output is deterministic "
        "text/ints over literal WKT.",
    tags=("geo", "functions"),
)
def geo_collection_golden(spark, sf_dir):
    prepare(spark, sf_dir)
    # (k, wkt, m) — m is the 1-based member each case extracts
    cases = [
        ("four_kinds",
         "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1, 2 0), "
         "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)), MULTIPOINT (5 5, 6 6))",
         3),
        ("lines_only",
         "GEOMETRYCOLLECTION (LINESTRING (0 0, 3 4), POINT (9 9))",
         2),
        ("with_multipolygon",
         "GEOMETRYCOLLECTION (MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
         "((2 2, 3 2, 3 3, 2 3, 2 2))), LINESTRING (0 0, 1 0))",
         1),
    ]
    df = (
        spark.createDataFrame(cases, "k string, wkt string, m int")
        .select("k", "m",
                geo.st_geometry_from_text_full(F.col("wkt")).alias("g"))
        .repartition(2)
    )
    g = F.col("g")
    member = geo.st_geometry_n(g, F.col("m"))
    return df.select(
        "k",
        geo.st_as_text(g).alias("txt"),
        geo.st_num_geometries(g).alias("ng"),
        geo.st_num_points(g).alias("np"),
        geo.st_dimension(g).alias("dim"),
        geo.st_geometry_type(g).alias("gtype"),
        geo.st_as_text(member).alias("g_m_txt"),
        F.format_string("%.4f", geo.st_area(member)).alias("g_m_area"),
    ).orderBy("k")


_PREDICATES_ORACLE = """
SELECT * FROM (VALUES
  ('corner_touch', true,  false, false, false, false, false, false,
   'FF2F01212', false),
  ('contains',     false, false, false, false, false, true,  false,
   '212FF1FF2', false),
  ('disjoint',     false, false, false, true,  false, false, false,
   'FF2FF1212', false),
  ('donut_hole',   false, false, false, true,  false, false, false,
   'FF2FF1212', false),
  ('edge_touch',   true,  false, false, false, false, false, false,
   'FF2F11212', false),
  ('equals',       false, false, false, false, true,  true,  true,
   '2FFF1FFF2', true),
  ('fills_hole',   true,  false, false, false, false, false, false,
   'FF2F112F2', false),
  ('line_cross',   false, true,  false, false, false, false, false,
   '0F1FF0102', false),
  ('line_end_touch', true, false, false, false, false, false, false,
   'FF1F00102', false),
  ('line_overlap', false, false, true,  false, false, false, false,
   '1010F0102', false),
  ('mpt_partial',  false, true,  false, false, false, false, false,
   '0F0FFF212', false),
  ('overlap',      false, false, true,  false, false, false, false,
   '212101212', false),
  ('poly_line_cross', false, true, false, false, false, false, false,
   '1F20F1102', false),
  ('poly_line_edge', true, false, false, false, false, false, false,
   'FF2101FF2', false),
  ('pt_boundary',  true,  false, false, false, false, false, false,
   'FF20F1FF2', false),
  ('pt_in',        false, false, false, false, false, true,  false,
   '0F2FF1FF2', false)
) t(k, p_touches, p_crosses, p_overlaps, p_disjoint, p_equals,
    p_contains, p_within, m, eqpat)
ORDER BY k
"""


@register(
    "geo_predicates_golden",
    oracle=_PREDICATES_ORACLE,
    doc="DE-9IM relationship tier (GeoFunctions.java ST_Touches :1060, "
        "ST_Crosses :1068, ST_Disjoint :1076, ST_Equals :1083, "
        "ST_Overlaps, ST_Relate :1445, general ST_Contains/ST_Within; "
        "docs geospatial.rst:133-167; VERDICT r11 next-round #1): the "
        "full 9-cell matrix is computed once per pair in one Arrow-"
        "batched UDF (event-point splitting + subsegment-midpoint "
        "classification + open-set dimension lifts — geo_relate.py) "
        "and every predicate reads the matrix as a Column expression. "
        "Truth table over the interesting configurations: partial "
        "overlap, shared edge, corner touch, disjoint, containment, "
        "equality, hole-isolation, hole-filling, proper line cross, "
        "collinear overlap, endpoint touch, polygon-line cross/edge, "
        "boundary point, split multipoint. Matrix strings match "
        "PostGIS/JTS on identical WKT; the oracle is the literal "
        "expected table. Scale: per-row work, zero shuffle.",
    tags=("geo", "functions"),
)
def geo_predicates_golden(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.functions import geo_relate as gr

    sq = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    donut = ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
             "(3 3, 7 3, 7 7, 3 7, 3 3))")
    cases = [
        ("overlap", sq, "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"),
        ("edge_touch", sq, "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"),
        ("corner_touch", sq,
         "POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))"),
        ("disjoint", sq, "POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))"),
        ("contains", sq, "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"),
        ("equals", sq, sq),
        ("donut_hole", donut, "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"),
        ("fills_hole", donut, "POLYGON ((3 3, 7 3, 7 7, 3 7, 3 3))"),
        ("line_cross", "LINESTRING (0 0, 10 10)",
         "LINESTRING (0 10, 10 0)"),
        ("line_overlap", "LINESTRING (0 0, 6 0)",
         "LINESTRING (4 0, 10 0)"),
        ("line_end_touch", "LINESTRING (0 0, 10 10)",
         "LINESTRING (10 10, 20 20)"),
        ("poly_line_cross", sq, "LINESTRING (5 -5, 5 20)"),
        ("poly_line_edge", sq, "LINESTRING (0 0, 10 0)"),
        ("pt_boundary", sq, "POINT (0 5)"),
        ("pt_in", sq, "POINT (3 3)"),
        ("mpt_partial", "MULTIPOINT (3 3, 50 50)", sq),
    ]
    df = (
        spark.createDataFrame(cases, "k string, wa string, wb string")
        .select("k",
                geo.st_geometry_from_text(F.col("wa")).alias("a"),
                geo.st_geometry_from_text(F.col("wb")).alias("b"))
        .repartition(2)
    )
    a, b = F.col("a"), F.col("b")
    return df.select(
        "k",
        gr.st_touches(a, b).alias("p_touches"),
        gr.st_crosses(a, b).alias("p_crosses"),
        gr.st_overlaps(a, b).alias("p_overlaps"),
        gr.st_disjoint(a, b).alias("p_disjoint"),
        gr.st_equals(a, b).alias("p_equals"),
        gr.st_contains_general(a, b).alias("p_contains"),
        gr.st_within_general(a, b).alias("p_within"),
        gr.geometry_relate_matrix(a, b).alias("m"),
        gr.st_relate(a, b, "T*F**FFF*").alias("eqpat"),
    ).orderBy("k")


def _ndr_hex():
    """Expected NDR WKB hex, re-derived from the OGC layout spec with
    struct.pack (independent of the engine's writer)."""
    import struct

    def pts(ps):
        return b"".join(struct.pack("<dd", x, y) for x, y in ps)

    def poly(rings):
        body = struct.pack("<I", len(rings))
        for r in rings:
            body += struct.pack("<I", len(r)) + pts(r)
        return b"\x01" + struct.pack("<I", 3) + body

    pt = b"\x01" + struct.pack("<I", 1) + pts([(1, 2)])
    ls = b"\x01" + struct.pack("<I", 2) + struct.pack("<I", 2) + \
        pts([(0, 0), (1, 1)])
    mp = b"\x01" + struct.pack("<I", 6) + struct.pack("<I", 2) + \
        poly([[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]]) + \
        poly([[(2, 2), (3, 2), (3, 3), (2, 3), (2, 2)]])
    gc = b"\x01" + struct.pack("<I", 7) + struct.pack("<I", 2) + pt + ls
    return {k: v.hex().upper() for k, v in
            (("pt", pt), ("mp", mp), ("gc", gc))}


_HEX = _ndr_hex()

_ACCESSORS2_ORACLE = f"""
SELECT * FROM (VALUES
  ('bowtie', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
   CAST(NULL AS VARCHAR),  -- bd_ring is all-NULL: pin VARCHAR or the
                           -- VALUES table defaults the column to INT
   false, false, CAST(1 AS INT), NULL, NULL, NULL, NULL, NULL, NULL),
  ('ctors', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
   true, true, CAST(1 AS INT), NULL, NULL,
   'LINESTRING (0.0 0.0, 3.0 4.0, 5.0 0.0)',
   'MULTIPOINT (1.0 1.0, 1.0 1.0, 2.0 3.0)',
   'POINT (0.0 0.0)|POINT (3.0 4.0)',
   'POLYGON ((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 1.0, 0.0 0.0))'),
  ('holes', NULL, NULL,
   'LINESTRING (5.0 5.0, 6.0 5.0, 6.0 6.0, 5.0 6.0, 5.0 5.0)',
   CAST(2 AS BIGINT),
   'MULTILINESTRING ((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0), ' ||
   '(1.0 1.0, 2.0 1.0, 2.0 2.0, 1.0 2.0, 1.0 1.0), ' ||
   '(5.0 5.0, 6.0 5.0, 6.0 6.0, 5.0 6.0, 5.0 5.0))',
   NULL, NULL, NULL, NULL, true, true, CAST(1 AS INT), NULL, NULL,
   NULL, NULL, NULL, NULL),
  ('line', NULL, NULL, NULL, NULL,
   'MULTIPOINT (0.0 0.0, 5.0 5.0)',
   'POINT (0.0 0.0)', 'POINT (5.0 5.0)',
   'LINESTRING (0.0 0.0, 5.0 0.0, 5.0 5.0)', NULL,
   true, true, CAST(1 AS INT), NULL, NULL, NULL, NULL, NULL, NULL),
  ('mpoly_members', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
   true, true, CAST(2 AS INT),
   'POLYGON ((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 1.0, 0.0 0.0))', NULL,
   NULL, NULL, NULL, NULL),
  ('ring_line', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
   true, true, CAST(1 AS INT), NULL, NULL, NULL, NULL, NULL, NULL),
  ('selfcross_line', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
   true, false, CAST(1 AS INT), NULL, NULL, NULL, NULL, NULL, NULL),
  ('sym', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
   true, true, CAST(1 AS INT), NULL, '4.0000',
   NULL, NULL, NULL, NULL),
  ('wkb_gc',
   'GEOMETRYCOLLECTION (POINT (1.0 2.0), LINESTRING (0.0 0.0, 1.0 1.0))',
   '{_HEX["gc"]}', NULL, NULL, NULL, NULL, NULL, NULL, NULL,
   NULL, NULL, CAST(2 AS INT), NULL, NULL,
   NULL, NULL, NULL, NULL),  -- valid/simple: GC out of scope

  ('wkb_mpoly',
   'MULTIPOLYGON (((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 1.0, 0.0 0.0)), ' ||
   '((2.0 2.0, 3.0 2.0, 3.0 3.0, 2.0 3.0, 2.0 2.0)))',
   '{_HEX["mp"]}', NULL, NULL, NULL, NULL, NULL, NULL, NULL,
   true, true, CAST(2 AS INT), NULL, NULL, NULL, NULL, NULL, NULL),
  ('wkb_point', 'POINT (1.0 2.0)', '{_HEX["pt"]}',
   NULL, NULL, NULL, NULL, NULL, NULL, NULL,
   true, true, CAST(1 AS INT), NULL, NULL, NULL, NULL, NULL, NULL)
) t(k, rt_txt, wkb_hex, ir2_txt, n_int, bd_txt, env_lo, env_hi,
    lft_txt, bd_ring, valid, simple, n_geoms, g1_txt, sym_area,
    lstr_txt, mpt_txt, pts_txt, poly_txt)
ORDER BY k
"""


@register(
    "geo_accessors2_golden",
    oracle=_ACCESSORS2_ORACLE,
    doc="Round-12 geometry surface tail (VERDICT r11 next-round "
        "#2/#3/#4): ST_GeomFromBinary/ST_AsBinary WKB round-trip "
        "(GeoFunctions.java:252/:268 — NDR hex pinned against a "
        "struct.pack re-derivation of the OGC layout, incl. "
        "MULTIPOLYGON and GEOMETRYCOLLECTION), ST_LineFromText "
        "(:144), ST_InteriorRingN/ST_InteriorRings (:717/:557), "
        "ST_Geometries (:691), ST_EnvelopeAsPts (:887), ST_Boundary "
        "(:866 — MULTILINESTRING rings, MULTIPOINT curve endpoints, "
        "NULL for the closed ring's empty boundary), ST_IsValid/"
        "ST_IsSimple (:399/:383 — bowtie invalid, self-crossing line "
        "non-simple), ST_SymDifference (:1033 — two unit-overlap "
        "squares, area 4). Oracle is the literal expected table.",
    tags=("geo", "functions"),
)
def geo_accessors2_golden(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.functions import geo_decompose as gd

    holes_wkt = ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                 "(1 1, 2 1, 2 2, 1 2, 1 1), (5 5, 6 5, 6 6, 5 6, 5 5))")
    cases = [
        # (k, wa, wb) — wb only for the symdifference case
        ("wkb_point", "POINT (1 2)", None),
        ("wkb_mpoly",
         "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
         "((2 2, 3 2, 3 3, 2 3, 2 2)))", None),
        ("wkb_gc",
         "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))", None),
        ("holes", holes_wkt, None),
        ("line", "LINESTRING (0 0, 5 0, 5 5)", None),
        ("ring_line", "LINESTRING (0 0, 1 0, 1 1, 0 0)", None),
        ("bowtie", "POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))", None),
        ("selfcross_line", "LINESTRING (0 0, 4 4, 4 0, 0 4)", None),
        ("mpoly_members",
         "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
         "((2 2, 3 2, 3 3, 2 3, 2 2)))", None),
        ("sym", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
         "POLYGON ((1 0, 3 0, 3 2, 1 2, 1 0))"),
        ("ctors", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", None),
    ]
    df = (
        spark.createDataFrame(cases, "k string, wa string, wb string")
        .select(
            "k", "wa",
            geo.st_geometry_from_text_full(F.col("wa")).alias("g"),
            geo.st_geometry_from_text(F.col("wb")).alias("h"))
        .repartition(2)
        .withColumn("ta", gd.triangulate_raw(F.col("g")))
        .withColumn("tb", gd.triangulate_raw(F.col("h")))
        .repartition(2)
    )
    g, k = F.col("g"), F.col("k")
    wkb = k.isin("wkb_point", "wkb_mpoly", "wkb_gc")
    ctors = k == "ctors"
    pts3 = F.array(geo.st_point(F.lit(0.0), F.lit(0.0)),
                   geo.st_point(F.lit(3.0), F.lit(4.0)),
                   geo.st_point(F.lit(5.0), F.lit(0.0)))
    mpts = F.array(geo.st_point(F.lit(1.0), F.lit(1.0)),
                   geo.st_point(F.lit(1.0), F.lit(1.0)),
                   geo.st_point(F.lit(2.0), F.lit(3.0)))
    sym = gd.st_sym_difference_general(F.col("ta"), F.col("tb"))
    return df.select(
        "k",
        F.when(wkb, geo.st_as_text(geo.st_geometry_from_binary(
            geo.st_as_binary(g)))).alias("rt_txt"),
        F.when(wkb, F.hex(geo.st_as_binary(g))).alias("wkb_hex"),
        F.when(k == "holes", geo.st_as_text(
            geo.st_interior_ring_n(g, 2))).alias("ir2_txt"),
        F.when(k == "holes",
               geo.st_num_interior_ring(g)).alias("n_int"),
        F.when(k.isin("holes", "line"),
               geo.st_as_text(geo.st_boundary(g))).alias("bd_txt"),
        F.when(k == "line", geo.st_as_text(
            geo.st_envelope_as_pts(g)[0])).alias("env_lo"),
        F.when(k == "line", geo.st_as_text(
            geo.st_envelope_as_pts(g)[1])).alias("env_hi"),
        F.when(k == "line", geo.st_as_text(
            geo.st_line_from_text(F.col("wa")))).alias("lft_txt"),
        # closed ring: empty boundary pin — NULL text
        F.when(k == "ring_line",
               geo.st_as_text(geo.st_boundary(g))).alias("bd_ring"),
        F.when(k != "wkb_gc", geo.st_is_valid(g)).alias("valid"),
        F.when(k != "wkb_gc", geo.st_is_simple(g)).alias("simple"),
        F.size(geo.st_geometries(g)).cast("int").alias("n_geoms"),
        F.when(k == "mpoly_members", geo.st_as_text(
            geo.st_geometries(g)[0])).alias("g1_txt"),
        F.when(k == "sym", F.format_string(
            "%.4f", geo.st_area(sym))).alias("sym_area"),
        # constructor tail (round-12 second pass): ST_LineString /
        # ST_MultiPoint over point arrays, ST_Points projection,
        # ST_Polygon validated parse
        F.when(ctors, geo.st_as_text(
            geo.st_line_string(pts3))).alias("lstr_txt"),
        F.when(ctors, geo.st_as_text(
            geo.st_multi_point(mpts))).alias("mpt_txt"),
        F.when(ctors, F.concat_ws("|", F.transform(
            geo.st_points(geo.st_line_string(F.slice(pts3, 1, 2))),
            geo.st_as_text))).alias("pts_txt"),
        F.when(ctors, geo.st_as_text(geo.st_polygon(
            F.lit("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")))
        ).alias("poly_txt"),
    ).orderBy("k")


_SQL_MEASURES_POLY_VALUES = ", ".join(
    f"('{pid}', '{wkt}')" for pid, wkt in _SPHERICAL_POLYS)

_SQL_MEASURES_TEXT = f"""
WITH pts AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nk,
         ((c_custkey % 340) - 170) + 0.25 AS lon,
         ((c_custkey % 160) - 80) + 0.25 AS lat,
         (c_nationkey * 6.0) - 72 AS alat,
         (c_nationkey * 13.0) - 150 AS alon
  FROM customer WHERE c_custkey <= 200
),
dist AS (
  SELECT 'dist' AS metric, CAST(c_custkey AS STRING) AS k,
         format_string('%.3f', st_distance(
           to_spherical_geography(st_point(lon, lat)),
           to_spherical_geography(st_point(alon, alat)))) AS v
  FROM pts
),
grouped AS (
  SELECT nk,
         transform(array_sort(collect_list(struct(c_custkey, lon, lat))),
                   p -> named_struct('x', p.lon, 'y', p.lat)) AS ring
  FROM pts GROUP BY nk HAVING count(*) >= 2
),
pathlen AS (
  SELECT 'pathlen' AS metric, CAST(nk AS STRING) AS k,
         format_string('%.3f', st_length(to_spherical_geography(
           named_struct('kind', 'LINESTRING', 'rings', array(ring)))))
           AS v
  FROM grouped
),
cent AS (
  SELECT 'centroid' AS metric, CAST(nk AS STRING) AS k,
         format_string('%.6f,%.6f',
                       c.rings[0][0].x, c.rings[0][0].y) AS v
  FROM (SELECT nk, to_geometry(st_centroid(to_spherical_geography(
          named_struct('kind', 'MULTIPOINT', 'rings', array(ring))))) AS c
        FROM grouped)
),
polys(pid, wkt) AS (VALUES {_SQL_MEASURES_POLY_VALUES}),
areas AS (
  SELECT 'area' AS metric, pid AS k,
         format_string('%.3f', st_area(to_spherical_geography(
           st_geometryfromtext(wkt))) / 1e6) AS v
  FROM polys
)
SELECT metric, k, v FROM (
  SELECT * FROM dist
  UNION ALL SELECT * FROM pathlen
  UNION ALL SELECT * FROM cent
  UNION ALL SELECT * FROM areas
)
ORDER BY metric, k
"""


@register(
    "geo_sql_measures_golden",
    oracle=_SPHERICAL_ORACLE,
    doc="SQL-spelling surface of the measure tier (round 12, VERDICT "
        "r11 #8): the spherical golden reproduced through ONE "
        "spark.sql text — st_point/st_geometryfromtext ingest, "
        "to_spherical_geography/to_geometry marker casts, and the "
        "dispatching st_distance/st_length/st_area/st_centroid SQL "
        "UDFs (functions/geo_sql_measures.py, bit-parity-pinned "
        "against the Column tier by tests/test_geo_sql_measures.py). "
        "DuckDB replays the same Vincenty/L'Huilier formulas "
        "(_SPHERICAL_ORACLE, unchanged). Same plan shape as "
        "geo_spherical_golden: pushed c_custkey filter, per-nation "
        "<=8-element folds, one small shuffle.",
    tags=("geo", "functions", "dialect"),
)
def geo_sql_measures_golden(spark, sf_dir):
    from presto_spark.functions.registry import register_geo_sql_functions

    prepare(spark, sf_dir)
    register_geo_sql_functions(spark)
    return spark.sql(_SQL_MEASURES_TEXT)


_RELATE_COLLECTIONS_ORACLE = """
SELECT * FROM (VALUES
  ('gc_eq_mp',        '2FFF1FFF2', true,  false, true,  true,  false,
   false, true),
  ('gc_lines_joint',  '0F1FF0FF2', true,  false, true,  false, false,
   false, false),
  ('gc_points_split', '0F0FFF212', true,  false, false, false, false,
   true,  false),
  ('gc_poly_overlap', '212111212', true,  false, false, false, true,
   false, false),
  ('mixed_null', CAST(NULL AS VARCHAR), CAST(NULL AS BOOLEAN),
   CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN),
   CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN))
) AS t(k, m, p_intersects, p_touches, p_contains, p_within, p_overlaps,
       p_crosses, eqpat)
ORDER BY k
"""


@register(
    "geo_relate_collections",
    oracle=_RELATE_COLLECTIONS_ORACLE,
    doc="GEOMETRYCOLLECTION in the DE-9IM tier (round 13, VERDICT r12 "
        "stretch #7): HOMOGENEOUS collections merge member-wise like "
        "the matching MULTI kind (geo_relate._norm_collection — point "
        "sets/segments/rings/reps concatenate; 1-dim union boundaries "
        "recompute mod-2 across members so a shared endpoint cancels), "
        "then the full event-point/midpoint/open-set-lift kernel runs "
        "unchanged.  Cases: GC-of-polygons overlap + point-set equality "
        "with the equivalent MULTIPOLYGON, GC-of-lines whose joint "
        "point is INTERIOR (contains fires), GC-of-points split "
        "in/out of a polygon (crosses fires), and the pinned "
        "mixed-dimension NULL.  Oracle is the literal expected table "
        "(matrices match the MULTI-kind rows of geo_predicates_golden "
        "by construction).  Scale: per-row work, zero shuffle.",
    tags=("geo", "functions"),
)
def geo_relate_collections(spark, sf_dir):
    prepare(spark, sf_dir)
    from presto_spark.functions import geo_relate as gr

    cases = [
        ("gc_poly_overlap",
         "GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)), "
         "POLYGON ((10 0, 14 0, 14 4, 10 4, 10 0)))",
         "POLYGON ((2 0, 6 0, 6 3, 2 3, 2 0))"),
        ("gc_lines_joint",
         "GEOMETRYCOLLECTION (LINESTRING (0 0, 1 0), "
         "LINESTRING (1 0, 2 0))",
         "POINT (1 0)"),
        ("gc_points_split",
         "GEOMETRYCOLLECTION (POINT (3 3), POINT (50 50))",
         "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
        ("gc_eq_mp",
         "GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)), "
         "POLYGON ((10 0, 14 0, 14 4, 10 4, 10 0)))",
         "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
         "((10 0, 14 0, 14 4, 10 4, 10 0)))"),
        ("mixed_null",
         "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 2 2))",
         "POINT (1 1)"),
    ]
    df = (
        spark.createDataFrame(cases, "k string, wa string, wb string")
        .select("k",
                geo.st_geometry_from_text_full(F.col("wa")).alias("a"),
                geo.st_geometry_from_text_full(F.col("wb")).alias("b"))
        .repartition(2)
    )
    a, b = F.col("a"), F.col("b")
    return df.withColumn("m", gr.geometry_relate_matrix(a, b)).select(
        "k", "m",
        gr.matrix_predicate("m", "intersects").alias("p_intersects"),
        gr.matrix_predicate("m", "touches").alias("p_touches"),
        gr.matrix_predicate("m", "contains").alias("p_contains"),
        gr.matrix_predicate("m", "within").alias("p_within"),
        gr.matrix_predicate("m", "overlaps", geo.st_dimension(a),
                            geo.st_dimension(b)).alias("p_overlaps"),
        gr.matrix_predicate("m", "crosses", geo.st_dimension(a),
                            geo.st_dimension(b)).alias("p_crosses"),
        gr.st_relate(a, b, "T*F**FFF*").alias("eqpat"),
    ).orderBy("k")
