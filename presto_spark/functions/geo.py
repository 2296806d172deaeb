"""Geospatial subset: planar ST_* functions + great_circle_distance.

Reference surface (presto-main-base/.../geospatial/GeoFunctions.java and
presto-geospatial-toolkit/.../SphericalGeographyUtils.java).  The
reference backs these with Esri geometry objects; the Spark-first
design is a plain STRUCT column so every function below is a JVM-side
Column expression over arrays (whole-stage codegen, no UDFs)::

    geometry := struct<kind:  string,   -- POINT|MULTIPOINT|LINESTRING|POLYGON
                       rings: array<array<struct<x:double, y:double>>>>

POINT has one ring of one vertex; LINESTRING one ring; POLYGON ring 0
is the shell and rings 1..n are holes (WKT rings repeat their first
vertex last, and the parser keeps that closure).

Implemented (the planar measurement/predicate core + the spherical
distance): ST_Point, ST_GeometryFromText, ST_AsText, ST_X, ST_Y,
ST_XMin/XMax/YMin/YMax, ST_NumPoints, ST_Area, ST_Length, ST_Centroid,
ST_Distance (point↔point, point↔linestring), ST_Contains/ST_Within
(polygon ∋ point, even-odd rule so holes are honored), ST_Envelope
(as xmin/ymin/xmax/ymax struct), great_circle_distance
(SphericalGeographyUtils.java:82-107, EARTH_RADIUS_KM = 6371.01).

Documented deviations: geometry is the struct above, not a serialized
Esri payload; ST_AsText prints coordinates with Spark's double
formatting; the full overlay algebra (ST_Union/Intersection/Buffer …)
and curve/multi-polygon types remain out of scope (COVERAGE.md §2.8).

Scale: everything here is per-row expression work — no shuffle, no
Python.  The companion grid-binned join lives in
operators/spatial_join.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.01  # SphericalGeographyUtils.java:36


# ---- constructors / accessors -------------------------------------------

def st_point(x: Column, y: Column) -> Column:
    """ST_Point(x, y) (GeoFunctions.java:167)."""
    pt = F.struct(x.cast("double").alias("x"), y.cast("double").alias("y"))
    return F.struct(
        F.lit("POINT").alias("kind"), F.array(F.array(pt)).alias("rings")
    )


def _parse_ring_txt(s: Column) -> Column:
    pts = F.split(F.trim(F.regexp_replace(s, r"[()]", "")), r"\s*,\s*")
    return F.transform(
        pts,
        lambda p: F.struct(
            F.split(F.trim(p), r"\s+")[0].cast("double").alias("x"),
            F.split(F.trim(p), r"\s+")[1].cast("double").alias("y"),
        ),
    )


def _rings_of(kind: Column, body: Column) -> Column:
    """WKT body text → the flat ring array for one (non-collection)
    geometry of ``kind`` — the shared core of st_geometry_from_text
    and the GEOMETRYCOLLECTION member parser (round 11)."""
    rings_raw = F.when(
        kind == "MULTIPOLYGON",
        F.split(body, r"\)\s*\)\s*,\s*\(\s*\("),
    ).otherwise(F.split(body, r"\)\s*,\s*\("))
    # MULTIPOINT accepts both "((1 2), (3 4))" and "(1 2, 3 4)" WKT —
    # normalize to one vertex per ring.
    multipoint = F.transform(
        F.flatten(F.transform(rings_raw, _parse_ring_txt)),
        lambda p: F.array(p),
    )
    # MULTIPOLYGON: re-split each piece into its rings, orient (shell
    # CCW, holes CW) and flatten — the orientation IS the shell/hole
    # marker in the flat model (round 10).
    mp_rings = F.flatten(F.transform(
        rings_raw,
        lambda piece: F.transform(
            F.split(piece, r"\)\s*,\s*\("),
            lambda ring, i: F.when(i == 0, _ccw_ring(_parse_ring_txt(ring)))
            .otherwise(_cw_ring(_parse_ring_txt(ring))),
        ),
    ))
    return (
        F.when(kind == "MULTIPOINT", multipoint)
        .when(kind == "MULTIPOLYGON", mp_rings)
        .otherwise(F.transform(rings_raw, _parse_ring_txt))
    )


# GEOMETRYCOLLECTION member encoding (round 11): kind
# "GEOMETRYCOLLECTION", rings = per member a HEADER ring followed by
# the member's own rings.  A header is TWO vertices
# (x = typecode 1..6, y = NULL), (x = member ring count, y = NULL) —
# a NULL y cannot arise from valid WKT (and NaN does not survive the
# Arrow crossing: pandas→Arrow nulls it), so headers are unambiguous, and
# carrying the ring count lets every accessor read member extents
# from headers alone (no next-header scan — the cheap-analysis form
# after the first cut cost seconds of Catalyst ANALYSIS per accessor,
# the round-7 deep-HOF hazard).  Nested collections stay out of scope
# (GeometryCollection members must be simple kinds; parse → NULL).
_GC_KINDS = ("POINT", "MULTIPOINT", "LINESTRING", "MULTILINESTRING",
             "POLYGON", "MULTIPOLYGON")


def _is_gc_header(ring: Column) -> Column:
    return (F.size(ring) == 2) & ring[0]["y"].isNull()


def _gc_headers(geom: Column) -> Column:
    return F.filter(geom["rings"], _is_gc_header)


def st_geometry_from_text(wkt: Column) -> Column:
    """ST_GeometryFromText (GeoFunctions.java:244) for
    POINT/MULTIPOINT/LINESTRING/POLYGON/MULTIPOLYGON WKT;
    GEOMETRYCOLLECTION parses through the Arrow tier instead
    (st_geometry_from_text_full, round 11).
    MULTIPOLYGON pieces may carry interior rings since round 10: the
    flat ring model distinguishes piece shells from holes by
    ORIENTATION (shell CCW, hole CW — normalized here at parse time;
    POLYGON rings stay positional: ring 0 shell, rest holes).  The
    round-9 holed-piece pin (VERDICT r9 what's-missing #1) is
    removed."""
    # NOTE: GEOMETRYCOLLECTION WKT parses to NULL HERE — collections
    # route through the Arrow parse tier (st_geometry_from_text_full
    # below; same tier split as simplify_geometry).  CALLER-FACING
    # CONSEQUENCE (ADVICE r11): a NULL from THIS parser can mean
    # either malformed WKT or a valid collection — any call site whose
    # input may contain collection WKT must use the _full variant or
    # it silently drops collection rows.  A Column-side GC
    # branch was tried first (round 11): its nested member parse made
    # THIS tree ~3x bigger and every un-materialized reference of a
    # parsed geometry re-resolves the whole tree — literal-WKT tests
    # went from seconds to minutes.  The parse stays lean so the hot
    # simple-kind path keeps constant-folding and cheap analysis.
    t = F.trim(wkt)
    kind = F.upper(F.regexp_extract(t, r"^\s*([A-Za-z]+)", 1))
    body = F.regexp_extract(t, r"^\s*[A-Za-z]+\s*\((.*)\)\s*$", 1)
    rings = _rings_of(kind, body)
    return F.when(
        (body != "") & (kind != "GEOMETRYCOLLECTION"),
        F.struct(kind.alias("kind"), rings.alias("rings")),
    )


def st_geometry_from_text_full(wkt: Column) -> Column:
    """ST_GeometryFromText including GEOMETRYCOLLECTION (round 11) —
    the Arrow-tier parser (functions/_geo_pandas_udfs.py).  Emits the
    identical struct as the Column parser for simple kinds and the
    header-ring member encoding for flat collections (nested
    collections → NULL, documented).  Use this when collection WKT
    can appear; the Column parser stays the hot scan path."""
    from presto_spark.functions import _geo_pandas_udfs as _gp

    return _gp.parse_wkt_full_udf(wkt)


def st_geometry_from_binary(wkb: Column) -> Column:
    """ST_GeomFromBinary (GeoFunctions.java:252) — OGC WKB ingest,
    both byte orders, all six simple kinds plus flat
    GEOMETRYCOLLECTION (header-ring encoding); malformed/unsupported
    payloads → NULL (expression-level spelling of the reference's
    parse exception).  Arrow tier: WKB is how geometry columns arrive
    in parquet at scale, and the batched parse is one crossing with
    zero shuffle."""
    from presto_spark.functions import _geo_pandas_udfs as _gp

    return _gp.parse_wkb_udf(wkb)


def _coord_arrays(geom: Column) -> tuple[Column, Column]:
    """Geometry struct → (xs, ys) array<array<double>> — the safe
    pandas-UDF input shape (a ragged array<array<struct>> input trips
    numpy's inhomogeneous-shape error inside PySpark's Arrow
    converter; plain double arrays pass through untouched)."""
    return (
        F.transform(geom["rings"],
                    lambda r: F.transform(r, lambda p: p["x"])),
        F.transform(geom["rings"],
                    lambda r: F.transform(r, lambda p: p["y"])),
    )


def st_as_binary(geom: Column) -> Column:
    """ST_AsBinary (GeoFunctions.java:268) — little-endian (NDR) OGC
    WKB; round-trips through st_geometry_from_binary."""
    from presto_spark.functions import _geo_pandas_udfs as _gp

    xs, ys = _coord_arrays(geom)
    return _gp.as_wkb_udf(geom["kind"], xs, ys)


def st_line_from_text(wkt: Column) -> Column:
    """ST_LineFromText (GeoFunctions.java:144): parse WKT and validate
    the kind is LINESTRING — any other kind raises
    (INVALID_FUNCTION_ARGUMENT spelling, validateType); NULL input and
    unparseable WKT propagate NULL like st_geometry_from_text."""
    g = st_geometry_from_text(wkt)
    checked_kind = F.when(g["kind"] == "LINESTRING", g["kind"]).otherwise(
        F.raise_error(F.concat(
            F.lit("ST_LineFromText: geometry is not a LINE_STRING: "),
            F.coalesce(g["kind"], F.lit("NULL")))))
    # NULL-parse passthrough first; the raising kind check sits in the
    # taken branch's VALUE so it fires only for parsed non-linestrings
    return F.when(
        g.isNotNull(),
        F.struct(checked_kind.alias("kind"), g["rings"].alias("rings")),
    )


def st_polygon(wkt: Column) -> Column:
    """ST_Polygon (GeoFunctions.java stPolygon; docs geospatial.rst):
    parse WKT and validate the kind is POLYGON — any other kind
    raises (validateType spelling); NULL/unparseable WKT propagates
    NULL like st_geometry_from_text."""
    g = st_geometry_from_text(wkt)
    checked_kind = F.when(g["kind"] == "POLYGON", g["kind"]).otherwise(
        F.raise_error(F.concat(
            F.lit("ST_Polygon: geometry is not a POLYGON: "),
            F.coalesce(g["kind"], F.lit("NULL")))))
    return F.when(
        g.isNotNull(),
        F.struct(checked_kind.alias("kind"), g["rings"].alias("rings")),
    )


def st_line_string(points: Column) -> Column:
    """ST_LineString(array<point>) (GeoFunctions.java stLineString):
    a LINESTRING through the points in order.  Arrays with fewer than
    2 points have no linestring value in the model (the reference
    returns an empty LineString) — NULL here, the standing
    no-empty-geometry pin; a non-POINT member raises
    (INVALID_FUNCTION_ARGUMENT spelling)."""
    vertices = F.transform(
        points,
        lambda p: F.struct(
            F.when(p["kind"] == "POINT", p["rings"][0][0]["x"])
            .otherwise(F.raise_error(F.lit(
                "ST_LineString: array element is not a POINT")))
            .alias("x"),
            p["rings"][0][0]["y"].alias("y"),
        ),
    )
    return F.when(
        points.isNotNull() & (F.size(points) >= 2),
        F.struct(F.lit("LINESTRING").alias("kind"),
                 F.array(vertices).alias("rings")),
    )


def st_multi_point(points: Column) -> Column:
    """ST_MultiPoint(array<point>) (GeoFunctions.java stMultiPoint):
    a MULTIPOINT of the points in order (duplicates kept, like the
    reference).  Empty array → NULL (no-empty-geometry pin);
    a non-POINT member raises."""
    rings = F.transform(
        points,
        lambda p: F.array(F.struct(
            F.when(p["kind"] == "POINT", p["rings"][0][0]["x"])
            .otherwise(F.raise_error(F.lit(
                "ST_MultiPoint: array element is not a POINT")))
            .alias("x"),
            p["rings"][0][0]["y"].alias("y"),
        )),
    )
    return F.when(
        points.isNotNull() & (F.size(points) >= 1),
        F.struct(F.lit("MULTIPOINT").alias("kind"), rings.alias("rings")),
    )


def st_points(geom: Column) -> Column:
    """ST_Points (GeoFunctions.java stPoints; docs:
    array of the points of a LINESTRING, in order, duplicates kept).
    Non-LINESTRING kinds raise (validateType spelling); NULL
    propagates."""
    checked = F.when(geom["kind"] == "LINESTRING", geom["rings"][0]) \
        .otherwise(F.raise_error(F.lit(
            "ST_Points only applies to LINE_STRING")).cast(
            "array<struct<x:double,y:double>>"))
    return F.when(
        geom.isNotNull(),
        F.transform(checked, lambda v: st_point(v["x"], v["y"])),
    )


def _gc_member_structs(geom: Column) -> Column:
    """GEOMETRYCOLLECTION → array of member geometry structs (decoded
    from the header-ring encoding, round 11).  Headers carry each
    member's ring count, so extraction is one position scan plus a
    direct slice.  The operand is let-bound so a Python-UDF-produced
    geometry lands in the HOF's INPUT, never inside a lambda body
    (LAMBDA_FUNCTION_WITH_PYTHON_UDF — the round-10 pin)."""
    return F.element_at(
        F.transform(F.array(geom), _gc_member_structs_raw), 1)


def _gc_member_structs_raw(geom: Column) -> Column:
    rings = geom["rings"]
    idx = F.sequence(F.lit(1), F.size(rings))
    starts = F.filter(
        idx, lambda i: _is_gc_header(F.element_at(rings, i)))

    def member(s: Column) -> Column:
        hdr = F.element_at(rings, s)
        kindstr = F.element_at(
            F.array(*[F.lit(g) for g in _GC_KINDS]),
            hdr[0]["x"].cast("int"))
        return F.struct(
            kindstr.alias("kind"),
            F.slice(rings, s + 1, hdr[1]["x"].cast("int")).alias("rings"),
        )

    return F.transform(starts, member)


def st_as_text(geom: Column) -> Column:
    """ST_AsText (GeoFunctions.java:260) — canonical WKT; coordinates
    use Spark's shortest-round-trip double formatting (deviation).
    GEOMETRYCOLLECTION prints its decoded members recursively
    (round 11).  The operand is let-bound once: the printer
    references it many times (and the GC branch embeds it in a HOF
    lambda), so an inlined complex argument — a parse tree or a
    Python-UDF call — would otherwise explode analysis or trip
    LAMBDA_FUNCTION_WITH_PYTHON_UDF."""
    return F.element_at(F.transform(F.array(geom), _as_text_bound), 1)


def _as_text_bound(geom: Column) -> Column:
    return F.when(
        geom["kind"] == "GEOMETRYCOLLECTION",
        F.concat(
            F.lit("GEOMETRYCOLLECTION ("),
            F.concat_ws(", ", F.transform(
                _gc_member_structs_raw(geom), _simple_as_text)),
            F.lit(")"),
        ),
    ).otherwise(_simple_as_text(geom))


def _simple_as_text(geom: Column) -> Column:
    fmt_pt = lambda p: F.concat_ws(" ", p["x"].cast("string"), p["y"].cast("string"))  # noqa: E731
    ring_txt = lambda r: F.concat(F.lit("("), F.concat_ws(", ", F.transform(r, fmt_pt)), F.lit(")"))  # noqa: E731
    rings = geom["rings"]
    return F.when(
        geom["kind"] == "POINT",
        F.concat(F.lit("POINT ("), fmt_pt(rings[0][0]), F.lit(")")),
    ).otherwise(
        F.concat(
            geom["kind"],
            F.lit(" ("),
            F.when(
                geom["kind"] == "MULTIPOINT",
                F.concat_ws(
                    ", ", F.transform(rings, lambda r: fmt_pt(r[0]))
                ),
            ).when(
                geom["kind"] == "LINESTRING",
                F.concat_ws(", ", F.transform(rings[0], fmt_pt)),
            ).when(
                geom["kind"] == "MULTIPOLYGON",
                _multipolygon_body_txt(rings, ring_txt),
            ).otherwise(
                F.concat_ws(", ", F.transform(rings, ring_txt))
            ),
            F.lit(")"),
        )
    )


def _piece_starts(rings: Column) -> Column:
    """1-based indices of the CCW (shell) rings — each starts a piece;
    the CW rings that follow are its holes (flat-model orientation
    convention, round 10).  The rings array is only ever a DIRECT
    higher-order-function argument here, never captured inside a
    lambda body — capturing it breaks when the array came from a
    Python UDF (simplify tier): Spark forbids Python UDFs inside
    lambda functions (UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_WITH_
    PYTHON_UDF)."""
    return F.filter(
        F.transform(
            rings,
            lambda r, i: F.when(_ring_signed_area2(r) >= 0, i + 1),
        ),
        lambda x: x.isNotNull(),
    )


def _multipolygon_body_txt(rings: Column, ring_txt) -> Column:
    """WKT body of a MULTIPOLYGON: rings grouped into pieces by
    orientation — '((shell), (hole), ...), ((shell2))'.  All-CCW
    (hole-free) geometries print one ring per piece, byte-identical
    to the round-8 output.  Built as one transform + one fold over
    the rings array so the array is never captured inside a lambda
    (see _piece_starts — Python-UDF-sourced arrays)."""
    items = F.transform(
        rings,
        lambda r: F.struct(
            (_ring_signed_area2(r) >= 0).alias("shell"),
            ring_txt(r).alias("txt"),
        ),
    )
    return F.aggregate(
        items,
        F.lit("").cast("string"),
        lambda acc, it: F.concat(
            acc,
            F.when(
                it["shell"],
                F.when(acc == "", F.lit("(")).otherwise(F.lit("), (")),
            ).otherwise(F.lit(", ")),
            it["txt"],
        ),
        lambda acc: F.concat(acc, F.lit(")")),
    )


def st_x(geom: Column) -> Column:
    """ST_X(point) (GeoFunctions.java:839)."""
    return F.when(geom["kind"] == "POINT", geom["rings"][0][0]["x"])


def st_y(geom: Column) -> Column:
    """ST_Y(point) (GeoFunctions.java:853)."""
    return F.when(geom["kind"] == "POINT", geom["rings"][0][0]["y"])


def _all_points(geom: Column) -> Column:
    return F.flatten(geom["rings"])


def st_num_points(geom: Column) -> Column:
    """ST_NumPoints (GeoFunctions.java:731): vertex count; polygons do
    not double-count the closing vertex of each ring.  A
    GEOMETRYCOLLECTION sums its members (header rings excluded)."""
    closing = F.when(
        geom["kind"].isin("POLYGON", "MULTIPOLYGON"), F.size(geom["rings"])
    ).otherwise(F.lit(0))
    # GC: vertices of non-header rings, minus one closing vertex per
    # ring of each polygonal member — both readable from headers alone
    gc = (
        F.size(F.flatten(F.filter(
            geom["rings"], lambda r: ~_is_gc_header(r))))
        - F.aggregate(
            _gc_headers(geom), F.lit(0),
            lambda acc, h: acc + F.when(
                h[0]["x"].cast("int").isin(5, 6),
                h[1]["x"].cast("int")).otherwise(F.lit(0)))
    )
    return F.when(geom["kind"] == "GEOMETRYCOLLECTION", gc).otherwise(
        F.size(_all_points(geom)) - closing).cast("long")


def st_xmin(geom: Column) -> Column:
    return F.array_min(F.transform(_all_points(geom), lambda p: p["x"]))


def st_xmax(geom: Column) -> Column:
    return F.array_max(F.transform(_all_points(geom), lambda p: p["x"]))


def st_ymin(geom: Column) -> Column:
    return F.array_min(F.transform(_all_points(geom), lambda p: p["y"]))


def st_ymax(geom: Column) -> Column:
    return F.array_max(F.transform(_all_points(geom), lambda p: p["y"]))


def st_envelope(geom: Column) -> Column:
    """Bounding box as struct<xmin,ymin,xmax,ymax> (ST_Envelope,
    GeoFunctions.java:874 — the reference returns a rectangle polygon;
    the struct form is the join-friendly spelling)."""
    return F.struct(
        st_xmin(geom).alias("xmin"),
        st_ymin(geom).alias("ymin"),
        st_xmax(geom).alias("xmax"),
        st_ymax(geom).alias("ymax"),
    )


# ---- measures ------------------------------------------------------------

def _edges(ring: Column):
    """(from, to) vertex arrays for a ring's consecutive edges."""
    n = F.size(ring)
    return F.slice(ring, 1, n - 1), F.slice(ring, 2, n - 1)


def _ring_signed_area2(ring: Column) -> Column:
    """Twice the shoelace signed area of one closed ring."""
    a, b = _edges(ring)
    cross = F.zip_with(
        a, b, lambda p, q: p["x"] * q["y"] - q["x"] * p["y"]
    )
    return F.aggregate(cross, F.lit(0.0), lambda acc, v: acc + v)


def _ccw_ring(ring: Column) -> Column:
    """Closed ring normalized to CCW winding (reverse preserves the
    first==last closure).  Orientation is the MULTIPOLYGON flat-ring
    model's shell marker (round 10)."""
    return F.when(_ring_signed_area2(ring) < 0, F.reverse(ring)).otherwise(ring)


def _cw_ring(ring: Column) -> Column:
    """Closed ring normalized to CW winding — the hole marker."""
    return F.when(_ring_signed_area2(ring) > 0, F.reverse(ring)).otherwise(ring)


def _open_area2(ring: Column) -> Column:
    """Twice the |shoelace area| of an OPEN in-order vertex list (the
    clip-lattice output shape).  Used by the overlay full-dimensional
    guards: 3+ DISTINCT clip vertices can still be collinear (zero
    area), and a stitch keyed on such a degenerate intersection puts
    the centroid ON the union boundary (ADVICE r8)."""
    closed = F.concat(ring, F.slice(ring, 1, 1))
    return F.abs(_ring_signed_area2(closed))


# Full-dimensional-intersection tolerance for the overlay guards: twice
# the area must exceed this.  Absolute, matching the module's absolute
# coordinate tolerances elsewhere (_strictly_inside eps).
_FULLDIM_EPS2 = 1e-12


def _fulldim(inter: Column) -> Column:
    """True iff an open distinct-vertex clip result is a genuinely 2-D
    region: 3+ vertices AND positive shoelace area."""
    return (F.size(inter) >= 3) & (_open_area2(inter) > F.lit(_FULLDIM_EPS2))


def st_area(geom: Column) -> Column:
    """ST_Area (GeoFunctions.java:236): POLYGON is |shell| − Σ|holes|
    by ring POSITION regardless of orientation; MULTIPOLYGON is the
    SIGNED ring sum — the flat model marks piece shells CCW (+) and
    holes CW (−), normalized by every constructor (parser, overlay
    tilings, convex-tier union/difference — round 10)."""
    areas = F.transform(geom["rings"], lambda r: F.abs(_ring_signed_area2(r)) / 2.0)
    shell = areas[0]
    holes = F.aggregate(
        F.slice(areas, 2, F.size(areas) - 1), F.lit(0.0), lambda acc, v: acc + v
    )
    signed_total = F.aggregate(
        F.transform(geom["rings"], lambda r: _ring_signed_area2(r) / 2.0),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        F.when(geom.isNull(), F.lit(None).cast("double"))
        .when(geom["kind"] == "POLYGON", shell - holes)
        .when(geom["kind"] == "MULTIPOLYGON", signed_total)
        .otherwise(F.lit(0.0))
    )


def _ring_length(ring: Column) -> Column:
    a, b = _edges(ring)
    seg = F.zip_with(
        a,
        b,
        lambda p, q: F.sqrt(
            (q["x"] - p["x"]) * (q["x"] - p["x"])
            + (q["y"] - p["y"]) * (q["y"] - p["y"])
        ),
    )
    return F.aggregate(seg, F.lit(0.0), lambda acc, v: acc + v)


def st_length(geom: Column) -> Column:
    """ST_Length (GeoFunctions.java:433): linestring length / polygon
    perimeter (all rings)."""
    total = F.aggregate(
        F.transform(geom["rings"], _ring_length),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        F.when(geom.isNull(), F.lit(None).cast("double"))
        .when(
            geom["kind"].isin(
                "LINESTRING", "MULTILINESTRING", "POLYGON",
                "MULTIPOLYGON"),
            total,
        )
        .otherwise(F.lit(0.0))
    )


def st_centroid(geom: Column) -> Column:
    """ST_Centroid (GeoFunctions.java:306) as a POINT geometry.

    POINT → itself; MULTIPOINT → vertex mean; LINESTRING →
    length-weighted segment-midpoint mean; POLYGON → shoelace centroid
    with holes subtracted (ring orientation normalized: shell positive,
    holes negative).
    """
    pts = _all_points(geom)
    n = F.size(pts)
    mean_x = F.aggregate(pts, F.lit(0.0), lambda a, p: a + p["x"]) / n
    mean_y = F.aggregate(pts, F.lit(0.0), lambda a, p: a + p["y"]) / n

    ring0 = geom["rings"][0]
    e_a, e_b = _edges(ring0)
    seg_len = F.zip_with(
        e_a,
        e_b,
        lambda p, q: F.sqrt(
            (q["x"] - p["x"]) * (q["x"] - p["x"])
            + (q["y"] - p["y"]) * (q["y"] - p["y"])
        ),
    )
    seg_mid_x = F.zip_with(e_a, e_b, lambda p, q: (p["x"] + q["x"]) / 2.0)
    seg_mid_y = F.zip_with(e_a, e_b, lambda p, q: (p["y"] + q["y"]) / 2.0)
    total_len = F.aggregate(seg_len, F.lit(0.0), lambda a, v: a + v)
    line_x = (
        F.aggregate(
            F.zip_with(seg_len, seg_mid_x, lambda w, m: w * m),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        / total_len
    )
    line_y = (
        F.aggregate(
            F.zip_with(seg_len, seg_mid_y, lambda w, m: w * m),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        / total_len
    )

    # Polygon: per-ring signed moments; normalize shell to +, holes to −.
    def ring_moment(ring: Column, which: str) -> Column:
        a, b = _edges(ring)
        cross = F.zip_with(
            a, b, lambda p, q: p["x"] * q["y"] - q["x"] * p["y"]
        )
        coord = F.zip_with(
            a,
            b,
            (lambda p, q: p["x"] + q["x"])
            if which == "x"
            else (lambda p, q: p["y"] + q["y"]),
        )
        return F.aggregate(
            F.zip_with(cross, coord, lambda c, s: c * s),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    # Per ring k: |A_k| (orientation-free area) and |A_k|·C_k
    # (moment/(3·A2) is the ring centroid, so signum(A2)·moment/6 is
    # the orientation-free area-weighted centroid).  POLYGON: shell
    # adds, holes subtract BY POSITION.  MULTIPOLYGON (round 10): the
    # sign IS the orientation — a2/2 and moment/6 are already signed
    # consistently (CCW shells +, CW holes −), so the terms pass
    # through raw.
    rings = geom["rings"]
    idx = F.sequence(F.lit(0), F.size(rings) - 1)
    is_mp = geom["kind"] == "MULTIPOLYGON"

    def ring_terms(which: str):
        def term(i: Column) -> Column:
            a2 = _ring_signed_area2(rings[i])
            s_k = F.when(i == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
            if which == "area":
                return F.when(is_mp, a2 / 2.0).otherwise(
                    s_k * F.abs(a2) / 2.0
                )
            m = ring_moment(rings[i], which)
            return F.when(is_mp, m / 6.0).otherwise(
                s_k * F.signum(a2) * m / 6.0
            )

        return F.transform(idx, term)

    s = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, v: a + v)  # noqa: E731
    poly_area = s(ring_terms("area"))
    poly_x = s(ring_terms("x")) / poly_area
    poly_y = s(ring_terms("y")) / poly_area

    cx = (
        F.when(geom["kind"] == "POINT", st_x(geom))
        .when(geom["kind"] == "MULTIPOINT", mean_x)
        .when(geom["kind"] == "LINESTRING", line_x)
        .otherwise(poly_x)
    )
    cy = (
        F.when(geom["kind"] == "POINT", st_y(geom))
        .when(geom["kind"] == "MULTIPOINT", mean_y)
        .when(geom["kind"] == "LINESTRING", line_y)
        .otherwise(poly_y)
    )
    return st_point(cx, cy)


# ---- predicates / distances ---------------------------------------------

def st_contains_point(poly: Column, x: Column, y: Column) -> Column:
    """ST_Contains(polygon, point) (GeoFunctions.java:1045) by the
    even-odd ray cast over every ring's edges — counting crossings
    across shell and holes at once gives hole-aware containment.
    Boundary behavior follows the half-open crossing rule (callers
    wanting reference-exact ON-boundary semantics should test
    ST_Distance == 0 as the reference's Esri backend does).

    MULTIPOLYGON (round 9): the same even-odd total over all rings is
    exactly any-piece containment — the pieces are disjoint hole-free
    shells, so a point interior to one piece crosses that ring an odd
    number of times and every other ring an even number."""

    def ring_crossings(ring: Column) -> Column:
        a, b = _edges(ring)
        hits = F.zip_with(
            a,
            b,
            lambda p, q: F.when(
                ((p["y"] > y) != (q["y"] > y))
                & (
                    x
                    < (q["x"] - p["x"]) * (y - p["y"]) / (q["y"] - p["y"])
                    + p["x"]
                ),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        return F.aggregate(hits, F.lit(0), lambda acc, v: acc + v)

    total = F.aggregate(
        F.transform(poly["rings"], ring_crossings),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return poly["kind"].isin("POLYGON", "MULTIPOLYGON") & (total % 2 == 1)


def st_contains(poly: Column, geom: Column) -> Column:
    """ST_Contains(polygon, point-geometry); ST_Within is the flipped
    spelling (GeoFunctions.java:1147)."""
    return st_contains_point(poly, st_x(geom), st_y(geom))


def _point_seg_dist(px: Column, py: Column, p: Column, q: Column) -> Column:
    """Distance from (px, py) to segment p→q (degenerate p==q ok)."""
    dx, dy = q["x"] - p["x"], q["y"] - p["y"]
    len2 = dx * dx + dy * dy
    t_raw = ((px - p["x"]) * dx + (py - p["y"]) * dy) / len2
    t = F.when(len2 == 0.0, F.lit(0.0)).otherwise(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), t_raw))
    )
    cx, cy = p["x"] + t * dx, p["y"] + t * dy
    return F.sqrt((px - cx) * (px - cx) + (py - cy) * (py - cy))


_SUPPORTED_KINDS = (
    "POINT", "MULTIPOINT", "LINESTRING", "POLYGON", "MULTIPOLYGON")


def st_distance(a: Column, b: Column) -> Column:
    """ST_Distance (GeoFunctions.java:940), general: minimum distance
    over all boundary segment pairs of any POINT/MULTIPOINT/LINESTRING/
    POLYGON combination, and 0 when the geometries intersect —
    including polygon containment, where the boundary-pair minimum
    alone would report the (wrong) positive distance to the shell
    (ADVICE r5: the old point-only fallback silently returned a
    first-vertex distance for unsupported pairs).  NULL for kinds
    outside the model.  Non-intersecting distance reduces to a
    vertex-to-segment minimum (the closest approach of two disjoint
    segment sets is always realized at a vertex), so no segment-segment
    special case is needed."""
    ea, eb = _all_edges(a), _all_edges(b)

    def seg_seg(s: Column, t: Column) -> Column:
        return F.least(
            _point_seg_dist(s["p"]["x"], s["p"]["y"], t["p"], t["q"]),
            _point_seg_dist(s["q"]["x"], s["q"]["y"], t["p"], t["q"]),
            _point_seg_dist(t["p"]["x"], t["p"]["y"], s["p"], s["q"]),
            _point_seg_dist(t["q"]["x"], t["q"]["y"], s["p"], s["q"]),
        )

    boundary = F.array_min(
        F.transform(
            ea,
            lambda s_edge: F.array_min(
                F.transform(eb, lambda t_edge: seg_seg(s_edge, t_edge))
            ),
        )
    )
    supported = a["kind"].isin(*_SUPPORTED_KINDS) & b["kind"].isin(
        *_SUPPORTED_KINDS
    )
    return F.when(
        supported,
        F.when(st_intersects(a, b), F.lit(0.0)).otherwise(boundary),
    )


def great_circle_distance(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """great_circle_distance(lat1, lon1, lat2, lon2) → km
    (SphericalGeographyUtils.java:82-107, Vincenty form on a sphere of
    radius 6371.01 km).  NULL outside [-90,90]/[-180,180] rather than
    the reference's exception (expression-level spelling of the same
    guard, checkLatitude/checkLongitude :47-59)."""
    valid = (
        (F.abs(lat1) <= 90)
        & (F.abs(lat2) <= 90)
        & (F.abs(lon1) <= 180)
        & (F.abs(lon2) <= 180)
    )
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    sin1, cos1 = F.sin(rlat1), F.cos(rlat1)
    sin2, cos2 = F.sin(rlat2), F.cos(rlat2)
    dlon = F.radians(lon1) - F.radians(lon2)
    cos_dlon = F.cos(dlon)
    t1 = cos2 * F.sin(dlon)
    t2 = cos1 * sin2 - sin1 * cos2 * cos_dlon
    t3 = sin1 * sin2 + cos1 * cos2 * cos_dlon
    return F.when(
        valid,
        F.atan2(F.sqrt(t1 * t1 + t2 * t2), t3) * F.lit(EARTH_RADIUS_KM),
    )


# ---- linear referencing (GeoFunctions.java:444-489) ----------------------

def _seg_lengths(ring: Column):
    a, b = _edges(ring)
    return F.zip_with(
        a,
        b,
        lambda p, q: F.sqrt(
            (q["x"] - p["x"]) * (q["x"] - p["x"])
            + (q["y"] - p["y"]) * (q["y"] - p["y"])
        ),
    )


_SEG_ENTRY_T = (
    "array<struct<p:struct<x:double,y:double>,"
    "q:struct<x:double,y:double>,len:double,before:double>>"
)


def _indexed_segments(ring: Column) -> Column:
    """struct<total, entries> where entries carry each segment's
    endpoints, length, and running start offset — ONE linear pass
    (struct-accumulator aggregate) instead of a per-segment prefix
    re-sum, so the expression tree stays O(1) per use."""
    a, b = _edges(ring)
    segs = F.zip_with(a, b, lambda p, q: F.struct(p.alias("p"), q.alias("q")))
    init = F.struct(
        F.lit(0.0).alias("total"),
        F.array().cast(_SEG_ENTRY_T).alias("entries"),
    )

    def step(acc: Column, s: Column) -> Column:
        dx = s["q"]["x"] - s["p"]["x"]
        dy = s["q"]["y"] - s["p"]["y"]
        ln = F.sqrt(dx * dx + dy * dy)
        entry = F.struct(
            s["p"].alias("p"),
            s["q"].alias("q"),
            ln.alias("len"),
            acc["total"].alias("before"),
        )
        return F.struct(
            (acc["total"] + ln).alias("total"),
            F.concat(acc["entries"], F.array(entry)).alias("entries"),
        )

    return F.aggregate(segs, init, step)


def line_locate_point(line: Column, point: Column) -> Column:
    """line_locate_point(linestring, point) (GeoFunctions.java:444-467):
    the fraction of the line's total length at the line's closest
    point to the argument (JTS LengthIndexedLine.indexOf / length).
    First minimal-distance segment wins on ties, as in JTS."""
    ix = _indexed_segments(line["rings"][0])
    px = point["rings"][0][0]["x"]
    py = point["rings"][0][0]["y"]

    def seg_entry(e: Column) -> Column:
        dx = e["q"]["x"] - e["p"]["x"]
        dy = e["q"]["y"] - e["p"]["y"]
        len2 = dx * dx + dy * dy
        t_raw = ((px - e["p"]["x"]) * dx + (py - e["p"]["y"]) * dy) / len2
        t = F.when(len2 == 0.0, F.lit(0.0)).otherwise(
            F.greatest(F.lit(0.0), F.least(F.lit(1.0), t_raw))
        )
        cx = e["p"]["x"] + t * dx
        cy = e["p"]["y"] + t * dy
        dist = F.sqrt((px - cx) * (px - cx) + (py - cy) * (py - cy))
        return F.struct(
            dist.alias("d"), (e["before"] + t * e["len"]).alias("pos")
        )

    best = F.array_min(F.transform(ix["entries"], seg_entry))
    return F.when(
        (line["kind"] == "LINESTRING")
        & (point["kind"] == "POINT")
        & (ix["total"] > 0),
        best["pos"] / ix["total"],
    )


def line_interpolate_point(line: Column, fraction: Column) -> Column:
    """line_interpolate_point(linestring, fraction)
    (GeoFunctions.java:469-489): the POINT at fraction·length along
    the line; NULL outside [0, 1] (expression-level spelling of the
    reference's INVALID_FUNCTION_ARGUMENT)."""
    ix = _indexed_segments(line["rings"][0])
    target = fraction * ix["total"]
    # last segment whose start offset is <= target (ties at vertex
    # boundaries resolve to the later segment's start point — same
    # coordinates either way)
    seg_i = F.greatest(
        F.size(F.filter(ix["entries"], lambda e: e["before"] <= target)),
        F.lit(1),
    )
    e = F.element_at(ix["entries"], seg_i)
    t_raw = (target - e["before"]) / e["len"]
    t = F.when(e["len"] == 0.0, F.lit(0.0)).otherwise(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), t_raw))
    )
    return F.when(
        (line["kind"] == "LINESTRING")
        & (fraction >= 0.0)
        & (fraction <= 1.0),
        st_point(
            e["p"]["x"] + t * (e["q"]["x"] - e["p"]["x"]),
            e["p"]["y"] + t * (e["q"]["y"] - e["p"]["y"]),
        ),
    )


# ---- ST_Intersects (GeoFunctions.java:1090) ------------------------------

def _all_edges(g: Column) -> Column:
    """Flat array of struct(p, q) boundary edges over ALL rings; a
    single-vertex ring (POINT/MULTIPOINT) contributes a degenerate
    p==q edge so point cases reduce to the segment tests."""
    return F.flatten(
        F.transform(
            g["rings"],
            lambda r: F.when(
                F.size(r) == 1,
                F.array(F.struct(r[0].alias("p"), r[0].alias("q"))),
            ).otherwise(
                F.zip_with(
                    F.slice(r, 1, F.size(r) - 1),
                    F.slice(r, 2, F.size(r) - 1),
                    lambda p, q: F.struct(p.alias("p"), q.alias("q")),
                )
            ),
        )
    )


def _cross(ox, oy, ax, ay, bx, by):
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _segments_intersect(p1: Column, p2: Column, q1: Column, q2: Column) -> Column:
    """Segment intersection incl. endpoints and collinear overlap."""
    d1 = _cross(q1["x"], q1["y"], q2["x"], q2["y"], p1["x"], p1["y"])
    d2 = _cross(q1["x"], q1["y"], q2["x"], q2["y"], p2["x"], p2["y"])
    d3 = _cross(p1["x"], p1["y"], p2["x"], p2["y"], q1["x"], q1["y"])
    d4 = _cross(p1["x"], p1["y"], p2["x"], p2["y"], q2["x"], q2["y"])
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & (
        ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
    )

    def on_seg(d, a, b, c):
        return (d == 0) & (
            F.least(a["x"], b["x"]) <= c["x"]
        ) & (c["x"] <= F.greatest(a["x"], b["x"])) & (
            F.least(a["y"], b["y"]) <= c["y"]
        ) & (c["y"] <= F.greatest(a["y"], b["y"]))

    return (
        proper
        | on_seg(d1, q1, q2, p1)
        | on_seg(d2, q1, q2, p2)
        | on_seg(d3, p1, p2, q1)
        | on_seg(d4, p1, p2, q2)
    )


def st_intersects(a: Column, b: Column) -> Column:
    """ST_Intersects (GeoFunctions.java:1090) for point/linestring/
    polygon pairs: any boundary-edge crossing, or one geometry's first
    vertex interior to the other polygon (covers full containment).
    Points use containment / exact vertex equality."""
    edges_of = _all_edges
    first_pt = lambda g: g["rings"][0][0]  # noqa: E731
    a_pt, b_pt = first_pt(a), first_pt(b)

    edge_hit = F.exists(
        edges_of(a),
        lambda ea: F.exists(
            edges_of(b),
            lambda eb: _segments_intersect(ea["p"], ea["q"], eb["p"], eb["q"]),
        ),
    )
    # ANY vertex inside, not just the first: for connected geometries
    # the two are equivalent when boundaries don't cross, but a
    # MULTIPOINT is disconnected — its first point can be outside while
    # another is inside (distance correctness depends on this since r6).
    a_in_b = b["kind"].isin("POLYGON", "MULTIPOLYGON") & F.exists(
        F.flatten(a["rings"]),
        lambda v: st_contains_point(b, v["x"], v["y"]),
    )
    b_in_a = a["kind"].isin("POLYGON", "MULTIPOLYGON") & F.exists(
        F.flatten(b["rings"]),
        lambda v: st_contains_point(a, v["x"], v["y"]),
    )
    pt_eq = (
        (a["kind"] == "POINT")
        & (b["kind"] == "POINT")
        & (a_pt["x"] == b_pt["x"])
        & (a_pt["y"] == b_pt["y"])
    )
    # a point has a degenerate self-edge (p == q), so edge_hit also
    # covers point-on-line and point-on-boundary cases
    return edge_hit | a_in_b | b_in_a | pt_eq


# ---- simple accessors (GeoFunctions.java:356-800) ------------------------

def st_geometry_type(geom: Column) -> Column:
    """ST_GeometryType (GeoFunctions.java:1161): Presto's standard
    names (GeometryType.java:23-29)."""
    return (
        F.when(geom["kind"] == "POINT", F.lit("ST_Point"))
        .when(geom["kind"] == "MULTIPOINT", F.lit("ST_MultiPoint"))
        .when(geom["kind"] == "LINESTRING", F.lit("ST_LineString"))
        .when(geom["kind"] == "POLYGON", F.lit("ST_Polygon"))
        .when(geom["kind"] == "MULTIPOLYGON", F.lit("ST_MultiPolygon"))
        .when(geom["kind"] == "MULTILINESTRING",
              F.lit("ST_MultiLineString"))
        .when(geom["kind"] == "GEOMETRYCOLLECTION",
              F.lit("ST_GeomCollection"))
    )


def st_is_closed(geom: Column) -> Column:
    """ST_IsClosed (GeoFunctions.java:356): first vertex == last
    vertex (linestrings; polygons are closed by construction)."""
    ring = geom["rings"][0]
    closed = (ring[0]["x"] == F.element_at(ring, -1)["x"]) & (
        ring[0]["y"] == F.element_at(ring, -1)["y"]
    )
    return F.when(
        geom["kind"].isin("LINESTRING", "POLYGON"), closed
    )


def st_is_ring(geom: Column) -> Column:
    """ST_IsRing (GeoFunctions.java:740): closed + simple linestring
    (simplicity here: no repeated interior vertices — the reference
    delegates full self-intersection testing to Esri; documented
    approximation)."""
    ring = geom["rings"][0]
    n = F.size(ring)
    interior = F.slice(ring, 1, n - 1)
    distinct_interior = F.size(F.array_distinct(
        F.transform(interior, lambda p: F.concat_ws(",", p["x"], p["y"]))
    )) == F.size(interior)
    return F.when(
        geom["kind"] == "LINESTRING", st_is_closed(geom) & distinct_interior
    )


def st_start_point(geom: Column) -> Column:
    """ST_StartPoint (GeoFunctions.java:752)."""
    ring = geom["rings"][0]
    return F.when(
        geom["kind"] == "LINESTRING", st_point(ring[0]["x"], ring[0]["y"])
    )


def st_end_point(geom: Column) -> Column:
    """ST_EndPoint (GeoFunctions.java:786)."""
    ring = geom["rings"][0]
    last = F.element_at(ring, -1)
    return F.when(
        geom["kind"] == "LINESTRING", st_point(last["x"], last["y"])
    )


def st_point_n(geom: Column, n: Column) -> Column:
    """ST_PointN (GeoFunctions.java:675): 1-based vertex of a
    linestring; NULL out of range."""
    ring = geom["rings"][0]
    ok = (geom["kind"] == "LINESTRING") & (n >= 1) & (n <= F.size(ring))
    p = F.element_at(ring, F.when(ok, n).otherwise(F.lit(1)))
    return F.when(ok, st_point(p["x"], p["y"]))


def st_num_interior_ring(geom: Column) -> Column:
    """ST_NumInteriorRing (GeoFunctions.java:543)."""
    return F.when(
        geom["kind"] == "POLYGON",
        (F.size(geom["rings"]) - 1).cast("long"),
    )


def st_exterior_ring(geom: Column) -> Column:
    """ST_ExteriorRing (GeoFunctions.java:975): the shell as a
    LINESTRING."""
    return F.when(
        geom["kind"] == "POLYGON",
        F.struct(
            F.lit("LINESTRING").alias("kind"),
            F.array(geom["rings"][0]).alias("rings"),
        ),
    )


_GEOM_DDL = ("struct<kind:string,"
             "rings:array<array<struct<x:double,y:double>>>>")


def st_interior_ring_n(geom: Column, n: Column | int) -> Column:
    """ST_InteriorRingN (GeoFunctions.java:717): the 1-based n-th
    interior ring of a POLYGON as a LINESTRING; NULL when the index is
    out of range; non-POLYGON kinds raise (validateType spelling,
    like the reference)."""
    n = n if isinstance(n, Column) else F.lit(n)
    rings = geom["rings"]
    ok_kind = F.when(geom["kind"] == "POLYGON", geom["kind"]).otherwise(
        F.raise_error(F.concat(
            F.lit("ST_InteriorRingN only applies to POLYGON: "),
            F.coalesce(geom["kind"], F.lit("NULL")))))
    in_range = (n >= 1) & (n <= F.size(rings) - 1)
    ring = F.element_at(rings, F.when(in_range, n + 1).otherwise(F.lit(1)))
    # NULL first: CaseWhen evaluates branches in order, so the raising
    # kind check never fires for NULL input (null-propagation contract)
    return (
        F.when(geom.isNull(), F.lit(None).cast(_GEOM_DDL))
        .when(
            (ok_kind == "POLYGON") & in_range,
            F.struct(F.lit("LINESTRING").alias("kind"),
                     F.array(ring).alias("rings")),
        )
    )


def st_interior_rings(geom: Column) -> Column:
    """ST_InteriorRings (GeoFunctions.java:557): array of a POLYGON's
    interior rings as LINESTRINGs (empty array when hole-free);
    non-POLYGON raises, NULL propagates."""
    rings = geom["rings"]
    ok_kind = F.when(geom["kind"] == "POLYGON", geom["kind"]).otherwise(
        F.raise_error(F.concat(
            F.lit("ST_InteriorRings only applies to POLYGON: "),
            F.coalesce(geom["kind"], F.lit("NULL")))))
    holes = F.slice(rings, 2, F.greatest(F.size(rings) - 1, F.lit(0)))
    return (
        F.when(geom.isNull(), F.lit(None).cast(f"array<{_GEOM_DDL}>"))
        .when(
            ok_kind == "POLYGON",
            F.transform(
                holes,
                lambda r: F.struct(
                    F.lit("LINESTRING").alias("kind"),
                    F.array(r).alias("rings"),
                ),
            ),
        )
    )


def st_envelope_as_pts(geom: Column) -> Column:
    """ST_EnvelopeAsPts (GeoFunctions.java:887): the bounding box as
    an array of two POINTs — lower-left then upper-right."""
    return F.when(
        geom.isNotNull() & (F.size(F.flatten(geom["rings"])) > 0),
        F.array(
            st_point(st_xmin(geom), st_ymin(geom)),
            st_point(st_xmax(geom), st_ymax(geom)),
        ),
    )


def st_boundary(geom: Column) -> Column:
    """ST_Boundary (GeoFunctions.java:866): the combinatorial boundary
    — POLYGON rings as a LINESTRING (single ring) / MULTILINESTRING,
    LINESTRING endpoints as MULTIPOINT, MULTILINESTRING mod-2
    endpoints (shared path ends cancel, OGC curve boundary rule).
    POINT/MULTIPOINT boundaries and closed-curve boundaries are empty
    — NULL here (the struct model has no empty-geometry value, same
    pin as _points_geometry)."""
    rings = geom["rings"]
    # every path's two endpoints, kept with odd multiplicity (mod-2)
    ends = F.flatten(F.transform(
        rings, lambda r: F.array(r[0], F.element_at(r, -1))))
    odd = F.filter(
        F.array_distinct(ends),
        lambda e: F.size(F.filter(
            ends, lambda x: (x["x"] == e["x"]) & (x["y"] == e["y"])
        )) % 2 == 1,
    )
    poly_b = F.when(
        F.size(rings) == 1,
        F.struct(F.lit("LINESTRING").alias("kind"), rings.alias("rings")),
    ).otherwise(
        F.struct(F.lit("MULTILINESTRING").alias("kind"),
                 rings.alias("rings"))
    )
    return (
        F.when(geom.isNull(), F.lit(None).cast(_GEOM_DDL))
        .when(geom["kind"].isin("POLYGON", "MULTIPOLYGON"), poly_b)
        .when(
            geom["kind"].isin("LINESTRING", "MULTILINESTRING"),
            F.when(F.size(odd) > 0, _points_geometry(odd)),
        )
    )


def st_is_valid(geom: Column) -> Column:
    """ST_IsValid (GeoFunctions.java:399): thin wrapper over
    geometry_invalid_reason — valid iff no reason."""
    return F.when(
        geom.isNotNull(), geometry_invalid_reason(geom).isNull())


def _path_self_intersects(ring: Column, closed: Column) -> Column:
    """Non-adjacent edge pairs of one open-or-closed path intersect —
    the simplicity core; the (first, last) pair is wrap-adjacent only
    when the path is closed."""
    edges = F.zip_with(
        F.slice(ring, 1, F.size(ring) - 1),
        F.slice(ring, 2, F.size(ring) - 1),
        lambda p, q: F.struct(p.alias("p"), q.alias("q")),
    )
    n = F.size(edges)
    return F.exists(
        F.sequence(F.lit(1), n),
        lambda i: F.when(i + 2 > n, F.lit(False)).otherwise(F.exists(
            F.sequence(i + 2, n),
            lambda j: F.when(
                (i == 1) & (j == n) & closed, F.lit(False)
            ).otherwise(_segments_intersect(
                F.try_element_at(edges, i)["p"],
                F.try_element_at(edges, i)["q"],
                F.try_element_at(edges, j)["p"],
                F.try_element_at(edges, j)["q"],
            )),
        )),
    )


def st_is_simple(geom: Column) -> Column:
    """ST_IsSimple (GeoFunctions.java:383): no anomalous geometric
    points — POINT always, MULTIPOINT iff no repeated point,
    LINESTRING/MULTILINESTRING iff no path self-intersects away from
    its endpoints (per-path; cross-path anomalies of a
    MULTILINESTRING are not checked — documented approximation, same
    class as ST_IsRing's), polygonal kinds iff valid."""
    pts = F.flatten(geom["rings"])
    no_dup = F.size(F.array_distinct(
        F.transform(pts, lambda p: F.concat_ws(",", p["x"], p["y"]))
    )) == F.size(pts)
    path_ok = ~F.exists(
        geom["rings"],
        lambda r: F.when(F.size(r) < 3, F.lit(False)).otherwise(
            _path_self_intersects(
                r,
                (r[0]["x"] == F.element_at(r, -1)["x"])
                & (r[0]["y"] == F.element_at(r, -1)["y"]),
            )),
    )
    return (
        F.when(geom.isNull(), F.lit(None).cast("boolean"))
        .when(geom["kind"] == "POINT", F.lit(True))
        .when(geom["kind"] == "MULTIPOINT", no_dup)
        .when(geom["kind"].isin("LINESTRING", "MULTILINESTRING"), path_ok)
        .when(geom["kind"].isin("POLYGON", "MULTIPOLYGON"),
              geometry_invalid_reason(geom).isNull())
    )


def st_geometries(geom: Column) -> Column:
    """ST_Geometries (GeoFunctions.java:691): the member geometries of
    a multi-geometry / collection as an array (a simple kind comes
    back as a 1-element array; NULL for empty input) — the array twin
    of st_geometry_n.  The operand is let-bound so Python-UDF-produced
    geometries (collection parse) stay out of lambda bodies."""
    def bound(g: Column) -> Column:
        count = st_num_geometries(g)
        return F.when(
            count > 0,
            F.transform(
                F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
                lambda n: st_geometry_n(g, n),
            ),
        )

    return F.element_at(F.transform(F.array(geom), bound), 1)


def st_num_geometries(geom: Column) -> Column:
    """ST_NumGeometries (GeoFunctions.java stNumGeometries): element
    count of a multi-geometry; 1 for simple kinds; 0 for empty.
    MULTIPOLYGON counts piece SHELLS (CCW rings) — interior rings
    belong to their piece (round 10; hole-free geometries count every
    ring, as before)."""
    return (
        F.when(geom.isNull(), F.lit(None).cast("int"))
        .when(F.size(F.flatten(geom["rings"])) == 0, F.lit(0))
        .when(geom["kind"] == "GEOMETRYCOLLECTION",
              F.size(_gc_headers(geom)))
        .when(geom["kind"] == "MULTIPOLYGON",
              F.size(_piece_starts(geom["rings"])))
        .when(geom["kind"] == "MULTIPOINT", F.size(geom["rings"]))
        .otherwise(F.lit(1))
        .cast("int")
    )


def st_geometry_n(geom: Column, n: Column) -> Column:
    """ST_GeometryN (GeoFunctions.java stGeometryN): 1-based element
    of a multi-geometry; the geometry itself at n=1 for simple kinds;
    NULL out of range.  A MULTIPOLYGON piece comes back as a POLYGON
    with its shell AND its interior rings (the CW rings following the
    n-th CCW ring — round 10)."""
    n = n if isinstance(n, Column) else F.lit(n)
    count = st_num_geometries(geom)
    ok = (n >= 1) & (n <= count)
    safe_n = F.when(ok, n).otherwise(F.lit(1))
    ring = F.element_at(geom["rings"], safe_n)
    starts = _piece_starts(geom["rings"])
    p_start = F.element_at(starts, safe_n)
    p_next = F.when(
        safe_n < F.size(starts), F.element_at(starts, safe_n + 1)
    ).otherwise(F.size(geom["rings"]) + 1)
    piece_rings = F.slice(geom["rings"], p_start, p_next - p_start)
    return (
        F.when(~ok, F.lit(None).cast(
            "struct<kind:string,"
            "rings:array<array<struct<x:double,y:double>>>>"))
        .when(geom["kind"] == "GEOMETRYCOLLECTION",
              F.element_at(_gc_member_structs(geom), safe_n))
        .when(geom["kind"] == "MULTIPOINT",
              st_point(ring[0]["x"], ring[0]["y"]))
        .when(geom["kind"] == "MULTIPOLYGON",
              F.struct(F.lit("POLYGON").alias("kind"),
                       piece_rings.alias("rings")))
        .otherwise(geom)
    )


def st_is_empty(geom: Column) -> Column:
    """ST_IsEmpty (GeoFunctions.java:375)."""
    return F.size(F.flatten(geom["rings"])) == 0


def st_coord_dim(geom: Column) -> Column:
    """ST_CoordDim (GeoFunctions.java:339): always 2 here (no Z/M)."""
    return F.when(geom["kind"].isNotNull(), F.lit(2).cast("int"))


def st_dimension(geom: Column) -> Column:
    """ST_Dimension (GeoFunctions.java:347): 0 points, 1 lines,
    2 polygons; a GEOMETRYCOLLECTION reports its members' maximum
    (OGCConcreteGeometryCollection.dimension)."""
    return (
        F.when(geom["kind"].isin("POINT", "MULTIPOINT"), F.lit(0))
        .when(geom["kind"].isin("LINESTRING", "MULTILINESTRING"),
              F.lit(1))
        .when(geom["kind"].isin("POLYGON", "MULTIPOLYGON"), F.lit(2))
        .when(
            geom["kind"] == "GEOMETRYCOLLECTION",
            # header typecodes 1,2 → 0; 3,4 → 1; 5,6 → 2
            F.array_max(F.transform(
                _gc_headers(geom),
                lambda h: (h[0]["x"].cast("int") - 1) / 2,
            )).cast("int"),
        )
        .cast("int")
    )


# ---- GeoJSON (GeoFunctions.java:1225-1241) -------------------------------

_GEOJSON_TYPES = {
    "POINT": "Point",
    "MULTIPOINT": "MultiPoint",
    "LINESTRING": "LineString",
    "POLYGON": "Polygon",
    "MULTILINESTRING": "MultiLineString",
    "MULTIPOLYGON": "MultiPolygon",
}


def geometry_as_geojson(geom: Column) -> Column:
    """geometry_as_geojson (GeoFunctions.java:1234): RFC 7946 Geometry
    object.  Numbers use Spark's double formatting (deviation from the
    Esri writer's integer shortening).  Round 12 adds the
    MultiLineString / MultiPolygon shapes (MULTIPOLYGON pieces are
    recovered from the flat-ring model's CCW-shell orientation
    grouping) and GeometryCollection (members printed recursively from
    the header-ring encoding).  The operand is let-bound once, same
    hygiene as st_as_text (the GC branch embeds it in a HOF lambda)."""
    return F.element_at(F.transform(F.array(geom), _geojson_bound), 1)


def _geojson_bound(geom: Column) -> Column:
    return F.when(
        geom["kind"] == "GEOMETRYCOLLECTION",
        F.concat(
            F.lit('{"type":"GeometryCollection","geometries":['),
            F.concat_ws(",", F.transform(
                _gc_member_structs_raw(geom), _simple_geojson)),
            F.lit("]}"),
        ),
    ).otherwise(_simple_geojson(geom))


def _simple_geojson(geom: Column) -> Column:
    coord = lambda p: F.concat(  # noqa: E731
        F.lit("["), p["x"].cast("string"), F.lit(","),
        p["y"].cast("string"), F.lit("]"),
    )
    ring_arr = lambda r: F.concat(  # noqa: E731
        F.lit("["), F.concat_ws(",", F.transform(r, coord)), F.lit("]")
    )
    rings = geom["rings"]
    starts = _piece_starts(rings)

    def mp_piece(s: Column, i: Column) -> Column:
        nxt = F.when(
            i + 2 <= F.size(starts), F.element_at(starts, i + 2)
        ).otherwise(F.size(rings) + 1)
        return F.concat(
            F.lit("["),
            F.concat_ws(",", F.transform(
                F.slice(rings, s, nxt - s), ring_arr)),
            F.lit("]"),
        )

    coords = (
        F.when(geom["kind"] == "POINT", coord(rings[0][0]))
        .when(
            geom["kind"] == "MULTIPOINT",
            F.concat(
                F.lit("["),
                F.concat_ws(",", F.transform(rings, lambda r: coord(r[0]))),
                F.lit("]"),
            ),
        )
        .when(geom["kind"] == "LINESTRING", ring_arr(rings[0]))
        .when(
            geom["kind"].isin("POLYGON", "MULTILINESTRING"),
            F.concat(
                F.lit("["),
                F.concat_ws(",", F.transform(rings, ring_arr)),
                F.lit("]"),
            ),
        )
        .when(
            geom["kind"] == "MULTIPOLYGON",
            F.concat(
                F.lit("["),
                F.concat_ws(",", F.transform(starts, mp_piece)),
                F.lit("]"),
            ),
        )
    )
    gtype = geom["kind"]
    for k, v in _GEOJSON_TYPES.items():
        gtype = F.when(geom["kind"] == k, F.lit(v)).otherwise(gtype)
    return F.when(
        coords.isNotNull(),
        F.concat(
            F.lit('{"type":"'), gtype, F.lit('","coordinates":'),
            coords, F.lit("}"),
        ),
    )


def geometry_from_geojson_full(json: Column) -> Column:
    """geometry_from_geojson including GeometryCollection (round 12) —
    the Arrow-tier parser (functions/_geo_pandas_udfs.py
    parse_geojson_full_udf), emitting the identical struct as the
    Column parser for simple shapes and the header-ring member
    encoding for flat collections (nested collections → NULL) — the
    same tier split as st_geometry_from_text_full.  CALLER RULE: the
    json operand must be a materialized column, not an inline HOF
    expression (e.g. geometry_as_geojson's let-binding) — Catalyst
    cannot extract a Python UDF whose input embeds a lambda
    (withColumn + repartition barrier, the overlay-tier rule)."""
    from presto_spark.functions import _geo_pandas_udfs as _gp

    return _gp.parse_geojson_full_udf(json)


def geometry_from_geojson(json: Column) -> Column:
    """geometry_from_geojson (GeoFunctions.java:1225) for
    Point/MultiPoint/LineString/Polygon Geometry objects — round 12
    adds MultiLineString and MultiPolygon (piece rings orientation-
    normalized into the flat model: shell CCW, holes CW, exactly like
    the WKT parser)."""
    gtype = F.upper(F.get_json_object(json, "$.type"))
    raw = F.get_json_object(json, "$.coordinates")
    pt = F.from_json(raw, "array<double>")
    arr2 = F.from_json(raw, "array<array<double>>")
    arr3 = F.from_json(raw, "array<array<array<double>>>")
    arr4 = F.from_json(raw, "array<array<array<array<double>>>>")
    mk_pt = lambda a: F.struct(  # noqa: E731
        a[0].alias("x"), a[1].alias("y")
    )
    point_rings = F.array(F.array(mk_pt(pt)))
    multi_rings = F.transform(arr2, lambda a: F.array(mk_pt(a)))
    line_rings = F.array(F.transform(arr2, mk_pt))
    poly_rings = F.transform(arr3, lambda r: F.transform(r, mk_pt))
    mpoly_rings = F.flatten(F.transform(
        arr4,
        lambda piece: F.transform(
            piece,
            lambda ring, j: F.when(
                j == 0, _ccw_ring(F.transform(ring, mk_pt))
            ).otherwise(_cw_ring(F.transform(ring, mk_pt))),
        ),
    ))
    return (
        F.when(
            gtype == "POINT",
            F.struct(F.lit("POINT").alias("kind"), point_rings.alias("rings")),
        )
        .when(
            gtype == "MULTIPOINT",
            F.struct(
                F.lit("MULTIPOINT").alias("kind"), multi_rings.alias("rings")
            ),
        )
        .when(
            gtype == "LINESTRING",
            F.struct(
                F.lit("LINESTRING").alias("kind"), line_rings.alias("rings")
            ),
        )
        .when(
            gtype == "MULTILINESTRING",
            F.struct(
                F.lit("MULTILINESTRING").alias("kind"),
                poly_rings.alias("rings"),
            ),
        )
        .when(
            gtype == "POLYGON",
            F.struct(
                F.lit("POLYGON").alias("kind"), poly_rings.alias("rings")
            ),
        )
        .when(
            gtype == "MULTIPOLYGON",
            F.struct(
                F.lit("MULTIPOLYGON").alias("kind"),
                mpoly_rings.alias("rings"),
            ),
        )
    )


# ---- envelope expansion / nearest points (GeoFunctions.java:906,954) -----

def expand_envelope(geom: Column, distance: Column | float) -> Column:
    """expand_envelope(geometry, d) (GeoFunctions.java:906): the
    bounding box grown by ``d`` on every side, as a POLYGON.  Negative
    distances yield NULL (expression-level spelling of the reference's
    checkCondition)."""
    d = distance if isinstance(distance, Column) else F.lit(float(distance))
    x0, x1 = st_xmin(geom) - d, st_xmax(geom) + d
    y0, y1 = st_ymin(geom) - d, st_ymax(geom) + d

    def pt(x, y):
        return F.struct(x.alias("x"), y.alias("y"))

    ring = F.array(pt(x0, y0), pt(x1, y0), pt(x1, y1), pt(x0, y1),
                   pt(x0, y0))
    return F.when(
        d >= 0,
        F.struct(F.lit("POLYGON").alias("kind"),
                 F.array(ring).alias("rings")),
    )


def _point_seg_nearest(px: Column, py: Column, p: Column, q: Column) -> Column:
    """struct(d, x, y): the closest point on segment p→q to (px, py)
    and its distance (degenerate p==q ok) — the projection-clamp core
    of _point_seg_dist, keeping the foot point."""
    dx, dy = q["x"] - p["x"], q["y"] - p["y"]
    len2 = dx * dx + dy * dy
    t_raw = ((px - p["x"]) * dx + (py - p["y"]) * dy) / len2
    t = F.when(len2 == 0.0, F.lit(0.0)).otherwise(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), t_raw))
    )
    cx, cy = p["x"] + t * dx, p["y"] + t * dy
    return F.struct(
        F.sqrt((px - cx) * (px - cx) + (py - cy) * (py - cy)).alias("d"),
        cx.alias("x"), cy.alias("y"),
    )


def geometry_nearest_points(a: Column, b: Column) -> Column:
    """geometry_nearest_points(a, b) (GeoFunctions.java:954) →
    struct<a: geometry, b: geometry> of POINTs realizing ST_Distance.

    The closest approach of two disjoint segment sets is always at a
    vertex of one set (same property st_distance relies on), so the
    candidates are every vertex of A projected onto every segment of B
    and vice versa; array_min over (d, ax, ay, bx, by) structs picks
    the minimum with a deterministic coordinate tie-break.  Pinned
    deviation: NULL for intersecting inputs (the reference returns a
    coincident interior pair; without the overlay algebra the engine
    cannot construct interior intersection points) and for kinds
    outside the model — callers keep the invariant that the returned
    pair's distance equals ST_Distance."""
    ea, eb = _all_edges(a), _all_edges(b)
    va = F.flatten(a["rings"])
    vb = F.flatten(b["rings"])

    def cand_a_to_b(p):
        # a-side point fixed at vertex p; b-side is the foot on each edge
        return F.transform(eb, lambda e: _near_pair(
            p["x"], p["y"],
            _point_seg_nearest(p["x"], p["y"], e["p"], e["q"])))

    def cand_b_to_a(p):
        return F.transform(ea, lambda e: _swap_pair(_near_pair(
            p["x"], p["y"],
            _point_seg_nearest(p["x"], p["y"], e["p"], e["q"]))))

    cands = F.concat(
        F.flatten(F.transform(va, cand_a_to_b)),
        F.flatten(F.transform(vb, cand_b_to_a)),
    )
    best = F.array_min(cands)
    supported = a["kind"].isin(*_SUPPORTED_KINDS) & b["kind"].isin(
        *_SUPPORTED_KINDS)
    mk = lambda x, y: F.struct(  # noqa: E731
        F.lit("POINT").alias("kind"),
        F.array(F.array(F.struct(x.alias("x"), y.alias("y")))).alias("rings"),
    )
    return F.when(
        supported & ~st_intersects(a, b),
        F.struct(
            mk(best["ax"], best["ay"]).alias("a"),
            mk(best["bx"], best["by"]).alias("b"),
        ),
    )


def _near_pair(px: Column, py: Column, foot: Column) -> Column:
    """(d, ax, ay, bx, by) candidate: a-side = the fixed vertex,
    b-side = the projected foot point."""
    return F.struct(
        foot["d"].alias("d"),
        px.alias("ax"), py.alias("ay"),
        foot["x"].alias("bx"), foot["y"].alias("by"),
    )


def _swap_pair(c: Column) -> Column:
    """Swap candidate sides (for B-vertex-onto-A-segment candidates)."""
    return F.struct(
        c["d"].alias("d"),
        c["bx"].alias("ax"), c["by"].alias("ay"),
        c["ax"].alias("bx"), c["ay"].alias("by"),
    )


# ---- point-tier overlay algebra (GeoFunctions.java stBuffer/stUnion/
# stIntersection/stDifference) --------------------------------------------

_BUFFER_SEGS = 32


def _covers_point(g: Column, x: Column, y: Column) -> Column:
    """Does geometry ``g`` cover the point (x, y)?  POLYGON via the
    even-odd rule; POINT/MULTIPOINT via vertex equality; LINESTRING via
    zero distance to any segment."""
    on_vertex = F.exists(
        F.flatten(g["rings"]), lambda p: (p["x"] == x) & (p["y"] == y))
    on_edge = F.exists(
        _all_edges(g), lambda e: _point_seg_dist(x, y, e["p"], e["q"]) == 0.0)
    return F.when(g["kind"] == "POLYGON", st_contains_point(g, x, y)) \
        .when(g["kind"] == "LINESTRING", on_edge) \
        .otherwise(on_vertex)


def st_buffer(geom: Column, distance: Column | float) -> Column:
    """ST_Buffer (GeoFunctions.java stBuffer) — POINT tier: a regular
    32-gon disc of radius d (the polygonal circle approximation every
    planar engine uses, vertex count pinned at 32).  d = 0 returns the
    input; d < 0 or non-POINT kinds return NULL (general offsetting
    needs the overlay algebra — pinned out of scope with it)."""
    d = distance if isinstance(distance, Column) else F.lit(float(distance))
    cx, cy = st_x(geom), st_y(geom)
    import math as _m
    ring = F.transform(
        F.sequence(F.lit(0), F.lit(_BUFFER_SEGS)),
        lambda i: F.struct(
            (cx + d * F.cos(i.cast("double")
                            * (2.0 * _m.pi / _BUFFER_SEGS))).alias("x"),
            (cy + d * F.sin(i.cast("double")
                            * (2.0 * _m.pi / _BUFFER_SEGS))).alias("y"),
        ),
    )
    return F.when(d == 0, geom).when(
        (geom["kind"] == "POINT") & (d > 0),
        F.struct(F.lit("POLYGON").alias("kind"),
                 F.array(ring).alias("rings")),
    )


def _points_geometry(pts: Column) -> Column:
    """Distinct vertex array → POINT / MULTIPOINT geometry (NULL when
    empty — the struct model has no empty-geometry value, pinned)."""
    dedup = F.array_distinct(pts)
    return F.when(
        F.size(dedup) == 1,
        F.struct(F.lit("POINT").alias("kind"),
                 F.array(dedup).alias("rings")),
    ).when(
        F.size(dedup) > 1,
        F.struct(
            F.lit("MULTIPOINT").alias("kind"),
            F.transform(dedup, lambda p: F.array(p)).alias("rings"),
        ),
    )


def _polyish(g: Column) -> Column:
    return g["kind"].isin("POLYGON", "MULTIPOLYGON")


def st_union(a: Column, b: Column) -> Column:
    """ST_Union (GeoFunctions.java stUnion) — point tier: the distinct
    vertex union of two POINT/MULTIPOINT inputs.  Polygon pairs route
    through the general overlay automatically since round 12
    (geo_decompose.geometry_union_general over array(a, b) — the
    explicit st_union_polygons/st_union_general spellings remain the
    materialized-operand fast path for overlay-heavy plans).  Mixed
    kind combinations return NULL (pinned — the reference's mixed
    union yields a collection, outside the overlay model).  NOTE:
    Catalyst extracts Python UDFs out of CaseWhen branches, so the
    polygonal branch's Arrow crossing runs for point rows too — cheap
    (NULL-gated inputs), but overlay-free hot paths should call the
    point tier's result columns directly."""
    from presto_spark.functions import geo_decompose as gd

    pointish = a["kind"].isin("POINT", "MULTIPOINT") & b["kind"].isin(
        "POINT", "MULTIPOINT")
    both_poly = _polyish(a) & _polyish(b)
    return F.when(
        pointish,
        _points_geometry(
            F.concat(F.flatten(a["rings"]), F.flatten(b["rings"]))),
    ).when(both_poly, gd.geometry_union_general(F.array(a, b)))


def st_intersection(a: Column, b: Column) -> Column:
    """ST_Intersection (GeoFunctions.java stIntersection) — point
    tier: the vertices of a POINT/MULTIPOINT operand covered by the
    other (any supported kind; intersection is symmetric, so the
    pointish operand may be on either side — round 12).  Polygon
    pairs route through the general overlay automatically (round 12);
    NULL for an empty result or the remaining kind combinations
    (line×line overlap stays pinned with the 1-D overlay)."""
    from presto_spark.functions import geo_decompose as gd

    def point_side(p: Column, q: Column) -> Column:
        kept = F.filter(
            F.flatten(p["rings"]),
            lambda v: _covers_point(q, v["x"], v["y"]))
        return _points_geometry(kept)

    a_pointish = a["kind"].isin("POINT", "MULTIPOINT") & b["kind"].isin(
        *_SUPPORTED_KINDS)
    b_pointish = b["kind"].isin("POINT", "MULTIPOINT") & a["kind"].isin(
        *_SUPPORTED_KINDS)
    both_poly = _polyish(a) & _polyish(b)
    return (
        F.when(a_pointish, point_side(a, b))
        .when(b_pointish, point_side(b, a))
        .when(both_poly, gd.st_intersection_general(
            gd.triangulate_raw(a), gd.triangulate_raw(b)))
    )


def st_difference(a: Column, b: Column) -> Column:
    """ST_Difference (GeoFunctions.java stDifference) — point tier:
    the vertices of a POINT/MULTIPOINT ``a`` NOT covered by ``b``;
    polygon pairs route through the general overlay automatically
    (round 12)."""
    from presto_spark.functions import geo_decompose as gd

    pointish = a["kind"].isin("POINT", "MULTIPOINT") & b["kind"].isin(
        *_SUPPORTED_KINDS)
    both_poly = _polyish(a) & _polyish(b)
    kept = F.filter(
        F.flatten(a["rings"]),
        lambda p: ~_covers_point(b, p["x"], p["y"]))
    return F.when(pointish, _points_geometry(kept)).when(
        both_poly, gd.st_difference_general(
            gd.triangulate_raw(a), gd.triangulate_raw(b)))


def geometry_union(geoms: Column) -> Column:
    """geometry_union(array<geometry>) (GeoFunctions.java stUnion
    array overload) — point tier: distinct vertex union when every
    element is POINT/MULTIPOINT; polygon arrays have the general tier
    (geo_decompose.geometry_union_general, round 12); mixed arrays
    stay NULL (pinned — the reference's mixed union yields a
    collection, outside the overlay model)."""
    all_pointish = F.forall(
        geoms, lambda g: g["kind"].isin("POINT", "MULTIPOINT"))
    verts = F.flatten(F.transform(geoms, lambda g: F.flatten(g["rings"])))
    return F.when((F.size(geoms) > 0) & all_pointish,
                  _points_geometry(verts))


# ---- validity (GeoFunctions.java:415-430 geometry_invalid_reason) --------

def geometry_invalid_reason(geom: Column) -> Column:
    """geometry_invalid_reason(geometry): NULL when valid, else the
    first failing check's reason.  The reference surfaces JTS/Esri
    validator messages; the struct model runs the checks it can
    express — coordinate validity, ring closure, minimum vertex
    counts, and shell self-intersection (non-adjacent edge pairs of
    each ring, O(E²) expression work per row) — with engine-specific
    message text (pinned, same class of deviation as ST_AsText
    formatting)."""
    pts = _all_points(geom)
    bad_coord = F.exists(
        pts,
        lambda p: p["x"].isNull() | p["y"].isNull()
        | F.isnan(p["x"]) | F.isnan(p["y"]),
    )
    rings = geom["rings"]
    too_few_line = (geom["kind"] == "LINESTRING") & (F.size(rings[0]) < 2)
    ring_short = (geom["kind"] == "POLYGON") & F.exists(
        rings, lambda r: F.size(r) < 4)
    ring_open = (geom["kind"] == "POLYGON") & F.exists(
        rings,
        lambda r: (F.try_element_at(r, F.lit(1))["x"]
                   != F.try_element_at(r, F.lit(-1))["x"])
        | (F.try_element_at(r, F.lit(1))["y"]
           != F.try_element_at(r, F.lit(-1))["y"]),
    )

    def ring_self_intersects(r: Column) -> Column:
        # edges of one closed ring; non-adjacent pairs must be disjoint
        # in a simple polygon (adjacent pairs legitimately share a
        # vertex; the (first, last) pair is wrap-adjacent).
        edges = F.zip_with(
            F.slice(r, 1, F.size(r) - 1),
            F.slice(r, 2, F.size(r) - 1),
            lambda p, q: F.struct(p.alias("p"), q.alias("q")),
        )
        n = F.size(edges)
        # i+2 > n would make sequence(i+2, n) count DOWN (Spark infers
        # a negative step) and sneak adjacent pairs back in — guard it.
        return F.exists(
            F.sequence(F.lit(1), n),
            lambda i: F.when(i + 2 > n, F.lit(False)).otherwise(F.exists(
                F.sequence(i + 2, n),
                lambda j: F.when(
                    (i == 1) & (j == n), F.lit(False)
                ).otherwise(_segments_intersect(
                    F.try_element_at(edges, i)["p"],
                    F.try_element_at(edges, i)["q"],
                    F.try_element_at(edges, j)["p"],
                    F.try_element_at(edges, j)["q"],
                )),
            )),
        )

    self_int = (geom["kind"] == "POLYGON") & F.exists(
        rings, ring_self_intersects)
    return (
        F.when(geom.isNull(), F.lit(None).cast("string"))
        .when(~geom["kind"].isin(*_SUPPORTED_KINDS),
              F.lit("Unsupported geometry kind"))
        .when(bad_coord, F.lit("Invalid coordinates"))
        .when(too_few_line, F.lit("Too few points in LineString"))
        .when(ring_short, F.lit("Too few points in ring"))
        .when(ring_open, F.lit("Ring is not closed"))
        .when(self_int, F.lit("Self-intersection"))
    )


def simplify_geometry(geom: Column, tolerance: Column | float) -> Column:
    """simplify_geometry(geometry, distanceTolerance)
    (GeoFunctions.java:764-782): Ramer–Douglas–Peucker simplification.
    Reference contract mirrored at the expression level — NaN tolerance
    fails, negative tolerance fails, zero tolerance returns the input
    unchanged; POINT/MULTIPOINT pass through.  The vertex removal runs
    in the Arrow tier (functions/_geo_pandas_udfs.py — per-feature map
    work, never scan-hot; pinned RDP deviation documented there)."""
    from presto_spark.functions import _geo_pandas_udfs as _gp

    tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
    tol = tol.cast("double")
    checked = (
        F.when(F.isnan(tol),
               F.raise_error(F.lit("distanceTolerance is NaN")))
        .when(tol < 0,
              F.raise_error(F.lit("distanceTolerance is negative")))
        .otherwise(tol)
    )
    xs, ys = _coord_arrays(geom)
    return (
        F.when(geom.isNull() | checked.isNull(), F.lit(None).cast(
            "struct<kind:string,"
            "rings:array<array<struct<x:double,y:double>>>>"))
        .when(checked == 0.0, geom)
        .otherwise(
            _gp.simplify_geometry_udf(geom["kind"], xs, ys, checked))
    )


def flatten_geometry_collections(geom: Column) -> Column:
    """flatten_geometry_collections(geometry) → array(geometry)
    (GeoFunctions.java:1168-1181; geospatial.rst:432): flattens a
    GeometryCollection into its members (flat collections since round
    11 — nesting stays out of model, so one level IS the recursive
    closure) and returns every other geometry whole (a MULTIPOINT is
    an OGC multi-geometry, not a collection, and stays whole)."""
    return F.when(
        geom["kind"] == "GEOMETRYCOLLECTION", _gc_member_structs(geom)
    ).otherwise(F.when(geom.isNotNull(), F.array(geom)))


# ---- convex-polygon overlay tier (GeoFunctions.java stIntersection/
# stUnion/stDifference polygon operands; VERDICT r6 #2) --------------------
#
# Sutherland-Hodgman clipping over the struct-geometry model, entirely
# in Column expressions (HOF lambdas — static expression trees, no
# UDFs).  Scope (COVERAGE.md geometry section; MULTIPOLYGON outputs
# landed round 8 — VERDICT r7 what's-missing #1):
#
# * intersection: exact for convex x convex (S-H IS the convex clip);
# * union: exact for convex x convex.  Full-dimensional overlap →
#   single-ring star-stitch (the union of convex sets sharing an
#   interior point is star-shaped about it); DISJOINT operands → a
#   two-piece MULTIPOLYGON (kind "MULTIPOLYGON", one hole-free shell
#   per ring).  Point/edge-touching pairs stay NULL, pinned (the
#   stitch centroid would sit ON the union boundary, and the glued
#   polygon is not representable without a degenerate ring);
# * difference: A minus B via half-plane decomposition (piece_i = A
#   clipped outside B-edge i and inside B-edges 1..i-1 — disjoint
#   convex pieces whose union is exactly A\B).  One surviving piece →
#   POLYGON; several → MULTIPOLYGON of the pieces; B strictly inside
#   A → the canonical holed POLYGON (shell A + hole B).  Disjoint
#   inputs return A; A inside B returns NULL (empty).
#
# Non-convex or holed polygon OPERANDS return NULL (the overlay tier
# consumes the convex lattice; it may PRODUCE multipolygons and holed
# polygons).  MULTIPOLYGON is an output/measure kind: area, length,
# WKT, type, dimension, num-geometries, geometry-n, flatten; the
# predicate/distance tier stays pinned NULL on it (Sedona is the
# pointer for full non-convex overlay algebra).

_PT_ARR_T = "array<struct<x:double,y:double>>"


def _side(p: Column, q: Column, v: Column) -> Column:
    """Signed area2 of (p, q, v): > 0 when v is left of p→q."""
    return ((q["x"] - p["x"]) * (v["y"] - p["y"])
            - (q["y"] - p["y"]) * (v["x"] - p["x"]))


def _shell_open(poly: Column) -> Column:
    """Ring 0 as an open vertex list (WKT closure vertex dropped)."""
    r = F.element_at(poly["rings"], 1)
    n = F.size(r)
    first, last = F.element_at(r, 1), F.element_at(r, -1)
    closed = (first["x"] == last["x"]) & (first["y"] == last["y"])
    return F.when(closed & (n > 1), F.slice(r, 1, n - 1)).otherwise(r)


def _ccw_open(pts: Column) -> Column:
    """Open vertex list normalized to counter-clockwise winding."""
    n = F.size(pts)
    area2 = F.aggregate(
        F.sequence(F.lit(1), n), F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(pts, i)["x"] * F.element_at(pts, (i % n) + 1)["y"]
        - F.element_at(pts, (i % n) + 1)["x"] * F.element_at(pts, i)["y"],
    )
    return F.when(area2 < 0, F.reverse(pts)).otherwise(pts)


def _is_convex_open(pts: Column) -> Column:
    """All consecutive edge cross products share a sign (zeros allowed:
    collinear vertices keep a polygon convex)."""
    n = F.size(pts)
    crosses = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: _side(
            F.element_at(pts, i),
            F.element_at(pts, (i % n) + 1),
            F.element_at(pts, ((i % n) + 1 % n) % n + 1),
        ),
    )
    return (n >= 3) & (
        F.forall(crosses, lambda c: c >= 0)
        | F.forall(crosses, lambda c: c <= 0)
    )


def _halfplane_clip(acc: Column, p: Column, q: Column) -> Column:
    """One Sutherland-Hodgman pass of open list ``acc`` against the
    directed line p→q, keeping the left (inside-for-CCW) side."""
    ns = F.size(acc)

    def emit(j):
        cur = F.element_at(acc, j)
        nxt = F.element_at(acc, (j % ns) + 1)
        sc = _side(p, q, cur)
        sn = _side(p, q, nxt)
        t = sc / (sc - sn)
        ix = F.struct(
            (cur["x"] + t * (nxt["x"] - cur["x"])).alias("x"),
            (cur["y"] + t * (nxt["y"] - cur["y"])).alias("y"),
        )
        return (
            F.when((sc >= 0) & (sn >= 0), F.array(nxt))
            .when((sc >= 0) & (sn < 0), F.array(ix))
            .when((sc < 0) & (sn >= 0), F.array(ix, nxt))
            .otherwise(F.array().cast(_PT_ARR_T))
        )

    # sequence(1, 0) would count DOWN — empty subjects stay empty.
    return F.when(ns == 0, acc).otherwise(
        F.flatten(F.transform(F.sequence(F.lit(1), ns), emit)))


def _clip_convex(subject: Column, clip_pts: Column) -> Column:
    """Sutherland-Hodgman: open CCW ``subject`` clipped by every edge
    of open CCW ``clip_pts``."""
    nc = F.size(clip_pts)
    return F.aggregate(
        F.sequence(F.lit(1), nc),
        subject,
        lambda acc, i: _halfplane_clip(
            acc,
            F.element_at(clip_pts, i),
            F.element_at(clip_pts, (i % nc) + 1),
        ),
    )


def _poly_from_open(pts: Column) -> Column:
    """Distinct open vertex list → closed single-ring POLYGON (NULL
    below 3 distinct vertices — the empty/degenerate convention)."""
    dedup = F.array_distinct(pts)
    closed = F.concat(dedup, F.array(F.element_at(dedup, 1)))
    return F.when(
        F.size(dedup) >= 3,
        F.struct(F.lit("POLYGON").alias("kind"),
                 F.array(closed).alias("rings")),
    )


def _convex_polygon_s(g: Column, shell: Column) -> Column:
    """Single-ring convex POLYGON guard over a pre-computed shell."""
    return ((g["kind"] == "POLYGON") & (F.size(g["rings"]) == 1)
            & _is_convex_open(shell))


def _strictly_inside(pts: Column, v: Column) -> Column:
    """v strictly interior to the convex CCW open list ``pts``."""
    n = F.size(pts)
    return F.forall(
        F.sequence(F.lit(1), n),
        lambda i: _side(
            F.element_at(pts, i), F.element_at(pts, (i % n) + 1), v) > 0,
    )


def _star_strictly_inside(ring: Column, k: Column, v: Column) -> Column:
    """v strictly interior to a STAR-SHAPED polygon given as an open
    ring sorted CCW by angle around its star center ``k`` (the shape
    geometry_union_agg's partial unions have — star-shaped about any
    point of the group's common intersection).  Unlike the convex
    ``_strictly_inside`` forall, only the edge whose angular wedge
    around k contains v's angle decides: v is inside iff it is
    strictly left of that edge.  On-boundary points give side == 0
    exactly and report NOT inside — the property the stitch's
    collinear boundary candidates depend on."""
    n = F.size(ring)
    av = F.atan2(v["y"] - k["y"], v["x"] - k["x"])
    return (n >= 3) & F.exists(
        F.sequence(F.lit(1), n),
        lambda i: _star_wedge_hit(ring, k, v, av, i, n),
    )


def _star_wedge_hit(
    ring: Column, k: Column, v: Column, av: Column, i: Column, n: Column
) -> Column:
    p = F.element_at(ring, i)
    q = F.element_at(ring, (i % n) + 1)
    ap = F.atan2(p["y"] - k["y"], p["x"] - k["x"])
    aq = F.atan2(q["y"] - k["y"], q["x"] - k["x"])
    # The ring is angle-sorted, so every edge but the last spans
    # [ap, aq); the last wraps through the -pi/pi cut.
    contains = F.when(
        i < n, (av >= ap) & (av < aq)
    ).otherwise((av >= ap) | (av < aq))
    return contains & (_side(p, q, v) > 0)


def _edge_crossings(sa: Column, sb: Column) -> Column:
    """All points where an edge of ``sa`` crosses an edge of ``sb``
    (parametric segment-segment intersection, both t and u in [0,1])."""
    na, nb = F.size(sa), F.size(sb)
    pairs = F.flatten(F.transform(
        F.sequence(F.lit(1), na),
        lambda i: F.transform(
            F.sequence(F.lit(1), nb),
            lambda j: F.struct(i.alias("i"), j.alias("j"))),
    ))

    def ipt(e):
        p1 = F.element_at(sa, e["i"])
        p2 = F.element_at(sa, (e["i"] % na) + 1)
        q1 = F.element_at(sb, e["j"])
        q2 = F.element_at(sb, (e["j"] % nb) + 1)
        rx, ry = p2["x"] - p1["x"], p2["y"] - p1["y"]
        sx, sy = q2["x"] - q1["x"], q2["y"] - q1["y"]
        den = rx * sy - ry * sx
        wx, wy = q1["x"] - p1["x"], q1["y"] - p1["y"]
        t = (wx * sy - wy * sx) / den
        u = (wx * ry - wy * rx) / den
        ok = (den != 0.0) & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
        return F.when(
            ok,
            F.array(F.struct((p1["x"] + t * rx).alias("x"),
                             (p1["y"] + t * ry).alias("y"))),
        ).otherwise(F.array().cast(_PT_ARR_T))

    return F.flatten(F.transform(pairs, ipt))


def _angular_ring(cand: Column, k: Column) -> Column:
    """Distinct candidate points sorted CCW by angle around ``k`` —
    valid exactly when the target region is star-shaped about k."""
    dedup = F.array_distinct(cand)
    keyed = F.array_sort(F.transform(
        dedup,
        lambda v: F.struct(
            F.atan2(v["y"] - k["y"], v["x"] - k["x"]).alias("ang"),
            v["x"].alias("x"), v["y"].alias("y")),
    ))
    return F.transform(
        keyed, lambda e: F.struct(e["x"].alias("x"), e["y"].alias("y")))


def _centroid_of(pts: Column) -> Column:
    n = F.size(pts).cast("double")
    return F.struct(
        (F.aggregate(pts, F.lit(0.0), lambda a, p: a + p["x"]) / n)
        .alias("x"),
        (F.aggregate(pts, F.lit(0.0), lambda a, p: a + p["y"]) / n)
        .alias("y"),
    )


def polygon_shell(geom: Column) -> Column:
    """The open counter-clockwise shell of a POLYGON — materialize this
    with ``withColumn`` (plus a ``repartition()`` optimizer barrier)
    and pass it as ``sa``/``sb`` to the overlay functions below:
    Catalyst's lambda analysis re-resolves every inlined copy of the
    shell subtree, and an un-materialized shell costs SECONDS of
    analysis per overlay call (the projection-collapse trap the module
    memory documents for WKT parsing)."""
    return _ccw_open(_shell_open(geom))


def st_intersection_polygons(
    a: Column, b: Column,
    sa: Column | None = None, sb: Column | None = None,
) -> Column:
    """ST_Intersection for convex single-ring polygons (GeoFunctions
    .java stIntersection) — exact Sutherland-Hodgman clip; NULL for
    non-convex/holed operands (module note), an empty result, or a
    zero-area (lower-dimensional) touch — even one with 3+ distinct
    collinear clip vertices (ADVICE r8, _fulldim).
    ``sa``/``sb``: pre-materialized ``polygon_shell`` columns (strongly
    recommended — see polygon_shell)."""
    sa = sa if sa is not None else polygon_shell(a)
    sb = sb if sb is not None else polygon_shell(b)
    clip = F.array_distinct(_clip_convex(sa, sb))
    return F.when(
        _convex_polygon_s(a, sa) & _convex_polygon_s(b, sb)
        & _fulldim(clip),
        _poly_from_open(clip),
    )


def st_union_polygons(
    a: Column, b: Column,
    sa: Column | None = None, sb: Column | None = None,
) -> Column:
    """ST_Union for convex single-ring polygons — star-shaped boundary
    stitch when the intersection is FULL-DIMENSIONAL, a two-piece
    MULTIPOLYGON when the operands are disjoint (round 8).  Pairs that
    touch only at a point or along an edge segment return NULL, pinned
    (ADVICE r7: the stitch centroid then lies ON the union boundary
    and the angular ring is invalid — two unit squares touching at a
    corner stitched to area 2.5 under the old >= 1 guard); so do
    non-convex operands.  The _fulldim guard requires three distinct
    clip vertices AND positive shoelace area (3 collinear vertices on
    a shared touching edge are still zero-area — ADVICE r8).
    ``sa``/``sb``: pre-materialized ``polygon_shell`` columns."""
    sa = sa if sa is not None else polygon_shell(a)
    sb = sb if sb is not None else polygon_shell(b)
    inter = F.array_distinct(_clip_convex(sa, sb))
    k = _centroid_of(inter)
    cand = F.concat(
        F.filter(sa, lambda v: ~_strictly_inside(sb, v)),
        F.filter(sb, lambda v: ~_strictly_inside(sa, v)),
        _edge_crossings(sa, sb),
    )
    both = _convex_polygon_s(a, sa) & _convex_polygon_s(b, sb)
    return (
        F.when(both & _fulldim(inter),
               _poly_from_open(_angular_ring(cand, k)))
        .when(both & (F.size(inter) == 0),
              F.struct(F.lit("MULTIPOLYGON").alias("kind"),
                       F.array(_ccw_ring(a["rings"][0]),
                               _ccw_ring(b["rings"][0]))
                       .alias("rings")))
    )


def st_difference_polygons(
    a: Column, b: Column,
    sa: Column | None = None, sb: Column | None = None,
) -> Column:
    """ST_Difference for convex single-ring polygons via half-plane
    decomposition (module note): disjoint/touching → a; a inside b →
    NULL (empty); one surviving piece → that POLYGON; b strictly
    inside a → the canonical holed POLYGON (shell a + hole b); several
    pieces → MULTIPOLYGON of the disjoint convex pieces (round 8 —
    the r7 multi-piece NULL pin is lifted).  ``sa``/``sb``:
    pre-materialized ``polygon_shell`` columns."""
    sa = sa if sa is not None else polygon_shell(a)
    sb = sb if sb is not None else polygon_shell(b)
    nb = F.size(sb)
    inter = F.array_distinct(_clip_convex(sa, sb))

    # One linear fold over B's edges: piece_j = (what's left of A after
    # clipping inside edges 1..j-1) clipped OUTSIDE edge j, and the
    # remainder continues inside edge j — piece_j is exactly the
    # triangular chain A ∩ out(e_j) ∩ in(e_1..j-1) without re-deriving
    # each prefix (the naive per-piece refold was quadratic in edges
    # and dominated analysis time).  Pieces accumulate as OPEN distinct
    # vertex lists; together they tile A \ B exactly.
    def step(acc, j):
        p = F.element_at(sb, j)
        q = F.element_at(sb, (j % nb) + 1)
        out_piece = F.array_distinct(
            _halfplane_clip(acc["rem"], q, p))  # outside: reversed
        good = F.size(out_piece) >= 3
        return F.struct(
            _halfplane_clip(acc["rem"], p, q).alias("rem"),
            F.when(good, F.concat(acc["pieces"], F.array(out_piece)))
            .otherwise(acc["pieces"]).alias("pieces"),
        )

    init = F.struct(
        sa.alias("rem"),
        F.array().cast(f"array<{_PT_ARR_T}>").alias("pieces"),
    )
    fin = F.aggregate(F.sequence(F.lit(1), nb), init, step)
    pieces = fin["pieces"]
    np = F.size(pieces)
    closed = F.transform(
        pieces, lambda p: F.concat(p, F.slice(p, 1, 1)))
    # B strictly interior to A: no boundary crossings and every B
    # vertex strictly inside A — the holed-POLYGON case (the piece
    # tiling is area-exact there too, but the reference emits the
    # canonical shell+hole form).
    b_inside_a = (
        (F.size(_edge_crossings(sa, sb)) == 0)
        & F.forall(sb, lambda v: _strictly_inside(sa, v))
    )
    return F.when(
        _convex_polygon_s(a, sa) & _convex_polygon_s(b, sb),
        F.when(~_fulldim(inter), a)  # disjoint / zero-area touch: A unchanged
        .when(b_inside_a,
              F.struct(F.lit("POLYGON").alias("kind"),
                       F.array(a["rings"][0], b["rings"][0])
                       .alias("rings")))
        .when(np == 1, _poly_from_open(F.element_at(pieces, 1)))
        .when(np >= 2,
              F.struct(F.lit("MULTIPOLYGON").alias("kind"),
                       F.transform(closed, _ccw_ring).alias("rings"))),
    )


_ARC_SAMPLES = 8  # arc samples per vertex wedge (32-gon resolution class)


def st_buffer_polygon(
    geom: Column, distance: Column | float,
    shell: Column | None = None,
) -> Column:
    """ST_Buffer for a CONVEX single-ring polygon (GeoFunctions.java
    stBuffer with polygon input): the Minkowski sum of the polygon
    with the polygonal disc the point tier uses — offset each edge
    outward by d and join consecutive offsets with an arc sampled at
    the vertex (the sum's extreme points all come from vertex discs,
    so the construction is exact up to arc resolution).  d = 0 returns
    the input; d < 0 (erosion) and non-convex operands return NULL,
    pinned with the overlay tier.  ``shell``: pre-materialized
    ``polygon_shell`` column (see polygon_shell)."""
    d = distance if isinstance(distance, Column) else F.lit(float(distance))
    d = d.cast("double")
    sh = shell if shell is not None else polygon_shell(geom)
    n = F.size(sh)
    two_pi = 2.0 * math.pi

    def arc(i):
        prev = F.element_at(sh, ((i + n - 2) % n) + 1)
        cur = F.element_at(sh, i)
        nxt = F.element_at(sh, (i % n) + 1)
        # outward normals of the incoming and outgoing edges (CCW ring:
        # outward = direction rotated -90°)
        t1 = F.atan2(prev["x"] - cur["x"], cur["y"] - prev["y"])
        t2 = F.atan2(cur["x"] - nxt["x"], nxt["y"] - cur["y"])
        delta = (t2 - t1 + two_pi) % two_pi
        return F.transform(
            F.sequence(F.lit(0), F.lit(_ARC_SAMPLES)),
            lambda s: F.struct(
                (cur["x"] + d * F.cos(t1 + delta * s.cast("double")
                                      / _ARC_SAMPLES)).alias("x"),
                (cur["y"] + d * F.sin(t1 + delta * s.cast("double")
                                      / _ARC_SAMPLES)).alias("y"),
            ),
        )

    ring = F.flatten(F.transform(F.sequence(F.lit(1), n), arc))
    return (
        F.when(d == 0, geom)
        .when(
            _convex_polygon_s(geom, sh) & (d > 0),
            _poly_from_open(ring),
        )
    )
