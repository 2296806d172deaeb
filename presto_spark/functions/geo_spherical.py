"""SPHERICAL_GEOGRAPHY type tier: geodesic measures on lon/lat data.

Reference surface (presto-main-base/.../geospatial/SphericalGeoFunctions
.java; presto-geospatial-toolkit/.../SphericalGeographyUtils.java; docs
presto-docs/.../functions/geospatial.rst "Spherical Geography"):

* ``to_spherical_geography(geometry)`` — SphericalGeoFunctions.java:74-105
  (validates every vertex is in lon [-180,180] / lat [-90,90] and the
  kind is point/line/polygon-ish; the payload is unchanged).
* ``to_geometry(sphericalgeography)`` — :108-115 (identity; every
  spherical geography is a valid geometry).
* ``ST_Distance(sg, sg)`` — :123-131 + SphericalGeographyUtils
  .sphericalDistance:62-76: POINT-only great-circle distance in METERS
  (Vincenty on a sphere of radius 6371.01 km).
* ``ST_Length(sg)`` — :222-254: LINESTRING/MULTILINESTRING sum of
  per-edge great-circle distances, meters.
* ``ST_Area(sg)`` — :133-164 + SphericalExcessCalculator:334-434:
  POLYGON/MULTIPOLYGON spherical-excess area in m² (per-ring bearing-
  tracked excess; exterior rings add, holes subtract; the course-delta
  test corrects rings that enclose a pole).
* ``ST_Centroid(sg)`` — :256-305: POINT/MULTIPOINT 3-D cartesian mean
  projected back to the sphere.

Spark-first: spherical geography reuses the repo's plain geometry
struct (functions/geo.py — ``struct<kind, rings>``); the type tier is
the function family, exactly as the reference keeps one serialized
payload for both types.  Everything below is a JVM-side Column
expression — per-ring folds are ``F.aggregate`` struct accumulators
over ring vertices (bounded, sketch-sized arrays; no UDF, no shuffle).

Documented deviations (same classes as functions/geo.py):

* Out-of-range coordinates in ``to_spherical_geography`` raise through
  ``raise_error`` (the reference's INVALID_FUNCTION_ARGUMENT), but the
  check is per-vertex rather than envelope-first — same accept/reject
  set, since "every vertex in range" <=> "envelope in range".
* MULTIPOLYGON ring roles follow the repo's orientation convention
  (CCW shell / CW hole, normalized at parse) instead of Esri's
  isExteriorRing; POLYGON stays positional (ring 0 shell).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from presto_spark.functions.geo import (
    EARTH_RADIUS_KM,
    _all_points,
    _edges,
    _ring_signed_area2,
    great_circle_distance,
)

EARTH_RADIUS_M = EARTH_RADIUS_KM * 1000.0  # SphericalGeographyUtils.java:37

_PI = math.pi
_TWO_PI = 2.0 * math.pi
_THREE_PI = 3.0 * math.pi

# GeometryCursor gate in toSphericalGeography:92-103 — Esri
# Point/Polyline/Polygon/MultiPoint, spelled over the repo's kinds.
# Pinned deviation: the reference admits a GEOMETRYCOLLECTION whose
# members are all convertible (the cursor iterates members); here the
# collection kind is rejected outright — the spherical measures are
# point/line/polygon-typed anyway, so no measurable surface is lost.
_SPHERICAL_KINDS = (
    "POINT", "MULTIPOINT", "LINESTRING", "MULTILINESTRING",
    "POLYGON", "MULTIPOLYGON",
)


def to_spherical_geography(geom: Column) -> Column:
    """to_spherical_geography(geometry) (SphericalGeoFunctions.java:
    74-105): every vertex must satisfy lon ∈ [-180, 180] and
    lat ∈ [-90, 90] and the kind must be convertible; raises
    (INVALID_FUNCTION_ARGUMENT spelling) otherwise.  Payload is the
    unchanged geometry struct."""
    pts = _all_points(geom)
    in_range = F.forall(
        pts,
        lambda p: (F.abs(p["x"]) <= 180.0) & (F.abs(p["y"]) <= 90.0)
        & ~F.isnan(p["x"]) & ~F.isnan(p["y"]),
    )
    ok = geom["kind"].isin(*_SPHERICAL_KINDS) & in_range
    # The guard must be load-bearing on an output field (a detached
    # boolean is pruned and never evaluates).
    checked_kind = F.when(ok, geom["kind"]).otherwise(
        F.raise_error(F.concat(
            F.lit("to_spherical_geography: invalid input: "),
            F.coalesce(geom["kind"], F.lit("NULL")),
            F.lit(" (latitude must be in [-90, 90], "
                  "longitude in [-180, 180])"),
        ))
    )
    # NULL propagates (the reference's scalar functions are implicitly
    # null-propagating; a bare F.when guard would route NULL into the
    # raising otherwise-branch — ADVICE r11).
    return F.when(
        geom.isNotNull(),
        F.struct(checked_kind.alias("kind"), geom["rings"].alias("rings")),
    )


def to_geometry(sg: Column) -> Column:
    """to_geometry(sphericalgeography) (SphericalGeoFunctions.java:
    108-115): identity — every spherical geography is a valid
    geometry."""
    return sg


def st_distance_sphere(a: Column, b: Column) -> Column:
    """ST_Distance over SphericalGeography (SphericalGeoFunctions
    .java:123-131): POINT-only, great-circle METERS.  NULL when either
    input is empty; raises for non-point kinds
    (SphericalGeographyUtils.validateSphericalType)."""
    pa = a["rings"][0][0]
    pb = b["rings"][0][0]
    both_points = (a["kind"] == "POINT") & (b["kind"] == "POINT")
    dist = great_circle_distance(
        pa["y"], pa["x"], pb["y"], pb["x"]) * F.lit(1000.0)
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("double"))
        .when(both_points, dist)
        .otherwise(F.raise_error(F.lit(
            "When applied to SphericalGeography inputs, ST_Distance only "
            "supports POINT")).cast("double"))
    )


def _ring_geodesic_length_m(ring: Column) -> Column:
    """Sum of per-edge great-circle distances (meters) along one
    path — stSphericalLength's inner loop (:239-251)."""
    p, q = _edges(ring)
    return F.aggregate(
        F.zip_with(
            p, q,
            lambda s, t: great_circle_distance(
                s["y"], s["x"], t["y"], t["x"]),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    ) * F.lit(1000.0)


def st_length_sphere(g: Column) -> Column:
    """ST_Length over SphericalGeography (SphericalGeoFunctions.java:
    222-254): LINESTRING/MULTILINESTRING great-circle length in
    meters (paths with < 2 points contribute 0)."""
    total = F.aggregate(
        g["rings"],
        F.lit(0.0),
        lambda acc, ring: acc + F.when(
            F.size(ring) >= 2, _ring_geodesic_length_m(ring)
        ).otherwise(F.lit(0.0)),
    )
    return (
        F.when(g.isNull(), F.lit(None).cast("double"))
        .when(g["kind"].isin("LINESTRING", "MULTILINESTRING"), total)
        .otherwise(F.raise_error(F.lit(
            "When applied to SphericalGeography inputs, ST_Length only "
            "supports LINE_STRING or MULTI_LINE_STRING")).cast("double"))
    )


def _acc(exc, cd, fib, pfb, first, pcos, psin, ptan, plon) -> Column:
    return F.struct(
        exc.alias("exc"), cd.alias("cd"), fib.alias("fib"),
        pfb.alias("pfb"), first.alias("first"), pcos.alias("pcos"),
        psin.alias("psin"), ptan.alias("ptan"), plon.alias("plon"),
    )


def _ring_spherical_excess(ring: Column) -> Column:
    """One ring's spherical excess — a faithful Column fold of
    SphericalExcessCalculator (SphericalGeoFunctions.java:334-434):
    per-vertex L'Huilier-style excess increment plus bearing course
    tracking; |courseDelta| < π/4 at closure means the ring encloses a
    pole and the excess is corrected by -2π off its absolute value.

    The input ring is WKT-closed (first vertex repeated last); the
    closing vertex is dropped (computeSphericalExcess:309-313) and the
    fold is initialized from the last distinct vertex, then consumes
    every distinct vertex in order — exactly the reference's
    iteration."""
    n = F.size(ring)
    closed = (ring[0]["x"] == F.element_at(ring, -1)["x"]) & (
        ring[0]["y"] == F.element_at(ring, -1)["y"])
    pts = F.when(closed, F.slice(ring, 1, n - 1)).otherwise(ring)
    last = F.element_at(pts, -1)
    last_phi = F.radians(last["y"])
    init = _acc(
        F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(True),
        F.cos(last_phi), F.sin(last_phi), F.tan(last_phi / 2),
        F.radians(last["x"]),
    )

    def step(acc: Column, p: Column) -> Column:
        phi = F.radians(p["y"])
        tan = F.tan(phi / 2)
        lon = F.radians(p["x"])
        dlon = lon - acc["plon"]
        exc = acc["exc"] + 2 * F.atan2(
            F.tan(dlon / 2) * (acc["ptan"] + tan),
            F.lit(1.0) + acc["ptan"] * tan,
        )
        cos_, sin_ = F.cos(phi), F.sin(phi)
        sdl, cdl = F.sin(dlon), F.cos(dlon)
        # Initial/final bearings previous→current (:386-394); operands
        # of the (x + kπ) % 2π folds are positive, so Spark % == Java %.
        ib = F.pmod(
            F.atan2(sdl * cos_,
                    acc["pcos"] * sin_ - acc["psin"] * cos_ * cdl)
            + F.lit(_TWO_PI), F.lit(_TWO_PI))
        fb = F.pmod(
            F.atan2(-sdl * acc["pcos"],
                    acc["psin"] * cos_ - acc["pcos"] * sin_ * cdl)
            + F.lit(_PI), F.lit(_TWO_PI))
        cd = (
            acc["cd"]
            + F.when(acc["first"], F.lit(0.0)).otherwise(
                F.pmod(ib - acc["pfb"] + F.lit(_THREE_PI),
                       F.lit(_TWO_PI)) - F.lit(_PI))
            + F.pmod(fb - ib + F.lit(_THREE_PI), F.lit(_TWO_PI))
            - F.lit(_PI)
        )
        return _acc(
            exc, cd, F.when(acc["first"], ib).otherwise(acc["fib"]),
            fb, F.lit(False), cos_, sin_, tan, lon,
        )

    def finish(acc: Column) -> Column:
        cd = acc["cd"] + F.pmod(
            acc["fib"] - acc["pfb"] + F.lit(_THREE_PI), F.lit(_TWO_PI)
        ) - F.lit(_PI)
        return F.when(
            F.abs(cd) < F.lit(_PI / 4),
            F.abs(acc["exc"]) - F.lit(_TWO_PI),
        ).otherwise(acc["exc"])

    return finish(F.aggregate(pts, init, step))


def st_area_sphere(g: Column) -> Column:
    """ST_Area over SphericalGeography (SphericalGeoFunctions.java:
    133-164): POLYGON/MULTIPOLYGON spherical-excess area in m² —
    Σ sign·|ring excess| (exterior +, hole −), then
    |total| · R_m².  Ring roles: POLYGON positional (ring 0 shell),
    MULTIPOLYGON by the repo's CCW-shell/CW-hole orientation."""
    is_poly = g["kind"] == "POLYGON"
    per_ring = F.transform(
        g["rings"],
        lambda ring, i: F.when(
            F.when(is_poly, i == 0)
            .otherwise(_ring_signed_area2(ring) > 0),
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)) * F.abs(_ring_spherical_excess(ring)),
    )
    signed = F.aggregate(per_ring, F.lit(0.0), lambda acc, v: acc + v)
    return (
        F.when(g.isNull(), F.lit(None).cast("double"))
        .when(
            g["kind"].isin("POLYGON", "MULTIPOLYGON"),
            F.abs(signed) * F.lit(EARTH_RADIUS_M * EARTH_RADIUS_M),
        )
        .otherwise(F.raise_error(F.lit(
            "When applied to SphericalGeography inputs, ST_Area only "
            "supports POLYGON or MULTI_POLYGON")).cast("double"))
    )


def st_centroid_sphere(g: Column) -> Column:
    """ST_Centroid over SphericalGeography (SphericalGeoFunctions
    .java:256-305): POINT identity; MULTIPOINT = the 3-D cartesian sum
    of unit-sphere vertices projected back (CartesianPoint
    .asSphericalPoint) — returned as a POINT geometry struct."""
    pts = _all_points(g)
    phi = lambda p: F.radians(90.0 - p["y"])  # noqa: E731
    theta = lambda p: F.radians(p["x"])  # noqa: E731
    sx = F.aggregate(
        pts, F.lit(0.0),
        lambda a, p: a + F.sin(phi(p)) * F.cos(theta(p)))
    sy = F.aggregate(
        pts, F.lit(0.0),
        lambda a, p: a + F.sin(phi(p)) * F.sin(theta(p)))
    sz = F.aggregate(pts, F.lit(0.0), lambda a, p: a + F.cos(phi(p)))
    lat = 90.0 - F.degrees(F.atan2(F.sqrt(sx * sx + sy * sy), sz))
    lon = F.degrees(F.atan2(sy, sx))
    single = g["rings"][0][0]
    # single-member MULTIPOINT returns the exact point, like the
    # reference's numGeometries()==1 special case (:279-282) — the 3-D
    # round trip would otherwise add float residue
    exact = (g["kind"] == "POINT") | (F.size(pts) == 1)
    cx = F.when(exact, single["x"]).otherwise(lon)
    cy = F.when(exact, single["y"]).otherwise(lat)
    ok = g["kind"].isin("POINT", "MULTIPOINT")
    pt = F.struct(
        F.when(ok, cx).otherwise(F.raise_error(F.lit(
            "When applied to SphericalGeography inputs, ST_Centroid "
            "only supports POINT or MULTI_POINT")).cast("double")
        ).alias("x"),
        cy.alias("y"),
    )
    return F.when(
        g.isNotNull(),
        F.struct(
            F.lit("POINT").alias("kind"),
            F.array(F.array(pt)).alias("rings"),
        ),
    )
