"""Arrow-batched pandas UDF for geometry simplification.

Reference: presto-main-base/.../geospatial/GeoFunctions.java:764-782
``simplify_geometry(geometry, distanceTolerance)`` — the reference
delegates to the Esri generalize operator, which is Ramer–Douglas–
Peucker; this module implements the textbook iterative RDP over the
repo's struct-geometry model (functions/geo.py header).  Pinned
deviation (COVERAGE.md geometry section): vertex selection follows
standard RDP with the first/last vertices (for closed rings: vertex 0
and the vertex farthest from it) as anchors — simplified geometry is
algorithm-specific at tie points, the contract (all removed vertices
lie within ``tolerance`` of the simplified outline) is the same.

Module WITHOUT ``from __future__ import annotations`` (pandas_udf needs
live type hints).  Simplification is per-feature map work on
already-parsed geometry rows — never scan-hot, so the Arrow tier is
the right cost point (same reasoning as the binary/CDF fallbacks).
"""

import math

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

# DataType objects, not a DDL string: the decorator runs at import
# time, and parsing a DDL string needs a live SparkSession.
_POINT_T = StructType(
    [StructField("x", DoubleType()), StructField("y", DoubleType())]
)
_GEOM_T = StructType(
    [
        StructField("kind", StringType()),
        StructField("rings", ArrayType(ArrayType(_POINT_T))),
    ]
)


def _perp_dist(p, a, b):
    """Distance from p to segment ab (degenerate ab → distance to a)."""
    ax, ay, bx, by, px, py = a[0], a[1], b[0], b[1], p[0], p[1]
    dx, dy = bx - ax, by - ay
    d2 = dx * dx + dy * dy
    if d2 == 0.0:
        return math.hypot(px - ax, py - ay)
    t = ((px - ax) * dx + (py - ay) * dy) / d2
    t = max(0.0, min(1.0, t))
    return math.hypot(px - (ax + t * dx), py - (ay + t * dy))


def _rdp(points, tol):
    """Iterative Ramer–Douglas–Peucker over an open point list."""
    n = len(points)
    if n <= 2:
        return list(points)
    keep = [False] * n
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        s, e = stack.pop()
        if e - s < 2:
            continue
        best, bi = -1.0, -1
        for i in range(s + 1, e):
            d = _perp_dist(points[i], points[s], points[e])
            if d > best:
                best, bi = d, i
        if best > tol:
            keep[bi] = True
            stack.append((s, bi))
            stack.append((bi, e))
    return [points[i] for i in range(n) if keep[i]]


def _simplify_ring(ring, tol, closed):
    pts = [(p["x"], p["y"]) for p in ring]
    if closed and len(pts) >= 4 and pts[0] == pts[-1]:
        # Closed ring: anchor at vertex 0 and the vertex farthest from
        # it, RDP each half, rejoin (the standard closed-ring RDP).
        body = pts[:-1]
        far = max(range(1, len(body)),
                  key=lambda i: math.hypot(body[i][0] - body[0][0],
                                           body[i][1] - body[0][1]))
        half1 = _rdp(body[: far + 1], tol)
        half2 = _rdp(body[far:] + [body[0]], tol)
        out = half1[:-1] + half2[:-1]
        if len(out) < 3:  # collapsed below a triangle: keep anchors
            out = [body[0], body[far]]
        out = out + [out[0]]
    else:
        out = _rdp(pts, tol)
    return [{"x": x, "y": y} for x, y in out]


@pandas_udf(_GEOM_T)
def simplify_geometry_udf(geom: pd.DataFrame, tol: pd.Series) -> pd.DataFrame:
    # Struct columns cross the Arrow boundary as a DataFrame (one
    # column per field) in both directions.
    kinds, ringss = [], []
    for kind, rings, t in zip(geom["kind"], geom["rings"], tol):
        if kind is None or t is None:
            kinds.append(None)
            ringss.append(None)
            continue
        if kind in ("POINT", "MULTIPOINT") or rings is None or not len(rings):
            kinds.append(kind)
            ringss.append(rings)
            continue
        closed = kind == "POLYGON"
        kinds.append(kind)
        ringss.append(
            [_simplify_ring(r, float(t), closed) for r in rings])
    return pd.DataFrame({"kind": kinds, "rings": ringss})


# ---- full WKT parse incl. GEOMETRYCOLLECTION (round 11) --------------------
#
# Reference: GeoFunctions.java stGeometryFromText accepts every OGC
# kind.  The Column parser (geo.st_geometry_from_text) stays lean for
# the hot scan path and parses collections to NULL; this Arrow parser
# handles everything, emitting the SAME struct — simple kinds
# identically, GEOMETRYCOLLECTION via the header-ring member encoding
# (geo.py round-11 notes: 2-vertex NaN-y headers carrying typecode +
# member ring count).  Nested collections → NULL (out of model).

_GC_CODES = {"POINT": 1, "MULTIPOINT": 2, "LINESTRING": 3,
             "MULTILINESTRING": 4, "POLYGON": 5, "MULTIPOLYGON": 6}

import re as _re

_MEMBER_SPLIT = _re.compile(
    r",\s*(?=(?:POINT|MULTIPOINT|LINESTRING|MULTILINESTRING|POLYGON"
    r"|MULTIPOLYGON|GEOMETRYCOLLECTION)\b)", _re.IGNORECASE)


def _py_parse_pts(s):
    out = []
    for p in s.replace("(", "").replace(")", "").split(","):
        xy = p.split()
        out.append({"x": float(xy[0]), "y": float(xy[1])})
    return out


def _py_signed_area2(ring):
    n = len(ring)
    return sum(
        ring[i]["x"] * ring[(i + 1) % n]["y"]
        - ring[(i + 1) % n]["x"] * ring[i]["y"]
        for i in range(n))


def _py_rings_of(kind, body):
    """Python twin of geo._rings_of — identical ring layout."""
    if kind == "MULTIPOLYGON":
        pieces = _re.split(r"\)\s*\)\s*,\s*\(\s*\(", body)
        rings = []
        for piece in pieces:
            for i, ring_txt in enumerate(_re.split(r"\)\s*,\s*\(", piece)):
                r = _py_parse_pts(ring_txt)
                if i == 0 and _py_signed_area2(r) < 0:
                    r = list(reversed(r))
                elif i > 0 and _py_signed_area2(r) > 0:
                    r = list(reversed(r))
                rings.append(r)
        return rings
    raw = _re.split(r"\)\s*,\s*\(", body)
    if kind == "MULTIPOINT":
        return [[p] for ring_txt in raw for p in _py_parse_pts(ring_txt)]
    return [_py_parse_pts(ring_txt) for ring_txt in raw]


def _py_parse_wkt(text):
    """WKT → (kind, rings) or None — the full-parser core."""
    if text is None:
        return None
    t = text.strip()
    m = _re.match(r"^([A-Za-z]+)\s*\((.*)\)\s*$", t, _re.DOTALL)
    if not m or not m.group(2).strip():
        return None
    kind, body = m.group(1).upper(), m.group(2)
    if kind != "GEOMETRYCOLLECTION":
        if kind not in _GC_CODES:
            return None
        return kind, _py_rings_of(kind, body)
    rings = []
    for member in _MEMBER_SPLIT.split(body):
        mm = _re.match(r"^\s*([A-Za-z]+)\s*\((.*)\)\s*$", member, _re.DOTALL)
        if not mm or mm.group(1).upper() not in _GC_CODES:
            return None  # nested collection / unknown member kind
        mkind = mm.group(1).upper()
        mrings = _py_rings_of(mkind, mm.group(2))
        # header vertices: y None (NULL) — NaN does not survive the
        # pandas→Arrow crossing (it nulls out), so NULL IS the marker
        rings.append([
            {"x": float(_GC_CODES[mkind]), "y": None},
            {"x": float(len(mrings)), "y": None},
        ])
        rings.extend(mrings)
    return "GEOMETRYCOLLECTION", rings


@pandas_udf(_GEOM_T)
def parse_wkt_full_udf(wkt: pd.Series) -> pd.DataFrame:
    kinds, ringss = [], []
    for text in wkt:
        parsed = _py_parse_wkt(text)
        if parsed is None:
            kinds.append(None)
            ringss.append(None)
        else:
            kinds.append(parsed[0])
            ringss.append(parsed[1])
    return pd.DataFrame({"kind": kinds, "rings": ringss})
