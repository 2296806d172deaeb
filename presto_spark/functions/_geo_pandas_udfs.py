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
    BinaryType,
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


# INPUT SHAPE RULE (round 12): geometry-struct INPUTS to pandas UDFs
# must be decomposed into (kind, xs, ys) coordinate arrays.  PySpark's
# Arrow→pandas converter re-wraps array<array<struct>> inputs with
# np.array(...) per row (types.py convert_array_ndarray_as_ndarray),
# which raises "inhomogeneous shape" for RAGGED ring lengths (a shell
# and a hole with different vertex counts) on numpy >= 1.24;
# array<array<double>> skips the re-wrap (no element converter).
# Struct OUTPUT is fine — the return path builds plain python lists.


def _rings_from_xy(rings_x, rings_y):
    return [[{"x": x, "y": y} for x, y in zip(xs, ys)]
            for xs, ys in zip(rings_x, rings_y)]


@pandas_udf(_GEOM_T)
def simplify_geometry_udf(kinds_in: pd.Series, xss: pd.Series,
                          yss: pd.Series, tol: pd.Series) -> pd.DataFrame:
    kinds, ringss = [], []
    for kind, rings_x, rings_y, t in zip(kinds_in, xss, yss, tol):
        if kind is None or t is None:
            kinds.append(None)
            ringss.append(None)
            continue
        if kind in ("POINT", "MULTIPOINT") or rings_x is None \
                or not len(rings_x):
            kinds.append(kind)
            ringss.append(None if rings_x is None
                          else _rings_from_xy(rings_x, rings_y))
            continue
        closed = kind == "POLYGON"
        kinds.append(kind)
        ringss.append(
            [_simplify_ring(r, float(t), closed)
             for r in _rings_from_xy(rings_x, rings_y)])
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


# ---- full GeoJSON parse incl. GeometryCollection (round 12) ----------------
#
# Reference: GeoFunctions.java geometry_from_geojson (:1225) accepts
# every RFC 7946 Geometry object.  The Column parser
# (geo.geometry_from_geojson) covers the six simple shapes on the hot
# path; this Arrow parser adds GeometryCollection (header-ring member
# encoding, nested collections → NULL — the same tier split and pins
# as the WKT parser).

import json as _json


def _gj_rings(gtype, coords):
    """One simple GeoJSON shape → flat rings, or None."""
    def pt(c):
        return {"x": float(c[0]), "y": float(c[1])}

    if gtype == "POINT":
        return [[pt(coords)]]
    if gtype == "MULTIPOINT":
        return [[pt(c)] for c in coords]
    if gtype == "LINESTRING":
        return [[pt(c) for c in coords]]
    if gtype == "MULTILINESTRING":
        return [[pt(c) for c in line] for line in coords]
    if gtype == "POLYGON":
        return [[pt(c) for c in ring] for ring in coords]
    if gtype == "MULTIPOLYGON":
        rings = []
        for piece in coords:
            for j, ring in enumerate(piece):
                r = [pt(c) for c in ring]
                a2 = _py_signed_area2(r)
                if (j == 0 and a2 < 0) or (j > 0 and a2 > 0):
                    r = list(reversed(r))
                rings.append(r)
        return rings
    return None


_GJ_KIND = {"Point": "POINT", "MultiPoint": "MULTIPOINT",
            "LineString": "LINESTRING",
            "MultiLineString": "MULTILINESTRING",
            "Polygon": "POLYGON", "MultiPolygon": "MULTIPOLYGON"}


def _py_parse_geojson(text):
    if text is None:
        return None
    try:
        obj = _json.loads(text)
    except (ValueError, TypeError):
        return None
    if not isinstance(obj, dict):
        return None
    gtype = obj.get("type")
    if gtype in _GJ_KIND:
        kind = _GJ_KIND[gtype]
        try:
            rings = _gj_rings(kind, obj.get("coordinates"))
        except (TypeError, ValueError, IndexError):
            return None
        return (kind, rings) if rings else None
    if gtype != "GeometryCollection":
        return None
    rings = []
    for member in obj.get("geometries") or []:
        mtype = member.get("type") if isinstance(member, dict) else None
        kind = _GJ_KIND.get(mtype)
        if kind is None:
            return None  # nested collection / unknown member
        try:
            mrings = _gj_rings(kind, member.get("coordinates"))
        except (TypeError, ValueError, IndexError):
            return None
        if not mrings:
            return None
        rings.append([
            {"x": float(_GC_CODES[kind]), "y": None},
            {"x": float(len(mrings)), "y": None},
        ])
        rings.extend(mrings)
    return ("GEOMETRYCOLLECTION", rings) if rings else None


@pandas_udf(_GEOM_T)
def parse_geojson_full_udf(js: pd.Series) -> pd.DataFrame:
    kinds, ringss = [], []
    for text in js:
        parsed = _py_parse_geojson(text)
        if parsed is None:
            kinds.append(None)
            ringss.append(None)
        else:
            kinds.append(parsed[0])
            ringss.append(parsed[1])
    return pd.DataFrame({"kind": kinds, "rings": ringss})


# ---- WKB ingest / emit (round 12) ------------------------------------------
#
# Reference: GeoFunctions.java stGeomFromBinary (:252, "ST_GeomFromBinary")
# and stAsBinary (:268, "ST_AsBinary") — OGC WKB.  At 100 TB geometry
# columns arrive as WKB in parquet far more often than WKT, so ingest
# lives in the same Arrow tier as the full WKT parser: one batched
# crossing, zero shuffle.  Both byte orders parse (XDR=0 / NDR=1, per
# the OGC spec); the writer emits little-endian NDR like the reference
# (EsriShape-era writers are NDR).  GEOMETRYCOLLECTION round-trips via
# the header-ring member encoding; nested collections → NULL (pinned,
# same scope as the WKT tier).

import struct as _struct

_WKB_KIND = {1: "POINT", 2: "LINESTRING", 3: "POLYGON", 4: "MULTIPOINT",
             5: "MULTILINESTRING", 6: "MULTIPOLYGON",
             7: "GEOMETRYCOLLECTION"}
_WKB_CODE = {v: k for k, v in _WKB_KIND.items()}


class _WkbReader:
    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def u8(self):
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u32(self, bo):
        v = _struct.unpack_from(bo + "I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def pt(self, bo):
        x, y = _struct.unpack_from(bo + "dd", self.buf, self.pos)
        self.pos += 16
        return {"x": x, "y": y}


def _wkb_ring(r, bo):
    return [r.pt(bo) for _ in range(r.u32(bo))]


def _wkb_read_one(r):
    """One WKB geometry at the reader position → (kind, rings) in the
    flat-ring model (MULTIPOLYGON orientation-normalized like the WKT
    parser), or None for unsupported/invalid payloads."""
    bo = "<" if r.u8() == 1 else ">"
    code = r.u32(bo)
    kind = _WKB_KIND.get(code & 0xFF)  # mask off EWKB/ISO flag bits
    if kind is None or (code & 0xFFFFFF00) not in (0,):
        return None
    if kind == "POINT":
        return kind, [[r.pt(bo)]]
    if kind == "LINESTRING":
        return kind, [_wkb_ring(r, bo)]
    if kind == "POLYGON":
        return kind, [_wkb_ring(r, bo) for _ in range(r.u32(bo))]
    n = r.u32(bo)
    if kind == "MULTIPOINT":
        rings = []
        for _ in range(n):
            m = _wkb_read_one(r)
            if m is None or m[0] != "POINT":
                return None
            rings.append(m[1][0])
        return kind, rings
    if kind == "MULTILINESTRING":
        rings = []
        for _ in range(n):
            m = _wkb_read_one(r)
            if m is None or m[0] != "LINESTRING":
                return None
            rings.append(m[1][0])
        return kind, rings
    if kind == "MULTIPOLYGON":
        rings = []
        for _ in range(n):
            m = _wkb_read_one(r)
            if m is None or m[0] != "POLYGON":
                return None
            for i, ring in enumerate(m[1]):
                a2 = _py_signed_area2(ring)
                if (i == 0 and a2 < 0) or (i > 0 and a2 > 0):
                    ring = list(reversed(ring))
                rings.append(ring)
        return kind, rings
    # GEOMETRYCOLLECTION → header-ring encoding; nested → None
    rings = []
    for _ in range(n):
        m = _wkb_read_one(r)
        if m is None or m[0] not in _GC_CODES:
            return None
        rings.append([
            {"x": float(_GC_CODES[m[0]]), "y": None},
            {"x": float(len(m[1])), "y": None},
        ])
        rings.extend(m[1])
    return kind, rings


def _py_parse_wkb(buf):
    if buf is None:
        return None
    try:
        r = _WkbReader(bytes(buf))
        out = _wkb_read_one(r)
        if out is None or r.pos != len(r.buf):
            return None
        return out
    except (IndexError, _struct.error):
        return None


def _wkb_pts(pts):
    return b"".join(_struct.pack("<dd", p["x"], p["y"]) for p in pts)


def _wkb_write_one(kind, rings):
    """(kind, rings) → little-endian WKB bytes, or None for
    unsupported shapes."""
    head = b"\x01" + _struct.pack("<I", _WKB_CODE[kind])
    if kind == "POINT":
        return head + _wkb_pts(rings[0])
    if kind == "LINESTRING":
        return head + _struct.pack("<I", len(rings[0])) + _wkb_pts(rings[0])
    if kind == "POLYGON":
        body = _struct.pack("<I", len(rings))
        for r in rings:
            body += _struct.pack("<I", len(r)) + _wkb_pts(r)
        return head + body
    if kind == "MULTIPOINT":
        return head + _struct.pack("<I", len(rings)) + b"".join(
            _wkb_write_one("POINT", [r]) for r in rings)
    if kind == "MULTILINESTRING":
        return head + _struct.pack("<I", len(rings)) + b"".join(
            _wkb_write_one("LINESTRING", [r]) for r in rings)
    if kind == "MULTIPOLYGON":
        pieces = []
        for r in rings:
            if _py_signed_area2(r) >= 0 or not pieces:
                pieces.append([r])
            else:
                pieces[-1].append(r)
        return head + _struct.pack("<I", len(pieces)) + b"".join(
            _wkb_write_one("POLYGON", p) for p in pieces)
    # GEOMETRYCOLLECTION: decode header rings back into members
    _code_kind = {v: k for k, v in _GC_CODES.items()}
    members, i = [], 0
    while i < len(rings):
        hdr = rings[i]
        # header y is NULL in the struct model; a NULL double arrives
        # as NaN on the Arrow→pandas crossing
        y0 = hdr[0].get("y")
        if len(hdr) != 2 or not (y0 is None or
                                 (isinstance(y0, float) and math.isnan(y0))):
            return None
        mkind = _code_kind.get(int(hdr[0]["x"]))
        cnt = int(hdr[1]["x"])
        if mkind is None or i + 1 + cnt > len(rings):
            return None
        members.append(_wkb_write_one(mkind, rings[i + 1:i + 1 + cnt]))
        i += 1 + cnt
    if any(m is None for m in members):
        return None
    return head + _struct.pack("<I", len(members)) + b"".join(members)


@pandas_udf(_GEOM_T)
def parse_wkb_udf(wkb: pd.Series) -> pd.DataFrame:
    kinds, ringss = [], []
    for buf in wkb:
        parsed = _py_parse_wkb(buf)
        if parsed is None:
            kinds.append(None)
            ringss.append(None)
        else:
            kinds.append(parsed[0])
            ringss.append(parsed[1])
    return pd.DataFrame({"kind": kinds, "rings": ringss})


@pandas_udf(BinaryType())
def as_wkb_udf(kinds: pd.Series, xss: pd.Series,
               yss: pd.Series) -> pd.Series:
    out = []
    for kind, rings_x, rings_y in zip(kinds, xss, yss):
        if kind is None or rings_x is None or kind not in _WKB_CODE:
            out.append(None)
            continue
        try:
            out.append(_wkb_write_one(
                kind, _rings_from_xy(rings_x, rings_y)))
        except (KeyError, TypeError, ValueError):
            out.append(None)
    return pd.Series(out)
