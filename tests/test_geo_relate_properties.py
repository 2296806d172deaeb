"""Property tests for the DE-9IM kernel (functions/geo_relate.py).

Two invariants that hold for EVERY valid geometry pair, independent of
the specific configuration:

* **Transpose symmetry**: relate(a, b) is the matrix transpose of
  relate(b, a) — cell (X(a), Y(b)) equals cell (Y(b), X(a)).
* **Self-relation**: relate(g, g) matches the OGC equals pattern
  T*F**FFF* and its diagonal carries the geometry's own dimensions
  (II = dim, BB = boundary dim or F, EE = 2).

Pure-Python (no Spark session) over randomized integer-coordinate
geometries, so hypothesis can push hundreds of configurations through
the event-splitting/midpoint/lift machinery cheaply.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from presto_spark.functions.geo_relate import _relate_pair

_COORD = st.integers(min_value=-5, max_value=5)


@st.composite
def _point(draw):
    x, y = draw(_COORD), draw(_COORD)
    return ("POINT", [[float(x)]], [[float(y)]])


@st.composite
def _multipoint(draw):
    pts = draw(st.lists(st.tuples(_COORD, _COORD), min_size=1,
                        max_size=4, unique=True))
    return ("MULTIPOINT",
            [[float(x)] for x, _ in pts],
            [[float(y)] for _, y in pts])


@st.composite
def _linestring(draw):
    pts = draw(st.lists(st.tuples(_COORD, _COORD), min_size=2,
                        max_size=4, unique=True))
    return ("LINESTRING",
            [[float(x) for x, _ in pts]],
            [[float(y) for _, y in pts]])


@st.composite
def _box(draw):
    """Axis-aligned box polygon — always valid and simple."""
    x0, y0 = draw(_COORD), draw(_COORD)
    w = draw(st.integers(min_value=1, max_value=4))
    h = draw(st.integers(min_value=1, max_value=4))
    xs = [x0, x0 + w, x0 + w, x0, x0]
    ys = [y0, y0, y0 + h, y0 + h, y0]
    return ("POLYGON", [[float(v) for v in xs]], [[float(v) for v in ys]])


_GEOMS = st.one_of(_point(), _multipoint(), _linestring(), _box())

# transpose: row-major (I B E)a × (I B E)b → swap
_TRANSPOSE = [0, 3, 6, 1, 4, 7, 2, 5, 8]


@settings(max_examples=200, deadline=None)
@given(_GEOMS, _GEOMS)
def test_relate_transpose_symmetry(a, b):
    m_ab = _relate_pair(a[0], a[1], a[2], b[0], b[1], b[2])
    m_ba = _relate_pair(b[0], b[1], b[2], a[0], a[1], a[2])
    assert m_ab is not None and m_ba is not None
    assert m_ab == "".join(m_ba[i] for i in _TRANSPOSE), (a, b, m_ab, m_ba)


@settings(max_examples=100, deadline=None)
@given(_GEOMS)
def test_relate_self_is_equals(g):
    m = _relate_pair(g[0], g[1], g[2], g[0], g[1], g[2])
    assert m is not None
    # OGC equals pattern T*F**FFF*
    assert m[0] != "F" and m[2] == "F" and m[5] == "F" \
        and m[6] == "F" and m[7] == "F", (g, m)
    dim = {"POINT": 0, "MULTIPOINT": 0, "LINESTRING": 1,
           "POLYGON": 2}[g[0]]
    assert m[0] == str(dim), (g, m)
    assert m[8] == "2"


@settings(max_examples=150, deadline=None)
@given(_box(), _box())
def test_box_disjoint_matches_bbox_separation(a, b):
    """For axis-aligned boxes, DE-9IM disjointness has a closed form:
    the boxes are disjoint iff their intervals separate strictly on
    some axis — an independent oracle for the kernel."""
    m = _relate_pair(a[0], a[1], a[2], b[0], b[1], b[2])
    ax0, ax1 = min(a[1][0]), max(a[1][0])
    ay0, ay1 = min(a[2][0]), max(a[2][0])
    bx0, bx1 = min(b[1][0]), max(b[1][0])
    by0, by1 = min(b[2][0]), max(b[2][0])
    separated = ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0
    kernel_disjoint = (m[0] == "F" and m[1] == "F"
                       and m[3] == "F" and m[4] == "F")
    assert kernel_disjoint == separated, (a, b, m)


def _as_gc(members):
    """Encode member geometries in the header-ring GC layout
    (geo.py round-11 encoding: (typecode, NULL), (ring count, NULL))."""
    typecode = {"POINT": 1, "MULTIPOINT": 2, "LINESTRING": 3,
                "MULTILINESTRING": 4, "POLYGON": 5, "MULTIPOLYGON": 6}
    xss, yss = [], []
    for kind, xs, ys in members:
        xss.append([float(typecode[kind]), float(len(xs))])
        yss.append([None, None])
        xss.extend(xs)
        yss.extend(ys)
    return "GEOMETRYCOLLECTION", xss, yss


@settings(max_examples=120, deadline=None)
@given(st.lists(_point(), min_size=1, max_size=3), _GEOMS)
def test_gc_of_points_equals_multipoint(pts, other):
    """Homogeneous-GC invariant (round 13): a collection of POINTs
    relates identically to the merged MULTIPOINT, against any other
    geometry."""
    gc = _as_gc(pts)
    mp = ("MULTIPOINT",
          [xs[0] for _, xs, _ in pts],
          [ys[0] for _, _, ys in pts])
    m_gc = _relate_pair(gc[0], gc[1], gc[2],
                        other[0], other[1], other[2])
    m_mp = _relate_pair(mp[0], mp[1], mp[2],
                        other[0], other[1], other[2])
    assert m_gc == m_mp, (pts, other, m_gc, m_mp)


@settings(max_examples=120, deadline=None)
@given(st.lists(_linestring(), min_size=1, max_size=3), _GEOMS)
def test_gc_of_lines_equals_multilinestring(lines, other):
    """A collection of LINESTRINGs relates identically to the merged
    MULTILINESTRING — including the mod-2 boundary cancellation when
    members share endpoints."""
    gc = _as_gc(lines)
    ml = ("MULTILINESTRING",
          [xs[0] for _, xs, _ in lines],
          [ys[0] for _, _, ys in lines])
    m_gc = _relate_pair(gc[0], gc[1], gc[2],
                        other[0], other[1], other[2])
    m_ml = _relate_pair(ml[0], ml[1], ml[2],
                        other[0], other[1], other[2])
    assert m_gc == m_ml, (lines, other, m_gc, m_ml)


@settings(max_examples=100, deadline=None)
@given(_point(), _linestring(), _GEOMS)
def test_gc_mixed_dimension_stays_null(pt, line, other):
    """Mixed-dimension collections keep the pinned NULL (the open-set
    lifts need the union's interior to be open)."""
    gc = _as_gc([pt, line])
    assert _relate_pair(gc[0], gc[1], gc[2],
                        other[0], other[1], other[2]) is None
    assert _relate_pair(other[0], other[1], other[2],
                        gc[0], gc[1], gc[2]) is None
