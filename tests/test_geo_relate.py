"""DE-9IM tier + round-12 geometry surface tests.

Reference contracts: GeoFunctions.java ST_Touches (:1060), ST_Crosses
(:1068), ST_Disjoint (:1076), ST_Equals (:1083), ST_Overlaps,
ST_Relate (:1445), ST_Contains (:1045), ST_Within (:1147),
ST_GeomFromBinary (:252), ST_AsBinary (:268), ST_LineFromText (:144),
ST_InteriorRingN (:717), ST_InteriorRings (:557), ST_Geometries
(:691), ST_EnvelopeAsPts (:887), ST_Boundary (:866), ST_IsValid
(:399), ST_IsSimple (:383), ST_SymDifference (:1033).  Matrix goldens
match PostGIS/JTS on the same WKT.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from presto_spark.functions import geo, geo_relate
from presto_spark.functions.geo_relate import _relate_pair

# Heavy tier (VERDICT r15 next-round #1): the JTS-semantics and
# relate-matrix sweeps dominate the suite's wall clock (~19 min on the
# r16 box); the geo golden registry rows stay covered in the default
# tier via tests/test_relational.py's oracle sweep.
pytestmark = pytest.mark.slow


def _mk(kind, rings):
    xs = [[p[0] for p in r] for r in rings]
    ys = [[p[1] for p in r] for r in rings]
    return kind, xs, ys


SQ = _mk("POLYGON", [[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]])
DONUT = _mk("POLYGON", [[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
                        [(3, 3), (7, 3), (7, 7), (3, 7), (3, 3)]])


@pytest.mark.parametrize("a,b,expected", [
    # polygon x polygon
    (SQ, _mk("POLYGON", [[(5, 5), (15, 5), (15, 15), (5, 15), (5, 5)]]),
     "212101212"),                                    # partial overlap
    (SQ, _mk("POLYGON", [[(10, 0), (20, 0), (20, 10), (10, 10), (10, 0)]]),
     "FF2F11212"),                                    # shared edge
    (SQ, _mk("POLYGON", [[(20, 20), (30, 20), (30, 30), (20, 30), (20, 20)]]),
     "FF2FF1212"),                                    # disjoint
    (SQ, _mk("POLYGON", [[(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]]),
     "212FF1FF2"),                                    # contains
    (SQ, SQ, "2FFF1FFF2"),                            # equals
    (SQ, _mk("POLYGON", [[(10, 10), (20, 10), (20, 20), (10, 20),
                          (10, 10)]]),
     "FF2F01212"),                                    # corner touch
    (DONUT, _mk("POLYGON", [[(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]]),
     "FF2FF1212"),                                    # inside the hole
    (DONUT, _mk("POLYGON", [[(3, 3), (7, 3), (7, 7), (3, 7), (3, 3)]]),
     "FF2F112F2"),                                    # fills the hole
    # line x line
    (_mk("LINESTRING", [[(0, 0), (10, 10)]]),
     _mk("LINESTRING", [[(0, 10), (10, 0)]]), "0F1FF0102"),   # cross
    (_mk("LINESTRING", [[(0, 0), (10, 10)]]),
     _mk("LINESTRING", [[(2, 2), (8, 8)]]), "101FF0FF2"),     # contains
    (_mk("LINESTRING", [[(0, 0), (6, 0)]]),
     _mk("LINESTRING", [[(4, 0), (10, 0)]]), "1010F0102"),    # overlap
    (_mk("LINESTRING", [[(0, 0), (10, 10)]]),
     _mk("LINESTRING", [[(10, 10), (20, 20)]]), "FF1F00102"),  # endpoint
    # polygon x line / point
    (SQ, _mk("LINESTRING", [[(5, -5), (5, 20)]]), "1F20F1102"),  # crosses
    (SQ, _mk("LINESTRING", [[(0, 0), (10, 0)]]), "FF2101FF2"),   # on edge
    (SQ, _mk("POINT", [[(3, 3)]]), "0F2FF1FF2"),
    (SQ, _mk("POINT", [[(0, 5)]]), "FF20F1FF2"),      # boundary point
    (_mk("POINT", [[(3, 3)]]), _mk("POINT", [[(3, 3)]]), "0FFFFFFF2"),
    (_mk("MULTIPOINT", [[(3, 3)], [(50, 50)]]), SQ, "0F0FFF212"),
])
def test_relate_matrix_kernel(a, b, expected):
    assert _relate_pair(a[0], a[1], a[2], b[0], b[1], b[2]) == expected


def _geo_df(spark, pairs):
    """[(name, wkt_a, wkt_b)] → DataFrame with parsed geometry cols."""
    df = spark.createDataFrame(pairs, "k string, wa string, wb string")
    return df.select(
        "k",
        geo.st_geometry_from_text(F.col("wa")).alias("a"),
        geo.st_geometry_from_text(F.col("wb")).alias("b"),
    ).coalesce(2)


def test_predicates_end_to_end(spark):
    sq = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    rows = _geo_df(spark, [
        ("overlap", sq, "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"),
        ("touch_edge", sq, "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"),
        ("disjoint", sq, "POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))"),
        ("contains", sq, "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"),
        ("equals", sq, sq),
        ("line_cross", sq, "LINESTRING (5 -5, 5 20)"),
        ("line_overlap", "LINESTRING (0 0, 6 0)", "LINESTRING (4 0, 10 0)"),
    ]).select(
        "k",
        geo_relate.st_touches(F.col("a"), F.col("b")).alias("touches"),
        geo_relate.st_crosses(F.col("a"), F.col("b")).alias("crosses"),
        geo_relate.st_overlaps(F.col("a"), F.col("b")).alias("overlaps"),
        geo_relate.st_disjoint(F.col("a"), F.col("b")).alias("disjoint"),
        geo_relate.st_equals(F.col("a"), F.col("b")).alias("equals"),
        geo_relate.st_contains_general(
            F.col("a"), F.col("b")).alias("contains"),
        geo_relate.st_within_general(F.col("b"), F.col("a")).alias("within"),
    ).collect()
    got = {r.k: r for r in rows}
    assert [got["overlap"].touches, got["overlap"].overlaps,
            got["overlap"].disjoint] == [False, True, False]
    assert [got["touch_edge"].touches, got["touch_edge"].overlaps,
            got["touch_edge"].disjoint] == [True, False, False]
    assert [got["disjoint"].disjoint, got["disjoint"].touches] == \
        [True, False]
    assert [got["contains"].contains, got["contains"].within,
            got["contains"].touches] == [True, True, False]
    assert [got["equals"].equals, got["equals"].contains,
            got["equals"].within] == [True, True, True]
    assert [got["line_cross"].crosses, got["line_cross"].touches] == \
        [True, False]
    assert [got["line_overlap"].overlaps, got["line_overlap"].crosses] == \
        [True, False]
    # no other row claims equality
    assert not any(got[k].equals for k in got if k != "equals")


def test_st_relate_pattern(spark):
    rows = _geo_df(spark, [
        ("within", "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))",
         "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
    ]).select(
        geo_relate.st_relate(
            F.col("a"), F.col("b"), "T*F**F***").alias("within_pat"),
        geo_relate.st_relate(
            F.col("a"), F.col("b"), "FF*FF****").alias("disjoint_pat"),
        geo_relate.geometry_relate_matrix(
            F.col("a"), F.col("b")).alias("m"),
    ).collect()
    assert rows[0].within_pat is True
    assert rows[0].disjoint_pat is False
    assert rows[0].m == "2FF1FF212"


def test_st_relate_malformed_pattern_raises(spark):
    """A non-NULL pattern that is not 9 chars over TF012* RAISES
    (reference: Esri relate() rejects it, surfacing as
    INVALID_FUNCTION_ARGUMENT — VERDICT r12 what's-missing #4); a NULL
    pattern stays NULL (null-skipped argument).  Both tiers."""
    import pytest

    df = _geo_df(spark, [
        ("pair", "POINT (1 1)", "POINT (1 1)"),
    ])
    for bad in ("T*F**F**", "T*F**F***X", "T*X**F***"):
        with pytest.raises(Exception, match="Invalid DE-9IM pattern"):
            df.select(
                geo_relate.st_relate(F.col("a"), F.col("b"), bad)
                .alias("v")).coalesce(1).collect()
    null_pat = df.select(
        geo_relate.st_relate(
            F.col("a"), F.col("b"),
            F.lit(None).cast("string")).alias("v")).collect()
    assert null_pat[0].v is None
    # SQL tier
    from presto_spark.engine import Engine

    eng = Engine(spark)
    with pytest.raises(Exception, match="Invalid DE-9IM pattern"):
        eng.sql("""
            SELECT ST_Relate(ST_GeometryFromText('POINT (1 1)'),
                             ST_GeometryFromText('POINT (1 1)'),
                             'TTT') AS v""").coalesce(1).collect()
    ok = eng.sql("""
        SELECT ST_Relate(ST_GeometryFromText('POINT (1 1)'),
                         ST_GeometryFromText('POINT (1 1)'),
                         CAST(NULL AS STRING)) AS v""").collect()
    assert ok[0].v is None


def test_relate_null_and_collection(spark):
    """NULL and MIXED-dimension collections relate to NULL (pinned);
    HOMOGENEOUS collections relate like the matching MULTI kind
    (round 13 — _norm_collection merges members exactly)."""
    df = spark.createDataFrame(
        [("mixed", "GEOMETRYCOLLECTION (POINT (1 1), "
          "LINESTRING (0 0, 2 2))", "POINT (1 1)"),
         ("nulls", None, None),
         ("homog", "GEOMETRYCOLLECTION (POINT (1 1))", "POINT (1 1)")],
        "k string, wa string, wb string")
    rows = {r.k: r.m for r in df.select(
        "k",
        geo_relate.geometry_relate_matrix(
            geo.st_geometry_from_text_full(F.col("wa")),
            geo.st_geometry_from_text(F.col("wb"))).alias("m"),
    ).coalesce(1).collect()}
    assert rows["mixed"] is None
    assert rows["nulls"] is None
    assert rows["homog"] == "0FFFFFFF2"


def test_relate_homogeneous_collections(spark):
    """Homogeneous GEOMETRYCOLLECTION ≡ the matching MULTI kind in the
    DE-9IM tier: same matrix for GC-of-lines vs the merged
    MULTILINESTRING (shared member endpoints cancel from the union
    boundary mod-2), and GC-of-polygons overlaps like the
    MULTIPOLYGON."""
    df = spark.createDataFrame(
        [("gc_lines",
          "GEOMETRYCOLLECTION (LINESTRING (0 0, 1 0), "
          "LINESTRING (1 0, 2 0))",
          "POINT (1 0)"),
         ("one_line", "LINESTRING (0 0, 2 0)", "POINT (1 0)"),
         ("gc_polys",
          "GEOMETRYCOLLECTION ("
          "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)), "
          "POLYGON ((10 0, 14 0, 14 4, 10 4, 10 0)))",
          "POLYGON ((2 0, 6 0, 6 3, 2 3, 2 0))"),
         ("mp_polys",
          "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
          "((10 0, 14 0, 14 4, 10 4, 10 0)))",
          "POLYGON ((2 0, 6 0, 6 3, 2 3, 2 0))")],
        "k string, wa string, wb string")
    rows = {r.k: r for r in df.select(
        "k",
        geo_relate.geometry_relate_matrix(
            geo.st_geometry_from_text_full(F.col("wa")),
            geo.st_geometry_from_text_full(F.col("wb"))).alias("m"),
    ).coalesce(1).collect()}
    # the shared endpoint (1 0) is INTERIOR to the line union
    assert rows["gc_lines"].m == rows["one_line"].m
    assert rows["gc_lines"].m[0] == "0"
    # GC-of-polygons ≡ MULTIPOLYGON
    assert rows["gc_polys"].m == rows["mp_polys"].m


def test_matrix_predicate_reuse(spark):
    """matrix_predicate reads predicates off ONE materialized matrix
    column (multi-predicate reuse — one Arrow crossing), agreeing with
    the pair-level st_* functions; crosses/overlaps take the operand
    dimensions explicitly."""
    import pytest

    from presto_spark.functions.geo import st_dimension

    df = _geo_df(spark, [
        ("overlap", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
         "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"),
        ("touch", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
         "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"),
    ]).withColumn(
        "m", geo_relate.geometry_relate_matrix(F.col("a"), F.col("b")))
    rows = {r.k: r for r in df.select(
        "k",
        geo_relate.matrix_predicate("m", "touches").alias("mt"),
        geo_relate.matrix_predicate(
            "m", "overlaps", st_dimension(F.col("a")),
            st_dimension(F.col("b"))).alias("mo"),
        geo_relate.matrix_predicate("m", "intersects").alias("mi"),
        geo_relate.st_touches(F.col("a"), F.col("b")).alias("pt"),
        geo_relate.st_overlaps(F.col("a"), F.col("b")).alias("po"),
    ).collect()}
    for k in ("overlap", "touch"):
        assert rows[k].mt == rows[k].pt
        assert rows[k].mo == rows[k].po
        assert rows[k].mi is True
    with pytest.raises(ValueError, match="needs dim_a and dim_b"):
        geo_relate.matrix_predicate("m", "crosses")
    with pytest.raises(ValueError, match="unknown predicate"):
        geo_relate.matrix_predicate("m", "nope")


def test_wkb_roundtrip(spark):
    wkts = [
        "POINT (1.5 -2.25)",
        "MULTIPOINT ((1 1), (2 2))",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
        "((2 2, 3 2, 3 3, 2 3, 2 2)))",
        "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
    ]
    df = spark.createDataFrame([(w,) for w in wkts], "wkt string").select(
        "wkt", geo.st_geometry_from_text_full(F.col("wkt")).alias("g")
    ).coalesce(1)
    out = df.select(
        "wkt",
        geo.st_as_text(
            geo.st_geometry_from_binary(geo.st_as_binary(F.col("g")))
        ).alias("t"),
        geo.st_as_text(F.col("g")).alias("orig"),
    ).collect()
    for r in out:
        assert r.t == r.orig, r.wkt


def test_wkb_known_bytes(spark):
    # canonical NDR POINT(1 2): 0101000000 + two doubles
    import struct

    buf = b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", 1.0, 2.0)
    xdr = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 3.0, 4.0)
    df = spark.createDataFrame(
        [(bytearray(buf),), (bytearray(xdr),), (bytearray(b"\x01\x02"),),
         (None,)],
        "b binary")
    rows = df.select(
        geo.st_as_text(
            geo.st_geometry_from_binary(F.col("b"))).alias("t")
    ).coalesce(1).collect()
    texts = [r.t for r in rows]
    assert "POINT (1.0 2.0)" in texts and "POINT (3.0 4.0)" in texts
    assert texts.count(None) == 2  # malformed + NULL


def test_line_from_text(spark):
    df = spark.createDataFrame(
        [("LINESTRING (0 0, 2 3)",), (None,)], "wkt string")
    rows = df.select(
        geo.st_as_text(geo.st_line_from_text(F.col("wkt"))).alias("t")
    ).coalesce(1).collect()
    assert sorted([r.t for r in rows], key=lambda v: (v is None, v)) == \
        ["LINESTRING (0.0 0.0, 2.0 3.0)", None]
    bad = spark.createDataFrame([("POINT (1 1)",)], "wkt string")
    with pytest.raises(Exception, match="LINE_STRING"):
        bad.coalesce(1).select(
            geo.st_line_from_text(F.col("wkt"))).collect()


def test_interior_ring_accessors(spark):
    wkt = ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
           "(1 1, 2 1, 2 2, 1 2, 1 1), (5 5, 6 5, 6 6, 5 6, 5 5))")
    df = spark.createDataFrame([(wkt,), (None,)], "wkt string").select(
        geo.st_geometry_from_text(F.col("wkt")).alias("g")).coalesce(1)
    rows = df.select(
        geo.st_as_text(
            geo.st_interior_ring_n(F.col("g"), 2)).alias("r2"),
        geo.st_as_text(
            geo.st_interior_ring_n(F.col("g"), 3)).alias("r3"),
        F.size(geo.st_interior_rings(F.col("g"))).alias("nrings"),
    ).collect()
    # legacy sizeOfNull: size(NULL) = -1 under the engine's non-ANSI
    # session, so the NULL row reports nrings -1
    got = [r for r in rows if r.nrings == 2][0]
    assert got.r2 == "LINESTRING (5.0 5.0, 6.0 5.0, 6.0 6.0, 5.0 6.0, 5.0 5.0)"
    assert got.r3 is None  # out of range
    null_row = [r for r in rows if r.nrings != 2][0]
    assert null_row.r2 is None and null_row.nrings == -1
    with pytest.raises(Exception, match="POLYGON"):
        spark.createDataFrame([("POINT (1 1)",)], "wkt string").coalesce(
            1).select(geo.st_interior_rings(
                geo.st_geometry_from_text(F.col("wkt")))).collect()


def test_geometries_envelope_boundary(spark):
    df = spark.createDataFrame([
        ("mp", "MULTIPOINT ((1 1), (2 2))"),
        ("line", "LINESTRING (0 0, 5 0, 5 5)"),
        ("ring", "LINESTRING (0 0, 1 0, 1 1, 0 0)"),
        ("poly", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
                 "(1 1, 2 1, 2 2, 1 2, 1 1))"),
        ("mpoly", "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
                  "((2 2, 3 2, 3 3, 2 3, 2 2)))"),
    ], "k string, wkt string").select(
        "k", geo.st_geometry_from_text(F.col("wkt")).alias("g")
    ).coalesce(1)
    rows = {r.k: r for r in df.select(
        "k",
        F.size(geo.st_geometries(F.col("g"))).alias("n"),
        geo.st_as_text(
            geo.st_geometries(F.col("g"))[0]).alias("g1"),
        geo.st_as_text(
            geo.st_envelope_as_pts(F.col("g"))[0]).alias("lo"),
        geo.st_as_text(
            geo.st_envelope_as_pts(F.col("g"))[1]).alias("hi"),
        geo.st_as_text(geo.st_boundary(F.col("g"))).alias("bd"),
    ).collect()}
    assert rows["mp"].n == 2 and rows["mp"].g1 == "POINT (1.0 1.0)"
    assert rows["mpoly"].n == 2
    assert rows["mpoly"].g1 == \
        "POLYGON ((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 1.0, 0.0 0.0))"
    assert rows["poly"].n == 1
    assert rows["line"].lo == "POINT (0.0 0.0)"
    assert rows["line"].hi == "POINT (5.0 5.0)"
    assert rows["line"].bd == "MULTIPOINT (0.0 0.0, 5.0 5.0)"
    assert rows["ring"].bd is None  # closed curve: empty boundary pin
    assert rows["poly"].bd.startswith("MULTILINESTRING")
    assert rows["mp"].bd is None


def test_is_valid_is_simple(spark):
    df = spark.createDataFrame([
        ("ok_poly", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", True, True),
        ("bowtie", "POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))", False, False),
        ("self_cross_line", "LINESTRING (0 0, 4 4, 4 0, 0 4)", True, False),
        ("dup_multipoint", "MULTIPOINT ((1 1), (1 1))", True, False),
        ("plain_line", "LINESTRING (0 0, 1 1)", True, True),
    ], "k string, wkt string, valid boolean, simple boolean").select(
        "k", "valid", "simple",
        geo.st_geometry_from_text(F.col("wkt")).alias("g")).coalesce(1)
    rows = df.select(
        "k", "valid", "simple",
        geo.st_is_valid(F.col("g")).alias("v"),
        geo.st_is_simple(F.col("g")).alias("s"),
    ).collect()
    for r in rows:
        assert r.v == r.valid, r.k
        assert r.s == r.simple, r.k


def test_sym_difference(spark):
    from presto_spark.functions import geo_decompose as gd

    df = spark.createDataFrame([
        ("overlap", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
         "POLYGON ((1 0, 3 0, 3 2, 1 2, 1 0))"),
        ("equal", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
         "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
        ("disjoint", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
         "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"),
    ], "k string, wa string, wb string").select(
        "k",
        geo.st_geometry_from_text(F.col("wa")).alias("a"),
        geo.st_geometry_from_text(F.col("wb")).alias("b"),
    ).coalesce(2).withColumn(
        "ta", gd.triangulate_raw(F.col("a"))
    ).withColumn("tb", gd.triangulate_raw(F.col("b"))).repartition(2)
    sym = gd.st_sym_difference_general(F.col("ta"), F.col("tb"))
    rows = {r.k: r for r in df.select(
        "k", sym["kind"].alias("kind"), geo.st_area(sym).alias("area"),
    ).collect()}
    assert rows["overlap"].area == pytest.approx(4.0)
    assert rows["equal"].kind is None  # empty-result pin → NULL geometry
    assert rows["disjoint"].area == pytest.approx(2.0)
    assert rows["disjoint"].kind == "MULTIPOLYGON"


def test_spherical_null_propagation(spark):
    from presto_spark.functions import geo_spherical as gs

    df = spark.createDataFrame(
        [("POINT (10 20)",), (None,)], "wkt string").select(
        geo.st_geometry_from_text(F.col("wkt")).alias("g")).coalesce(1)
    sg = gs.to_spherical_geography(F.col("g"))
    rows = df.select(
        gs.st_distance_sphere(sg, sg).alias("d"),
        gs.st_centroid_sphere(sg)["kind"].alias("ck"),
        gs.to_spherical_geography(F.col("g"))["kind"].alias("k"),
    ).collect()
    vals = sorted(((r.d, r.ck, r.k) for r in rows),
                  key=lambda t: t[0] is None)
    assert vals == [(0.0, "POINT", "POINT"), (None, None, None)]
    # length/area: NULL rows flow through the raising guards too
    line_df = spark.createDataFrame(
        [("LINESTRING (0 0, 0 1)",), (None,)], "wkt string").select(
        geo.st_geometry_from_text(F.col("wkt")).alias("g")).coalesce(1)
    got = line_df.select(
        gs.st_length_sphere(F.col("g")).alias("ln")).collect()
    lens = sorted([r.ln for r in got], key=lambda v: (v is None, v))
    assert lens[1] is None and lens[0] == pytest.approx(111195.0, rel=1e-3)
    poly_df = spark.createDataFrame(
        [("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",), (None,)],
        "wkt string").select(
        geo.st_geometry_from_text(F.col("wkt")).alias("g")).coalesce(1)
    got = poly_df.select(
        gs.st_area_sphere(F.col("g")).alias("a")).collect()
    areas = sorted([r.a for r in got], key=lambda v: (v is None, v))
    assert areas[1] is None and areas[0] > 1e10  # ~1.2e10 m^2


def test_simplify_ragged_rings(spark):
    """Regression (round 12): a POLYGON whose shell and hole have
    DIFFERENT vertex counts crashed the struct-input simplify UDF
    (numpy inhomogeneous-shape error inside PySpark's Arrow
    converter); the coordinate-array input shape fixes it."""
    w = ("POLYGON ((0 0, 4 0, 4 4, 2 5, 0 4, 0 0), "
         "(1 1, 2 1, 2 2, 1 2, 1 1))")
    df = spark.createDataFrame([(w,)], "wkt string").select(
        geo.st_geometry_from_text(F.col("wkt")).alias("g")).coalesce(1)
    out = df.select(
        geo.st_as_text(
            geo.simplify_geometry(F.col("g"), 0.001)).alias("t")
    ).collect()[0].t
    assert out.startswith("POLYGON ((0.0 0.0, 4.0 0.0")
    assert "1.0 1.0" in out  # hole survives


def test_geometry_union_general(spark):
    """geometry_union(array<geometry>) for polygon members (round 12 —
    lifts the point-tier pin): three unit-overlap squares dissolve to
    the exact inclusion-exclusion area; a MULTIPOLYGON member folds in
    piece by piece; mixed point/polygon arrays stay NULL (pinned)."""
    from presto_spark.functions import geo_decompose as gd

    df = spark.createDataFrame([
        ("tri_overlap",
         ["POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
          "POLYGON ((1 0, 3 0, 3 2, 1 2, 1 0))",
          "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))"]),
        ("with_mpoly",
         ["MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
          "((2 0, 3 0, 3 1, 2 1, 2 0)))",
          "POLYGON ((0 0, 3 0, 3 1, 0 1, 0 0))"]),
        ("mixed",
         ["POINT (1 1)", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"]),
    ], "k string, wkts array<string>").select(
        "k",
        F.transform(F.col("wkts"),
                    lambda w: geo.st_geometry_from_text(w)).alias("gs"),
    ).coalesce(2).repartition(2)
    u = gd.geometry_union_general(F.col("gs"))
    rows = {r.k: r for r in df.select(
        "k", u["kind"].alias("kind"), geo.st_area(u).alias("area"),
    ).collect()}
    # 2x2 + 2x2 - 1x2 overlap = 6, plus the far 1x1 = 7
    assert rows["tri_overlap"].area == pytest.approx(7.0)
    assert rows["tri_overlap"].kind == "MULTIPOLYGON"
    assert rows["with_mpoly"].area == pytest.approx(3.0)
    assert rows["mixed"].kind is None


def test_geojson_multi_kinds_roundtrip(spark):
    """geometry_as_geojson / geometry_from_geojson for MultiLineString
    and MultiPolygon (round 12): round-trip preserves the canonical
    WKT (holed multipolygon included — orientation re-normalized on
    parse)."""
    wkts = [
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 2))",
        "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0), "
        "(1 1, 1 2, 2 2, 2 1, 1 1)), ((6 6, 7 6, 7 7, 6 7, 6 6)))",
    ]
    df = spark.createDataFrame([(w,) for w in wkts], "wkt string").select(
        "wkt", geo.st_geometry_from_text(F.col("wkt")).alias("g")
    ).coalesce(1)
    rows = df.select(
        "wkt",
        geo.geometry_as_geojson(F.col("g")).alias("gj"),
        geo.st_as_text(geo.geometry_from_geojson(
            geo.geometry_as_geojson(F.col("g")))).alias("rt"),
        geo.st_as_text(F.col("g")).alias("orig"),
    ).collect()
    for r in rows:
        assert r.gj.startswith('{"type":"Multi'), r.wkt
        assert r.rt == r.orig, (r.wkt, r.gj)


def test_geojson_collection_roundtrip(spark):
    """GeometryCollection GeoJSON (round 12): the Column writer prints
    members recursively; the Arrow parser round-trips back to the
    identical canonical WKT.  Simple shapes through the full parser
    match the Column parser byte-for-byte."""
    wkts = [
        "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1), "
        "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
        "((2 2, 3 2, 3 3, 2 3, 2 2)))",
        "POINT (1 2)",
    ]
    df = (
        spark.createDataFrame([(w,) for w in wkts], "wkt string")
        .select(geo.st_geometry_from_text_full(F.col("wkt")).alias("g"))
        .coalesce(1)
        # materialize the JSON text across a barrier: a Python UDF
        # whose input embeds a HOF lambda (the writer's let-binding)
        # fails Catalyst's UDF extraction (INTERNAL_ERROR "Cannot
        # evaluate expression") — the same operand-materialization
        # rule as the overlay tier
        .withColumn("gj", geo.geometry_as_geojson(F.col("g")))
        .repartition(1)
    )
    rows = df.select(
        geo.st_as_text(geo.geometry_from_geojson_full(
            F.col("gj"))).alias("rt"),
        geo.st_as_text(F.col("g")).alias("orig"),
    ).collect()
    for r in rows:
        assert r.rt == r.orig
    # malformed / nested-collection inputs → NULL
    bad = spark.createDataFrame(
        [("not json",),
         ('{"type":"GeometryCollection","geometries":'
          '[{"type":"GeometryCollection","geometries":[]}]}',),
         (None,)], "j string")
    got = bad.coalesce(1).select(
        geo.geometry_from_geojson_full(F.col("j")).alias("g")).collect()
    # a pandas-udf struct output cannot carry a struct-level NULL —
    # a failed parse comes back as a struct with NULL fields, which
    # propagates as NULL through every accessor (same representation
    # as the WKT/WKB Arrow parsers)
    assert all(r.g is None or r.g.kind is None for r in got)


def test_constructor_tail(spark):
    """ST_LineString/ST_MultiPoint over point arrays, ST_Points,
    ST_Polygon (GeoFunctions.java stLineString/stMultiPoint/stPoints/
    stPolygon — round-12 second pass)."""
    df = spark.createDataFrame([(1,)], "i int").coalesce(1)
    pts = F.array(geo.st_point(F.lit(0.0), F.lit(0.0)),
                  geo.st_point(F.lit(3.0), F.lit(4.0)))
    r = df.select(
        geo.st_as_text(geo.st_line_string(pts)).alias("ls"),
        geo.st_as_text(geo.st_multi_point(pts)).alias("mp"),
        F.size(geo.st_points(geo.st_line_string(pts))).alias("np"),
        geo.st_as_text(geo.st_polygon(F.lit(
            "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))).alias("pg"),
        # < 2 points: no-empty-geometry pin → NULL
        geo.st_line_string(F.slice(pts, 1, 1))["kind"].alias("short"),
    ).collect()[0]
    assert r.ls == "LINESTRING (0.0 0.0, 3.0 4.0)"
    assert r.mp == "MULTIPOINT (0.0 0.0, 3.0 4.0)"
    assert r.np == 2
    assert r.pg == "POLYGON ((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 1.0, 0.0 0.0))"
    assert r.short is None
    with pytest.raises(Exception, match="POLYGON"):
        df.select(geo.st_polygon(F.lit("POINT (1 1)"))).collect()
    with pytest.raises(Exception, match="LINE_STRING"):
        df.select(geo.st_points(geo.st_point(
            F.lit(1.0), F.lit(1.0)))).collect()


def test_geo_sql_spellings(spark):
    """Round-12 SQL tier (registry.py geo block): the Presto spellings
    ST_GeometryFromText / ST_GeomFromBinary / ST_AsBinary (renamed
    around the Spark 4.1 builtin by dialect.py) / ST_Point / ST_X /
    ST_Y / ST_GeometryType and the DE-9IM predicate family work
    through engine.sql — each predicate is ONE matrix UDF call plus a
    regex scan."""
    from presto_spark.engine import Engine

    eng = Engine(spark)
    rows = eng.sql("""
        SELECT ST_Touches(a, b) AS t,
               ST_Intersects(a, b) AS i,
               ST_Relate(a, b, 'FF2F11212') AS rel,
               ST_Contains(a, a) AS self_ct,
               ST_GeometryType(b) AS ty,
               ST_Y(ST_Point(3.0, 4.0)) AS py,
               ST_AsText_check(a) AS chk
        FROM (SELECT
            ST_GeometryFromText(
                'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))') AS a,
            ST_GeomFromBinary(
                ST_AsBinary(ST_GeometryFromText(
                    'POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))'))) AS b)
    """.replace(
        # Presto subscripts are 1-based through eng.sql
        "ST_AsText_check(a)", "ST_X(ST_Point(a.rings[1][1].x, 0.0))"
    )).collect()
    r = rows[0]
    assert (r.t, r.i, r.rel, r.self_ct, r.ty, r.py, r.chk) == \
        (True, True, True, True, "ST_Polygon", 4.0, 0.0)


def test_geo_sql_null_inputs(spark):
    """SQL-tier predicates null-propagate: a NULL geometry (failed
    parse) yields NULL, never false (round-12 self-review — the
    crosses/overlaps ELSE-false arms need the leading NULL guard)."""
    from presto_spark.engine import Engine

    eng = Engine(spark)
    r = eng.sql("""
        SELECT ST_Crosses(a, b) AS c, ST_Overlaps(a, b) AS o,
               ST_Touches(a, b) AS t, ST_Equals(a, b) AS e
        FROM (SELECT ST_GeometryFromText('nonsense') AS a,
                     ST_GeometryFromText('POINT (1 1)') AS b)
    """).collect()[0]
    assert (r.c, r.o, r.t, r.e) == (None, None, None, None)


def test_planar_measures_null_propagate(spark):
    """ST_Area/ST_Length on NULL geometry are NULL, not 0.0 (round 12
    — same null-propagation contract class as the spherical fixes)."""
    df = spark.createDataFrame([(None,)], "wkt string").select(
        geo.st_geometry_from_text(F.col("wkt")).alias("g")).coalesce(1)
    r = df.select(
        geo.st_area(F.col("g")).alias("a"),
        geo.st_length(F.col("g")).alias("ln"),
    ).collect()[0]
    assert r.a is None and r.ln is None


def test_buffer_negative_raises(spark):
    from presto_spark.functions import geo_decompose as gd

    df = spark.createDataFrame(
        [("LINESTRING (0 0, 1 0)",)], "wkt string").select(
        geo.st_geometry_from_text(F.col("wkt")).alias("g")).coalesce(1)
    with pytest.raises(Exception, match="negative"):
        df.select(gd.st_buffer_general(F.col("g"), -1.0)).collect()
    with pytest.raises(Exception, match="NaN"):
        df.select(
            gd.st_buffer_general(F.col("g"), float("nan"))).collect()
    # NULL distance propagates
    rows = df.select(gd.st_buffer_general(
        F.col("g"), F.lit(None).cast("double")).alias("b")).collect()
    assert rows[0].b is None


def test_matrix_relate_reuse(spark):
    """matrix_relate reads a DE-9IM pattern off a materialized matrix
    column, agreeing with pair-level st_relate and sharing its
    NULL/raise contract."""
    import pytest

    df = _geo_df(spark, [
        ("within", "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))",
         "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
    ]).withColumn(
        "m", geo_relate.geometry_relate_matrix(F.col("a"), F.col("b")))
    row = df.select(
        geo_relate.matrix_relate("m", "T*F**F***").alias("mw"),
        geo_relate.st_relate(F.col("a"), F.col("b"),
                             "T*F**F***").alias("pw"),
        geo_relate.matrix_relate(
            "m", F.lit(None).cast("string")).alias("mn"),
    ).collect()[0]
    assert row.mw is True and row.pw is True and row.mn is None
    with pytest.raises(Exception, match="Invalid DE-9IM pattern"):
        df.select(geo_relate.matrix_relate("m", "XXX").alias("v")
                  ).coalesce(1).collect()
