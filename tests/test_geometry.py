"""WKT geometry kernel tests (reference plugin/trino-geospatial
GeoFunctions.java / TestGeoFunctions.java — same predicate semantics:
OGC strict-interior ST_Contains, boundary-inclusive ST_Intersects)."""

from __future__ import annotations

import math

import pytest

from witdb_spark.functions.geometry import _geo_ns

SQ = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
HOLE = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
CONCAVE = "POLYGON ((0 0, 4 0, 4 4, 2 2, 0 4, 0 0))"
MP = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))"


@pytest.fixture(scope="module")
def ns():
    return _geo_ns()


def test_area_perimeter_length(ns):
    assert ns["area"](SQ) == 16.0
    assert ns["area"](HOLE) == 15.0  # holes subtract
    assert ns["area"](CONCAVE) == 12.0
    assert ns["area"](MP) == 1.0
    assert ns["perimeter"](SQ) == 16.0
    assert ns["length"]("LINESTRING (0 0, 3 4, 3 8)") == 9.0
    assert ns["area"]("POLYGON EMPTY") == 0.0


def test_centroid(ns):
    assert ns["centroid"](SQ) == "POINT (2 2)"
    # square c=(2,2) minus unit hole c=(1.5,1.5): (16*2 - 1*1.5)/15
    k, (cx, cy) = ns["parse"](ns["centroid"](HOLE))
    assert abs(cx - 30.5 / 15) < 1e-9 and abs(cy - 30.5 / 15) < 1e-9
    assert ns["centroid"]("LINESTRING (0 0, 0 2)") == "POINT (0 1)"


def test_contains_ogc_semantics(ns):
    assert ns["contains"](SQ, "POINT (2 2)")
    assert not ns["contains"](SQ, "POINT (0 2)")  # boundary is NOT contained
    assert not ns["contains"](SQ, "POINT (9 9)")
    assert not ns["contains"](HOLE, "POINT (1.5 1.5)")  # inside the hole
    assert not ns["contains"](CONCAVE, "POINT (2 3)")  # in the notch
    assert ns["contains"](SQ, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
    assert not ns["contains"](SQ, "POLYGON ((3 3, 5 3, 5 5, 3 5, 3 3))")
    assert ns["contains"](SQ, "LINESTRING (1 1, 3 3)")


def test_intersects(ns):
    assert ns["intersects"](SQ, "POLYGON ((3 3, 5 3, 5 5, 3 5, 3 3))")
    assert not ns["intersects"](SQ, "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))")
    # edge contact counts
    assert ns["intersects"](SQ, "POLYGON ((4 0, 5 0, 5 1, 4 1, 4 0))")
    assert ns["intersects"](SQ, "POINT (0 0)")
    assert ns["intersects"]("LINESTRING (0 0, 4 4)", "LINESTRING (0 4, 4 0)")
    assert not ns["intersects"](
        "LINESTRING (0 0, 1 1)", "LINESTRING (2 2, 3 3)"
    )
    # a polygon fully inside a hole does not touch the outer polygon
    assert not ns["intersects"](
        HOLE, "POLYGON ((1.2 1.2, 1.8 1.2, 1.8 1.8, 1.2 1.8, 1.2 1.2))"
    )


def test_distance(ns):
    assert ns["distance"]("POINT (0 0)", "POINT (3 4)") == 5.0
    assert ns["distance"](SQ, "POINT (7 4)") == 3.0
    assert ns["distance"](SQ, "POINT (2 2)") == 0.0  # inside
    d = ns["distance"]("LINESTRING (0 0, 4 0)", "POINT (2 3)")
    assert abs(d - 3.0) < 1e-12


def test_envelope_bounds_roundtrip(ns):
    assert ns["envelope"]("LINESTRING (1 2, 5 7)") == (
        "POLYGON ((1 2, 5 2, 5 7, 1 7, 1 2))"
    )
    assert ns["bounds"](MP) == (0.0, 0.0, 6.0, 6.0)
    assert ns["emit"](*ns["parse"](MP)) == MP
    assert ns["emit"](*ns["parse"]("MULTIPOINT ((1 2), (3 4))")) == (
        "MULTIPOINT (1 2, 3 4)"
    )


def test_geometry_udfs_in_sql(spark):
    from witdb_spark.functions import register_all

    register_all(spark)
    r = spark.sql(
        "SELECT st_area('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') AS a, "
        "st_contains('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))', 'POINT (1 1)') AS c, "
        "st_astext('POINT (1.0 2.0)') AS t, "
        "st_geometrytype('LINESTRING (0 0, 1 1)') AS g, "
        "st_distance(st_point(0D, 0D), st_point(3D, 4D)) AS d, "
        "st_numpoints('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') AS np, "
        "st_isclosed('LINESTRING (0 0, 1 1, 0 0)') AS ic, "
        "st_isempty('POLYGON EMPTY') AS ie"
    ).collect()[0]
    assert r.a == 16.0
    assert r.c is True
    assert r.t == "POINT (1 2)"
    assert r.g == "ST_LineString"
    assert r.d == 5.0
    assert r.np == 5
    assert r.ic is True
    assert r.ie is True


def test_spatial_triangles_lattice_safe():
    """Build-time invariant behind the spatial_join_contains oracle: no
    integer lattice point may fall exactly on a triangle edge, so strict
    interior tests agree between the WKT kernel and the oracle's sign
    tests. All arithmetic exact in doubles (0.25-grid x integers)."""
    from witdb_spark.queries.spatial import TRIANGLES

    for tri in TRIANGLES:
        for (x1, y1), (x2, y2) in zip(tri, [*tri[1:], tri[0]]):
            for x in range(97):
                for y in range(89):
                    c = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
                    assert c != 0.0 or not (
                        min(x1, x2) <= x <= max(x1, x2)
                        and min(y1, y2) <= y <= max(y1, y2)
                    ), (tri, (x, y))
        (x1, y1), (x2, y2), (x3, y3) = tri
        assert (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1) > 0  # CCW


def test_convex_hull(ns):
    h = ns["convex_hull"]("MULTIPOINT (0 0, 4 0, 4 4, 0 4, 2 2, 1 3)")
    assert ns["area"](h) == 16.0
    assert ns["convex_hull"]("MULTIPOINT (1 1)") == "POINT (1 1)"
    assert ns["convex_hull"]("MULTIPOINT (0 0, 2 2)") == "LINESTRING (0 0, 2 2)"
    # hull of a concave polygon fills the notch
    assert ns["area"](ns["convex_hull"](CONCAVE)) == 16.0


def test_buffer_point(ns):
    out = ns["buffer_geom"]("POINT (3 4)", 2.0)
    # inscribed regular 32-gon area = 0.5 * n * r^2 * sin(2*pi/n)
    want = 0.5 * 32 * 4.0 * math.sin(2 * math.pi / 32)
    assert abs(ns["area"](out) - want) < 1e-9
    assert ns["contains"](out, "POINT (3 4)")
    # r7: polygons buffer too (test_buffer_lines_and_polygons); r8:
    # collections buffer as the union of member buffers — the loud
    # re-scope left is non-positive radii
    with pytest.raises(ValueError):
        ns["buffer_geom"](SQ, -1.0)
    gc_buf = ns["buffer_geom"]("GEOMETRYCOLLECTION (POINT (1 1))", 2.0)
    assert abs(ns["area"](gc_buf) - want) < 1e-9


def test_simplify(ns):
    out = ns["simplify"]("LINESTRING (0 0, 1 0.01, 2 0, 4 2)", 0.1)
    assert out == "LINESTRING (0 0, 2 0, 4 2)"
    # a square ring survives (corners are never within tolerance)
    assert ns["area"](ns["simplify"](SQ, 0.5)) == 16.0


def test_intersection(ns):
    other = "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"
    out = ns["intersection"](SQ, other)
    assert ns["area"](out) == 4.0  # overlap square (2,2)-(4,4)
    # concave subject against convex clip still works (clip side convex)
    out2 = ns["intersection"](CONCAVE, "POLYGON ((0 0, 4 0, 4 1, 0 1, 0 0))")
    assert ns["area"](out2) == 4.0  # bottom strip is fully inside CONCAVE
    # point cases
    assert ns["intersection"]("POINT (1 1)", SQ) == "POINT (1 1)"
    assert ns["intersection"]("POINT (9 9)", SQ) == "POINT EMPTY"
    # disjoint polygons -> empty
    far = "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))"
    assert ns["intersection"](SQ, far) == "POLYGON EMPTY"


def test_union(ns):
    inner = "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"
    assert ns["union_geom"](SQ, inner) == SQ  # containment
    far = "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))"
    u = ns["union_geom"](SQ, far)
    assert u.startswith("MULTIPOLYGON") and ns["area"](u) == 17.0
    assert ns["union_geom"]("POINT (1 1)", "POINT (2 2)") == "MULTIPOINT (1 1, 2 2)"
    # overlapping polygons union via the G-H clipper (r4): 16+16-4
    u = ns["union_geom"](SQ, "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
    assert abs(ns["area"](u) - 28.0) < 1e-9


def test_gh_concave_intersection_and_union(ns):
    """Greiner-Hormann path: concave x concave booleans must satisfy
    inclusion-exclusion: area(A) + area(B) == area(A∪B) + area(A∩B)."""
    # two interlocking L-shapes (both concave, generic position)
    A = "POLYGON ((0 0, 6 0, 6 2.5, 2.5 2.5, 2.5 6, 0 6, 0 0))"
    B = "POLYGON ((1.5 1.5, 7 1.5, 7 7, 4.5 7, 4.5 3.5, 1.5 3.5, 1.5 1.5))"
    inter = ns["intersection"](A, B)
    uni = ns["union_geom"](A, B)
    ia, ua = ns["area"](inter), ns["area"](uni)
    aa, ba = ns["area"](A), ns["area"](B)
    assert ia > 0 and ua > 0
    assert abs((aa + ba) - (ua + ia)) < 1e-9, (aa, ba, ua, ia)
    # intersection is inside both; union contains both sample interiors
    assert ns["contains"](A, ns["centroid"](inter)) or ns["intersects"](A, inter)
    # overlapping convex x convex union (crossing boundaries)
    sq2 = "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"
    u2 = ns["union_geom"](SQ, sq2)
    assert abs(ns["area"](u2) - (16 + 16 - 4)) < 1e-9
    i2 = ns["intersection"](CONCAVE, "POLYGON ((1 1, 3 1, 3 5, 1 5, 1 1))")
    # concave subject vs convex clip still routes through S-H
    assert ns["area"](i2) > 0


def test_gh_union_with_enclosed_hole(ns):
    """Union of two C-shapes that enclose a void: the result must carry
    the void as a HOLE (area = sum - overlap - void)."""
    # C opening right + C opening left, overlapping arms enclosing a void
    C1 = "POLYGON ((0 0, 5 0, 5 1.25, 1.25 1.25, 1.25 3.75, 5 3.75, 5 5, 0 5, 0 0))"
    C2 = "POLYGON ((3.75 -0.5, 5.5 -0.5, 5.5 5.5, 3.75 5.5, 3.75 -0.5))"
    u = ns["union_geom"](C1, C2)
    a1, a2 = ns["area"](C1), ns["area"](C2)
    inter = ns["area"](ns["intersection"](C1, C2))
    got = ns["area"](u)
    assert abs(got - (a1 + a2 - inter)) < 1e-9, (got, a1, a2, inter)
    # the void (1.25..3.75 x 1.25..3.75 up to C2's left wall) is excluded
    assert "(" in u and ns["contains"](u, "POINT (0.5 0.5)")
    assert not ns["contains"](u, "POINT (2.5 2.5)")


def test_gh_degenerate_raises(ns):
    """Degenerate incidences: UNION now resolves them via the snapped
    planar-arrangement fallback (r5, union_many); intersection keeps the
    loud degenerate raise (no arrangement path there yet)."""
    shifted = "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))"  # shares SQ's x=4 edge
    out = ns["union_geom"](SQ, shifted)
    assert abs(ns["area"](out) - 32.0) < 1e-9  # edge dissolves
    touch_vertex = "POLYGON ((4 4, 8 4.5, 7 8, 4 4))"  # touches SQ corner
    out = ns["union_geom"](SQ, touch_vertex)
    assert abs(ns["area"](out) - (16 + ns["area"](touch_vertex))) < 1e-9
    # intersection of edge-sharers: areal result is EMPTY (the shared
    # edge is dimension-1; the kernel's polygon clip is area-exact here)
    assert ns["area"](ns["intersection"](SQ, shifted)) == 0.0


def test_boolean_fallback_degenerate_b(ns):
    """A minus a B that snaps to nothing must be A, not EMPTY (ADVICE r5:
    a sliver polygon collapses to zero rings after 1e-9 snapping)."""
    sliver = "POLYGON ((0 0, 1 0, 1 1e-12, 0 1e-12, 0 0))"
    out = ns["boolean_fallback"](SQ, sliver, "diff")
    assert abs(ns["area"](out) - 16.0) < 1e-9
    # sym with a degenerate B is also A
    assert abs(ns["area"](ns["boolean_fallback"](SQ, sliver, "sym")) - 16.0) < 1e-9
    # intersection with a degenerate B stays empty
    assert ns["boolean_fallback"](SQ, sliver, "int") == "POLYGON EMPTY"


def test_geometry_union_udf_accepts_holes(spark):
    """geometry_union over an array where one polygon has a hole must not
    raise (ADVICE r5 regression: union_many refuses holes — fall back to
    the pairwise fold for that case)."""
    from witdb_spark.functions import register_all

    register_all(spark)
    r = spark.sql(
        "SELECT geometry_union(array("
        f"'{HOLE}', "
        "'POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))')) AS g"
    ).collect()[0]
    assert r.g.startswith("MULTIPOLYGON")
    assert "1 1" in r.g  # the hole ring survives


def test_difference_and_symdifference(ns):
    """ST_Difference / ST_SymDifference: area identities
    area(A) = area(A∩B) + area(A−B); symdiff = A∪B − A∩B."""
    A = "POLYGON ((0 0, 6 0, 6 2.5, 2.5 2.5, 2.5 6, 0 6, 0 0))"
    B = "POLYGON ((1.5 1.5, 7 1.5, 7 7, 4.5 7, 4.5 3.5, 1.5 3.5, 1.5 1.5))"
    ia = ns["area"](ns["intersection"](A, B))
    da = ns["area"](ns["difference"](A, B))
    assert abs(ns["area"](A) - (ia + da)) < 1e-9
    sq2 = "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"
    sd = ns["sym_difference"](SQ, sq2)
    assert abs(ns["area"](sd) - 24.0) < 1e-9  # 16 + 16 - 2*4
    # A containing B -> B becomes a hole of A
    inner = "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"
    holed = ns["difference"](SQ, inner)
    assert ns["area"](holed) == 15.0
    assert not ns["contains"](holed, "POINT (1.5 1.5)")
    # B covering A -> empty; disjoint -> A unchanged
    assert ns["difference"](inner, SQ) == "POLYGON EMPTY"
    far = "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))"
    assert ns["difference"](SQ, far) == SQ


# --- accessor sweep (reference GeoFunctions.java ST_Dimension:480,
# ST_Boundary:1126, ST_PointN:928, ST_Start/EndPoint:1006/1042,
# ST_ExteriorRing:1220, ST_InteriorRingN:970, ST_GeometryN:903,
# ST_Points:1058, ST_IsRing:994, ST_IsSimple:517, ST_IsValid:526,
# line_locate_point:627, line_interpolate_point(s):653/670,
# geometry_nearest_points:1193) ---


def test_dimension_coorddim(ns):
    assert ns["dimension"]("POINT (1 1)") == 0
    assert ns["dimension"]("LINESTRING (0 0, 1 1)") == 1
    assert ns["dimension"](SQ) == 2
    assert ns["coord_dim"](MP) == 2


def test_boundary(ns):
    assert ns["boundary"]("POINT (1 1)") == "MULTIPOINT EMPTY"
    assert ns["boundary"]("LINESTRING (1 1, 2 2, 3 3)") == "MULTIPOINT (1 1, 3 3)"
    # closed line: empty boundary
    assert ns["boundary"]("LINESTRING (0 0, 1 0, 1 1, 0 0)") == "MULTIPOINT EMPTY"
    # mod-2 rule: shared endpoint of two component curves is NOT boundary
    assert (
        ns["boundary"]("MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))")
        == "MULTIPOINT (0 0, 2 2)"
    )
    assert ns["boundary"](SQ) == "LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)"
    k, d = ns["parse"](ns["boundary"](HOLE))
    assert k == "MULTILINESTRING" and len(d) == 2


def test_point_accessors(ns):
    line = "LINESTRING (1 1, 2 2, 3 3)"
    assert ns["point_n"](line, 1) == "POINT (1 1)"
    assert ns["point_n"](line, 3) == "POINT (3 3)"
    assert ns["point_n"](line, 0) is None
    assert ns["point_n"](line, 4) is None
    with pytest.raises(ValueError):
        ns["point_n"](SQ, 1)
    assert ns["start_point"](line) == "POINT (1 1)"
    assert ns["end_point"](line) == "POINT (3 3)"
    assert ns["points_of"](line) == ["POINT (1 1)", "POINT (2 2)", "POINT (3 3)"]
    assert ns["envelope_as_pts"]("LINESTRING (0 5, 3 1)") == [
        "POINT (0 1)",
        "POINT (3 5)",
    ]


def test_ring_accessors(ns):
    assert ns["exterior_ring"](SQ) == "LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)"
    assert ns["num_interior_ring"](SQ) == 0
    assert ns["num_interior_ring"](HOLE) == 1
    assert ns["interior_ring_n"](HOLE, 1) == "LINESTRING (1 1, 2 1, 2 2, 1 2, 1 1)"
    assert ns["interior_ring_n"](HOLE, 2) is None
    assert ns["interior_rings"](HOLE) == ["LINESTRING (1 1, 2 1, 2 2, 1 2, 1 1)"]
    with pytest.raises(ValueError):
        ns["exterior_ring"]("POINT (1 1)")


def test_collection_accessors(ns):
    assert ns["num_geometries"]("POINT (1 1)") == 1
    assert ns["num_geometries"](MP) == 2
    assert ns["num_geometries"]("MULTIPOINT EMPTY") == 0
    assert ns["geometry_n"](MP, 2) == "POLYGON ((5 5, 6 5, 6 6, 5 5))"
    assert ns["geometry_n"]("POINT (1 1)", 1) == "POINT (1 1)"
    assert ns["geometry_n"]("POINT (1 1)", 2) is None
    assert ns["geometries"]("MULTIPOINT (1 2, 3 4)") == ["POINT (1 2)", "POINT (3 4)"]


def test_is_ring_simple_valid(ns):
    assert ns["is_ring"]("LINESTRING (0 0, 2 0, 2 2, 0 2, 0 0)")
    assert not ns["is_ring"]("LINESTRING (0 0, 2 0, 2 2)")
    # figure-eight closed line: closed but not simple
    assert not ns["is_ring"]("LINESTRING (0 0, 2 2, 2 0, 0 2, 0 0)")
    assert ns["is_simple"]("POINT (1 1)")
    assert not ns["is_simple"]("MULTIPOINT (1 1, 1 1)")
    assert ns["is_simple"]("LINESTRING (0 0, 2 2, 4 0)")
    assert not ns["is_simple"]("LINESTRING (0 0, 2 2, 2 0, 0 2)")
    assert ns["is_valid"](SQ) and ns["is_valid"](HOLE)
    bowtie = "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"
    assert not ns["is_valid"](bowtie)
    assert "Self-intersection" in ns["invalid_reason"](bowtie)
    assert ns["invalid_reason"](SQ) is None
    assert "Degenerate" in ns["invalid_reason"]("LINESTRING (1 1, 1 1, 2 2)")
    assert ns["invalid_reason"]("MULTIPOINT (1 1, 1 1)") == "Repeated points"


def test_line_locate_interpolate(ns):
    line = "LINESTRING (0 0, 10 0)"
    assert ns["line_locate_point"](line, "POINT (3 1)") == pytest.approx(0.3)
    assert ns["line_locate_point"](line, "POINT (-5 0)") == 0.0
    assert ns["line_locate_point"](line, "POINT (99 0)") == 1.0
    with pytest.raises(ValueError):
        ns["line_locate_point"](line, SQ)
    assert ns["_line_interpolate"](line, 0.5, False) == ["POINT (5 0)"]
    assert ns["_line_interpolate"](line, 0.0, False) == ["POINT (0 0)"]
    assert ns["_line_interpolate"](line, 1.0, False) == ["POINT (10 0)"]
    assert ns["_line_interpolate"](line, 0.25, True) == [
        "POINT (2.5 0)",
        "POINT (5 0)",
        "POINT (7.5 0)",
        "POINT (10 0)",
    ]
    with pytest.raises(ValueError):
        ns["_line_interpolate"](line, 1.5, False)


def test_nearest_points(ns):
    assert ns["nearest_points"]("POINT (0 0)", "LINESTRING (5 -5, 5 5)") == [
        "POINT (0 0)",
        "POINT (5 0)",
    ]
    p, q = ns["nearest_points"](SQ, "POINT (6 2)")
    assert p == "POINT (4 2)" and q == "POINT (6 2)"
    # crossing geometries: distance-0 witness on both
    p, q = ns["nearest_points"](
        "LINESTRING (0 0, 4 4)", "LINESTRING (0 4, 4 0)"
    )
    assert p == q == "POINT (2 2)"


# --- DE-9IM relate engine (reference ST_Relate:1369, ST_Crosses:1295,
# ST_Disjoint:1310, ST_Equals:1325, ST_Overlaps:1352, ST_Touches:1379) ---


def test_de9im_point_vs_polygon(ns):
    assert ns["de9im"]("POINT (2 2)", SQ) == "0FFFFF212"
    assert ns["de9im"]("POINT (0 2)", SQ) == "F0FFFF212"
    assert ns["de9im"]("POINT (9 9)", SQ) == "FF0FFF212"


def test_touches(ns):
    # shared edge
    assert ns["touches"](SQ, "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))")
    # shared vertex only
    assert ns["touches"](SQ, "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))")
    # interior overlap: not touches
    assert not ns["touches"](SQ, "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
    # line along polygon edge / endpoint-to-endpoint lines
    assert ns["touches"]("LINESTRING (0 0, 4 0)", SQ)
    assert ns["touches"]("LINESTRING (0 0, 2 2)", "LINESTRING (2 2, 4 0)")
    assert ns["touches"]("POINT (0 0)", "LINESTRING (0 0, 2 2)")
    assert not ns["touches"]("POINT (1 1)", "LINESTRING (0 0, 2 2)")


def test_crosses(ns):
    assert ns["crosses"]("LINESTRING (-1 2, 5 2)", SQ)
    assert ns["crosses"]("LINESTRING (-1 2, 2 2)", SQ)  # ends inside
    assert not ns["crosses"]("LINESTRING (1 1, 3 3)", SQ)  # fully inside
    assert ns["crosses"]("LINESTRING (0 0, 4 4)", "LINESTRING (0 4, 4 0)")
    assert not ns["crosses"]("LINESTRING (0 0, 2 2)", "LINESTRING (2 2, 4 0)")
    assert ns["crosses"](SQ, "LINESTRING (-1 2, 5 2)")  # swapped operands


def test_overlaps(ns):
    assert ns["overlaps"](SQ, "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
    assert not ns["overlaps"](SQ, "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))")
    assert not ns["overlaps"](SQ, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
    assert ns["overlaps"]("LINESTRING (0 0, 4 0)", "LINESTRING (2 0, 6 0)")
    assert not ns["overlaps"]("LINESTRING (0 0, 4 0)", "LINESTRING (2 0, 4 0)")
    assert ns["overlaps"]("MULTIPOINT (0 0, 1 1)", "MULTIPOINT (1 1, 2 2)")
    assert not ns["overlaps"](SQ, "LINESTRING (1 1, 3 3)")  # mixed dims


def test_equals_disjoint_relate(ns):
    assert ns["equals_geom"](SQ, "POLYGON ((4 0, 4 4, 0 4, 0 0, 4 0))")
    assert ns["equals_geom"](
        "LINESTRING (0 0, 4 0)", "LINESTRING (0 0, 2 0, 4 0)"
    )
    assert not ns["equals_geom"](SQ, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
    assert ns["disjoint"](SQ, "POINT (9 9)")
    assert not ns["disjoint"](SQ, "POINT (4 4)")
    assert ns["relate"](SQ, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", "T*****FF*")
    assert ns["relate"](SQ, "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))", "FF*F1****")
    with pytest.raises(ValueError):
        ns["relate"](SQ, SQ, "TT")  # bad pattern length
    with pytest.raises(ValueError):
        ns["de9im"](HOLE, SQ)  # holes are unsupported relate operands


# --- codecs + spherical geography (reference ST_AsBinary:386,
# ST_GeomFromBinary:311, to/from_geojson_geometry, EncodedPolyline-
# Functions.java, to_spherical_geography:336, stSphericalDistance:1746,
# stSphericalLength:592, stSphericalArea:1776) ---


def test_wkb_roundtrip(ns):
    geoms = [
        "POINT (1.5 -2.25)",
        "LINESTRING (0 0, 1 1, 2 0)",
        SQ,
        HOLE,
        "MULTIPOINT (1 2, 3 4)",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        MP,
        "POINT EMPTY",
    ]
    for g in geoms:
        back = ns["from_wkb"](ns["to_wkb"](g))
        assert ns["parse"](back)[0] == ns["parse"](g)[0]
        if ns["parse"](g)[1] is not None:
            assert ns["area"](back) == ns["area"](g)
            assert ns["length"](back) == ns["length"](g)
    # known vector: little-endian POINT (1 2)
    assert (
        ns["to_wkb"]("POINT (1 2)").hex()
        == "0101000000000000000000f03f0000000000000040"
    )
    # big-endian input decodes too
    import struct

    be = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 1.0, 2.0)
    assert ns["from_wkb"](be) == "POINT (1 2)"


def test_geojson_roundtrip(ns):
    gj = ns["to_geojson"](SQ)
    assert gj == '{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]]]}'
    assert ns["area"](ns["from_geojson"](gj)) == 16.0
    assert ns["from_geojson"]('{"type":"Point","coordinates":[1.5,2]}') == "POINT (1.5 2)"
    with pytest.raises(ValueError):
        ns["from_geojson"]('{"type":"Feature"}')


def test_encoded_polyline(ns):
    # the documented example from the public polyline algorithm spec
    line = "LINESTRING (-120.2 38.5, -120.95 40.7, -126.453 43.252)"
    enc = ns["to_polyline"](line)
    assert enc == "_p~iF~ps|U_ulLnnqC_mqNvxq`@"
    assert ns["from_polyline"](enc) == line
    with pytest.raises(ValueError):
        ns["to_polyline"](SQ)


def test_spherical_geography(ns):
    assert ns["to_spherical"]("POINT (10 50)") == "POINT (10 50)"
    with pytest.raises(ValueError):
        ns["to_spherical"]("POINT (200 0)")
    with pytest.raises(ValueError):
        ns["to_spherical"]("POINT (0 99)")
    # Boston -> Chicago ~ 1366 km
    d = ns["spherical_distance"](
        "POINT (-71.0589 42.3601)", "POINT (-87.6298 41.8781)"
    )
    assert abs(d - 1_366_000) < 10_000
    with pytest.raises(ValueError):
        ns["spherical_distance"]("LINESTRING (0 0, 1 1)", "POINT (0 0)")
    # one degree of longitude at the equator ~ 111.2 km
    assert abs(ns["spherical_length"]("LINESTRING (0 0, 1 0)") - 111_195) < 500
    # 1x1 degree cell at the equator ~ 12,308 km^2; holes subtract
    a = ns["spherical_area"]("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert abs(a - 12.308e9) < 1e9
    hole = (
        "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0),"
        " (0.5 0.5, 1 0.5, 1 1, 0.5 1, 0.5 0.5))"
    )
    assert ns["spherical_area"](hole) < ns["spherical_area"](
        "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    )


# --- Bing tiles over geometries (reference BingTileFunctions.java
# bing_tile_polygon:337, bing_tiles_around radius:202,
# geometry_to_bing_tiles:347) ---


def test_bing_tile_polygon(ns):
    # zoom 1, tile (0,0): north-west quadrant of the Web-Mercator world
    p = ns["bing_tile_polygon"](ns["_bing_encode"](0, 0, 1))
    b = ns["bounds"](p)
    assert b[0] == -180 and abs(b[2]) < 1e-9
    assert abs(b[1]) < 1e-9 and abs(b[3] - 85.05112878) < 1e-6


def test_bing_tiles_around_radius(ns):
    f = ns["bing_tiles_around_radius"]
    for (lat, lon, zoom, r) in [(30.12, 60, 10, 100), (0, 0, 9, 250)]:
        tiles = f(lat, lon, zoom, r)
        assert len(tiles) == len(set(tiles))
        # every point on the circle rim lands in a returned tile
        for bearing in range(0, 360, 10):
            plat, plon = ns["_gc_destination"](lat, lon, r * 0.98, bearing)
            x, y = ns["_lat_lon_to_tile_xy"](plat, plon, zoom)
            assert ns["_bing_encode"](x, y, zoom) in tiles
    with pytest.raises(ValueError):
        f(0, 0, 9, 2000)  # radius cap 1000 km
    with pytest.raises(ValueError):
        f(0, 0, 99, 10)  # zoom cap


def test_geometry_to_bing_tiles(ns):
    f = ns["geometry_to_bing_tiles"]
    pt = f("POINT (60 30.12)", 10)
    assert len(pt) == 1
    assert ns["_bing_decode"](pt[0])[:2] == ns["_lat_lon_to_tile_xy"](
        30.12, 60, 10
    )
    tri = f("POLYGON ((0 0, 40 0, 0 40, 0 0))", 4)
    box = f("POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0))", 4)
    # the triangle's cover is a strict subset of its bounding box's
    assert set(tri) < set(box)
    # every tile in the cover intersects the triangle
    for t in tri:
        assert ns["intersects"](
            ns["bing_tile_polygon"](t), "POLYGON ((0 0, 40 0, 0 40, 0 0))"
        )
    with pytest.raises(ValueError):
        f("POINT (0 89)", 4)  # beyond Web-Mercator latitude span


def test_convex_hull_agg(spark, ns):
    """reference plugin/trino-geospatial ConvexHullAggregation: two-stage
    salted partial-hull fold (hull-of-hulls == hull)."""
    from witdb_spark.operators.spatial_join import convex_hull_agg

    rows = [("a", f"POINT ({x} {y})") for x in range(5) for y in range(5)]
    rows += [("b", "LINESTRING (0 0, 1 1)"), ("b", "POINT (2 0)")]
    df = spark.createDataFrame(rows, ["k", "g"])
    r = {
        row["k"]: row["hull"]
        for row in convex_hull_agg(df, ["k"], "g").collect()
    }
    assert ns["area"](r["a"]) == 16.0
    assert ns["parse"](r["b"])[0] == "POLYGON" and ns["area"](r["b"]) == 1.0
    # degenerate groups: single point, collinear points
    df2 = spark.createDataFrame(
        [("p", "POINT (1 1)"), ("l", "POINT (0 0)"), ("l", "POINT (2 2)")],
        ["k", "g"],
    )
    r2 = {
        row["k"]: row["hull"]
        for row in convex_hull_agg(df2, ["k"], "g").collect()
    }
    assert r2["p"] == "POINT (1 1)"
    assert ns["parse"](r2["l"])[0] == "LINESTRING"


def test_geometrycollection_read_surface(ns):
    """r4: GEOMETRYCOLLECTION parse/emit, accessors, summed
    measurements, WKB/GeoJSON round-trips; predicates and booleans keep
    raising (heterogeneous operand semantics are out of kernel scope)."""
    gc = (
        "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 3 4),"
        " POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))"
    )
    k, d = ns["parse"](gc)
    assert k == "GEOMETRYCOLLECTION" and len(d) == 3
    assert ns["emit"](k, d) == gc
    assert ns["area"](gc) == 4.0
    assert ns["length"](gc) == 5.0
    assert ns["perimeter"](gc) == 8.0
    assert ns["dimension"](gc) == 2
    assert ns["bounds"](gc) == (0, 0, 3, 4)
    assert ns["num_geometries"](gc) == 3
    assert ns["geometry_n"](gc, 2) == "LINESTRING (0 0, 3 4)"
    assert ns["geometries"](gc)[0] == "POINT (1 2)"
    assert len(ns["points_of"](gc)) == 8
    back = ns["from_wkb"](ns["to_wkb"](gc))
    assert ns["parse"](back)[0] == "GEOMETRYCOLLECTION"
    assert ns["area"](back) == 4.0
    gj = ns["to_geojson"](gc)
    assert '"GeometryCollection"' in gj
    assert ns["area"](ns["from_geojson"](gj)) == 4.0
    # r8: intersects accepts ANY GC (exact any-member distribution);
    # contains accepts polygonal GCs (dissolve) and GC right operands
    # (all-member), but a MIXED-dimension GC as the LEFT areal operand
    # still raises (its interior is not the polygonal dissolve in
    # general); de9im (and ST_Relate on it) keeps the documented raise.
    assert ns["intersects"](gc, gc)
    assert ns["contains"](SQ, gc)  # every member inside the 4x4 square
    with pytest.raises(ValueError):
        ns["contains"](gc, "POINT (1 1)")
    with pytest.raises(ValueError):
        ns["de9im"](gc, gc)


def test_union_many_arrangement():
    """r5 snapped planar-arrangement union (union_many): the degenerate
    incidences the pairwise clipper refuses — shared edges, vertex-on-
    edge, corner touches — plus hole formation and full tilings."""
    from witdb_spark.functions.geometry import _geo_ns

    ns = _geo_ns()
    um, area, parse = ns["union_many"], ns["area"], ns["parse"]
    sq = lambda x, y: (  # noqa: E731
        f"POLYGON (({x} {y}, {x+1} {y}, {x+1} {y+1}, {x} {y+1}, {x} {y}))"
    )
    # shared edge dissolves
    assert area(um([sq(0, 0), sq(1, 0)])) == 2.0
    # identical inputs idempotent
    assert area(um([sq(0, 0), sq(0, 0)])) == 1.0
    # disjoint -> MULTIPOLYGON, additive area
    u = um([sq(0, 0), sq(5, 5)])
    assert parse(u)[0] == "MULTIPOLYGON" and area(u) == 2.0
    # corner touch stays two shells
    u = um([sq(0, 0), sq(1, 1)])
    assert parse(u)[0] == "MULTIPOLYGON" and area(u) == 2.0
    # 3x3 ring of cells -> polygon with a hole, area 8
    donut = um(
        [sq(x, y) for x in range(3) for y in range(3) if (x, y) != (1, 1)]
    )
    k, d = parse(donut)
    assert k == "POLYGON" and len(d) == 2 and area(donut) == 8.0
    # proper overlap via inclusion-exclusion
    a = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    b = "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"
    assert area(um([a, b])) == 7.0
    # vertex-on-edge
    tri = "POLYGON ((1 0.5, 2 0, 2 1, 1 0.5))"
    assert area(um([sq(0, 0), tri])) == 1.5
    # full 6x6 tiling dissolves to one square
    u = um([sq(x, y) for x in range(6) for y in range(6)])
    k, d = parse(u)
    assert k == "POLYGON" and len(d) == 1 and area(u) == 36.0
    # ST_Union pair fallback now routes shared edges through union_many
    assert area(ns["union_geom"](sq(0, 0), sq(1, 0))) == 2.0
    # r6: hole-bearing inputs are accepted — a plug exactly filling the
    # hole dissolves it (area 80 + 1 -> single 81-area ring)
    holed = "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (4 4, 5 4, 5 5, 4 5, 4 4))"
    plugged = um([holed, sq(4, 4)])
    k, d = parse(plugged)
    assert k == "POLYGON" and len(d) == 1 and area(plugged) == 81.0
    # a partial plug leaves the uncovered half of the hole open
    half_plug = "POLYGON ((4 4, 5 4, 5 4.5, 4 4.5, 4 4))"
    part = um([holed, half_plug])
    k, d = parse(part)
    assert k == "POLYGON" and len(d) == 2 and area(part) == 80.5
    # hole surviving untouched: disjoint extra square keeps the hole
    both = um([holed, sq(20, 20)])
    k, d = parse(both)
    assert k == "MULTIPOLYGON" and area(both) == 81.0
    # loud re-scope retained: non-areal inputs still raise
    import pytest

    with pytest.raises(ValueError):
        um(["LINESTRING (0 0, 1 1)"])


def test_boolean_fallback_degenerate_incidence():
    """r5: intersection/difference/symdifference with shared edges /
    vertex-on-edge route through the snapped arrangement instead of
    raising (areal semantics — dimension-collapsed pieces are dropped)."""
    from witdb_spark.functions.geometry import _geo_ns

    ns = _geo_ns()
    area = ns["area"]
    A = "POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))"
    B = "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))"  # right half, 3 shared edges
    d = ns["difference"](A, B)
    assert area(d) == 1.0
    k, rings = ns["parse"](d)
    assert k == "POLYGON" and len(rings) == 1  # clean left half, no hole
    # symdifference of edge-sharing squares: both squares, edge dissolved
    sq = lambda x, y: (  # noqa: E731
        f"POLYGON (({x} {y}, {x+1} {y}, {x+1} {y+1}, {x} {y+1}, {x} {y}))"
    )
    assert area(ns["sym_difference"](sq(0, 0), sq(1, 0))) == 2.0
    # concave x concave with coincident-vertex incidence
    c1 = "POLYGON ((0 0, 4 0, 4 4, 2 2, 0 4, 0 0))"
    c2 = "POLYGON ((0 2, 4 2, 4 6, 2 4, 0 6, 0 2))"
    assert area(ns["intersection"](c1, c2)) == 4.0
    # strict containment still takes the exact hole-punch path
    inner = "POLYGON ((0.5 0.25, 1 0.25, 1 0.75, 0.5 0.75, 0.5 0.25))"
    assert area(ns["difference"](A, inner)) == 1.75


def test_buffer_lines_and_polygons():
    """r7: ST_Buffer covers lines and polygons via the snapped-
    arrangement union of edge capsules (reference GeoFunctions.java
    stBuffer). Properties: closed-form areas within the inscribed-
    polygon tolerance, buffer contains the input, monotone in radius,
    holes shrink."""
    import math

    from witdb_spark.functions.geometry import _geo_ns

    ns = _geo_ns()
    buf, area, parse = ns["buffer_geom"], ns["area"], ns["parse"]
    contains = ns["contains"]
    mgon = lambda r: 8 * r * r * math.sin(math.pi / 8)  # noqa: E731

    # straight line: capsule area = 2*r*L + join 16-gon
    for L, r in [(4, 1.0), (7, 0.5), (2, 0.25)]:
        w = buf(f"LINESTRING (0 0, {L} 0)", r)
        assert parse(w)[0] == "POLYGON"
        assert abs(area(w) - (2 * r * L + mgon(r))) < 1e-6
    # bent line: same closed form (convex right-angle joins contribute
    # exactly the quarter arcs that sum with the caps to one 16-gon...
    # plus the extra quarter at the bend, already inside the rects'
    # union only partially) -- assert bounds instead of equality
    w2 = buf("LINESTRING (0 0, 4 0, 4 4)", 0.5)
    assert 2 * 0.5 * 8 < area(w2) < 2 * 0.5 * 8 + math.pi * 0.25 + 1e-6
    # rectangle: area + perimeter*r + one join 16-gon
    for wd, ht, r in [(1, 1, 1.0), (3, 2, 0.5)]:
        p = buf(
            f"POLYGON ((0 0, {wd} 0, {wd} {ht}, 0 {ht}, 0 0))", r
        )
        assert abs(
            area(p) - (wd * ht + 2 * r * (wd + ht) + mgon(r))
        ) < 1e-6
        # buffer contains the input's corners and centroid
        assert contains(p, f"POINT ({wd/2} {ht/2})")
        assert contains(p, f"POINT (-{r*0.7} -{r*0.7})")
    # monotone in radius
    g = "POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))"
    areas = [area(buf(g, r)) for r in (0.25, 0.5, 1.0, 2.0)]
    assert areas == sorted(areas) and len(set(areas)) == 4
    # holed polygon: shell grows, hole shrinks (but survives)
    hp = buf(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
        " (3 3, 7 3, 7 7, 3 7, 3 3))",
        0.5,
    )
    k, rings = parse(hp)
    assert k == "POLYGON" and len(rings) == 2
    assert abs(area(hp) - (100 + 4 * 10 * 0.5 + mgon(0.5) - 9)) < 1e-6
    # big radius swallows the hole entirely
    hp2 = buf(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
        " (4 4, 6 4, 6 6, 4 6, 4 4))",
        1.5,
    )
    k2, rings2 = parse(hp2)
    assert k2 == "POLYGON" and len(rings2) == 1
    # multilinestring unions disjoint capsules
    ml = buf("MULTILINESTRING ((0 0, 2 0), (10 10, 12 10))", 0.5)
    assert parse(ml)[0] == "MULTIPOLYGON"
    assert abs(area(ml) - 2 * (2 * 0.5 * 2 + mgon(0.5))) < 1e-6


def test_geometrycollection_operands(ns):
    """r8: GEOMETRYCOLLECTION as predicate/boolean/buffer operand
    (reference GeoFunctions.java flattens GC members for ST_Union).
    Predicates distribute exactly; areal booleans dissolve the GC to
    its polygonal union first; buffer unions member buffers; mixed-
    dimension GC as an AREAL operand raises loudly."""
    area, parse = ns["area"], ns["parse"]
    gc = (
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)),"
        " POLYGON ((0.5 0, 1.5 0, 1.5 1, 0.5 1, 0.5 0)))"
    )
    sq = "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))"
    # union: GC dissolves to [0,1.5]x[0,1] (area 1.5), + [1,2]x[0,1]
    assert abs(area(ns["union_geom"](gc, sq)) - 2.0) < 1e-9
    assert abs(area(ns["union_geom"](sq, gc)) - 2.0) < 1e-9
    # GC union area == union of parts (the dissolve is real, not a sum)
    assert abs(area(ns["_gc_as_polygonal"](gc, "t")) - 1.5) < 1e-9
    # booleans against the dissolved union
    assert abs(area(ns["intersection"](gc, sq)) - 0.5) < 1e-9
    assert abs(area(ns["difference"](gc, sq)) - 1.0) < 1e-9
    assert abs(area(ns["difference"](sq, gc)) - 0.5) < 1e-9
    assert abs(area(ns["sym_difference"](gc, sq)) - 1.5) < 1e-9
    # predicates: intersects distributes (any member), contains-right
    # requires every member, contains-left dissolves first
    assert ns["intersects"](gc, "POINT (0.25 0.5)")
    assert not ns["intersects"](gc, "POINT (5 5)")
    assert ns["contains"]("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", gc)
    assert not ns["contains"](sq, gc)
    assert ns["contains"](gc, "POINT (0.75 0.5)")
    # a point NEITHER member contains alone but the union does not
    # cover either — boundary point between members is still contained
    assert ns["contains"](gc, "POINT (0.5 0.5)")
    # buffer: union of member buffers, any member kinds
    mixed = "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 3 0))"
    mgon = lambda r: 8 * r * r * math.sin(math.pi / 8)  # noqa: E731
    buf = ns["buffer_geom"](mixed, 0.5)
    # capsule 2*r*L + join 16-gon dominates; the point's 32-gon circle
    # at the line's start is swallowed up to approximation slack
    assert abs(area(buf) - (2 * 0.5 * 3 + mgon(0.5))) < 0.02
    # nested GC flattens recursively
    nested = (
        "GEOMETRYCOLLECTION (GEOMETRYCOLLECTION"
        " (POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))))"
    )
    assert abs(area(ns["union_geom"](nested, sq)) - 2.0) < 1e-9
    # union_many accepts GC members directly (geometry_union aggregate)
    assert abs(area(ns["union_many"]([gc, sq])) - 2.0) < 1e-9
    # empty collection: union identity, never intersects
    assert area(ns["union_geom"]("GEOMETRYCOLLECTION EMPTY", sq)) == 1.0
    assert not ns["intersects"]("GEOMETRYCOLLECTION EMPTY", sq)
    # mixed-dimension GC as an AREAL operand raises loudly
    with pytest.raises(ValueError):
        ns["union_geom"](mixed, sq)
    with pytest.raises(ValueError):
        ns["intersection"](mixed, sq)
