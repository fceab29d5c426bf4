"""Planar geometry functions over WKT (reference plugin/trino-geospatial
GeoFunctions.java — 75 ST_* functions backed by Esri Geometry; here a
pure-Python computational-geometry core over WKT strings).

Representation: a geometry IS its WKT text (POINT / MULTIPOINT /
LINESTRING / MULTILINESTRING / POLYGON / MULTIPOLYGON, holes supported).
WKT-as-varchar keeps geometries serializable, shuffle-friendly, and
directly comparable across engines; all functions are Arrow-batched pandas
UDFs whose bodies exec one shared source blob (executors can't import
witdb_spark), so the parser exists once.

Implemented (Trino names, same semantics):
  ST_GeometryFromText, ST_AsText, ST_GeometryType, ST_Point, ST_X, ST_Y,
  ST_Area (holes subtract), ST_Length, ST_Perimeter, ST_Centroid,
  ST_Envelope, ST_XMin/ST_XMax/ST_YMin/ST_YMax, ST_NumPoints, ST_IsClosed,
  ST_IsEmpty, ST_Contains, ST_Within, ST_Intersects, ST_Distance,
  ST_ConvexHull, ST_Simplify (Douglas-Peucker), ST_Buffer (point n-gon),
  ST_Intersection / ST_Union / ST_Difference / ST_SymDifference (convex
  clips via Sutherland-Hodgman; concave x concave via a Greiner-Hormann
  clipper in generic position, with enclosed voids classified as holes).

Accessor sweep (r4): ST_Dimension, ST_CoordDim, ST_Boundary (OGC mod-2
  curve rule), ST_PointN, ST_StartPoint/ST_EndPoint, ST_ExteriorRing,
  ST_InteriorRingN/ST_InteriorRings/ST_NumInteriorRing, ST_GeometryN /
  ST_NumGeometries / ST_Geometries, ST_Points, ST_EnvelopeAsPts,
  ST_IsRing / ST_IsSimple / ST_IsValid / geometry_invalid_reason (reason
  strings follow the reference's NON_SIMPLE_REASONS), line_locate_point,
  line_interpolate_point(s), geometry_nearest_points (returned as a
  2-element array in place of the reference's row type), ST_LineFromText,
  ST_Polygon, ST_LineString / ST_MultiPoint (from point arrays),
  geometry_union (array fold), simplify_geometry.

DE-9IM relate engine (r4): de9im() computes the 3x3 intersection-
  dimension matrix directly from the finite representations (split-
  midpoint classification, collinear-overlap arcs, crossing witnesses);
  ST_Relate matches T/F/*/0/1/2 masks, and ST_Crosses / ST_Disjoint /
  ST_Equals / ST_Overlaps / ST_Touches are the standard mask
  specializations. Polygon operands of relate must be hole-free (the
  exterior-cell witness argument needs a simply-connected complement);
  holes raise.

GEOMETRYCOLLECTION (r4 read, r8 operate): full read surface —
  parse/emit (members as recursive (kind, data) pairs), component
  accessors, summed measurements, max-dimension, bounds, WKB code 7
  and GeoJSON GeometryCollection codecs. r8 (reference
  GeoFunctions.java flattens GC members for ST_Union): ST_Intersects
  distributes over members exactly (any kind); ST_Contains accepts GC
  right operands (all-member) and polygonal-GC left operands
  (dissolved through union_many first); the booleans
  union/intersection/difference/sym dissolve polygonal GCs through
  the snapped arrangement; ST_Buffer unions member buffers (any
  member kind — buffering distributes over union). MIXED-dimension
  GCs as AREAL operands and GC operands of relate/de9im raise.

Codecs + spherical geography (r4): ST_AsBinary / ST_GeomFromBinary
  (OGC WKB, both byte orders on read), to/from_geojson_geometry,
  to/from_encoded_polyline (Google polyline, 1e-5 precision),
  to_spherical_geography / to_geometry (lat/lon-validated WKT), and the
  spherical measurements st_spherical_distance / st_spherical_length /
  st_spherical_area (reference overloads ST_Distance/Length/Area by the
  SphericalGeography operand type; a single-namespace registry cannot,
  so they carry distinct names — EARTH_RADIUS_KM matches at 6371.01 and
  the area is the reference's bearing-walk spherical excess with the
  enclosed-pole correction).

DE-9IM semantics notes: ST_Contains follows the OGC rule — a boundary
point is NOT contained (ray-cast interior test); polygon/polygon
containment = every vertex of B inside-or-on A, no proper edge crossings,
and at least one interior vertex. ST_Intersects counts boundary contact.
Degenerate boolean incidence (shared edges, vertex-on-edge) and polygons
with holes route through the snapped planar arrangement (r5/r6);
buffers cover points, lines, polygons (r7 — Minkowski sums with
sampled round joins) and collections (r8 — union of member buffers).
GEOMETRYCOLLECTION operands of the booleans dissolve to their
polygonal union; mixed-dimension GCs as areal operands raise —
registry.UNSUPPORTED records the reasoning.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

_GEO_SRC = r'''
import json as _json
import math
import re as _re
import struct as _struct

_NUM = r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?"


def _pts(text):
    """Parse 'x1 y1, x2 y2, ...' into [(x, y), ...]."""
    out = []
    for pair in text.split(","):
        xy = pair.split()
        if len(xy) != 2:
            raise ValueError("bad coordinate pair: %r" % pair)
        out.append((float(xy[0]), float(xy[1])))
    return out


def _rings(text):
    """Parse '(r1), (r2), ...' ring lists of a polygon body."""
    rings, depth, start = [], 0, None
    for i, c in enumerate(text):
        if c == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                rings.append(_pts(text[start:i]))
    return rings


def parse(s):
    """WKT -> (kind, data). kind in POINT/MULTIPOINT/LINESTRING/
    MULTILINESTRING/POLYGON/MULTIPOLYGON; EMPTY -> (kind, None)."""
    if s is None:
        return None
    t = s.strip()
    m = _re.match(r"^(\w+)\s*(.*)$", t, _re.S)
    if not m:
        raise ValueError("bad WKT: %r" % s)
    kind = m.group(1).upper()
    body = m.group(2).strip()
    if body.upper() == "EMPTY":
        return (kind, None)
    if not (body.startswith("(") and body.endswith(")")):
        raise ValueError("bad WKT body: %r" % s)
    inner = body[1:-1].strip()
    if kind == "POINT":
        return (kind, _pts(inner)[0])
    if kind in ("LINESTRING", "MULTIPOINT"):
        # MULTIPOINT accepts both (1 2, 3 4) and ((1 2), (3 4))
        if kind == "MULTIPOINT" and "(" in inner:
            return (kind, [r[0] for r in _rings(inner)])
        return (kind, _pts(inner))
    if kind == "POLYGON":
        return (kind, _rings(inner))
    if kind == "MULTILINESTRING":
        return (kind, _rings(inner))
    if kind == "MULTIPOLYGON":
        polys, depth, start = [], 0, None
        for i, c in enumerate(inner):
            if c == "(":
                if depth == 0:
                    start = i
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    polys.append(_rings(inner[start + 1 : i]))
        return (kind, polys)
    if kind == "GEOMETRYCOLLECTION":
        # data = list of (kind, data) member pairs; split the body at
        # top-level commas and recurse
        parts, depth, start = [], 0, 0
        for i, c in enumerate(inner):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 0:
                parts.append(inner[start:i])
                start = i + 1
        parts.append(inner[start:])
        return (kind, [parse(p.strip()) for p in parts if p.strip()])
    raise ValueError("unsupported WKT type: %r" % kind)


def _fmt(v):
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return format(v, ".12g")


def _emit_pts(pts):
    return ", ".join("%s %s" % (_fmt(x), _fmt(y)) for x, y in pts)


def emit(kind, data):
    if data is None:
        return "%s EMPTY" % kind
    if kind == "POINT":
        return "POINT (%s %s)" % (_fmt(data[0]), _fmt(data[1]))
    if kind in ("LINESTRING", "MULTIPOINT"):
        return "%s (%s)" % (kind, _emit_pts(data))
    if kind in ("POLYGON", "MULTILINESTRING"):
        return "%s (%s)" % (
            kind,
            ", ".join("(%s)" % _emit_pts(r) for r in data),
        )
    if kind == "MULTIPOLYGON":
        return "MULTIPOLYGON (%s)" % ", ".join(
            "(%s)" % ", ".join("(%s)" % _emit_pts(r) for r in rings)
            for rings in data
        )
    if kind == "GEOMETRYCOLLECTION":
        return "GEOMETRYCOLLECTION (%s)" % ", ".join(
            emit(ck, cd) for ck, cd in data
        )
    raise ValueError(kind)


def _ring_area2(ring):
    """Twice the signed shoelace area."""
    s = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s


def _poly_area(rings):
    if not rings:
        return 0.0
    a = abs(_ring_area2(rings[0])) / 2.0
    for hole in rings[1:]:
        a -= abs(_ring_area2(hole)) / 2.0
    return a


def area(s):
    kind, data = parse(s)
    if data is None:
        return 0.0
    if kind == "POLYGON":
        return _poly_area(data)
    if kind == "MULTIPOLYGON":
        return sum(_poly_area(p) for p in data)
    if kind == "GEOMETRYCOLLECTION":
        return sum(area(emit(ck, cd)) for ck, cd in data)
    return 0.0


def _path_len(pts):
    return sum(
        math.hypot(pts[i + 1][0] - pts[i][0], pts[i + 1][1] - pts[i][1])
        for i in range(len(pts) - 1)
    )


def length(s):
    kind, data = parse(s)
    if data is None:
        return 0.0
    if kind == "LINESTRING":
        return _path_len(data)
    if kind == "MULTILINESTRING":
        return sum(_path_len(p) for p in data)
    if kind == "GEOMETRYCOLLECTION":
        return sum(length(emit(ck, cd)) for ck, cd in data)
    return 0.0


def perimeter(s):
    kind, data = parse(s)
    if data is None:
        return 0.0
    if kind == "POLYGON":
        return sum(_path_len(r + r[:1]) if r[0] != r[-1] else _path_len(r) for r in data)
    if kind == "MULTIPOLYGON":
        return sum(perimeter(emit("POLYGON", p)) for p in data)
    if kind == "GEOMETRYCOLLECTION":
        return sum(perimeter(emit(ck, cd)) for ck, cd in data)
    return 0.0


def _all_points(kind, data):
    if data is None:
        return []
    if kind == "POINT":
        return [data]
    if kind in ("LINESTRING", "MULTIPOINT"):
        return list(data)
    if kind in ("POLYGON", "MULTILINESTRING"):
        return [p for r in data for p in r]
    if kind == "MULTIPOLYGON":
        return [p for poly in data for r in poly for p in r]
    if kind == "GEOMETRYCOLLECTION":
        return [p for ck, cd in data for p in _all_points(ck, cd)]
    return []


def bounds(s):
    kind, data = parse(s)
    pts = _all_points(kind, data)
    if not pts:
        return None
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return (min(xs), min(ys), max(xs), max(ys))


def envelope(s):
    b = bounds(s)
    if b is None:
        kind, _ = parse(s)
        return "%s EMPTY" % kind
    x0, y0, x1, y1 = b
    return emit("POLYGON", [[(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]])


def centroid(s):
    kind, data = parse(s)
    if data is None:
        return None
    if kind == "POINT":
        return emit("POINT", data)
    if kind == "MULTIPOINT":
        n = len(data)
        return emit(
            "POINT",
            (sum(p[0] for p in data) / n, sum(p[1] for p in data) / n),
        )
    if kind in ("LINESTRING", "MULTILINESTRING"):
        paths = [data] if kind == "LINESTRING" else data
        sx = sy = sl = 0.0
        for pts in paths:
            for i in range(len(pts) - 1):
                seg = math.hypot(
                    pts[i + 1][0] - pts[i][0], pts[i + 1][1] - pts[i][1]
                )
                sx += (pts[i][0] + pts[i + 1][0]) / 2.0 * seg
                sy += (pts[i][1] + pts[i + 1][1]) / 2.0 * seg
                sl += seg
        if sl == 0.0:
            return emit("POINT", paths[0][0])
        return emit("POINT", (sx / sl, sy / sl))
    if kind in ("POLYGON", "MULTIPOLYGON"):
        polys = [data] if kind == "POLYGON" else data
        # area-weighted sum of per-ring centroids; holes weigh negative.
        # ring centroid = (sum((x1+x2)*cross) / (3*a2), ...) — orientation
        # cancels, so only the outer/hole role sets the weight sign.
        sx = sy = sw = 0.0
        for rings in polys:
            for ri, ring in enumerate(rings):
                a2 = _ring_area2(ring)
                if a2 == 0.0:
                    continue
                cx = cy = 0.0
                n = len(ring)
                for i in range(n):
                    x1, y1 = ring[i]
                    x2, y2 = ring[(i + 1) % n]
                    cross = x1 * y2 - x2 * y1
                    cx += (x1 + x2) * cross
                    cy += (y1 + y2) * cross
                w = abs(a2) / 2.0 * (1.0 if ri == 0 else -1.0)
                sx += w * (cx / (3.0 * a2))
                sy += w * (cy / (3.0 * a2))
                sw += w
        if sw == 0.0:
            return emit("POINT", polys[0][0][0])
        return emit("POINT", (sx / sw, sy / sw))
    return None


def _point_in_ring(p, ring):
    """0 = outside, 1 = inside, 2 = on boundary (even-odd ray cast)."""
    x, y = p
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        # boundary check: collinear + within segment bbox
        cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
        if abs(cross) < 1e-12:
            if min(x1, x2) - 1e-12 <= x <= max(x1, x2) + 1e-12 and min(
                y1, y2
            ) - 1e-12 <= y <= max(y1, y2) + 1e-12:
                return 2
        if (y1 > y) != (y2 > y):
            xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            if x < xin:
                inside = not inside
    return 1 if inside else 0


def _point_in_poly(p, rings):
    """0/1/2 against a polygon with holes."""
    r = _point_in_ring(p, rings[0])
    if r != 1:
        return r
    for hole in rings[1:]:
        h = _point_in_ring(p, hole)
        if h == 2:
            return 2
        if h == 1:
            return 0
    return 1


def _seg_intersect(a, b, c, d, proper_only=False):
    """Do segments ab and cd intersect? proper_only excludes touching."""

    def orient(p, q, r):
        v = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
        if abs(v) < 1e-12:
            return 0
        return 1 if v > 0 else -1

    o1, o2 = orient(a, b, c), orient(a, b, d)
    o3, o4 = orient(c, d, a), orient(c, d, b)
    if o1 != o2 and o3 != o4 and 0 not in (o1, o2, o3, o4):
        return True
    if proper_only:
        return False

    def on_seg(p, q, r):
        return (
            orient(p, q, r) == 0
            and min(p[0], q[0]) - 1e-12 <= r[0] <= max(p[0], q[0]) + 1e-12
            and min(p[1], q[1]) - 1e-12 <= r[1] <= max(p[1], q[1]) + 1e-12
        )

    return (
        on_seg(a, b, c) or on_seg(a, b, d) or on_seg(c, d, a) or on_seg(c, d, b)
    )


def _edges(kind, data):
    if kind == "LINESTRING":
        return [(data[i], data[i + 1]) for i in range(len(data) - 1)]
    if kind == "MULTILINESTRING":
        return [
            (p[i], p[i + 1]) for p in data for i in range(len(p) - 1)
        ]
    if kind == "POLYGON":
        return [
            (r[i], r[(i + 1) % len(r)]) for r in data for i in range(len(r))
        ]
    if kind == "MULTIPOLYGON":
        return [
            (r[i], r[(i + 1) % len(r)])
            for poly in data
            for r in poly
            for i in range(len(r))
        ]
    if kind == "GEOMETRYCOLLECTION":
        return [e for ck, cd in (data or []) for e in _edges(ck, cd)]
    return []


def _gc_flatten(s):
    """Component WKTs of a GEOMETRYCOLLECTION (recursively flattened),
    or None when s is not a collection. r8 (reference
    plugin/trino-geospatial GeoFunctions.java flattens GC members for
    ST_Union): predicates/booleans/buffer accept GC by distributing
    over the flattened components."""
    k, d = parse(s)
    if k != "GEOMETRYCOLLECTION":
        return None
    out = []
    for ck, cd in (d or []):
        w = emit(ck, cd)
        if ck == "GEOMETRYCOLLECTION":
            out.extend(_gc_flatten(w) or [])
        else:
            out.append(w)
    return out


def _gc_as_polygonal(s, who):
    """union_many over a GC's components (all must be polygonal) ->
    POLYGON/MULTIPOLYGON WKT, 'POLYGON EMPTY' for an empty collection.
    Non-polygonal members raise: areal booleans over mixed-dimension
    collections are out of scope (the reference's Esri backend drops
    lower-dimension pieces silently; raising is the honest analog)."""
    comps = _gc_flatten(s)
    for w in comps:
        k, _ = parse(w)
        if k not in ("POLYGON", "MULTIPOLYGON"):
            raise ValueError(
                "%s: GEOMETRYCOLLECTION with non-polygonal member %s "
                "unsupported as an areal operand" % (who, k)
            )
    return union_many(comps) or "POLYGON EMPTY"


def contains(sa, sb):
    """OGC ST_Contains: no point of B in A's exterior, and interiors meet.
    GC right operand distributes (A ⊇ ∪Bᵢ ⇔ ∀i A ⊇ Bᵢ); GC left operand
    is dissolved to its polygonal union first (r8)."""
    ka, da = parse(sa)
    kb, db = parse(sb)
    if ka == "GEOMETRYCOLLECTION":
        return contains(_gc_as_polygonal(sa, "st_contains"), sb)
    if kb == "GEOMETRYCOLLECTION":
        comps = _gc_flatten(sb)
        return bool(comps) and all(contains(sa, w) for w in comps)
    if da is None or db is None:
        return False
    if ka == "POINT":
        return kb == "POINT" and da == db
    if ka in ("POLYGON", "MULTIPOLYGON"):
        polys = [da] if ka == "POLYGON" else da
        pts_b = _all_points(kb, db)
        states = []
        for p in pts_b:
            st = max(_point_in_poly(p, poly) for poly in polys) if polys else 0
            if st == 0:
                return False
            states.append(st)
        if kb == "POINT":
            return states[0] == 1
        # no proper edge crossing may exist
        ea = _edges(ka, da)
        for (c, d) in _edges(kb, db):
            for (a, b) in ea:
                if _seg_intersect(a, b, c, d, proper_only=True):
                    return False
        # B must not cover any of A's holes (r6): with no proper
        # crossings, hole-interior overlap implies some point just
        # inside a hole (probed off each hole-edge midpoint toward the
        # hole's interior) lies strictly inside B while in A's exterior
        if kb in ("POLYGON", "MULTIPOLYGON"):
            import math as _math

            b_polys = [db] if kb == "POLYGON" else db
            for poly in polys:
                for h in poly[1:]:
                    m = len(h)
                    for i in range(m):
                        a, b = h[i], h[(i + 1) % m]
                        dx, dy = b[0] - a[0], b[1] - a[1]
                        ln = _math.hypot(dx, dy)
                        if ln == 0:
                            continue
                        eps = max(1.0, ln) * 1e-7
                        mx, my = (a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0
                        for sgn in (1.0, -1.0):
                            q = (
                                mx - sgn * dy / ln * eps,
                                my + sgn * dx / ln * eps,
                            )
                            if _point_in_ring(q, h) != 1:
                                continue  # not the hole's interior side
                            if max(
                                _point_in_poly(q, bp) for bp in b_polys
                            ) == 1 and max(
                                _point_in_poly(q, ap) for ap in polys
                            ) == 0:
                                return False
        # interiors must meet: some vertex (or midpoint) strictly inside
        cand = pts_b + [
            ((c[0] + d[0]) / 2.0, (c[1] + d[1]) / 2.0)
            for (c, d) in _edges(kb, db)
        ]
        return any(
            max(_point_in_poly(p, poly) for poly in polys) == 1 for p in cand
        )
    raise ValueError("ST_Contains: unsupported left type %s" % ka)


def intersects(sa, sb):
    """ST_Intersects. GC operands distribute exactly — intersects is
    existential over components, so any-component is the precise
    semantics for arbitrary member kinds (r8)."""
    if sa.strip()[:18].upper() == "GEOMETRYCOLLECTION":
        return any(intersects(w, sb) for w in _gc_flatten(sa) or [])
    if sb.strip()[:18].upper() == "GEOMETRYCOLLECTION":
        return any(intersects(sa, w) for w in _gc_flatten(sb) or [])
    ka, da = parse(sa)
    kb, db = parse(sb)
    if da is None or db is None:
        return False
    pa = _all_points(ka, da)
    pb = _all_points(kb, db)
    # any point of one on/in the other
    for kind, data, pts in ((ka, da, pb), (kb, db, pa)):
        if kind in ("POLYGON", "MULTIPOLYGON"):
            polys = [data] if kind == "POLYGON" else data
            for p in pts:
                if max(_point_in_poly(p, poly) for poly in polys) > 0:
                    return True
        elif kind == "POINT":
            for p in pts:
                if abs(p[0] - data[0]) < 1e-12 and abs(p[1] - data[1]) < 1e-12:
                    return True
        elif kind in ("MULTIPOINT",):
            for p in pts:
                for q in data:
                    if abs(p[0] - q[0]) < 1e-12 and abs(p[1] - q[1]) < 1e-12:
                        return True
    # any edge pair touching/crossing
    ea, eb = _edges(ka, da), _edges(kb, db)
    for (a, b) in ea:
        for (c, d) in eb:
            if _seg_intersect(a, b, c, d):
                return True
    # point-on-edge cases
    for (pts, edges) in ((pa, eb), (pb, ea)):
        for p in pts:
            for (a, b) in edges:
                if _seg_intersect(a, b, p, p):
                    return True
    return False


def _pt_seg_dist(p, a, b):
    ax, ay = a
    bx, by = b
    px, py = p
    dx, dy = bx - ax, by - ay
    if dx == 0 and dy == 0:
        return math.hypot(px - ax, py - ay)
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy)))
    return math.hypot(px - (ax + t * dx), py - (ay + t * dy))


def distance(sa, sb):
    ka, da = parse(sa)
    kb, db = parse(sb)
    if da is None or db is None:
        return None
    if intersects(sa, sb):
        return 0.0
    pa, pb = _all_points(ka, da), _all_points(kb, db)
    ea, eb = _edges(ka, da), _edges(kb, db)
    best = math.inf
    for p in pa:
        for q in pb:
            best = min(best, math.hypot(p[0] - q[0], p[1] - q[1]))
        for (c, d) in eb:
            best = min(best, _pt_seg_dist(p, c, d))
    for p in pb:
        for (a, b) in ea:
            best = min(best, _pt_seg_dist(p, a, b))
    return best


def _hull_pts(pts):
    """Andrew monotone chain -> CCW hull (open ring)."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return pts

    def half(seq):
        h = []
        for p in seq:
            while len(h) >= 2 and (
                (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
            ) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(reversed(pts))
    return lower[:-1] + upper[:-1]


def convex_hull(s):
    k, d = parse(s)
    if d is None:
        return emit("POLYGON", None)
    h = _hull_pts(_all_points(k, d))
    if len(h) == 1:
        return emit("POINT", h[0])
    if len(h) == 2:
        return emit("LINESTRING", h)
    return emit("POLYGON", [h + [h[0]]])


def buffer_geom(s, r, n=32):
    """ST_Buffer (reference plugin/trino-geospatial GeoFunctions.java
    stBuffer). Points/multipoints buffer as inscribed n-gon circles.
    Lines and polygons (r7) buffer as the snapped-arrangement UNION of
    per-edge offset rectangles and per-vertex join circles — a Minkowski
    sum with sampled round joins — via union_many. Holes shrink
    correctly: the hole's own edge capsules eat into it. Join circles
    are inscribed n/2-gons, so the boundary is within
    r*(1 - cos(pi/(n/2))) of the exact arc (same class of approximation
    as the n-gon point buffer)."""
    k, d = parse(s)
    if d is None:
        return emit("POLYGON", None)
    if r <= 0:
        raise ValueError("st_buffer: radius must be positive")
    if k == "GEOMETRYCOLLECTION":
        # buffer distributes over union (Minkowski sum of a union is
        # the union of Minkowski sums), so buffer each member — any
        # kind — and dissolve (r8)
        parts = [buffer_geom(w, r, n) for w in _gc_flatten(s) or []]
        return union_many(parts) or emit("POLYGON", None)

    def circle(c, m=n):
        ring = [
            (c[0] + r * math.cos(2 * math.pi * i / m),
             c[1] + r * math.sin(2 * math.pi * i / m))
            for i in range(m)
        ]
        ring.append(ring[0])
        return ring

    if k == "POINT":
        return emit("POLYGON", [circle(d)])
    if k == "MULTIPOINT":
        return emit("MULTIPOLYGON", [[circle(p)] for p in d])

    def capsule_pieces(pts, closed):
        """Per-edge offset rectangles + per-vertex join circles (WKTs)."""
        out = []
        m = len(pts)
        for i in range(m if closed else m - 1):
            a, b = pts[i], pts[(i + 1) % m]
            dx, dy = b[0] - a[0], b[1] - a[1]
            el = math.hypot(dx, dy)
            if el == 0:
                continue
            px, py = -dy / el * r, dx / el * r
            rect = [
                (a[0] + px, a[1] + py), (b[0] + px, b[1] + py),
                (b[0] - px, b[1] - py), (a[0] - px, a[1] - py),
            ]
            rect.append(rect[0])
            out.append(emit("POLYGON", [rect]))
        for p in pts:
            out.append(emit("POLYGON", [circle(p, max(8, n // 2))]))
        return out

    pieces = []
    if k == "LINESTRING":
        pieces = capsule_pieces(d, False)
    elif k == "MULTILINESTRING":
        for line in d:
            pieces.extend(capsule_pieces(line, False))
    elif k in ("POLYGON", "MULTIPOLYGON"):
        for p in ([d] if k == "POLYGON" else list(d)):
            pieces.append(emit("POLYGON", p))
            for ring in p:
                rr = ring[:-1] if ring[0] == ring[-1] else list(ring)
                pieces.extend(capsule_pieces(rr, True))
    else:
        raise ValueError("st_buffer: unsupported kind %r" % k)
    out = union_many(pieces)
    if out is None:
        return emit("POLYGON", None)
    return out


def _dp(pts, tol):
    """Douglas-Peucker, iterative."""
    if len(pts) < 3:
        return list(pts)
    keep = [False] * len(pts)
    keep[0] = keep[-1] = True
    stack = [(0, len(pts) - 1)]
    while stack:
        a, b = stack.pop()
        maxd, idx = -1.0, None
        for i in range(a + 1, b):
            dd = _pt_seg_dist(pts[i], pts[a], pts[b])
            if dd > maxd:
                maxd, idx = dd, i
        if idx is not None and maxd > tol:
            keep[idx] = True
            stack.append((a, idx))
            stack.append((idx, b))
    return [p for p, kf in zip(pts, keep) if kf]


def simplify(s, tol):
    k, d = parse(s)
    if d is None:
        return emit(k, None)
    if k in ("POINT", "MULTIPOINT"):
        return emit(k, d)
    if k == "LINESTRING":
        return emit(k, _dp(d, tol))
    if k == "POLYGON":
        rings = []
        for r in d:
            rr = _dp(r, tol)
            if len(rr) >= 4:
                rings.append(rr)
        return emit(k, rings or None)
    raise ValueError("st_simplify: unsupported kind %r" % k)


def _is_convex_ccw(ring):
    """ring: open CCW point list; True if every turn is left/collinear."""
    m = len(ring)
    for i in range(m):
        a, b, c = ring[i], ring[(i + 1) % m], ring[(i + 2) % m]
        if (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]) < 0:
            return False
    return True


def _open_ccw(ring):
    """Close-stripped, CCW-oriented copy of a WKT ring."""
    r = ring[:-1] if ring[0] == ring[-1] else list(ring)
    if _ring_area2(ring) < 0:
        r = r[::-1]
    return r


def _clip_sh(subject, clip):
    """Sutherland-Hodgman: clip an open subject ring by an open CCW
    CONVEX clip ring."""
    out = list(subject)
    m = len(clip)
    for i in range(m):
        a, b = clip[i], clip[(i + 1) % m]
        if not out:
            break
        inp, out = out, []
        for j in range(len(inp)):
            p, q = inp[j], inp[(j + 1) % len(inp)]
            pin = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= 0
            qin = (b[0] - a[0]) * (q[1] - a[1]) - (b[1] - a[1]) * (q[0] - a[0]) >= 0
            if pin:
                out.append(p)
            if pin != qin:
                x1, y1 = p
                x2, y2 = q
                x3, y3 = a
                x4, y4 = b
                den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
                if den != 0:
                    t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / den
                    out.append((x1 + t * (x2 - x1), y1 + t * (y2 - y1)))
    return out


class _GH:
    """Greiner-Hormann vertex node."""
    __slots__ = ("x", "y", "nxt", "prv", "neighbor", "entry", "inter", "visited")

    def __init__(self, x, y, inter=False):
        self.x, self.y = x, y
        self.nxt = self.prv = self.neighbor = None
        self.entry = False
        self.inter = inter
        self.visited = False


def _gh_ring(pts):
    head = None
    prev = None
    for (x, y) in pts:
        v = _GH(x, y)
        if head is None:
            head = v
        else:
            prev.nxt, v.prv = v, prev
        prev = v
    prev.nxt, head.prv = head, prev
    return head


def _gh_edges(head):
    out = []
    v = head
    while True:
        if not v.inter:
            w = v.nxt
            while w.inter:
                w = w.nxt
            out.append((v, w))
        v = v.nxt
        if v is head:
            return out


def _gh_insert(a, b, v, alpha, alphas):
    """Insert intersection v between original vertices a..b at fraction
    alpha (kept sorted via the alphas side-table keyed by id)."""
    cur = a
    while cur.nxt is not b and alphas.get(id(cur.nxt), -1.0) < alpha:
        cur = cur.nxt
    v.nxt, v.prv = cur.nxt, cur
    cur.nxt.prv = v
    cur.nxt = v
    alphas[id(v)] = alpha


def _gh_clip(subj_pts, clip_pts, mode):
    """Greiner-Hormann boolean op on two simple CCW rings in generic
    position. Returns list of result rings, or None when the rings do not
    cross (caller handles containment/disjoint). Degenerate incidence
    (vertex-on-edge, collinear edge overlap, endpoint touching) raises —
    exactness over silent perturbation."""
    S, C = _gh_ring(subj_pts), _gh_ring(clip_pts)
    alphas_s: dict = {}
    alphas_c: dict = {}
    n_inter = 0
    clip_edges = _gh_edges(C)  # original-vertex edges never change
    for (s1, s2) in _gh_edges(S):
        for (c1, c2) in clip_edges:
            den = (c2.y - c1.y) * (s2.x - s1.x) - (c2.x - c1.x) * (s2.y - s1.y)
            if den == 0.0:
                # parallel: only an overlap is degenerate
                cr = (s1.x - c1.x) * (c2.y - c1.y) - (s1.y - c1.y) * (c2.x - c1.x)
                if cr == 0.0:
                    if max(min(s1.x, s2.x), min(c1.x, c2.x)) <= min(
                        max(s1.x, s2.x), max(c1.x, c2.x)
                    ) and max(min(s1.y, s2.y), min(c1.y, c2.y)) <= min(
                        max(s1.y, s2.y), max(c1.y, c2.y)
                    ):
                        raise ValueError(
                            "degenerate polygon boolean: collinear edge overlap"
                        )
                continue
            ua = ((c2.x - c1.x) * (s1.y - c1.y) - (c2.y - c1.y) * (s1.x - c1.x)) / den
            ub = ((s2.x - s1.x) * (s1.y - c1.y) - (s2.y - s1.y) * (s1.x - c1.x)) / den
            if ua < 0.0 or ua > 1.0 or ub < 0.0 or ub > 1.0:
                continue
            if ua in (0.0, 1.0) or ub in (0.0, 1.0):
                raise ValueError(
                    "degenerate polygon boolean: intersection at a vertex"
                )
            x = s1.x + ua * (s2.x - s1.x)
            y = s1.y + ua * (s2.y - s1.y)
            vs = _GH(x, y, inter=True)
            vc = _GH(x, y, inter=True)
            vs.neighbor, vc.neighbor = vc, vs
            _gh_insert(s1, s2, vs, ua, alphas_s)
            _gh_insert(c1, c2, vc, ub, alphas_c)
            n_inter += 1
    if n_inter == 0:
        return None
    if n_inter % 2 != 0:
        raise ValueError("degenerate polygon boolean: odd crossing count")

    clip_wkt = emit("POLYGON", [clip_pts + [clip_pts[0]]])
    subj_wkt = emit("POLYGON", [subj_pts + [subj_pts[0]]])

    def mark(head, other_wkt, invert):
        _, other = parse(other_wkt)
        status = not _point_in_poly((head.x, head.y), other)
        if invert:
            status = not status
        v = head
        while True:
            if v.inter:
                v.entry = status
                status = not status
            v = v.nxt
            if v is head:
                return

    # mode: "int" = both normal; "uni" = both inverted; "diff" (A - B) =
    # subject side inverted only (walk A outside B, B inside A backward)
    mark(S, clip_wkt, mode in ("uni", "diff"))
    mark(C, subj_wkt, mode == "uni")

    rings = []
    while True:
        start = None
        v = S
        while True:
            if v.inter and not v.visited:
                start = v
                break
            v = v.nxt
            if v is S:
                break
        if start is None:
            break
        ring = []
        cur = start
        while True:
            cur.visited = cur.neighbor.visited = True
            if cur.entry:
                while True:
                    ring.append((cur.x, cur.y))
                    cur = cur.nxt
                    if cur.inter:
                        break
            else:
                while True:
                    ring.append((cur.x, cur.y))
                    cur = cur.prv
                    if cur.inter:
                        break
            cur = cur.neighbor
            if cur.visited:
                break
        if len(ring) >= 3:
            rings.append(ring)
    return rings


def _gh_boolean(sa, sb, union=None, mode=None):
    """Shared polygon×polygon path for boolean ops via G-H; falls back
    to None when rings don't cross. mode in ("int", "uni", "diff")."""
    if mode is None:
        mode = "uni" if union else "int"
    ka, da = parse(sa)
    kb, db = parse(sb)
    if len(da) > 1 or len(db) > 1:
        raise ValueError("polygon boolean: holes unsupported")
    ra, rb = _open_ccw(da[0]), _open_ccw(db[0])
    rings = _gh_clip(ra, rb, mode)
    if rings is None:
        return None
    # normalize each ring CCW and close it
    out = []
    for r in rings:
        closed = r + [r[0]]
        if _ring_area2(closed) < 0:
            closed = closed[::-1]
        out.append(closed)
    if not out:
        return "POLYGON EMPTY"
    if len(out) == 1:
        return emit("POLYGON", [out[0]])
    # a ring inside another is that polygon's HOLE (e.g. the enclosed void
    # of a union of two C-shapes); attach it to its smallest container
    contains_in = [
        [
            j
            for j, o in enumerate(out)
            if j != i and _point_in_poly(r[0], [o])
        ]
        for i, r in enumerate(out)
    ]
    polys = {}
    for i, cs in enumerate(contains_in):
        if not cs:
            polys[i] = [out[i]]
    for i, cs in enumerate(contains_in):
        if cs:
            owner = min(cs, key=lambda j: abs(_ring_area2(out[j])))
            polys[owner].append(out[i])
    rings_by_poly = list(polys.values())
    if len(rings_by_poly) == 1:
        return emit("POLYGON", rings_by_poly[0])
    return emit("MULTIPOLYGON", rings_by_poly)


def intersection(sa, sb):
    """ST_Intersection for the planar kernel's tractable cases: point vs
    anything, and polygon vs polygon via Greiner-Hormann (generic
    position; degenerate incidence and holes raise — no silent
    approximation)."""
    ka, da = parse(sa)
    kb, db = parse(sb)
    if ka == "GEOMETRYCOLLECTION":
        return intersection(_gc_as_polygonal(sa, "st_intersection"), sb)
    if kb == "GEOMETRYCOLLECTION":
        return intersection(sa, _gc_as_polygonal(sb, "st_intersection"))
    if da is None or db is None:
        return emit("POLYGON", None)
    if ka == "POINT":
        return emit("POINT", da) if intersects(sa, sb) else "POINT EMPTY"
    if kb == "POINT":
        return emit("POINT", db) if intersects(sa, sb) else "POINT EMPTY"
    if ka in ("POLYGON", "MULTIPOLYGON") and kb in ("POLYGON", "MULTIPOLYGON"):
        if not (ka == kb == "POLYGON" and len(da) == 1 and len(db) == 1):
            # holes or MULTIPOLYGON operands (r6): containment shortcuts
            # (hole-aware contains), else the snapped arrangement
            if contains(sb, sa):
                return emit(ka, da)
            if contains(sa, sb):
                return emit(kb, db)
            if not intersects(sa, sb):
                return "POLYGON EMPTY"
            return boolean_fallback(sa, sb, "int")
        ra, rb = _open_ccw(da[0]), _open_ccw(db[0])
        # Greiner-Hormann FIRST for every polygon pair: it returns proper
        # MULTIPOLYGONs when the result is disconnected (a concave
        # subject can intersect a convex clip in several pieces, which
        # Sutherland-Hodgman would weld into one self-intersecting ring).
        try:
            out = _gh_boolean(sa, sb, mode="int")
            if out is not None:
                return out
            # no crossings: containment or disjoint
            if contains(sb, sa):
                return emit(ka, da)
            if contains(sa, sb):
                return emit(kb, db)
            return "POLYGON EMPTY"
        except ValueError:
            # degenerate incidence (shared boundary, vertex-on-edge):
            # Sutherland-Hodgman handles it gracefully when one side is
            # convex — its results are connected in that regime;
            # concave-x-concave routes through the snapped arrangement
            # (r5, areal semantics)
            if not (_is_convex_ccw(rb) or _is_convex_ccw(ra)):
                return boolean_fallback(sa, sb, "int")
        subject, clip = (ra, rb) if _is_convex_ccw(rb) else (rb, ra)
        res = _clip_sh(subject, clip)
        if len(res) < 3 or abs(_ring_area2(res + [res[0]])) == 0:
            return "POLYGON EMPTY"
        return emit("POLYGON", [res + [res[0]]])
    raise ValueError(
        "st_intersection: unsupported kinds %r x %r" % (ka, kb)
    )


def union_geom(sa, sb):
    """ST_Union: EMPTY/containment/disjoint cases directly; crossing
    polygon boundaries via Greiner-Hormann (generic position; shared
    boundary segments and holes raise — no silent perturbation).
    GC operands dissolve to their polygonal union first (r8, reference
    GeoFunctions.java ST_Union flattens GC)."""
    ka, da = parse(sa)
    kb, db = parse(sb)
    if ka == "GEOMETRYCOLLECTION":
        return union_geom(_gc_as_polygonal(sa, "st_union"), sb)
    if kb == "GEOMETRYCOLLECTION":
        return union_geom(sa, _gc_as_polygonal(sb, "st_union"))
    if da is None:
        return emit(kb, db)
    if db is None:
        return emit(ka, da)
    if ka == kb == "POINT":
        return emit("POINT", da) if da == db else emit("MULTIPOINT", [da, db])
    if ka in ("POLYGON", "MULTIPOLYGON") and kb in ("POLYGON", "MULTIPOLYGON"):
        pa = [da] if ka == "POLYGON" else list(da)
        pb = [db] if kb == "POLYGON" else list(db)
        if contains(sa, sb):
            return emit(ka, da)
        if contains(sb, sa):
            return emit(kb, db)
        if not intersects(sa, sb):
            return emit("MULTIPOLYGON", pa + pb)
        simple = ka == kb == "POLYGON" and len(da) == 1 and len(db) == 1
        if simple:
            try:
                out = _gh_boolean(sa, sb, union=True)
            except ValueError:
                out = None  # degenerate incidence inside the clipper
            if out is not None:
                return out
        # boundaries touch without crossing (shared edge / vertex-on-
        # edge), holes, or MULTIPOLYGON operands: the snapped
        # planar-arrangement union handles exactly these (r5, holes r6)
        return union_many([sa, sb])
    raise ValueError("st_union: unsupported kinds %r x %r" % (ka, kb))


def difference(sa, sb):
    """ST_Difference(A, B) = A minus B (reference GeoFunctions.java
    stDifference): disjoint -> A; B covers A -> EMPTY; A covers B -> A
    with B as a hole; crossing boundaries -> Greiner-Hormann diff mode.
    GC operands dissolve to their polygonal union first (r8)."""
    ka, da = parse(sa)
    kb, db = parse(sb)
    if ka == "GEOMETRYCOLLECTION":
        return difference(_gc_as_polygonal(sa, "st_difference"), sb)
    if kb == "GEOMETRYCOLLECTION":
        return difference(sa, _gc_as_polygonal(sb, "st_difference"))
    if da is None:
        return emit("POLYGON", None)
    if db is None:
        return emit(ka, da)
    if ka in ("POLYGON", "MULTIPOLYGON") and kb in ("POLYGON", "MULTIPOLYGON"):
        if not intersects(sa, sb):
            return emit(ka, da)
        if contains(sb, sa):
            return "POLYGON EMPTY"
        if not (ka == kb == "POLYGON" and len(da) == 1 and len(db) == 1):
            # holes or MULTIPOLYGON operands (r6): snapped arrangement
            return boolean_fallback(sa, sb, "diff")
        if contains(sa, sb):
            if all(
                _point_in_poly(q, da) == 1 for q in _all_points(kb, db)
            ):
                return emit("POLYGON", [da[0], db[0]])  # B becomes a hole
            # B touches A's boundary: the hole-punch would put the hole
            # on the shell — snapped arrangement emits the clean shape
            return boolean_fallback(sa, sb, "diff")
        try:
            out = _gh_boolean(sa, sb, mode="diff")
        except ValueError:
            out = None  # degenerate incidence inside the clipper
        if out is not None:
            return out
        # touching-without-crossing boundaries: snapped arrangement (r5)
        return boolean_fallback(sa, sb, "diff")
    raise ValueError("st_difference: unsupported kinds %r x %r" % (ka, kb))


def sym_difference(sa, sb):
    """ST_SymDifference(A, B) = (A - B) ∪ (B - A) (reference
    GeoFunctions.java stSymmetricDifference). The two differences are
    interior-disjoint BY CONSTRUCTION (they only share boundary along the
    cut), so the result is their MULTIPOLYGON collection directly — no
    second boolean needed (which would always see the shared boundary as
    degenerate)."""
    d1 = difference(sa, sb)
    d2 = difference(sb, sa)
    k1, r1 = parse(d1)
    k2, r2 = parse(d2)
    if r1 is None:
        return d2
    if r2 is None:
        return d1
    polys = []
    for k, r in ((k1, r1), (k2, r2)):
        polys.extend(r if k == "MULTIPOLYGON" else [r])
    return emit("MULTIPOLYGON", polys)


# --- accessors (reference GeoFunctions.java ST_Dimension:480,
# ST_Boundary:1126, ST_PointN:928, ST_StartPoint:1006, ST_EndPoint:1042,
# ST_ExteriorRing:1220, ST_InteriorRingN:970, ST_GeometryN:903,
# ST_Geometries:944, ST_Points:1058, ST_EnvelopeAsPts:1152,
# ST_IsRing:994, ST_IsSimple:517, ST_IsValid:526,
# geometry_invalid_reason:544, line_locate_point:627,
# line_interpolate_point(s):653/670, geometry_nearest_points:1193) ---

_DIMS = {
    "POINT": 0,
    "MULTIPOINT": 0,
    "LINESTRING": 1,
    "MULTILINESTRING": 1,
    "POLYGON": 2,
    "MULTIPOLYGON": 2,
}


def _validate(fn, kind, allowed):
    if kind not in allowed:
        raise ValueError(
            "%s: invalid geometry type %s (expected one of %s)"
            % (fn, kind, "/".join(sorted(allowed)))
        )


def dimension(s):
    """0 for points, 1 for lines, 2 for polygons; a collection's is its
    members' max (OGC dimension)."""
    k, d = parse(s)
    if k == "GEOMETRYCOLLECTION":
        if not d:
            return 0
        return max(dimension(emit(ck, cd)) for ck, cd in d)
    return _DIMS[k]


def coord_dim(s):
    """Coordinate dimension: the WKT kernel is strictly 2-D."""
    parse(s)
    return 2


def _dedupe_closed(ring):
    """Drop the explicit closing point if present (rings are implicitly
    closed everywhere in this kernel)."""
    if len(ring) > 1 and ring[0] == ring[-1]:
        return ring[:-1]
    return ring


def boundary(s):
    """OGC boundary: points -> empty; lines -> mod-2 endpoints;
    polygons -> their rings as linestrings."""
    k, d = parse(s)
    if k in ("POINT", "MULTIPOINT"):
        return "MULTIPOINT EMPTY"
    if d is None:
        return "MULTIPOINT EMPTY" if _DIMS[k] == 1 else emit(k, None)
    if k == "LINESTRING":
        d = [d]
        k = "MULTILINESTRING"
    if k == "MULTILINESTRING":
        # mod-2 rule: a point is on the boundary iff it ends an odd
        # number of component curves (closed components contribute none)
        counts = {}
        for path in d:
            if path[0] == path[-1]:
                continue
            for p in (path[0], path[-1]):
                counts[p] = counts.get(p, 0) + 1
        pts = sorted(p for p, c in counts.items() if c % 2 == 1)
        return emit("MULTIPOINT", pts or None)
    rings = d if k == "POLYGON" else [r for poly in d for r in poly]
    closed = [
        r if r[0] == r[-1] else r + [r[0]]
        for r in (list(r) for r in rings)
    ]
    if len(closed) == 1:
        return emit("LINESTRING", closed[0])
    return emit("MULTILINESTRING", closed)


def point_n(s, n):
    """1-based vertex of a LINESTRING; NULL out of range (wrong type
    raises, matching validateType)."""
    k, d = parse(s)
    _validate("ST_PointN", k, ("LINESTRING",))
    if d is None or n < 1 or n > len(d):
        return None
    return emit("POINT", d[int(n) - 1])


def start_point(s):
    k, d = parse(s)
    _validate("ST_StartPoint", k, ("LINESTRING",))
    return None if d is None else emit("POINT", d[0])


def end_point(s):
    k, d = parse(s)
    _validate("ST_EndPoint", k, ("LINESTRING",))
    return None if d is None else emit("POINT", d[-1])


def exterior_ring(s):
    k, d = parse(s)
    _validate("ST_ExteriorRing", k, ("POLYGON",))
    if d is None:
        return None
    r = list(d[0])
    return emit("LINESTRING", r if r[0] == r[-1] else r + [r[0]])


def num_interior_ring(s):
    k, d = parse(s)
    _validate("ST_NumInteriorRing", k, ("POLYGON",))
    return None if d is None else len(d) - 1


def interior_ring_n(s, n):
    k, d = parse(s)
    _validate("ST_InteriorRingN", k, ("POLYGON",))
    if d is None or n < 1 or n > len(d) - 1:
        return None
    r = list(d[int(n)])
    return emit("LINESTRING", r if r[0] == r[-1] else r + [r[0]])


def interior_rings(s):
    """All interior rings as LINESTRING WKTs (reference stInteriorRings;
    NULL for empty polygons, raises for non-polygons)."""
    k, d = parse(s)
    _validate("ST_InteriorRings", k, ("POLYGON",))
    if d is None:
        return None
    out = []
    for ring in d[1:]:
        r = list(ring)
        out.append(emit("LINESTRING", r if r[0] == r[-1] else r + [r[0]]))
    return out


def _components(k, d):
    """Split a geometry into its single-geometry components."""
    if d is None:
        return []
    if k == "GEOMETRYCOLLECTION":
        return list(d)
    if not k.startswith("MULTI"):
        return [(k, d)]
    base = k[5:]
    return [(base, part) for part in d]


def num_geometries(s):
    k, d = parse(s)
    if d is None:
        return 0
    return len(_components(k, d))


def geometry_n(s, n):
    """1-based component of a multi-geometry; a single geometry is its
    own component 1; NULL out of range or empty."""
    k, d = parse(s)
    if d is None:
        return None
    comps = _components(k, d)
    if n < 1 or n > len(comps):
        return None
    ck, cd = comps[int(n) - 1]
    return emit(ck, cd)


def geometries(s):
    k, d = parse(s)
    if d is None:
        return None
    return [emit(ck, cd) for ck, cd in _components(k, d)]


def points_of(s):
    """All vertices in order as POINT WKTs (NULL for empty)."""
    k, d = parse(s)
    if d is None:
        return None
    return [emit("POINT", p) for p in _all_points(k, d)]


def envelope_as_pts(s):
    b = bounds(s)
    if b is None:
        return None
    return [emit("POINT", (b[0], b[1])), emit("POINT", (b[2], b[3]))]


def is_ring(s):
    """TRUE iff the LINESTRING is closed and simple."""
    k, d = parse(s)
    _validate("ST_IsRing", k, ("LINESTRING",))
    if d is None:
        return None
    return d[0] == d[-1] and is_simple(s)


def _segments(path):
    return [
        (path[i], path[i + 1])
        for i in range(len(path) - 1)
        if path[i] != path[i + 1]
    ]


def _collinear_overlap(a, b, c, d):
    """If ab and cd are collinear and overlap with positive length,
    return the overlapping (lo, hi) parameter interval on ab, else None."""
    ux, uy = b[0] - a[0], b[1] - a[1]
    cross1 = ux * (c[1] - a[1]) - uy * (c[0] - a[0])
    cross2 = ux * (d[1] - a[1]) - uy * (d[0] - a[0])
    if abs(cross1) > 1e-12 or abs(cross2) > 1e-12:
        return None
    den = ux * ux + uy * uy
    if den < 1e-24:
        return None
    t1 = ((c[0] - a[0]) * ux + (c[1] - a[1]) * uy) / den
    t2 = ((d[0] - a[0]) * ux + (d[1] - a[1]) * uy) / den
    lo, hi = min(t1, t2), max(t1, t2)
    lo, hi = max(lo, 0.0), min(hi, 1.0)
    if hi - lo < 1e-12:
        return None
    return (lo, hi)


def _line_self_simple(paths):
    """OGC simplicity for a (multi)linestring: self-intersections only at
    component endpoints."""
    segs = []  # (seg, path_idx, first?, last?, endpoints of path)
    for pi, path in enumerate(paths):
        ss = _segments(path)
        for si, seg in enumerate(ss):
            segs.append((seg, pi, si, len(ss)))
    for i in range(len(segs)):
        (a, b), pi, si, ni = segs[i]
        for j in range(i + 1, len(segs)):
            (c, d), pj, sj, nj = segs[j]
            if pi == pj and sj == si + 1:
                # consecutive: shared vertex is fine; collinear backtrack
                # is not
                if _collinear_overlap(a, b, c, d):
                    return False
                continue
            if (
                pi == pj
                and si == 0
                and sj == ni - 1
                and paths[pi][0] == paths[pi][-1]
            ):
                # closure of a ring: first/last segments share the
                # start/end point legitimately
                if _collinear_overlap(a, b, c, d):
                    return False
                continue
            if not _seg_intersect(a, b, c, d):
                continue
            if _collinear_overlap(a, b, c, d):
                return False
            if _seg_intersect(a, b, c, d, proper_only=True):
                return False
            # touching intersection: allowed only at endpoints of BOTH
            # components (OGC boundary points)
            ends_i = (paths[pi][0], paths[pi][-1])
            ends_j = (paths[pj][0], paths[pj][-1])
            touch = [
                p
                for p in (a, b)
                if _pt_seg_dist(p, c, d) < 1e-12
            ] + [p for p in (c, d) if _pt_seg_dist(p, a, b) < 1e-12]
            for p in touch:
                if pi == pj:
                    return False
                if p not in ends_i or p not in ends_j:
                    return False
    return True


def is_simple(s):
    """No anomalous geometric points (reference stIsSimple)."""
    k, d = parse(s)
    if d is None:
        return True
    if k == "POINT":
        return True
    if k == "MULTIPOINT":
        return len(set(d)) == len(d)
    if k == "LINESTRING":
        return _line_self_simple([d])
    if k == "MULTILINESTRING":
        return _line_self_simple(d)
    return invalid_reason(s) is None


def invalid_reason(s):
    """Reason the geometry is not well formed, or None (reference
    geometry_invalid_reason; reason strings follow its
    NON_SIMPLE_REASONS map, GeoFunctions.java:143-151)."""
    k, d = parse(s)
    if d is None or k in ("POINT",):
        return None
    if k == "MULTIPOINT":
        return "Repeated points" if len(set(d)) != len(d) else None
    if k in ("LINESTRING", "MULTILINESTRING"):
        paths = [d] if k == "LINESTRING" else d
        for path in paths:
            for i in range(len(path) - 1):
                if path[i] == path[i + 1]:
                    return "Degenerate segments at or near (%s %s)" % (
                        _fmt(path[i][0]),
                        _fmt(path[i][1]),
                    )
            if len(_segments(path)) == 0:
                return "Degenerate segments"
        return None
    polys = d if k == "MULTIPOLYGON" else [d]
    for rings in polys:
        for ring in rings:
            r = _dedupe_closed(list(ring))
            if len(set(r)) < 3:
                return "Degenerate segments"
            segs = _segments(r + [r[0]])
            n = len(segs)
            for i in range(n):
                a, b = segs[i]
                for j in range(i + 1, n):
                    c, dd = segs[j]
                    adjacent = j == i + 1 or (i == 0 and j == n - 1)
                    if adjacent:
                        if _collinear_overlap(a, b, c, dd):
                            return (
                                "Intersecting or overlapping segments"
                                " at or near (%s %s)"
                                % (_fmt(c[0]), _fmt(c[1]))
                            )
                        continue
                    if _seg_intersect(a, b, c, dd):
                        p = a if _pt_seg_dist(a, c, dd) < 1e-12 else c
                        return "Self-intersection at or near (%s %s)" % (
                            _fmt(p[0]),
                            _fmt(p[1]),
                        )
    return None


def is_valid(s):
    return invalid_reason(s) is None


def _paths_of_line(s, fn):
    k, d = parse(s)
    _validate(fn, k, ("LINESTRING", "MULTILINESTRING"))
    if d is None:
        return None
    return [d] if k == "LINESTRING" else d


def line_locate_point(sl, sp):
    """Fraction [0,1] of total length at the nearest point on the line
    (reference lineLocatePoint; JTS LengthIndexedLine semantics)."""
    paths = _paths_of_line(sl, "line_locate_point")
    kp, p = parse(sp)
    if kp != "POINT":
        raise ValueError(
            "Second argument to line_locate_point must be a Point."
            " Got: %s" % kp
        )
    if paths is None or p is None:
        return None
    total = 0.0
    best = (float("inf"), 0.0)  # (distance, length-at)
    consumed = 0.0
    for path in paths:
        for a, b in zip(path, path[1:]):
            ux, uy = b[0] - a[0], b[1] - a[1]
            den = ux * ux + uy * uy
            seg_len = math.hypot(ux, uy)
            t = 0.0
            if den > 0:
                t = ((p[0] - a[0]) * ux + (p[1] - a[1]) * uy) / den
                t = max(0.0, min(1.0, t))
            qx, qy = a[0] + t * ux, a[1] + t * uy
            dist = math.hypot(p[0] - qx, p[1] - qy)
            if dist < best[0] - 1e-15:
                best = (dist, consumed + t * seg_len)
            consumed += seg_len
            total += seg_len
    if total == 0:
        return 0.0
    return best[1] / total


def _line_interpolate(s, frac, repeated):
    """Reference interpolatePoints (GeoFunctions.java:688-736): walk the
    path emitting points every `frac` of total length."""
    k, d = parse(s)
    if d is None:
        return None
    _validate("line_interpolate_point", k, ("LINESTRING",))
    if not (0 <= frac <= 1):
        raise ValueError("fraction must be between 0 and 1")
    if frac == 0:
        return [emit("POINT", d[0])]
    if frac == 1:
        return [emit("POINT", d[-1])]
    count = int(math.floor(1.0 / frac)) if repeated else 1
    total = _path_len(d)
    out = []
    target = frac
    consumed = 0.0
    prev = d[0]
    for cur in d[1:]:
        if len(out) >= count:
            break
        seg_frac = math.hypot(cur[0] - prev[0], cur[1] - prev[1]) / total
        while target < consumed + seg_frac and len(out) < count:
            t = (target - consumed) / seg_frac
            out.append(
                emit(
                    "POINT",
                    (
                        prev[0] + (cur[0] - prev[0]) * t,
                        prev[1] + (cur[1] - prev[1]) * t,
                    ),
                )
            )
            target += frac
        consumed += seg_frac
        prev = cur
    if len(out) < count:
        out.append(emit("POINT", d[-1]))
    return out


def _seg_seg_nearest(a, b, c, d):
    """Closest point pair between segments ab and cd -> (dist, p, q)."""
    if _seg_intersect(a, b, c, d):
        # crossing or touching: find a common point (project endpoints,
        # else proper-crossing solve)
        for p in (a, b):
            if _pt_seg_dist(p, c, d) < 1e-12:
                return (0.0, p, p)
        for p in (c, d):
            if _pt_seg_dist(p, a, b) < 1e-12:
                return (0.0, p, p)
        x1, y1 = a
        x2, y2 = b
        x3, y3 = c
        x4, y4 = d
        den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
        if abs(den) > 1e-24:
            t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / den
            p = (x1 + t * (x2 - x1), y1 + t * (y2 - y1))
            return (0.0, p, p)
    best = (float("inf"), None, None)
    for p in (a, b):
        ux, uy = d[0] - c[0], d[1] - c[1]
        den = ux * ux + uy * uy
        t = 0.0
        if den > 0:
            t = max(
                0.0,
                min(1.0, ((p[0] - c[0]) * ux + (p[1] - c[1]) * uy) / den),
            )
        q = (c[0] + t * ux, c[1] + t * uy)
        dist = math.hypot(p[0] - q[0], p[1] - q[1])
        if dist < best[0]:
            best = (dist, p, q)
    for p in (c, d):
        ux, uy = b[0] - a[0], b[1] - a[1]
        den = ux * ux + uy * uy
        t = 0.0
        if den > 0:
            t = max(
                0.0,
                min(1.0, ((p[0] - a[0]) * ux + (p[1] - a[1]) * uy) / den),
            )
        q = (a[0] + t * ux, a[1] + t * uy)
        dist = math.hypot(p[0] - q[0], p[1] - q[1])
        if dist < best[0]:
            best = (dist, q, p)
    return best


# --- codecs: WKB / GeoJSON / encoded polyline (reference
# GeoFunctions.java ST_AsBinary:386, ST_GeomFromBinary:311,
# to/from_geojson_geometry:1430/1439; EncodedPolylineFunctions.java) ---

_WKB_CODES = {
    "POINT": 1,
    "LINESTRING": 2,
    "POLYGON": 3,
    "MULTIPOINT": 4,
    "MULTILINESTRING": 5,
    "MULTIPOLYGON": 6,
    "GEOMETRYCOLLECTION": 7,
}
_WKB_KINDS = {v: k for k, v in _WKB_CODES.items()}


def _closed(ring):
    r = list(ring)
    return r if r[0] == r[-1] else r + [r[0]]


def to_wkb(s):
    """Little-endian OGC WKB bytes of the geometry."""
    k, d = parse(s)
    out = bytearray()

    def emit_geom(kind, data):
        out.append(1)  # little-endian
        out.extend(_struct.pack("<I", _WKB_CODES[kind]))
        if kind == "POINT":
            p = data if data is not None else (float("nan"), float("nan"))
            out.extend(_struct.pack("<dd", p[0], p[1]))
        elif kind == "LINESTRING":
            pts = data or []
            out.extend(_struct.pack("<I", len(pts)))
            for x, y in pts:
                out.extend(_struct.pack("<dd", x, y))
        elif kind == "POLYGON":
            rings = [_closed(r) for r in (data or [])]
            out.extend(_struct.pack("<I", len(rings)))
            for r in rings:
                out.extend(_struct.pack("<I", len(r)))
                for x, y in r:
                    out.extend(_struct.pack("<dd", x, y))
        else:
            comps = _components(kind, data)
            out.extend(_struct.pack("<I", len(comps)))
            for ck, cd in comps:
                emit_geom(ck, cd)

    emit_geom(k, d)
    return bytes(out)


def from_wkb(raw):
    """WKB (either byte order) -> canonical WKT."""
    pos = [0]

    def take(fmt):
        n = _struct.calcsize(fmt)
        v = _struct.unpack_from(fmt, raw, pos[0])
        pos[0] += n
        return v

    def read_geom():
        (order,) = take("B")
        e = "<" if order == 1 else ">"
        (code,) = take(e + "I")
        kind = _WKB_KINDS.get(code & 0xFF)
        if kind is None:
            raise ValueError("unsupported WKB geometry code: %d" % code)
        if kind == "POINT":
            x, y = take(e + "dd")
            if math.isnan(x) and math.isnan(y):
                return (kind, None)
            return (kind, (x, y))
        if kind == "LINESTRING":
            (n,) = take(e + "I")
            pts = [take(e + "dd") for _ in range(n)]
            return (kind, pts or None)
        if kind == "POLYGON":
            (n,) = take(e + "I")
            rings = []
            for _ in range(n):
                (m,) = take(e + "I")
                rings.append([take(e + "dd") for _ in range(m)])
            return (kind, rings or None)
        (n,) = take(e + "I")
        comps = [read_geom() for _ in range(n)]
        if not comps:
            return (kind, None)
        if kind == "GEOMETRYCOLLECTION":
            return (kind, comps)
        return (kind, [c[1] for c in comps])

    k, d = read_geom()
    return emit(k, d)


def to_geojson(s):
    """Geometry -> GeoJSON string (reference toGeoJsonGeometry)."""
    k, d = parse(s)
    if k == "GEOMETRYCOLLECTION":
        return _json.dumps(
            {
                "type": "GeometryCollection",
                "geometries": [
                    _json.loads(to_geojson(emit(ck, cd)))
                    for ck, cd in (d or [])
                ],
            },
            separators=(",", ":"),
        )
    name = {
        "POINT": "Point",
        "MULTIPOINT": "MultiPoint",
        "LINESTRING": "LineString",
        "MULTILINESTRING": "MultiLineString",
        "POLYGON": "Polygon",
        "MULTIPOLYGON": "MultiPolygon",
    }[k]

    def num(v):
        return int(v) if v == int(v) and abs(v) < 1e15 else v

    def pt(p):
        return [num(p[0]), num(p[1])]

    if d is None:
        coords = []
    elif k == "POINT":
        coords = pt(d)
    elif k in ("MULTIPOINT", "LINESTRING"):
        coords = [pt(p) for p in d]
    elif k in ("MULTILINESTRING",):
        coords = [[pt(p) for p in path] for path in d]
    elif k == "POLYGON":
        coords = [[pt(p) for p in _closed(r)] for r in d]
    else:
        coords = [
            [[pt(p) for p in _closed(r)] for r in rings] for rings in d
        ]
    return _json.dumps(
        {"type": name, "coordinates": coords}, separators=(",", ":")
    )


def from_geojson(text):
    """GeoJSON -> canonical WKT."""
    obj = _json.loads(text)
    name = obj.get("type")
    if name == "GeometryCollection":
        members = [
            parse(from_geojson(_json.dumps(g)))
            for g in obj.get("geometries", [])
        ]
        return emit("GEOMETRYCOLLECTION", members or None)
    kinds = {
        "Point": "POINT",
        "MultiPoint": "MULTIPOINT",
        "LineString": "LINESTRING",
        "MultiLineString": "MULTILINESTRING",
        "Polygon": "POLYGON",
        "MultiPolygon": "MULTIPOLYGON",
    }
    if name not in kinds:
        raise ValueError("unsupported GeoJSON type: %r" % name)
    k = kinds[name]
    c = obj.get("coordinates")
    if not c:
        return emit(k, None)
    if k == "POINT":
        return emit(k, (float(c[0]), float(c[1])))
    if k in ("MULTIPOINT", "LINESTRING"):
        return emit(k, [(float(p[0]), float(p[1])) for p in c])
    if k == "MULTILINESTRING":
        return emit(
            k, [[(float(p[0]), float(p[1])) for p in path] for path in c]
        )
    if k == "POLYGON":
        return emit(
            k, [[(float(p[0]), float(p[1])) for p in r] for r in c]
        )
    return emit(
        k,
        [
            [[(float(p[0]), float(p[1])) for p in r] for r in rings]
            for rings in c
        ],
    )


def to_polyline(s):
    """Google encoded polyline (precision 1e5) of a LINESTRING or
    MULTIPOINT (reference EncodedPolylineFunctions.encodePolyline)."""
    k, d = parse(s)
    _validate("encode_polyline", k, ("LINESTRING", "MULTIPOINT"))
    out = []
    last_lat = last_lon = 0

    def put(value):
        value = value << 1
        if value < 0:
            value = ~value
        while value >= 0x20:
            out.append(chr((0x20 | (value & 0x1F)) + 63))
            value >>= 5
        out.append(chr(value + 63))

    for x, y in d or []:
        lat = round(y * 1e5)
        lon = round(x * 1e5)
        put(lat - last_lat)
        put(lon - last_lon)
        last_lat, last_lon = lat, lon
    return "".join(out)


def from_polyline(text):
    """Encoded polyline -> LINESTRING."""
    pts = []
    index = 0
    lat = lon = 0

    def take():
        nonlocal index
        result = 1
        shift = 0
        while True:
            b = ord(text[index]) - 63 - 1
            index += 1
            result += b << shift
            shift += 5
            if b < 0x1F:
                break
        return ~(result >> 1) if (result & 1) else (result >> 1)

    while index < len(text):
        lat += take()
        lon += take()
        pts.append((lon / 1e5, lat / 1e5))
    return emit("LINESTRING", pts or None)


# --- Bing tiles over geometries (reference geospatial
# BingTileFunctions.java bing_tile_polygon:337, bing_tiles_around:169
# (point) and :202 (radius), geometry_to_bing_tiles:347; the packed
# BIGINT encoding (x<<28 | y<<5 | zoom) matches the bing_tile_* macro
# family in functions/registry.py) ---

_BING_MAX_LAT = 85.05112878


def _bing_encode(x, y, zoom):
    return (x << 28) + (y << 5) + zoom


def _bing_decode(t):
    return (t >> 28, (t >> 5) & 0x7FFFFF, t & 31)


def _bing_check_zoom(zoom):
    if not (0 <= zoom <= 23):
        raise ValueError("Zoom level must be <= 23")


def _lat_lon_to_tile_xy(lat, lon, zoom):
    n = 1 << zoom
    x = int(math.floor((lon + 180.0) / 360.0 * n))
    clat = max(-_BING_MAX_LAT, min(_BING_MAX_LAT, lat))
    s = math.sin(math.radians(clat))
    y = int(
        math.floor(
            (0.5 - math.log((1 + s) / (1 - s)) / (4 * math.pi)) * n
        )
    )
    return (max(0, min(n - 1, x)), max(0, min(n - 1, y)))


def _tile_nw(x, y, zoom):
    """(lat, lon) of the tile's north-west corner."""
    n = 1 << zoom
    lon = x / n * 360.0 - 180.0
    lat = math.degrees(math.asin(math.tanh(2 * math.pi * (0.5 - y / n))))
    return (lat, lon)


def bing_tile_polygon(t):
    """WKT polygon of the tile's extent."""
    x, y, zoom = _bing_decode(t)
    _bing_check_zoom(zoom)
    n_lat, w_lon = _tile_nw(x, y, zoom)
    s_lat, e_lon = _tile_nw(x + 1, y + 1, zoom)
    return emit(
        "POLYGON",
        [[(w_lon, s_lat), (e_lon, s_lat), (e_lon, n_lat), (w_lon, n_lat)]],
    )


def _gc_destination(lat, lon, distance_km, bearing_deg):
    """Great-circle destination point (reference addDistanceToLatitude /
    addDistanceToLongitude use the same spherical law)."""
    ang = distance_km / _EARTH_KM
    br = math.radians(bearing_deg)
    phi = math.radians(lat)
    lam = math.radians(lon)
    phi2 = math.asin(
        math.sin(phi) * math.cos(ang)
        + math.cos(phi) * math.sin(ang) * math.cos(br)
    )
    lam2 = lam + math.atan2(
        math.sin(br) * math.sin(ang) * math.cos(phi),
        math.cos(ang) - math.sin(phi) * math.sin(phi2),
    )
    lon2 = math.degrees(lam2)
    if lon2 > 180:
        lon2 -= 360
    if lon2 < -180:
        lon2 += 360
    return (math.degrees(phi2), lon2)


def bing_tiles_around_radius(lat, lon, zoom, radius_km):
    """Minimum tile set covering a radius_km circle around the point
    (reference bingTilesAround:202: the center row and column are
    included whole; corner-quadrant tiles are kept iff their corner
    nearest the center lies within the radius)."""
    _bing_check_zoom(zoom)
    if not (-90 <= lat <= 90):
        raise ValueError("Latitude must be between -90 and 90")
    if not (-180 <= lon <= 180):
        raise ValueError("Longitude must be between -180 and 180")
    if not (0 <= radius_km <= 1000):
        raise ValueError("Radius must be between 0 and 1,000 km")
    n = 1 << zoom
    tx, ty = _lat_lon_to_tile_xy(lat, lon, zoom)
    top_lat, _ = _gc_destination(lat, lon, radius_km, 0)
    bot_lat, _ = _gc_destination(lat, lon, radius_km, 180)
    _, left_lon = _gc_destination(lat, lon, radius_km, 270)
    _, right_lon = _gc_destination(lat, lon, radius_km, 90)
    top_y = _lat_lon_to_tile_xy(top_lat, lon, zoom)[1]
    bot_y = _lat_lon_to_tile_xy(bot_lat, lon, zoom)[1]
    left_x = _lat_lon_to_tile_xy(lat, left_lon, zoom)[0]
    right_x = _lat_lon_to_tile_xy(lat, right_lon, zoom)[0]
    wrap = right_x < left_x
    # wrapped span: left_x..n-1 plus 0..right_x (reference
    # bingTilesAround:240 counts rightX + maxTileIndex - leftX + 2 with
    # maxTileIndex = n - 1, i.e. right + n - left + 1)
    count_x = (right_x + n - left_x + 1) if wrap else (right_x - left_x + 1)
    if count_x * (bot_y - top_y + 1) > 1_000_000:
        raise ValueError(
            "The number of tiles covering input rectangle exceeds the"
            " limit of 1M"
        )
    out = []
    for i in range(count_x):
        out.append(_bing_encode((left_x + i) % n, ty, zoom))
    for y in range(top_y, bot_y + 1):
        if y != ty:
            out.append(_bing_encode(tx, y, zoom))

    def within(corner_lat, corner_lon):
        return _gc_km(lat, lon, corner_lat, corner_lon) <= radius_km

    # corner quadrants: keep a tile iff its corner nearest the center is
    # inside the circle (column scans are monotone in that distance)
    x = right_x
    while x != tx:
        for y in range(top_y, ty):  # top-right: nearest = SW corner
            if within(*_tile_nw(x, y + 1, zoom)):
                out.append(_bing_encode(x, y, zoom))
        for y in range(bot_y, ty, -1):  # bottom-right: nearest = NW
            if within(*_tile_nw(x, y, zoom)):
                out.append(_bing_encode(x, y, zoom))
        x = n - 1 if x == 0 else x - 1
    x = left_x
    while x != tx:
        for y in range(top_y, ty):  # top-left: nearest = SE corner
            if within(*_tile_nw(x + 1, y + 1, zoom)):
                out.append(_bing_encode(x, y, zoom))
        for y in range(bot_y, ty, -1):  # bottom-left: nearest = NE
            if within(*_tile_nw(x + 1, y, zoom)):
                out.append(_bing_encode(x, y, zoom))
        x = (x + 1) % n
    return out


def geometry_to_bing_tiles(s, zoom):
    """Minimum set of tiles at `zoom` fully covering the geometry
    (reference geometryToBingTiles:347 — the direct grid walk with a
    per-tile intersection check; the optimized subtile recursion there
    is a scalar-cost optimization, not a semantic one)."""
    _bing_check_zoom(zoom)
    k, d = parse(s)
    if d is None:
        return []
    xmin, ymin, xmax, ymax = bounds(s)
    if ymin < -_BING_MAX_LAT or ymax > _BING_MAX_LAT:
        raise ValueError(
            "Latitude span for the geometry must be in [-85.05112878,"
            " 85.05112878] range"
        )
    if xmin < -180 or xmax > 180:
        raise ValueError(
            "Longitude span for the geometry must be in [-180, 180] range"
        )
    lux, luy = _lat_lon_to_tile_xy(ymax, xmin, zoom)
    rlx, rly = _lat_lon_to_tile_xy(ymin, xmax, zoom)
    nw_lat, nw_lon = _tile_nw(rlx, rly, zoom)
    if nw_lon == xmax and rlx > lux:
        rlx -= 1
    if nw_lat == ymin and rly > luy:
        rly -= 1
    count = (rlx - lux + 1) * (rly - luy + 1)
    if count > 1_000_000:
        raise ValueError(
            "The number of tiles covering input rectangle exceeds the"
            " limit of 1M"
        )
    is_point = k == "POINT"
    is_rect = False
    if k == "POLYGON" and len(d) == 1:
        corners = set(_dedupe_closed(list(d[0])))
        want = {(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)}
        is_rect = corners == want
    out = []
    for x in range(lux, rlx + 1):
        for y in range(luy, rly + 1):
            if is_point or is_rect:
                out.append(_bing_encode(x, y, zoom))
                continue
            tile = bing_tile_polygon(_bing_encode(x, y, zoom))
            if intersects(tile, s):
                out.append(_bing_encode(x, y, zoom))
    return out


# --- spherical geography (reference GeoFunctions.java
# to_spherical_geography:336, to_geometry:369, stSphericalDistance:1746,
# stSphericalLength:592, stSphericalArea:1776; EARTH_RADIUS_KM=6371.01
# at :141). A geography IS its lat/lon WKT, validated on conversion —
# the spherical measurement functions are registered under
# st_spherical_* names because this registry cannot overload ST_* by
# operand type the way the reference's type system does. ---

_EARTH_KM = 6371.01


def to_spherical(s):
    k, d = parse(s)
    b = bounds(s)
    if b is not None:
        if not (-180 <= b[0] and b[2] <= 180):
            raise ValueError("Longitude must be between -180 and 180")
        if not (-90 <= b[1] and b[3] <= 90):
            raise ValueError("Latitude must be between -90 and 90")
    return emit(k, d)


def _gc_km(lat1, lon1, lat2, lon2):
    """Great-circle km (reference greatCircleDistance:1505 — the
    Vincenty arctan form, bit-compatible)."""
    rlat1, rlat2 = math.radians(lat1), math.radians(lat2)
    dlon = math.radians(lon2 - lon1)
    cos2 = math.cos(rlat2)
    cos1 = math.cos(rlat1)
    sin1 = math.sin(rlat1)
    sin2 = math.sin(rlat2)
    cosd = math.cos(dlon)
    t1 = cos2 * math.sin(dlon)
    t2 = cos1 * sin2 - sin1 * cos2 * cosd
    t3 = sin1 * sin2 + cos1 * cos2 * cosd
    return math.atan2(math.sqrt(t1 * t1 + t2 * t2), t3) * _EARTH_KM


def spherical_distance(sa, sb):
    """Great-circle meters between two geography POINTs."""
    ka, da = parse(sa)
    kb, db = parse(sb)
    if da is None or db is None:
        return None
    _validate("ST_Distance(geography)", ka, ("POINT",))
    _validate("ST_Distance(geography)", kb, ("POINT",))
    return _gc_km(da[1], da[0], db[1], db[0]) * 1000.0


def spherical_length(s):
    """Great-circle meters along a (multi)linestring geography."""
    k, d = parse(s)
    if d is None:
        return None
    _validate("ST_Length(geography)", k, ("LINESTRING", "MULTILINESTRING"))
    paths = [d] if k == "LINESTRING" else d
    total = 0.0
    for path in paths:
        for (x1, y1), (x2, y2) in zip(path, path[1:]):
            total += _gc_km(y1, x1, y2, x2)
    return total * 1000.0


def _spherical_excess(ring):
    """Reference computeSphericalExcess:1808 — bearing-walk spherical
    excess of one closed ring, with the enclosed-pole correction."""
    pts = _dedupe_closed(list(ring))
    if len(pts) < 3:
        raise ValueError(
            "Polygon is not valid: a loop contains less then 3 vertices."
        )
    two_pi = 2 * math.pi
    excess = 0.0
    course_delta = 0.0
    first = True
    first_initial_bearing = 0.0
    prev_final_bearing = 0.0
    prev_phi = math.radians(pts[-1][1])
    prev_cos, prev_sin = math.cos(prev_phi), math.sin(prev_phi)
    prev_tan = math.tan(prev_phi / 2)
    prev_lon = math.radians(pts[-1][0])
    for x, y in pts:
        phi = math.radians(y)
        tan = math.tan(phi / 2)
        lon = math.radians(x)
        if lon == prev_lon and phi == prev_phi:
            raise ValueError(
                "Polygon is not valid: it has two identical consecutive"
                " vertices"
            )
        dlon = lon - prev_lon
        excess += 2 * math.atan2(
            math.tan(dlon / 2) * (prev_tan + tan), 1 + prev_tan * tan
        )
        cos, sin = math.cos(phi), math.sin(phi)
        sin_d, cos_d = math.sin(dlon), math.cos(dlon)
        yy = sin_d * cos
        xx = prev_cos * sin - prev_sin * cos * cos_d
        initial_bearing = (math.atan2(yy, xx) + two_pi) % two_pi
        fy = -sin_d * prev_cos
        fx = prev_sin * cos - prev_cos * sin * cos_d
        final_bearing = (math.atan2(fy, fx) + math.pi) % two_pi
        if first:
            first_initial_bearing = initial_bearing
            first = False
        else:
            course_delta += (
                initial_bearing - prev_final_bearing + 3 * math.pi
            ) % two_pi - math.pi
        course_delta += (
            final_bearing - initial_bearing + 3 * math.pi
        ) % two_pi - math.pi
        prev_final_bearing = final_bearing
        prev_cos, prev_sin, prev_phi, prev_tan = cos, sin, phi, tan
        prev_lon = lon
    course_delta += (
        first_initial_bearing - prev_final_bearing + 3 * math.pi
    ) % two_pi - math.pi
    if abs(course_delta) < math.pi / 4:
        excess = abs(excess) - two_pi
    return excess


def spherical_area(s):
    """Spherical-excess area in m^2 of a polygon geography (holes
    subtract)."""
    k, d = parse(s)
    if d is None:
        return None
    _validate("ST_Area(geography)", k, ("POLYGON", "MULTIPOLYGON"))
    excess = 0.0
    for rings in _polys(k, d):
        for i, ring in enumerate(rings):
            sign = 1.0 if i == 0 else -1.0
            excess += sign * abs(_spherical_excess(ring))
    r_m = _EARTH_KM * 1000.0
    return abs(excess * r_m * r_m)


# --- DE-9IM relate engine (reference GeoFunctions.java ST_Relate:1369,
# ST_Crosses:1295, ST_Disjoint:1310, ST_Equals:1325, ST_Overlaps:1352,
# ST_Touches:1379 — Esri Operator* backed there; here the 3x3
# intersection-dimension matrix is computed directly from the kernel's
# finite representations. Polygon operands must be hole-free (holes
# break the boundary-witness arguments; they raise, consistent with the
# clipper policy). ---

_EPS = 1e-9


def _class_of(k):
    return {0: "P", 1: "L", 2: "A"}[_DIMS[k]]


def _paths(k, d):
    """Line-class geometry as a list of paths."""
    return [d] if k == "LINESTRING" else list(d)


def _polys(k, d):
    """Area-class geometry as a list of polygons (ring lists)."""
    return [d] if k == "POLYGON" else list(d)


def _line_boundary_pts(paths):
    counts = {}
    for path in paths:
        if path[0] == path[-1]:
            continue
        for p in (path[0], path[-1]):
            counts[p] = counts.get(p, 0) + 1
    return [p for p, c in counts.items() if c % 2 == 1]


def _near(p, q):
    return math.hypot(p[0] - q[0], p[1] - q[1]) < _EPS


def _classify_pt(p, k, d):
    """'I' / 'B' / 'E' of point p against geometry (k, d)."""
    cls = _class_of(k)
    if cls == "P":
        pts = [d] if k == "POINT" else d
        return "I" if any(_near(p, q) for q in pts) else "E"
    if cls == "L":
        paths = _paths(k, d)
        on = any(
            _pt_seg_dist(p, a, b) < _EPS
            for path in paths
            for a, b in zip(path, path[1:])
        )
        if not on:
            return "E"
        return (
            "B"
            if any(_near(p, q) for q in _line_boundary_pts(paths))
            else "I"
        )
    best = 0
    for rings in _polys(k, d):
        r = _point_in_poly(p, rings)
        if r == 1:
            return "I"
        best = max(best, r)
    return "B" if best == 2 else "E"


def _cross_point(a, b, c, d):
    """A witness point of the (non-collinear) intersection of ab, cd."""
    for p in (a, b):
        if _pt_seg_dist(p, c, d) < _EPS:
            return p
    for p in (c, d):
        if _pt_seg_dist(p, a, b) < _EPS:
            return p
    x1, y1 = a
    x2, y2 = b
    x3, y3 = c
    x4, y4 = d
    den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    if abs(den) < 1e-24:
        return None
    t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / den
    return (x1 + t * (x2 - x1), y1 + t * (y2 - y1))


def _param_on(seg, p):
    (ax, ay), (bx, by) = seg
    ux, uy = bx - ax, by - ay
    den = ux * ux + uy * uy
    if den < 1e-24:
        return 0.0
    return ((p[0] - ax) * ux + (p[1] - ay) * uy) / den


def _split_mids(seg, other_edges):
    """Midpoints of the pieces of seg after splitting at every
    intersection with other_edges."""
    a, b = seg
    ts = {0.0, 1.0}
    for c, d in other_edges:
        ov = _collinear_overlap(a, b, c, d)
        if ov:
            ts.add(ov[0])
            ts.add(ov[1])
            continue
        if _seg_intersect(a, b, c, d):
            p = _cross_point(a, b, c, d)
            if p is not None:
                ts.add(max(0.0, min(1.0, _param_on(seg, p))))
    ss = sorted(ts)
    out = []
    for lo, hi in zip(ss, ss[1:]):
        if hi - lo > 1e-12:
            t = (lo + hi) / 2.0
            out.append((a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1])))
    return out


def _seg_covered(seg, edges):
    """Is seg fully covered by collinear overlaps with edges?"""
    a, b = seg
    ivs = []
    for c, d in edges:
        ov = _collinear_overlap(a, b, c, d)
        if ov:
            ivs.append(ov)
    ivs.sort()
    reach = 0.0
    for lo, hi in ivs:
        if lo > reach + 1e-9:
            return False
        reach = max(reach, hi)
    return reach >= 1.0 - 1e-9


def _geom_edges(k, d):
    segs = []
    if _class_of(k) == "L":
        for path in _paths(k, d):
            segs.extend(_segments(path))
    else:
        for rings in _polys(k, d):
            for ring in rings:
                r = _dedupe_closed(list(ring))
                segs.extend(_segments(r + [r[0]]))
    return segs


def _set_dim(m, idx, dim):
    order = {"F": 0, "0": 1, "1": 2, "2": 3}
    if order[dim] > order[m[idx]]:
        m[idx] = dim


def de9im(sa, sb):
    """The DE-9IM matrix of A vs B as a 9-char string (row-major over
    Interior/Boundary/Exterior, values F/0/1/2)."""
    ka, da = parse(sa)
    kb, db = parse(sb)
    if "GEOMETRYCOLLECTION" in (ka, kb):
        raise ValueError("relate: GEOMETRYCOLLECTION operands unsupported")
    if da is None or db is None:
        raise ValueError("relate: empty geometry operands unsupported")
    ca, cb = _class_of(ka), _class_of(kb)
    if (ca, cb) in (("L", "P"), ("A", "P"), ("A", "L")):
        t = de9im(sb, sa)
        return "".join(t[i] for i in (0, 3, 6, 1, 4, 7, 2, 5, 8))
    m = ["F"] * 9
    m[8] = "2"
    II, IB, IE, BI, BB, BE, EI, EB = range(8)

    if (ca, cb) == ("P", "P"):
        pa = [da] if ka == "POINT" else da
        pb = [db] if kb == "POINT" else db
        for p in pa:
            _set_dim(m, II if any(_near(p, q) for q in pb) else IE, "0")
        for q in pb:
            if not any(_near(q, p) for p in pa):
                _set_dim(m, EI, "0")
        return "".join(m)

    if (ca, cb) == ("P", "L"):
        pa = [da] if ka == "POINT" else da
        for p in pa:
            c = _classify_pt(p, kb, db)
            _set_dim(m, {"I": II, "B": IB, "E": IE}[c], "0")
        m[EI] = "1"
        for q in _line_boundary_pts(_paths(kb, db)):
            if not any(_near(q, p) for p in pa):
                _set_dim(m, EB, "0")
        return "".join(m)

    if (ca, cb) == ("P", "A"):
        pa = [da] if ka == "POINT" else da
        for p in pa:
            c = _classify_pt(p, kb, db)
            _set_dim(m, {"I": II, "B": IB, "E": IE}[c], "0")
        m[EI] = "2"
        m[EB] = "1"
        return "".join(m)

    if (ca, cb) == ("L", "L"):
        paths_a, paths_b = _paths(ka, da), _paths(kb, db)
        ea, eb = _geom_edges(ka, da), _geom_edges(kb, db)
        bnd_a, bnd_b = (
            _line_boundary_pts(paths_a),
            _line_boundary_pts(paths_b),
        )

        def cls_line(p, paths, bnd):
            on = any(
                _pt_seg_dist(p, x, y) < _EPS
                for path in paths
                for x, y in zip(path, path[1:])
            )
            if not on:
                return "E"
            return "B" if any(_near(p, q) for q in bnd) else "I"

        pts = set()
        for a, b in ea:
            for c, d in eb:
                if _collinear_overlap(a, b, c, d):
                    # positive-length common arc: its generic point is
                    # interior to both curves
                    _set_dim(m, II, "1")
                elif _seg_intersect(a, b, c, d):
                    p = _cross_point(a, b, c, d)
                    if p is not None:
                        pts.add((round(p[0], 9), round(p[1], 9)))
        for p in pts:
            x = cls_line(p, paths_a, bnd_a)
            y = cls_line(p, paths_b, bnd_b)
            idx = {
                ("I", "I"): II,
                ("I", "B"): IB,
                ("B", "I"): BI,
                ("B", "B"): BB,
            }.get((x, y))
            if idx is not None:
                _set_dim(m, idx, "0")
        if any(not _seg_covered(s, eb) for s in ea):
            _set_dim(m, IE, "1")
        if any(not _seg_covered(s, ea) for s in eb):
            _set_dim(m, EI, "1")
        for p in bnd_a:
            c = cls_line(p, paths_b, bnd_b)
            _set_dim(m, {"I": BI, "B": BB, "E": BE}[c], "0")
        for q in bnd_b:
            c = cls_line(q, paths_a, bnd_a)
            _set_dim(m, {"I": IB, "B": BB, "E": EB}[c], "0")
        return "".join(m)

    if (ca, cb) == ("L", "A"):
        paths_a = _paths(ka, da)
        bnd_a = _line_boundary_pts(paths_a)
        ea, eb = _geom_edges(ka, da), _geom_edges(kb, db)
        for seg in ea:
            for p in _split_mids(seg, eb):
                c = _classify_pt(p, kb, db)
                _set_dim(m, {"I": II, "B": IB, "E": IE}[c], "1")
        pts = set()
        for a, b in ea:
            for c, d in eb:
                if _collinear_overlap(a, b, c, d):
                    continue
                if _seg_intersect(a, b, c, d):
                    p = _cross_point(a, b, c, d)
                    if p is not None:
                        pts.add((round(p[0], 9), round(p[1], 9)))
        for p in pts:
            on_line_bnd = any(_near(p, q) for q in bnd_a)
            _set_dim(m, BB if on_line_bnd else IB, "0")
        for p in bnd_a:
            c = _classify_pt(p, kb, db)
            _set_dim(m, {"I": BI, "B": BB, "E": BE}[c], "0")
        m[EI] = "2"
        if any(not _seg_covered(s, ea) for s in eb):
            _set_dim(m, EB, "1")
        return "".join(m)

    # A x A
    for rings in _polys(ka, da) + _polys(kb, db):
        if len(rings) > 1:
            raise ValueError(
                "relate: polygons with holes are unsupported operands"
            )
    ea, eb = _geom_edges(ka, da), _geom_edges(kb, db)
    mids_a = [
        (p, _classify_pt(p, kb, db))
        for seg in ea
        for p in _split_mids(seg, eb)
    ]
    mids_b = [
        (p, _classify_pt(p, ka, da))
        for seg in eb
        for p in _split_mids(seg, ea)
    ]
    a_in = any(c == "I" for _, c in mids_a)
    b_in = any(c == "I" for _, c in mids_b)
    a_out = any(c == "E" for _, c in mids_a)
    b_out = any(c == "E" for _, c in mids_b)
    coincide = (
        mids_a
        and mids_b
        and all(c == "B" for _, c in mids_a)
        and all(c == "B" for _, c in mids_b)
    )
    if a_in or b_in or coincide:
        m[II] = "2"
    if b_in:
        _set_dim(m, IB, "1")
    if a_in:
        _set_dim(m, BI, "1")
    if a_out:
        m[IE] = "2"
        _set_dim(m, BE, "1")
    if b_out:
        m[EI] = "2"
        _set_dim(m, EB, "1")
    for a, b in ea:
        for c, d in eb:
            if _collinear_overlap(a, b, c, d):
                _set_dim(m, BB, "1")
            elif _seg_intersect(a, b, c, d):
                _set_dim(m, BB, "0")
    return "".join(m)


def relate(sa, sb, pattern):
    """ST_Relate: does the DE-9IM matrix match the T/F/*/0/1/2 mask?"""
    if len(pattern) != 9:
        raise ValueError("relate pattern must have 9 characters")
    got = de9im(sa, sb)
    for g, w in zip(got, pattern.upper()):
        if w == "*":
            continue
        if w == "T" and g == "F":
            return False
        if w == "F" and g != "F":
            return False
        if w in "012" and g != w:
            return False
    return True


def disjoint(sa, sb):
    return not intersects(sa, sb)


def crosses(sa, sb):
    """OGC crosses: dimension-dependent interior intersection."""
    ka, _ = parse(sa)
    kb, _ = parse(sb)
    na, nb = _DIMS[ka], _DIMS[kb]
    m = de9im(sa, sb)
    if na == nb == 1:
        return m[0] == "0"
    if na < nb:
        return m[0] != "F" and m[2] != "F"
    if na > nb:
        return m[0] != "F" and m[6] != "F"
    return False


def touches(sa, sb):
    """Boundaries meet, interiors don't."""
    m = de9im(sa, sb)
    return m[0] == "F" and (m[1] != "F" or m[3] != "F" or m[4] != "F")


def overlaps(sa, sb):
    """Same dimension, interiors partially shared, neither contains."""
    ka, _ = parse(sa)
    kb, _ = parse(sb)
    na, nb = _DIMS[ka], _DIMS[kb]
    if na != nb:
        return False
    m = de9im(sa, sb)
    if na == 1:
        return m[0] == "1" and m[2] != "F" and m[6] != "F"
    return m[0] != "F" and m[2] != "F" and m[6] != "F"


def equals_geom(sa, sb):
    """Point-set equality via the matrix (T*F**FFF*)."""
    m = de9im(sa, sb)
    return (
        m[0] != "F"
        and m[2] == "F"
        and m[5] == "F"
        and m[6] == "F"
        and m[7] == "F"
    )


def nearest_points(sa, sb):
    """Closest points on A and B -> [POINT, POINT] (reference
    geometry_nearest_points; JTS DistanceOp works on the boundaries/
    vertices, as here)."""
    ka, da = parse(sa)
    kb, db = parse(sb)
    if da is None or db is None:
        return None
    ea = _edges(ka, da)
    eb = _edges(kb, db)
    best = (float("inf"), None, None)
    if not ea and not eb:
        pa = _all_points(ka, da)
        pb = _all_points(kb, db)
        for p in pa:
            for q in pb:
                dist = math.hypot(p[0] - q[0], p[1] - q[1])
                if dist < best[0]:
                    best = (dist, p, q)
    elif not ea:
        for p in _all_points(ka, da):
            for c, d in eb:
                r = _seg_seg_nearest(p, p, c, d)
                if r[0] < best[0]:
                    best = r
    elif not eb:
        for q in _all_points(kb, db):
            for a, b in ea:
                r = _seg_seg_nearest(a, b, q, q)
                if r[0] < best[0]:
                    best = r
    else:
        for a, b in ea:
            for c, d in eb:
                r = _seg_seg_nearest(a, b, c, d)
                if r[0] < best[0]:
                    best = r
    return [emit("POINT", best[1]), emit("POINT", best[2])]


def _snap_pt(p, grid):
    return (round(p[0] / grid) * grid, round(p[1] / grid) * grid)


def _gather_groups(wkts, grid, who="union_many"):
    """Parse polygonal WKTs into snapped polygon GROUPS — one list of
    open rings per polygon, shell first then holes (r6: holes accepted).
    Degenerate rings are dropped; a polygon whose SHELL collapses is
    dropped entirely (its holes with it)."""
    groups = []
    for w in wkts:
        if w is None:
            continue
        k, d = parse(w)
        if d is None:
            continue
        if k == "POLYGON":
            polys = [d]
        elif k == "MULTIPOLYGON":
            polys = list(d)
        elif k == "GEOMETRYCOLLECTION":
            # r8: flatten polygonal members (non-polygonal raise below)
            groups.extend(_gather_groups(_gc_flatten(w) or [], grid, who))
            continue
        else:
            raise ValueError("%s: only polygonal inputs, got %r" % (who, k))
        for p in polys:
            rings = []
            for idx, ring in enumerate(p):
                rr = []
                for q in _open_ccw(ring):
                    sq = _snap_pt(q, grid)
                    if not rr or sq != rr[-1]:
                        rr.append(sq)
                if len(rr) > 1 and rr[0] == rr[-1]:
                    rr.pop()
                if len(rr) >= 3 and _ring_area2(rr) != 0:
                    if _ring_area2(rr) < 0:
                        rr = rr[::-1]
                    rings.append(rr)
                elif idx == 0:
                    rings = None  # shell collapsed: drop the polygon
                    break
            if rings:
                groups.append(rings)
    return groups


def _gather_rings(wkts, grid, who="union_many"):
    """Flattened snapped, open, CCW rings (holes included as rings)."""
    return [r for g in _gather_groups(wkts, grid, who) for r in g]


def _in_groups(p, groups):
    """Is p strictly interior to any polygon group (holes respected)?"""
    return any(_point_in_poly(p, g) == 1 for g in groups)


def _emit_groups(groups):
    """Emit polygon groups (lists of open rings) as POLYGON/MULTIPOLYGON."""
    if not groups:
        return "POLYGON EMPTY"
    closed = [[r + [r[0]] for r in g] for g in groups]
    if len(closed) == 1:
        return emit("POLYGON", closed[0])
    return emit("MULTIPOLYGON", closed)


def union_many(wkts, grid=1e-9):
    """N-way polygon union via the SNAPPED PLANAR ARRANGEMENT (reference
    plugin/trino-geospatial GeometryUnionAgg / Esri union): the
    arrangement machinery of _arrangement_boolean with coverage = "in
    any input" (point-in-polygon with holes — r6 accepts hole-bearing
    inputs). Snap-rounding makes the shared-edge / vertex-on-edge
    incidences that the pairwise Greiner-Hormann clipper refuses exact.
    Output may contain holes."""
    groups = _gather_groups(wkts, grid)
    if not groups:
        return None
    if len(groups) == 1:
        return _emit_groups(groups)

    def covered(p):
        return _in_groups(p, groups)

    rings = [r for g in groups for r in g]
    return _arrangement_boolean(rings, covered, grid)


def boolean_fallback(sa, sb, op, grid=1e-9):
    """Binary polygon boolean via the snapped arrangement — the
    degenerate-incidence path (shared edges, vertex-on-edge, collinear
    overlaps) the Greiner-Hormann clipper refuses. op in
    int/diff/sym (union goes through union_many). Areal semantics:
    dimension-collapsed pieces (a shared edge as an "intersection") are
    not emitted — consistent with the clipper's areal results."""

    ga = _gather_groups([sa], grid, who="st_" + op)
    gb = _gather_groups([sb], grid, who="st_" + op)
    if not ga:
        # A collapsed to nothing: empty sym B is B; int/diff are empty
        if op == "sym":
            return _emit_groups(gb)
        return "POLYGON EMPTY"
    if not gb:
        # B collapsed to nothing (e.g. a sliver snapped away): A minus
        # nothing is A; A sym nothing is A; A intersect nothing is empty
        if op == "int":
            return "POLYGON EMPTY"
        return _emit_groups(ga)

    if op == "int":
        covered = lambda p: _in_groups(p, ga) and _in_groups(p, gb)  # noqa: E731
    elif op == "diff":
        covered = lambda p: _in_groups(p, ga) and not _in_groups(p, gb)  # noqa: E731
    elif op == "sym":
        covered = lambda p: _in_groups(p, ga) != _in_groups(p, gb)  # noqa: E731
    else:
        raise ValueError("boolean_fallback: unknown op %r" % op)
    rings = [r for g in (*ga, *gb) for r in g]
    return _arrangement_boolean(rings, covered, grid)


def _arrangement_boolean(rings, covered, grid):
    """Shared machinery: split every edge at intersections with edges of
    other rings, keep sub-segments whose two sides differ under
    `covered` (probed at midpoint +- a small normal offset), orient
    interior-LEFT, stitch cycles by sharpest-left-turn walking, classify
    CW cycles as holes of their smallest containing shell."""
    import math

    # probe offset: small vs the thinnest feature, large vs the grid
    min_edge = None
    for r in rings:
        m = len(r)
        for i in range(m):
            a, b = r[i], r[(i + 1) % m]
            e = math.hypot(b[0] - a[0], b[1] - a[1])
            if e > 0 and (min_edge is None or e < min_edge):
                min_edge = e
    delta = max(grid * 4.0, min_edge * 1e-3)

    def seg_param(a, b, p):
        dx, dy = b[0] - a[0], b[1] - a[1]
        l2 = dx * dx + dy * dy
        if l2 == 0:
            return 0.0
        return ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / l2

    def seg_cross(a, b, c, d):
        """Points on ab where cd meets it (proper, touching, collinear)."""
        d1 = (b[0] - a[0], b[1] - a[1])
        d2 = (d[0] - c[0], d[1] - c[1])
        den = d1[0] * d2[1] - d1[1] * d2[0]
        pts = []
        if den != 0:
            t = ((c[0] - a[0]) * d2[1] - (c[1] - a[1]) * d2[0]) / den
            u = ((c[0] - a[0]) * d1[1] - (c[1] - a[1]) * d1[0]) / den
            if -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12:
                pts.append((a[0] + t * d1[0], a[1] + t * d1[1]))
        else:
            scale = max(1.0, abs(d1[0]) + abs(d1[1]))
            cross = d1[0] * (c[1] - a[1]) - d1[1] * (c[0] - a[0])
            if abs(cross) < 1e-9 * scale:  # collinear overlap
                for p in (c, d):
                    t = seg_param(a, b, p)
                    if 0 < t < 1:
                        pts.append(
                            (a[0] + t * d1[0], a[1] + t * d1[1])
                        )
        return pts

    edges = []
    for ri, r in enumerate(rings):
        m = len(r)
        for i in range(m):
            edges.append((ri, r[i], r[(i + 1) % m]))

    subsegs = []
    for ri, a, b in edges:
        cuts = [0.0, 1.0]
        for rj, c, d in edges:
            if rj == ri:
                continue
            for p in seg_cross(a, b, c, d):
                t = seg_param(a, b, p)
                if 1e-12 < t < 1 - 1e-12:
                    cuts.append(t)
        cuts = sorted(set(cuts))
        for t0, t1 in zip(cuts, cuts[1:]):
            p0 = _snap_pt(
                (a[0] + t0 * (b[0] - a[0]), a[1] + t0 * (b[1] - a[1])),
                grid,
            )
            p1 = _snap_pt(
                (a[0] + t1 * (b[0] - a[0]), a[1] + t1 * (b[1] - a[1])),
                grid,
            )
            if p0 != p1:
                subsegs.append((p0, p1))

    keep = set()
    for p0, p1 in subsegs:
        mx, my = (p0[0] + p1[0]) / 2.0, (p0[1] + p1[1]) / 2.0
        dx, dy = p1[0] - p0[0], p1[1] - p0[1]
        ln = math.hypot(dx, dy)
        nx, ny = -dy / ln, dx / ln  # left normal
        left = covered((mx + nx * delta, my + ny * delta))
        right = covered((mx - nx * delta, my - ny * delta))
        if left and not right:
            keep.add((p0, p1))
        elif right and not left:
            keep.add((p1, p0))
        # both covered (interior) or neither (numerical sliver): drop

    if not keep:
        return "POLYGON EMPTY"

    out_map = {}
    for s, e in keep:
        out_map.setdefault(s, []).append(e)
    cycles = []
    unused = set(keep)
    while unused:
        start, nxt = next(iter(unused))
        unused.discard((start, nxt))
        cyc = [start]
        prev, cur = start, nxt
        guard = 0
        while cur != start:
            cyc.append(cur)
            outs = [e for e in out_map.get(cur, []) if (cur, e) in unused]
            if not outs:
                cyc = None  # dangling walk (numeric noise): abandon
                break
            if len(outs) == 1:
                chosen = outs[0]
            else:
                ia = math.atan2(cur[1] - prev[1], cur[0] - prev[0])

                def turn(e):
                    oa = math.atan2(e[1] - cur[1], e[0] - cur[0])
                    return (oa - ia + math.pi) % (2 * math.pi)

                chosen = max(outs, key=turn)  # sharpest left turn
            unused.discard((cur, chosen))
            prev, cur = cur, chosen
            guard += 1
            if guard > len(keep) + 1:
                cyc = None
                break
        if cyc is not None and len(cyc) >= 3:
            cycles.append(cyc)

    shells, holes = [], []
    for c in cycles:
        a2 = _ring_area2(c)
        if a2 > 0:
            shells.append(c)
        elif a2 < 0:
            holes.append(c)
    if not shells:
        return "POLYGON EMPTY"
    polys = [[s + [s[0]]] for s in shells]
    for h in holes:
        best_i, best_a = None, None
        for i, s in enumerate(shells):
            if _point_in_ring(h[0], s) == 1:
                a = abs(_ring_area2(s))
                if best_a is None or a < best_a:
                    best_i, best_a = i, a
        if best_i is not None:
            polys[best_i].append(h + [h[0]])
    if len(polys) == 1:
        return emit("POLYGON", polys[0])
    return emit("MULTIPOLYGON", polys)
'''


def _geo_ns():
    ns: dict = {}
    exec(_GEO_SRC, ns)
    return ns


def _str_fn(name, impl):
    @pandas_udf("string")
    def fn(s):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        f = ns[impl]
        return pd.Series([None if v is None else f(v) for v in s])

    fn.__name__ = name
    return fn


def _dbl_fn(name, impl):
    @pandas_udf("double")
    def fn(s):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        f = ns[impl]
        return pd.Series([None if v is None else f(v) for v in s])

    fn.__name__ = name
    return fn


def register_geometry_udfs(spark: SparkSession) -> int:
    """Register the ST_* family; names are lowercase (Spark resolves
    case-insensitively, matching Trino's ST_Xxx spellings)."""
    import pandas as pd  # noqa: F401

    from pyspark.sql.functions import pandas_udf as _pudf

    fns = {}

    @_pudf("string")
    def st_geometry_from_text(s):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        out = []
        for v in s:
            if v is None:
                out.append(None)
            else:
                k, d = ns["parse"](v)
                out.append(ns["emit"](k, d))
        return pd.Series(out)

    fns["st_geometryfromtext"] = st_geometry_from_text
    fns["st_astext"] = st_geometry_from_text  # canonical text either way

    @_pudf("string")
    def st_geometry_type(s):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        names = {
            "POINT": "ST_Point",
            "MULTIPOINT": "ST_MultiPoint",
            "LINESTRING": "ST_LineString",
            "MULTILINESTRING": "ST_MultiLineString",
            "POLYGON": "ST_Polygon",
            "MULTIPOLYGON": "ST_MultiPolygon",
            "GEOMETRYCOLLECTION": "ST_GeomCollection",
        }
        return pd.Series(
            [None if v is None else names[ns["parse"](v)[0]] for v in s]
        )

    fns["st_geometrytype"] = st_geometry_type

    @_pudf("double")
    def st_x(s):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)

        def go(v):
            if v is None:
                return None
            k, d = ns["parse"](v)
            if k != "POINT" or d is None:
                raise ValueError("ST_X: not a point: %r" % v)
            return d[0]

        return pd.Series([go(v) for v in s])

    @_pudf("double")
    def st_y(s):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)

        def go(v):
            if v is None:
                return None
            k, d = ns["parse"](v)
            if k != "POINT" or d is None:
                raise ValueError("ST_Y: not a point: %r" % v)
            return d[1]

        return pd.Series([go(v) for v in s])

    fns["st_x"] = st_x
    fns["st_y"] = st_y

    fns["st_area"] = _dbl_fn("st_area", "area")
    fns["st_length"] = _dbl_fn("st_length", "length")
    fns["st_perimeter"] = _dbl_fn("st_perimeter", "perimeter")
    fns["st_centroid"] = _str_fn("st_centroid", "centroid")
    fns["st_envelope"] = _str_fn("st_envelope", "envelope")

    for nm, idx in (
        ("st_xmin", 0),
        ("st_ymin", 1),
        ("st_xmax", 2),
        ("st_ymax", 3),
    ):

        def make(i):
            @_pudf("double")
            def fn(s):
                import pandas as pd

                ns: dict = {}
                exec(_GEO_SRC, ns)

                def go(v):
                    if v is None:
                        return None
                    b = ns["bounds"](v)
                    return None if b is None else b[i]

                return pd.Series([go(v) for v in s])

            return fn

        fns[nm] = make(idx)

    @_pudf("int")
    def st_num_points(s):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        return pd.Series(
            [
                None
                if v is None
                else len(ns["_all_points"](*ns["parse"](v)))
                for v in s
            ]
        )

    fns["st_numpoints"] = st_num_points

    @_pudf("boolean")
    def st_is_closed(s):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)

        def go(v):
            if v is None:
                return None
            k, d = ns["parse"](v)
            if k == "LINESTRING":
                return d is not None and d[0] == d[-1]
            if k == "MULTILINESTRING":
                return d is not None and all(p[0] == p[-1] for p in d)
            return None

        return pd.Series([go(v) for v in s])

    fns["st_isclosed"] = st_is_closed

    @_pudf("boolean")
    def st_is_empty(s):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        return pd.Series(
            [None if v is None else ns["parse"](v)[1] is None for v in s]
        )

    fns["st_isempty"] = st_is_empty

    def _bool2(name, impl, swap=False):
        @_pudf("boolean")
        def fn(a, b):
            import pandas as pd

            ns: dict = {}
            exec(_GEO_SRC, ns)
            f = ns[impl]

            def go(x, y):
                if x is None or y is None:
                    return None
                return f(y, x) if swap else f(x, y)

            return pd.Series([go(x, y) for x, y in zip(a, b)])

        fn.__name__ = name
        return fn

    fns["st_contains"] = _bool2("st_contains", "contains")
    fns["st_within"] = _bool2("st_within", "contains", swap=True)
    fns["st_intersects"] = _bool2("st_intersects", "intersects")
    fns["st_crosses"] = _bool2("st_crosses", "crosses")
    fns["st_disjoint"] = _bool2("st_disjoint", "disjoint")
    fns["st_equals"] = _bool2("st_equals", "equals_geom")
    fns["st_overlaps"] = _bool2("st_overlaps", "overlaps")
    fns["st_touches"] = _bool2("st_touches", "touches")

    @_pudf("boolean")
    def st_relate(a, b, pat):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        f = ns["relate"]
        return pd.Series(
            [
                None if x is None or y is None or w is None else f(x, y, w)
                for x, y, w in zip(a, b, pat)
            ]
        )

    fns["st_relate"] = st_relate

    @_pudf("double")
    def st_distance(a, b):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        f = ns["distance"]
        return pd.Series(
            [
                None if x is None or y is None else f(x, y)
                for x, y in zip(a, b)
            ]
        )

    fns["st_distance"] = st_distance

    # --- set operations / constructive geometry (reference
    # GeoFunctions.java stBuffer/stUnion/stIntersection/stConvexHull/
    # stSimplifyGeometry) — planar-kernel subset; untractable inputs
    # raise rather than approximate (see kernel docstrings). ---
    fns["st_convexhull"] = _str_fn("st_convexhull", "convex_hull")
    # the reference spells it ST_ConvexHull (one word); keep the
    # underscored alias for back-compat with earlier rounds' queries
    fns["st_convex_hull"] = fns["st_convexhull"]

    def _str2_fn(name, impl):
        @_pudf("string")
        def fn(a, b):
            import pandas as pd

            ns: dict = {}
            exec(_GEO_SRC, ns)
            f = ns[impl]
            return pd.Series(
                [
                    None if x is None or y is None else f(x, y)
                    for x, y in zip(a, b)
                ]
            )

        fn.__name__ = name
        return fn

    fns["st_intersection"] = _str2_fn("st_intersection", "intersection")
    fns["st_union"] = _str2_fn("st_union", "union_geom")
    fns["st_difference"] = _str2_fn("st_difference", "difference")
    fns["st_symdifference"] = _str2_fn("st_symdifference", "sym_difference")

    def _geo_num_fn(name, impl):
        @_pudf("string")
        def fn(g, x):
            import pandas as pd

            ns: dict = {}
            exec(_GEO_SRC, ns)
            f = ns[impl]
            return pd.Series(
                [
                    None if gv is None or xv is None else f(gv, float(xv))
                    for gv, xv in zip(g, x)
                ]
            )

        fn.__name__ = name
        return fn

    fns["st_buffer"] = _geo_num_fn("st_buffer", "buffer_geom")
    fns["st_simplify"] = _geo_num_fn("st_simplify", "simplify")
    fns["simplify_geometry"] = _geo_num_fn("simplify_geometry", "simplify")

    # --- accessors (reference GeoFunctions.java, citations in the
    # kernel docstrings) ---
    def _typed_fn(name, impl, rtype):
        @_pudf(rtype)
        def fn(s):
            import pandas as pd

            ns: dict = {}
            exec(_GEO_SRC, ns)
            f = ns[impl]
            return pd.Series([None if v is None else f(v) for v in s])

        fn.__name__ = name
        return fn

    def _geo_int_fn(name, impl, rtype="string"):
        """(geometry, 1-based int index) -> rtype."""

        @_pudf(rtype)
        def fn(g, i):
            import pandas as pd

            ns: dict = {}
            exec(_GEO_SRC, ns)
            f = ns[impl]
            return pd.Series(
                [
                    None if gv is None or iv is None else f(gv, int(iv))
                    for gv, iv in zip(g, i)
                ]
            )

        fn.__name__ = name
        return fn

    fns["st_dimension"] = _typed_fn("st_dimension", "dimension", "int")
    fns["st_coorddim"] = _typed_fn("st_coorddim", "coord_dim", "int")
    fns["st_boundary"] = _str_fn("st_boundary", "boundary")
    fns["st_startpoint"] = _str_fn("st_startpoint", "start_point")
    fns["st_endpoint"] = _str_fn("st_endpoint", "end_point")
    fns["st_exteriorring"] = _str_fn("st_exteriorring", "exterior_ring")
    fns["st_numinteriorring"] = _typed_fn(
        "st_numinteriorring", "num_interior_ring", "int"
    )
    fns["st_numgeometries"] = _typed_fn(
        "st_numgeometries", "num_geometries", "int"
    )
    fns["st_pointn"] = _geo_int_fn("st_pointn", "point_n")
    fns["st_interiorringn"] = _geo_int_fn(
        "st_interiorringn", "interior_ring_n"
    )
    fns["st_geometryn"] = _geo_int_fn("st_geometryn", "geometry_n")
    fns["st_geometries"] = _typed_fn(
        "st_geometries", "geometries", "array<string>"
    )
    fns["st_points"] = _typed_fn("st_points", "points_of", "array<string>")
    fns["st_interiorrings"] = _typed_fn(
        "st_interiorrings", "interior_rings", "array<string>"
    )
    fns["st_envelopeaspts"] = _typed_fn(
        "st_envelopeaspts", "envelope_as_pts", "array<string>"
    )
    fns["st_isring"] = _typed_fn("st_isring", "is_ring", "boolean")
    fns["st_issimple"] = _typed_fn("st_issimple", "is_simple", "boolean")
    fns["st_isvalid"] = _typed_fn("st_isvalid", "is_valid", "boolean")
    fns["geometry_invalid_reason"] = _typed_fn(
        "geometry_invalid_reason", "invalid_reason", "string"
    )

    @_pudf("double")
    def line_locate_point(line, pt):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        f = ns["line_locate_point"]
        return pd.Series(
            [
                None if a is None or b is None else f(a, b)
                for a, b in zip(line, pt)
            ]
        )

    fns["line_locate_point"] = line_locate_point

    @_pudf("string")
    def line_interpolate_point(line, frac):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        f = ns["_line_interpolate"]

        def go(a, fr):
            if a is None or fr is None:
                return None
            pts = f(a, float(fr), False)
            return None if pts is None else pts[0]

        return pd.Series([go(a, fr) for a, fr in zip(line, frac)])

    fns["line_interpolate_point"] = line_interpolate_point

    @_pudf("array<string>")
    def line_interpolate_points(line, frac):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        f = ns["_line_interpolate"]
        return pd.Series(
            [
                None
                if a is None or fr is None
                else f(a, float(fr), True)
                for a, fr in zip(line, frac)
            ]
        )

    fns["line_interpolate_points"] = line_interpolate_points

    @_pudf("array<string>")
    def geometry_nearest_points(a, b):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        f = ns["nearest_points"]
        return pd.Series(
            [
                None if x is None or y is None else f(x, y)
                for x, y in zip(a, b)
            ]
        )

    fns["geometry_nearest_points"] = geometry_nearest_points

    def _parse_as(name, want):
        @_pudf("string")
        def fn(s):
            import pandas as pd

            ns: dict = {}
            exec(_GEO_SRC, ns)

            def go(v):
                if v is None:
                    return None
                k, d = ns["parse"](v)
                if k != want:
                    raise ValueError(
                        "%s: expected %s, got %s" % (name, want, k)
                    )
                return ns["emit"](k, d)

            return pd.Series([go(v) for v in s])

        fn.__name__ = name
        return fn

    fns["st_linefromtext"] = _parse_as("st_linefromtext", "LINESTRING")
    fns["st_polygon"] = _parse_as("st_polygon", "POLYGON")

    @_pudf("string")
    def st_linestring(pts):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)

        def go(arr):
            if arr is None:
                return None
            coords = []
            for w in arr:
                k, d = ns["parse"](w)
                if k != "POINT" or d is None:
                    raise ValueError(
                        "ST_LineString: array must contain only non-empty"
                        " points"
                    )
                coords.append(d)
            if len(coords) < 2:
                return "LINESTRING EMPTY"
            return ns["emit"]("LINESTRING", coords)

        return pd.Series([go(arr) for arr in pts])

    fns["st_linestring"] = st_linestring

    @_pudf("string")
    def st_multipoint(pts):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)

        def go(arr):
            if arr is None:
                return None
            coords = []
            for w in arr:
                k, d = ns["parse"](w)
                if k != "POINT" or d is None:
                    raise ValueError(
                        "ST_MultiPoint: array must contain only non-empty"
                        " points"
                    )
                coords.append(d)
            if not coords:
                return None
            return ns["emit"]("MULTIPOINT", coords)

        return pd.Series([go(arr) for arr in pts])

    fns["st_multipoint"] = st_multipoint

    @_pudf("string")
    def geometry_union(geoms):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        pair, many = ns["union_geom"], ns["union_many"]

        def go(arr):
            if arr is None:
                return None
            wkts = [w for w in arr if w is not None]
            if not wkts:
                return None
            if len(wkts) == 1:
                return wkts[0]
            kinds = {ns["parse"](w)[0] for w in wkts}
            if kinds <= {"POLYGON", "MULTIPOLYGON"}:
                # N-way polygonal union: one arrangement pass (r5; holes
                # accepted r6) — robust to the shared-edge chains a
                # pairwise fold hits
                return many(wkts)
            acc = None
            for w in wkts:
                acc = w if acc is None else pair(acc, w)
            return acc

        return pd.Series([go(arr) for arr in geoms])

    fns["geometry_union"] = geometry_union

    # --- codecs + spherical geography ---
    @_pudf("binary")
    def st_asbinary(s):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        f = ns["to_wkb"]
        return pd.Series([None if v is None else f(v) for v in s])

    fns["st_asbinary"] = st_asbinary

    @_pudf("string")
    def st_geomfrombinary(b):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        f = ns["from_wkb"]
        return pd.Series([None if v is None else f(bytes(v)) for v in b])

    fns["st_geomfrombinary"] = st_geomfrombinary

    fns["to_geojson_geometry"] = _str_fn("to_geojson_geometry", "to_geojson")
    fns["from_geojson_geometry"] = _str_fn(
        "from_geojson_geometry", "from_geojson"
    )
    fns["to_encoded_polyline"] = _str_fn("to_encoded_polyline", "to_polyline")
    fns["from_encoded_polyline"] = _str_fn(
        "from_encoded_polyline", "from_polyline"
    )
    fns["to_spherical_geography"] = _str_fn(
        "to_spherical_geography", "to_spherical"
    )
    fns["to_geometry"] = _str_fn("to_geometry", "to_spherical")
    fns["st_spherical_area"] = _dbl_fn("st_spherical_area", "spherical_area")
    fns["st_spherical_length"] = _dbl_fn(
        "st_spherical_length", "spherical_length"
    )

    @_pudf("double")
    def st_spherical_distance(a, b):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        f = ns["spherical_distance"]
        return pd.Series(
            [
                None if x is None or y is None else f(x, y)
                for x, y in zip(a, b)
            ]
        )

    fns["st_spherical_distance"] = st_spherical_distance

    # --- Bing tiles over geometries ---
    @_pudf("string")
    def bing_tile_polygon(t):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        f = ns["bing_tile_polygon"]
        return pd.Series([None if v is None else f(int(v)) for v in t])

    fns["bing_tile_polygon"] = bing_tile_polygon

    @_pudf("array<bigint>")
    def bing_tiles_around_radius(lat, lon, zoom, radius):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        f = ns["bing_tiles_around_radius"]
        return pd.Series(
            [
                None
                if any(v is None for v in (a, o, z, r))
                else f(float(a), float(o), int(z), float(r))
                for a, o, z, r in zip(lat, lon, zoom, radius)
            ]
        )

    fns["bing_tiles_around_radius"] = bing_tiles_around_radius

    @_pudf("array<bigint>")
    def geometry_to_bing_tiles(g, zoom):
        import pandas as pd

        ns: dict = {}
        exec(_GEO_SRC, ns)
        f = ns["geometry_to_bing_tiles"]
        return pd.Series(
            [
                None if gv is None or zv is None else f(gv, int(zv))
                for gv, zv in zip(g, zoom)
            ]
        )

    fns["geometry_to_bing_tiles"] = geometry_to_bing_tiles

    for name, fn in fns.items():
        spark.udf.register(name, fn)
    return len(fns)
