"""Mixed-dimension boolean ops (geom/boolean.py _mixed_boolean): GEOS
dimension rules for point/line/polygon operand combinations. Pure numpy
— no Spark session needed."""

import math

import numpy as np
import pytest

from arctic_spark.geom import wkt
from arctic_spark.geom.boolean import boolean_pair
from arctic_spark.geom.ragged import (LINESTRING, MULTILINESTRING,
                                      MULTIPOINT, POINT, POLYGON)

DONUT = "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"
SQUARE = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"


def _g(text):
    r = wkt.parse([text])
    return r.geom(0)


def _length(g):
    xs, ys, rings = g[1], g[2], g[3]
    total, off = 0.0, 0
    for rl in rings:
        total += float(np.hypot(np.diff(xs[off:off + rl]),
                                np.diff(ys[off:off + rl])).sum())
        off += rl
    return total


def test_line_intersection_donut():
    # y=3 crosses the donut: inside = [0,2] + [4,6] (the hole is out)
    line = _g("LINESTRING (-1 3, 7 3)")
    out = boolean_pair(line, _g(DONUT), "intersection")
    assert out[0] == MULTILINESTRING
    assert len(out[3]) == 2
    assert _length(out) == pytest.approx(4.0, abs=1e-9)


def test_line_difference_donut():
    # outside = [-1,0] + the hole span [2,4] + [6,7]
    line = _g("LINESTRING (-1 3, 7 3)")
    out = boolean_pair(line, _g(DONUT), "difference")
    assert out[0] == MULTILINESTRING
    assert len(out[3]) == 3
    assert _length(out) == pytest.approx(4.0, abs=1e-9)


def test_line_fully_inside_and_outside():
    inside = boolean_pair(_g("LINESTRING (1 1, 1 5, 5 5)"),
                          _g(SQUARE), "intersection")
    assert inside[0] == LINESTRING
    assert _length(inside) == pytest.approx(8.0)
    gone = boolean_pair(_g("LINESTRING (1 1, 1 5, 5 5)"),
                        _g(SQUARE), "difference")
    assert len(gone[1]) == 0  # empty
    outside = boolean_pair(_g("LINESTRING (20 20, 30 20)"),
                           _g(SQUARE), "intersection")
    assert len(outside[1]) == 0 and outside[0] == LINESTRING


def test_polygon_line_orders_commute_for_intersection():
    line = _g("LINESTRING (-5 5, 15 5)")
    a = boolean_pair(line, _g(SQUARE), "intersection")
    b = boolean_pair(_g(SQUARE), line, "intersection")
    assert _length(a) == pytest.approx(10.0)
    assert _length(b) == pytest.approx(10.0)


def test_polygon_minus_line_unchanged():
    out = boolean_pair(_g(SQUARE), _g("LINESTRING (-5 5, 15 5)"),
                       "difference")
    assert out[0] == POLYGON and len(out[1]) == 5


def test_diagonal_clip():
    # diagonal through the unit square [0,10]^2 from (-5,-5) to (15,15):
    # inside length = 10*sqrt(2)
    out = boolean_pair(_g("LINESTRING (-5 -5, 15 15)"), _g(SQUARE),
                       "intersection")
    assert _length(out) == pytest.approx(10 * math.sqrt(2), rel=1e-12)


def test_point_ops():
    pts = _g("MULTIPOINT (1 1, 5 5, 20 20)")
    ix = boolean_pair(pts, _g(SQUARE), "intersection")
    assert ix[0] == MULTIPOINT and len(ix[1]) == 2
    df = boolean_pair(pts, _g(SQUARE), "difference")
    assert df[0] == POINT and (df[1][0], df[2][0]) == (20.0, 20.0)
    # boundary point is covered (closed set)
    onb = boolean_pair(_g("POINT (0 5)"), _g(SQUARE), "intersection")
    assert len(onb[1]) == 1
    # point on a line / off a line
    assert len(boolean_pair(_g("POINT (2 2)"),
                            _g("LINESTRING (0 0, 4 4)"),
                            "intersection")[1]) == 1
    assert len(boolean_pair(_g("POINT (2 3)"),
                            _g("LINESTRING (0 0, 4 4)"),
                            "intersection")[1]) == 0


def test_point_set_algebra():
    a = _g("MULTIPOINT (0 0, 1 1, 2 2)")
    b = _g("MULTIPOINT (1 1, 3 3)")
    assert len(boolean_pair(a, b, "intersection")[1]) == 1
    assert len(boolean_pair(a, b, "difference")[1]) == 2
    assert len(boolean_pair(a, b, "union")[1]) == 4
    assert len(boolean_pair(a, b, "symmetric_difference")[1]) == 3


def test_line_line_crossing_points():
    out = boolean_pair(_g("LINESTRING (0 0, 4 4)"),
                       _g("LINESTRING (0 4, 4 0)"), "intersection")
    assert out[0] == POINT
    assert (out[1][0], out[2][0]) == (2.0, 2.0)
    none = boolean_pair(_g("LINESTRING (0 0, 1 0)"),
                        _g("LINESTRING (0 1, 1 1)"), "intersection")
    assert len(none[1]) == 0 and none[0] == POINT
    # difference of crossing lines removes zero measure
    diff = boolean_pair(_g("LINESTRING (0 0, 4 4)"),
                        _g("LINESTRING (0 4, 4 0)"), "difference")
    assert _length(diff) == pytest.approx(4 * math.sqrt(2))


def test_collinear_overlap_ops():
    # [0,4] and [2,6] on the x-axis: overlap [2,4]
    a = _g("LINESTRING (0 0, 4 0)")
    b = _g("LINESTRING (2 0, 6 0)")
    ix = boolean_pair(a, b, "intersection")
    assert ix[0] == LINESTRING
    assert _length(ix) == pytest.approx(2.0)
    df = boolean_pair(a, b, "difference")
    assert _length(df) == pytest.approx(2.0)  # [0,2]
    assert float(df[1].max()) == pytest.approx(2.0)
    un = boolean_pair(a, b, "union")
    assert _length(un) == pytest.approx(6.0)  # [0,6] total measure
    sd = boolean_pair(a, b, "symmetric_difference")
    assert _length(sd) == pytest.approx(4.0)  # [0,2] + [4,6]
    # fully contained: [1,3] within [0,4]
    c = _g("LINESTRING (1 0, 3 0)")
    assert _length(boolean_pair(c, a, "intersection")) == pytest.approx(2.0)
    assert len(boolean_pair(c, a, "difference")[1]) == 0
    assert _length(boolean_pair(a, c, "difference")) == pytest.approx(2.0)
    assert _length(boolean_pair(a, c, "union")) == pytest.approx(4.0)
    # overlap + an isolated crossing elsewhere → GeometryCollection
    # (round 6; used to raise)
    from arctic_spark.geom.ragged import (GEOMETRYCOLLECTION as GC,
                                          POINT as PT, gc_iter)
    d = _g("MULTILINESTRING ((2 0, 6 0), (1 -1, 1 1))")
    gc = boolean_pair(a, d, "intersection")
    assert gc[0] == GC
    kinds = sorted(s[0] for s in gc_iter(gc))
    assert kinds == [PT, LINESTRING]
    # merely touching at an endpoint is NOT a 1-D overlap
    e = _g("LINESTRING (4 0, 4 4)")
    assert _length(boolean_pair(a, e, "union")) == pytest.approx(8.0)


def test_mixed_dim_union_is_gc():
    """Round 6: mixed-dimension union/symdiff return GeometryCollection
    (used to raise NotImplementedError)."""
    from arctic_spark.geom.ragged import (GEOMETRYCOLLECTION as GC,
                                          POINT as PT, POLYGON as PG,
                                          gc_iter)
    u = boolean_pair(_g("LINESTRING (-2 1, 4 1)"), _g(SQUARE), "union")
    assert u[0] == GC
    assert sorted(s[0] for s in gc_iter(u)) == [LINESTRING, PG]
    # fully-inside line: union collapses to the polygon alone
    u2 = boolean_pair(_g("LINESTRING (0 0, 4 4)"), _g(SQUARE), "union")
    assert u2[0] == PG
    s = boolean_pair(_g("POINT (99 99)"), _g(SQUARE),
                     "symmetric_difference")
    assert s[0] == GC
    assert sorted(x[0] for x in gc_iter(s)) == [PT, PG]
    # point inside the square: symdiff is just the square
    s2 = boolean_pair(_g("POINT (1 1)"), _g(SQUARE),
                      "symmetric_difference")
    assert s2[0] == PG


def test_empty_operand_typing():
    line = _g("LINESTRING (0 0, 1 1)")
    out = boolean_pair(line, _g("POLYGON EMPTY"), "intersection")
    assert out[0] == LINESTRING and len(out[1]) == 0
    out = boolean_pair(_g("POINT EMPTY"), line, "intersection")
    assert out[0] == POINT and len(out[1]) == 0
    assert boolean_pair(line, _g("POLYGON EMPTY"), "difference")[0] \
        == LINESTRING
    # union with one empty returns the other operand unchanged
    u = boolean_pair(_g("LINESTRING EMPTY"), line, "union")
    assert _length(u) == pytest.approx(math.sqrt(2))


def test_vertex_on_boundary_split():
    # line enters through a vertex of the square: exact split at (0,0)
    out = boolean_pair(_g("LINESTRING (-2 -2, 2 2)"), _g(SQUARE),
                       "intersection")
    assert _length(out) == pytest.approx(2 * math.sqrt(2), rel=1e-9)


def test_line_along_boundary_is_covered():
    # a segment ON the boundary belongs to the closed polygon: kept by
    # intersection, removed by difference
    seg = _g("LINESTRING (2 0, 8 0)")
    ix = boolean_pair(seg, _g(SQUARE), "intersection")
    assert _length(ix) == pytest.approx(6.0)
    df = boolean_pair(seg, _g(SQUARE), "difference")
    assert len(df[1]) == 0


# ---- r7: GEOS OverlayNG noding of line/line results ---------------------

def _parts(g):
    xs, ys, rings = g[1], g[2], g[3]
    out, off = [], 0
    for rl in rings:
        out.append(list(zip(xs[off:off + rl].tolist(),
                            ys[off:off + rl].tolist())))
        off += rl
    return out


def test_union_crossing_lines_is_noded():
    # GEOS: MULTILINESTRING of 4 pieces split at the crossing (5, 0)
    a = _g("LINESTRING (0 0, 10 0)")
    b = _g("LINESTRING (5 -5, 5 5)")
    out = boolean_pair(a, b, "union")
    assert out[0] == MULTILINESTRING
    assert _parts(out) == [[(0, 0), (5, 0)], [(5, 0), (10, 0)],
                           [(5, -5), (5, 0)], [(5, 0), (5, 5)]]
    sym = boolean_pair(a, b, "symmetric_difference")
    assert _parts(sym) == _parts(out)


def test_difference_crossing_lines_is_noded():
    a = _g("LINESTRING (0 0, 10 0)")
    b = _g("LINESTRING (5 -5, 5 5)")
    out = boolean_pair(a, b, "difference")
    assert _parts(out) == [[(0, 0), (5, 0)], [(5, 0), (10, 0)]]


def test_union_interior_touch_nodes_touched_side_only():
    # b's endpoint on a's interior: a splits at (3,0), b stays whole
    a = _g("LINESTRING (0 0, 10 0)")
    b = _g("LINESTRING (3 0, 3 4)")
    out = boolean_pair(a, b, "union")
    assert _parts(out) == [[(0, 0), (3, 0)], [(3, 0), (10, 0)],
                           [(3, 0), (3, 4)]]


def test_union_overlap_nodes_subject_at_overlap_endpoints():
    # collinear overlap on [5,10]: GEOS nodes the kept subject there
    a = _g("LINESTRING (0 0, 10 0)")
    b = _g("LINESTRING (5 0, 12 0)")
    out = boolean_pair(a, b, "union")
    assert _parts(out) == [[(0, 0), (5, 0)], [(5, 0), (10, 0)],
                           [(10, 0), (12, 0)]]
    sym = boolean_pair(a, b, "symmetric_difference")
    assert _parts(sym) == [[(0, 0), (5, 0)], [(10, 0), (12, 0)]]


def test_union_chain_keeps_interior_vertices_between_nodes():
    # crossing at (0.5, 0); the chain through (1,0) is NOT a node
    a = _g("LINESTRING (0 0, 1 0, 2 0)")
    b = _g("LINESTRING (0.5 -1, 0.5 1)")
    out = boolean_pair(a, b, "union")
    assert _parts(out) == [[(0, 0), (0.5, 0)], [(0.5, 0), (1, 0), (2, 0)],
                           [(0.5, -1), (0.5, 0)], [(0.5, 0), (0.5, 1)]]


def test_union_identical_lines_is_one_line():
    a = _g("LINESTRING (0 0, 10 0)")
    out = boolean_pair(a, _g("LINESTRING (0 0, 10 0)"), "union")
    assert out[0] == LINESTRING
    assert _parts(out) == [[(0, 0), (10, 0)]]


def test_union_overlap_plus_offoverlap_crossing():
    # overlap on [5,10] AND an off-overlap crossing at (2,0)
    a = _g("LINESTRING (0 0, 10 0)")
    b = _g("LINESTRING (5 0, 10 0, 10 5, 2 5, 2 -5)")
    out = boolean_pair(a, b, "union")
    assert _parts(out) == [
        [(0, 0), (2, 0)], [(2, 0), (5, 0)], [(5, 0), (10, 0)],
        [(10, 0), (10, 5), (2, 5), (2, 0)], [(2, 0), (2, -5)]]
