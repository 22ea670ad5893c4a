"""Property-based tests (hypothesis) for the geometry core — no Spark.

Invariants: WKT/WKB round trips are identity; area/length are
translation-invariant and rotation-invariant; convex hull contains all
input points' bbox; explode preserves coordinate multiset.
"""

import math

import numpy as np
from hypothesis import given, settings, strategies as st_

from arctic_spark.geom import algos, ragged, wkb, wkt

coord = st_.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                   allow_infinity=False, width=64)


@st_.composite
def rand_point(draw):
    return ragged.POINT, [draw(coord)], [draw(coord)], [1], [1]


@st_.composite
def rand_linestring(draw):
    n = draw(st_.integers(2, 12))
    xs = draw(st_.lists(coord, min_size=n, max_size=n))
    ys = draw(st_.lists(coord, min_size=n, max_size=n))
    return ragged.LINESTRING, xs, ys, [n], [1]


@st_.composite
def rand_polygon(draw):
    # star-shaped closed ring around a center: always valid, non-degenerate
    nv = draw(st_.integers(3, 10))
    cx, cy = draw(coord), draw(coord)
    rr = [draw(st_.floats(min_value=0.5, max_value=100.0)) for _ in range(nv)]
    xs, ys = [], []
    for k in range(nv):
        ang = 2 * math.pi * k / nv
        xs.append(cx + rr[k] * math.cos(ang))
        ys.append(cy + rr[k] * math.sin(ang))
    xs.append(xs[0])
    ys.append(ys[0])
    return ragged.POLYGON, xs, ys, [nv + 1], [1]


@st_.composite
def rand_multipoint(draw):
    n = draw(st_.integers(1, 8))
    xs = draw(st_.lists(coord, min_size=n, max_size=n))
    ys = draw(st_.lists(coord, min_size=n, max_size=n))
    return ragged.MULTIPOINT, xs, ys, [1] * n, [1] * n


any_geom = st_.one_of(rand_point(), rand_linestring(), rand_polygon(),
                      rand_multipoint())


def _build(geoms):
    gts, xs, ys, rs, ps = zip(*geoms)
    return ragged.RaggedGeometry.from_pylists(
        list(gts), list(xs), list(ys), list(rs), list(ps))


@settings(max_examples=60, deadline=None)
@given(st_.lists(any_geom, min_size=1, max_size=6))
def test_wkb_roundtrip_property(geoms):
    rg = _build(geoms)
    rg2 = wkb.decode(wkb.encode(rg))
    assert np.array_equal(rg.gt, rg2.gt)
    assert np.array_equal(rg.xs, rg2.xs)  # bit-exact through WKB doubles
    assert np.array_equal(rg.ys, rg2.ys)
    assert np.array_equal(rg.rings, rg2.rings)
    assert np.array_equal(rg.parts, rg2.parts)


@settings(max_examples=60, deadline=None)
@given(st_.lists(any_geom, min_size=1, max_size=6))
def test_wkt_roundtrip_property(geoms):
    rg = _build(geoms)
    rg2 = wkt.parse(wkt.format(rg))
    assert np.array_equal(rg.gt, rg2.gt)
    assert np.allclose(rg.xs, rg2.xs)  # repr() round-trips doubles
    assert np.allclose(rg.ys, rg2.ys)


@settings(max_examples=40, deadline=None)
@given(rand_polygon(), st_.floats(-1e4, 1e4, allow_nan=False),
       st_.floats(-1e4, 1e4, allow_nan=False))
def test_area_translation_invariant(poly, dx, dy):
    rg = _build([poly])
    a1 = algos.area(rg)[0]
    moved = ragged.RaggedGeometry(rg.gt, rg.xs + dx, rg.ys + dy,
                                  rg.coord_offsets, rg.rings,
                                  rg.ring_offsets, rg.parts,
                                  rg.part_offsets)
    a2 = algos.area(moved)[0]
    assert a2 == pytest_approx(a1)


def pytest_approx(v):
    import pytest
    # coords go up to ~1e6 → shoelace products ~1e12 → double rounding
    # error up to ~1e-3 absolute after summation; this is float reality,
    # not an algorithm property
    return pytest.approx(v, rel=1e-6, abs=0.05)


@settings(max_examples=40, deadline=None)
@given(rand_linestring(), st_.floats(0, 360, allow_nan=False))
def test_length_rotation_invariant(line, angle):
    rg = _build([line])
    l1 = algos.length(rg)[0]
    th = math.radians(angle)
    nx = rg.xs * math.cos(th) - rg.ys * math.sin(th)
    ny = rg.xs * math.sin(th) + rg.ys * math.cos(th)
    rot = ragged.RaggedGeometry(rg.gt, nx, ny, rg.coord_offsets, rg.rings,
                                rg.ring_offsets, rg.parts, rg.part_offsets)
    l2 = algos.length(rot)[0]
    assert l2 == pytest_approx(l1)


@settings(max_examples=40, deadline=None)
@given(rand_multipoint())
def test_hull_contains_bbox_of_points(mp):
    rg = _build([mp])
    h = algos.convex_hull(rg)
    hb = algos.bounds(h)[0]
    b = algos.bounds(rg)[0]
    assert hb[0] <= b[0] + 1e-9 and hb[1] <= b[1] + 1e-9
    assert hb[2] >= b[2] - 1e-9 and hb[3] >= b[3] - 1e-9


@st_.composite
def rand_multipoint(draw):
    n = draw(st_.integers(3, 24))
    xs = draw(st_.lists(st_.floats(min_value=-100, max_value=100,
                                   allow_nan=False, width=64),
                        min_size=n, max_size=n))
    ys = draw(st_.lists(st_.floats(min_value=-100, max_value=100,
                                   allow_nan=False, width=64),
                        min_size=n, max_size=n))
    return ragged.MULTIPOINT, xs, ys, [1] * n, [1] * n


@given(rand_multipoint(), st_.floats(min_value=0.0, max_value=1.0))
@settings(max_examples=40, deadline=None)
def test_concave_hull_invariants(mp, ratio):
    """Chi-shape invariants for ANY point set: hull area is monotone in
    ratio (<= convex hull == ratio 1), and every input point lies in
    the hull's bbox (full containment is checked deterministically in
    test_shape_ops)."""
    rg = ragged.RaggedGeometry.from_pylists(
        [mp[0]], [mp[1]], [mp[2]], [mp[3]], [mp[4]])
    chi = algos.concave_hull(rg, ratio=ratio)
    cvx = algos.convex_hull(rg)           # independent monotone chain
    a_chi = float(algos.area(chi)[0])
    a_cvx = float(algos.area(cvx)[0])
    # concave_hull snaps input to a span-relative 1e-9 grid before
    # triangulating (Delaunay robustness); convex_hull does not. Each
    # vertex moves <= q per axis, so the area can differ by up to
    # perimeter * q on top of float noise — a sliver 6e-8 tall over an
    # 84-wide span legitimately gains ~1e-6 area from the snap alone.
    span = max(max(mp[1]) - min(mp[1]), max(mp[2]) - min(mp[2]), 1.0)
    q = 1e-9 * span
    perim = 2.0 * ((max(mp[1]) - min(mp[1])) + (max(mp[2]) - min(mp[2])))
    assert a_chi <= a_cvx + perim * q + 1e-6 * max(1.0, a_cvx)
    g = chi.geom(0)
    if g[0] == ragged.POLYGON and len(g[1]):
        # hull vertices sit on the span-relative 1e-9 snap grid
        tol = 2e-9 * span
        assert min(g[1]) >= min(mp[1]) - tol
        assert max(g[1]) <= max(mp[1]) + tol
        assert min(g[2]) >= min(mp[2]) - tol
        assert max(g[2]) <= max(mp[2]) + tol


@given(rand_polygon())
@settings(max_examples=40, deadline=None)
def test_make_valid_fixed_point_on_valid(poly):
    """make_valid on an already-valid star polygon preserves area
    exactly (the faces of a valid boundary ARE the polygon)."""
    rg = ragged.RaggedGeometry.from_pylists(
        [poly[0]], [poly[1]], [poly[2]], [poly[3]], [poly[4]])
    if not bool(algos.is_valid(rg)[0]):
        return
    a0 = float(algos.area(rg)[0])
    mv = algos.make_valid(rg)
    a1 = float(algos.area(mv)[0])
    assert abs(a1 - a0) <= 1e-6 * max(1.0, a0)


@given(rand_linestring(), st_.floats(min_value=0.0, max_value=1.0),
       st_.floats(min_value=0.0, max_value=1.0))
@settings(max_examples=40, deadline=None)
def test_normalize_idempotent_and_equalish(line, _a, _b):
    """normalize is idempotent, and a reversed line normalizes to the
    identical structure."""
    rg = ragged.RaggedGeometry.from_pylists(
        [line[0]], [line[1]], [line[2]], [line[3]], [line[4]])
    rev = ragged.RaggedGeometry.from_pylists(
        [line[0]], [line[1][::-1]], [line[2][::-1]], [line[3]], [line[4]])
    n1 = algos.normalize(rg).geom(0)
    n2 = algos.normalize(algos.normalize(rg)).geom(0)
    n3 = algos.normalize(rev).geom(0)
    assert list(n1[1]) == list(n2[1]) == list(n3[1])
    assert list(n1[2]) == list(n2[2]) == list(n3[2])


@given(rand_polygon(), coord, coord)
@settings(max_examples=40, deadline=None)
def test_minimum_clearance_invariants(poly, tx, ty):
    """clearance is positive for star polygons, bounded by the shortest
    edge, and translation-invariant."""
    rg = ragged.RaggedGeometry.from_pylists(
        [poly[0]], [poly[1]], [poly[2]], [poly[3]], [poly[4]])
    mc = float(algos.minimum_clearance(rg)[0])
    xs, ys = poly[1], poly[2]
    shortest_edge = min(
        math.hypot(xs[i + 1] - xs[i], ys[i + 1] - ys[i])
        for i in range(len(xs) - 1))
    assert 0.0 < mc <= shortest_edge + 1e-9
    moved = ragged.RaggedGeometry.from_pylists(
        [poly[0]], [[x + tx for x in xs]], [[y + ty for y in ys]],
        [poly[3]], [poly[4]])
    mc2 = float(algos.minimum_clearance(moved)[0])
    # translation by huge offsets loses absolute precision; compare
    # relative to the coordinate magnitude
    scale = max(1.0, abs(tx), abs(ty))
    assert abs(mc2 - mc) <= 1e-7 * scale


@st_.composite
def rand_quad(draw):
    # arbitrary 4-gon: frequently self-intersecting (bowtie)
    xs = [draw(coord) for _ in range(4)]
    ys = [draw(coord) for _ in range(4)]
    xs.append(xs[0]); ys.append(ys[0])
    return ragged.POLYGON, xs, ys, [5], [1]


@given(st_.one_of(rand_polygon(), rand_quad()))
@settings(max_examples=60, deadline=None)
def test_is_valid_reason_consistent(poly):
    """is_valid_reason returns 'Valid Geometry' exactly when is_valid is
    True, and a non-empty rule message otherwise."""
    rg = ragged.RaggedGeometry.from_pylists(
        [poly[0]], [poly[1]], [poly[2]], [poly[3]], [poly[4]])
    valid = bool(algos.is_valid(rg)[0])
    reason = algos.is_valid_reason(rg)[0]
    if valid:
        assert reason == "Valid Geometry"
    else:
        assert reason and reason != "Valid Geometry"
