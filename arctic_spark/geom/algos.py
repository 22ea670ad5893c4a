"""Numpy geometry kernels over the ragged representation.

These implement the reference's declared operator semantics
(geopolars/geopolars-geo/src/geoseries.rs:10-181 trait docs) without GEOS:
vectorized with ``np.add.reduceat`` over ring offsets where the math is
data-parallel, small per-geometry loops where it is inherently sequential
(convex hull, Douglas-Peucker).

Hot-path equivalents of most of these also exist as pure Catalyst
expressions in ``arctic_spark.functions.native``; the numpy versions are
the general-case UDF bodies and the oracle used by the test suite.
"""

from __future__ import annotations

import math

import numpy as np

from .ragged import (LINESTRING, MISSING, MULTILINESTRING, MULTIPOINT,
                     MULTIPOLYGON, POINT, POLYGON, RaggedGeometry)


def _ring_starts(rg: RaggedGeometry):
    """Global coord-offset of each ring start, plus ring lengths."""
    starts = np.zeros(len(rg.rings), dtype=np.int64)
    if len(rg.rings):
        np.cumsum(rg.rings[:-1], out=starts[1:])
    return starts


def _signed_ring_areas(rg: RaggedGeometry):
    """Signed shoelace area of every ring in the batch (vectorized)."""
    xs, ys = rg.xs, rg.ys
    n = len(xs)
    if n == 0:
        return np.empty(0)
    cross = xs[:-1] * ys[1:] - xs[1:] * ys[:-1]
    cross = np.append(cross, 0.0)
    starts = _ring_starts(rg)
    # sum cross over [start, start+len-1) per ring
    ends = starts + rg.rings
    sums = np.zeros(len(starts))
    for i in range(len(starts)):  # rings are typically few; cheap loop
        sums[i] = cross[starts[i]:ends[i] - 1].sum()
    return 0.5 * sums


def _per_geom_ring_role(rg: RaggedGeometry):
    """bool[R]: True where ring is an exterior ring of its part."""
    role = np.zeros(len(rg.rings), dtype=bool)
    ri = 0
    for nr in rg.parts:
        role[ri] = True
        ri += nr
    return role


def area(rg: RaggedGeometry):
    """Planar area per geometry; 0 for non-areal types; NaN for missing.

    Exterior rings contribute +|area|, holes −|area| (orientation-
    insensitive, matching GEOS semantics the reference documents at
    geoseries.rs:16-19)."""
    ring_a = np.abs(_signed_ring_areas(rg))
    is_ext = _per_geom_ring_role(rg)
    signed = np.where(is_ext, ring_a, -ring_a)
    out = np.zeros(len(rg))
    ri = 0
    for i in range(len(rg)):
        g = rg.gt[i]
        nr = rg.ring_offsets[i + 1] - rg.ring_offsets[i]
        if g == MISSING:
            out[i] = np.nan
        elif g in (POLYGON, MULTIPOLYGON):
            out[i] = signed[ri:ri + nr].sum()
        ri += nr
    return out


def length(rg: RaggedGeometry):
    """Planar (euclidean) length per geometry.

    LineString → sum of segment lengths; Polygon → exterior ring length
    only, matching the reference doc 'For a Polygon it returns the length
    of the exterior ring' (geoseries.rs:41-46); Multi* → sum over parts;
    Point → 0."""
    xs, ys = rg.xs, rg.ys
    if len(xs) == 0:
        return np.where(rg.gt == MISSING, np.nan, 0.0)
    seg = np.sqrt(np.diff(xs) ** 2 + np.diff(ys) ** 2)
    seg = np.append(seg, 0.0)
    starts = _ring_starts(rg)
    ends = starts + rg.rings
    ring_len = np.array([seg[s:e - 1].sum() for s, e in zip(starts, ends)])
    out = np.zeros(len(rg))
    ri = 0
    for i in range(len(rg)):
        g = rg.gt[i]
        r0, r1 = rg.ring_offsets[i], rg.ring_offsets[i + 1]
        if g == MISSING:
            out[i] = np.nan
        elif g in (LINESTRING, MULTILINESTRING):
            out[i] = ring_len[r0:r1].sum()
        elif g in (POLYGON, MULTIPOLYGON):
            # exterior rings only
            pi0, pi1 = rg.part_offsets[i], rg.part_offsets[i + 1]
            ri2 = r0
            tot = 0.0
            for nr in rg.parts[pi0:pi1]:
                tot += ring_len[ri2]
                ri2 += nr
            out[i] = tot
        ri = r1
    return out


def bounds(rg: RaggedGeometry):
    """(xmin, ymin, xmax, ymax) float64[N,4]; NaN rows for missing/empty."""
    out = np.full((len(rg), 4), np.nan)
    for i in range(len(rg)):
        c0, c1 = rg.coord_offsets[i], rg.coord_offsets[i + 1]
        if c1 > c0:
            out[i, 0] = rg.xs[c0:c1].min()
            out[i, 1] = rg.ys[c0:c1].min()
            out[i, 2] = rg.xs[c0:c1].max()
            out[i, 3] = rg.ys[c0:c1].max()
    return out


def centroid(rg: RaggedGeometry):
    """Centroid (cx, cy) per geometry, GEOS semantics: areal geometries use
    area-weighted centroid; lines length-weighted; points mean of points."""
    cx = np.full(len(rg), np.nan)
    cy = np.full(len(rg), np.nan)
    for i in range(len(rg)):
        g, xs, ys, rings, parts = rg.geom(i)
        if g == MISSING or len(xs) == 0:
            continue
        if g in (POINT, MULTIPOINT):
            cx[i] = xs.mean()
            cy[i] = ys.mean()
        elif g in (LINESTRING, MULTILINESTRING):
            wx = wy = w = 0.0
            off = 0
            for rl in rings:
                x, y = xs[off:off + rl], ys[off:off + rl]
                seg = np.sqrt(np.diff(x) ** 2 + np.diff(y) ** 2)
                mx = 0.5 * (x[:-1] + x[1:])
                my = 0.5 * (y[:-1] + y[1:])
                wx += (seg * mx).sum()
                wy += (seg * my).sum()
                w += seg.sum()
                off += rl
            if w > 0:
                cx[i], cy[i] = wx / w, wy / w
            else:
                cx[i], cy[i] = xs.mean(), ys.mean()
        else:  # polygonal
            A = wx = wy = 0.0
            off = 0
            ring_idx = 0
            ext = set()
            k = 0
            for nr in parts:
                ext.add(k)
                k += nr
            for j, rl in enumerate(rings):
                x, y = xs[off:off + rl], ys[off:off + rl]
                cr = x[:-1] * y[1:] - x[1:] * y[:-1]
                a = 0.5 * cr.sum()
                sgn = 1.0 if j in ext else -1.0
                # orient contribution: holes subtract
                a_eff = abs(a) * sgn
                if a != 0:
                    gx = ((x[:-1] + x[1:]) * cr).sum() / (6 * a)
                    gy = ((y[:-1] + y[1:]) * cr).sum() / (6 * a)
                else:
                    gx, gy = x.mean(), y.mean()
                wx += gx * a_eff
                wy += gy * a_eff
                A += a_eff
                off += rl
                ring_idx += 1
            if A != 0:
                cx[i], cy[i] = wx / A, wy / A
            else:
                cx[i], cy[i] = xs.mean(), ys.mean()
    return cx, cy


def convex_hull(rg: RaggedGeometry):
    """Andrew's monotone chain per geometry. Returns RaggedGeometry of
    Polygon/LineString/Point per the collapse rule the reference documents
    (geoseries.rs:26-31: 'smallest convex Polygon ... unless fewer than 3
    points, then a Linestring or Point')."""
    gts, oxs, oys, orings, oparts = [], [], [], [], []
    for i in range(len(rg)):
        g, xs, ys, _, _ = rg.geom(i)
        if g == MISSING:
            gts.append(None)
            oxs.append(None)
            oys.append(None)
            orings.append(None)
            oparts.append(None)
            continue
        pts = np.unique(np.column_stack([xs, ys]), axis=0)
        n = len(pts)
        if n == 0:
            gts.append(POINT)
            oxs.append([])
            oys.append([])
            orings.append([])
            oparts.append([])
            continue
        if n == 1:
            gts.append(POINT)
            oxs.append([pts[0, 0]])
            oys.append([pts[0, 1]])
            orings.append([1])
            oparts.append([1])
            continue
        # sort lexicographically (unique already sorts)
        def half(points):
            h = []
            for p in points:
                while len(h) >= 2 and np.cross(h[-1] - h[-2], p - h[-2]) <= 0:
                    h.pop()
                h.append(p)
            return h
        lower = half(pts)
        upper = half(pts[::-1])
        hull = np.array(lower[:-1] + upper[:-1])
        if len(hull) == 2 or n == 2:
            gts.append(LINESTRING)
            oxs.append(hull[:, 0].tolist() if len(hull) == 2 else pts[:, 0].tolist())
            oys.append(hull[:, 1].tolist() if len(hull) == 2 else pts[:, 1].tolist())
            orings.append([2])
            oparts.append([1])
            continue
        if len(hull) < 3:
            gts.append(LINESTRING)
            oxs.append(pts[:2, 0].tolist())
            oys.append(pts[:2, 1].tolist())
            orings.append([2])
            oparts.append([1])
            continue
        # close ring, CCW orientation (monotone chain lower+upper is CCW)
        hx = np.append(hull[:, 0], hull[0, 0])
        hy = np.append(hull[:, 1], hull[0, 1])
        gts.append(POLYGON)
        oxs.append(hx.tolist())
        oys.append(hy.tolist())
        orings.append([len(hx)])
        oparts.append([1])
    return RaggedGeometry.from_pylists(gts, oxs, oys, orings, oparts)


def _dp_mask(x, y, tol):
    """Douglas-Peucker keep-mask for one open/closed coordinate run."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        ax, ay, bx, by = x[i0], y[i0], x[i1], y[i1]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        px = x[i0 + 1:i1]
        py = y[i0 + 1:i1]
        if seg2 == 0:
            d2 = (px - ax) ** 2 + (py - ay) ** 2
        else:
            cross = (px - ax) * dy - (py - ay) * dx
            d2 = cross * cross / seg2
        k = int(np.argmax(d2))
        if d2[k] > tol * tol:
            idx = i0 + 1 + k
            keep[idx] = True
            stack.append((i0, idx))
            stack.append((idx, i1))
    return keep


def simplify(rg: RaggedGeometry, tol):
    """Douglas-Peucker per ring (endpoints preserved, matching the
    reference doc geoseries.rs:109-115)."""
    gts, oxs, oys, orings, oparts = [], [], [], [], []
    for i in range(len(rg)):
        g, xs, ys, rings, parts = rg.geom(i)
        if g == MISSING:
            gts.append(None); oxs.append(None); oys.append(None)
            orings.append(None); oparts.append(None)
            continue
        if g in (POINT, MULTIPOINT) or len(xs) == 0:
            gts.append(int(g)); oxs.append(xs.tolist()); oys.append(ys.tolist())
            orings.append(rings.tolist()); oparts.append(parts.tolist())
            continue
        nx, ny, nr = [], [], []
        off = 0
        for rl in rings:
            x, y = xs[off:off + rl], ys[off:off + rl]
            m = _dp_mask(x, y, tol)
            nx.extend(x[m].tolist())
            ny.extend(y[m].tolist())
            nr.append(int(m.sum()))
            off += rl
        gts.append(int(g)); oxs.append(nx); oys.append(ny)
        orings.append(nr); oparts.append(parts.tolist())
    return RaggedGeometry.from_pylists(gts, oxs, oys, orings, oparts)


# ---------------------------------------------------------------------------
# Predicates
# ---------------------------------------------------------------------------

def point_in_ring(px, py, x, y):
    """Ray-cast: is (px,py) strictly inside OR on boundary of closed ring.

    Returns 1 inside, 0 on boundary, -1 outside (scalar)."""
    inside = False
    n = len(x)
    for j in range(n - 1):
        x1, y1, x2, y2 = x[j], y[j], x[j + 1], y[j + 1]
        # boundary check: point on segment
        cross = (px - x1) * (y2 - y1) - (py - y1) * (x2 - x1)
        if cross == 0 and min(x1, x2) <= px <= max(x1, x2) \
                and min(y1, y2) <= py <= max(y1, y2):
            return 0
        if (y1 > py) != (y2 > py):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xint:
                inside = not inside
    return 1 if inside else -1


def point_in_polygon(px, py, xs, ys, rings, parts):
    """Point in (multi)polygon with holes; boundary counts as inside
    (intersects semantics)."""
    roff = 0
    coff = 0
    for nr in parts:
        side = None
        for j in range(nr):
            rl = rings[roff + j]
            x = xs[coff:coff + rl]
            y = ys[coff:coff + rl]
            s = point_in_ring(px, py, x, y)
            if j == 0:
                if s == -1:
                    side = False
                elif s == 0:
                    return True
                else:
                    side = True
            else:  # hole
                if side and s == 1:
                    side = False
                elif side and s == 0:
                    return True
            coff += rl
        roff += nr
        if side:
            return True
    return False


def _seg_intersect(ax, ay, bx, by, cx, cy, dx, dy):
    """Do segments AB and CD intersect (touching counts)?"""
    def orient(ox, oy, px, py, qx, qy):
        v = (px - ox) * (qy - oy) - (py - oy) * (qx - ox)
        return 0 if v == 0 else (1 if v > 0 else -1)
    o1 = orient(ax, ay, bx, by, cx, cy)
    o2 = orient(ax, ay, bx, by, dx, dy)
    o3 = orient(cx, cy, dx, dy, ax, ay)
    o4 = orient(cx, cy, dx, dy, bx, by)
    if o1 != o2 and o3 != o4:
        return True
    def on(ox, oy, px, py, qx, qy):
        return min(ox, px) <= qx <= max(ox, px) and min(oy, py) <= qy <= max(oy, py)
    if o1 == 0 and on(ax, ay, bx, by, cx, cy):
        return True
    if o2 == 0 and on(ax, ay, bx, by, dx, dy):
        return True
    if o3 == 0 and on(cx, cy, dx, dy, ax, ay):
        return True
    if o4 == 0 and on(cx, cy, dx, dy, bx, by):
        return True
    return False


def _iter_segments(xs, ys, rings):
    off = 0
    for rl in rings:
        for j in range(rl - 1):
            yield xs[off + j], ys[off + j], xs[off + j + 1], ys[off + j + 1]
        off += rl


def intersects_pair(g1, g2):
    """Exact intersects for a pair of per-geometry tuples
    (gt, xs, ys, rings, parts). General: any boundary segments cross, or
    one contains a representative point of the other."""
    gt1, xs1, ys1, r1, p1 = g1
    gt2, xs2, ys2, r2, p2 = g2
    if len(xs1) == 0 or len(xs2) == 0:
        return False
    # bbox reject
    if xs1.max() < xs2.min() or xs2.max() < xs1.min() \
            or ys1.max() < ys2.min() or ys2.max() < ys1.min():
        return False
    pointish1 = gt1 in (POINT, MULTIPOINT)
    pointish2 = gt2 in (POINT, MULTIPOINT)
    poly1 = gt1 in (POLYGON, MULTIPOLYGON)
    poly2 = gt2 in (POLYGON, MULTIPOLYGON)
    if pointish1:
        return any(_point_touches(px, py, g2) for px, py in zip(xs1, ys1))
    if pointish2:
        return any(_point_touches(px, py, g1) for px, py in zip(xs2, ys2))
    # segment crossing between boundaries
    for a in _iter_segments(xs1, ys1, r1):
        for b in _iter_segments(xs2, ys2, r2):
            if _seg_intersect(*a, *b):
                return True
    # containment: a vertex of one inside the other polygon
    if poly1 and point_in_polygon(xs2[0], ys2[0], xs1, ys1, r1, p1):
        return True
    if poly2 and point_in_polygon(xs1[0], ys1[0], xs2, ys2, r2, p2):
        return True
    return False


def _point_touches(px, py, g):
    gt, xs, ys, rings, parts = g
    if gt in (POINT, MULTIPOINT):
        return bool(np.any((xs == px) & (ys == py)))
    if gt in (LINESTRING, MULTILINESTRING):
        for x1, y1, x2, y2 in _iter_segments(xs, ys, rings):
            cross = (px - x1) * (y2 - y1) - (py - y1) * (x2 - x1)
            if cross == 0 and min(x1, x2) <= px <= max(x1, x2) \
                    and min(y1, y2) <= py <= max(y1, y2):
                return True
        return False
    return point_in_polygon(px, py, xs, ys, rings, parts)


def contains_pair(g1, g2):
    """g1 contains g2 — implemented for the type pairs the reference's
    join refine step supports (spatial_index.rs:89-137): polygon contains
    point fully; polygon contains polygon approximated as all-vertices-in
    + no boundary crossing."""
    gt1 = g1[0]
    gt2, xs2, ys2, r2, p2 = g2
    if gt1 in (POLYGON, MULTIPOLYGON):
        if gt2 in (POINT, MULTIPOINT):
            return all(point_in_polygon(px, py, g1[1], g1[2], g1[3], g1[4])
                       for px, py in zip(xs2, ys2))
        # all vertices of g2 inside g1
        if not all(point_in_polygon(px, py, g1[1], g1[2], g1[3], g1[4])
                   for px, py in zip(xs2, ys2)):
            return False
        # reject if any of g2's edges exits and re-enters g1 (e.g. a rect
        # bridging the notch of a concave polygon, or spanning a hole):
        # such an edge must properly cross g1's boundary.
        for b in _iter_segments(xs2, ys2, r2):
            for a in _iter_segments(g1[1], g1[2], g1[3]):
                if _proper_seg_cross(*a, *b):
                    return False
            # edge midpoint must also be inside (catches crossings that
            # pass exactly through g1 boundary vertices, which are not
            # "proper" crossings)
            mx, my = (b[0] + b[2]) * 0.5, (b[1] + b[3]) * 0.5
            if not point_in_polygon(mx, my, g1[1], g1[2], g1[3], g1[4]):
                return False
        # reject if g2 swallows a hole of g1 whole (no edge crossing, all
        # vertices in the solid part): any hole-ring vertex of g1
        # strictly interior to g2 means g2 overlaps the hole.
        if gt2 in (POLYGON, MULTIPOLYGON):
            has_holes = any(nr > 1 for nr in g1[4])
            if has_holes:
                roff = coff = 0
                for nr in g1[4]:
                    for j in range(nr):
                        rl = g1[3][roff + j]
                        if j > 0:  # hole ring
                            for k in range(rl):
                                if _strict_point_in(g1[1][coff + k],
                                                    g1[2][coff + k], g2):
                                    return False
                        coff += rl
                    roff += nr
                # g2 exactly coincident with a hole ring passes every
                # check above (its vertices and edge midpoints all lie ON
                # the hole boundary, which point_in_polygon counts as
                # inside, and no crossing is proper) — require a
                # strictly-interior point of g2 to be strictly inside g1
                ip = _interior_point(g2)
                if ip is not None and not _strict_point_in(ip[0], ip[1], g1):
                    return False
        return True
    if gt1 in (POINT,) and gt2 in (POINT,):
        if len(g1[1]) == 0 or len(xs2) == 0:
            return False
        return g1[1][0] == xs2[0] and g1[2][0] == ys2[0]
    return False


def _point_seg_dist2(px, py, x1, y1, x2, y2):
    dx, dy = x2 - x1, y2 - y1
    l2 = dx * dx + dy * dy
    if l2 == 0:
        return (px - x1) ** 2 + (py - y1) ** 2
    t = ((px - x1) * dx + (py - y1) * dy) / l2
    t = min(1.0, max(0.0, t))
    cx, cy = x1 + t * dx, y1 + t * dy
    return (px - cx) ** 2 + (py - cy) ** 2


def distance_pair(g1, g2):
    """Min cartesian distance between two geometries (0 if intersecting)."""
    if intersects_pair(g1, g2):
        return 0.0
    gt1, xs1, ys1, r1, _ = g1
    gt2, xs2, ys2, r2, _ = g2
    if len(xs1) == 0 or len(xs2) == 0:
        return np.nan
    best = np.inf
    segs1 = list(_iter_segments(xs1, ys1, r1))
    segs2 = list(_iter_segments(xs2, ys2, r2))
    if not segs1 and not segs2:
        # point sets: vectorized all-pairs
        d2 = (xs1[:, None] - xs2[None, :]) ** 2 + (ys1[:, None] - ys2[None, :]) ** 2
        return float(np.sqrt(d2.min()))
    if not segs1:
        for px, py in zip(xs1, ys1):
            for s in segs2:
                best = min(best, _point_seg_dist2(px, py, *s))
        return float(np.sqrt(best))
    if not segs2:
        for px, py in zip(xs2, ys2):
            for s in segs1:
                best = min(best, _point_seg_dist2(px, py, *s))
        return float(np.sqrt(best))
    for s1 in segs1:
        for px, py in ((s1[0], s1[1]), (s1[2], s1[3])):
            for s2 in segs2:
                best = min(best, _point_seg_dist2(px, py, *s2))
    for s2 in segs2:
        for px, py in ((s2[0], s2[1]), (s2[2], s2[3])):
            for s1 in segs1:
                best = min(best, _point_seg_dist2(px, py, *s1))
    return float(np.sqrt(best))


# ---------------------------------------------------------------------------
# constructive ops (reference roadmap geoseries.rst:67-90)
# ---------------------------------------------------------------------------

def _clip_ring_rect(x, y, xmin, ymin, xmax, ymax):
    """Sutherland–Hodgman clip of one closed ring against an axis-aligned
    rectangle. Returns (x, y) closed arrays (possibly empty)."""
    pts = list(zip(x[:-1], y[:-1]))  # drop closing vertex

    def clip_edge(pts, inside, intersect):
        out = []
        n = len(pts)
        for i in range(n):
            cur, prv = pts[i], pts[i - 1]
            ci, pi = inside(cur), inside(prv)
            if ci:
                if not pi:
                    out.append(intersect(prv, cur))
                out.append(cur)
            elif pi:
                out.append(intersect(prv, cur))
        return out

    def ix_v(p, q, xv):
        t = (xv - p[0]) / (q[0] - p[0])
        return (xv, p[1] + t * (q[1] - p[1]))

    def ix_h(p, q, yv):
        t = (yv - p[1]) / (q[1] - p[1])
        return (p[0] + t * (q[0] - p[0]), yv)

    pts = clip_edge(pts, lambda p: p[0] >= xmin, lambda p, q: ix_v(p, q, xmin))
    if pts:
        pts = clip_edge(pts, lambda p: p[0] <= xmax,
                        lambda p, q: ix_v(p, q, xmax))
    if pts:
        pts = clip_edge(pts, lambda p: p[1] >= ymin,
                        lambda p, q: ix_h(p, q, ymin))
    if pts:
        pts = clip_edge(pts, lambda p: p[1] <= ymax,
                        lambda p, q: ix_h(p, q, ymax))
    if len(pts) < 3:
        return np.empty(0), np.empty(0)
    xs = np.array([p[0] for p in pts] + [pts[0][0]])
    ys = np.array([p[1] for p in pts] + [pts[0][1]])
    return xs, ys


def clip_by_rect(rg: RaggedGeometry, xmin, ymin, xmax, ymax):
    """Clip polygons to a rectangle (reference roadmap rst:68
    clip_by_rect). Points/lines: kept only if fully inside (simplified —
    matches shapely for points; line clipping returns the whole line if
    inside, empty otherwise)."""
    gts, oxs, oys, orings, oparts = [], [], [], [], []
    for i in range(len(rg)):
        g, xs, ys, rings, parts = rg.geom(i)
        if g == MISSING:
            gts.append(None); oxs.append(None); oys.append(None)
            orings.append(None); oparts.append(None)
            continue
        if g in (POLYGON, MULTIPOLYGON):
            nx, ny, nr, nparts = [], [], [], []
            off = 0
            ri = 0
            for nrings in parts:
                kept = 0
                for j in range(nrings):
                    rl = rings[ri + j]
                    cx, cy = _clip_ring_rect(xs[off:off + rl],
                                             ys[off:off + rl],
                                             xmin, ymin, xmax, ymax)
                    if len(cx):
                        nx.extend(cx.tolist()); ny.extend(cy.tolist())
                        nr.append(len(cx)); kept += 1
                    off += rl
                ri += nrings
                if kept:
                    nparts.append(kept)
            if not nr:
                gts.append(POLYGON); oxs.append([]); oys.append([])
                orings.append([]); oparts.append([])
            else:
                out_gt = POLYGON if len(nparts) == 1 else MULTIPOLYGON
                gts.append(out_gt); oxs.append(nx); oys.append(ny)
                orings.append(nr); oparts.append(nparts)
        else:
            inside = (len(xs) > 0 and xs.min() >= xmin and xs.max() <= xmax
                      and ys.min() >= ymin and ys.max() <= ymax)
            if inside:
                gts.append(int(g)); oxs.append(xs.tolist())
                oys.append(ys.tolist()); orings.append(rings.tolist())
                oparts.append(parts.tolist())
            else:
                gts.append(int(g)); oxs.append([]); oys.append([])
                orings.append([]); oparts.append([])
    return RaggedGeometry.from_pylists(gts, oxs, oys, orings, oparts)


def _buffer_convex_ring(x, y, dist, quad_segs):
    """Positive buffer of a convex CCW closed ring: offset each edge
    outward by dist, join consecutive edges with circular arcs at the
    vertices (exact Minkowski sum with a disc, discretized)."""
    # ensure CCW
    cr = (x[:-1] * y[1:] - x[1:] * y[:-1]).sum()
    if cr < 0:
        x, y = x[::-1], y[::-1]
    vx, vy = x[:-1], y[:-1]
    n = len(vx)
    out = []
    for i in range(n):
        ax, ay = vx[i], vy[i]
        bx, by = vx[(i + 1) % n], vy[(i + 1) % n]
        px, py = vx[i - 1], vy[i - 1]
        # outward normals of incoming and outgoing edges (CCW ring →
        # outward normal is (dy, -dx) normalized)
        import math as _m
        din = _m.hypot(ax - px, ay - py)
        dout = _m.hypot(bx - ax, by - ay)
        if din == 0 or dout == 0:
            continue
        nin = ((ay - py) / din, -(ax - px) / din)
        nout = ((by - ay) / dout, -(bx - ax) / dout)
        a0 = _m.atan2(nin[1], nin[0])
        a1 = _m.atan2(nout[1], nout[0])
        while a1 < a0:
            a1 += 2 * _m.pi
        steps = max(1, int(_m.ceil((a1 - a0) / (_m.pi / 2 / quad_segs))))
        for k in range(steps + 1):
            t = a0 + (a1 - a0) * k / steps
            out.append((ax + dist * _m.cos(t), ay + dist * _m.sin(t)))
    out.append(out[0])
    return (np.array([p[0] for p in out]), np.array([p[1] for p in out]))


def buffer(rg: RaggedGeometry, distance, quad_segs=8):
    """Buffer. Implemented: points/multipoints (regular 4*quad_segs-gon
    circles) and CONVEX hole-free polygons with positive distance (exact
    edge-offset + corner-arc Minkowski sum). Lines / concave polygons /
    negative distances need full offsetting — raise NotImplementedError,
    documented partial support."""
    n_v = 4 * quad_segs
    ang = np.linspace(0, 2 * np.pi, n_v, endpoint=False)
    dx = distance * np.cos(ang)
    dy = distance * np.sin(ang)
    gts, oxs, oys, orings, oparts = [], [], [], [], []
    for i in range(len(rg)):
        g, xs, ys, rings, parts = rg.geom(i)
        if g == MISSING:
            gts.append(None); oxs.append(None); oys.append(None)
            orings.append(None); oparts.append(None)
            continue
        if g == POLYGON and len(rings) == 1 and distance > 0 \
                and _is_convex_ring(xs, ys):
            bx, by = _buffer_convex_ring(xs, ys, float(distance), quad_segs)
            gts.append(POLYGON); oxs.append(bx.tolist())
            oys.append(by.tolist()); orings.append([len(bx)])
            oparts.append([1])
            continue
        if g not in (POINT, MULTIPOINT):
            raise NotImplementedError(
                "buffer implemented for Point/MultiPoint and positive-"
                "distance convex polygons (line/concave offsetting not "
                "supported in this engine version)")
        nx, ny, nr, npart = [], [], [], []
        for px, py in zip(xs, ys):
            cx = (px + dx).tolist() + [px + dx[0]]
            cy = (py + dy).tolist() + [py + dy[0]]
            nx.extend(cx); ny.extend(cy)
            nr.append(n_v + 1); npart.append(1)
        out_gt = POLYGON if len(npart) == 1 else MULTIPOLYGON
        gts.append(out_gt); oxs.append(nx); oys.append(ny)
        orings.append(nr); oparts.append(npart)
    return RaggedGeometry.from_pylists(gts, oxs, oys, orings, oparts)


def representative_point(rg: RaggedGeometry):
    """A point guaranteed inside each geometry (reference roadmap rst:27
    representative_point): polygons → midpoint of the widest interior
    span on the horizontal line through the bbox-center y (the classic
    interior-point scanline); lines → middle vertex; points → first."""
    cx = np.full(len(rg), np.nan)
    cy = np.full(len(rg), np.nan)
    for i in range(len(rg)):
        g, xs, ys, rings, parts = rg.geom(i)
        if g == MISSING or len(xs) == 0:
            continue
        if g in (POINT, MULTIPOINT):
            cx[i], cy[i] = xs[0], ys[0]
        elif g in (LINESTRING, MULTILINESTRING):
            k = len(xs) // 2
            cx[i], cy[i] = xs[k], ys[k]
        else:
            ymid = 0.5 * (ys.min() + ys.max())
            # tiny nudge if ymid hits a vertex exactly (degenerate crossings)
            if np.any(ys == ymid):
                ymid = np.nextafter(ymid, ys.max())
            crossings = []
            off = 0
            for rl in rings:
                x, y = xs[off:off + rl], ys[off:off + rl]
                for j in range(rl - 1):
                    y1, y2 = y[j], y[j + 1]
                    if (y1 > ymid) != (y2 > ymid):
                        crossings.append(x[j] + (ymid - y1)
                                         * (x[j + 1] - x[j]) / (y2 - y1))
                off += rl
            crossings.sort()
            if len(crossings) >= 2:
                widths = [(crossings[k + 1] - crossings[k], k)
                          for k in range(0, len(crossings) - 1, 2)]
                w, k = max(widths)
                cx[i] = 0.5 * (crossings[k] + crossings[k + 1])
                cy[i] = ymid
            else:
                cx[i], cy[i] = xs.mean(), ys.mean()
    return cx, cy


def is_simple(rg: RaggedGeometry):
    """No self-intersection between non-adjacent segments (per ring).
    O(S²) per geometry — the UDF path; fine for typical feature sizes."""
    out = np.zeros(len(rg), dtype=object)
    for i in range(len(rg)):
        g, xs, ys, rings, parts = rg.geom(i)
        if g == MISSING:
            out[i] = None
            continue
        if g in (POINT, MULTIPOINT):
            out[i] = True
            continue
        segs = list(_iter_segments(xs, ys, rings))
        simple = True
        for a in range(len(segs)):
            for b in range(a + 2, len(segs)):
                # skip adjacent (sharing a vertex incl. ring closure)
                sa, sb = segs[a], segs[b]
                if (sa[2], sa[3]) == (sb[0], sb[1]) or \
                   (sb[2], sb[3]) == (sa[0], sa[1]):
                    continue
                if _seg_intersect(*sa, *sb):
                    simple = False
                    break
            if not simple:
                break
        out[i] = simple
    return out


def is_valid(rg: RaggedGeometry):
    """Basic validity: rings closed with >= 4 vertices, simple, holes
    (not fully OGC — no nested-shell checks; documented simplification)."""
    simple = is_simple(rg)
    out = np.zeros(len(rg), dtype=object)
    for i in range(len(rg)):
        g, xs, ys, rings, parts = rg.geom(i)
        if g == MISSING:
            out[i] = None
            continue
        if g not in (POLYGON, MULTIPOLYGON):
            out[i] = bool(simple[i])
            continue
        ok = bool(simple[i])
        off = 0
        for rl in rings:
            if rl < 4 or xs[off] != xs[off + rl - 1] \
                    or ys[off] != ys[off + rl - 1]:
                ok = False
            off += rl
        out[i] = ok
    return out


# ---------------------------------------------------------------------------
# extended binary predicates (reference roadmap geoseries.rst:47-64)
# ---------------------------------------------------------------------------

def _proper_seg_cross(ax, ay, bx, by, cx, cy, dx, dy):
    """Segments cross at an interior point of both (no endpoint touch,
    no collinear overlap)."""
    def orient(ox, oy, px, py, qx, qy):
        v = (px - ox) * (qy - oy) - (py - oy) * (qx - ox)
        return 0 if v == 0 else (1 if v > 0 else -1)
    o1 = orient(ax, ay, bx, by, cx, cy)
    o2 = orient(ax, ay, bx, by, dx, dy)
    o3 = orient(cx, cy, dx, dy, ax, ay)
    o4 = orient(cx, cy, dx, dy, bx, by)
    return o1 != o2 and o3 != o4 and 0 not in (o1, o2, o3, o4)


def _interior_point(g):
    """A point strictly interior to polygonal g, or None: edge midpoints
    nudged along both normals by a bbox-scaled epsilon, verified with the
    strict PIP (used by contains_pair's hole-coincidence probe)."""
    gt, xs, ys, rings, parts = g
    if gt not in (POLYGON, MULTIPOLYGON) or len(xs) == 0:
        return None
    span = max(float(xs.max() - xs.min()), float(ys.max() - ys.min()), 1e-12)
    for eps_scale in (1e-9, 1e-6, 1e-3):
        eps = span * eps_scale
        for x1, y1, x2, y2 in _iter_segments(xs, ys, rings):
            dx, dy = x2 - x1, y2 - y1
            ln = math.hypot(dx, dy)
            if ln == 0:
                continue
            mx, my = (x1 + x2) * 0.5, (y1 + y2) * 0.5
            nx, ny = -dy / ln, dx / ln
            for s in (1.0, -1.0):
                px, py = mx + s * nx * eps, my + s * ny * eps
                if _strict_point_in(px, py, g):
                    return (px, py)
    return None


def _strict_point_in(px, py, g):
    """Point strictly interior to a polygonal geometry."""
    gt, xs, ys, rings, parts = g
    if gt not in (POLYGON, MULTIPOLYGON):
        return False
    # boundary check first
    for x1, y1, x2, y2 in _iter_segments(xs, ys, rings):
        cross = (px - x1) * (y2 - y1) - (py - y1) * (x2 - x1)
        if cross == 0 and min(x1, x2) <= px <= max(x1, x2) \
                and min(y1, y2) <= py <= max(y1, y2):
            return False
    return point_in_polygon(px, py, xs, ys, rings, parts)


def touches_pair(g1, g2):
    """Boundaries meet, interiors do not (approximate: intersects, no
    proper segment crossing, no vertex of either strictly inside the
    other — exact for polygon/polygon and point/boundary cases that
    meet along edges or at vertices)."""
    if not intersects_pair(g1, g2):
        return False
    gt1, xs1, ys1, r1, _ = g1
    gt2, xs2, ys2, r2, _ = g2
    for a in _iter_segments(xs1, ys1, r1):
        for b in _iter_segments(xs2, ys2, r2):
            if _proper_seg_cross(*a, *b):
                return False
    if any(_strict_point_in(px, py, g2) for px, py in zip(xs1, ys1)):
        return False
    if any(_strict_point_in(px, py, g1) for px, py in zip(xs2, ys2)):
        return False
    # point cases: a point strictly inside means not touching
    if gt1 == POINT and _strict_point_in(xs1[0], ys1[0], g2):
        return False
    if gt2 == POINT and _strict_point_in(xs2[0], ys2[0], g1):
        return False
    return True


def crosses_pair(g1, g2):
    """Interiors intersect in a lower dimension (approximate: a proper
    segment crossing exists for line/line and line/polygon; point never
    crosses)."""
    gt1, xs1, ys1, r1, _ = g1
    gt2, xs2, ys2, r2, _ = g2
    if gt1 in (POINT, MULTIPOINT) or gt2 in (POINT, MULTIPOINT):
        return False
    for a in _iter_segments(xs1, ys1, r1):
        for b in _iter_segments(xs2, ys2, r2):
            if _proper_seg_cross(*a, *b):
                return True
    # line through polygon without boundary crossing: an endpoint inside
    line1 = gt1 in (LINESTRING, MULTILINESTRING)
    line2 = gt2 in (LINESTRING, MULTILINESTRING)
    if line1 and gt2 in (POLYGON, MULTIPOLYGON):
        return any(_strict_point_in(px, py, g2) for px, py in zip(xs1, ys1)) \
            and not all(point_in_polygon(px, py, xs2, ys2, r2, g2[4])
                        for px, py in zip(xs1, ys1))
    if line2 and gt1 in (POLYGON, MULTIPOLYGON):
        return any(_strict_point_in(px, py, g1) for px, py in zip(xs2, ys2)) \
            and not all(point_in_polygon(px, py, xs1, ys1, r1, g1[4])
                        for px, py in zip(xs2, ys2))
    return False


def overlaps_pair(g1, g2):
    """Same-dimension interiors partially overlap (approximate: both
    polygonal, intersecting, neither contains the other)."""
    gt1, gt2 = g1[0], g2[0]
    poly1 = gt1 in (POLYGON, MULTIPOLYGON)
    poly2 = gt2 in (POLYGON, MULTIPOLYGON)
    if poly1 != poly2:
        return False
    if gt1 in (POINT, MULTIPOINT):
        return False
    if not intersects_pair(g1, g2):
        return False
    if contains_pair(g1, g2) or contains_pair(g2, g1):
        return False
    # boundary-only contact is touches, not overlaps
    if touches_pair(g1, g2):
        return False
    return True


# ---------------------------------------------------------------------------
# set-theoretic: intersection with a CONVEX clip polygon
# (Sutherland–Hodgman generalized beyond rectangles)
# ---------------------------------------------------------------------------

def _is_convex_ring(x, y):
    """Closed ring is convex (all cross products same sign, no reflex)."""
    n = len(x) - 1
    if n < 3:
        return False
    sign = 0
    for i in range(n):
        x1, y1 = x[i], y[i]
        x2, y2 = x[(i + 1) % n], y[(i + 1) % n]
        x3, y3 = x[(i + 2) % n], y[(i + 2) % n]
        cr = (x2 - x1) * (y3 - y2) - (y2 - y1) * (x3 - x2)
        if cr != 0:
            s = 1 if cr > 0 else -1
            if sign == 0:
                sign = s
            elif s != sign:
                return False
    return sign != 0


def _clip_ring_convex(sx, sy, cx, cy):
    """Clip closed subject ring (sx, sy) by closed CONVEX clip ring
    (cx, cy). Returns closed (x, y) arrays, possibly empty."""
    # orient clip ring CCW
    cr = (cx[:-1] * cy[1:] - cx[1:] * cy[:-1]).sum()
    if cr < 0:
        cx, cy = cx[::-1], cy[::-1]
    pts = list(zip(sx[:-1], sy[:-1]))
    n = len(cx) - 1
    for i in range(n):
        if not pts:
            break
        ex1, ey1, ex2, ey2 = cx[i], cy[i], cx[i + 1], cy[i + 1]

        def inside(p):
            return ((ex2 - ex1) * (p[1] - ey1)
                    - (ey2 - ey1) * (p[0] - ex1)) >= 0

        def isect(p, q):
            dxs, dys = q[0] - p[0], q[1] - p[1]
            dxe, dye = ex2 - ex1, ey2 - ey1
            denom = dxs * dye - dys * dxe
            t = ((ex1 - p[0]) * dye - (ey1 - p[1]) * dxe) / denom
            return (p[0] + t * dxs, p[1] + t * dys)

        out = []
        m = len(pts)
        for j in range(m):
            cur, prv = pts[j], pts[j - 1]
            ci, pi = inside(cur), inside(prv)
            if ci:
                if not pi:
                    out.append(isect(prv, cur))
                out.append(cur)
            elif pi:
                out.append(isect(prv, cur))
        pts = out
    if len(pts) < 3:
        return np.empty(0), np.empty(0)
    xs = np.array([p[0] for p in pts] + [pts[0][0]])
    ys = np.array([p[1] for p in pts] + [pts[0][1]])
    return xs, ys


def intersection_convex(rg: RaggedGeometry, clip: RaggedGeometry):
    """Row-aligned intersection of polygonal geometries with CONVEX
    single-ring clip polygons (reference roadmap rst:71 intersection —
    partial: general concave/holed clips raise). Holes in the SUBJECT
    are clipped as rings and kept as holes."""
    gts, oxs, oys, orings, oparts = [], [], [], [], []
    for i in range(len(rg)):
        g, xs, ys, rings, parts = rg.geom(i)
        gc, cxs, cys, crings, cparts = clip.geom(i)
        if g == MISSING or gc == MISSING:
            gts.append(None); oxs.append(None); oys.append(None)
            orings.append(None); oparts.append(None)
            continue
        if gc != POLYGON or len(crings) != 1:
            raise NotImplementedError(
                "intersection implemented for single-ring convex clip "
                "polygons only")
        if not _is_convex_ring(cxs, cys):
            raise NotImplementedError(
                "intersection implemented for CONVEX clip polygons only")
        if g not in (POLYGON, MULTIPOLYGON):
            raise NotImplementedError(
                "intersection subject must be polygonal")
        nx, ny, nr, nparts = [], [], [], []
        off = 0
        ri = 0
        for nrings in parts:
            kept = 0
            for j in range(nrings):
                rl = rings[ri + j]
                ox, oy = _clip_ring_convex(xs[off:off + rl],
                                           ys[off:off + rl], cxs, cys)
                if len(ox):
                    nx.extend(ox.tolist()); ny.extend(oy.tolist())
                    nr.append(len(ox)); kept += 1
                elif j == 0:
                    # exterior vanished: drop whole part incl. holes
                    off += sum(rings[ri + k] for k in range(j, nrings))
                    break
                off += rl
            else:
                ri += nrings
                if kept:
                    nparts.append(kept)
                continue
            ri += nrings
        if not nr:
            gts.append(POLYGON); oxs.append([]); oys.append([])
            orings.append([]); oparts.append([])
        else:
            out_gt = POLYGON if len(nparts) == 1 else MULTIPOLYGON
            gts.append(out_gt); oxs.append(nx); oys.append(ny)
            orings.append(nr); oparts.append(nparts)
    return RaggedGeometry.from_pylists(gts, oxs, oys, orings, oparts)


def _clip_ring_halfplane(pts, ex1, ey1, ex2, ey2, keep_left=True):
    """Clip an OPEN vertex list by one directed edge's half-plane
    (keep_left=True keeps points left of edge direction)."""
    if not pts:
        return []

    def side(p):
        v = (ex2 - ex1) * (p[1] - ey1) - (ey2 - ey1) * (p[0] - ex1)
        return v if keep_left else -v

    def isect(p, q):
        dxs, dys = q[0] - p[0], q[1] - p[1]
        dxe, dye = ex2 - ex1, ey2 - ey1
        denom = dxs * dye - dys * dxe
        t = ((ex1 - p[0]) * dye - (ey1 - p[1]) * dxe) / denom
        return (p[0] + t * dxs, p[1] + t * dys)

    out = []
    m = len(pts)
    for j in range(m):
        cur, prv = pts[j], pts[j - 1]
        ci, pi = side(cur) >= 0, side(prv) >= 0
        if ci:
            if not pi:
                out.append(isect(prv, cur))
            out.append(cur)
        elif pi:
            out.append(isect(prv, cur))
    return out


def _ccw_ring(x, y):
    cr = (x[:-1] * y[1:] - x[1:] * y[:-1]).sum()
    return (x, y) if cr >= 0 else (x[::-1], y[::-1])


def difference_convex(rg: RaggedGeometry, clip: RaggedGeometry):
    """subject − clip for CONVEX single-ring clips and hole-free
    polygonal subjects (reference roadmap rst:70 difference — partial).

    Uses the angular decomposition of the convex complement: piece_i =
    subject ∩ outside(edge_i) ∩ inside(edge_0..i−1); pieces are disjoint
    and their union is exactly the difference, so the result is a valid
    (Multi)Polygon with no dissolve step."""
    gts, oxs, oys, orings, oparts = [], [], [], [], []
    for i in range(len(rg)):
        g, xs, ys, rings, parts = rg.geom(i)
        gc, cxs, cys, crings, cparts = clip.geom(i)
        if g == MISSING or gc == MISSING:
            gts.append(None); oxs.append(None); oys.append(None)
            orings.append(None); oparts.append(None)
            continue
        if gc != POLYGON or len(crings) != 1 or not _is_convex_ring(cxs, cys):
            raise NotImplementedError(
                "difference implemented for single-ring CONVEX clip "
                "polygons only")
        if g not in (POLYGON, MULTIPOLYGON) or np.any(np.asarray(parts) != 1):
            raise NotImplementedError(
                "difference subject must be polygonal without holes")
        cxs, cys = _ccw_ring(cxs, cys)
        n_edges = len(cxs) - 1
        nx, ny, nr, nparts = [], [], [], []
        off = 0
        for rl in rings:
            sx, sy = xs[off:off + rl], ys[off:off + rl]
            off += rl
            for e in range(n_edges):
                # piece_e: outside edge e, inside edges 0..e-1
                pts = list(zip(sx[:-1], sy[:-1]))
                pts = _clip_ring_halfplane(
                    pts, cxs[e], cys[e], cxs[e + 1], cys[e + 1],
                    keep_left=False)
                for k in range(e):
                    pts = _clip_ring_halfplane(
                        pts, cxs[k], cys[k], cxs[k + 1], cys[k + 1],
                        keep_left=True)
                    if not pts:
                        break
                if len(pts) >= 3:
                    px = [p[0] for p in pts] + [pts[0][0]]
                    py = [p[1] for p in pts] + [pts[0][1]]
                    # drop degenerate slivers (zero area)
                    ax = np.array(px); ay = np.array(py)
                    a = 0.5 * (ax[:-1] * ay[1:] - ax[1:] * ay[:-1]).sum()
                    if abs(a) > 1e-12:
                        nx.extend(px); ny.extend(py)
                        nr.append(len(px)); nparts.append(1)
        if not nr:
            gts.append(POLYGON); oxs.append([]); oys.append([])
            orings.append([]); oparts.append([])
        else:
            out_gt = POLYGON if len(nparts) == 1 else MULTIPOLYGON
            gts.append(out_gt); oxs.append(nx); oys.append(ny)
            orings.append(nr); oparts.append(nparts)
    return RaggedGeometry.from_pylists(gts, oxs, oys, orings, oparts)


def _merge_as_multi(a: RaggedGeometry, b: RaggedGeometry, i):
    """Merge row i of two polygonal ragged batches into one Multi*."""
    ga, xa, ya, ra, pa = a.geom(i)
    gb, xb, yb, rb, pb = b.geom(i)
    xs = list(xa) + list(xb)
    ys = list(ya) + list(yb)
    rings = list(ra) + list(rb)
    parts = list(pa) + list(pb)
    if not rings:
        return POLYGON, [], [], [], []
    gt = POLYGON if len(parts) == 1 else MULTIPOLYGON
    return gt, xs, ys, rings, parts


def union_convex(rg: RaggedGeometry, clip: RaggedGeometry):
    """subject ∪ clip for convex clips and hole-free subjects: the
    disjoint decomposition (subject − clip) ⊔ clip — geometrically exact
    coverage with overlap counted once (rst:77 union — partial)."""
    diff = difference_convex(rg, clip)
    gts, oxs, oys, orings, oparts = [], [], [], [], []
    for i in range(len(rg)):
        if rg.gt[i] == MISSING or clip.gt[i] == MISSING:
            gts.append(None); oxs.append(None); oys.append(None)
            orings.append(None); oparts.append(None)
            continue
        gt, xs, ys, rings, parts = _merge_as_multi(diff, clip, i)
        gts.append(gt); oxs.append(xs); oys.append(ys)
        orings.append(rings); oparts.append(parts)
    return RaggedGeometry.from_pylists(gts, oxs, oys, orings, oparts)


def symmetric_difference_convex(rg: RaggedGeometry, clip: RaggedGeometry):
    """(a − b) ⊔ (b − a) for convex b and hole-free convex-or-concave a;
    b − a additionally requires a to be convex (both directions use the
    convex-complement decomposition). rst:74 — partial."""
    d1 = difference_convex(rg, clip)
    d2 = difference_convex(clip, rg)
    gts, oxs, oys, orings, oparts = [], [], [], [], []
    for i in range(len(rg)):
        if rg.gt[i] == MISSING or clip.gt[i] == MISSING:
            gts.append(None); oxs.append(None); oys.append(None)
            orings.append(None); oparts.append(None)
            continue
        gt, xs, ys, rings, parts = _merge_as_multi(d1, d2, i)
        gts.append(gt); oxs.append(xs); oys.append(ys)
        orings.append(rings); oparts.append(parts)
    return RaggedGeometry.from_pylists(gts, oxs, oys, orings, oparts)


def triangulate_ring(x, y):
    """Ear-clipping triangulation of a simple closed ring (no holes).
    Returns list of ((x1,y1),(x2,y2),(x3,y3)) triangles, CCW."""
    # open vertex list, CCW orientation
    cr = (x[:-1] * y[1:] - x[1:] * y[:-1]).sum()
    if cr < 0:
        x, y = x[::-1], y[::-1]
    verts = list(zip(x[:-1], y[:-1]))
    # drop consecutive duplicates
    verts = [v for i, v in enumerate(verts) if v != verts[i - 1]]
    tris = []

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def in_tri(p, a, b, c):
        d1 = cross(a, b, p)
        d2 = cross(b, c, p)
        d3 = cross(c, a, p)
        return d1 >= 0 and d2 >= 0 and d3 >= 0

    guard = 0
    while len(verts) > 3 and guard < 10000:
        guard += 1
        n = len(verts)
        ear_found = False
        for i in range(n):
            a, b, c = verts[i - 1], verts[i], verts[(i + 1) % n]
            if cross(a, b, c) <= 0:
                continue  # reflex or degenerate
            # no other vertex strictly inside the candidate ear
            if any(in_tri(p, a, b, c) for j, p in enumerate(verts)
                   if p not in (a, b, c)):
                continue
            tris.append((a, b, c))
            del verts[i]
            ear_found = True
            break
        if not ear_found:
            # degenerate fallback: fan triangulation (correct for convex
            # leftovers; best-effort otherwise)
            break
    if len(verts) == 3:
        a, b, c = verts
        if cross(a, b, c) != 0:
            tris.append((a, b, c))
    elif len(verts) > 3:
        for i in range(1, len(verts) - 1):
            tris.append((verts[0], verts[i], verts[i + 1]))
    return tris


def _single_ring_clip_to_triangles(cxs, cys):
    """Clip polygon → list of convex (triangle) RaggedGeometry-style ring
    arrays."""
    tris = triangulate_ring(np.asarray(cxs, dtype=float),
                            np.asarray(cys, dtype=float))
    rings = []
    for (a, b, c) in tris:
        rings.append((np.array([a[0], b[0], c[0], a[0]]),
                      np.array([a[1], b[1], c[1], a[1]])))
    return rings


def intersection_simple(rg: RaggedGeometry, clip: RaggedGeometry):
    """Intersection with ANY simple (single-ring, hole-free) clip
    polygon: convex clips delegate to the Sutherland–Hodgman path
    (subject holes preserved); concave clips are ear-clipped into
    triangles and the disjoint per-triangle intersections are emitted as
    a MultiPolygon (subject must be hole-free on that path)."""

    def row_rg(g, xs, ys, rings, parts):
        return RaggedGeometry.from_pylists(
            [int(g)], [list(xs)], [list(ys)], [list(rings)], [list(parts)])

    gts, oxs, oys, orings, oparts = [], [], [], [], []
    for i in range(len(rg)):
        g, xs, ys, rings, parts = rg.geom(i)
        gc, cxs, cys, crings, cparts = clip.geom(i)
        if g == MISSING or gc == MISSING:
            gts.append(None); oxs.append(None); oys.append(None)
            orings.append(None); oparts.append(None)
            continue
        if gc != POLYGON or len(crings) != 1:
            raise NotImplementedError(
                "intersection clip must be a single-ring polygon")
        if g not in (POLYGON, MULTIPOLYGON):
            raise NotImplementedError("intersection subject must be polygonal")
        if _is_convex_ring(cxs, cys):
            out = intersection_convex(row_rg(g, xs, ys, rings, parts),
                                      row_rg(gc, cxs, cys, crings, cparts))
            og, ox, oy, orr, opp = out.geom(0)
            gts.append(int(og)); oxs.append(ox.tolist()); oys.append(oy.tolist())
            orings.append(orr.tolist()); oparts.append(opp.tolist())
            continue
        if np.any(np.asarray(parts) != 1):
            raise NotImplementedError(
                "concave clip with holed subject not supported")
        tri_rings = _single_ring_clip_to_triangles(cxs, cys)
        nx, ny, nr, nparts = [], [], [], []
        for (tx, ty) in tri_rings:
            off = 0
            for rl in rings:
                ox, oy = _clip_ring_convex(xs[off:off + rl],
                                           ys[off:off + rl], tx, ty)
                if len(ox):
                    ax = np.asarray(ox); ay = np.asarray(oy)
                    a = 0.5 * (ax[:-1] * ay[1:] - ax[1:] * ay[:-1]).sum()
                    if abs(a) > 1e-12:
                        nx.extend(ox.tolist()); ny.extend(oy.tolist())
                        nr.append(len(ox)); nparts.append(1)
                off += rl
        if not nr:
            gts.append(POLYGON); oxs.append([]); oys.append([])
            orings.append([]); oparts.append([])
        else:
            out_gt = POLYGON if len(nparts) == 1 else MULTIPOLYGON
            gts.append(out_gt); oxs.append(nx); oys.append(ny)
            orings.append(nr); oparts.append(nparts)
    return RaggedGeometry.from_pylists(gts, oxs, oys, orings, oparts)


def _row(g, xs, ys, rings, parts):
    return RaggedGeometry.from_pylists(
        [int(g)], [list(xs)], [list(ys)], [list(rings)], [list(parts)])


def difference_simple(rg: RaggedGeometry, clip: RaggedGeometry):
    """subject − clip for ANY simple single-ring clip (hole-free
    subject): convex clips use the angular decomposition directly;
    concave clips triangulate and apply a − t1 − t2 − … sequentially
    (each step is a convex difference; intermediate results stay
    hole-free multipolygons by construction)."""
    gts, oxs, oys, orings, oparts = [], [], [], [], []
    for i in range(len(rg)):
        g, xs, ys, rings, parts = rg.geom(i)
        gc, cxs, cys, crings, cparts = clip.geom(i)
        if g == MISSING or gc == MISSING:
            gts.append(None); oxs.append(None); oys.append(None)
            orings.append(None); oparts.append(None)
            continue
        if gc != POLYGON or len(crings) != 1:
            raise NotImplementedError(
                "difference clip must be a single-ring polygon")
        if _is_convex_ring(cxs, cys):
            out = difference_convex(_row(g, xs, ys, rings, parts),
                                    _row(gc, cxs, cys, crings, cparts))
        else:
            out = _row(g, xs, ys, rings, parts)
            for (tx, ty) in _single_ring_clip_to_triangles(cxs, cys):
                out = difference_convex(
                    out, _row(POLYGON, tx, ty, [len(tx)], [1]))
                if out.coord_offsets[-1] == 0:
                    break
        og, ox, oy, orr, opp = out.geom(0)
        gts.append(int(og)); oxs.append(ox.tolist()); oys.append(oy.tolist())
        orings.append(orr.tolist()); oparts.append(opp.tolist())
    return RaggedGeometry.from_pylists(gts, oxs, oys, orings, oparts)


def union_simple(rg: RaggedGeometry, clip: RaggedGeometry):
    """subject ∪ clip for any simple single-ring clip: disjoint
    decomposition (subject − clip) ⊔ clip."""
    diff = difference_simple(rg, clip)
    gts, oxs, oys, orings, oparts = [], [], [], [], []
    for i in range(len(rg)):
        if rg.gt[i] == MISSING or clip.gt[i] == MISSING:
            gts.append(None); oxs.append(None); oys.append(None)
            orings.append(None); oparts.append(None)
            continue
        gt, xs, ys, rings, parts = _merge_as_multi(diff, clip, i)
        gts.append(gt); oxs.append(xs); oys.append(ys)
        orings.append(rings); oparts.append(parts)
    return RaggedGeometry.from_pylists(gts, oxs, oys, orings, oparts)


def symmetric_difference_simple(rg: RaggedGeometry, clip: RaggedGeometry):
    """(a − b) ⊔ (b − a) for simple single-ring a and b (hole-free)."""
    d1 = difference_simple(rg, clip)
    d2 = difference_simple(clip, rg)
    gts, oxs, oys, orings, oparts = [], [], [], [], []
    for i in range(len(rg)):
        if rg.gt[i] == MISSING or clip.gt[i] == MISSING:
            gts.append(None); oxs.append(None); oys.append(None)
            orings.append(None); oparts.append(None)
            continue
        gt, xs, ys, rings, parts = _merge_as_multi(d1, d2, i)
        gts.append(gt); oxs.append(xs); oys.append(ys)
        orings.append(rings); oparts.append(parts)
    return RaggedGeometry.from_pylists(gts, oxs, oys, orings, oparts)


# ---------------------------------------------------------------------------
# polygon dissolve (unary_union) — boundary-arrangement boolean union
# ---------------------------------------------------------------------------

def _split_params(ax, ay, bx, by, cx, cy, dx, dy, eps=1e-12):
    """Interior parameters t on segment AB where AB meets segment CD
    (proper crossings, T-junctions, collinear-overlap endpoints)."""
    rx, ry = bx - ax, by - ay
    sx, sy = dx - cx, dy - cy
    rxs = rx * sy - ry * sx
    qpx, qpy = cx - ax, cy - ay
    if abs(rxs) > eps:
        t = (qpx * sy - qpy * sx) / rxs
        u = (qpx * ry - qpy * rx) / rxs
        if -eps <= t <= 1 + eps and -eps <= u <= 1 + eps:
            if eps < t < 1 - eps:
                return [t]
        return []
    # parallel: non-collinear → no split
    if abs(qpx * ry - qpy * rx) > eps * max(1.0, abs(rx) + abs(ry)):
        return []
    rr = rx * rx + ry * ry
    if rr == 0:
        return []
    out = []
    for px, py in ((cx, cy), (dx, dy)):
        t = ((px - ax) * rx + (py - ay) * ry) / rr
        if eps < t < 1 - eps:
            out.append(t)
    return out


def _walk_rings(edges, key_digits=9):
    """Stitch directed boundary edges (interior on the left) into closed
    rings. At junction vertices the outgoing edge maximizing the CCW angle
    from the reversed incoming direction is chosen, which keeps the
    interior wedge free of other boundary edges."""
    def key(p):
        return (round(p[0], key_digits), round(p[1], key_digits))

    out_by_start = {}
    for i, (a, b) in enumerate(edges):
        out_by_start.setdefault(key(a), []).append(i)
    used = [False] * len(edges)
    rings = []
    for start in range(len(edges)):
        if used[start]:
            continue
        ring = [edges[start][0]]
        cur = start
        for _guard in range(4 * len(edges) + 4):
            used[cur] = True
            a, b = edges[cur]
            ring.append(b)
            kb = key(b)
            if kb == key(ring[0]):
                break
            cands = [i for i in out_by_start.get(kb, []) if not used[i]]
            if not cands:
                break
            if len(cands) == 1:
                cur = cands[0]
                continue
            din = math.atan2(b[1] - a[1], b[0] - a[0])
            rev = din + math.pi
            best, best_ang = cands[0], -1.0
            for i in cands:
                (ca, cb) = edges[i]
                ang = (math.atan2(cb[1] - ca[1], cb[0] - ca[0])
                       - rev) % (2 * math.pi)
                if ang == 0.0:
                    ang = 2 * math.pi
                if ang > best_ang:
                    best_ang, best = ang, i
            cur = best
        if len(ring) >= 4 and key(ring[0]) == key(ring[-1]):
            rings.append(ring)
    return rings


def _ring_signed_area(ring):
    s = 0.0
    for i in range(len(ring) - 1):
        s += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
    return 0.5 * s


def union_polygons(geoms, eps_rel=1e-9):
    """Dissolve a list of (gt, xs, ys, rings, parts) polygon tuples into
    one (Multi)Polygon, merging overlaps (GeoPandas ``unary_union``;
    reference roadmap geoseries.rst:104-111).

    Boundary-arrangement construction: every edge of every input is split
    at its intersections with all other edges; a sub-edge lies on the
    union boundary iff exactly one of its two sides is covered by some
    input polygon (midpoint ± a scale-relative normal offset, tested with
    the exact hole-aware point_in_polygon). Surviving edges are oriented
    interior-left and stitched into rings; CCW rings are shells, CW rings
    holes, holes assigned to the smallest enclosing shell.

    O(E^2) in the group's edge count — dissolve groups are expected to be
    small relative to the table (the Spark plan shuffles once on the
    dissolve key; this kernel runs per group inside an Arrow batch)."""
    polys = []
    for g in geoms:
        if g is None or g[0] == MISSING:
            continue
        if g[0] not in (POLYGON, MULTIPOLYGON):
            raise ValueError("unary_union dissolve supports polygon inputs; "
                             f"got type id {g[0]}")
        if len(g[1]):
            polys.append(g)
    if not polys:
        return None

    # 1. gather all boundary segments
    segs = []
    for g in polys:
        _, xs, ys, rings, _parts = g
        off = 0
        for rl in rings:
            for j in range(int(rl) - 1):
                a = (float(xs[off + j]), float(ys[off + j]))
                b = (float(xs[off + j + 1]), float(ys[off + j + 1]))
                if a != b:
                    segs.append((a, b))
            off += int(rl)

    span = 1.0
    for g in polys:
        if len(g[1]):
            span = max(span, float(np.max(np.abs(g[1]))),
                       float(np.max(np.abs(g[2]))))
    eps = eps_rel * span

    # 2. split every segment at intersections with every other
    sub_edges = []
    for i, (a, b) in enumerate(segs):
        ts = [0.0, 1.0]
        for j, (c, d) in enumerate(segs):
            if i == j:
                continue
            ts.extend(_split_params(a[0], a[1], b[0], b[1],
                                    c[0], c[1], d[0], d[1]))
        ts = sorted(set(ts))
        merged = [ts[0]]
        for t in ts[1:]:
            if t - merged[-1] > 1e-12:
                merged.append(t)
        ts = merged
        for t0, t1 in zip(ts[:-1], ts[1:]):
            p = (a[0] + (b[0] - a[0]) * t0, a[1] + (b[1] - a[1]) * t0)
            q = (a[0] + (b[0] - a[0]) * t1, a[1] + (b[1] - a[1]) * t1)
            if p != q:
                sub_edges.append((p, q))

    # 3. classify: keep edges with exactly one covered side, interior left
    def covered(px, py):
        return any(point_in_polygon(px, py, g[1], g[2], g[3], g[4])
                   for g in polys)

    boundary = []
    for (p, q) in sub_edges:
        mx, my = (p[0] + q[0]) / 2, (p[1] + q[1]) / 2
        dx, dy = q[0] - p[0], q[1] - p[1]
        ln = math.hypot(dx, dy)
        if ln == 0:
            continue
        nx, ny = -dy / ln, dx / ln   # left normal
        left = covered(mx + nx * eps, my + ny * eps)
        right = covered(mx - nx * eps, my - ny * eps)
        if left == right:
            continue
        boundary.append((p, q) if left else (q, p))

    # collapse duplicate directed edges (coincident ring segments)
    dedup = {}
    for (p, q) in boundary:
        k = (round(p[0], 9), round(p[1], 9), round(q[0], 9), round(q[1], 9))
        dedup[k] = (p, q)
    rings_out = _walk_rings(list(dedup.values()))

    shells, holes = [], []
    for r in rings_out:
        a = _ring_signed_area(r)
        if abs(a) < eps * eps:
            continue
        (shells if a > 0 else holes).append((abs(a), r))

    if not shells:
        return None

    # 4. assign each hole to the smallest shell containing it
    shells.sort(key=lambda t: t[0])
    assembled = [[s[1]] for s in shells]
    for ha, hr in holes:
        hx = sum(p[0] for p in hr[:-1]) / (len(hr) - 1)
        hy = sum(p[1] for p in hr[:-1]) / (len(hr) - 1)
        for si, (sa, sr) in enumerate(shells):
            if sa > ha:
                sx = np.array([p[0] for p in sr])
                sy = np.array([p[1] for p in sr])
                if point_in_ring(hx, hy, sx, sy) >= 0:
                    assembled[si].append(hr)
                    break

    xs_out, ys_out, rings_arr, parts_arr = [], [], [], []
    for part in assembled:
        parts_arr.append(len(part))
        for r in part:
            rings_arr.append(len(r))
            xs_out.extend(p[0] for p in r)
            ys_out.extend(p[1] for p in r)
    gt = POLYGON if len(assembled) == 1 else MULTIPOLYGON
    if gt == POLYGON:
        parts_arr = [len(rings_arr)]
    return (gt, np.array(xs_out), np.array(ys_out),
            np.array(rings_arr, dtype=np.int32),
            np.array(parts_arr, dtype=np.int32))
