"""Exact topological predicates touches / crosses / overlaps (DE-9IM).

Round 6 replaces the documented approximations (old algos.touches_pair
family) with GEOS-parity semantics, per the reference's GeoPandas-parity
surface (py-geopolars/docs/source/reference/geoseries.rst:47-64):

- ``touches(a,b)``  ⟺ a∩b ≠ ∅ and I(a)∩I(b) = ∅
- ``crosses(a,b)``  ⟺ I(a)∩I(b) ≠ ∅, dim(I(a)∩I(b)) < max(dim a, dim b),
  and the lower-dimensional operand's interior meets the other's exterior
- ``overlaps(a,b)`` ⟺ dim a = dim b = dim(I(a)∩I(b)) and neither operand
  covers the other

I(·) is the point-set interior: a polygon minus its rings, a line minus
its mod-2 boundary endpoints (OGC Mod-2 rule: a point is boundary of a
MultiLineString iff it is an endpoint of an odd number of parts), a
point's interior is itself (its boundary is empty).

Method — boundary noding + midpoint classification, the same machinery
the arrangement engine (geom/boolean.py) uses, specialized to yes/no
questions so no output geometry is built:

- line×line: every segment pair is classified as a proper/touching
  point contact (with exact interiority decided from the intersection
  PARAMETERS and the mod-2 boundary sets — no coordinate round-trip) or
  a collinear overlap interval (a dim-1 interior contact).
- line×polygon: each line segment is noded at every boundary contact;
  each sub-segment's midpoint is strictly-in / on-boundary / out of the
  polygon, which classifies the whole open sub-segment.
- polygon×polygon: interiors intersect iff a noded boundary sub-segment
  of either polygon has its midpoint strictly inside the other, OR a
  per-part interior probe point (widest-span scanline) of either lands
  strictly inside the other — the probe covers equal/nested polygons
  whose boundaries never enter the other's interior.
- point×anything: per-point classification (interior / boundary / off).

All float comparisons are exact (no epsilons), consistent with the rest
of the engine and with the intersects/contains kernels these predicates
compose with.
"""

from __future__ import annotations

import numpy as np

from .algos import (LINESTRING, MISSING, MULTILINESTRING, MULTIPOINT,
                    MULTIPOLYGON, POINT, POLYGON, _iter_segments,
                    contains_pair, intersects_pair, point_in_polygon)


def _dim(gt):
    if gt in (POINT, MULTIPOINT):
        return 0
    if gt in (LINESTRING, MULTILINESTRING):
        return 1
    return 2


def _line_boundary_set(g):
    """Mod-2 boundary of a (multi)line: part endpoints with odd count."""
    _, xs, ys, rings, _ = g
    cnt = {}
    off = 0
    for rl in rings:
        if rl >= 2:
            p1 = (xs[off], ys[off])
            p2 = (xs[off + rl - 1], ys[off + rl - 1])
            if p1 != p2:          # closed parts contribute no boundary
                cnt[p1] = cnt.get(p1, 0) + 1
                cnt[p2] = cnt.get(p2, 0) + 1
        off += rl
    return {p for p, c in cnt.items() if c % 2 == 1}


def _seg_seg(ax, ay, bx, by, cx, cy, dx, dy):
    """Classify the intersection of segments AB and CD.

    Returns None (disjoint), ("pt", t, u) — point contact at parameter t
    on AB / u on CD — or ("iv", lo, hi): collinear overlap over
    parameters [lo, hi] of AB (positive length)."""
    rx, ry = bx - ax, by - ay
    sx, sy = dx - cx, dy - cy
    rxs = rx * sy - ry * sx
    qpx, qpy = cx - ax, cy - ay
    qxr = qpx * ry - qpy * rx
    if rxs == 0:
        if qxr != 0:
            return None                      # parallel, apart
        rr = rx * rx + ry * ry
        if rr == 0:
            return None                      # degenerate AB
        t0 = (qpx * rx + qpy * ry) / rr
        t1 = t0 + (sx * rx + sy * ry) / rr
        lo, hi = (t0, t1) if t0 <= t1 else (t1, t0)
        lo = max(lo, 0.0)
        hi = min(hi, 1.0)
        if lo > hi:
            return None
        if lo == hi:                         # end-to-end collinear touch
            ss = sx * sx + sy * sy
            px_, py_ = ax + lo * rx, ay + lo * ry
            u = ((px_ - cx) * sx + (py_ - cy) * sy) / ss if ss else 0.0
            return ("pt", lo, u)
        return ("iv", lo, hi)
    t = (qpx * sy - qpy * sx) / rxs
    u = qxr / rxs
    if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
        return ("pt", t, u)
    return None


def _contact_interior(t, x1, y1, x2, y2, bnd):
    """Is the contact at parameter t on segment (x1,y1)-(x2,y2) an
    INTERIOR point of the owning line (i.e. not in its mod-2 boundary)?"""
    if t <= 0.0:
        p = (x1, y1)
    elif t >= 1.0:
        p = (x2, y2)
    else:
        p = (x1 + t * (x2 - x1), y1 + t * (y2 - y1))
    return p not in bnd


def _classify_pt_poly(px, py, g):
    """1 strictly inside, 0 on boundary, -1 outside a (multi)polygon."""
    _, xs, ys, rings, parts = g
    for x1, y1, x2, y2 in _iter_segments(xs, ys, rings):
        cross = (px - x1) * (y2 - y1) - (py - y1) * (x2 - x1)
        if cross == 0 and min(x1, x2) <= px <= max(x1, x2) \
                and min(y1, y2) <= py <= max(y1, y2):
            return 0
    return 1 if point_in_polygon(px, py, xs, ys, rings, parts) else -1


def _segments(g):
    _, xs, ys, rings, _ = g
    for s in _iter_segments(xs, ys, rings):
        if s[0] != s[2] or s[1] != s[3]:
            yield s


# ---------------------------------------------------------------------------
# pair relations by dimension pair
# ---------------------------------------------------------------------------

def _relate_point_other(gp, go):
    """(touches, crosses, overlaps) for pointish gp vs any go."""
    gt2 = go[0]
    d2 = _dim(gt2)
    xs, ys = gp[1], gp[2]
    bnd2 = _line_boundary_set(go) if d2 == 1 else None
    ii = False
    contact = False
    any_off = False
    for px, py in zip(xs, ys):
        if d2 == 0:
            hit = bool(np.any((go[1] == px) & (go[2] == py)))
            c = 1 if hit else -1
        elif d2 == 1:
            on = False
            for x1, y1, x2, y2 in _segments(go):
                cross = (px - x1) * (y2 - y1) - (py - y1) * (x2 - x1)
                if cross == 0 and min(x1, x2) <= px <= max(x1, x2) \
                        and min(y1, y2) <= py <= max(y1, y2):
                    on = True
                    break
            c = (0 if (px, py) in bnd2 else 1) if on else -1
        else:
            c = _classify_pt_poly(px, py, go)
        if c >= 0:
            contact = True
        if c == 1:
            ii = True
        if c == -1:
            any_off = True
    touches = contact and not ii
    crosses = d2 > 0 and ii and any_off
    if d2 == 0:
        # overlaps(point, point): shared points plus exclusive points on
        # BOTH sides
        shared = ii
        a_extra = any_off
        b_extra = False
        for qx, qy in zip(go[1], go[2]):
            if not bool(np.any((xs == qx) & (ys == qy))):
                b_extra = True
                break
        return touches, False, shared and a_extra and b_extra
    return touches, crosses, False


def _line_covered(ga, gb):
    """Is line ga a subset (as a point set) of line gb?  Every segment of
    ga must be covered by the union of its collinear overlaps with gb."""
    for a in _segments(ga):
        ivs = []
        for b in _segments(gb):
            r = _seg_seg(*a, *b)
            if r is not None and r[0] == "iv":
                ivs.append((r[1], r[2]))
        ivs.sort()
        reach = 0.0
        for lo, hi in ivs:
            if lo > reach:
                return False
            reach = max(reach, hi)
        if reach < 1.0:
            return False
    return True


def _relate_line_line(g1, g2):
    b1 = _line_boundary_set(g1)
    b2 = _line_boundary_set(g2)
    contact = False
    has_dim1 = False
    has_pt_ii = False
    for a in _segments(g1):
        for b in _segments(g2):
            r = _seg_seg(*a, *b)
            if r is None:
                continue
            contact = True
            if r[0] == "iv":
                has_dim1 = True
            else:
                if _contact_interior(r[1], *a, b1) \
                        and _contact_interior(r[2], *b, b2):
                    has_pt_ii = True
    touches = contact and not (has_dim1 or has_pt_ii)
    crosses = has_pt_ii and not has_dim1
    overlaps = (has_dim1 and not _line_covered(g1, g2)
                and not _line_covered(g2, g1))
    return touches, crosses, overlaps


def _noded_params(a, gp):
    """Sorted noding parameters of segment a against gp's boundary, plus
    whether ANY boundary contact exists."""
    params = [0.0, 1.0]
    contact = False
    for b in _segments(gp):
        r = _seg_seg(*a, *b)
        if r is None:
            continue
        contact = True
        if r[0] == "iv":
            params += [r[1], r[2]]
        else:
            params.append(r[1])
    return sorted(set(params)), contact


def _relate_line_poly(gl, gp):
    contact = False
    ii = False
    any_out = False
    for a in _segments(gl):
        ps, c = _noded_params(a, gp)
        contact = contact or c
        x1, y1, x2, y2 = a
        for t0, t1 in zip(ps, ps[1:]):
            if t1 <= t0:
                continue
            tm = 0.5 * (t0 + t1)
            cls = _classify_pt_poly(x1 + tm * (x2 - x1),
                                    y1 + tm * (y2 - y1), gp)
            if cls == 1:
                ii = True
            elif cls == -1:
                any_out = True
            else:
                contact = True
    touches = (contact or ii) and not ii
    crosses = ii and any_out
    return touches, crosses, False


def _parts_of(g):
    """Yield (xs, ys, rings) per part of a (multi)polygon."""
    _, xs, ys, rings, parts = g
    roff = 0
    coff = 0
    for nr in parts:
        rl = rings[roff:roff + nr]
        ncoord = int(np.sum(rl))
        yield xs[coff:coff + ncoord], ys[coff:coff + ncoord], rl
        roff += nr
        coff += ncoord


def _part_interior_point(xs, ys, rings):
    """Widest-span scanline interior point of one polygon part (the
    representative_point construction); None for degenerate parts."""
    ymid = 0.5 * (ys.min() + ys.max())
    if np.any(ys == ymid):
        ymid = np.nextafter(ymid, ys.max())
    crossings = []
    off = 0
    for rl in rings:
        x = xs[off:off + rl]
        y = ys[off:off + rl]
        for j in range(rl - 1):
            y1, y2 = y[j], y[j + 1]
            if (y1 > ymid) != (y2 > ymid):
                crossings.append(x[j] + (ymid - y1) * (x[j + 1] - x[j])
                                 / (y2 - y1))
        off += rl
    crossings.sort()
    best = None
    for k in range(0, len(crossings) - 1, 2):
        w = crossings[k + 1] - crossings[k]
        if w > 0 and (best is None or w > best[0]):
            best = (w, 0.5 * (crossings[k] + crossings[k + 1]))
    if best is None:
        return None
    return best[1], ymid


def _boundary_enters(ga, gb):
    """Does ga's boundary pass through gb's interior?  (noded midpoint
    probe)"""
    for a in _segments(ga):
        ps, _ = _noded_params(a, gb)
        x1, y1, x2, y2 = a
        for t0, t1 in zip(ps, ps[1:]):
            if t1 <= t0:
                continue
            tm = 0.5 * (t0 + t1)
            if _classify_pt_poly(x1 + tm * (x2 - x1),
                                 y1 + tm * (y2 - y1), gb) == 1:
                return True
    return False


def _rep_probe(ga, gb):
    """Is some part of ga's interior (probe point) strictly inside gb?"""
    for xs, ys, rings in _parts_of(ga):
        p = _part_interior_point(xs, ys, rings)
        if p is not None and _classify_pt_poly(p[0], p[1], gb) == 1:
            return True
    return False


def _relate_poly_poly(ga, gb):
    if not intersects_pair(ga, gb):
        return False, False, False
    ii = (_boundary_enters(ga, gb) or _boundary_enters(gb, ga)
          or _rep_probe(ga, gb) or _rep_probe(gb, ga))
    touches = not ii
    overlaps = ii and not contains_pair(ga, gb) and not contains_pair(gb, ga)
    return touches, False, overlaps


def relate_tco(g1, g2):
    """(touches, crosses, overlaps) for a pair of per-geometry tuples
    (gt, xs, ys, rings, parts); all three are symmetric in (g1, g2).
    GeometryCollection operands (gt=7, typed part entries) answer False
    conservatively — explode them first (GEOS likewise refuses GC in
    relate)."""
    gt1, xs1 = g1[0], g1[1]
    gt2, xs2 = g2[0], g2[1]
    if gt1 == MISSING or gt2 == MISSING or len(xs1) == 0 or len(xs2) == 0:
        return False, False, False
    if gt1 == 7 or gt2 == 7:
        return False, False, False
    # bbox reject — every relation needs a∩b ≠ ∅
    if xs1.max() < xs2.min() or xs2.max() < xs1.min() \
            or g1[2].max() < g2[2].min() or g2[2].max() < g1[2].min():
        return False, False, False
    d1, d2 = _dim(gt1), _dim(gt2)
    if d1 > d2:
        g1, g2, d1, d2 = g2, g1, d2, d1
    if d1 == 0:
        return _relate_point_other(g1, g2)
    if d1 == 1 and d2 == 1:
        return _relate_line_line(g1, g2)
    if d1 == 1:
        return _relate_line_poly(g1, g2)
    return _relate_poly_poly(g1, g2)


def touches_pair(g1, g2):
    return relate_tco(g1, g2)[0]


def crosses_pair(g1, g2):
    return relate_tco(g1, g2)[1]


def overlaps_pair(g1, g2):
    return relate_tco(g1, g2)[2]


def _batch(r1, r2, idx):
    """Batch driver: vectorized intersects prefilter (every relation
    implies a∩b ≠ ∅), exact scalar relate only on intersecting pairs."""
    from . import batch as _b
    n = len(r1)
    out = np.zeros(n, dtype=bool)
    pre = _b.intersects(r1, r2) & (r1.gt != MISSING) & (r2.gt != MISSING)
    for i in np.nonzero(pre)[0]:
        out[i] = relate_tco(r1.geom(i), r2.geom(i))[idx]
    return out


def touches(r1, r2):
    return _batch(r1, r2, 0)


def crosses(r1, r2):
    return _batch(r1, r2, 1)


def overlaps(r1, r2):
    return _batch(r1, r2, 2)


# ---------------------------------------------------------------------------
# full DE-9IM matrix (round 6): relate() / relate_pattern()
#
# The 9-character row-major string [II IB IE / BI BB BE / EI EB EE] with
# entries F/0/1/2, GEOS-compatible, built from the same primitives as
# the boolean predicates above. GeoPandas-parity `GeoSeries.relate`.
# ---------------------------------------------------------------------------

def _on_line(px, py, g):
    """Is (px,py) on the lineish geometry g?"""
    for x1, y1, x2, y2 in _segments(g):
        cross = (px - x1) * (y2 - y1) - (py - y1) * (x2 - x1)
        if cross == 0 and min(x1, x2) <= px <= max(x1, x2) \
                and min(y1, y2) <= py <= max(y1, y2):
            return True
    return False


def _m_point_point(ga, gb):
    ax, ay = ga[1], ga[2]
    bx, by = gb[1], gb[2]
    shared = a_extra = b_extra = False
    for px, py in zip(ax, ay):
        if bool(np.any((bx == px) & (by == py))):
            shared = True
        else:
            a_extra = True
    for px, py in zip(bx, by):
        if not bool(np.any((ax == px) & (ay == py))):
            b_extra = True
    return ("0" if shared else "F") + "F" \
        + ("0" if a_extra else "F") + "FFF" \
        + ("0" if b_extra else "F") + "F2"


def _m_point_line(ga, gb):
    bnd_b = _line_boundary_set(gb)
    ii = ib = ie = False
    for px, py in zip(ga[1], ga[2]):
        if _on_line(px, py, gb):
            if (px, py) in bnd_b:
                ib = True
            else:
                ii = True
        else:
            ie = True
    eb = any(not bool(np.any((ga[1] == q[0]) & (ga[2] == q[1])))
             for q in bnd_b)
    return ("0" if ii else "F") + ("0" if ib else "F") \
        + ("0" if ie else "F") + "FFF" \
        + "1" + ("0" if eb else "F") + "2"


def _m_point_poly(ga, gb):
    ii = ib = ie = False
    for px, py in zip(ga[1], ga[2]):
        c = _classify_pt_poly(px, py, gb)
        if c == 1:
            ii = True
        elif c == 0:
            ib = True
        else:
            ie = True
    return ("0" if ii else "F") + ("0" if ib else "F") \
        + ("0" if ie else "F") + "FFF" + "212"


def _m_line_line(ga, gb):
    bnd_a = _line_boundary_set(ga)
    bnd_b = _line_boundary_set(gb)
    has_iv = False
    has_pt_ii = False
    for a in _segments(ga):
        for b in _segments(gb):
            r = _seg_seg(*a, *b)
            if r is None:
                continue
            if r[0] == "iv":
                has_iv = True
            elif _contact_interior(r[1], *a, bnd_a) \
                    and _contact_interior(r[2], *b, bnd_b):
                has_pt_ii = True
    ii = "1" if has_iv else ("0" if has_pt_ii else "F")
    ib = "0" if any(_on_line(q[0], q[1], ga) and q not in bnd_a
                    for q in bnd_b) else "F"
    ie = "F" if _line_covered(ga, gb) else "1"
    bi = bb = be = "F"
    for p in bnd_a:
        if p in bnd_b:
            bb = "0"
        elif _on_line(p[0], p[1], gb):
            bi = "0"
        else:
            be = "0"
    ei = "F" if _line_covered(gb, ga) else "1"
    eb = "0" if any(not _on_line(q[0], q[1], ga) for q in bnd_b) else "F"
    return ii + ib + ie + bi + bb + be + ei + eb + "2"


def _m_line_poly(gl, gp):
    bnd_l = _line_boundary_set(gl)
    any_in = any_on = any_out = False
    ib0 = False
    for a in _segments(gl):
        ps, _c = _noded_params(a, gp)
        x1, y1, x2, y2 = a
        for t0, t1 in zip(ps, ps[1:]):
            if t1 <= t0:
                continue
            tm = 0.5 * (t0 + t1)
            cls = _classify_pt_poly(x1 + tm * (x2 - x1),
                                    y1 + tm * (y2 - y1), gp)
            if cls == 1:
                any_in = True
            elif cls == -1:
                any_out = True
            else:
                any_on = True
        if not ib0:
            for t in ps:
                px_, py_ = x1 + t * (x2 - x1), y1 + t * (y2 - y1)
                if _classify_pt_poly(px_, py_, gp) == 0 \
                        and _contact_interior(t, *a, bnd_l):
                    ib0 = True
                    break
    ii = "1" if any_in else "F"
    ib = "1" if any_on else ("0" if ib0 else "F")
    ie = "1" if any_out else "F"
    bi = bb = be = "F"
    for p in bnd_l:
        c = _classify_pt_poly(p[0], p[1], gp)
        if c == 1:
            bi = "0"
        elif c == 0:
            bb = "0"
        else:
            be = "0"
    # E(A) vs ∂B: a line covers the polygon's 1-D boundary only if every
    # boundary segment collinear-overlaps the line completely
    bnd_rings = (LINESTRING, gp[1], gp[2], gp[3],
                 np.ones(len(gp[3]), np.int32))
    eb = "F" if _line_covered(bnd_rings, gl) else "1"
    return ii + ib + ie + bi + bb + be + "2" + eb + "2"


def _m_poly_poly(ga, gb):
    b_in_a = _boundary_enters(gb, ga)
    a_in_b = _boundary_enters(ga, gb)
    ii = (b_in_a or a_in_b or _rep_probe(ga, gb) or _rep_probe(gb, ga))
    covers_ab = contains_pair(ga, gb)        # A covers B
    covers_ba = contains_pair(gb, ga)        # B covers A
    # boundary-boundary dimension
    bb = "F"
    for a in _segments(ga):
        for b in _segments(gb):
            r = _seg_seg(*a, *b)
            if r is None:
                continue
            if r[0] == "iv":
                bb = "1"
                break
            bb = "0"
        if bb == "1":
            break
    return (("2" if ii else "F")
            + ("1" if b_in_a else "F")
            + ("F" if covers_ba else "2")
            + ("1" if a_in_b else "F")
            + bb
            + ("F" if covers_ba else "1")
            + ("F" if covers_ab else "2")
            + ("F" if covers_ab else "1")
            + "2")


def _transpose(m):
    return (m[0] + m[3] + m[6] + m[1] + m[4] + m[7] + m[2] + m[5] + m[8])


def _dim_char(d):
    return "012"[d]


def relate_matrix(g1, g2):
    """Full DE-9IM matrix string for a pair of geometry tuples (GEOS
    ``relate``). GeometryCollection operands return None (GEOS throws
    for GC in relate; explode parts first)."""
    gt1, xs1 = g1[0], g1[1]
    gt2, xs2 = g2[0], g2[1]
    if gt1 == MISSING or gt2 == MISSING or gt1 == 7 or gt2 == 7:
        return None
    e1, e2 = len(xs1) == 0, len(xs2) == 0
    if e1 and e2:
        return "FFFFFFFF2"
    if e1 or e2:
        lo, hi = (g1, g2) if e1 else (g2, g1)
        d = _dim(hi[0])
        ei = _dim_char(d)
        if d == 2:
            eb = "1"
        elif d == 1:
            eb = "0" if _line_boundary_set(hi) else "F"
        else:
            eb = "F"
        m = "FFFFFF" + ei + eb + "2"
        return m if e1 else _transpose(m)
    d1, d2 = _dim(gt1), _dim(gt2)
    swapped = d1 > d2
    if swapped:
        g1, g2, d1, d2 = g2, g1, d2, d1
    if d1 == 0 and d2 == 0:
        m = _m_point_point(g1, g2)
    elif d1 == 0 and d2 == 1:
        m = _m_point_line(g1, g2)
    elif d1 == 0:
        m = _m_point_poly(g1, g2)
    elif d1 == 1 and d2 == 1:
        m = _m_line_line(g1, g2)
    elif d1 == 1:
        m = _m_line_poly(g1, g2)
    else:
        m = _m_poly_poly(g1, g2)
    return _transpose(m) if swapped else m


def matches_pattern(matrix, pattern):
    """DE-9IM pattern match: 'T' = any non-F dim, '*' = anything,
    'F'/'0'/'1'/'2' exact."""
    if matrix is None or len(pattern) != 9:
        return False
    for m, p in zip(matrix, pattern.upper()):
        if p == "*":
            continue
        if p == "T":
            if m == "F":
                return False
        elif m != p:
            return False
    return True
