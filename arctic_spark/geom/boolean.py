"""General polygon boolean operations via boundary arrangement — the
round-4 generalization of the dissolve kernel.

One engine serves `unary_union` (dissolve), row-aligned
``intersection/difference/union/symmetric_difference`` (reference
roadmap ``py-geopolars/docs/source/reference/geoseries.rst:67-77``) and
the general buffer's capsule union: every boundary edge of every input
is split at its intersections with all other edges (grid-binned
candidate pruning, vectorized split-parameter solve), each sub-edge is
classified by probing coverage of both operand sets a hair to its left
and right (binned vectorized ray-cast PIP), and an op-specific keep
rule decides which sub-edges lie on the result boundary::

    union                  in(p) = inA(p) | inB(p)
    intersection           in(p) = inA(p) & inB(p)
    difference             in(p) = inA(p) & ~inB(p)
    symmetric_difference   in(p) = inA(p) ^ inB(p)
    dissolve (one set)     in(p) = inA(p)

A sub-edge is on the result boundary iff ``in(left) != in(right)``; it
is oriented result-interior-on-the-left, stitched into rings (at
junctions the outgoing edge with maximal CCW turn keeps the interior
wedge edge-free), CCW rings become shells, CW rings holes, and holes
attach to the smallest enclosing shell.

All tolerances are span-relative (probe offset, vertex quantization,
minimum ring area), so the kernel behaves identically at unit scale and
at Web-Mercator magnitudes.

Complexity: with E edges and K ≈ √E grid cells, candidate generation is
~O(E) pairs for well-distributed inputs (worst case O(E²) when
everything lands in one cell); classification is O(probes · E / K) via
y-binning. The per-group dissolve path therefore survives groups with
tens of thousands of edges — the round-3 kernel's O(E²) pure-Python
loops were the bottleneck this module replaces.
"""

from __future__ import annotations

import math

import numpy as np

from .ragged import (LINESTRING, MISSING, MULTILINESTRING, MULTIPOINT,
                     MULTIPOLYGON, POINT, POLYGON, RaggedGeometry, gc_pack)

__all__ = ["union_polygons", "boolean_pair", "row_boolean",
           "difference_many", "OPS"]

OPS = ("union", "intersection", "difference", "symmetric_difference")

_KEEP = {
    "union": lambda a, b: a | b,
    "intersection": lambda a, b: a & b,
    "difference": lambda a, b: a & ~b,
    "symmetric_difference": lambda a, b: a ^ b,
}


# ---------------------------------------------------------------------------
# polygon-set flattening
# ---------------------------------------------------------------------------

class _PolySet:
    """Flat segment + ring/part lookup arrays for one operand set."""

    __slots__ = ("ax", "ay", "bx", "by", "ring_of_seg", "part_of_ring",
                 "is_outer", "n_rings", "n_parts")

    def __init__(self, ax, ay, bx, by, ring_of_seg, part_of_ring, is_outer):
        self.ax, self.ay, self.bx, self.by = ax, ay, bx, by
        self.ring_of_seg = ring_of_seg
        self.part_of_ring = part_of_ring
        self.is_outer = is_outer
        self.n_rings = part_of_ring.size
        self.n_parts = int(part_of_ring.max()) + 1 if part_of_ring.size else 0


def _build_set(polys):
    """polys: list of (gt, xs, ys, rings, parts) polygonal tuples →
    _PolySet (or None when the set is empty). Fully vectorized."""
    if not polys:
        return None
    xs = np.concatenate([np.asarray(p[1], dtype=np.float64) for p in polys])
    ys = np.concatenate([np.asarray(p[2], dtype=np.float64) for p in polys])
    rings = np.concatenate([np.asarray(p[3], dtype=np.int64) for p in polys])
    parts = np.concatenate([np.asarray(p[4], dtype=np.int64) for p in polys])
    if xs.size == 0 or rings.size == 0:
        return None
    ring_end = np.cumsum(rings)
    total = int(ring_end[-1])
    is_last = np.zeros(total, dtype=bool)
    is_last[ring_end - 1] = True
    a_idx = np.flatnonzero(~is_last)
    ax, ay = xs[a_idx], ys[a_idx]
    bx, by = xs[a_idx + 1], ys[a_idx + 1]
    ring_of_seg = np.repeat(np.arange(rings.size), np.maximum(rings - 1, 0))
    part_of_ring = np.repeat(np.arange(parts.size), parts)
    starts = np.concatenate(([0], np.cumsum(parts)[:-1]))
    pos_in_part = np.arange(part_of_ring.size) - np.repeat(starts, parts)
    is_outer = pos_in_part == 0
    keep = ~((ax == bx) & (ay == by))
    return _PolySet(ax[keep], ay[keep], bx[keep], by[keep],
                    ring_of_seg[keep], part_of_ring, is_outer)


# ---------------------------------------------------------------------------
# grid-binned candidate pairs + vectorized split parameters
# ---------------------------------------------------------------------------

def _grid_pairs(ax, ay, bx, by):
    """Candidate segment-pair indices (i < j) whose bboxes share a grid
    cell; pairs deduped and bbox-overlap filtered."""
    n = ax.size
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if n < 2:
        return empty
    minx, maxx = np.minimum(ax, bx), np.maximum(ax, bx)
    miny, maxy = np.minimum(ay, by), np.maximum(ay, by)
    if n <= 64:
        # small arrangement (row-wise ops on little polygons): all-pairs
        # bbox filter beats the binning machinery's fixed cost
        i, j = np.triu_indices(n, 1)
        m = ((minx[i] <= maxx[j]) & (minx[j] <= maxx[i])
             & (miny[i] <= maxy[j]) & (miny[j] <= maxy[i]))
        return i[m], j[m]
    gx0, gx1 = float(minx.min()), float(maxx.max())
    gy0, gy1 = float(miny.min()), float(maxy.max())
    K = int(np.clip(math.isqrt(n), 1, 128))
    hx = (gx1 - gx0) / K or 1.0
    hy = (gy1 - gy0) / K or 1.0
    ix0 = np.clip(((minx - gx0) / hx).astype(np.int64), 0, K - 1)
    ix1 = np.clip(((maxx - gx0) / hx).astype(np.int64), 0, K - 1)
    iy0 = np.clip(((miny - gy0) / hy).astype(np.int64), 0, K - 1)
    iy1 = np.clip(((maxy - gy0) / hy).astype(np.int64), 0, K - 1)
    nxc = ix1 - ix0 + 1
    nyc = iy1 - iy0 + 1
    cnt = nxc * nyc
    tot = int(cnt.sum())
    seg = np.repeat(np.arange(n), cnt)
    base = np.repeat(np.cumsum(cnt) - cnt, cnt)
    loc = np.arange(tot) - base
    w = np.repeat(nxc, cnt)
    cell = (np.repeat(iy0, cnt) + loc // w) * K + np.repeat(ix0, cnt) + loc % w
    order = np.argsort(cell, kind="stable")
    cs, ss = cell[order], seg[order]
    starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
    ends = np.r_[starts[1:], cs.size]
    pi, pj = [], []
    for s, e in zip(starts, ends):
        c = e - s
        if c < 2:
            continue
        ii, jj = np.triu_indices(c, 1)
        g = ss[s:e]
        pi.append(g[ii])
        pj.append(g[jj])
    if not pi:
        return empty
    i = np.concatenate(pi)
    j = np.concatenate(pj)
    lo = np.minimum(i, j)
    hi = np.maximum(i, j)
    key = np.unique(lo * n + hi)
    i, j = key // n, key % n
    m = ((minx[i] <= maxx[j]) & (minx[j] <= maxx[i])
         & (miny[i] <= maxy[j]) & (miny[j] <= maxy[i]))
    return i[m], j[m]


def _split_params_batch(ax, ay, bx, by, i, j):
    """For candidate pairs (i, j): interior split parameters on BOTH
    segments (proper crossings, T-junctions, collinear-overlap
    endpoints). Returns flat (segment_index, t) arrays."""
    teps = 1e-12
    rx, ry = bx[i] - ax[i], by[i] - ay[i]
    sx, sy = bx[j] - ax[j], by[j] - ay[j]
    rxs = rx * sy - ry * sx
    qpx, qpy = ax[j] - ax[i], ay[j] - ay[i]
    len_r = np.abs(rx) + np.abs(ry)
    len_s = np.abs(sx) + np.abs(sy)
    proper = np.abs(rxs) > 1e-12 * len_r * len_s
    den = np.where(proper, rxs, 1.0)
    t = (qpx * sy - qpy * sx) / den
    u = (qpx * ry - qpy * rx) / den
    inr = proper & (t > -teps) & (t < 1 + teps) & (u > -teps) & (u < 1 + teps)
    keep_t = inr & (t > teps) & (t < 1 - teps)
    keep_u = inr & (u > teps) & (u < 1 - teps)
    out_seg = [i[keep_t], j[keep_u]]
    out_t = [t[keep_t], u[keep_u]]
    colin = ~proper & (np.abs(qpx * ry - qpy * rx)
                       <= 1e-12 * np.maximum(1.0, len_r)
                       * np.maximum(1.0, len_r + len_s))
    if colin.any():
        ci, cj = i[colin], j[colin]
        rr = (bx[ci] - ax[ci]) ** 2 + (by[ci] - ay[ci]) ** 2
        ss2 = (bx[cj] - ax[cj]) ** 2 + (by[cj] - ay[cj]) ** 2
        for px, py, seg_idx, ox, oy, qx2, qy2, L2 in (
                (ax[cj], ay[cj], ci, ax[ci], ay[ci], bx[ci], by[ci], rr),
                (bx[cj], by[cj], ci, ax[ci], ay[ci], bx[ci], by[ci], rr),
                (ax[ci], ay[ci], cj, ax[cj], ay[cj], bx[cj], by[cj], ss2),
                (bx[ci], by[ci], cj, ax[cj], ay[cj], bx[cj], by[cj], ss2)):
            tt = ((px - ox) * (qx2 - ox) + (py - oy) * (qy2 - oy)) \
                / np.where(L2 > 0, L2, 1.0)
            k = (L2 > 0) & (tt > teps) & (tt < 1 - teps)
            out_seg.append(seg_idx[k])
            out_t.append(tt[k])
    return np.concatenate(out_seg), np.concatenate(out_t)


def _subdivide(ax, ay, bx, by, seg_idx, ts):
    """Split every segment at its sorted interior parameters → sub-edge
    endpoint arrays (px, py) → (qx, qy)."""
    n = ax.size
    seg_all = np.concatenate(
        [np.arange(n), np.arange(n), seg_idx]).astype(np.int64)
    t_all = np.concatenate([np.zeros(n), np.ones(n), ts])
    order = np.lexsort((t_all, seg_all))
    s, t = seg_all[order], t_all[order]
    keep = np.r_[True, (s[1:] != s[:-1]) | (t[1:] - t[:-1] > 1e-12)]
    s, t = s[keep], t[keep]
    m = s[1:] == s[:-1]
    s0, t0, t1 = s[:-1][m], t[:-1][m], t[1:][m]
    dx, dy = bx[s0] - ax[s0], by[s0] - ay[s0]
    return (ax[s0] + dx * t0, ay[s0] + dy * t0,
            ax[s0] + dx * t1, ay[s0] + dy * t1)


# ---------------------------------------------------------------------------
# binned vectorized coverage test (boundary-inclusive, hole-aware PIP)
# ---------------------------------------------------------------------------

def _covered(px, py, ps: _PolySet | None):
    """Is each probe point covered by the polygon set? y-binned ray
    cast: a segment can only cross a probe's horizontal ray if its
    y-extent overlaps the probe's y, so y-binning is exact pruning.
    Per-(probe, ring) parity then hole-aware per-part reduction,
    mirroring batch.points_in_polygons (which is unpruned pair-product
    and would be O(probes·E) memory here)."""
    npts = px.size
    res = np.zeros(npts, dtype=bool)
    if ps is None or ps.ax.size == 0 or npts == 0:
        return res
    if npts * ps.ax.size <= 4096:
        # small pair product: skip the binning machinery entirely
        P = np.repeat(np.arange(npts), ps.ax.size)
        S = np.tile(np.arange(ps.ax.size), npts)
        return _covered_pairs(px, py, ps, P, S, res)
    sminy = np.minimum(ps.ay, ps.by)
    smaxy = np.maximum(ps.ay, ps.by)
    gy0 = float(min(sminy.min(), py.min()))
    gy1 = float(max(smaxy.max(), py.max()))
    K = int(np.clip(math.isqrt(ps.ax.size), 1, 256))
    h = (gy1 - gy0) / K or 1.0
    sb0 = np.clip(((sminy - gy0) / h).astype(np.int64), 0, K - 1)
    sb1 = np.clip(((smaxy - gy0) / h).astype(np.int64), 0, K - 1)
    pb = np.clip(((py - gy0) / h).astype(np.int64), 0, K - 1)
    cnt = sb1 - sb0 + 1
    seg = np.repeat(np.arange(ps.ax.size), cnt)
    base = np.repeat(np.cumsum(cnt) - cnt, cnt)
    sbin = np.repeat(sb0, cnt) + np.arange(int(cnt.sum())) - base
    s_order = np.argsort(sbin, kind="stable")
    sbin_s, seg_s = sbin[s_order], seg[s_order]
    p_order = np.argsort(pb, kind="stable")
    pb_s, pidx_s = pb[p_order], np.arange(npts)[p_order]
    s_starts = np.searchsorted(sbin_s, np.arange(K))
    s_ends = np.searchsorted(sbin_s, np.arange(K), side="right")
    p_starts = np.searchsorted(pb_s, np.arange(K))
    p_ends = np.searchsorted(pb_s, np.arange(K), side="right")
    PP, SS = [], []
    for b in range(K):
        np_b = p_ends[b] - p_starts[b]
        ns_b = s_ends[b] - s_starts[b]
        if np_b == 0 or ns_b == 0:
            continue
        p_ids = pidx_s[p_starts[b]:p_ends[b]]
        s_ids = seg_s[s_starts[b]:s_ends[b]]
        PP.append(np.repeat(p_ids, ns_b))
        SS.append(np.tile(s_ids, np_b))
    if not PP:
        return res
    P = np.concatenate(PP)
    S = np.concatenate(SS)
    return _covered_pairs(px, py, ps, P, S, res)


def _covered_pairs(px, py, ps, P, S, res):
    """Shared tail of _covered: parity classification over explicit
    (probe, segment) pair lists."""
    ppx, ppy = px[P], py[P]
    sax, say = ps.ax[S], ps.ay[S]
    sbx, sby = ps.bx[S], ps.by[S]
    cross = (ppx - sax) * (sby - say) - (ppy - say) * (sbx - sax)
    on_b = ((cross == 0)
            & (ppx >= np.minimum(sax, sbx)) & (ppx <= np.maximum(sax, sbx))
            & (ppy >= np.minimum(say, sby)) & (ppy <= np.maximum(say, sby)))
    crossing = (say > ppy) != (sby > ppy)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = sax + (ppy - say) * (sbx - sax) / (sby - say)
    crossing &= ppx < xint
    if ps.n_rings == 1:
        # single ring == single part: covered = on-boundary | odd parity,
        # reduced directly per probe (no unique/regroup machinery)
        on_any = np.zeros(res.size, dtype=bool)
        np.logical_or.at(on_any, P, on_b)
        parity = np.zeros(res.size, dtype=np.int64)
        np.add.at(parity, P, crossing)
        res |= on_any | ((parity % 2) == 1)
        return res
    ring = ps.ring_of_seg[S]
    key = P.astype(np.int64) * (ps.n_rings + 1) + ring
    uk, inv = np.unique(key, return_inverse=True)
    on_b_r = np.zeros(uk.size, dtype=bool)
    np.logical_or.at(on_b_r, inv, on_b)
    parity = np.zeros(uk.size, dtype=np.int64)
    np.add.at(parity, inv, crossing)
    strict = ((parity % 2) == 1) & ~on_b_r
    uq = uk // (ps.n_rings + 1)
    uring = uk % (ps.n_rings + 1)
    upart = ps.part_of_ring[uring]
    outer = ps.is_outer[uring]
    key2 = uq * (ps.n_parts + 1) + upart
    uk2, inv2 = np.unique(key2, return_inverse=True)
    on_b_outer = np.zeros(uk2.size, dtype=bool)
    np.logical_or.at(on_b_outer, inv2, on_b_r & outer)
    strict_outer = np.zeros(uk2.size, dtype=bool)
    np.logical_or.at(strict_outer, inv2, strict & outer)
    hole_on_b = np.zeros(uk2.size, dtype=bool)
    np.logical_or.at(hole_on_b, inv2, on_b_r & ~outer)
    hole_strict = np.zeros(uk2.size, dtype=bool)
    np.logical_or.at(hole_strict, inv2, strict & ~outer)
    part_res = on_b_outer | (strict_outer & (hole_on_b | ~hole_strict))
    np.logical_or.at(res, uk2 // (ps.n_parts + 1), part_res)
    return res


# ---------------------------------------------------------------------------
# ring stitching + shell/hole assembly (span-relative quantization)
# ---------------------------------------------------------------------------

def _walk_rings(edges, quant):
    """Stitch directed boundary edges (interior on the left) into closed
    rings; at junctions pick the outgoing edge maximizing the CCW angle
    from the reversed incoming direction. Vertex keys quantize at
    ``quant`` (span-relative — fixes the absolute 1e-9 rounding that
    broke stitching at Web-Mercator magnitudes)."""
    def key(p):
        return (round(p[0] / quant), round(p[1] / quant))

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
            rev = math.atan2(b[1] - a[1], b[0] - a[0]) + math.pi
            best, best_ang = cands[0], -1.0
            for i in cands:
                ca, cb = edges[i]
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


def _assemble(edges, quant, min_area):
    """Directed boundary edges → (gt, xs, ys, rings, parts) or None."""
    rings_out = _walk_rings(edges, quant)
    shells, holes = [], []
    for r in rings_out:
        a = _ring_signed_area(r)
        if abs(a) < min_area:
            continue
        (shells if a > 0 else holes).append((abs(a), r))
    if not shells:
        return None
    shells.sort(key=lambda t: t[0])
    assembled = [[s[1]] for s in shells]
    for ha, hr in holes:
        hx = sum(p[0] for p in hr[:-1]) / (len(hr) - 1)
        hy = sum(p[1] for p in hr[:-1]) / (len(hr) - 1)
        for si, (sa, sr) in enumerate(shells):
            if sa > ha:
                sx = np.array([p[0] for p in sr])
                sy = np.array([p[1] for p in sr])
                if _point_in_ring_np(hx, hy, sx, sy):
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


def _point_in_ring_np(px, py, x, y):
    """Boundary-inclusive point-in-ring (vectorized over the ring)."""
    x1, y1, x2, y2 = x[:-1], y[:-1], x[1:], y[1:]
    cross = (px - x1) * (y2 - y1) - (py - y1) * (x2 - x1)
    on = ((cross == 0) & (px >= np.minimum(x1, x2)) & (px <= np.maximum(x1, x2))
          & (py >= np.minimum(y1, y2)) & (py <= np.maximum(y1, y2)))
    if on.any():
        return True
    crossing = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    return bool((crossing & (px < xint)).sum() % 2)


# ---------------------------------------------------------------------------
# the merge engine
# ---------------------------------------------------------------------------

def _merge(polys_a, polys_b, op, eps_rel=1e-9):
    """Arrangement + classify + stitch for two operand sets (polys_b may
    be empty → single-set dissolve). Returns geometry tuple or None."""
    A = _build_set(polys_a)
    B = _build_set(polys_b) if polys_b else None
    keep = _KEEP[op] if op in _KEEP else (lambda a, b: a)
    if A is None and B is None:
        return None
    sets = [s for s in (A, B) if s is not None]
    ax = np.concatenate([s.ax for s in sets])
    ay = np.concatenate([s.ay for s in sets])
    bx = np.concatenate([s.bx for s in sets])
    by = np.concatenate([s.by for s in sets])
    span = max(1.0, float(np.abs(ax).max()), float(np.abs(ay).max()),
               float(np.abs(bx).max()), float(np.abs(by).max()))
    eps = eps_rel * span
    i, j = _grid_pairs(ax, ay, bx, by)
    if i.size:
        seg_idx, ts = _split_params_batch(ax, ay, bx, by, i, j)
    else:
        seg_idx, ts = np.empty(0, np.int64), np.empty(0)
    px, py, qx, qy = _subdivide(ax, ay, bx, by, seg_idx, ts)
    dx, dy = qx - px, qy - py
    ln = np.hypot(dx, dy)
    ok = ln > 0
    px, py, qx, qy, dx, dy, ln = (px[ok], py[ok], qx[ok], qy[ok],
                                  dx[ok], dy[ok], ln[ok])
    mx, my = (px + qx) / 2, (py + qy) / 2
    nx, ny = -dy / ln, dx / ln
    lqx, lqy = mx + nx * eps, my + ny * eps
    rqx, rqy = mx - nx * eps, my - ny * eps
    # one classification pass per operand set: left and right probes
    # concatenate, halving the per-call fixed cost (matters for the
    # row-wise small-pair workload)
    qx2, qy2 = np.concatenate([lqx, rqx]), np.concatenate([lqy, rqy])
    inA = _covered(qx2, qy2, A)
    inA_l, inA_r = inA[:px.size], inA[px.size:]
    if B is not None:
        inB = _covered(qx2, qy2, B)
        inB_l, inB_r = inB[:px.size], inB[px.size:]
    else:
        inB_l = np.zeros(px.size, dtype=bool)
        inB_r = inB_l
    fl = keep(inA_l, inB_l)
    fr = keep(inA_r, inB_r)
    bd = fl != fr
    if not bd.any():
        return None
    quant = eps
    dedup = {}
    for k in np.flatnonzero(bd):
        if fl[k]:
            p, q = (px[k], py[k]), (qx[k], qy[k])
        else:
            p, q = (qx[k], qy[k]), (px[k], py[k])
        kk = (round(p[0] / quant), round(p[1] / quant),
              round(q[0] / quant), round(q[1] / quant))
        dedup[kk] = (p, q)
    return _assemble(list(dedup.values()), quant, eps * eps)


def shared_paths(g1, g2, eps_rel=1e-9):
    """GEOS ``shared_paths`` semantics: the 1-D stretches where two
    lineal geometries run collinearly, split by relative direction.
    Returns (same_mls, opposite_mls) — two MultiLineString tuples
    (either possibly empty), measured along ``g1``. (GEOS wraps the two
    in a GeometryCollection; the ragged codec flattens GC children to
    single-type parts, so the two-member grouping is returned as a pair
    here and the column API exposes a ``direction`` selector instead.)
    Built on the engine's sub-segment splitter: g1 is noded at every
    crossing and projected g2 vertex, covered sub-segments classify
    direction by the sign of the dot product with the coincident g2
    segment, and consecutive same-class sub-segments stitch back into
    polylines."""
    span = _geom_span(g1, g2)
    eps = eps_rel * span
    oax, oay, obx, oby = _line_segments(g2)
    odx, ody = obx - oax, oby - oay
    olen = np.hypot(odx, ody)

    def direction(mx, my, dx, dy):
        """+1 same / -1 opposite direction of the g2 segment collinearly
        containing (mx, my); 0 if none (shouldn't happen for covered)."""
        if oax.size == 0:
            return 0
        rx, ry = mx - oax, my - oay
        ln2 = np.maximum(olen * olen, 1e-300)
        t = np.clip((rx * odx + ry * ody) / ln2, 0.0, 1.0)
        qx, qy = rx - t * odx, ry - t * ody
        near = (qx * qx + qy * qy) <= eps * eps
        cross = np.abs(dx * ody - dy * odx)
        par = cross <= eps * np.maximum(olen, eps)
        cand = near & par
        if not cand.any():
            return 0
        k = int(np.flatnonzero(cand)[0])
        return 1 if dx * odx[k] + dy * ody[k] >= 0 else -1

    groups = {1: [], -1: []}
    cur_cls, cur_x, cur_y = 0, [], []

    def flush():
        nonlocal cur_cls, cur_x, cur_y
        if cur_cls != 0 and len(cur_x) >= 2:
            groups[cur_cls].append((cur_x, cur_y))
        cur_cls, cur_x, cur_y = 0, [], []

    for sub in _split_line_sub_segments(g1, g2, eps):
        if sub is None:
            flush()
            continue
        x0, y0, x1, y1, cov = sub
        if not cov:
            flush()
            continue
        cls = direction((x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0)
        if cls == 0:
            flush()
            continue
        contiguous = (cur_cls == cls and cur_x
                      and math.hypot(cur_x[-1] - x0, cur_y[-1] - y0) <= eps)
        if not contiguous:
            flush()
            cur_cls = cls
            cur_x, cur_y = [x0], [y0]
        cur_x.append(x1)
        cur_y.append(y1)
    flush()

    out = []
    for cls in (1, -1):                        # GEOS order: same, opposite
        xs, ys, rings = [], [], []
        for cx, cy in groups[cls]:
            xs.extend(cx); ys.extend(cy); rings.append(len(cx))
        out.append((MULTILINESTRING, np.asarray(xs, np.float64),
                    np.asarray(ys, np.float64),
                    np.asarray(rings, np.int32),
                    np.ones(len(rings), np.int32)))
    return out[0], out[1]


def polygonize(g, eps_rel=1e-9):
    """Faces of the noded arrangement of a (Multi)LineString — the
    GEOS/shapely ``polygonize`` semantics, built on the engine's own
    noding: mutually intersect all segments (grid-pruned), trim dangles
    and cut edges (iterative degree-1 peel), walk minimal faces with the
    interior-left turn rule, keep CCW cycles as polygon shells, and
    assign each connected component's CW outer cycle as a hole of the
    smallest containing shell from ANOTHER component (nested islands →
    donuts, exactly GEOS's EdgeRing hole assignment). The unbounded
    face's CW cycle is contained by no shell and drops out. Returns a
    (Multi)Polygon geometry tuple, or None when no face closes."""
    ax, ay, bx, by = _line_segments(g)
    if ax.size == 0:
        return None
    span = max(1.0, float(np.abs(ax).max()), float(np.abs(ay).max()),
               float(np.abs(bx).max()), float(np.abs(by).max()))
    quant = eps_rel * span
    i, j = _grid_pairs(ax, ay, bx, by)
    if i.size:
        seg_idx, ts = _split_params_batch(ax, ay, bx, by, i, j)
    else:
        seg_idx, ts = np.empty(0, np.int64), np.empty(0)
    px, py, qx, qy = _subdivide(ax, ay, bx, by, seg_idx, ts)
    ok = np.hypot(qx - px, qy - py) > 0
    px, py, qx, qy = px[ok], py[ok], qx[ok], qy[ok]

    def key(x, y):
        return (round(x / quant), round(y / quant))

    # dedupe undirected sub-edges
    und = {}
    for k in range(px.size):
        ka, kb = key(px[k], py[k]), key(qx[k], qy[k])
        if ka == kb:
            continue
        und[(min(ka, kb), max(ka, kb))] = ((px[k], py[k]), (qx[k], qy[k]))
    # iterative dangle/cut-edge trim: drop edges at degree-1 vertices
    while True:
        deg = {}
        for ka, kb in und:
            deg[ka] = deg.get(ka, 0) + 1
            deg[kb] = deg.get(kb, 0) + 1
        drop = [e for e in und if deg[e[0]] < 2 or deg[e[1]] < 2]
        if not drop:
            break
        for e in drop:
            del und[e]
    if not und:
        return None
    # connected components (union-find on quantized vertices)
    parent = {}

    def find(v):
        r = v
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(v, v) != v:
            parent[v], v = r, parent[v]
        return r

    for ka, kb in und:
        ra, rb = find(ka), find(kb)
        if ra != rb:
            parent[ra] = rb
    # directed edges, both ways
    edges = []
    for (p, q) in und.values():
        edges.append((p, q))
        edges.append((q, p))
    out_by_start = {}
    for idx, (a, b) in enumerate(edges):
        out_by_start.setdefault(key(*a), []).append(idx)
    # successor: max CCW turn from the reversed incoming direction;
    # the reverse edge ranks lowest (taken only at a dead end)
    succ = []
    for a, b in edges:
        kb, ka = key(*b), key(*a)
        rev = math.atan2(a[1] - b[1], a[0] - b[0])
        best, best_ang = None, -1.0
        for c in out_by_start.get(kb, []):
            ca, cb = edges[c]
            ang = ((math.atan2(cb[1] - ca[1], cb[0] - ca[0]) - rev)
                   % (2 * math.pi))
            if key(*cb) == ka and key(*ca) == kb:
                ang = 0.0                     # the reverse edge: last resort
            elif ang == 0.0:
                ang = 2 * math.pi
            if ang > best_ang:
                best_ang, best = ang, c
        succ.append(best)
    used = [False] * len(edges)
    shells, cw_rings = [], []                  # (area, ring, component)
    for s in range(len(edges)):
        if used[s]:
            continue
        ring = []
        cur = s
        for _guard in range(len(edges) + 1):
            if used[cur]:
                break
            used[cur] = True
            ring.append(edges[cur][0])
            cur = succ[cur]
        if cur != s or len(ring) < 3:
            continue
        ring.append(ring[0])
        a2 = _ring_signed_area(ring)
        comp = find(key(*ring[0]))
        if a2 > quant * quant:
            shells.append((a2, ring, comp))
        elif a2 < -quant * quant:
            cw_rings.append((-a2, ring, comp))
    if not shells:
        return None
    shells.sort(key=lambda t: t[0])
    assembled = [[s[1]] for s in shells]
    for ha, hr, hc in cw_rings:
        for si, (sa, sr, sc) in enumerate(shells):
            if sc != hc and sa > ha:
                sx = np.array([p[0] for p in sr])
                sy = np.array([p[1] for p in sr])
                if _point_in_ring_np(hr[0][0], hr[0][1], sx, sy):
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


_EMPTY = (POLYGON, np.empty(0), np.empty(0),
          np.empty(0, np.int32), np.empty(0, np.int32))


# ---------------------------------------------------------------------------
# mixed-dimension operands (point/line × point/line/polygon)
#
# GEOS-style dimension rules: intersection returns the lower dimension
# (points covered by the other operand; a line clipped to a polygon's
# closed point set; line×line crossing points); difference removes
# nothing when the subtrahend has lower dimension; union/symdiff of
# mixed dimensions would be a GeometryCollection, which the ragged codec
# does not represent — those raise (documented limit, enums.py:4-15 of
# the reference declares GC=7 but its codec never ships one either).
# ---------------------------------------------------------------------------

_POINTISH = (POINT, MULTIPOINT)
_LINEISH = (LINESTRING, MULTILINESTRING)
_POLYISH = (POLYGON, MULTIPOLYGON)


def _dim(g):
    gt = g[0]
    if gt in _POINTISH:
        return 0
    if gt in _LINEISH:
        return 1
    if gt in _POLYISH:
        return 2
    raise NotImplementedError(
        f"boolean ops: unsupported geometry type id {gt}")


def _empty_of(dim):
    z = np.empty(0)
    zi = np.empty(0, np.int32)
    return ((POINT, LINESTRING, POLYGON)[dim], z, z, zi, zi)


def _pack_points(px, py):
    px = np.asarray(px, float)
    py = np.asarray(py, float)
    n = px.size
    if n == 0:
        return _empty_of(0)
    ones = np.ones(n, np.int32)
    return (POINT if n == 1 else MULTIPOINT, px, py, ones, ones)


def _pack_lines(parts_xy):
    """parts_xy: list of (xs list, ys list) polylines (each ≥ 2 pts)."""
    if not parts_xy:
        return _empty_of(1)
    xs = np.concatenate([np.asarray(p[0], float) for p in parts_xy])
    ys = np.concatenate([np.asarray(p[1], float) for p in parts_xy])
    rings = np.array([len(p[0]) for p in parts_xy], np.int32)
    if len(parts_xy) == 1:
        return (LINESTRING, xs, ys, rings, np.array([1], np.int32))
    return (MULTILINESTRING, xs, ys, rings,
            np.ones(len(parts_xy), np.int32))


def _geom_span(*gs):
    m = 1.0
    for g in gs:
        if len(g[1]):
            m = max(m, float(np.abs(g[1]).max()), float(np.abs(g[2]).max()))
    return m


def _line_segments(g):
    """Flat (ax, ay, bx, by) over every part/ring of g."""
    xs, ys, rings = g[1], g[2], g[3]
    axs, ays, bxs, bys = [], [], [], []
    off = 0
    for rl in rings:
        axs.append(xs[off:off + rl - 1])
        bxs.append(xs[off + 1:off + rl])
        ays.append(ys[off:off + rl - 1])
        bys.append(ys[off + 1:off + rl])
        off += rl
    if not axs:
        return (np.empty(0),) * 4
    return (np.concatenate(axs), np.concatenate(ays),
            np.concatenate(bxs), np.concatenate(bys))


# Dense pair-matrix kernels are CHUNKED so two large line operands
# (e.g. 50k-vertex coastlines) never allocate an n1×n2 float64 block
# bigger than ~32 MB in the UDF worker (ADVICE r5: the un-chunked
# matrices could reach multi-GB and OOM the executor's Python worker).
_PAIR_BUDGET = 4_000_000


def _near_segments(px, py, ax, ay, bx, by, eps):
    """Each query point within eps of ANY segment (points × segs),
    evaluated in bounded blocks over the segment axis."""
    if ax.size == 0 or px.size == 0:
        return np.zeros(px.size, bool)
    out = np.zeros(px.size, bool)
    step = max(1, _PAIR_BUDGET // max(px.size, 1))
    for s0 in range(0, ax.size, step):
        s1 = min(s0 + step, ax.size)
        dx = (bx[s0:s1] - ax[s0:s1])[None, :]
        dy = (by[s0:s1] - ay[s0:s1])[None, :]
        rx = px[:, None] - ax[s0:s1][None, :]
        ry = py[:, None] - ay[s0:s1][None, :]
        ln2 = dx * dx + dy * dy
        t = np.clip(np.divide(rx * dx + ry * dy, ln2,
                              out=np.zeros_like(rx), where=ln2 > 0),
                    0.0, 1.0)
        qx = rx - t * dx
        qy = ry - t * dy
        out |= ((qx * qx + qy * qy) <= eps * eps).any(axis=1)
        if out.all():
            break
    return out


def _covered_points(px, py, g, eps):
    """Boundary-inclusive coverage of query points by geometry g."""
    from . import algos
    px = np.asarray(px, float)
    py = np.asarray(py, float)
    gt = g[0]
    if gt in _POLYISH:
        return np.fromiter(
            (bool(algos.point_in_polygon(x, y, g[1], g[2], g[3], g[4]))
             for x, y in zip(px, py)), bool, px.size)
    if gt in _LINEISH:
        return _near_segments(px, py, *_line_segments(g), eps)
    out = np.zeros(px.size, bool)
    for gx, gy in zip(g[1], g[2]):
        out |= (px == gx) & (py == gy)
    return out


def _point_set_op(g1, g2, op):
    """Exact-coordinate set algebra on two pointish operands."""
    p1 = list(dict.fromkeys(zip(g1[1].tolist(), g1[2].tolist())))
    p2 = list(dict.fromkeys(zip(g2[1].tolist(), g2[2].tolist())))
    s1, s2 = set(p1), set(p2)
    if op == "intersection":
        keep = [p for p in p1 if p in s2]
    elif op == "difference":
        keep = [p for p in p1 if p not in s2]
    elif op == "union":
        keep = p1 + [p for p in p2 if p not in s1]
    else:
        keep = [p for p in p1 if p not in s2] + \
               [p for p in p2 if p not in s1]
    return _pack_points([p[0] for p in keep], [p[1] for p in keep])


def _collinear_overlap(g1, g2, eps):
    """True if any segment of g1 overlaps a segment of g2 collinearly
    over more than an eps-length extent. Chunked over g1's segment axis
    (bounded blocks, early exit) — see _PAIR_BUDGET."""
    a1x, a1y, b1x, b1y = _line_segments(g1)
    a2x, a2y, b2x, b2y = _line_segments(g2)
    if a1x.size == 0 or a2x.size == 0:
        return False
    d2x = (b2x - a2x)[None, :]
    d2y = (b2y - a2y)[None, :]
    l2 = np.maximum(np.hypot(d2x, d2y), eps)
    step = max(1, _PAIR_BUDGET // max(a2x.size, 1))
    for s0 in range(0, a1x.size, step):
        s1 = min(s0 + step, a1x.size)
        d1x = (b1x[s0:s1] - a1x[s0:s1])[:, None]
        d1y = (b1y[s0:s1] - a1y[s0:s1])[:, None]
        wx = a2x[None, :] - a1x[s0:s1][:, None]
        wy = a2y[None, :] - a1y[s0:s1][:, None]
        denom = d1x * d2y - d1y * d2x
        l1 = np.hypot(d1x, d1y)
        par = np.abs(denom) <= eps * np.maximum(l1, eps) * l2
        if not par.any():
            continue
        off_line = np.abs(wx * d1y - wy * d1x)
        coll = par & (off_line <= eps * np.maximum(l1, eps))
        if not coll.any():
            continue
        l1sq = np.maximum(d1x * d1x + d1y * d1y, 1e-300)
        ta = (wx * d1x + wy * d1y) / l1sq
        tb = ((wx + d2x) * d1x + (wy + d2y) * d1y) / l1sq
        lo = np.minimum(ta, tb)
        hi = np.maximum(ta, tb)
        ext = np.minimum(hi, 1.0) - np.maximum(lo, 0.0)
        if bool((coll & (ext * l1 > eps)).any()):
            return True
    return False


def _split_line_sub_segments(line, other, eps):
    """Split every segment of ``line`` at its crossings with ``other``'s
    segments and at ``other``'s vertices projected onto it; yield
    (p0x, p0y, p1x, p1y, covered) sub-segments in traversal order with
    part breaks as None sentinels. covered = midpoint within eps of
    ``other`` (1-D coincidence)."""
    oax, oay, obx, oby = _line_segments(other)
    xs, ys, rings = line[1], line[2], line[3]
    off = 0
    for rl in rings:
        yield None  # part break
        lx, ly = xs[off:off + rl], ys[off:off + rl]
        off += rl
        for i in range(rl - 1):
            sax, say = lx[i], ly[i]
            dx, dy = lx[i + 1] - sax, ly[i + 1] - say
            seglen = math.hypot(dx, dy)
            if seglen <= 0:
                continue
            ts = [0.0, 1.0]
            if oax.size:
                ex, ey = obx - oax, oby - oay
                denom = dx * ey - dy * ex
                wx, wy = oax - sax, oay - say
                with np.errstate(divide="ignore", invalid="ignore"):
                    t = np.where(denom != 0,
                                 (wx * ey - wy * ex) / denom, np.nan)
                    u = np.where(denom != 0,
                                 (wx * dy - wy * dx) / denom, np.nan)
                m = (~np.isnan(t)) & (t > 0) & (t < 1) & (u >= 0) & (u <= 1)
                ts += t[m].tolist()
                for vx, vy in ((oax, oay), (obx, oby)):
                    rx, ry = vx - sax, vy - say
                    tv = (rx * dx + ry * dy) / (seglen * seglen)
                    qx, qy = rx - tv * dx, ry - tv * dy
                    on = (tv > 0) & (tv < 1) & (qx * qx + qy * qy
                                                <= eps * eps)
                    ts += tv[on].tolist()
            ts = sorted(set(ts))
            for t0, t1 in zip(ts[:-1], ts[1:]):
                if (t1 - t0) * seglen <= eps:
                    continue
                tm = (t0 + t1) / 2
                mx, my = sax + tm * dx, say + tm * dy
                cov = bool(_near_segments(np.array([mx]), np.array([my]),
                                          oax, oay, obx, oby, eps)[0])
                yield (sax + t0 * dx, say + t0 * dy,
                       sax + t1 * dx, say + t1 * dy, cov)


def _line_select_coverage(line, other, keep_covered, eps):
    """Sub-segments of ``line`` that are (not) 1-D coincident with
    ``other``, stitched back into polylines."""
    out_parts = []
    cur_x, cur_y = [], []

    def flush():
        nonlocal cur_x, cur_y
        if len(cur_x) >= 2:
            out_parts.append((cur_x, cur_y))
        cur_x, cur_y = [], []

    for sub in _split_line_sub_segments(line, other, eps):
        if sub is None:
            flush()
            continue
        p0x, p0y, p1x, p1y, cov = sub
        if cov != keep_covered:
            flush()
            continue
        if cur_x and abs(cur_x[-1] - p0x) <= eps \
                and abs(cur_y[-1] - p0y) <= eps:
            cur_x.append(p1x)
            cur_y.append(p1y)
        else:
            flush()
            cur_x, cur_y = [p0x, p1x], [p0y, p1y]
    flush()
    return _pack_lines(out_parts)


def _node_line_at_points(line, pts, eps):
    """Split a lineish operand at the given node points — GEOS/OverlayNG
    parity: line output breaks at every computed intersection node, so
    union/difference/symmetric_difference of crossing lines return the
    noded pieces, not the concatenated inputs (r6 VERDICT #4). A node
    strictly inside a segment splits it there; a node coincident with
    an interior VERTEX breaks the chain at that vertex; nodes at part
    endpoints split nothing. Chains between nodes keep their interior
    vertices."""
    if not len(pts[1]):
        return line
    npx, npy = np.asarray(pts[1], float), np.asarray(pts[2], float)
    e2 = eps * eps
    out_parts = []
    xs, ys, rings = line[1], line[2], line[3]
    off = 0
    for rl in rings:
        lx, ly = xs[off:off + rl], ys[off:off + rl]
        off += rl
        if rl < 2:
            continue
        cur_x, cur_y = [float(lx[0])], [float(ly[0])]
        for i in range(rl - 1):
            ax_, ay_ = float(lx[i]), float(ly[i])
            bx_, by_ = float(lx[i + 1]), float(ly[i + 1])
            dx, dy = bx_ - ax_, by_ - ay_
            seg2 = dx * dx + dy * dy
            if seg2 <= 0:
                continue
            if i > 0 and len(cur_x) >= 2:
                # interior vertex coincident with a node → chain break
                if (((npx - ax_) ** 2 + (npy - ay_) ** 2) <= e2).any():
                    out_parts.append((cur_x, cur_y))
                    cur_x, cur_y = [ax_], [ay_]
            t = ((npx - ax_) * dx + (npy - ay_) * dy) / seg2
            qx = ax_ + t * dx - npx
            qy = ay_ + t * dy - npy
            on = (t > 0) & (t < 1) & (qx * qx + qy * qy <= e2)
            for tv in sorted(t[on]):
                mx_, my_ = ax_ + tv * dx, ay_ + tv * dy
                if (mx_ - cur_x[-1]) ** 2 + (my_ - cur_y[-1]) ** 2 <= e2:
                    continue
                cur_x.append(mx_)
                cur_y.append(my_)
                out_parts.append((cur_x, cur_y))
                cur_x, cur_y = [mx_], [my_]
            cur_x.append(bx_)
            cur_y.append(by_)
        if len(cur_x) >= 2:
            out_parts.append((cur_x, cur_y))
    return _pack_lines(out_parts)


def _part_endpoints(g):
    """First/last coordinates of every part of a lineish tuple."""
    xs, ys, rings = g[1], g[2], g[3]
    ex, ey = [], []
    off = 0
    for rl in rings:
        if rl:
            ex += [float(xs[off]), float(xs[off + rl - 1])]
            ey += [float(ys[off]), float(ys[off + rl - 1])]
        off += rl
    return np.asarray(ex, float), np.asarray(ey, float)


def _off_overlap_points(g1, g2, eps):
    """Crossing/touch points of g1×g2 that do NOT lie on their 1-D
    coincident stretches — the node set for renoding the non-overlap
    pieces of a line/line union, difference, or symmetric difference."""
    pts = _line_line_points(g1, g2, eps)
    if not len(pts[1]):
        return pts
    overlap = _line_select_coverage(g1, g2, True, eps)
    if len(overlap[1]):
        on = _near_segments(pts[1], pts[2], *_line_segments(overlap), eps)
        pts = _pack_points(pts[1][~on], pts[2][~on])
    return pts


def _line_line_intersection(g1, g2, eps):
    """Intersection of two lineish operands: collinear 1-D overlap parts
    (MultiLineString) OR crossing/touch points (MultiPoint). A result
    that would mix both kinds is a GeometryCollection and raises
    (documented limit)."""
    overlap = _line_select_coverage(g1, g2, True, eps)
    pts = _line_line_points(g1, g2, eps)
    has_overlap = len(overlap[1]) > 0
    # drop crossing points that lie on the overlap parts
    if has_overlap and len(pts[1]):
        on = _near_segments(pts[1], pts[2], *_line_segments(overlap), eps)
        pts = _pack_points(pts[1][~on], pts[2][~on])
    if has_overlap and len(pts[1]):
        # overlap segments AND isolated crossing points: a
        # GeometryCollection (gt=7, round 6 — GEOS shape)
        return gc_pack([pts, overlap])
    return overlap if has_overlap else pts


def _line_line_points(g1, g2, eps):
    """Pairwise crossing/touch points of two lineish operands. Chunked
    over g1's segment axis (bounded blocks) — see _PAIR_BUDGET."""
    a1x, a1y, b1x, b1y = _line_segments(g1)
    a2x, a2y, b2x, b2y = _line_segments(g2)
    if a1x.size == 0 or a2x.size == 0:
        return _empty_of(0)
    d2x = (b2x - a2x)[None, :]
    d2y = (b2y - a2y)[None, :]
    quant = max(eps, 1e-300)
    seen, px, py = set(), [], []
    step = max(1, _PAIR_BUDGET // max(a2x.size, 1))
    for s0 in range(0, a1x.size, step):
        s1 = min(s0 + step, a1x.size)
        d1x = (b1x[s0:s1] - a1x[s0:s1])[:, None]
        d1y = (b1y[s0:s1] - a1y[s0:s1])[:, None]
        wx = a2x[None, :] - a1x[s0:s1][:, None]
        wy = a2y[None, :] - a1y[s0:s1][:, None]
        denom = d1x * d2y - d1y * d2x
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (wx * d2y - wy * d2x) / denom
            u = (wx * d1y - wy * d1x) / denom
        hit = (denom != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
        if not hit.any():
            continue
        ii, jj = np.nonzero(hit)
        hx = a1x[s0:s1][ii] + t[ii, jj] * (b1x[s0:s1] - a1x[s0:s1])[ii]
        hy = a1y[s0:s1][ii] + t[ii, jj] * (b1y[s0:s1] - a1y[s0:s1])[ii]
        for x, y in zip(hx, hy):
            k = (round(x / quant), round(y / quant))
            if k not in seen:
                seen.add(k)
                px.append(x)
                py.append(y)
    if not px:
        return _empty_of(0)
    return _pack_points(px, py)


def _clip_line_by_polygon(line, poly, keep_inside, eps_rel=1e-9):
    """Parts of a lineish operand inside (or outside) a polygonal one.
    Each line segment splits at its intersections with the polygon
    boundary (plus boundary vertices lying on it — the collinear
    entry/exit case), sub-segments classify by a boundary-inclusive
    midpoint PIP, and kept runs stitch back into polylines.

    keep_inside=True additionally collects ISOLATED boundary-touch
    points (split params on the polygon with no kept run through them):
    a line grazing the boundary from outside contributes a Point to the
    intersection (GEOS shape) — mixed point+line results return a
    GeometryCollection (round 6)."""
    from . import algos
    span = _geom_span(line, poly)
    eps = eps_rel * span
    pax, pay, pbx, pby = _line_segments(poly)
    xs, ys, rings = line[1], line[2], line[3]
    out_parts = []
    touch_xy = []
    cur_x, cur_y = [], []

    def flush():
        nonlocal cur_x, cur_y
        if len(cur_x) >= 2:
            out_parts.append((cur_x, cur_y))
        cur_x, cur_y = [], []

    off = 0
    for rl in rings:
        flush()
        lx = xs[off:off + rl]
        ly = ys[off:off + rl]
        off += rl
        for i in range(rl - 1):
            sax, say = lx[i], ly[i]
            dx, dy = lx[i + 1] - sax, ly[i + 1] - say
            seglen = math.hypot(dx, dy)
            if seglen <= 0:
                continue
            ts = [0.0, 1.0]
            if pax.size:
                ex, ey = pbx - pax, pby - pay
                denom = dx * ey - dy * ex
                wx, wy = pax - sax, pay - say
                with np.errstate(divide="ignore", invalid="ignore"):
                    t = np.where(denom != 0,
                                 (wx * ey - wy * ex) / denom, np.nan)
                    u = np.where(denom != 0,
                                 (wx * dy - wy * dx) / denom, np.nan)
                m = (~np.isnan(t)) & (t > 0) & (t < 1) & (u >= 0) & (u <= 1)
                ts += t[m].tolist()
                # polygon vertices on the open segment: split there too
                rx, ry = pax - sax, pay - say
                tv = (rx * dx + ry * dy) / (seglen * seglen)
                qx, qy = rx - tv * dx, ry - tv * dy
                on = (tv > 0) & (tv < 1) & (qx * qx + qy * qy <= eps * eps)
                ts += tv[on].tolist()
            ts = sorted(set(ts))
            kept_iv = []
            for t0, t1 in zip(ts[:-1], ts[1:]):
                if (t1 - t0) * seglen <= eps:
                    continue
                tm = (t0 + t1) / 2
                inside = algos.point_in_polygon(
                    sax + tm * dx, say + tm * dy,
                    poly[1], poly[2], poly[3], poly[4])
                if bool(inside) != keep_inside:
                    flush()
                    continue
                kept_iv.append((t0, t1))
                p0x, p0y = sax + t0 * dx, say + t0 * dy
                p1x, p1y = sax + t1 * dx, say + t1 * dy
                if cur_x and abs(cur_x[-1] - p0x) <= eps \
                        and abs(cur_y[-1] - p0y) <= eps:
                    cur_x.append(p1x)
                    cur_y.append(p1y)
                else:
                    flush()
                    cur_x, cur_y = [p0x, p1x], [p0y, p1y]
            if keep_inside:
                # isolated boundary touches: split params with no kept
                # run through them that still lie on/in the polygon
                for t in ts:
                    if any(k0 - eps <= t <= k1 + eps for k0, k1 in kept_iv):
                        continue
                    px_, py_ = sax + t * dx, say + t * dy
                    if algos.point_in_polygon(px_, py_, poly[1], poly[2],
                                              poly[3], poly[4]):
                        touch_xy.append((px_, py_))
    flush()
    lines = _pack_lines(out_parts)
    if not keep_inside or not touch_xy:
        return lines
    # dedupe touch points (multi-part junctions, repeated params)
    quant = max(eps, 1e-300)
    seen, px, py = set(), [], []
    for x, y in touch_xy:
        k = (round(x / quant), round(y / quant))
        if k not in seen:
            seen.add(k)
            px.append(x)
            py.append(y)
    px, py = np.asarray(px), np.asarray(py)
    if len(lines[1]):
        # drop candidates sitting on a kept run (e.g. the junction
        # where one line segment's inside run ends and the next
        # segment continues outside)
        on = _near_segments(px, py, *_line_segments(lines), eps)
        px, py = px[~on], py[~on]
    if not len(px):
        return lines
    pts = _pack_points(px, py)
    if not len(lines[1]):
        return pts
    return gc_pack([pts, lines])


def _concat_lines(g1, g2):
    xs = np.concatenate([g1[1], g2[1]])
    ys = np.concatenate([g1[2], g2[2]])
    rings = np.concatenate([g1[3], g2[3]]).astype(np.int32)
    return (MULTILINESTRING, xs, ys, rings,
            np.ones(rings.size, np.int32))


def _mixed_boolean(g1, g2, op, eps_rel):
    d1, d2 = _dim(g1), _dim(g2)
    eps = eps_rel * _geom_span(g1, g2)
    if op == "intersection":
        if d1 == 0 or d2 == 0:
            if d1 == 0 and d2 == 0:
                return _point_set_op(g1, g2, "intersection")
            pts, other = (g1, g2) if d1 == 0 else (g2, g1)
            cov = _covered_points(pts[1], pts[2], other, eps)
            return _pack_points(pts[1][cov], pts[2][cov])
        if d1 == 1 and d2 == 1:
            return _line_line_intersection(g1, g2, eps)
        line, poly = (g1, g2) if d1 == 1 else (g2, g1)
        return _clip_line_by_polygon(line, poly, True, eps_rel)
    if op == "difference":
        if d1 > d2:
            return g1  # lower-dim subtrahend removes zero measure
        if d1 == 0:
            if d2 == 0:
                return _point_set_op(g1, g2, "difference")
            cov = _covered_points(g1[1], g1[2], g2, eps)
            return _pack_points(g1[1][~cov], g1[2][~cov])
        if d2 == 2:
            return _clip_line_by_polygon(g1, g2, False, eps_rel)
        # crossings remove zero 1-D measure but NODE the result
        # (GEOS/OverlayNG parity, r7); coincident portions are removed
        pts = _off_overlap_points(g1, g2, eps)
        if _collinear_overlap(g1, g2, eps):
            return _node_line_at_points(
                _line_select_coverage(g1, g2, False, eps), pts, eps)
        return _node_line_at_points(g1, pts, eps)
    # union / symmetric_difference
    if d1 == 0 and d2 == 0:
        return _point_set_op(g1, g2, op)
    if d1 == 1 and d2 == 1:
        # both branches NODE every piece at the off-overlap crossing/
        # touch points (GEOS/OverlayNG parity since r7 — crossing lines
        # return the split sub-chains, matching GEOS part structure,
        # not just its point set)
        pts = _off_overlap_points(g1, g2, eps)
        if _collinear_overlap(g1, g2, eps):
            # union: g1 + (g2 − g1); symdiff: (g1 − g2) + (g2 − g1) —
            # both reduce to the coverage-select difference, so the
            # overlap needs no dedicated kernel
            left = g1 if op == "union" \
                else _line_select_coverage(g1, g2, False, eps)
            right = _line_select_coverage(g2, g1, False, eps)
            lpts = pts
            if op == "union":
                # the kept subject also nodes at the overlap-stretch
                # endpoints (degree-3 nodes in the GEOS arrangement)
                ex, ey = _part_endpoints(
                    _line_select_coverage(g1, g2, True, eps))
                if ex.size:
                    lpts = _pack_points(
                        np.concatenate([np.asarray(pts[1], float), ex]),
                        np.concatenate([np.asarray(pts[2], float), ey]))
            left = _node_line_at_points(left, lpts, eps)
            right = _node_line_at_points(right, pts, eps)
            if not len(left[1]):
                return right
            if not len(right[1]):
                return left
            return _concat_lines(left, right)
        return _concat_lines(_node_line_at_points(g1, pts, eps),
                             _node_line_at_points(g2, pts, eps))
    # mixed dimension (0/1, 0/2, 1/2): the higher-dim operand absorbs
    # the covered portion of the lower-dim one; the remainder joins it
    # in a GeometryCollection (gt=7, round 6 — GEOS shape)
    lo, hi = (g1, g2) if d1 < d2 else (g2, g1)
    if _dim(lo) == 0:
        cov = _covered_points(lo[1], lo[2], hi, eps)
        rest = _pack_points(lo[1][~cov], lo[2][~cov])
    else:
        rest = _clip_line_by_polygon(lo, hi, False, eps_rel)
    if not len(rest[1]):
        return hi
    return gc_pack([rest, hi])


def union_polygons(geoms, eps_rel=1e-9):
    """Dissolve a list of (gt, xs, ys, rings, parts) polygon tuples into
    one (Multi)Polygon, merging overlaps (GeoPandas ``unary_union``;
    reference roadmap geoseries.rst:104-111). Same contract as the
    round-3 ``algos.union_polygons`` but grid-pruned + vectorized."""
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
    return _merge(polys, [], "dissolve", eps_rel)


def difference_many(subject, clips, eps_rel=1e-9):
    """``subject − union(clips)`` in ONE arrangement pass (no
    intermediate clip dissolve). Public entry point for callers like
    the negative-buffer erosion path; operands must be polygonal
    tuples; clips may be empty (returns subject)."""
    if subject[0] not in (POLYGON, MULTIPOLYGON) or not len(subject[1]):
        raise ValueError("difference_many requires a non-empty polygonal "
                         f"subject; got type id {subject[0]}")
    clips = [c for c in clips
             if c is not None and c[0] != MISSING and len(c[1])]
    for c in clips:
        if c[0] not in (POLYGON, MULTIPOLYGON):
            raise ValueError("difference_many clips must be polygonal; "
                             f"got type id {c[0]}")
    if not clips:
        return subject
    out = _merge([subject], clips, "difference", eps_rel)
    return _EMPTY if out is None else out


def boolean_pair(g1, g2, op, eps_rel=1e-9):
    """Row-aligned boolean op on two geometry tuples. Fully general for
    polygonal operands (holed subjects, holed clips, multipolygons,
    concave rings); mixed point/line/polygon operands follow GEOS
    dimension rules (_mixed_boolean), including collinear line/line
    overlaps — the remaining documented limits are results that would
    be GeometryCollections (mixed-dimension union/symdiff; line∩line
    with both overlap parts and isolated crossing points).
    Empty-operand identities are applied
    without running any kernel; disjoint bboxes short-circuit
    difference/union/symdiff."""
    if op not in _KEEP:
        raise ValueError(f"unknown boolean op {op!r}")
    d1, d2 = _dim(g1), _dim(g2)
    e1, e2 = len(g1[1]) == 0, len(g2[1]) == 0
    if e1 or e2:
        if op == "intersection":
            return _empty_of(min(d1, d2))
        if op == "difference":
            return _empty_of(d1) if e1 else g1
        if e1 and e2:
            return _empty_of(max(d1, d2))
        return g2 if e1 else g1
    if d1 != 2 or d2 != 2:
        return _mixed_boolean(g1, g2, op, eps_rel)
    # disjoint-bbox fast path
    if (g1[1].max() < g2[1].min() or g2[1].max() < g1[1].min()
            or g1[2].max() < g2[2].min() or g2[2].max() < g1[2].min()):
        if op == "intersection":
            return _EMPTY
        if op == "difference":
            return g1
        return _concat_as_multi(g1, g2)
    out = _merge([g1], [g2], op, eps_rel)
    return _EMPTY if out is None else out


def _concat_as_multi(g1, g2):
    """Disjoint union: concatenate parts into one MultiPolygon."""
    xs = np.concatenate([g1[1], g2[1]])
    ys = np.concatenate([g1[2], g2[2]])
    rings = np.concatenate([g1[3], g2[3]]).astype(np.int32)
    parts = np.concatenate([g1[4], g2[4]]).astype(np.int32)
    return (MULTIPOLYGON, xs, ys, rings, parts)


def _axis_rect_mask(rg: RaggedGeometry):
    """Boolean mask of rows that are single-ring axis-aligned rectangles
    (closed 5-vertex ring, every edge axis-parallel, positive extent) —
    whole-batch vectorized."""
    n = len(rg)
    counts = np.diff(rg.coord_offsets)
    cand = (rg.gt == POLYGON) & (np.diff(rg.ring_offsets) == 1) \
        & (counts == 5)
    out = np.zeros(n, dtype=bool)
    idx = np.nonzero(cand)[0]
    if idx.size == 0:
        return out
    starts = rg.coord_offsets[idx]
    offs = starts[:, None] + np.arange(5)[None, :]
    x5 = rg.xs[offs]
    y5 = rg.ys[offs]
    closed = (x5[:, 0] == x5[:, 4]) & (y5[:, 0] == y5[:, 4])
    dx = np.diff(x5, axis=1)
    dy = np.diff(y5, axis=1)
    axis_par = np.all((dx == 0) | (dy == 0), axis=1)
    pos = (x5.max(axis=1) > x5.min(axis=1)) & (y5.max(axis=1) > y5.min(axis=1))
    # rectangle = closed + axis-parallel edges + both extents positive
    # (axis-parallel closed 4-gon with positive extents IS a rectangle)
    out[idx] = closed & axis_par & pos
    return out


def row_boolean(r1: RaggedGeometry, r2: RaggedGeometry, op):
    """Vector shape for the pandas UDFs: per-row boolean_pair, with a
    whole-batch vectorized fast path for the dominant pipeline case —
    ``intersection`` of two axis-aligned rectangles (tile clipping,
    bbox overlays): the result rect is pure interval arithmetic, no
    arrangement engine. Degenerate overlaps (touching edges/corners)
    fall back to the exact kernel so GEOS line/point-contact semantics
    are preserved."""
    n = len(r1)
    fast_ok = np.zeros(n, dtype=bool)
    fx0 = fy0 = fx1 = fy1 = None
    if op == "intersection" and n:
        rect = _axis_rect_mask(r1) & _axis_rect_mask(r2)
        if rect.any():
            def _ext(rg, idx):
                starts = rg.coord_offsets[idx]
                offs = starts[:, None] + np.arange(5)[None, :]
                return (rg.xs[offs].min(axis=1), rg.ys[offs].min(axis=1),
                        rg.xs[offs].max(axis=1), rg.ys[offs].max(axis=1))
            idx = np.nonzero(rect)[0]
            ax0, ay0, ax1, ay1 = _ext(r1, idx)
            bx0, by0, bx1, by1 = _ext(r2, idx)
            ix0, iy0 = np.maximum(ax0, bx0), np.maximum(ay0, by0)
            ix1, iy1 = np.minimum(ax1, bx1), np.minimum(ay1, by1)
            strict = (ix1 > ix0) & (iy1 > iy0)
            disjoint = (ix1 < ix0) | (iy1 < iy0)
            keep = strict | disjoint
            fast_ok[idx[keep]] = True
            fx0 = np.full(n, np.nan); fy0 = np.full(n, np.nan)
            fx1 = np.full(n, np.nan); fy1 = np.full(n, np.nan)
            fx0[idx] = ix0; fy0[idx] = iy0
            fx1[idx] = ix1; fy1[idx] = iy1
    gts, oxs, oys, orings, oparts = [], [], [], [], []
    for i in range(n):
        if fast_ok[i]:
            if fx1[i] < fx0[i] or fy1[i] < fy0[i]:    # disjoint -> empty
                gts.append(int(POLYGON)); oxs.append([]); oys.append([])
                orings.append([]); oparts.append([])
            else:
                gts.append(int(POLYGON))
                oxs.append([fx0[i], fx1[i], fx1[i], fx0[i], fx0[i]])
                oys.append([fy0[i], fy0[i], fy1[i], fy1[i], fy0[i]])
                orings.append([5]); oparts.append([1])
            continue
        g1 = r1.geom(i)
        g2 = r2.geom(i)
        if g1[0] == MISSING or g2[0] == MISSING:
            gts.append(None); oxs.append(None); oys.append(None)
            orings.append(None); oparts.append(None)
            continue
        g, xs, ys, rings, parts = boolean_pair(g1, g2, op)
        gts.append(int(g))
        oxs.append(np.asarray(xs, dtype=float).tolist())
        oys.append(np.asarray(ys, dtype=float).tolist())
        orings.append(np.asarray(rings).tolist())
        oparts.append(np.asarray(parts).tolist())
    return RaggedGeometry.from_pylists(gts, oxs, oys, orings, oparts)
