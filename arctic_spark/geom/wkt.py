"""Minimal WKT reader/writer over the ragged representation.

Used for fixtures, tests and ``st_as_text`` / ``st_geom_from_text``.
Supports the same 2D surface as the WKB codec; ``EMPTY`` geometries are
produced with zero coordinates.
"""

from __future__ import annotations

import re

import numpy as np

from .ragged import (GEOMETRYCOLLECTION, LINESTRING, MISSING,
                     MULTILINESTRING, MULTIPOINT, MULTIPOLYGON, POINT,
                     POLYGON, RaggedGeometry, gc_iter, gc_pack)

_NAME_TO_TYPE = {
    "POINT": POINT, "LINESTRING": LINESTRING, "POLYGON": POLYGON,
    "MULTIPOINT": MULTIPOINT, "MULTILINESTRING": MULTILINESTRING,
    "MULTIPOLYGON": MULTIPOLYGON,
    "GEOMETRYCOLLECTION": GEOMETRYCOLLECTION,
}
_TYPE_TO_NAME = {v: k for k, v in _NAME_TO_TYPE.items()}


def _split_top_commas(body):
    """Split on commas at paren depth 0 ('POINT (1 2), LINESTRING (...)')."""
    items, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            items.append(body[start:i])
            start = i + 1
    items.append(body[start:])
    return [s.strip() for s in items if s.strip()]


def _parse_coords(body):
    """'1 2, 3 4' -> ([1,3],[2,4])"""
    xs, ys = [], []
    for pt in body.split(","):
        parts = pt.split()
        if len(parts) < 2:
            raise ValueError(f"bad WKT coordinate: {pt!r}")
        xs.append(float(parts[0]))
        ys.append(float(parts[1]))
    return xs, ys


def _split_groups(body):
    """Split 'a),(b' style top-level paren groups of '(...),(...)'."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(body[start:i])
    return groups


def parse_one(text):
    """WKT string -> (gt, xs, ys, rings, parts) python lists."""
    t = text.strip()
    m = re.match(r"^([A-Za-z]+)\s*(.*)$", t, re.S)
    if not m:
        raise ValueError(f"bad WKT: {text!r}")
    name = m.group(1).upper()
    rest = m.group(2).strip()
    if name not in _NAME_TO_TYPE:
        raise ValueError(f"unsupported WKT type {name}")
    gt = _NAME_TO_TYPE[name]
    if rest.upper() == "EMPTY":
        return gt, [], [], [], []
    if not (rest.startswith("(") and rest.endswith(")")):
        raise ValueError(f"bad WKT body: {text!r}")
    body = rest[1:-1].strip()
    if gt == POINT:
        xs, ys = _parse_coords(body)
        return gt, xs, ys, [1], [1]
    if gt == LINESTRING:
        xs, ys = _parse_coords(body)
        return gt, xs, ys, [len(xs)], [1]
    if gt == POLYGON:
        xs, ys, rings = [], [], []
        for ring in _split_groups(body) or [body]:
            rx, ry = _parse_coords(ring)
            xs += rx
            ys += ry
            rings.append(len(rx))
        return gt, xs, ys, rings, [len(rings)]
    if gt == MULTIPOINT:
        # Accept both 'MULTIPOINT (1 2, 3 4)' and 'MULTIPOINT ((1 2), (3 4))'
        if "(" in body:
            pts = _split_groups(body)
            xs, ys = [], []
            for p in pts:
                px, py = _parse_coords(p)
                xs += px
                ys += py
        else:
            xs, ys = _parse_coords(body)
        n = len(xs)
        return gt, xs, ys, [1] * n, [1] * n
    if gt == MULTILINESTRING:
        xs, ys, rings = [], [], []
        for line in _split_groups(body):
            lx, ly = _parse_coords(line)
            xs += lx
            ys += ly
            rings.append(len(lx))
        return gt, xs, ys, rings, [1] * len(rings)
    if gt == MULTIPOLYGON:
        xs, ys, rings, parts = [], [], [], []
        # body is '((...),(...)),((...))' — split polygons at depth 0
        for poly in _split_groups(body):
            nrings = 0
            for ring in _split_groups(poly):
                rx, ry = _parse_coords(ring)
                xs += rx
                ys += ry
                rings.append(len(rx))
                nrings += 1
            parts.append(nrings)
        return gt, xs, ys, rings, parts
    if gt == GEOMETRYCOLLECTION:
        children = []
        for child in _split_top_commas(body):
            cg, cx, cy, cr, cp = parse_one(child)
            children.append((cg, np.asarray(cx, np.float64),
                             np.asarray(cy, np.float64),
                             np.asarray(cr, np.int32),
                             np.asarray(cp, np.int32)))
        _, xs, ys, rings, parts = gc_pack(children)
        return gt, xs.tolist(), ys.tolist(), rings.tolist(), parts.tolist()
    raise AssertionError


def parse(texts) -> RaggedGeometry:
    gts, xs, ys, rings, parts = [], [], [], [], []
    for t in texts:
        if t is None:
            gts.append(None)
            xs.append(None)
            ys.append(None)
            rings.append(None)
            parts.append(None)
        else:
            g, x, y, r, p = parse_one(t)
            gts.append(g)
            xs.append(x)
            ys.append(y)
            rings.append(r)
            parts.append(p)
    return RaggedGeometry.from_pylists(gts, xs, ys, rings, parts)


def _fmt(v):
    f = float(v)
    return f"{int(f)}" if f.is_integer() else repr(f)


def _fmt_coords(xs, ys):
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in zip(xs, ys))


def format_one(gt, xs, ys, rings, parts):
    name = _TYPE_TO_NAME[int(gt)]
    if len(xs) == 0:
        return f"{name} EMPTY"
    if gt == POINT:
        return f"{name} ({_fmt_coords(xs, ys)})"
    if gt == LINESTRING:
        return f"{name} ({_fmt_coords(xs, ys)})"
    if gt == POLYGON:
        out, off = [], 0
        for rl in rings:
            out.append(f"({_fmt_coords(xs[off:off+rl], ys[off:off+rl])})")
            off += rl
        return f"{name} ({', '.join(out)})"
    if gt == MULTIPOINT:
        return f"{name} ({_fmt_coords(xs, ys)})"
    if gt == MULTILINESTRING:
        out, off = [], 0
        for rl in rings:
            out.append(f"({_fmt_coords(xs[off:off+rl], ys[off:off+rl])})")
            off += rl
        return f"{name} ({', '.join(out)})"
    if gt == MULTIPOLYGON:
        out, roff, coff = [], 0, 0
        for nr in parts:
            rs = rings[roff:roff + nr]
            polys = []
            for rl in rs:
                polys.append(f"({_fmt_coords(xs[coff:coff+rl], ys[coff:coff+rl])})")
                coff += rl
            roff += nr
            out.append(f"({', '.join(polys)})")
        return f"{name} ({', '.join(out)})"
    if gt == GEOMETRYCOLLECTION:
        g = (gt, np.asarray(xs, np.float64), np.asarray(ys, np.float64),
             np.asarray(rings, np.int32), np.asarray(parts, np.int32))
        subs = [format_one(*child) for child in gc_iter(g)]
        return f"{name} ({', '.join(subs)})"
    raise ValueError(f"cannot format type {gt}")


def format(rg: RaggedGeometry):
    out = []
    for i in range(len(rg)):
        if rg.gt[i] == MISSING:
            out.append(None)
        else:
            out.append(format_one(*rg.geom(i)))
    return out
