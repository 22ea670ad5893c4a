"""GeoJSON (RFC 7946) codec over ragged geometry tuples — the
`to_json` / `__geo_interface__` half of the reference roadmap
(py-geopolars/docs/source/reference/geoseries.rst:126,157), numpy-only
like the WKB/WKT codecs."""

from __future__ import annotations

import json

import numpy as np

from .ragged import (GEOMETRYCOLLECTION, LINESTRING, MULTILINESTRING,
                     MULTIPOINT, MULTIPOLYGON, POINT, POLYGON, gc_iter,
                     gc_pack)

_TYPE_NAME = {POINT: "Point", LINESTRING: "LineString",
              POLYGON: "Polygon", MULTIPOINT: "MultiPoint",
              MULTILINESTRING: "MultiLineString",
              MULTIPOLYGON: "MultiPolygon"}
_NAME_TYPE = {v: k for k, v in _TYPE_NAME.items()}


def mapping_one(gt, xs, ys, rings, parts):
    """One geometry tuple → GeoJSON geometry mapping (dict)."""
    gt = int(gt)
    if gt == GEOMETRYCOLLECTION:
        g = (gt, np.asarray(xs, float), np.asarray(ys, float),
             np.asarray(rings, np.int32), np.asarray(parts, np.int32))
        return {"type": "GeometryCollection",
                "geometries": [mapping_one(*c) for c in gc_iter(g)]}
    name = _TYPE_NAME[gt]
    pts = [[float(x), float(y)] for x, y in zip(xs, ys)]
    if gt == POINT:
        coords = pts[0] if pts else []
    elif gt in (MULTIPOINT, LINESTRING):
        coords = pts
    elif gt == MULTILINESTRING:
        coords, off = [], 0
        for rl in rings:
            coords.append(pts[off:off + rl])
            off += rl
    elif gt == POLYGON:
        coords, off = [], 0
        for rl in rings:
            coords.append(pts[off:off + rl])
            off += rl
    else:  # MULTIPOLYGON
        coords, roff, coff = [], 0, 0
        for nr in parts:
            rs = []
            for j in range(nr):
                rl = rings[roff + j]
                rs.append(pts[coff:coff + rl])
                coff += rl
            coords.append(rs)
            roff += nr
    return {"type": name, "coordinates": coords}


def dumps_one(gt, xs, ys, rings, parts):
    return json.dumps(mapping_one(gt, xs, ys, rings, parts))


def parse_mapping(obj):
    """GeoJSON geometry mapping → (gt, xs, ys, rings, parts) tuple."""
    name = obj["type"]
    if name == "GeometryCollection":
        return gc_pack([parse_mapping(m) for m in obj["geometries"]])
    gt = _NAME_TYPE[name]
    c = obj["coordinates"]
    xs, ys, rings, parts = [], [], [], []
    if gt == POINT:
        if c:
            xs, ys, rings, parts = [c[0]], [c[1]], [1], [1]
    elif gt == MULTIPOINT:
        for p in c:
            xs.append(p[0])
            ys.append(p[1])
        rings = [1] * len(c)
        parts = [1] * len(c)
    elif gt == LINESTRING:
        for p in c:
            xs.append(p[0])
            ys.append(p[1])
        if c:
            rings, parts = [len(c)], [1]
    elif gt == MULTILINESTRING:
        for line in c:
            for p in line:
                xs.append(p[0])
                ys.append(p[1])
            rings.append(len(line))
        parts = [1] * len(c)
    elif gt == POLYGON:
        for ring in c:
            for p in ring:
                xs.append(p[0])
                ys.append(p[1])
            rings.append(len(ring))
        if c:
            parts = [len(c)]
    else:  # MULTIPOLYGON
        for poly in c:
            for ring in poly:
                for p in ring:
                    xs.append(p[0])
                    ys.append(p[1])
                rings.append(len(ring))
            parts.append(len(poly))
    return (gt, np.asarray(xs, float), np.asarray(ys, float),
            np.asarray(rings, np.int32), np.asarray(parts, np.int32))


def loads_one(text):
    return parse_mapping(json.loads(text))
