"""GML codec — stdlib xml.etree, no GDAL.

Implements the PUBLIC OGC GML simple-features geometry subset (the
surface GDAL's GML driver exposes for vector reads; the reference reads
GML only through GDAL, `py-geopolars/python/geopolars/io/file.py:15-119`):

- GML 3 geometries: ``Point/pos``, ``LineString/posList``,
  ``Polygon/exterior+interior/LinearRing``, ``Curve/segments/
  LineStringSegment``, ``MultiPoint/pointMember(s)``,
  ``MultiCurve/curveMember(s)``, ``MultiSurface/surfaceMember(s)``,
  ``MultiGeometry/geometryMember(s)``;
- GML 2 legacy forms: ``coordinates`` ("x,y x,y"),
  ``outerBoundaryIs``/``innerBoundaryIs``;
- ``srsDimension`` 2 or 3 (the third ordinate is dropped — 2-D engine).

Feature model: WFS/GML documents nest Feature → geometry property →
Geometry; the parser locates every geometry element, walks two levels
up through a parent map to the feature element, and exposes the
feature's simple-text children (plus ``gml:id``) as string attributes.
Tags match by local name so any namespace prefix parses.

Axis order: GML 3 with EPSG:4326 is latitude-first by the letter of
the spec while most real-world producers emit lon/lat; the reader
takes ordinates as (x, y) in document order and offers
``swap_axes=True`` for lat-first documents — same pragmatic contract
as GDAL's ``GML_INVERT_AXIS_ORDER_IF_LAT_LONG`` switch.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .geojson import parse_mapping


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


_GEOM_TAGS = {"Point", "LineString", "Polygon", "Curve", "MultiPoint",
              "MultiCurve", "MultiSurface", "MultiGeometry",
              "MultiLineString", "MultiPolygon"}


def _dim_of(el, default=2):
    d = el.get("srsDimension")
    return int(d) if d else default


def _pos_pairs(el, dim):
    """gml:pos / gml:posList / gml:coordinates text → [(x, y), ...]."""
    t = _local(el.tag)
    txt = (el.text or "").strip()
    if not txt:
        return []
    if t == "coordinates":
        cs = el.get("cs", ",")
        ts = el.get("ts", " ")
        out = []
        for tok in txt.replace("\n", ts).split(ts):
            tok = tok.strip()
            if not tok:
                continue
            parts = tok.split(cs)
            if len(parts) >= 2:
                out.append((float(parts[0]), float(parts[1])))
        return out
    vals = [float(v) for v in txt.split()]
    d = _dim_of(el, dim)
    return [(vals[i], vals[i + 1]) for i in range(0, len(vals) - d + 1, d)]


def _ring_pts(ring_el, dim):
    """LinearRing → closed [(x,y), ...]."""
    pts = []
    for c in ring_el:
        t = _local(c.tag)
        if t in ("posList", "coordinates"):
            pts = _pos_pairs(c, dim)
        elif t == "pos":
            pts.append(_pos_pairs(c, dim)[0])
    if pts and pts[0] != pts[-1]:
        pts.append(pts[0])
    return pts


def _geom_mapping(el, dim=2):
    """A GML geometry element → GeoJSON-style mapping (or None)."""
    t = _local(el.tag)
    dim = _dim_of(el, dim)
    if t == "Point":
        for c in el:
            if _local(c.tag) in ("pos", "coordinates"):
                pts = _pos_pairs(c, dim)
                if pts:
                    return {"type": "Point", "coordinates": list(pts[0])}
        return None
    if t == "LineString":
        for c in el:
            if _local(c.tag) in ("posList", "coordinates"):
                pts = [list(p) for p in _pos_pairs(c, dim)]
                return ({"type": "LineString", "coordinates": pts}
                        if pts else None)
        # GML2-style sequence of <pos> children
        pts = [list(_pos_pairs(c, dim)[0]) for c in el
               if _local(c.tag) == "pos"]
        return ({"type": "LineString", "coordinates": pts}
                if pts else None)
    if t == "Curve":                      # segments/LineStringSegment
        pts = []
        for seg in el.iter():
            if _local(seg.tag) == "LineStringSegment":
                for c in seg:
                    if _local(c.tag) in ("posList", "coordinates"):
                        sp = [list(p) for p in _pos_pairs(c, dim)]
                        if pts and sp and pts[-1] == sp[0]:
                            sp = sp[1:]
                        pts.extend(sp)
        return ({"type": "LineString", "coordinates": pts}
                if pts else None)
    if t == "Polygon":
        outer, inners = None, []
        for b in el:
            bt = _local(b.tag)
            if bt in ("exterior", "outerBoundaryIs"):
                for r in b:
                    if _local(r.tag) == "LinearRing":
                        outer = _ring_pts(r, dim)
            elif bt in ("interior", "innerBoundaryIs"):
                for r in b:
                    if _local(r.tag) == "LinearRing":
                        inners.append(_ring_pts(r, dim))
        if not outer:
            return None
        return {"type": "Polygon",
                "coordinates": [[list(p) for p in outer]]
                + [[list(p) for p in ring] for ring in inners]}
    if t in ("MultiPoint", "MultiCurve", "MultiSurface", "MultiGeometry",
             "MultiLineString", "MultiPolygon"):
        subs = []
        for mem in el.iter():
            mt = _local(mem.tag)
            if mt in ("Point", "LineString", "Curve", "Polygon") \
                    and mem is not el:
                m = _geom_mapping(mem, dim)
                if m:
                    subs.append(m)
        if not subs:
            return None
        kinds = {m["type"] for m in subs}
        if kinds == {"Point"}:
            return {"type": "MultiPoint",
                    "coordinates": [m["coordinates"] for m in subs]}
        if kinds == {"LineString"}:
            return {"type": "MultiLineString",
                    "coordinates": [m["coordinates"] for m in subs]}
        if kinds == {"Polygon"}:
            return {"type": "MultiPolygon",
                    "coordinates": [m["coordinates"] for m in subs]}
        return {"type": "GeometryCollection", "geometries": subs}
    return None


def _swap(m):
    if m is None:
        return None
    t = m["type"]
    if t == "GeometryCollection":
        return {"type": t, "geometries": [_swap(g) for g in
                                          m["geometries"]]}

    def rec(c):
        if c and isinstance(c[0], (int, float)):
            return [c[1], c[0]]
        return [rec(v) for v in c]
    return {"type": t, "coordinates": rec(m["coordinates"])}


def parse_gml(text: str, swap_axes: bool = False):
    """GML document → list of feature dicts
    ``{"gml_id", "data": {name: text}, "geom": tuple|None}``."""
    root = ET.fromstring(text)
    parent = {c: p for p in root.iter() for c in p}
    feats = []
    seen = set()
    for el in root.iter():
        if _local(el.tag) not in _GEOM_TAGS:
            continue
        # skip geometries nested inside another geometry (multi members)
        anc = parent.get(el)
        inside = False
        while anc is not None:
            if _local(anc.tag) in _GEOM_TAGS:
                inside = True
                break
            anc = parent.get(anc)
        if inside:
            continue
        prop = parent.get(el)                 # geometry property element
        feat = parent.get(prop) if prop is not None else None
        if feat is None or id(feat) in seen:
            continue
        seen.add(id(feat))
        gml_id = None
        for k, v in feat.attrib.items():
            if _local(k) == "id":
                gml_id = v
        data = {}
        for c in feat:
            if len(c) == 0 and c is not prop:
                txt = (c.text or "").strip()
                if txt:
                    data[_local(c.tag)] = txt
        m = _geom_mapping(el)
        if swap_axes:
            m = _swap(m)
        feats.append({"gml_id": gml_id, "data": data,
                      "geom": parse_mapping(m) if m else None})
    return feats
