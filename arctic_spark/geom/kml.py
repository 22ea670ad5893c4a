"""KML codec — stdlib xml.etree, no GDAL.

Implements the PUBLIC OGC KML 2.2 geometry subset (the same surface
GDAL's KML driver exposes for vector reads, reference
`py-geopolars/python/geopolars/io/file.py:15-119` reads it only through
GDAL): Placemark name/description, ExtendedData (untyped ``Data`` pairs
and ``SchemaData/SimpleData``), and Point / LineString / LinearRing /
Polygon (outer + inner boundaries) / MultiGeometry. Coordinates are the
KML ``lon,lat[,alt]`` whitespace-separated form; altitude is dropped
(2-D engine, same as ``from_wkb(force_2d=True)``). KML is always
EPSG:4326 by specification.

Namespace handling: tags are matched by local name, so KML 2.0/2.1/2.2
and Google-extension documents all parse.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .geojson import parse_mapping, mapping_one
from .ragged import MISSING


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _coords(text):
    """KML coordinates text → list of (lon, lat) pairs."""
    out = []
    for tok in (text or "").split():
        parts = tok.split(",")
        if len(parts) >= 2:
            out.append((float(parts[0]), float(parts[1])))
    return out


def _geom_mapping(el):
    """A KML geometry element → GeoJSON-style mapping (or None)."""
    t = _local(el.tag)
    if t == "Point":
        for c in el:
            if _local(c.tag) == "coordinates":
                pts = _coords(c.text)
                if pts:
                    return {"type": "Point", "coordinates": list(pts[0])}
        return None
    if t in ("LineString", "LinearRing"):
        for c in el:
            if _local(c.tag) == "coordinates":
                pts = [list(p) for p in _coords(c.text)]
                if t == "LinearRing" and pts and pts[0] != pts[-1]:
                    pts.append(list(pts[0]))
                return {"type": "LineString", "coordinates": pts} \
                    if pts else None
        return None
    if t == "Polygon":
        rings = []
        for b in el:
            bt = _local(b.tag)
            if bt in ("outerBoundaryIs", "innerBoundaryIs"):
                for r in b.iter():
                    if _local(r.tag) == "coordinates":
                        pts = [list(p) for p in _coords(r.text)]
                        if pts and pts[0] != pts[-1]:
                            pts.append(list(pts[0]))
                        if pts:
                            if bt == "outerBoundaryIs":
                                rings.insert(0, pts)
                            else:
                                rings.append(pts)
        return {"type": "Polygon", "coordinates": rings} if rings else None
    if t == "MultiGeometry":
        subs = [m for m in (_geom_mapping(c) for c in el) if m]
        if not subs:
            return None
        if len(subs) == 1:
            return subs[0]
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


_GEOM_TAGS = {"Point", "LineString", "LinearRing", "Polygon",
              "MultiGeometry"}


def parse_kml(text: str):
    """KML document → list of feature dicts:
    ``{"name", "description", "data": {k: v}, "geom": tuple|None}``
    (``geom`` is the engine's (gt, xs, ys, rings, parts) tuple)."""
    root = ET.fromstring(text)
    feats = []
    for pm in root.iter():
        if _local(pm.tag) != "Placemark":
            continue
        name = desc = None
        data = {}
        geom = None
        for c in pm:
            t = _local(c.tag)
            if t == "name":
                name = (c.text or "").strip() or None
            elif t == "description":
                desc = (c.text or "").strip() or None
            elif t == "ExtendedData":
                for d in c.iter():
                    dt = _local(d.tag)
                    if dt == "Data":
                        k = d.get("name")
                        v = None
                        for vv in d:
                            if _local(vv.tag) == "value":
                                v = (vv.text or "").strip()
                        if k:
                            data[k] = v
                    elif dt == "SimpleData":
                        k = d.get("name")
                        if k:
                            data[k] = (d.text or "").strip()
            elif t in _GEOM_TAGS:
                m = _geom_mapping(c)
                if m is not None:
                    geom = parse_mapping(m)
        feats.append({"name": name, "description": desc,
                      "data": data, "geom": geom})
    return feats


def dumps_kml(features, document_name: str = "layer") -> str:
    """Feature dicts (same shape parse_kml emits, geometry as the
    engine tuple) → a KML 2.2 document string."""
    def esc(s):
        return (str(s).replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    def coord_str(pts):
        return " ".join(f"{x:.10g},{y:.10g}" for x, y in pts)

    def geom_xml(m):
        t = m["type"]
        c = m.get("coordinates")
        if t == "Point":
            return f"<Point><coordinates>{c[0]:.10g},{c[1]:.10g}" \
                   "</coordinates></Point>"
        if t == "LineString":
            return ("<LineString><coordinates>"
                    f"{coord_str(c)}</coordinates></LineString>")
        if t == "Polygon":
            out = ["<Polygon>"]
            for i, ring in enumerate(c):
                b = "outerBoundaryIs" if i == 0 else "innerBoundaryIs"
                out.append(f"<{b}><LinearRing><coordinates>"
                           f"{coord_str(ring)}"
                           f"</coordinates></LinearRing></{b}>")
            out.append("</Polygon>")
            return "".join(out)
        if t in ("MultiPoint", "MultiLineString", "MultiPolygon"):
            sub = t[5:]
            return ("<MultiGeometry>"
                    + "".join(geom_xml({"type": sub, "coordinates": cc})
                              for cc in c)
                    + "</MultiGeometry>")
        if t == "GeometryCollection":
            return ("<MultiGeometry>"
                    + "".join(geom_xml(g) for g in m["geometries"])
                    + "</MultiGeometry>")
        raise ValueError(f"unsupported geometry type {t!r}")

    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<kml xmlns="http://www.opengis.net/kml/2.2">',
             f"<Document><name>{esc(document_name)}</name>"]
    for f in features:
        parts.append("<Placemark>")
        if f.get("name") is not None:
            parts.append(f"<name>{esc(f['name'])}</name>")
        if f.get("description") is not None:
            parts.append(
                f"<description>{esc(f['description'])}</description>")
        if f.get("data"):
            parts.append("<ExtendedData>")
            for k, v in f["data"].items():
                parts.append(f'<Data name="{esc(k)}"><value>'
                             f"{esc(v) if v is not None else ''}"
                             "</value></Data>")
            parts.append("</ExtendedData>")
        g = f.get("geom")
        if g is not None and g[0] != MISSING and len(g[1]):
            parts.append(geom_xml(mapping_one(*g)))
        parts.append("</Placemark>")
    parts.append("</Document></kml>")
    return "".join(parts)
