"""GPX codec — stdlib xml.etree, no GDAL.

Implements the PUBLIC GPX 1.0/1.1 schema's three vector layers (the
same layers GDAL's GPX driver exposes; the reference reads them only
through GDAL): ``waypoints`` (wpt → Point with name/ele/time),
``routes`` (rte → LineString of rtept), ``tracks`` (trk →
MultiLineString of trkseg/trkpt). GPX is WGS84 lon/lat by
specification; elevation rides as an attribute column, never a third
coordinate (2-D engine).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

from .ragged import LINESTRING, MULTILINESTRING, POINT


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _child_text(el, name):
    for c in el:
        if _local(c.tag) == name:
            return (c.text or "").strip() or None
    return None


def _pt(el):
    return float(el.get("lon")), float(el.get("lat"))


def parse_gpx(text: str, layer: str = "tracks"):
    """GPX document → list of feature dicts with the engine geometry
    tuple under ``geom``. ``layer``: 'waypoints' | 'routes' |
    'tracks'."""
    root = ET.fromstring(text)
    feats = []
    if layer == "waypoints":
        for el in root.iter():
            if _local(el.tag) != "wpt":
                continue
            x, y = _pt(el)
            ele = _child_text(el, "ele")
            feats.append({
                "name": _child_text(el, "name"),
                "ele": float(ele) if ele is not None else None,
                "time": _child_text(el, "time"),
                "geom": (POINT, np.asarray([x], float),
                         np.asarray([y], float),
                         np.asarray([1], np.int32),
                         np.asarray([1], np.int32))})
        return feats
    if layer == "routes":
        for el in root.iter():
            if _local(el.tag) != "rte":
                continue
            pts = [_pt(p) for p in el if _local(p.tag) == "rtept"]
            xs = np.asarray([p[0] for p in pts], float)
            ys = np.asarray([p[1] for p in pts], float)
            feats.append({
                "name": _child_text(el, "name"),
                "n_points": len(pts),
                "geom": (LINESTRING, xs, ys,
                         np.asarray([len(pts)] if pts else [], np.int32),
                         np.asarray([1] if pts else [], np.int32))})
        return feats
    if layer == "tracks":
        for el in root.iter():
            if _local(el.tag) != "trk":
                continue
            segs = []
            for seg in el:
                if _local(seg.tag) != "trkseg":
                    continue
                pts = [_pt(p) for p in seg if _local(p.tag) == "trkpt"]
                if pts:
                    segs.append(pts)
            xs = np.asarray([p[0] for s in segs for p in s], float)
            ys = np.asarray([p[1] for s in segs for p in s], float)
            feats.append({
                "name": _child_text(el, "name"),
                "n_segments": len(segs),
                "n_points": int(len(xs)),
                "geom": (MULTILINESTRING, xs, ys,
                         np.asarray([len(s) for s in segs], np.int32),
                         np.asarray([1] * len(segs), np.int32))})
        return feats
    raise ValueError(f"unknown GPX layer {layer!r} "
                     "(use 'waypoints', 'routes' or 'tracks')")
