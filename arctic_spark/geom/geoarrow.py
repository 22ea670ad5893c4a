"""GeoArrow struct-encoding interop (r10): nested pyarrow arrays ↔ the
engine's GEOM struct rows.

The reference encodes a single-type GeoSeries into GeoArrow nested
arrays — Point as struct{x,y}, LineString as list<struct>, Polygon as
list<list<struct>> (py-geopolars/python/geopolars/internals/
geoseries.py:86-107) — and raises NotImplementedError on the Multi*
nestings (geoseries.py:109-138) while falling back to WKB for
mixed-type input (geoseries.py:71-73). This module implements the full
set both directions (SURVEY §1.2 "we can support these day one"):
Point / LineString / Polygon / MultiPoint / MultiLineString /
MultiPolygon, plus the interleaved fixed_size_list<double, 2> Point
variant on the read side.

Driver-side by design: an Arrow table is already driver-resident
(the same stance as geodataframe.from_arrow); data at scale travels
as WKB geoparquet.
"""

from __future__ import annotations

from . import ragged as R

#: geometry-type id → GeoArrow extension-name suffix and nesting depth
#: (list levels above the coordinate struct).
_KIND_BY_NAME = {
    "point": R.POINT, "linestring": R.LINESTRING, "polygon": R.POLYGON,
    "multipoint": R.MULTIPOINT, "multilinestring": R.MULTILINESTRING,
    "multipolygon": R.MULTIPOLYGON,
}
_NAME_BY_KIND = {v: k for k, v in _KIND_BY_NAME.items()}
_DEPTH_DEFAULT = {0: R.POINT, 1: R.LINESTRING, 2: R.POLYGON,
                  3: R.MULTIPOLYGON}


def _nesting_depth(t):
    """list levels above the coordinate struct / fixed-size list."""
    import pyarrow as pa
    depth = 0
    while pa.types.is_list(t) or pa.types.is_large_list(t):
        t = t.value_type
        depth += 1
    if pa.types.is_struct(t):
        return depth
    if pa.types.is_fixed_size_list(t) and t.list_size == 2:
        return depth
    return None


def infer_geom_kind(arrow_type, geom_type=None):
    """Geometry-type id for a GeoArrow-encoded arrow type. Extension
    names ('geoarrow.linestring') win; an explicit ``geom_type`` (id or
    name) disambiguates the shared physical layouts (LineString vs
    MultiPoint, Polygon vs MultiLineString); otherwise the nesting
    depth picks the reference's defaults (point / linestring / polygon
    / multipolygon)."""
    import pyarrow as pa
    if geom_type is not None:
        if isinstance(geom_type, str):
            key = geom_type.lower().replace("geoarrow.", "")
            if key not in _KIND_BY_NAME:
                raise ValueError(f"unknown geometry type {geom_type!r}")
            return _KIND_BY_NAME[key]
        return int(geom_type)
    if isinstance(arrow_type, pa.ExtensionType):
        name = arrow_type.extension_name
        key = name.split(".")[-1].lower()
        if key in _KIND_BY_NAME:
            return _KIND_BY_NAME[key]
        arrow_type = arrow_type.storage_type
    depth = _nesting_depth(arrow_type)
    if depth is None or depth not in _DEPTH_DEFAULT:
        raise ValueError(
            f"not a GeoArrow-encoded type: {arrow_type!r} (expected "
            "struct{x,y} under 0-3 list levels)")
    return _DEPTH_DEFAULT[depth]


def _xy_of(v):
    """Coordinate cell → (x, y): struct dicts from to_pylist, or the
    2-element lists a fixed_size_list yields."""
    if isinstance(v, dict):
        return float(v["x"]), float(v["y"])
    return float(v[0]), float(v[1])


def _closed(ring):
    """GeoArrow rings are closed per spec (shapely's to_ragged_array
    emits GEOS closed rings); tolerate unclosed input by closing it."""
    if ring and ring[0] != ring[-1]:
        return ring + [ring[0]]
    return ring


def decode_geoarrow(arr, geom_type=None):
    """pyarrow (Chunked)Array in GeoArrow encoding → list of GEOM-struct
    row tuples (gt, xs, ys, rings, parts), None for null rows."""
    # Array and ChunkedArray share .type/.to_pylist()
    atype = arr.type
    vals = arr.to_pylist()
    kind = infer_geom_kind(atype, geom_type)
    out = []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        if kind == R.POINT:
            x, y = _xy_of(v)
            out.append((R.POINT, [x], [y], [1], [1]))
        elif kind == R.LINESTRING:
            pts = [_xy_of(p) for p in v]
            out.append((R.LINESTRING, [p[0] for p in pts],
                        [p[1] for p in pts], [len(pts)], [1]))
        elif kind == R.MULTIPOINT:
            pts = [_xy_of(p) for p in v]
            n = len(pts)
            out.append((R.MULTIPOINT, [p[0] for p in pts],
                        [p[1] for p in pts], [1] * n, [1] * n))
        elif kind == R.POLYGON:
            xs, ys, rings = [], [], []
            for ring in v:
                pts = _closed([_xy_of(p) for p in ring])
                xs += [p[0] for p in pts]
                ys += [p[1] for p in pts]
                rings.append(len(pts))
            out.append((R.POLYGON, xs, ys, rings, [len(rings)]))
        elif kind == R.MULTILINESTRING:
            xs, ys, rings = [], [], []
            for line in v:
                pts = [_xy_of(p) for p in line]
                xs += [p[0] for p in pts]
                ys += [p[1] for p in pts]
                rings.append(len(pts))
            out.append((R.MULTILINESTRING, xs, ys, rings,
                        [1] * len(rings)))
        elif kind == R.MULTIPOLYGON:
            xs, ys, rings, parts = [], [], [], []
            for poly in v:
                nr = 0
                for ring in poly:
                    pts = _closed([_xy_of(p) for p in ring])
                    xs += [p[0] for p in pts]
                    ys += [p[1] for p in pts]
                    rings.append(len(pts))
                    nr += 1
                parts.append(nr)
            out.append((R.MULTIPOLYGON, xs, ys, rings, parts))
        else:
            raise ValueError(f"unsupported GeoArrow kind {kind}")
    return out


def _coord_struct(xs, ys):
    import pyarrow as pa
    return pa.StructArray.from_arrays(
        [pa.array(xs, pa.float64()), pa.array(ys, pa.float64())],
        ["x", "y"])


def encode_geoarrow(rows, geom_type=None):
    """GEOM-struct row tuples/Rows (gt, xs, ys, rings, parts) → a
    GeoArrow-encoded pyarrow array. All non-null rows must share one
    geometry type (the caller handles the mixed-type WKB fallback, as
    the reference does, geoseries.py:71-73). Returns (array, kind)."""
    import pyarrow as pa
    geoms = [None if r is None else
             (r["gt"], list(r["xs"]), list(r["ys"]),
              list(r["rings"]), list(r["parts"]))
             if not isinstance(r, tuple) else r
             for r in rows]
    kinds = {g[0] for g in geoms if g is not None}
    if geom_type is not None:
        kind = (infer_geom_kind(None, geom_type)
                if isinstance(geom_type, str) else int(geom_type))
    elif len(kinds) == 1:
        kind = kinds.pop()
    elif not kinds:
        kind = R.POINT
    else:
        raise ValueError(
            f"mixed geometry types {sorted(kinds)}: GeoArrow encodes one "
            "type per array — use WKB for mixed columns")
    if kind not in _NAME_BY_KIND:
        raise ValueError(f"GeoArrow cannot encode geometry type {kind} "
                         "(GeometryCollection/LinearRing) — use WKB")

    # flatten every geometry into coordinate + offset streams
    xs, ys = [], []
    lvl1, lvl2, lvl3 = [0], [0], [0]   # offsets, innermost first
    mask = []
    for g in geoms:
        if g is None:
            mask.append(True)
            # null rows repeat the previous offset at the TOP level only
            if kind == R.POINT:
                xs.append(0.0)
                ys.append(0.0)
            elif kind in (R.LINESTRING, R.MULTIPOINT):
                lvl1.append(lvl1[-1])
            elif kind in (R.POLYGON, R.MULTILINESTRING):
                lvl2.append(lvl2[-1])
            else:
                lvl3.append(lvl3[-1])
            continue
        mask.append(False)
        _gt, gxs, gys, rings, parts = g
        xs += [float(x) for x in gxs]
        ys += [float(y) for y in gys]
        if kind in (R.LINESTRING, R.MULTIPOINT):
            lvl1.append(len(xs))
        elif kind in (R.POLYGON, R.MULTILINESTRING):
            for n in rings:
                lvl1.append(lvl1[-1] + int(n))
            lvl2.append(len(lvl1) - 1)
        elif kind == R.MULTIPOLYGON:
            for n in rings:
                lvl1.append(lvl1[-1] + int(n))
            ri = lvl2[-1] if lvl2 else 0
            for nr in parts:
                ri += int(nr)
                lvl2.append(ri)
            lvl3.append(len(lvl2) - 1)
    coords = _coord_struct(xs, ys)
    mask_arr = pa.array(mask, pa.bool_()) if any(mask) else None

    def lst(offsets, values, m=None):
        return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                        values, mask=m)

    if kind == R.POINT:
        if mask_arr is not None:
            coords = _coord_struct(
                [None if m else x for m, x in zip(mask, xs)],
                [None if m else y for m, y in zip(mask, ys)])
            coords = pa.StructArray.from_arrays(
                [coords.field(0), coords.field(1)], ["x", "y"],
                mask=mask_arr)
        return coords, kind
    if kind in (R.LINESTRING, R.MULTIPOINT):
        return lst(lvl1, coords, mask_arr), kind
    if kind in (R.POLYGON, R.MULTILINESTRING):
        inner = lst(lvl1, coords)
        return lst(lvl2, inner, mask_arr), kind
    inner = lst(lvl1, coords)
    mid = lst(lvl2, inner)
    return lst(lvl3, mid, mask_arr), kind


def extension_name(kind) -> str:
    """GeoArrow extension name for a geometry-type id."""
    return f"geoarrow.{_NAME_BY_KIND[kind]}"
