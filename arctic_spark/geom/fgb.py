"""GDAL-free FlatGeobuf support (pure stdlib + numpy).

FlatGeobuf (https://flatgeobuf.org, spec at
github.com/flatgeobuf/flatgeobuf/blob/master/format.md) is a
cloud-optimized binary container for vector features:

    MB  8 magic bytes  'f' 'g' 'b' 0x03 'f' 'g' 'b' <patch>
    H   size-prefixed FlatBuffer: the Header table
    I   optional packed Hilbert R-tree index
    DATA size-prefixed FlatBuffer per feature

The payload tables are FlatBuffers (https://flatbuffers.dev — the
wire format is public: root uoffset, vtable-indirected tables,
length-prefixed vectors/strings). This module carries its own
minimal FlatBuffers reader/builder for exactly the Header /
Column / Crs / Feature / Geometry schemas of header.fbs /
feature.fbs, so no codegen and no third-party package is needed.
The reference engine reaches .fgb only through GDAL/pyogrio
(reference io/file.py:15-119); here the format is decoded directly
so the §2.5 ``read_file`` long tail is exercisable in this
container.

Geometries convert to standard ISO WKB and ride the package's own
WKB codec (mirroring ``geom/gpkg.py``); writing converts the ragged
geometry cells straight to FlatGeobuf's flat xy/ends encoding.
Writes emit ``index_node_size=0`` (no spatial index — legal per
spec); reads skip over an index when one is present (packed-rtree
size is derivable from ``features_count`` and the node size).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"fgb\x03fgb"            # + 1 patch byte (0x00 or 0x01)

# GeometryType enum (same ids as WKB)
GT_UNKNOWN = 0
GT_POINT = 1
GT_LINESTRING = 2
GT_POLYGON = 3
GT_MULTIPOINT = 4
GT_MULTILINESTRING = 5
GT_MULTIPOLYGON = 6
GT_GEOMETRYCOLLECTION = 7

# ColumnType enum
CT_BYTE, CT_UBYTE, CT_BOOL, CT_SHORT, CT_USHORT, CT_INT, CT_UINT, \
    CT_LONG, CT_ULONG, CT_FLOAT, CT_DOUBLE, CT_STRING, CT_JSON, \
    CT_DATETIME, CT_BINARY = range(15)

_CT_FIXED = {CT_BYTE: ("<b", 1), CT_UBYTE: ("<B", 1), CT_BOOL: ("<B", 1),
             CT_SHORT: ("<h", 2), CT_USHORT: ("<H", 2), CT_INT: ("<i", 4),
             CT_UINT: ("<I", 4), CT_LONG: ("<q", 8), CT_ULONG: ("<Q", 8),
             CT_FLOAT: ("<f", 4), CT_DOUBLE: ("<d", 8)}
_CT_VAR = {CT_STRING, CT_JSON, CT_DATETIME, CT_BINARY}


class FgbError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Minimal FlatBuffers reader
# ---------------------------------------------------------------------------

def _u16(b, p):
    return struct.unpack_from("<H", b, p)[0]


def _u32(b, p):
    return struct.unpack_from("<I", b, p)[0]


def _i32(b, p):
    return struct.unpack_from("<i", b, p)[0]


class Table:
    """One FlatBuffers table: vtable-indirected field access.

    Wire format (public): a table starts with an int32 soffset; the
    vtable sits at ``table_pos - soffset`` and holds uint16
    vtable_size, uint16 table_size, then one uint16 per field slot
    (offset of the field from table start; 0 = absent/default)."""

    __slots__ = ("b", "pos", "vt", "vtsize")

    def __init__(self, b, pos):
        self.b = b
        self.pos = pos
        self.vt = pos - _i32(b, pos)
        self.vtsize = _u16(b, self.vt)

    def _field(self, slot):
        off = 4 + 2 * slot
        if off + 2 > self.vtsize:
            return 0
        rel = _u16(self.b, self.vt + off)
        return self.pos + rel if rel else 0

    def scalar(self, slot, fmt, default=0):
        p = self._field(slot)
        return struct.unpack_from(fmt, self.b, p)[0] if p else default

    def _indirect(self, slot):
        p = self._field(slot)
        if not p:
            return 0
        return p + _u32(self.b, p)

    def string(self, slot):
        q = self._indirect(slot)
        if not q:
            return None
        n = _u32(self.b, q)
        return bytes(self.b[q + 4:q + 4 + n]).decode("utf-8")

    def vector(self, slot, dtype):
        """Scalar vector as a numpy array (little-endian dtype str)."""
        q = self._indirect(slot)
        if not q:
            return None
        n = _u32(self.b, q)
        return np.frombuffer(self.b, dtype=dtype, count=n, offset=q + 4)

    def bytes_vector(self, slot):
        q = self._indirect(slot)
        if not q:
            return None
        n = _u32(self.b, q)
        return bytes(self.b[q + 4:q + 4 + n])

    def table(self, slot):
        q = self._indirect(slot)
        return Table(self.b, q) if q else None

    def table_vector(self, slot):
        q = self._indirect(slot)
        if not q:
            return []
        n = _u32(self.b, q)
        out = []
        for i in range(n):
            ep = q + 4 + 4 * i
            out.append(Table(self.b, ep + _u32(self.b, ep)))
        return out


def root_table(buf):
    """Root table of a (non-size-prefixed) FlatBuffer."""
    return Table(buf, _u32(buf, 0))


# ---------------------------------------------------------------------------
# Minimal FlatBuffers builder
# ---------------------------------------------------------------------------

class Builder:
    """Back-to-front FlatBuffers builder, offsets measured from the
    buffer END (the standard construction order). Only what the FGB
    schemas need: scalar fields, strings, scalar vectors, tables and
    vectors of tables."""

    def __init__(self):
        self.b = bytearray()

    # -- primitives --------------------------------------------------
    def _prep(self, size, additional):
        while (len(self.b) + additional) % size != 0:
            self.b[:0] = b"\x00"

    def _push(self, data, align):
        self._prep(align, len(data))
        self.b[:0] = data
        return len(self.b)

    def _push_uoffset(self, target):
        """Prepend a uoffset32 pointing at absolute offset ``target``
        (distance from buffer end)."""
        self._prep(4, 0)
        val = (len(self.b) + 4) - target
        self.b[:0] = struct.pack("<I", val)
        return len(self.b)

    # -- objects ------------------------------------------------------
    def string(self, s):
        data = s.encode("utf-8") + b"\x00"
        # align so the u32 length lands 4-aligned AND stays contiguous
        # with the bytes (padding goes after the payload in file order)
        self._prep(4, 4 + len(data))
        self.b[:0] = data
        self.b[:0] = struct.pack("<I", len(data) - 1)
        return len(self.b)

    def scalar_vector(self, values, dtype, elem_size, align):
        data = np.asarray(values, dtype=dtype).tobytes()
        n = len(data) // elem_size
        self._prep(align, len(data))
        self._prep(4, len(data) + 4)
        self.b[:0] = data
        self.b[:0] = struct.pack("<I", n)
        return len(self.b)

    def byte_vector(self, data):
        data = bytes(data)
        self._prep(4, 4 + len(data))
        self.b[:0] = data
        self.b[:0] = struct.pack("<I", len(data))
        return len(self.b)

    def offset_vector(self, offsets):
        for t in reversed(offsets):
            self._push_uoffset(t)
        self._prep(4, 4)
        self.b[:0] = struct.pack("<I", len(offsets))
        return len(self.b)

    def table(self, fields):
        """fields: list of (slot, kind, value) where kind is
        'scalar' → value = (struct_fmt, python_value, align)
        'ref'    → value = absolute offset of a built object.
        Fields are laid out in the given order (first in list =
        first in the file after the soffset)."""
        len0 = len(self.b)
        placed = {}
        for slot, kind, value in reversed(fields):
            if kind == "scalar":
                fmt, v, align = value
                placed[slot] = self._push(struct.pack(fmt, v), align)
            else:
                placed[slot] = self._push_uoffset(value)
        # soffset placeholder
        self._prep(4, 0)
        self.b[:0] = b"\x00\x00\x00\x00"
        table_off = len(self.b)
        nslots = (max(placed) + 1) if placed else 0
        # inline table size: soffset + fields + interleaved padding
        tsize = table_off - len0
        vt = [struct.pack("<H", 4 + 2 * nslots),
              struct.pack("<H", tsize)]
        for s in range(nslots):
            rel = (table_off - placed[s]) if s in placed else 0
            vt.append(struct.pack("<H", rel))
        self._push(b"".join(vt), 2)
        vt_off = len(self.b)
        # patch the soffset: vtable is "above" (earlier in file)
        pos = len(self.b) - table_off
        struct.pack_into("<i", self.b, pos, vt_off - table_off)
        return table_off

    def finish_size_prefixed(self, root):
        self._prep(8, 4 + 4)
        self._push_uoffset(root)
        self.b[:0] = struct.pack("<I", len(self.b))
        return bytes(self.b)


# ---------------------------------------------------------------------------
# Packed Hilbert R-tree (the optional index block)
# ---------------------------------------------------------------------------

def _level_sizes(num_items, node_size):
    """Node count per level, leaf level first, per the public
    packedrtree layout."""
    sizes = [num_items]
    n = num_items
    while n != 1:
        n = (n + node_size - 1) // node_size
        sizes.append(n)
    return sizes


def packed_rtree_size(num_items, node_size):
    """Byte size of the optional index: 40-byte nodes (4 float64
    bounds + uint64 offset), level widths per the public packedrtree
    algorithm."""
    if num_items == 0 or node_size == 0:
        return 0
    node_size = min(max(int(node_size), 2), 65535)
    return sum(_level_sizes(num_items, node_size)) * 40


def hilbert_u32(x, y):
    """Order-16 Hilbert curve index of uint16 grid coordinates, the
    branch-free bit-trick formulation used by the FlatGeobuf
    implementations (public-domain algorithm from the
    rawrunprotected/hilbert_curves gist). Vectorized over numpy
    uint32 arrays."""
    x = np.asarray(x, dtype=np.uint32)
    y = np.asarray(y, dtype=np.uint32)
    M = np.uint32(0xFFFF)
    a = x ^ y
    b = M ^ a
    c = M ^ (x | y)
    d = x & (y ^ M)
    A = a | (b >> 1)
    B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d
    a, b, c, d = A, B, C, D
    A = (a & (a >> 2)) ^ (b & (b >> 2))
    B = (a & (b >> 2)) ^ (b & ((a ^ b) >> 2))
    C = c ^ ((a & (c >> 2)) ^ (b & (d >> 2)))
    D = d ^ ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2)))
    a, b, c, d = A, B, C, D
    A = (a & (a >> 4)) ^ (b & (b >> 4))
    B = (a & (b >> 4)) ^ (b & ((a ^ b) >> 4))
    C = c ^ ((a & (c >> 4)) ^ (b & (d >> 4)))
    D = d ^ ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4)))
    a, b, c, d = A, B, C, D
    C = c ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    D = d ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))
    a = C ^ (C >> 1)
    b = D ^ (D >> 1)
    i0 = x ^ y
    i1 = b | (M ^ (i0 | a))

    def spread(v):                    # 16 even bits -> 32
        v = (v | (v << 8)) & np.uint32(0x00FF00FF)
        v = (v | (v << 4)) & np.uint32(0x0F0F0F0F)
        v = (v | (v << 2)) & np.uint32(0x33333333)
        v = (v | (v << 1)) & np.uint32(0x55555555)
        return v
    return (spread(i1) << 1) | spread(i0)


def hilbert_order(bboxes, extent=None):
    """Sort order of feature bboxes along the order-16 Hilbert curve
    over the total extent — the layout FlatGeobuf requires when an
    index is present."""
    bb = np.asarray(bboxes, dtype=np.float64).reshape(-1, 4)
    finite = np.isfinite(bb).all(axis=1)
    if extent is None:
        if finite.any():
            extent = (bb[finite, 0].min(), bb[finite, 1].min(),
                      bb[finite, 2].max(), bb[finite, 3].max())
        else:
            extent = (0.0, 0.0, 1.0, 1.0)
    minx, miny, maxx, maxy = extent
    w = (maxx - minx) or 1.0
    h = (maxy - miny) or 1.0
    # centers only for finite rows — empty/null geometries carry
    # (inf, -inf) bboxes and inf + -inf raises RuntimeWarning (ADVICE r8)
    cx = (bb[finite, 0] + bb[finite, 2]) / 2.0
    cy = (bb[finite, 1] + bb[finite, 3]) / 2.0
    hx = np.zeros(len(bb), dtype=np.uint32)
    hy = np.zeros(len(bb), dtype=np.uint32)
    hx[finite] = np.clip(((cx - minx) / w * 0xFFFF), 0,
                         0xFFFF).astype(np.uint32)
    hy[finite] = np.clip(((cy - miny) / h * 0xFFFF), 0,
                         0xFFFF).astype(np.uint32)
    return np.argsort(hilbert_u32(hx, hy), kind="stable"), extent


_NODE_DT = np.dtype([("minx", "<f8"), ("miny", "<f8"),
                     ("maxx", "<f8"), ("maxy", "<f8"),
                     ("off", "<u8")])


def build_packed_rtree(bboxes, feat_offsets, node_size=16):
    """Packed Hilbert R-tree bytes over features ALREADY in Hilbert
    order. Layout per the public spec: root level first, leaves last;
    leaf ``off`` = feature byte offset in the DATA section, internal
    ``off`` = node index of the first child."""
    node_size = min(max(int(node_size), 2), 65535)
    n = len(bboxes)
    sizes = _level_sizes(n, node_size)          # leaf level first
    starts = []                                 # start index per level,
    total = sum(sizes)                          # root-first layout
    acc = 0
    for s in reversed(sizes):                   # root, ..., leaves
        starts.append(acc)
        acc += s
    starts = starts[::-1]                       # leaf level first again
    nodes = np.zeros(total, dtype=_NODE_DT)
    leaf0 = starts[0]
    bb = np.asarray(bboxes, dtype=np.float64).reshape(-1, 4)
    nodes["minx"][leaf0:] = bb[:, 0]
    nodes["miny"][leaf0:] = bb[:, 1]
    nodes["maxx"][leaf0:] = bb[:, 2]
    nodes["maxy"][leaf0:] = bb[:, 3]
    nodes["off"][leaf0:] = np.asarray(feat_offsets, dtype=np.uint64)
    for lvl in range(len(sizes) - 1):
        cstart, csize = starts[lvl], sizes[lvl]
        pstart = starts[lvl + 1]
        for j in range(sizes[lvl + 1]):
            lo = cstart + j * node_size
            hi = min(lo + node_size, cstart + csize)
            p = pstart + j
            nodes["minx"][p] = nodes["minx"][lo:hi].min()
            nodes["miny"][p] = nodes["miny"][lo:hi].min()
            nodes["maxx"][p] = nodes["maxx"][lo:hi].max()
            nodes["maxy"][p] = nodes["maxy"][lo:hi].max()
            nodes["off"][p] = lo
    return nodes.tobytes()


def search_packed_rtree(buf, base, num_items, node_size, bbox,
                        with_items=False):
    """Feature byte offsets (DATA-relative, ascending) whose leaf
    bboxes intersect ``bbox``, via the index at byte ``base``.
    ``with_items=True`` returns (offset, item_index) pairs instead —
    the item index is the feature's position in the (Hilbert-ordered)
    feature stream, i.e. its FlatGeobuf FID (r12)."""
    node_size = min(max(int(node_size), 2), 65535)
    sizes = _level_sizes(num_items, node_size)
    total = sum(sizes)
    nodes = np.frombuffer(buf, dtype=_NODE_DT, count=total, offset=base)
    leaf0 = total - num_items
    qminx, qminy, qmaxx, qmaxy = bbox
    out = []
    stack = [0]
    while stack:
        i = stack.pop()
        nd = nodes[i]
        if (nd["minx"] > qmaxx or nd["maxx"] < qminx
                or nd["miny"] > qmaxy or nd["maxy"] < qminy):
            continue
        if i >= leaf0:
            out.append((int(nd["off"]), i - leaf0))
        else:
            lo = int(nd["off"])
            # children of node i span [off, off + node_size) capped to
            # the child level's extent
            lvl_end = leaf0 if lo >= leaf0 else total
            for lvl_start, sz in _iter_levels(sizes):
                if lvl_start <= lo < lvl_start + sz:
                    lvl_end = lvl_start + sz
                    break
            stack.extend(range(lo, min(lo + node_size, lvl_end)))
    out.sort()
    return out if with_items else [o for o, _ in out]


def _iter_levels(sizes):
    """(start_index, size) per level in root-first storage order."""
    acc = 0
    for s in reversed(sizes):
        yield acc, s
        acc += s


def cell_bbox(cell):
    """(minx, miny, maxx, maxy) of a ragged geometry cell; empty/null
    → an empty box that never intersects and is ignored by extents."""
    if cell is None or len(cell[1]) == 0:
        return (np.inf, np.inf, -np.inf, -np.inf)
    xs = np.asarray(cell[1], dtype=np.float64)
    ys = np.asarray(cell[2], dtype=np.float64)
    return (float(xs.min()), float(ys.min()),
            float(xs.max()), float(ys.max()))


# ---------------------------------------------------------------------------
# Geometry: FGB flat encoding → WKB
# ---------------------------------------------------------------------------

def _wkb_coords(xy, lo, hi):
    """Vertex slice [lo, hi) of the interleaved xy array → WKB bytes."""
    return np.ascontiguousarray(xy[2 * lo:2 * hi]).astype(
        "<f8", copy=False).tobytes()


def _geom_to_wkb(tab, header_gt):
    """One FGB Geometry table → ISO WKB bytes (little-endian 2D)."""
    gt = tab.scalar(6, "<B", 0) or header_gt
    xy = tab.vector(1, "<f8")
    if xy is None:
        xy = np.empty(0, dtype="<f8")
    nv = len(xy) // 2
    ends = tab.vector(0, "<u4")
    if gt == GT_POINT:
        if nv == 0:
            xy = np.array([np.nan, np.nan], dtype="<f8")
        return b"\x01\x01\x00\x00\x00" + _wkb_coords(xy, 0, 1)
    if gt == GT_LINESTRING:
        return (b"\x01\x02\x00\x00\x00" + struct.pack("<I", nv)
                + _wkb_coords(xy, 0, nv))
    if gt == GT_POLYGON:
        e = ends if ends is not None and len(ends) else [nv]
        out = [b"\x01\x03\x00\x00\x00", struct.pack("<I", len(e))]
        lo = 0
        for hi in e:
            hi = int(hi)
            out.append(struct.pack("<I", hi - lo))
            out.append(_wkb_coords(xy, lo, hi))
            lo = hi
        return b"".join(out)
    if gt == GT_MULTIPOINT:
        out = [b"\x01\x04\x00\x00\x00", struct.pack("<I", nv)]
        for i in range(nv):
            out.append(b"\x01\x01\x00\x00\x00" + _wkb_coords(xy, i, i + 1))
        return b"".join(out)
    if gt == GT_MULTILINESTRING:
        e = ends if ends is not None and len(ends) else [nv]
        out = [b"\x01\x05\x00\x00\x00", struct.pack("<I", len(e))]
        lo = 0
        for hi in e:
            hi = int(hi)
            out.append(b"\x01\x02\x00\x00\x00" + struct.pack("<I", hi - lo)
                       + _wkb_coords(xy, lo, hi))
            lo = hi
        return b"".join(out)
    if gt in (GT_MULTIPOLYGON, GT_GEOMETRYCOLLECTION):
        parts = tab.table_vector(7)
        sub_default = GT_POLYGON if gt == GT_MULTIPOLYGON else GT_UNKNOWN
        out = [b"\x01" + struct.pack("<I", gt),
               struct.pack("<I", len(parts))]
        for p in parts:
            out.append(_geom_to_wkb(p, sub_default))
        return b"".join(out)
    raise FgbError(f"unsupported FlatGeobuf geometry type {gt}")


# ---------------------------------------------------------------------------
# Geometry: ragged cell → FGB Geometry table
# ---------------------------------------------------------------------------

# ragged (pygeos) ids → FGB/WKB ids
_RAGGED_TO_FGB = {0: GT_POINT, 1: GT_LINESTRING, 3: GT_POLYGON,
                  4: GT_MULTIPOINT, 5: GT_MULTILINESTRING,
                  6: GT_MULTIPOLYGON, 7: GT_GEOMETRYCOLLECTION}


def _interleave(xs, ys):
    out = np.empty(2 * len(xs), dtype="<f8")
    out[0::2] = xs
    out[1::2] = ys
    return out


def _build_simple(bld, fgb_gt, xs, ys, rings, with_type):
    """Point/LineString/Polygon/MultiPoint/MultiLineString geometry
    table. ``ends`` are cumulative vertex counts (FGB convention)."""
    fields = []
    if len(xs):
        xy_off = bld.scalar_vector(_interleave(xs, ys), "<f8", 8, 8)
        fields.append((1, "ref", xy_off))
    if fgb_gt in (GT_POLYGON, GT_MULTILINESTRING) and len(rings) > 1:
        ends = np.cumsum(np.asarray(rings, dtype=np.int64))
        ends_off = bld.scalar_vector(ends, "<u4", 4, 4)
        fields.append((0, "ref", ends_off))
    if with_type:
        fields.append((6, "scalar", ("<B", fgb_gt, 1)))
    return bld.table(fields)


def build_geometry(bld, gt, xs, ys, rings, parts, with_type):
    """One ragged geometry → FGB Geometry table offset within ``bld``."""
    from . import wkb as _wkb
    fgb_gt = _RAGGED_TO_FGB.get(int(gt))
    if fgb_gt is None:
        raise FgbError(f"cannot encode ragged geometry type {gt}")
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if fgb_gt in (GT_POINT, GT_LINESTRING, GT_POLYGON, GT_MULTIPOINT,
                  GT_MULTILINESTRING):
        return _build_simple(bld, fgb_gt, xs, ys, rings, with_type)
    if fgb_gt == GT_MULTIPOLYGON:
        part_offs = []
        roff = coff = 0
        for nr in parts:
            nr = int(nr)
            rs = [int(r) for r in rings[roff:roff + nr]]
            nc = sum(rs)
            part_offs.append(_build_simple(
                bld, GT_POLYGON, xs[coff:coff + nc], ys[coff:coff + nc],
                rs, with_type=True))
            roff += nr
            coff += nc
        vec = bld.offset_vector(part_offs)
        fields = [(7, "ref", vec)]
        if with_type:
            fields.append((6, "scalar", ("<B", fgb_gt, 1)))
        return bld.table(fields)
    # GeometryCollection: typed part entries via the WKB module's
    # gc_iter (same canonical part structure as the WKB codec)
    part_offs = []
    for sgt, sxs, sys_, srings, _ in _wkb.gc_iter(
            (gt, xs, ys, rings, parts)):
        part_offs.append(_build_simple(
            bld, _RAGGED_TO_FGB[int(sgt)], np.asarray(sxs, np.float64),
            np.asarray(sys_, np.float64), srings, with_type=True))
    vec = bld.offset_vector(part_offs)
    fields = [(7, "ref", vec)]
    if with_type:
        fields.append((6, "scalar", ("<B", fgb_gt, 1)))
    return bld.table(fields)


# ---------------------------------------------------------------------------
# Properties codec
# ---------------------------------------------------------------------------

def parse_properties(buf, col_types):
    """Feature ``properties`` byte blob → dict {col_index: value}."""
    out = {}
    if not buf:
        return out
    p = 0
    n = len(buf)
    while p + 2 <= n:
        ci = struct.unpack_from("<H", buf, p)[0]
        p += 2
        if ci >= len(col_types):
            raise FgbError(f"property column index {ci} out of range")
        ct = col_types[ci]
        if ct in _CT_FIXED:
            fmt, size = _CT_FIXED[ct]
            v = struct.unpack_from(fmt, buf, p)[0]
            p += size
            if ct == CT_BOOL:
                v = bool(v)
        elif ct in _CT_VAR:
            ln = struct.unpack_from("<I", buf, p)[0]
            p += 4
            raw = buf[p:p + ln]
            p += ln
            v = bytes(raw) if ct == CT_BINARY else raw.decode("utf-8")
        else:
            raise FgbError(f"unsupported column type {ct}")
        out[ci] = v
    return out


def encode_properties(values, col_types):
    """dict {col_index: value} → properties byte blob (nulls omitted)."""
    out = []
    for ci in sorted(values):
        v = values[ci]
        if v is None:
            continue
        ct = col_types[ci]
        out.append(struct.pack("<H", ci))
        if ct in _CT_FIXED:
            fmt, _ = _CT_FIXED[ct]
            out.append(struct.pack(fmt, int(v) if ct != CT_FLOAT
                                   and ct != CT_DOUBLE else float(v)))
        elif ct in _CT_VAR:
            raw = v if isinstance(v, (bytes, bytearray)) \
                else str(v).encode("utf-8")
            out.append(struct.pack("<I", len(raw)))
            out.append(bytes(raw))
        else:
            raise FgbError(f"unsupported column type {ct}")
    return b"".join(out)


# ---------------------------------------------------------------------------
# File-level read / write
# ---------------------------------------------------------------------------

def _geom_xy_bbox(tab):
    """(minx, miny, maxx, maxy) straight off a Geometry table's flat
    xy vectors (parts recursed); empty geometry → empty box."""
    xy = tab.vector(1, "<f8")
    boxes = []
    if xy is not None and len(xy):
        boxes.append((xy[0::2].min(), xy[1::2].min(),
                      xy[0::2].max(), xy[1::2].max()))
    for p in tab.table_vector(7):
        boxes.append(_geom_xy_bbox(p))
    if not boxes:
        return (np.inf, np.inf, -np.inf, -np.inf)
    return (min(b[0] for b in boxes), min(b[1] for b in boxes),
            max(b[2] for b in boxes), max(b[3] for b in boxes))


def read_fgb_header(data):
    """Header-only FlatGeobuf parse → (meta, node_size, index_base,
    data_base): the same meta dict :func:`read_fgb` returns (name,
    geometry_type, columns, crs, features_count) WITHOUT touching the
    index or feature stream — schema/CRS probes (read_files) pay a
    few hundred bytes instead of a full-file decode (review r12)."""
    data = bytes(data)
    if len(data) < 8 or data[:7] != MAGIC:
        raise FgbError("not a FlatGeobuf file (bad magic)")
    p = 8
    hsize = _u32(data, p)
    p += 4
    hdr = root_table(memoryview(data)[p:p + hsize])
    p += hsize
    name = hdr.string(0)
    header_gt = hdr.scalar(2, "<B", 0)
    cols = [(c.string(0), c.scalar(1, "<B", 0))
            for c in hdr.table_vector(7)]
    fcount = hdr.scalar(8, "<Q", 0)
    node_size = hdr.scalar(9, "<H", 16)
    crs_tab = hdr.table(10)
    crs = None
    if crs_tab is not None:
        org = crs_tab.string(0)
        code = crs_tab.scalar(1, "<i", 0)
        if org or code:
            crs = (org or "EPSG", code)
    index_base = p
    data_base = p + packed_rtree_size(fcount, node_size)
    meta = {"name": name, "geometry_type": header_gt,
            "columns": cols, "crs": crs, "features_count": fcount}
    return meta, node_size, index_base, data_base


def read_fgb(data, bbox=None, want_fids=False):
    """Parse a FlatGeobuf byte string →
    (header_meta, [(wkb_or_None, {col_name: value})...]).

    header_meta: dict with name, geometry_type, columns
    [(name, type_id)], crs (org, code) or None, features_count;
    with ``want_fids=True`` also ``fids`` — the 0-based stream
    position of every returned feature (the format's FID), correct
    under bbox selection on both the indexed and linear paths (r12).

    ``bbox=(minx, miny, maxx, maxy)`` keeps only intersecting
    features — via the packed Hilbert R-tree when the file has one
    (only the matching feature records are even parsed), else by a
    linear scan testing each geometry's flat-coordinate bbox."""
    data = bytes(data)
    meta, node_size, index_base, data_base = read_fgb_header(data)
    fcount = meta["features_count"]
    header_gt = meta["geometry_type"]
    cols = meta["columns"]
    p = data_base
    col_types = [t for _, t in cols]
    col_names = [n for n, _ in cols]

    def parse_feature(fpos, want_bbox):
        fsize = _u32(data, fpos)
        ft = root_table(memoryview(data)[fpos + 4:fpos + 4 + fsize])
        gtab = ft.table(0)
        if want_bbox is not None:
            if gtab is None:
                return None, fpos + 4 + fsize
            gminx, gminy, gmaxx, gmaxy = _geom_xy_bbox(gtab)
            if (gminx > want_bbox[2] or gmaxx < want_bbox[0]
                    or gminy > want_bbox[3] or gmaxy < want_bbox[1]):
                return None, fpos + 4 + fsize
        wkb = _geom_to_wkb(gtab, header_gt) if gtab is not None else None
        fcols = ft.table_vector(2)
        if fcols:
            ctypes = [c.scalar(1, "<B", 0) for c in fcols]
            cnames = [c.string(0) for c in fcols]
        else:
            ctypes, cnames = col_types, col_names
        props = parse_properties(ft.bytes_vector(1), ctypes)
        return ((wkb, {cnames[i]: v for i, v in props.items()}),
                fpos + 4 + fsize)

    feats, fids = [], []
    if bbox is not None and node_size and fcount:
        # index path: only matching records are parsed at all
        for off, item in search_packed_rtree(data, index_base, fcount,
                                             node_size, bbox,
                                             with_items=True):
            # leaf bboxes already guarantee intersection
            feat, _ = parse_feature(data_base + off, None)
            feats.append(feat)
            fids.append(item)
        if want_fids:
            meta["fids"] = fids
        return meta, feats
    n = len(data)
    item = 0
    while p + 4 <= n:
        feat, p = parse_feature(p, bbox)
        if feat is not None:
            feats.append(feat)
            fids.append(item)
        item += 1
    if want_fids:
        meta["fids"] = fids
    return meta, feats


def write_fgb(name, columns, rows, geometry_type=GT_UNKNOWN,
              crs=None, index_node_size=0):
    """Build a FlatGeobuf byte string.

    columns: [(name, col_type_id)]; rows: iterable of
    (ragged_cell_or_None, [values aligned with columns]) where
    ragged_cell = (gt, xs, ys, rings, parts). crs: (org, code) or
    None. ``index_node_size > 0`` writes a REAL packed Hilbert
    R-tree index (features are re-ordered along the Hilbert curve as
    the spec requires; leaf offsets point at the size-prefixed
    feature records) and the header carries the layer envelope;
    ``0`` writes no index (also legal)."""
    rows = list(rows)
    col_types = [t for _, t in columns]
    with_type = geometry_type == GT_UNKNOWN

    def feature_bytes(cell, values):
        fb = Builder()
        fields = []
        props = encode_properties(
            {i: v for i, v in enumerate(values)}, col_types)
        if props:
            fields.append((1, "ref", fb.byte_vector(props)))
        if cell is not None:
            gt, xs, ys, rings, parts = cell
            goff = build_geometry(fb, gt, xs, ys, rings, parts,
                                  with_type)
            fields.insert(0, (0, "ref", goff))
        return fb.finish_size_prefixed(fb.table(fields))

    envelope = None
    index_bytes = b""
    if index_node_size and rows:
        bboxes = np.array([cell_bbox(c) for c, _ in rows])
        order, extent = hilbert_order(bboxes)
        rows = [rows[i] for i in order]
        bboxes = bboxes[order]
        feats = [feature_bytes(c, v) for c, v in rows]
        offs = np.cumsum([0] + [len(f) for f in feats[:-1]])
        index_bytes = build_packed_rtree(bboxes, offs, index_node_size)
        if np.isfinite(extent).all():
            envelope = extent
    else:
        index_node_size = 0
        feats = [feature_bytes(c, v) for c, v in rows]

    out = [MAGIC + b"\x01"]
    bld = Builder()
    col_offs = []
    for cname, ct in columns:
        noff = bld.string(cname)
        col_offs.append(bld.table([(0, "ref", noff),
                                   (1, "scalar", ("<B", ct, 1))]))
    fields = []
    noff = bld.string(name) if name else None
    if noff:
        fields.append((0, "ref", noff))
    if envelope is not None:
        env_off = bld.scalar_vector(list(envelope), "<f8", 8, 8)
        fields.append((1, "ref", env_off))
    fields.append((2, "scalar", ("<B", geometry_type, 1)))
    if col_offs:
        fields.append((7, "ref", bld.offset_vector(col_offs)))
    fields.append((8, "scalar", ("<Q", len(rows), 8)))
    fields.append((9, "scalar", ("<H", index_node_size, 2)))
    if crs is not None:
        org_off = bld.string(crs[0])
        crs_off = bld.table([(0, "ref", org_off),
                             (1, "scalar", ("<i", int(crs[1]), 4))])
        fields.append((10, "ref", crs_off))
    out.append(bld.finish_size_prefixed(bld.table(fields)))
    out.append(index_bytes)
    out.extend(feats)
    return b"".join(out)
