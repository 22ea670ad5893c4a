"""Pure-numpy WKB codec: bytes <-> RaggedGeometry.

The reference's working encoding is WKB in a binary Arrow array
(geopolars/geopolars-geo/src/util.rs:11-37 decodes WKB per element via
geozero). This container has no shapely/GEOS, so the engine owns its codec:
decode is a per-geometry header walk with bulk ``np.frombuffer`` coordinate
reads, with a fully-vectorized fast path for all-Point batches (fixed
21-byte records — the dominant case for point datasets).

Supported: 2D Point/LineString/Polygon/MultiPoint/MultiLineString/
MultiPolygon, both byte orders on read, EWKB SRID header skipped. ISO
(1000+) and EWKB Z/M flags are rejected with a clear error by default;
``decode(..., force_2d=True)`` accepts them and DROPS the extra
dimensions (documented lossy ingest path — the engine is 2D).
HOMOGENEOUS GeometryCollections decode to the corresponding Multi*
(lossless re-typing); heterogeneous ones decode to gt=7 with typed part
entries since round 6 (see ragged.py's GC block; nested Multi*/GC
children flatten to single-type parts — point-set identical, structure
canonicalized). Encoding always writes little-endian 2D, matching what
shapely.to_wkb produces by default.
"""

from __future__ import annotations

import struct

import numpy as np

from .ragged import (GC_SHIFT, GEOMETRYCOLLECTION, LINESTRING, MISSING,
                     MULTILINESTRING, MULTIPOINT, MULTIPOLYGON, POINT,
                     POLYGON, RaggedGeometry, gc_iter)

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


class WKBError(ValueError):
    pass


def _read_header(buf, pos, force_2d=False):
    """Returns (base_type, little_endian, pos_after_header, ndims,
    has_z)."""
    bo = buf[pos]
    little = bo == 1
    pos += 1
    t = int.from_bytes(buf[pos:pos + 4], "little" if little else "big")
    pos += 4
    ndims = 2
    has_z = False
    if t & (_EWKB_Z | _EWKB_M):
        if not force_2d:
            raise WKBError("Z/M coordinates not supported (2D engine); "
                           "pass force_2d=True to drop them on read, "
                           "or decode_z/from_wkb(keep_z=True) to keep "
                           "Z")
        has_z = bool(t & _EWKB_Z)
        ndims = 2 + bool(t & _EWKB_Z) + bool(t & _EWKB_M)
        t &= ~(_EWKB_Z | _EWKB_M)
    if t & _EWKB_SRID:
        t &= ~_EWKB_SRID
        pos += 4  # skip srid
    if t >= 1000:
        iso = t // 1000
        if iso in (1, 2, 3):
            if not force_2d:
                raise WKBError("Z/M coordinates not supported (2D "
                               "engine); pass force_2d=True to drop "
                               "them on read, or decode_z/"
                               "from_wkb(keep_z=True) to keep Z")
            has_z = iso in (1, 3)
            ndims = {1: 3, 2: 3, 3: 4}[iso]
            t %= 1000
        else:
            raise WKBError(f"unsupported ISO WKB type {t}")
    return t, little, pos, ndims, has_z


def _read_u32(buf, pos, little):
    return int.from_bytes(buf[pos:pos + 4], "little" if little else "big"), pos + 4


def _read_coords(buf, pos, n, little, xs_out, ys_out, ndims=2,
                 zs_out=None, has_z=False):
    dt = "<f8" if little else ">f8"
    arr = np.frombuffer(buf, dtype=dt, count=ndims * n, offset=pos)
    xs_out.append(np.ascontiguousarray(arr[0::ndims], dtype=np.float64))
    ys_out.append(np.ascontiguousarray(arr[1::ndims], dtype=np.float64))
    if zs_out is not None:
        if has_z:
            zs_out.append(np.ascontiguousarray(arr[2::ndims],
                                               dtype=np.float64))
        else:
            zs_out.append(np.full(n, np.nan))
    return pos + 8 * ndims * n


_CLASS_OF = {POINT: 0, MULTIPOINT: 0, LINESTRING: 1, MULTILINESTRING: 1,
             POLYGON: 2, MULTIPOLYGON: 2}
_MULTI_OF_CLASS = {0: MULTIPOINT, 1: MULTILINESTRING, 2: MULTIPOLYGON}
_SINGLE_OF_CLASS = {0: POINT, 1: LINESTRING, 2: POLYGON}


def _decode_one(buf, pos, xs_out, ys_out, rings_out, parts_out,
                force_2d=False, zs_out=None, zctx=None):
    """Decode one geometry starting at pos. Returns (gt, pos)."""
    t, little, pos, nd, hz = _read_header(buf, pos, force_2d)
    if hz and zctx is not None:
        zctx[0] = True
    if t == 1:  # Point
        pos = _read_coords(buf, pos, 1, little, xs_out, ys_out, nd,
                           zs_out, hz)
        rings_out.append(1)
        parts_out.append(1)
        return POINT, pos
    if t == 2:  # LineString
        n, pos = _read_u32(buf, pos, little)
        pos = _read_coords(buf, pos, n, little, xs_out, ys_out, nd,
                           zs_out, hz)
        rings_out.append(n)
        parts_out.append(1)
        return LINESTRING, pos
    if t == 3:  # Polygon
        nr, pos = _read_u32(buf, pos, little)
        for _ in range(nr):
            n, pos = _read_u32(buf, pos, little)
            pos = _read_coords(buf, pos, n, little, xs_out, ys_out, nd,
                               zs_out, hz)
            rings_out.append(n)
        parts_out.append(nr)
        return POLYGON, pos
    if t in (4, 5, 6):  # Multi*
        n, pos = _read_u32(buf, pos, little)
        for _ in range(n):
            _, pos = _decode_one(buf, pos, xs_out, ys_out, rings_out,
                                 parts_out, force_2d, zs_out, zctx)
        if t == 4:
            return MULTIPOINT, pos
        if t == 5:
            return MULTILINESTRING, pos
        return MULTIPOLYGON, pos
    if t == 7:
        # homogeneous collections re-type losslessly to the Multi*;
        # heterogeneous ones decode to gt=7 with typed part entries
        # (round 6; nested Multi*/GC children flatten to single-type
        # parts — documented canonicalization)
        n, pos = _read_u32(buf, pos, little)
        kinds = set()
        tagged = []            # (sub_class, plain part entries)
        for _ in range(n):
            p0 = len(parts_out)
            ct, pos = _decode_one(buf, pos, xs_out, ys_out, rings_out,
                                  parts_out, force_2d, zs_out, zctx)
            if ct == GEOMETRYCOLLECTION:
                # child GC parts are already typed — keep verbatim
                kinds.add("gc")
                tagged.append((None, parts_out[p0:]))
            else:
                kinds.add(_CLASS_OF[ct])
                tagged.append((_CLASS_OF[ct], parts_out[p0:]))
            del parts_out[p0:]
        if len(kinds) == 1 and "gc" not in kinds:
            for _, entries in tagged:
                parts_out.extend(entries)
            return _MULTI_OF_CLASS[kinds.pop()], pos
        for cls_id, entries in tagged:
            if cls_id is None:
                parts_out.extend(entries)       # already GC-encoded
            else:
                sub = _SINGLE_OF_CLASS[cls_id]
                parts_out.extend(sub * GC_SHIFT + int(e) for e in entries)
        return GEOMETRYCOLLECTION, pos
    raise WKBError(f"unsupported WKB type {t}")


def decode(buffers, force_2d=False) -> RaggedGeometry:
    """Decode an iterable of WKB ``bytes`` (None → MISSING) to ragged
    form. ``force_2d=True`` accepts Z/M input and drops the extra
    dimensions (lossy, documented)."""
    bufs = list(buffers)
    n = len(bufs)
    # Fast path: every non-null buffer is a little-endian 2D point (21 bytes,
    # first 5 bytes = b'\x01\x01\x00\x00\x00').
    nonnull = [b for b in bufs if b is not None]
    if nonnull and all(
            len(b) == 21 and b[0] == 1 and b[1] == 1 and b[2] == 0
            and b[3] == 0 and b[4] == 0 for b in nonnull):
        m = len(nonnull)
        raw = np.frombuffer(b"".join(nonnull), dtype=np.uint8).reshape(m, 21)
        coords = raw[:, 5:].copy().view("<f8").reshape(m, 2)
        gt = np.full(n, MISSING, dtype=np.int8)
        mask = np.array([b is not None for b in bufs])
        gt[mask] = POINT
        cum = np.zeros(n + 1, dtype=np.int64)
        cum[1:] = np.cumsum(mask)
        ones = np.ones(m, dtype=np.int32)
        return RaggedGeometry(gt, coords[:, 0], coords[:, 1], cum,
                              ones, cum, ones, cum)

    gt = np.empty(n, dtype=np.int8)
    co = np.zeros(n + 1, dtype=np.int64)
    ro = np.zeros(n + 1, dtype=np.int64)
    po = np.zeros(n + 1, dtype=np.int64)
    xs_out, ys_out = [], []
    rings_all, parts_all = [], []
    ncoords = nrings = nparts = 0
    for i, b in enumerate(bufs):
        if b is None:
            gt[i] = MISSING
        else:
            rings_out, parts_out = [], []
            t, _ = _decode_one(bytes(b), 0, xs_out, ys_out, rings_out,
                               parts_out, force_2d)
            gt[i] = t
            rings_all.extend(rings_out)
            parts_all.extend(parts_out)
            ncoords += sum(rings_out)
            nrings += len(rings_out)
            nparts += len(parts_out)
        co[i + 1] = ncoords
        ro[i + 1] = nrings
        po[i + 1] = nparts
    xs = np.concatenate(xs_out) if xs_out else np.empty(0)
    ys = np.concatenate(ys_out) if ys_out else np.empty(0)
    return RaggedGeometry(gt, xs, ys, co,
                          np.asarray(rings_all, dtype=np.int32), ro,
                          np.asarray(parts_all, dtype=np.int32), po)


def decode_z(buffers):
    """Z-preserving decode (r12, VERDICT r11 #4): like
    :func:`decode` but ISO/EWKB Z (and M) input is accepted and the Z
    ordinate is KEPT. Returns ``(rg, zs, had_z)`` where ``zs`` is a
    float64 array parallel to ``rg.xs`` (NaN where the source
    coordinate was 2D or M-only) and ``had_z`` a bool array marking
    which geometries carried a Z flag. The 2D kernels never see
    ``zs`` — it rides the Z geometry struct for round-trip fidelity
    only (predicates stay planar, like the reference's)."""
    bufs = list(buffers)
    n = len(bufs)
    gt = np.empty(n, dtype=np.int8)
    co = np.zeros(n + 1, dtype=np.int64)
    ro = np.zeros(n + 1, dtype=np.int64)
    po = np.zeros(n + 1, dtype=np.int64)
    had_z = np.zeros(n, dtype=bool)
    xs_out, ys_out, zs_out = [], [], []
    rings_all, parts_all = [], []
    ncoords = nrings = nparts = 0
    for i, b in enumerate(bufs):
        if b is None:
            gt[i] = MISSING
        else:
            rings_out, parts_out = [], []
            zctx = [False]
            t, _ = _decode_one(bytes(b), 0, xs_out, ys_out, rings_out,
                               parts_out, True, zs_out, zctx)
            gt[i] = t
            had_z[i] = zctx[0]
            rings_all.extend(rings_out)
            parts_all.extend(parts_out)
            ncoords += sum(rings_out)
            nrings += len(rings_out)
            nparts += len(parts_out)
        co[i + 1] = ncoords
        ro[i + 1] = nrings
        po[i + 1] = nparts
    xs = np.concatenate(xs_out) if xs_out else np.empty(0)
    ys = np.concatenate(ys_out) if ys_out else np.empty(0)
    zs = np.concatenate(zs_out) if zs_out else np.empty(0)
    rg = RaggedGeometry(gt, xs, ys, co,
                        np.asarray(rings_all, dtype=np.int32), ro,
                        np.asarray(parts_all, dtype=np.int32), po)
    return rg, zs, had_z


_WKB_TYPE_OF = {POINT: 1, LINESTRING: 2, POLYGON: 3, MULTIPOINT: 4,
                MULTILINESTRING: 5, MULTIPOLYGON: 6}


def _encode_coords(xs, ys):
    out = np.empty(2 * len(xs), dtype="<f8")
    out[0::2] = xs
    out[1::2] = ys
    return out.tobytes()


def _encode_single(gt, xs, ys, rings):
    """Encode one single-part geometry (point/line/polygon)."""
    if gt == POINT:
        if len(xs) == 0:
            # POINT EMPTY: conventional WKB encoding is POINT (NaN NaN)
            return b"\x01\x01\x00\x00\x00" + _encode_coords(
                np.array([np.nan]), np.array([np.nan]))
        return b"\x01\x01\x00\x00\x00" + _encode_coords(xs, ys)
    if gt in (LINESTRING, 2):
        return (b"\x01\x02\x00\x00\x00" + struct.pack("<I", len(xs))
                + _encode_coords(xs, ys))
    if gt == POLYGON:
        out = [b"\x01\x03\x00\x00\x00", struct.pack("<I", len(rings))]
        off = 0
        for rl in rings:
            out.append(struct.pack("<I", int(rl)))
            out.append(_encode_coords(xs[off:off + rl], ys[off:off + rl]))
            off += rl
        return b"".join(out)
    raise WKBError(f"cannot encode type {gt} as single geometry")


def _encode_coords_z(xs, ys, zs):
    out = np.empty(3 * len(xs), dtype="<f8")
    out[0::3] = xs
    out[1::3] = ys
    out[2::3] = zs
    return out.tobytes()


def _hdr_z(base_type):
    # ISO WKB Z: base + 1000, little-endian (what shapely writes for
    # 3D geometries by default)
    return b"\x01" + struct.pack("<I", 1000 + base_type)


def _encode_single_z(gt, xs, ys, zs, rings):
    if gt == POINT:
        if len(xs) == 0:
            return _hdr_z(1) + _encode_coords_z(
                np.array([np.nan]), np.array([np.nan]),
                np.array([np.nan]))
        return _hdr_z(1) + _encode_coords_z(xs, ys, zs)
    if gt == LINESTRING:
        return (_hdr_z(2) + struct.pack("<I", len(xs))
                + _encode_coords_z(xs, ys, zs))
    if gt == POLYGON:
        out = [_hdr_z(3), struct.pack("<I", len(rings))]
        off = 0
        for rl in rings:
            out.append(struct.pack("<I", int(rl)))
            out.append(_encode_coords_z(xs[off:off + rl],
                                        ys[off:off + rl],
                                        zs[off:off + rl]))
            off += rl
        return b"".join(out)
    raise WKBError(f"cannot encode type {gt} as single Z geometry")


def encode_geom_z(gt, xs, ys, zs, rings, parts):
    """Encode one Z-carrying geometry to ISO WKB Z (r12, VERDICT r11
    #4): point/line/polygon/Multi* — the shapes the Z round-trip
    contract covers; GeometryCollection Z is rejected (the 2D engine
    already canonicalizes GC, and no reader produces Z GC cells)."""
    if gt in (POINT, LINESTRING, POLYGON):
        return _encode_single_z(gt, xs, ys, zs, rings)
    if gt in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        sub = {MULTIPOINT: POINT, MULTILINESTRING: LINESTRING,
               MULTIPOLYGON: POLYGON}[gt]
        out = [_hdr_z(_WKB_TYPE_OF[gt]), struct.pack("<I", len(parts))]
        roff = coff = 0
        for nr in parts:
            rs = rings[roff:roff + nr]
            nc = int(np.sum(rs))
            out.append(_encode_single_z(sub, xs[coff:coff + nc],
                                        ys[coff:coff + nc],
                                        zs[coff:coff + nc], rs))
            roff += nr
            coff += nc
        return b"".join(out)
    raise WKBError(f"cannot encode type {gt} with Z")


def encode_geom(gt, xs, ys, rings, parts):
    """Encode one geometry from its ragged slices to WKB bytes."""
    if gt in (POINT, LINESTRING, POLYGON):
        return _encode_single(gt, xs, ys, rings)
    if gt in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        sub = {MULTIPOINT: POINT, MULTILINESTRING: LINESTRING,
               MULTIPOLYGON: POLYGON}[gt]
        out = [b"\x01", struct.pack("<I", _WKB_TYPE_OF[gt]),
               struct.pack("<I", len(parts))]
        roff = 0
        coff = 0
        for nr in parts:
            rs = rings[roff:roff + nr]
            nc = int(np.sum(rs))
            out.append(_encode_single(sub, xs[coff:coff + nc],
                                      ys[coff:coff + nc], rs))
            roff += nr
            coff += nc
        return b"".join(out)
    if gt == GEOMETRYCOLLECTION:
        out = [b"\x01\x07\x00\x00\x00", struct.pack("<I", len(parts))]
        for sgt, sxs, sys_, srings, _ in gc_iter((gt, xs, ys, rings,
                                                  parts)):
            out.append(_encode_single(sgt, sxs, sys_, srings))
        return b"".join(out)
    raise WKBError(f"cannot encode type {gt}")


def encode(rg: RaggedGeometry):
    """Encode a RaggedGeometry batch → list of bytes/None."""
    out = []
    # Fast path: all points, no missing.
    if len(rg) and np.all(rg.gt == POINT) and len(rg.xs) == len(rg):
        m = len(rg)
        rec = np.zeros((m, 21), dtype=np.uint8)
        rec[:, 0] = 1
        rec[:, 1] = 1
        coords = np.empty((m, 2), dtype="<f8")
        coords[:, 0] = rg.xs
        coords[:, 1] = rg.ys
        rec[:, 5:] = coords.view(np.uint8).reshape(m, 16)
        raw = rec.tobytes()
        return [raw[i * 21:(i + 1) * 21] for i in range(m)]
    for i in range(len(rg)):
        if rg.gt[i] == MISSING:
            out.append(None)
        else:
            gt, xs, ys, rings, parts = rg.geom(i)
            out.append(encode_geom(gt, xs, ys, rings, parts))
    return out
