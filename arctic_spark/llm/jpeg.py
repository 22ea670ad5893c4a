"""Baseline JPEG codec, from scratch (numpy + stdlib).

Implements the baseline sequential DCT process of the PUBLIC JPEG
specification (ITU-T T.81 / ISO-IEC 10918-1): marker parsing
(SOI/APPn/DQT/SOF0-1/DHT/DRI/SOS/RSTn/EOI), canonical Huffman
decoding per the spec's MINCODE/MAXCODE/VALPTR algorithm (F.2.2.3),
byte unstuffing and restart-marker handling, DC prediction +
RECEIVE/EXTEND, run-length AC with ZRL/EOB, dequantization, inverse
zigzag, 8x8 inverse DCT as one numpy tensor contraction, chroma
upsampling by replication, and the JFIF BT.601 YCbCr -> RGB
transform. Decodes real-world baseline JPEGs (progressive /
arithmetic / hierarchical modes raise ``NotImplementedError``).

A minimal encoder is included so the decoder is testable without any
codec library in the container: 8x8 FDCT + Annex-K-style
quantization scaled by a quality factor, canonical per-image Huffman
tables (every symbol actually emitted gets a fixed-length canonical
code — legal per the DHT segment semantics, smaller to implement
than Annex K's tables, and it exercises the decoder's general DHT
path), optional 4:2:0 box subsampling, grayscale or YCbCr color.
The encoder exists for round-trip verification and fixture
generation; it is not tuned for compression ratio.

The reference engine has no media layer at all — this closes the
"entropy-coded formats are container-gated" residual for JPEG
(PNG/GIF/BMP/PPM/WAV were already native; MP3/H.264 remain gated).
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag scan order: index z -> (row, col) flattened offset
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1 example luminance/chrominance quantization tables (natural
# row order) — the standard's published reference tables
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64)

# orthonormal 8-point DCT-II basis: T[u, k] = a(u) cos((2k+1)u pi/16)
_T = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _k in range(8):
        _T[_u, _k] = _a * np.cos((2 * _k + 1) * _u * np.pi / 16)


class JpegError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------

class HuffTable:
    """Canonical Huffman table from a DHT (bits, vals) pair, decoded
    with the spec's MINCODE/MAXCODE/VALPTR method (T.81 F.2.2.3)."""

    def __init__(self, bits, vals):
        self.bits = list(bits)          # counts per code length 1..16
        self.vals = list(vals)
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            n = self.bits[ln - 1]
            if n:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += n
                k += n
                self.maxcode[ln] = code - 1
            code <<= 1

    # encoder side: symbol -> (code, length)
    def encode_map(self):
        out = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(self.bits[ln - 1]):
                out[self.vals[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1
        return out


def _fixed_length_table(symbols):
    """A valid canonical table giving every symbol in ``symbols`` the
    same code length L = ceil(log2(n+1)) (incomplete codes are legal;
    +1 keeps the all-ones code unused, which baseline decoding
    requires for lengths that fill the code space)."""
    syms = sorted(set(symbols)) or [0]
    n = len(syms)
    ln = max(1, int(np.ceil(np.log2(n + 1))))
    bits = [0] * 16
    bits[ln - 1] = n
    return HuffTable(bits, syms)


# ---------------------------------------------------------------------------
# Bit IO
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing and restart-marker awareness."""

    def __init__(self, buf, pos):
        self.b = buf
        self.p = pos
        self.acc = 0
        self.n = 0

    def _next_byte(self):
        if self.p >= len(self.b):
            raise JpegError("truncated entropy stream")
        v = self.b[self.p]
        self.p += 1
        if v == 0xFF:
            m = self.b[self.p] if self.p < len(self.b) else 0xD9
            if m == 0x00:
                self.p += 1
                return 0xFF
            # a real marker: signal with padding ones (spec behavior is
            # that decode never reads past a correctly-formed segment)
            self.p -= 1
            raise JpegError("marker inside entropy segment")
        return v

    def bit(self):
        if self.n == 0:
            self.acc = self._next_byte()
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, t):
        v = 0
        for _ in range(t):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self, idx):
        """Byte-align and consume the expected RSTn marker."""
        self.n = 0
        if self.p + 1 >= len(self.b) or self.b[self.p] != 0xFF:
            raise JpegError("expected restart marker")
        m = self.b[self.p + 1]
        if not (0xD0 <= m <= 0xD7) or (m - 0xD0) != (idx & 7):
            raise JpegError(f"bad restart marker {m:#x}")
        self.p += 2

    def decode_huff(self, ht: HuffTable):
        code = self.bit()
        ln = 1
        while code > ht.maxcode[ln]:
            if ln >= 16:
                raise JpegError("invalid Huffman code")
            code = (code << 1) | self.bit()
            ln += 1
        return ht.vals[ht.valptr[ln] + code - ht.mincode[ln]]


def _extend(v, t):
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, code, ln):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)      # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.bits(1, 1)                    # pad with ones


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def parse_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline JPEG byte string to an HxW (grayscale) or
    HxWx3 (RGB) uint8 array."""
    b = bytes(buf)
    if b[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    qt = {}
    huff = {}                 # (class, id) -> HuffTable
    frame = None
    restart = 0
    p = 2
    while p < len(b):
        if b[p] != 0xFF:
            raise JpegError(f"expected marker at {p}")
        m = b[p + 1]
        p += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            break
        ln = struct.unpack_from(">H", b, p)[0]
        seg = b[p + 2:p + ln]
        if m == 0xDB:                          # DQT
            q = 0
            while q < len(seg):
                pq, tq = seg[q] >> 4, seg[q] & 15
                q += 1
                if pq:
                    tbl = np.frombuffer(seg, dtype=">u2", count=64,
                                        offset=q).astype(np.float64)
                    q += 128
                else:
                    tbl = np.frombuffer(seg, dtype=np.uint8, count=64,
                                        offset=q).astype(np.float64)
                    q += 64
                nat = np.empty(64)
                nat[ZIGZAG] = tbl              # stored in zigzag order
                qt[tq] = nat
        elif m in (0xC0, 0xC1):                # SOF0 / SOF1 (baseline)
            prec, h, w, nc = seg[0], struct.unpack_from(">H", seg, 1)[0], \
                struct.unpack_from(">H", seg, 3)[0], seg[5]
            if prec != 8:
                raise JpegError(f"{prec}-bit precision not supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], \
                    seg[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG is supported "
                f"(got SOF marker {m:#x})")
        elif m == 0xC4:                        # DHT
            q = 0
            while q < len(seg):
                tc, th = seg[q] >> 4, seg[q] & 15
                bits = list(seg[q + 1:q + 17])
                nv = sum(bits)
                vals = list(seg[q + 17:q + 17 + nv])
                huff[(tc, th)] = HuffTable(bits, vals)
                q += 17 + nv
        elif m == 0xDD:                        # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif m == 0xDA:                        # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tda = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scomps.append((comp, tda >> 4, tda & 15))
            if ns < len(frame["comps"]):
                # A legal multi-scan (non-interleaved) baseline file
                # puts each component in its own SOS; decoding only the
                # first would silently return a Y-only image (ADVICE r8)
                raise NotImplementedError(
                    "multi-scan baseline not supported: first SOS covers "
                    f"{ns} of {len(frame['comps'])} frame components")
            return _decode_scan(b, p + ln, frame, scomps, qt, huff,
                                restart)
        p += ln
    raise JpegError("no SOS segment found")


def _decode_scan(b, pos, frame, scomps, qt, huff, restart):
    h, w = frame["h"], frame["w"]
    if len(scomps) == 1:
        # non-interleaved scan: one data unit per MCU regardless of the
        # component's sampling factors (T.81 A.2.2); for the
        # single-component frames this decoder supports, that is the
        # component at full frame resolution
        c0, td, ta = scomps[0]
        scomps = [(dict(c0, h=1, v=1), td, ta)]
    hmax = max(c["h"] for c, _, _ in scomps)
    vmax = max(c["v"] for c, _, _ in scomps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    # per-component coefficient planes (in 8x8 block units)
    planes = []
    for c, _, _ in scomps:
        bw, bh = mcx * c["h"], mcy * c["v"]
        planes.append(np.zeros((bh * 8, bw * 8)))
    rdr = _BitReader(b, pos)
    preds = [0] * len(scomps)
    nmcu = mcx * mcy
    coefs = [[] for _ in scomps]      # (by, bx, zigzag-coef vector)
    for mi in range(nmcu):
        if restart and mi and mi % restart == 0:
            rdr.align_restart(mi // restart - 1)
            preds = [0] * len(scomps)
        my, mx = divmod(mi, mcx)
        for ci, (c, td, ta) in enumerate(scomps):
            dct = huff[(0, td)]
            act = huff[(1, ta)]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64)
                    t = rdr.decode_huff(dct)
                    diff = _extend(rdr.receive(t), t)
                    preds[ci] += diff
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = rdr.decode_huff(act)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break                      # EOB
                        k += r
                        if k > 63:
                            raise JpegError("AC index out of range")
                        zz[k] = _extend(rdr.receive(s), s)
                        k += 1
                    coefs[ci].append((my * c["v"] + by,
                                      mx * c["h"] + bx, zz))
    # dequantize + IDCT all blocks of each component in one shot
    out_comps = []
    for ci, (c, _, _) in enumerate(scomps):
        q = qt[c["tq"]]
        entries = coefs[ci]
        zzm = np.array([e[2] for e in entries])        # (n, 64) zigzag
        blocks = np.zeros((len(entries), 64))
        blocks[:, ZIGZAG] = zzm * q[ZIGZAG]            # -> natural order
        blocks = blocks.reshape(-1, 8, 8)
        pix = np.einsum("ur,nuv,vc->nrc", _T, blocks, _T) + 128.0
        plane = planes[ci]
        for (byx, bxx, _), blk in zip(entries, pix):
            plane[byx * 8:byx * 8 + 8, bxx * 8:bxx * 8 + 8] = blk
        # upsample by replication to the full frame grid
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        out_comps.append(plane[:h, :w])
    if len(out_comps) == 1:
        return np.clip(np.round(out_comps[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_comps[0], out_comps[1] - 128.0, out_comps[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (for round-trip tests and fixtures)
# ---------------------------------------------------------------------------

def _quality_scale(q):
    q = min(max(int(q), 1), 100)
    s = 5000 / q if q < 50 else 200 - 2 * q
    return max(s, 1e-9) / 100.0


def _quantize_blocks(plane, qtab):
    """Plane (multiple of 8 in both dims) -> (n, 64) quantized zigzag
    int coefficients, block raster order."""
    hh, ww = plane.shape
    blocks = (plane.reshape(hh // 8, 8, ww // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0)
    coefs = np.einsum("ur,nrc,vc->nuv", _T, blocks, _T).reshape(-1, 64)
    qz = np.round(coefs / qtab).astype(np.int64)
    return qz[:, ZIGZAG]


def _cat(v):
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _sym_stream(zz_blocks):
    """Per block: DC category symbol + AC (run, size) symbols with the
    value bits; returns [(dcsym, dcval, [(acsym, acval, acsize)])]."""
    out = []
    pred = 0
    for zz in zz_blocks:
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        t = _cat(diff)
        dval = diff if diff >= 0 else diff + (1 << t) - 1
        acs = []
        run = 0
        last = 0
        for k in range(1, 64):
            if zz[k]:
                last = k
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, 0, 0))       # ZRL
                run -= 16
            s = _cat(v)
            val = v if v >= 0 else v + (1 << s) - 1
            acs.append(((run << 4) | s, val, s))
            run = 0
        if last < 63:
            acs.append((0x00, 0, 0))           # EOB
        out.append((t, dval, acs))
    return out


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False) -> bytes:
    """Encode an HxW (grayscale) or HxWx3 (RGB) uint8 array as a
    baseline JPEG. ``subsample=True`` uses 4:2:0 chroma (box mean),
    else 4:4:4. Tables: Annex-K quantization scaled by ``quality``,
    per-image fixed-length canonical Huffman (module docstring)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    scale = _quality_scale(quality)
    qlum = np.clip(np.round(QT_LUMA * scale), 1, 255)
    qchr = np.clip(np.round(QT_CHROMA * scale), 1, 255)

    def pad_to(p, mult):
        hh = -(-p.shape[0] // mult) * mult
        ww = -(-p.shape[1] // mult) * mult
        out = np.empty((hh, ww))
        out[:p.shape[0], :p.shape[1]] = p
        out[p.shape[0]:, :p.shape[1]] = p[-1:, :]
        out[:, p.shape[1]:] = out[:, p.shape[1] - 1:p.shape[1]]
        return out

    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0,
                  "plane": pad_to(img.astype(np.float64), 8)}]
    else:
        rgb = img.astype(np.float64)
        r, g, bch = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bch
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bch + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bch + 128.0
        if subsample:
            ypad = pad_to(y, 16)

            def box(p):
                p = pad_to(p, 16)
                return (p.reshape(p.shape[0] // 2, 2,
                                  p.shape[1] // 2, 2)
                        .mean(axis=(1, 3)))
            comps = [{"id": 1, "h": 2, "v": 2, "tq": 0, "plane": ypad},
                     {"id": 2, "h": 1, "v": 1, "tq": 1,
                      "plane": box(cb)},
                     {"id": 3, "h": 1, "v": 1, "tq": 1,
                      "plane": box(cr)}]
        else:
            comps = [{"id": 1, "h": 1, "v": 1, "tq": 0,
                      "plane": pad_to(y, 8)},
                     {"id": 2, "h": 1, "v": 1, "tq": 1,
                      "plane": pad_to(cb, 8)},
                     {"id": 3, "h": 1, "v": 1, "tq": 1,
                      "plane": pad_to(cr, 8)}]

    # quantize all blocks per component (block raster order), then
    # re-walk them in MCU order during entropy coding
    for c in comps:
        c["zz"] = _quantize_blocks(c["plane"],
                                   qlum if c["tq"] == 0 else qchr)
        c["bw"] = c["plane"].shape[1] // 8

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))

    # MCU-ordered block streams + DC prediction per component
    mcu_blocks = {c["id"]: [] for c in comps}
    for mi in range(mcx * mcy):
        my, mx = divmod(mi, mcx)
        for c in comps:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    bi = (my * c["v"] + by) * c["bw"] + (mx * c["h"]
                                                         + bx)
                    mcu_blocks[c["id"]].append(c["zz"][bi])
    streams = {cid: _sym_stream(blks)
               for cid, blks in mcu_blocks.items()}

    # shared Huffman tables: class 0 for luma (comp 1), class 1 chroma
    def table_for(comp_ids):
        dcsyms, acsyms = [], []
        for cid in comp_ids:
            for t, _, acs in streams[cid]:
                dcsyms.append(t)
                acsyms.extend(sym for sym, _, _ in acs)
        return (_fixed_length_table(dcsyms),
                _fixed_length_table(acsyms))
    dc0, ac0 = table_for([1])
    tabs = {1: (0, dc0, ac0)}
    if not gray:
        dc1, ac1 = table_for([2, 3])
        tabs[2] = (1, dc1, ac1)
        tabs[3] = (1, dc1, ac1)

    out = bytearray(b"\xff\xd8")                       # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])

    def dqt(tid, tab):
        return (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
                + bytes(int(v) for v in tab[ZIGZAG]))
    out += dqt(0, qlum)
    if not gray:
        out += dqt(1, qchr)

    nc = len(comps)
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * nc) \
        + bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in comps:
        out += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])

    def dht(tc, th, ht):
        return (b"\xff\xc4"
                + struct.pack(">H", 19 + sum(ht.bits))
                + bytes([(tc << 4) | th]) + bytes(ht.bits)
                + bytes(ht.vals))
    out += dht(0, 0, dc0) + dht(1, 0, ac0)
    if not gray:
        out += dht(0, 1, dc1) + dht(1, 1, ac1)

    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])
    for c in comps:
        tid = tabs[c["id"]][0]
        out += bytes([c["id"], (tid << 4) | tid])
    out += bytes([0, 63, 0])

    wtr = _BitWriter()
    emaps = {cid: (dc.encode_map(), ac.encode_map())
             for cid, (_, dc, ac) in tabs.items()}
    idxs = {cid: 0 for cid in streams}
    for mi in range(mcx * mcy):
        for c in comps:
            dmap, amap = emaps[c["id"]]
            for _ in range(c["h"] * c["v"]):
                t, dval, acs = streams[c["id"]][idxs[c["id"]]]
                idxs[c["id"]] += 1
                code, ln = dmap[t]
                wtr.bits(code, ln)
                if t:
                    wtr.bits(dval, t)
                for sym, val, s in acs:
                    code, ln = amap[sym]
                    wtr.bits(code, ln)
                    if s:
                        wtr.bits(val, s)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)
