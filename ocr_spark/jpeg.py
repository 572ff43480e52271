"""Baseline JPEG codec — pure stdlib + numpy, no external libraries.

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr
with arbitrary sampling factors, optional restart markers. Returns
(width, height, mean_luma) from the luma channel only — exactly what
the multimodal decode stage extracts (operators/multimodal.py). The
chroma components are entropy-decoded (the bitstream cannot be
advanced otherwise) but not reconstructed.

Encoder: minimal baseline encoder (grayscale, quality-fixed Annex K
tables, no subsampling) used by the tests to produce real JPEG bytes
with known pixel content — no imaging library exists in this sandbox
to make fixtures with.

Progressive (SOF2), arithmetic coding, 12-bit, and hierarchical modes
raise NotImplementedError — that remains the PIL/libjpeg seam.

Format reference: ITU-T T.81 (public spec); tables from its Annex K.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared: orthonormal 8x8 DCT basis
# ---------------------------------------------------------------------------

_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(0.125) if _u == 0 else 0.5
        )

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K luminance quantization table (quality 50), zigzag order
_Q50_ZZ = [
    16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
    103, 99,
]

# Annex K Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits, vals):
    """symbol -> (code, length) via T.81 C.2 canonical assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    """(code, length) -> symbol for the decoder."""
    enc = _canonical_codes(bits, vals)
    return {(c, l): s for s, (c, l) in enc.items()}


# ---------------------------------------------------------------------------
# encoder (grayscale baseline, for test fixtures)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1s per spec


def _magnitude(v):
    """(size, amplitude bits) for a coefficient value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else (v + (1 << size) - 1)
    return size, bits


def encode_gray(pixels: np.ndarray) -> bytes:
    """Encode an 8-bit grayscale array as a baseline JPEG."""
    h, w = pixels.shape
    q = np.empty(64)
    for i, z in enumerate(_ZIGZAG):
        q[z] = _Q50_ZZ[i]
    qtab = q.reshape(8, 8)

    dc_codes = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(_Q50_ZZ[i]) for i in range(64)
    )
    # SOF0: 8-bit, 1 component, no subsampling
    out += (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 11, 8, h, w, 1)
        + bytes([1, 0x11, 0])
    )
    # DHT: DC then AC
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(_DC_LUM_VALS))
        + b"\x00"
        + bytes(_DC_LUM_BITS)
        + bytes(_DC_LUM_VALS)
    )
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(_AC_LUM_VALS))
        + b"\x10"
        + bytes(_AC_LUM_BITS)
        + bytes(_AC_LUM_VALS)
    )
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])

    bw = _BitWriter()
    prev_dc = 0
    bh, bw_n = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(pixels.astype(np.float64), ((0, bh * 8 - h), (0, bw_n * 8 - w)), mode="edge")
    for by in range(bh):
        for bx in range(bw_n):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = _C @ block @ _C.T
            quant = np.round(coef / qtab).astype(int)
            zz = [int(quant.flat[z]) for z in _ZIGZAG]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            size, bits = _magnitude(diff)
            code, length = dc_codes[size]
            bw.write(code, length)
            if size:
                bw.write(bits, size)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    if run == 16:
                        code, length = ac_codes[0xF0]  # ZRL
                        bw.write(code, length)
                        run = 0
                    continue
                size, bits = _magnitude(zz[i])
                code, length = ac_codes[(run << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
            if last_nz < 63:
                code, length = ac_codes[0x00]  # EOB
                bw.write(code, length)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Lazy one-byte-at-a-time reader: nothing past the current byte
    is consumed, so restart-marker alignment (``align`` + marker skip
    at ``pos``) is exact. At a marker or end of data it yields 1-bits
    (the spec's padding)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read_bit(self):
        if self.n == 0:
            if self.pos < len(self.data):
                b = self.data[self.pos]
                if b == 0xFF:
                    nxt = (
                        self.data[self.pos + 1]
                        if self.pos + 1 < len(self.data)
                        else 0xD9
                    )
                    if nxt == 0x00:
                        self.pos += 2  # stuffed 0xFF data byte
                        self.acc, self.n = 0xFF, 8
                    else:
                        self.acc, self.n = 0xFF, 8  # marker: pad, don't consume
                else:
                    self.pos += 1
                    self.acc, self.n = b, 8
            else:
                self.acc, self.n = 0xFF, 8  # EOF padding
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, length):
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def align(self):
        self.n = 0


def _extend(v, size):
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _huff_decode(reader, table):
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def decode_luma(payload: bytes) -> tuple:
    """Decode a baseline JPEG's luma channel: returns
    (width, height, mean_luma). Raises NotImplementedError for
    progressive/arithmetic/12-bit streams."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs = {}
    huff_dc, huff_ac = {}, {}
    width = height = None
    comps = []  # (id, h, v, tq)
    restart_interval = 0
    scan = None
    scan_comps = []
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.empty(64)
                for i in range(64):
                    tab[_ZIGZAG[i]] = seg[p + i]
                qtabs[tq] = tab.reshape(8, 8)
                p += 64
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, height, width, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if precision != 8:
                raise NotImplementedError("12-bit JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "non-baseline JPEG (progressive/arithmetic) needs a real "
                "codec library at this seam"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cs, tds >> 4, tds & 0xF))
            scan = payload[pos + seglen :]
            break
        pos += seglen
    if scan is None or width is None:
        raise ValueError("JPEG missing SOS/SOF")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    reader = _BitReader(scan)
    preds = {cid: 0 for cid, *_ in comps}
    luma_id = comps[0][0]
    lh, lv = comps[0][1], comps[0][2]
    luma = np.zeros((mcuy * lv * 8, mcux * lh * 8))
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align()
                # skip the RSTn marker
                while reader.pos + 1 < len(reader.data) and reader.data[reader.pos] == 0xFF:
                    m = reader.data[reader.pos + 1]
                    if 0xD0 <= m <= 0xD7:
                        reader.pos += 2
                        break
                    reader.pos += 1
                preds = {cid: 0 for cid in preds}
            for cs, td, ta in scan_comps:
                ch, cv, tq = by_id[cs]
                for v in range(cv):
                    for hblk in range(ch):
                        zz = np.zeros(64)
                        s = _huff_decode(reader, huff_dc[td])
                        diff = _extend(reader.receive(s), s)
                        preds[cs] += diff
                        zz[0] = preds[cs]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, huff_ac[ta])
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflow")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        if cs == luma_id:
                            coef = np.empty(64)
                            coef[_ZIGZAG] = zz
                            block = (
                                _C.T
                                @ (coef.reshape(8, 8) * qtabs[tq])
                                @ _C
                            ) + 128.0
                            y0 = (my * lv + v) * 8
                            x0 = (mx * lh + hblk) * 8
                            luma[y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    visible = np.clip(luma[:height, :width], 0, 255)
    return width, height, float(visible.mean())
