"""JPEG codec — pure stdlib + numpy, no external libraries.

Decoder: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2)
— spectral selection, successive approximation (DC and AC first +
refinement scans, EOB run-length symbols, T.81 §G), 8-bit, grayscale
or YCbCr with arbitrary sampling factors, optional restart markers.
Returns (width, height, mean_luma) from the luma channel only —
exactly what the multimodal decode stage extracts
(operators/multimodal.py). The chroma components are entropy-decoded
(the bitstream cannot be advanced otherwise) but not reconstructed.

Encoders: minimal baseline encoder (grayscale, quality-fixed Annex K
tables, no subsampling) plus a progressive (SOF2) encoder emitting
DC-first/DC-refine/AC-first/AC-refine scans over two spectral bands —
both used by the tests to produce real JPEG bytes with known pixel
content (no imaging library exists in this sandbox to make fixtures
with). The two encoders carry bit-identical quantized coefficients,
so decoding either stream must give the same pixels — the pinned
cross-mode invariant.

Arithmetic coding, 12-bit, lossless, and hierarchical modes raise
NotImplementedError — that remains the PIL/libjpeg seam.

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
# progressive encoder (grayscale, for test fixtures)
# ---------------------------------------------------------------------------
#
# Annex K's AC table has no EOBn symbols (progressive streams normally
# ship optimized tables), so progressive scans use a flat custom AC
# table: every symbol the scans can emit — EOB0..EOB14 (r<<4, s=0),
# ZRL (0xF0), and (r<<4)|s for s=1..10 — as an 8-bit canonical code
# (176 symbols, Kraft sum 176/256 < 1, so the table is valid).

_PROG_AC_VALS = sorted(
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_PROG_AC_BITS = [0] * 16
_PROG_AC_BITS[7] = len(_PROG_AC_VALS)  # all codes 8 bits long


def _quant_zz_blocks(pixels: np.ndarray):
    """Row-major list of zigzag-order quantized coefficient lists —
    the same DCT/Q50 math as ``encode_gray`` so a progressive stream
    carries bit-identical coefficients to the baseline one."""
    h, w = pixels.shape
    q = np.empty(64)
    for i, z in enumerate(_ZIGZAG):
        q[z] = _Q50_ZZ[i]
    qtab = q.reshape(8, 8)
    bh, bwn = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(
        pixels.astype(np.float64),
        ((0, bh * 8 - h), (0, bwn * 8 - w)),
        mode="edge",
    )
    blocks = []
    for by in range(bh):
        for bx in range(bwn):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            quant = np.round((_C @ block @ _C.T) / qtab).astype(int)
            blocks.append([int(quant.flat[z]) for z in _ZIGZAG])
    return blocks


def _encode_ac_first(blocks, ss, se, al, ac_codes) -> bytes:
    """Progressive AC first scan (T.81 G.1.2.2): point-transformed
    magnitudes with EOBn run aggregation."""
    bw = _BitWriter()
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, length = ac_codes[r << 4]
            bw.write(code, length)
            if r:
                bw.write(eobrun - (1 << r), r)
            eobrun = 0

    for zz in blocks:
        vals = [
            (abs(zz[k]) >> al) * (1 if zz[k] >= 0 else -1)
            for k in range(ss, se + 1)
        ]
        last = max((i for i, v in enumerate(vals) if v), default=-1)
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        r = 0
        for i in range(last + 1):
            v = vals[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                code, length = ac_codes[0xF0]
                bw.write(code, length)
                r -= 16
            size, bits = _magnitude(v)
            code, length = ac_codes[(r << 4) | size]
            bw.write(code, length)
            bw.write(bits, size)
            r = 0
        if last < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    bw.flush()
    return bytes(bw.buf)


def _encode_ac_refine(blocks, ss, se, al, ac_codes) -> bytes:
    """Progressive AC refinement scan (T.81 G.1.2.3, fig. G.7):
    newly-significant coefficients as (run<<4)|1 + sign bit;
    correction bits for already-nonzero coefficients buffered and
    emitted after the symbol (or EOBn flush) they ride with."""
    bw = _BitWriter()
    eobrun = 0
    pending = []  # correction bits deferred with the EOB run

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            code, length = ac_codes[r << 4]
            bw.write(code, length)
            if r:
                bw.write(eobrun - (1 << r), r)
            eobrun = 0
        for b in pending:
            bw.write(b, 1)
        pending = []

    for zz in blocks:
        vals = [abs(zz[k]) >> al for k in range(ss, se + 1)]
        eob_i = -1
        for i, v in enumerate(vals):
            if v == 1:
                eob_i = i
        r = 0
        br = []  # this block's buffered correction bits
        for i, v in enumerate(vals):
            if v == 0:
                r += 1
                continue
            # emit required ZRLs before ANY nonzero position (fig.
            # G.7) — unless they can fold into the EOB run; a ZRL here
            # splits the buffered correction bits exactly where the
            # decoder's 16-zero walk stops consuming them
            while r > 15 and i <= eob_i:
                flush_eob()
                code, length = ac_codes[0xF0]
                bw.write(code, length)
                r -= 16
                for b in br:
                    bw.write(b, 1)
                br = []
            if v > 1:
                br.append(v & 1)
                continue
            # newly significant
            flush_eob()
            code, length = ac_codes[(r << 4) | 1]
            bw.write(code, length)
            bw.write(1 if zz[ss + i] >= 0 else 0, 1)
            for b in br:
                bw.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF or len(pending) > 900:
                flush_eob()
    flush_eob()
    bw.flush()
    return bytes(bw.buf)


def encode_gray_progressive(pixels: np.ndarray) -> bytes:
    """Encode an 8-bit grayscale array as a progressive (SOF2) JPEG
    carrying the exact coefficients of ``encode_gray``: DC first
    (Al=1) → DC refine → AC first in two spectral bands (Al=1) → AC
    refine in the same bands — so decode_luma of the two streams is
    bit-identical."""
    h, w = pixels.shape
    dc_codes = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _canonical_codes(_PROG_AC_BITS, _PROG_AC_VALS)
    blocks = _quant_zz_blocks(pixels)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(_Q50_ZZ[i]) for i in range(64)
    )
    out += (
        b"\xff\xc2"
        + struct.pack(">HBHHB", 11, 8, h, w, 1)
        + bytes([1, 0x11, 0])
    )
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(_DC_LUM_VALS))
        + b"\x00"
        + bytes(_DC_LUM_BITS)
        + bytes(_DC_LUM_VALS)
    )
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(_PROG_AC_VALS))
        + b"\x11"
        + bytes(_PROG_AC_BITS)
        + bytes(_PROG_AC_VALS)
    )

    def sos(ss, se, ah, al, ta):
        return (
            b"\xff\xda"
            + struct.pack(">HB", 8, 1)
            + bytes([1, ta, ss, se, (ah << 4) | al])
        )

    # DC first, point transform Al=1 (arithmetic shift per G.1.2.1)
    bw = _BitWriter()
    prev = 0
    for zz in blocks:
        v = zz[0] >> 1
        size, bits = _magnitude(v - prev)
        prev = v
        code, length = dc_codes[size]
        bw.write(code, length)
        if size:
            bw.write(bits, size)
    bw.flush()
    out += sos(0, 0, 0, 1, 0x00) + bw.buf

    # DC refine: one raw bit per block
    bw = _BitWriter()
    for zz in blocks:
        bw.write(zz[0] & 1, 1)
    bw.flush()
    out += sos(0, 0, 1, 0, 0x00) + bw.buf

    bands = ((1, 5), (6, 63))
    for ss, se in bands:
        out += sos(ss, se, 0, 1, 0x01) + _encode_ac_first(
            blocks, ss, se, 1, ac_codes
        )
    for ss, se in bands:
        out += sos(ss, se, 1, 0, 0x01) + _encode_ac_refine(
            blocks, ss, se, 0, ac_codes
        )
    out += b"\xff\xd9"
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


def _decode_block_sequential(blk, reader, dc_tab, ac_tab, preds, cid):
    """One baseline block: DC diff + AC run/size, T.81 F.2.2."""
    s = _huff_decode(reader, dc_tab)
    preds[cid] += _extend(reader.receive(s), s)
    blk[0] = preds[cid]
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 0xF
        if rs == 0x00:
            break
        if rs == 0xF0:
            k += 16
            continue
        k += r
        if k > 63:
            raise ValueError("AC run overflow")
        blk[k] = _extend(reader.receive(s), s)
        k += 1


def _decode_block_ac_first(blk, reader, ac_tab, ss, se, al, eobrun):
    """Progressive AC first scan for one block (T.81 G.2, fig. G.3):
    run/size with EOBn run-length symbols; values stored << Al.
    Returns the updated end-of-band run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:  # EOBn: run = 2^r + appended bits (incl. this block)
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.receive(r)
                return eobrun
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run overflow")
        blk[k] = _extend(reader.receive(s), s) << al
        k += 1
    return 0


def _decode_block_ac_refine(blk, reader, ac_tab, ss, se, al, eobrun):
    """Progressive AC refinement for one block (T.81 G.1.2.3, fig.
    G.7 decode side): newly-significant coefficients arrive as
    (run<<4)|1 + sign bit; every already-nonzero coefficient passed
    over consumes one correction bit. Returns the updated EOB run."""
    bit = 1 << al

    def _correct(k):
        if reader.read_bit():
            if not (int(blk[k]) & bit):
                blk[k] += bit if blk[k] > 0 else -bit

    if eobrun > 0:
        for k in range(ss, se + 1):
            if blk[k]:
                _correct(k)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 0xF
        newval = 0
        if s == 0:
            if r < 15:  # EOBn
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.receive(r)
                break
            # ZRL: skip 16 zero-history slots, correcting as we pass
        elif s == 1:
            newval = bit if reader.read_bit() else -bit
        else:
            raise ValueError("bad refinement magnitude")
        while k <= se:
            if blk[k]:
                _correct(k)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if k <= se and newval:
            blk[k] = newval
        k += 1
    # after an EOB the rest of this block's nonzero history still
    # receives correction bits
    while k <= se:
        if blk[k]:
            _correct(k)
        k += 1
    return eobrun


def _run_scan(scan_data, scan_comps, ss, se, ah, al, progressive, comps,
              coefs, grids, huff_dc, huff_ac, restart_interval):
    """Entropy-decode one scan into the coefficient arrays; returns
    the number of scan-data bytes consumed."""
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
    reader = _BitReader(scan_data)
    preds = {cid: 0 for cid, *_ in comps}
    by_id = {cid: (h, v) for cid, h, v, _tq in comps}
    eobrun = 0
    if len(scan_comps) == 1:
        cid0 = scan_comps[0][0]
        _by, _bx, nby, nbx = grids[cid0]
        units = nby * nbx
    else:
        mcux, mcuy = grids["__mcu__"]
        units = mcux * mcuy

    def _one(blk, td, ta):
        nonlocal eobrun
        if not progressive:
            _decode_block_sequential(
                blk, reader, huff_dc[td], huff_ac[ta], preds, cid
            )
        elif ss == 0:
            if ah == 0:
                s = _huff_decode(reader, huff_dc[td])
                preds[cid] += _extend(reader.receive(s), s)
                blk[0] = preds[cid] << al
            elif reader.read_bit():
                blk[0] = int(blk[0]) | (1 << al)
        elif ah == 0:
            eobrun = _decode_block_ac_first(
                blk, reader, huff_ac[ta], ss, se, al, eobrun
            )
        else:
            eobrun = _decode_block_ac_refine(
                blk, reader, huff_ac[ta], ss, se, al, eobrun
            )

    for unit in range(units):
        if restart_interval and unit and unit % restart_interval == 0:
            reader.align()
            while (reader.pos + 1 < len(reader.data)
                   and reader.data[reader.pos] == 0xFF):
                m = reader.data[reader.pos + 1]
                if 0xD0 <= m <= 0xD7:
                    reader.pos += 2
                    break
                reader.pos += 1
            preds = {c: 0 for c in preds}
            eobrun = 0
        if len(scan_comps) == 1:
            cid, td, ta = scan_comps[0]
            byi, bxi = divmod(unit, nbx)
            _one(coefs[cid][byi, bxi], td, ta)
        else:
            my, mx = divmod(unit, mcux)
            for cid, td, ta in scan_comps:
                ch, cv = by_id[cid]
                for v in range(cv):
                    for hblk in range(ch):
                        _one(coefs[cid][my * cv + v, mx * ch + hblk], td, ta)
    return reader.pos


def decode_luma(payload: bytes) -> tuple:
    """Decode a JPEG's luma channel: returns (width, height,
    mean_luma). Handles baseline sequential (SOF0/1) and progressive
    (SOF2) streams — spectral selection, successive approximation,
    EOB runs, restart markers. Raises NotImplementedError for
    arithmetic/lossless/hierarchical/12-bit streams (the libjpeg
    seam); ValueError on malformed data."""
    width, height, visible = decode_luma_grid(payload)
    return width, height, float(visible.mean())


def decode_luma_grid(payload: bytes) -> tuple:
    """Like ``decode_luma`` but returns (width, height, luma) with
    ``luma`` the full uint8 pixel grid — the input a resize /
    frame-sample stage consumes."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs = {}
    huff_dc, huff_ac = {}, {}
    width = height = None
    comps = []  # (id, h, v, tq)
    restart_interval = 0
    progressive = False
    coefs = {}  # cid -> int64 (block_rows, block_cols, 64) zigzag order
    grids = {}  # cid -> (mcu-aligned by, bx, exact nby, nbx)
    saw_scan = False
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        if pos + 2 > n:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        nxt = pos + seglen
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            precision, height, width, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if precision != 8:
                raise NotImplementedError("12-bit JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            grids["__mcu__"] = (mcux, mcuy)
            for cid, ch, cv, _tq in comps:
                cw = (width * ch + hmax - 1) // hmax
                chh = (height * cv + vmax - 1) // vmax
                nbx = (cw + 7) // 8
                nby = (chh + 7) // 8
                by, bx = mcuy * cv, mcux * ch
                grids[cid] = (by, bx, nby, nbx)
                coefs[cid] = np.zeros((by, bx, 64), dtype=np.int64)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "arithmetic/lossless/hierarchical JPEG needs a real codec "
                "library at this seam"
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
            if width is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cs, tds >> 4, tds & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            consumed = _run_scan(
                payload[nxt:], scan_comps, ss, se, a >> 4, a & 0xF,
                progressive, comps, coefs, grids, huff_dc, huff_ac,
                restart_interval,
            )
            saw_scan = True
            pos = nxt + consumed
            continue
        pos = nxt
    if not saw_scan or width is None:
        raise ValueError("JPEG missing SOS/SOF")

    luma_cid, _lh, _lv, ltq = comps[0]
    by, bx = grids[luma_cid][0], grids[luma_cid][1]
    zzc = coefs[luma_cid].reshape(by * bx, 64).astype(np.float64)
    nat = np.empty_like(zzc)
    nat[:, _ZIGZAG] = zzc
    blocks = nat.reshape(-1, 8, 8) * qtabs[ltq]
    px = np.einsum("ux,nuv,vy->nxy", _C, blocks, _C) + 128.0
    luma = (
        px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    )
    visible = np.clip(luma[:height, :width], 0, 255)
    return width, height, np.round(visible).astype(np.uint8)
