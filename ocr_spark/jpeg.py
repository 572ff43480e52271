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

Arithmetic coding — sequential (SOF9) AND progressive (SOF10) —
is implemented for real: the QM-coder probability-estimation state
machine of ITU-T T.81 Table D.3 with the Annex D encoder / Annex F
decoder flowcharts, the Annex F DC/AC conditioning-context
statistical model (DAC marker, L/U DC conditioning, Kx AC band
split), and the §G progressive models (DC refinement on the fixed
bin, AC successive-approximation correction/newly-significant
bins). Matching SOF9/SOF10 fixture encoders produce streams
carrying bit-identical quantized coefficients to the Huffman
encoders, so all four entropy modes must reconstruct identical
pixels — the pinned cross-mode invariant. Caveat: no reference
codec exists in this sandbox, so the state table transcription is
validated by self-consistency (encode→decode roundtrip + cross-mode
pixel identity + near-entropy coding efficiency), not by interop
against libjpeg streams.

Lossless (SOF3) is implemented too: Annex H spatial DPCM over all
seven predictors, exact by construction. 12-bit, hierarchical, and
arithmetic-lossless modes raise NotImplementedError — that remains
the PIL/libjpeg seam.

Format reference: ITU-T T.81 (public spec); tables from its Annexes
D (arithmetic coding), F (conditioning model), and K (quant/Huffman).
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
    mean_luma). Handles baseline sequential (SOF0/1), progressive
    (SOF2) — spectral selection, successive approximation, EOB runs,
    restart markers — arithmetic-coded (SOF9 sequential, SOF10
    progressive), lossless (SOF3 DPCM), and 12-bit extended
    sequential/progressive streams. Raises NotImplementedError for
    hierarchical/12-bit-arithmetic/arithmetic-lossless streams (the
    libjpeg seam); ValueError on malformed data."""
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
    arith = False
    dc_cond, ac_cond = {}, {}  # DAC conditioning: (L, U) / Kx per table
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
                tab = np.empty(64)
                if pq == 0:
                    for i in range(64):
                        tab[_ZIGZAG[i]] = seg[p + i]
                    p += 64
                else:  # Pq=1: 16-bit entries (12-bit precision streams)
                    vals = struct.unpack_from(">64H", seg, p)
                    for i in range(64):
                        tab[_ZIGZAG[i]] = vals[i]
                    p += 128
                qtabs[tq] = tab.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # SOF0/1 baseline, SOF2 progressive, SOF9 sequential
            # arithmetic, SOF10 progressive arithmetic
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            precision, height, width, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if precision not in (8, 12):
                raise NotImplementedError(f"{precision}-bit JPEG")
            if precision == 12 and arith:
                raise NotImplementedError(
                    "12-bit arithmetic JPEG stays a seam"
                )
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
        elif marker == 0xC3:  # SOF3 lossless: own DPCM pipeline
            return decode_lossless_luma(payload)
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "hierarchical/arithmetic-lossless JPEG needs a real "
                "codec library at this seam"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0xF
                val = seg[p + 1]
                if tc == 0:
                    dc_cond[tb] = (val & 0xF, val >> 4)  # (L, U)
                else:
                    ac_cond[tb] = val  # Kx
                p += 2
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
            if arith:
                consumed = _run_scan_arith(
                    payload[nxt:], scan_comps, ss, se, a >> 4, a & 0xF,
                    progressive, comps, coefs, grids, dc_cond, ac_cond,
                    restart_interval,
                )
            else:
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
    shift = float(1 << (precision - 1))  # 128 (8-bit) / 2048 (12-bit)
    px = np.einsum("ux,nuv,vy->nxy", _C, blocks, _C) + shift
    luma = (
        px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    )
    visible = np.clip(luma[:height, :width], 0, (1 << precision) - 1)
    if precision != 8:
        # the metadata API is 8-bit: scale down (uint8 grid contract);
        # re-clip because 4095/16 rounds up past 255
        visible = np.clip(visible / float(1 << (precision - 8)), 0, 255)
    return width, height, np.round(visible).astype(np.uint8)


# ---------------------------------------------------------------------------
# arithmetic entropy coding (sequential DCT, SOF9) — T.81 Annexes D/F
# ---------------------------------------------------------------------------
#
# Probability-estimation state machine, transcribed from ITU-T T.81
# Table D.3: (Qe, Next_Index_LPS, Next_Index_MPS, Switch_MPS).  Rows
# 0-13 are the fast-attack startup chain; switch rows flip the MPS
# sense on an LPS renormalization.  Index 113 is the non-adaptive
# "fixed" bin (Qe ~ 0.5) the AC sign decision uses — it never leaves
# state 113, so sign bits cost ~1 bit each, uncoded in effect.

_ARITH_RAW = [
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
    # index 113: the fixed, never-adapting ~0.5 bin for AC signs
    (0x5A1D, 113, 113, 0),
]

# packed per state: (Qe, nl, nm) where nl carries the switch flag in
# bit 7 so "next = (sv & 0x80) ^ nl" both advances the state index
# and flips the MPS bit on a switch row in one XOR.
_ARITH_TAB = [(qe, (sw << 7) | nlps, nmps) for qe, nlps, nmps, sw in _ARITH_RAW]

_FIXED_BIN_STATE = 113


class _ArithEnc:
    """QM arithmetic encoder (T.81 Annex D register conventions):
    16-bit interval register A, code register C with 3 spacer bits
    (output byte at C>>19), CT=11 countdown, carry resolved over
    lazily-buffered output with stacked-0xFF accounting, 0xFF bytes
    followed by a stuffed 0x00."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1  # pending output byte; -1 = none yet
        self.sc = 0  # run of buffered 0xFF bytes (may still carry)
        self.zc = 0  # run of buffered 0x00 bytes (dropped if trailing)
        self.out = bytearray()

    # -- byte plumbing ----------------------------------------------
    def _flush_zeros(self):
        while self.zc:
            self.out.append(0x00)
            self.zc -= 1

    def _emit_carry(self):
        """A carry rippled out of C: buffered byte +1, every stacked
        0xFF becomes 0x00."""
        if self.buffer >= 0:
            self._flush_zeros()
            self.out.append(self.buffer + 1)
            if self.buffer + 1 == 0xFF:
                self.out.append(0x00)  # bit stuffing
        self.zc += self.sc
        self.sc = 0

    def _emit_settled(self):
        """No carry possible any more for buffer + stacked 0xFFs."""
        if self.buffer == 0:
            self.zc += 1
        elif self.buffer >= 0:
            self._flush_zeros()
            self.out.append(self.buffer)
        if self.sc:
            self._flush_zeros()
            while self.sc:
                self.out.append(0xFF)
                self.out.append(0x00)
                self.sc -= 1

    def _byte_out(self):
        t = self.c >> 19
        if t > 0xFF:
            self._emit_carry()
            # spacer bits guarantee t & 0xFF cannot be 0xFF here
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.sc += 1
        else:
            self._emit_settled()
            self.buffer = t
        self.c &= 0x7FFFF
        self.ct = 8

    def _renorm(self):
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byte_out()

    # -- coding -----------------------------------------------------
    def encode(self, bins, i, bit):
        sv = bins[i]
        qe, nl, nm = _ARITH_TAB[sv & 0x7F]
        self.a -= qe
        if bit != (sv >> 7):
            # LPS: takes the top of the interval unless the MPS
            # subinterval shrank below Qe (conditional exchange)
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            bins[i] = (sv & 0x80) ^ nl
        else:
            if self.a >= 0x8000:
                return  # no renorm -> no estimation update
            if self.a < qe:
                self.c += self.a
                self.a = qe
            bins[i] = (sv & 0x80) ^ nm
        self._renorm()

    def flush(self) -> bytes:
        """T.81 D.1.8 termination: pick the code-interval value with
        the most trailing zeros, push out the remaining bytes."""
        t = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:
            self._emit_carry()
        else:
            self._emit_settled()
        if self.c & 0x7FFF800:
            self._flush_zeros()
            b = (self.c >> 19) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
        return bytes(self.out)


class _ArithDec:
    """QM arithmetic decoder (T.81 Annex F): C accumulates raw data
    bytes and is compared against A<<CT, so renormalization never
    shifts C — only the alignment counter moves. Hitting a marker
    (0xFF + non-stuffing byte) switches to feeding zero bytes, per
    the spec's convention for the end of the entropy segment; the
    marker itself is left unconsumed at ``pos``."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.at_marker = False
        self.c = 0
        self.a = 0
        self.ct = -16  # forces the two-byte INITDEC fill

    def _byte(self):
        if self.at_marker:
            return 0
        d, n = self.data, len(self.data)
        if self.pos >= n:
            self.at_marker = True
            return 0
        b = d[self.pos]
        self.pos += 1
        if b != 0xFF:
            return b
        # swallow fill 0xFFs, then classify
        while self.pos < n and d[self.pos] == 0xFF:
            self.pos += 1
        if self.pos < n and d[self.pos] == 0x00:
            self.pos += 1  # stuffed zero: data byte 0xFF
            return 0xFF
        # a real marker (or truncation): rewind onto the 0xFF
        self.pos -= 1
        self.at_marker = True
        return 0

    def decode(self, bins, i):
        # renormalize / feed (also performs INITDEC on first use)
        while self.a < 0x8000:
            self.ct -= 1
            if self.ct < 0:
                self.c = (self.c << 8) | self._byte()
                self.ct += 8
                if self.ct < 0:
                    self.ct += 1
                    if self.ct == 0:
                        self.a = 0x8000  # doubled below -> 0x10000
            self.a <<= 1
        sv = bins[i]
        qe, nl, nm = _ARITH_TAB[sv & 0x7F]
        self.a -= qe
        t = self.a << self.ct
        if self.c >= t:
            self.c -= t
            # upper subinterval: LPS, unless conditional exchange
            if self.a < qe:
                bins[i] = (sv & 0x80) ^ nm
            else:
                bins[i] = (sv & 0x80) ^ nl
                sv ^= 0x80
            self.a = qe
        elif self.a < 0x8000:
            if self.a < qe:
                bins[i] = (sv & 0x80) ^ nl
                sv ^= 0x80
            else:
                bins[i] = (sv & 0x80) ^ nm
        return sv >> 7


# -- Annex F statistical model: one 8x8 block ------------------------


def _arith_enc_dc_diff(enc, dc_bins, dc_ctx, dc_last, ci, L, U, value):
    """DC-difference model, encoder side (T.81 F.1.4.1, bins per
    Table F.4). ``value`` is the (point-transformed) DC for this
    block; ``dc_last`` tracks the same domain."""
    st = dc_ctx[ci]
    v = value - dc_last[ci]
    if v == 0:
        enc.encode(dc_bins, st, 0)
        dc_ctx[ci] = 0
        return
    dc_last[ci] = value
    enc.encode(dc_bins, st, 1)
    if v > 0:
        enc.encode(dc_bins, st + 1, 0)
        st += 2  # SP
        sign = 0
    else:
        v = -v
        enc.encode(dc_bins, st + 1, 1)
        st += 3  # SN
        sign = 1
    m = 0
    v1 = v - 1
    if v1:
        enc.encode(dc_bins, st, 1)
        m = 1
        st = 20  # X1
        v2 = v1
        while v2 >> 1:
            v2 >>= 1
            enc.encode(dc_bins, st, 1)
            m <<= 1
            st += 1
    enc.encode(dc_bins, st, 0)
    if m < ((1 << L) >> 1):
        dc_ctx[ci] = 0
    elif m > ((1 << U) >> 1):
        dc_ctx[ci] = 12 + 4 * sign
    else:
        dc_ctx[ci] = 4 + 4 * sign
    st += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        enc.encode(dc_bins, st, 1 if (v1 & mm) else 0)


def _arith_dec_dc_diff(dec, dc_bins, dc_ctx, dc_last, ci, L, U):
    """Decoder mirror of ``_arith_enc_dc_diff``: accumulates the
    decoded difference into ``dc_last[ci]``."""
    st = dc_ctx[ci]
    if not dec.decode(dc_bins, st):
        dc_ctx[ci] = 0
        return
    sign = dec.decode(dc_bins, st + 1)
    st += 2 + sign
    m = dec.decode(dc_bins, st)
    if m:
        st = 20  # X1
        while dec.decode(dc_bins, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("DC magnitude overflow")
            st += 1
    if m < ((1 << L) >> 1):
        dc_ctx[ci] = 0
    elif m > ((1 << U) >> 1):
        dc_ctx[ci] = 12 + 4 * sign
    else:
        dc_ctx[ci] = 4 + 4 * sign
    v = m
    st += 14
    while m >> 1:
        m >>= 1
        if dec.decode(dc_bins, st):
            v |= m
    v += 1
    dc_last[ci] += -v if sign else v


def _arith_enc_ac(enc, ac_bins, fixed, Kx, zz, ss, se, al):
    """AC coefficient model, encoder side (T.81 F.1.4.2 sequential /
    G.1.3.2 progressive-first; bins per Table F.5). Values are
    point-transformed by ``al`` (magnitude shift, sign kept)."""

    def tval(k):
        t = zz[k]
        a = abs(t) >> al
        return -a if t < 0 else a

    ke = 0
    for k in range(se, ss - 1, -1):
        if tval(k):
            ke = k
            break
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(ac_bins, st, 0)  # not end-of-band
        v = tval(k)
        while v == 0:
            enc.encode(ac_bins, st + 1, 0)
            st += 3
            k += 1
            v = tval(k)
        enc.encode(ac_bins, st + 1, 1)
        if v > 0:
            enc.encode(fixed, 0, 0)
        else:
            v = -v
            enc.encode(fixed, 0, 1)
        st += 2
        m = 0
        v1 = v - 1
        if v1:
            enc.encode(ac_bins, st, 1)
            m = 1
            v2 = v1
            if v2 >> 1:
                v2 >>= 1
                enc.encode(ac_bins, st, 1)
                m <<= 1
                st = 189 if k <= Kx else 217  # X2 low/high band
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(ac_bins, st, 1)
                    m <<= 1
                    st += 1
        enc.encode(ac_bins, st, 0)
        st += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            enc.encode(ac_bins, st, 1 if (v1 & mm) else 0)
        k += 1
    if ke < se:
        enc.encode(ac_bins, 3 * (k - 1), 1)  # end-of-band


def _arith_dec_ac(dec, ac_bins, fixed, Kx, blk, ss, se, al):
    """Decoder mirror of ``_arith_enc_ac``: stores values scaled
    back up by ``al``."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(ac_bins, st):
            break  # end-of-band
        while dec.decode(ac_bins, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("AC run overflow")
        sign = dec.decode(fixed, 0)
        st += 2
        m = dec.decode(ac_bins, st)
        if m:
            if dec.decode(ac_bins, st):
                m <<= 1
                st = 189 if k <= Kx else 217
                while dec.decode(ac_bins, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        while m >> 1:
            m >>= 1
            if dec.decode(ac_bins, st):
                v |= m
        v += 1
        blk[k] = (-v if sign else v) << al
        k += 1


def _arith_enc_ac_refine(enc, ac_bins, fixed, zz, ss, se, ah, al):
    """AC successive-approximation refinement, encoder side (T.81
    G.1.3.3, Figure G.10): correction bit (st+2) for
    previously-nonzero coefficients, newly-significant ones as a
    (st+1) decision + fixed-bin sign."""
    ke = ss - 1
    for k in range(se, ss - 1, -1):
        if abs(zz[k]) >> al:
            ke = k
            break
    kex = ss - 1
    for k in range(ke, ss - 1, -1):
        if abs(zz[k]) >> ah:
            kex = k
            break
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(ac_bins, st, 0)  # end-of-band decision
        while True:
            t = zz[k]
            a = abs(t) >> al
            if a:
                if a >> 1:  # previously nonzero: correction bit
                    enc.encode(ac_bins, st + 2, a & 1)
                else:  # newly significant
                    enc.encode(ac_bins, st + 1, 1)
                    enc.encode(fixed, 0, 1 if t < 0 else 0)
                break
            enc.encode(ac_bins, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if k <= se:
        enc.encode(ac_bins, 3 * (k - 1), 1)  # end-of-band


def _arith_dec_ac_refine(dec, ac_bins, fixed, blk, ss, se, al):
    """Decoder mirror of ``_arith_enc_ac_refine``."""
    p1 = 1 << al
    m1 = -p1
    kex = 0
    for k in range(se, 0, -1):
        if blk[k]:
            kex = k
            break
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(ac_bins, st):
            break  # end-of-band
        while True:
            if blk[k]:
                if dec.decode(ac_bins, st + 2):
                    blk[k] += p1 if blk[k] > 0 else m1
                break
            if dec.decode(ac_bins, st + 1):
                blk[k] = m1 if dec.decode(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("AC refine run overflow")
        k += 1


def _run_scan_arith(scan_data, scan_comps, ss, se, ah, al, progressive,
                    comps, coefs, grids, dc_cond, ac_cond,
                    restart_interval):
    """Arithmetic scan driver (sequential F.2.4 and progressive
    G.2): decode every MCU of one scan into the coefficient arrays;
    returns scan-data bytes consumed. Statistics areas, DC contexts,
    and the coder registers reset at every restart marker."""
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
    by_id = {cid: (h, v) for cid, h, v, _tq in comps}
    comp_index = {cid: idx for idx, (cid, *_rest) in enumerate(comps)}
    if len(scan_comps) == 1:
        cid0 = scan_comps[0][0]
        _by, _bx, nby, nbx = grids[cid0]
        units = nby * nbx
    else:
        mcux, mcuy = grids["__mcu__"]
        units = mcux * mcuy

    def fresh_stats():
        dc_stats = {td for _c, td, _ta in scan_comps}
        ac_stats = {ta for _c, _td, ta in scan_comps}
        return (
            {t: bytearray(64) for t in dc_stats},
            {t: bytearray(256) for t in ac_stats},
            bytearray([_FIXED_BIN_STATE]),
            [0] * len(comps),
            [0] * len(comps),
        )

    dec = _ArithDec(scan_data)
    dc_bins, ac_bins, fixed, dc_ctx, dc_last = fresh_stats()

    def _one(blk, cid, td, ta):
        ci = comp_index[cid]
        L, U = dc_cond.get(td, (0, 1))
        Kx = ac_cond.get(ta, 5)
        if not progressive:
            _arith_dec_dc_diff(dec, dc_bins[td], dc_ctx, dc_last, ci, L, U)
            blk[0] = dc_last[ci]
            _arith_dec_ac(dec, ac_bins[ta], fixed, Kx, blk, 1, 63, 0)
        elif ss == 0:
            if ah == 0:  # DC first
                _arith_dec_dc_diff(
                    dec, dc_bins[td], dc_ctx, dc_last, ci, L, U
                )
                blk[0] = dc_last[ci] << al
            elif dec.decode(fixed, 0):  # DC refinement: fixed bin
                blk[0] = int(blk[0]) | (1 << al)
        elif ah == 0:  # AC first
            _arith_dec_ac(dec, ac_bins[ta], fixed, Kx, blk, ss, se, al)
        else:  # AC refinement
            _arith_dec_ac_refine(dec, ac_bins[ta], fixed, blk, ss, se, al)

    for unit in range(units):
        if restart_interval and unit and unit % restart_interval == 0:
            p = dec.pos
            n = len(scan_data)
            while p + 1 < n and not (
                scan_data[p] == 0xFF and 0xD0 <= scan_data[p + 1] <= 0xD7
            ):
                p += 1
            if p + 1 >= n:
                raise ValueError("missing restart marker")
            dec = _ArithDec(scan_data, p + 2)
            dc_bins, ac_bins, fixed, dc_ctx, dc_last = fresh_stats()
        if len(scan_comps) == 1:
            cid, td, ta = scan_comps[0]
            byi, bxi = divmod(unit, nbx)
            _one(coefs[cid][byi, bxi], cid, td, ta)
        else:
            my, mx = divmod(unit, mcux)
            for cid, td, ta in scan_comps:
                ch, cv = by_id[cid]
                for v in range(cv):
                    for hblk in range(ch):
                        _one(coefs[cid][my * cv + v, mx * ch + hblk],
                             cid, td, ta)
    return dec.pos


# -- SOF9/SOF10 fixture encoders -------------------------------------

_FLAT128_ZZ = [0] * 64  # an all-128 block quantizes to all-zero


def encode_gray_arith(pixels: np.ndarray, restart_interval: int = 0,
                      n_components: int = 1) -> bytes:
    """Encode an 8-bit grayscale array as a sequential
    arithmetic-coded JPEG (SOF9). Carries bit-identical quantized
    coefficients to ``encode_gray``/``encode_gray_progressive`` via
    the shared ``_quant_zz_blocks``. ``n_components=3`` emits an
    interleaved stream whose 2nd/3rd components are flat 128 planes
    (1x1 sampling), exercising the multi-component MCU loop and
    per-component DC conditioning contexts; the luma plane is
    unchanged. ``restart_interval`` (in MCUs) emits DRI + RSTn with a
    full coder/statistics reset per T.81 F.1.4.4."""
    h, w = pixels.shape
    blocks = _quant_zz_blocks(pixels)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(_Q50_ZZ[i]) for i in range(64)
    )
    # SOF9: 8-bit sequential arithmetic
    nc = n_components
    out += (
        b"\xff\xc9"
        + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
        + b"".join(bytes([cid, 0x11, 0]) for cid in range(1, nc + 1))
    )
    # DAC: DC conditioning 0 (L=0, U=1), AC conditioning 0 (Kx=5)
    out += b"\xff\xcc" + struct.pack(">H", 6) + bytes([0x00, 0x10, 0x10, 5])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += (
        b"\xff\xda"
        + struct.pack(">HB", 6 + 2 * nc, nc)
        + b"".join(bytes([cid, 0x00]) for cid in range(1, nc + 1))
        + bytes([0, 63, 0])
    )

    def fresh():
        return (
            _ArithEnc(),
            bytearray(64),
            bytearray(256),
            bytearray([_FIXED_BIN_STATE]),
            [0] * nc,
            [0] * nc,
        )

    enc, dc_bins, ac_bins, fixed, dc_ctx, dc_last = fresh()
    rst = 0
    for unit, zz in enumerate(blocks):
        if restart_interval and unit and unit % restart_interval == 0:
            out += enc.flush()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            enc, dc_bins, ac_bins, fixed, dc_ctx, dc_last = fresh()
        for ci in range(nc):
            czz = zz if ci == 0 else _FLAT128_ZZ
            _arith_enc_dc_diff(
                enc, dc_bins, dc_ctx, dc_last, ci, 0, 1, czz[0]
            )
            _arith_enc_ac(enc, ac_bins, fixed, 5, czz, 1, 63, 0)
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_gray_arith_progressive(pixels: np.ndarray) -> bytes:
    """Encode an 8-bit grayscale array as a progressive
    arithmetic-coded JPEG (SOF10): the same scan script as the
    progressive Huffman encoder — DC first (Al=1), DC refine, AC
    first over bands (1,5)/(6,63) at Al=1, AC refine at Al=0 — with
    every scan arithmetic-coded under fresh statistics (T.81 G.1.3).
    Carries bit-identical quantized coefficients to the other three
    encoders."""
    h, w = pixels.shape
    blocks = _quant_zz_blocks(pixels)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(_Q50_ZZ[i]) for i in range(64)
    )
    # SOF10: 8-bit progressive arithmetic, 1 component
    out += (
        b"\xff\xca"
        + struct.pack(">HBHHB", 11, 8, h, w, 1)
        + bytes([1, 0x11, 0])
    )
    out += b"\xff\xcc" + struct.pack(">H", 6) + bytes([0x00, 0x10, 0x10, 5])

    def sos(ss, se, ah, al):
        return (
            b"\xff\xda"
            + struct.pack(">HB", 8, 1)
            + bytes([1, 0x00, ss, se, (ah << 4) | al])
        )

    def fresh():
        return (
            _ArithEnc(),
            bytearray(64),
            bytearray(256),
            bytearray([_FIXED_BIN_STATE]),
            [0],
            [0],
        )

    # DC first, Al=1 (arithmetic shift per G.1.2.1)
    enc, dc_bins, _ac, fixed, dc_ctx, dc_last = fresh()
    for zz in blocks:
        _arith_enc_dc_diff(enc, dc_bins, dc_ctx, dc_last, 0, 0, 1,
                           zz[0] >> 1)
    out += sos(0, 0, 0, 1) + enc.flush()

    # DC refine: one fixed-bin decision per block
    enc, _dc, _ac, fixed, _ctx, _last = fresh()
    for zz in blocks:
        enc.encode(fixed, 0, zz[0] & 1)
    out += sos(0, 0, 1, 0) + enc.flush()

    bands = ((1, 5), (6, 63))
    for ss, se in bands:
        enc, _dc, ac_bins, fixed, _ctx, _last = fresh()
        for zz in blocks:
            _arith_enc_ac(enc, ac_bins, fixed, 5, zz, ss, se, 1)
        out += sos(ss, se, 0, 1) + enc.flush()
    for ss, se in bands:
        enc, _dc, ac_bins, fixed, _ctx, _last = fresh()
        for zz in blocks:
            _arith_enc_ac_refine(enc, ac_bins, fixed, zz, ss, se, 1, 0)
        out += sos(ss, se, 1, 0) + enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# lossless JPEG (SOF3) — T.81 Annex H spatial DPCM
# ---------------------------------------------------------------------------
#
# Lossless mode codes sample differences against one of seven spatial
# predictors (selected by the scan header's Ss field), entropy-coded
# with DC-style Huffman difference categories (SSSS 0..16, no
# quantization, no DCT). Differences are taken modulo 2^16 (H.1.2.1),
# so reconstruction is exact for 2..16-bit precision; this decoder
# handles the 8-bit grayscale/interleaved case the fixture encoder
# emits and any single-component 8-bit stream generally.


def _lossless_predict(samples, x, y, w, pred, default):
    """T.81 Table H.1 predictors over the reconstructed plane."""
    a = samples[y][x - 1] if x else None  # left
    b = samples[y - 1][x] if y else None  # above
    c = samples[y - 1][x - 1] if x and y else None  # above-left
    if y == 0:
        return default if x == 0 else a  # first row: P1 semantics
    if x == 0:
        return b  # first column: P2 semantics
    if pred == 1:
        return a
    if pred == 2:
        return b
    if pred == 3:
        return c
    if pred == 4:
        return a + b - c
    if pred == 5:
        return a + ((b - c) >> 1)
    if pred == 6:
        return b + ((a - c) >> 1)
    if pred == 7:
        return (a + b) >> 1
    raise ValueError("bad lossless predictor")


def _run_scan_lossless(scan_data, scan_comps, pred, al, comps, planes,
                       huff_dc, restart_interval, width, height):
    """Decode one lossless scan (single-component or interleaved
    1x1-sampled) into the per-component sample planes; returns bytes
    consumed."""
    reader = _BitReader(scan_data)
    default = 1 << (7 - al)  # 8-bit precision
    if len(scan_comps) == 1:
        w = width
        rows = height
    else:
        w = width
        rows = height
        for cid, ch, cv, _tq in comps:
            if ch != 1 or cv != 1:
                raise NotImplementedError(
                    "subsampled lossless scans need a real codec"
                )
    if restart_interval:
        # H.2.4 resets the prediction to the default at each RSTn;
        # no fixture needs it — declare the seam instead of silently
        # mispredicting a real-world restart stream
        raise NotImplementedError(
            "restart markers in lossless scans are not decoded here"
        )
    for y in range(rows):
        for x in range(w):
            for cid, td, _ta in scan_comps:
                plane = planes[cid]
                ssss = _huff_decode(reader, huff_dc[td])
                if ssss == 16:
                    diff = 32768
                else:
                    diff = _extend(reader.receive(ssss), ssss)
                p = _lossless_predict(plane, x, y, w, pred, default)
                plane[y][x] = (p + diff) & 0xFFFF
    return reader.pos


def decode_lossless_luma(payload: bytes):
    """Decode a lossless (SOF3) JPEG's first component to an exact
    uint8 grid: returns (width, height, luma). ValueError on
    malformed streams; NotImplementedError for >8-bit precision or
    subsampled scans (the remaining libjpeg seam)."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    huff_dc = {}
    width = height = None
    comps = []
    restart_interval = 0
    planes = {}
    saw_scan = False
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:
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
        if marker == 0xC3:  # SOF3 lossless
            precision, height, width, nc = (
                seg[0], *struct.unpack_from(">HH", seg, 1), seg[5],
            )
            if precision != 8:
                raise NotImplementedError(">8-bit lossless JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
                planes[cid] = [[0] * width for _ in range(height)]
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                if tc == 0:
                    huff_dc[th] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg)
        elif marker == 0xDA:
            if width is None:
                raise ValueError("SOS before SOF3")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cs, tds >> 4, tds & 0xF))
            pred = seg[1 + 2 * ns]  # Ss = predictor selector
            al = seg[3 + 2 * ns] & 0xF  # point transform
            consumed = _run_scan_lossless(
                payload[nxt:], scan_comps, pred, al, comps, planes,
                huff_dc, restart_interval, width, height,
            )
            saw_scan = True
            pos = nxt + consumed
            continue
        pos = nxt
    if not saw_scan or width is None:
        raise ValueError("lossless JPEG missing SOS/SOF3")
    cid0 = comps[0][0]
    luma = np.array(planes[cid0], dtype=np.uint16)
    return width, height, (luma & 0xFF).astype(np.uint8)


def encode_gray_lossless(pixels: np.ndarray, predictor: int = 4) -> bytes:
    """Encode an 8-bit grayscale array as a lossless (SOF3) JPEG
    with the given predictor (1..7). Exact by construction — the
    decode must reproduce the input bit-for-bit."""
    h, w = pixels.shape
    px = pixels.astype(int)
    # lossless DC-style table needs categories up to 16: the Annex K
    # DC spec extended with one code per length 10..14 for SSSS
    # 12..16 (Kraft sum 1 - 2^-14, valid canonical table)
    bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0]
    vals = list(range(17))
    codes = _canonical_codes(bits, vals)

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xc3"
        + struct.pack(">HBHHB", 11, 8, h, w, 1)
        + bytes([1, 0x11, 0])
    )
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(vals))
        + b"\x00"
        + bytes(bits)
        + bytes(vals)
    )
    # SOS: Ss = predictor, Se = 0, Ah/Al = 0
    out += (
        b"\xff\xda"
        + struct.pack(">HB", 8, 1)
        + bytes([1, 0x00, predictor, 0, 0])
    )
    bw = _BitWriter()
    default = 1 << 7
    recon = [[0] * w for _ in range(h)]
    for y in range(h):
        for x in range(w):
            p = _lossless_predict(recon, x, y, w, predictor, default)
            diff = (int(px[y][x]) - p) & 0xFFFF
            if diff >= 0x8000:
                diff -= 0x10000  # back to signed for category coding
            if diff == -32768:
                ssss, amp = 16, 0
            else:
                ssss, amp = _magnitude(diff)
            code, length = codes[ssss]
            bw.write(code, length)
            if ssss and ssss != 16:
                bw.write(amp, ssss)
            recon[y][x] = int(px[y][x])
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# 12-bit extended sequential encoder (SOF1, for test fixtures)
# ---------------------------------------------------------------------------

# extended Huffman specs for 12-bit: DC categories 0..15 (one code per
# length 10..13 beyond the Annex K shape), AC symbols as a flat 8-bit
# canonical table over EOB, ZRL, and (run, size) for size 1..14
# (226 codes, Kraft 226/256 < 1).
_DC12_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0]
_DC12_VALS = list(range(16))
_AC12_VALS = sorted([0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 15)
])
_AC12_BITS = [0] * 16
_AC12_BITS[7] = len(_AC12_VALS)


def encode_gray12(pixels: np.ndarray) -> bytes:
    """Encode a 12-bit grayscale array (uint16, 0..4095) as an
    extended sequential JPEG (SOF1, precision 12, Pq=1 16-bit quant
    table). The fixture for the 12-bit decode path; a DC-only
    (constant) image survives quantization exactly, which the tests
    exploit for bit-exact assertions."""
    h, w = pixels.shape
    q = np.empty(64)
    for i, z in enumerate(_ZIGZAG):
        q[z] = _Q50_ZZ[i]
    qtab = q.reshape(8, 8)
    dc_codes = _canonical_codes(_DC12_BITS, _DC12_VALS)
    ac_codes = _canonical_codes(_AC12_BITS, _AC12_VALS)

    out = bytearray(b"\xff\xd8")
    # DQT with Pq=1 (16-bit entries)
    out += (
        b"\xff\xdb"
        + struct.pack(">H", 2 + 1 + 128)
        + b"\x10"
        + b"".join(struct.pack(">H", int(_Q50_ZZ[i])) for i in range(64))
    )
    out += (
        b"\xff\xc1"
        + struct.pack(">HBHHB", 11, 12, h, w, 1)
        + bytes([1, 0x11, 0])
    )
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(_DC12_VALS))
        + b"\x00"
        + bytes(_DC12_BITS)
        + bytes(_DC12_VALS)
    )
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(_AC12_VALS))
        + b"\x10"
        + bytes(_AC12_BITS)
        + bytes(_AC12_VALS)
    )
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])

    bw = _BitWriter()
    prev_dc = 0
    bh, bwn = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(
        pixels.astype(np.float64),
        ((0, bh * 8 - h), (0, bwn * 8 - w)),
        mode="edge",
    )
    for by in range(bh):
        for bx in range(bwn):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 2048.0
            quant = np.round((_C @ block @ _C.T) / qtab).astype(int)
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
                        code, length = ac_codes[0xF0]
                        bw.write(code, length)
                        run = 0
                    continue
                size, bits = _magnitude(zz[i])
                code, length = ac_codes[(run << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
            if last_nz < 63:
                code, length = ac_codes[0x00]
                bw.write(code, length)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)
