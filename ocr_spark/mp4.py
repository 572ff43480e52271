"""MP4 (ISO BMFF) demuxer — pure stdlib, no external libraries.

Parses the box tree of an MP4/ISO base-media file and returns the
first video track's sample table: per-sample byte offsets, sizes,
durations, and keyframe flags, derived from stts/stsz/stsc/stco(co64)
/stss exactly as ISO/IEC 14496-12 defines them. This is the demux
half of frame sampling — a trainer's video pipeline uses it to seek
stride-th frames without reading the rest of the file. DECODING the
sample payloads (H.264 etc.) remains the ffmpeg/pyav seam.

A minimal writer (``build_minimal_mp4``) exists so tests can produce
real box structures with known sample tables — no mux library exists
in this sandbox to make fixtures with.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Tuple


def _iter_boxes(data: memoryview, start: int, end: int) -> Iterator[tuple]:
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = bytes(data[pos + 4 : pos + 8])
        header = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            header = 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"malformed box {btype!r} at {pos}")
        yield btype, pos + header, pos + size
        pos += size


def _find(data, start, end, *path):
    """Descend a box path, returning (body_start, body_end) or None."""
    if not path:
        return start, end
    for btype, b0, b1 in _iter_boxes(data, start, end):
        if btype == path[0]:
            return _find(data, b0, b1, *path[1:])
    return None


def _full(data, pos):
    """Skip a FullBox's version/flags, returning (version, body pos)."""
    version = data[pos]
    return version, pos + 4


class VideoTrack:
    __slots__ = ("timescale", "n_samples", "offsets", "sizes", "durations",
                 "keyframes")

    def __init__(self, timescale, offsets, sizes, durations, keyframes):
        self.timescale = timescale
        self.n_samples = len(sizes)
        self.offsets = offsets
        self.sizes = sizes
        self.durations = durations
        self.keyframes = keyframes

    def duration_ms(self) -> float:
        return sum(self.durations) * 1000.0 / self.timescale


def demux_video(payload: bytes) -> VideoTrack:
    """Parse the first video (``hdlr`` type ``vide``) track's sample
    table. Raises ValueError on malformed files and
    NotImplementedError for fragmented MP4 (moof-based — a real
    streaming demuxer plugs in there)."""
    data = memoryview(payload)
    end = len(payload)
    if _find(data, 0, end, b"moof") is not None:
        raise NotImplementedError(
            "fragmented MP4 (moof) needs a real demuxer (ffmpeg/pyav) "
            "at this seam"
        )
    moov = _find(data, 0, end, b"moov")
    if moov is None:
        raise ValueError("no moov box")
    for btype, t0, t1 in _iter_boxes(data, *moov):
        if btype != b"trak":
            continue
        mdia = _find(data, t0, t1, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or bytes(data[hdlr[0] + 8 : hdlr[0] + 12]) != b"vide":
            continue
        mdhd = _find(data, *mdia, b"mdhd")
        version, p = _full(data, mdhd[0])
        timescale = struct.unpack_from(
            ">I", data, p + (16 if version == 1 else 8)
        )[0]
        stbl = _find(data, *mdia, b"minf", b"stbl")
        if stbl is None:
            raise ValueError("video trak missing stbl")
        boxes = {bt: (b0, b1) for bt, b0, b1 in _iter_boxes(data, *stbl)}

        # stsz: sample sizes
        _, p = _full(data, boxes[b"stsz"][0])
        fixed, count = struct.unpack_from(">II", data, p)
        sizes = (
            [fixed] * count
            if fixed
            else list(struct.unpack_from(f">{count}I", data, p + 8))
        )

        # stts: durations (run-length)
        _, p = _full(data, boxes[b"stts"][0])
        (n_ent,) = struct.unpack_from(">I", data, p)
        durations: List[int] = []
        for i in range(n_ent):
            cnt, delta = struct.unpack_from(">II", data, p + 4 + 8 * i)
            durations.extend([delta] * cnt)

        # stco / co64: chunk offsets
        if b"stco" in boxes:
            _, p = _full(data, boxes[b"stco"][0])
            (n_ch,) = struct.unpack_from(">I", data, p)
            chunk_offsets = list(struct.unpack_from(f">{n_ch}I", data, p + 4))
        else:
            _, p = _full(data, boxes[b"co64"][0])
            (n_ch,) = struct.unpack_from(">I", data, p)
            chunk_offsets = list(struct.unpack_from(f">{n_ch}Q", data, p + 4))

        # stsc: samples per chunk (first_chunk runs)
        _, p = _full(data, boxes[b"stsc"][0])
        (n_ent,) = struct.unpack_from(">I", data, p)
        stsc = [
            struct.unpack_from(">III", data, p + 4 + 12 * i)[:2]
            for i in range(n_ent)
        ]

        # per-sample byte offsets from chunk layout
        offsets: List[int] = []
        si = 0
        for ci, chunk_off in enumerate(chunk_offsets, start=1):
            per = 0
            for first, n_per in stsc:
                if first <= ci:
                    per = n_per
                else:
                    break
            off = chunk_off
            for _ in range(per):
                if si >= len(sizes):
                    break
                offsets.append(off)
                off += sizes[si]
                si += 1
        if si != len(sizes):
            raise ValueError("stsc/stsz sample count mismatch")

        # stss: keyframes (absent = all keyframes)
        if b"stss" in boxes:
            _, p = _full(data, boxes[b"stss"][0])
            (n_k,) = struct.unpack_from(">I", data, p)
            keys = set(struct.unpack_from(f">{n_k}I", data, p + 4))
            keyframes = [(i + 1) in keys for i in range(len(sizes))]
        else:
            keyframes = [True] * len(sizes)

        return VideoTrack(timescale, offsets, sizes, durations, keyframes)
    raise ValueError("no video track")


def sample_stride_frames(
    payload: bytes, stride: int = 4
) -> List[Tuple[int, int, int, bool]]:
    """Every ``stride``-th sample as (idx, byte_offset, size,
    is_keyframe) — the seek plan a frame-decoding stage consumes."""
    t = demux_video(payload)
    return [
        (i, t.offsets[i], t.sizes[i], t.keyframes[i])
        for i in range(0, t.n_samples, stride)
    ]


# ---------------------------------------------------------------------------
# minimal writer (test fixtures only)
# ---------------------------------------------------------------------------


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def build_minimal_mp4(
    sample_sizes: List[int],
    timescale: int = 600,
    sample_delta: int = 25,
    keyframe_every: int = 4,
    samples_per_chunk: int = 3,
) -> bytes:
    """A real, spec-shaped MP4: ftyp + mdat (concatenated fake sample
    payloads) + moov with a consistent stbl. Sample i's payload is
    byte (i % 256) repeated sizes[i] times, so tests can verify the
    demuxed offsets point at the right bytes."""
    n = len(sample_sizes)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    payload = b"".join(
        bytes([i % 256]) * s for i, s in enumerate(sample_sizes)
    )
    mdat_header_at = len(ftyp)
    mdat = _box(b"mdat", payload)
    first_sample_off = mdat_header_at + 8

    # chunks of samples_per_chunk samples
    chunk_offsets = []
    off = first_sample_off
    for i in range(0, n, samples_per_chunk):
        chunk_offsets.append(off)
        off += sum(sample_sizes[i : i + samples_per_chunk])

    stts = _box(
        b"stts",
        struct.pack(">IIII", 0, 1, n, sample_delta),
    )
    stsz = _box(
        b"stsz",
        struct.pack(">III", 0, 0, n)
        + struct.pack(f">{n}I", *sample_sizes),
    )
    stsc = _box(
        b"stsc", struct.pack(">IIIII", 0, 1, 1, samples_per_chunk, 1)
    )
    stco = _box(
        b"stco",
        struct.pack(">II", 0, len(chunk_offsets))
        + struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets),
    )
    keys = list(range(1, n + 1, keyframe_every))
    stss = _box(
        b"stss",
        struct.pack(">II", 0, len(keys)) + struct.pack(f">{len(keys)}I", *keys),
    )
    stbl = _box(b"stbl", stts + stsz + stsc + stco + stss)
    minf = _box(b"minf", stbl)
    hdlr = _box(b"hdlr", struct.pack(">I", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 12)
    mdhd = _box(
        b"mdhd",
        struct.pack(">I", 0)
        + struct.pack(">IIII", 0, 0, timescale, n * sample_delta)
        + b"\x00" * 4,
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", mdia)
    mvhd = _box(b"mvhd", struct.pack(">I", 0) + b"\x00" * 96)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
