"""MP4 (ISO BMFF) demuxer — pure stdlib, no external libraries.

Parses the box tree of an MP4/ISO base-media file and returns the
first video track's sample table: per-sample byte offsets, sizes,
durations, and keyframe flags, derived from stts/stsz/stsc/stco(co64)
/stss exactly as ISO/IEC 14496-12 defines them. Fragmented files
(fMP4 — the DASH/CMAF shape most web video actually ships in) are
demuxed from moof/traf/trun run tables with trex/tfhd default
inheritance, per the same spec. This is the demux half of frame
sampling — a trainer's video pipeline uses it to seek stride-th
frames without reading the rest of the file. DECODING the sample
payloads (H.264 etc.) remains the ffmpeg/pyav seam.

Minimal writers (``build_minimal_mp4``, ``build_fragmented_mp4``)
exist so tests can produce real box structures with known sample
tables — no mux library exists in this sandbox to make fixtures with.
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


def _fullf(data, pos):
    """FullBox header with flags: (version, flags, body pos)."""
    version = data[pos]
    flags = int.from_bytes(bytes(data[pos + 1 : pos + 4]), "big")
    return version, flags, pos + 4


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
    table. Fragmented (moof-based) files route to the trun walker;
    raises ValueError on malformed files."""
    data = memoryview(payload)
    end = len(payload)
    if _find(data, 0, end, b"moof") is not None:
        return _demux_fragmented(data, end)
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


# ---------------------------------------------------------------------------
# fragmented MP4 (fMP4 / DASH / CMAF)
# ---------------------------------------------------------------------------
#
# In a fragmented file the moov carries no samples — only the track
# header and mvex/trex per-track DEFAULTS; the samples live in
# moof→traf→trun run tables, one moof per fragment, with a three-level
# default inheritance (trun per-sample field → tfhd default → trex
# default) and byte offsets relative to a base (explicit
# base_data_offset, or the moof's own first byte when
# default-base-is-moof is set). Keyframe-ness is the inverse of the
# sample_is_non_sync_sample flag bit (ISO/IEC 14496-12 §8.8.3).

_TFHD_BASE_OFFSET = 0x000001
_TFHD_SAMPLE_DESC = 0x000002
_TFHD_DEFAULT_DUR = 0x000008
_TFHD_DEFAULT_SIZE = 0x000010
_TFHD_DEFAULT_FLAGS = 0x000020
_TFHD_BASE_IS_MOOF = 0x020000
_TRUN_DATA_OFFSET = 0x000001
_TRUN_FIRST_FLAGS = 0x000004
_TRUN_SAMPLE_DUR = 0x000100
_TRUN_SAMPLE_SIZE = 0x000200
_TRUN_SAMPLE_FLAGS = 0x000400
_TRUN_SAMPLE_CTO = 0x000800
_NON_SYNC_BIT = 0x00010000


def _video_track_header(data, moov) -> Tuple[int, int]:
    """(track_id, timescale) of the first ``vide`` trak."""
    for btype, t0, t1 in _iter_boxes(data, *moov):
        if btype != b"trak":
            continue
        mdia = _find(data, t0, t1, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or bytes(data[hdlr[0] + 8 : hdlr[0] + 12]) != b"vide":
            continue
        tkhd = _find(data, t0, t1, b"tkhd")
        if tkhd is None:
            raise ValueError("video trak missing tkhd")
        version, p = _full(data, tkhd[0])
        track_id = struct.unpack_from(
            ">I", data, p + (16 if version == 1 else 8)
        )[0]
        mdhd = _find(data, *mdia, b"mdhd")
        version, p = _full(data, mdhd[0])
        timescale = struct.unpack_from(
            ">I", data, p + (16 if version == 1 else 8)
        )[0]
        return track_id, timescale
    raise ValueError("no video track")


def _trex_defaults(data, moov, track_id) -> Tuple[int, int, int]:
    """(default_duration, default_size, default_flags) from mvex/trex,
    zeros if absent (tfhd/trun must then supply every field)."""
    mvex = _find(data, *moov, b"mvex")
    if mvex is not None:
        for btype, b0, b1 in _iter_boxes(data, *mvex):
            if btype != b"trex":
                continue
            _, p = _full(data, b0)
            tid, _dsi, d_dur, d_size, d_flags = struct.unpack_from(
                ">IIIII", data, p
            )
            if tid == track_id:
                return d_dur, d_size, d_flags
    return 0, 0, 0


def _demux_fragmented(data, end) -> VideoTrack:
    moov = _find(data, 0, end, b"moov")
    if moov is None:
        raise ValueError("no moov box")
    track_id, timescale = _video_track_header(data, moov)
    trex_dur, trex_size, trex_flags = _trex_defaults(data, moov, track_id)

    offsets: List[int] = []
    sizes: List[int] = []
    durations: List[int] = []
    keyframes: List[bool] = []

    # top-level walk keeping each box's own start (the default base)
    pos = 0
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = bytes(data[pos + 4 : pos + 8])
        header = 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"malformed box {btype!r} at {pos}")
        if btype == b"moof":
            _walk_moof(
                data, pos, pos + header, pos + size, track_id,
                (trex_dur, trex_size, trex_flags),
                offsets, sizes, durations, keyframes,
            )
        pos += size

    if not sizes:
        raise ValueError("no video samples in any fragment")
    return VideoTrack(timescale, offsets, sizes, durations, keyframes)


def _walk_moof(data, moof_pos, body0, body1, track_id, trex,
               offsets, sizes, durations, keyframes) -> None:
    for btype, t0, t1 in _iter_boxes(data, body0, body1):
        if btype != b"traf":
            continue
        tfhd = None
        truns = []
        for bt, b0, b1 in _iter_boxes(data, t0, t1):
            if bt == b"tfhd":
                tfhd = b0
            elif bt == b"trun":
                truns.append(b0)
        if tfhd is None:
            raise ValueError("traf missing tfhd")
        _, fl, p = _fullf(data, tfhd)
        (tid,) = struct.unpack_from(">I", data, p)
        p += 4
        if tid != track_id:
            continue
        if fl & _TFHD_BASE_OFFSET:
            (base,) = struct.unpack_from(">Q", data, p)
            p += 8
        else:
            # default-base-is-moof, and the spec's legacy fallback for
            # the first trun, both anchor at the moof's first byte
            base = moof_pos
        if fl & _TFHD_SAMPLE_DESC:
            p += 4
        d_dur, d_size, d_flags = trex
        if fl & _TFHD_DEFAULT_DUR:
            (d_dur,) = struct.unpack_from(">I", data, p)
            p += 4
        if fl & _TFHD_DEFAULT_SIZE:
            (d_size,) = struct.unpack_from(">I", data, p)
            p += 4
        if fl & _TFHD_DEFAULT_FLAGS:
            (d_flags,) = struct.unpack_from(">I", data, p)
            p += 4

        off = base  # threaded across truns lacking a data_offset
        for trun in truns:
            _, tf, q = _fullf(data, trun)
            (n,) = struct.unpack_from(">I", data, q)
            q += 4
            if tf & _TRUN_DATA_OFFSET:
                (doff,) = struct.unpack_from(">i", data, q)
                q += 4
                off = base + doff
            first_flags = None
            if tf & _TRUN_FIRST_FLAGS:
                (first_flags,) = struct.unpack_from(">I", data, q)
                q += 4
            for i in range(n):
                dur, sz, sfl = d_dur, d_size, d_flags
                if tf & _TRUN_SAMPLE_DUR:
                    (dur,) = struct.unpack_from(">I", data, q)
                    q += 4
                if tf & _TRUN_SAMPLE_SIZE:
                    (sz,) = struct.unpack_from(">I", data, q)
                    q += 4
                if tf & _TRUN_SAMPLE_FLAGS:
                    (sfl,) = struct.unpack_from(">I", data, q)
                    q += 4
                if tf & _TRUN_SAMPLE_CTO:
                    q += 4
                if i == 0 and first_flags is not None:
                    sfl = first_flags
                if sz == 0:
                    raise ValueError("sample with no size (trun/tfhd/trex)")
                offsets.append(off)
                sizes.append(sz)
                durations.append(dur)
                keyframes.append(not (sfl & _NON_SYNC_BIT))
                off += sz


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


def build_fragmented_mp4(
    fragment_sizes: List[List[int]],
    timescale: int = 600,
    sample_delta: int = 25,
) -> bytes:
    """A real, spec-shaped fragmented MP4 (DASH/CMAF layout): ftyp +
    moov (tkhd/mdhd/hdlr + empty stbl + mvex/trex defaults) + one
    moof/mdat pair per fragment, tfhd with default-base-is-moof +
    per-fragment default duration, trun with data_offset +
    per-sample sizes + first-sample sync flags. Sample i's payload
    (numbered globally across fragments) is byte (i % 256) repeated
    sizes[i] times, so tests can verify demuxed offsets point at the
    right bytes. The first sample of every fragment is a keyframe;
    the rest carry the non-sync default from trex."""
    track_id = 1
    n_total = sum(len(f) for f in fragment_sizes)

    tkhd = _box(
        b"tkhd",
        struct.pack(">I", 7)  # version 0, flags enabled|in-movie|in-preview
        + struct.pack(">III", 0, 0, track_id)
        + b"\x00" * 68,
    )
    mdhd = _box(
        b"mdhd",
        struct.pack(">I", 0)
        + struct.pack(">IIII", 0, 0, timescale, n_total * sample_delta)
        + b"\x00" * 4,
    )
    hdlr = _box(
        b"hdlr", struct.pack(">I", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 12
    )
    # empty sample tables — all samples live in fragments
    stbl = _box(
        b"stbl",
        _box(b"stts", struct.pack(">II", 0, 0))
        + _box(b"stsc", struct.pack(">II", 0, 0))
        + _box(b"stsz", struct.pack(">III", 0, 0, 0))
        + _box(b"stco", struct.pack(">II", 0, 0)),
    )
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    trex = _box(
        b"trex",
        struct.pack(">I", 0)
        + struct.pack(
            ">IIIII", track_id, 1, sample_delta, 0, _NON_SYNC_BIT
        ),
    )
    mvhd = _box(b"mvhd", struct.pack(">I", 0) + b"\x00" * 96)
    moov = _box(b"moov", mvhd + trak + _box(b"mvex", trex))

    out = bytearray(
        _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso5")
        + moov
    )
    sample_no = 0
    for seq, frag in enumerate(fragment_sizes, start=1):
        n = len(frag)
        payload = b"".join(
            bytes([(sample_no + i) % 256]) * s for i, s in enumerate(frag)
        )
        sample_no += n
        mfhd = _box(b"mfhd", struct.pack(">I", 0) + struct.pack(">I", seq))
        tfhd = _box(
            b"tfhd",
            struct.pack(">I", _TFHD_BASE_IS_MOOF | _TFHD_DEFAULT_DUR)
            + struct.pack(">II", track_id, sample_delta),
        )

        def _trun(data_offset: int) -> bytes:
            return _box(
                b"trun",
                struct.pack(
                    ">I",
                    _TRUN_DATA_OFFSET
                    | _TRUN_FIRST_FLAGS
                    | _TRUN_SAMPLE_SIZE,
                )
                + struct.pack(">I", n)
                + struct.pack(">i", data_offset)
                + struct.pack(">I", 0)  # first sample: sync
                + struct.pack(f">{n}I", *frag),
            )

        # two-pass: trun length is offset-independent, so measure then
        # rebuild with the real moof-relative payload offset
        moof_len = len(_box(b"moof", mfhd + _box(b"traf", tfhd + _trun(0))))
        moof = _box(
            b"moof", mfhd + _box(b"traf", tfhd + _trun(moof_len + 8))
        )
        out += moof + _box(b"mdat", payload)
    return bytes(out)
