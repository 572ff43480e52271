"""Multimodal columns: image/audio payloads as opaque BINARY columns
with typed metadata, decoded/feature-extracted in Arrow-batched UDFs.

The reference's only "multimodal" handling is shipping image bytes to
an external vision model (page_processor.py:883-989).  A training-data
pipeline instead needs the *plumbing*: binary media columns flowing
through scans/shuffles untouched, with decode / feature-extract /
resize running as vectorized batch UDFs near the end of the plan.

Real formats: PNG (FULL spec surface — every legal color-type/depth
combination incl. palette/alpha/16-bit/sub-byte and Adam7 interlace;
zlib + manual chunk/filter parsing, stdlib+numpy only), WAV (PCM at
every container width — 8/16/24/32-bit — via the stdlib ``wave``
parser), and JPEG — baseline sequential, progressive (SOF2,
spectral selection + successive approximation), arithmetic-coded
(SOF9 sequential + SOF10 progressive, T.81 QM-coder), lossless
(SOF3, Annex H DPCM, all 7 predictors), AND 12-bit extended
sequential via the numpy + stdlib codec
in ``ocr_spark/jpeg.py`` — are genuinely decoded; MP4 demux covers
both classic (stbl) and fragmented (moof/traf/trun) layouts
(``ocr_spark/mp4.py``); the H.264 bitstream layer (Annex B + AVCC)
parses NAL/SPS/PPS/slices and decodes I_PCM losslessly
(``ocr_spark/h264.py``). Hierarchical/arithmetic-lossless JPEG and
coded-residual H.264 decode remain clearly marked
``NotImplementedError`` seams (PIL / ffmpeg plug in there in
production).  Everything Spark-side — schema,
Arrow batch shape, mapInPandas signatures, metadata struct, partition
behavior — is additionally tested against a deterministic fake format
whose decode output is closed-form SQL-predictable:

    FAKE1IMG | u32 width | u32 height | width*height pixel bytes

``fake_media_from_docs`` derives one fake image per document row with
a *closed-form* relationship between doc_id and the decoded features
(width = 16 + doc_id % 48, every pixel = (doc_id * 7) % 256), so the
decode UDF's output is oracle-checkable in plain SQL even though the
UDF genuinely parses bytes.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FAKE_IMG_MAGIC = b"FAKE1IMG"
FAKE_AUD_MAGIC = b"FAKE1AUD"
FAKE_VID_MAGIC = b"FAKE1VID"
# real-format magics we recognize but cannot decode in this container
_JPEG_MAGIC = b"\xff\xd8\xff"
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_WAV_MAGIC = b"RIFF"
_MP4_FTYP = b"ftyp"

MEDIA_SCHEMA = "doc_id bigint, kind string, payload binary"
DECODED_SCHEMA = (
    "doc_id bigint, kind string, width int, height int, n_pixels bigint, "
    "mean_luma double"
)
THUMB_SCHEMA = "doc_id bigint, width int, height int, payload binary"
AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples int, duration_ms double, "
    "mean_amp double"
)
FRAME_SCHEMA = "doc_id bigint, frame_idx int, mean_luma double"
DEMUX_SCHEMA = (
    "doc_id bigint, n_samples int, n_keyframes int, duration_ms double, "
    "total_bytes bigint"
)


def fake_image_bytes(doc_id: int) -> bytes:
    """Deterministic fake image: dimensions and pixel value are closed
    forms of doc_id (see module docstring) so decode output is
    SQL-predictable while the bytes still must actually be parsed."""
    width = 16 + doc_id % 48
    height = 16 + doc_id % 32
    pixel = (doc_id * 7) % 256
    return (
        FAKE_IMG_MAGIC
        + struct.pack("<II", width, height)
        + bytes([pixel]) * (width * height)
    )


# PNG channel counts per color type, and the bit depths the spec
# allows for each (RFC 2083 §6.1) — everything legal is decoded.
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}
# Adam7 interlace passes: (x0, y0, dx, dy)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_defilter(raw, src, h, rowbytes, bpp):
    """De-filter ``h`` scanlines of ``rowbytes`` each starting at
    ``raw[src]`` (all five filter types); returns (recon, new_src).

    The per-byte loop is driver-of-last-resort Python — fine for
    metadata extraction on thumbnails/test assets; a production image
    pipeline swaps this for PIL/libvips at the same seam."""
    if src + h * (rowbytes + 1) > len(raw):
        raise ValueError("truncated PNG pixel data")
    recon = bytearray(h * rowbytes)
    for y in range(h):
        f = raw[src]
        src += 1
        line = raw[src : src + rowbytes]
        src += rowbytes
        off = y * rowbytes
        for x in range(rowbytes):
            a = recon[off + x - bpp] if x >= bpp else 0
            b = recon[off - rowbytes + x] if y > 0 else 0
            c = recon[off - rowbytes + x - bpp] if (y > 0 and x >= bpp) else 0
            v = line[x]
            if f == 0:
                r = v
            elif f == 1:
                r = v + a
            elif f == 2:
                r = v + b
            elif f == 3:
                r = v + (a + b) // 2
            elif f == 4:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                r = v + pred
            else:
                raise ValueError(f"bad PNG filter type {f}")
            recon[off + x] = r & 0xFF
    return recon, src


def _png_unpack(recon, w, h, channels, depth):
    """(h, w, channels) int array of raw sample values from
    de-filtered scanline bytes (packed sub-byte depths, 8, or
    big-endian 16 per RFC 2083 §7.2)."""
    import numpy as np

    rowbytes = (w * channels * depth + 7) // 8
    rows = np.frombuffer(bytes(recon), np.uint8).reshape(h, rowbytes)
    if depth == 8:
        out = rows[:, : w * channels].astype(np.int64)
    elif depth == 16:
        out = (
            rows.astype(np.int64)
            .reshape(h, -1, 2)[:, : w * channels, :]
            .dot([256, 1])
        )
    else:  # 1/2/4-bit packed, MSB first
        per = 8 // depth
        shifts = (np.arange(per)[::-1] * depth).astype(np.uint8)
        vals = (rows[:, :, None] >> shifts) & ((1 << depth) - 1)
        out = vals.reshape(h, -1)[:, : w * channels].astype(np.int64)
    return out.reshape(h, w, channels)


def _png_luma(payload: bytes) -> tuple:
    """Pure stdlib+numpy PNG decode (RFC 2083), full spec surface:
    chunk walk, zlib inflate, scanline de-filter (all five filter
    types), every legal color-type/bit-depth combination — grayscale
    (0), truecolor (2), palette (3, via PLTE), gray+alpha (4), RGBA
    (6) at 1/2/4/8/16 bits — and both interlace methods (none and
    Adam7). Returns (width, height, luma) with ``luma`` the float
    pixel grid: ITU-R BT.601 (0.299 R + 0.587 G + 0.114 B) over
    samples scaled to the 8-bit range; alpha is ignored."""
    import zlib

    import numpy as np

    pos = len(_PNG_MAGIC)
    width = height = color_type = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, pos), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if (color_type not in _PNG_CHANNELS
                    or bit_depth not in _PNG_DEPTHS[color_type]
                    or interlace > 1):
                raise ValueError("illegal PNG color-type/depth/interlace")
        elif ctype == b"PLTE":
            if len(data) % 3:
                raise ValueError("bad PLTE length")
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    if color_type == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"bad PNG pixel data: {exc}") from None
    channels = _PNG_CHANNELS[color_type]
    bpp = max(1, channels * bit_depth // 8)

    def _rowbytes(w):
        return (w * channels * bit_depth + 7) // 8

    if interlace == 0:
        recon, src = _png_defilter(raw, 0, height, _rowbytes(width), bpp)
        if src != len(raw):
            raise ValueError("trailing PNG pixel data")
        img = _png_unpack(recon, width, height, channels, bit_depth)
    else:  # Adam7: seven independent filtered sub-images, scattered
        img = np.zeros((height, width, channels), np.int64)
        src = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            recon, src = _png_defilter(raw, src, ph, _rowbytes(pw), bpp)
            img[y0::dy, x0::dx] = _png_unpack(recon, pw, ph, channels, bit_depth)
        if src != len(raw):
            raise ValueError("trailing PNG pixel data")

    n = width * height
    if n == 0:
        return width, height, np.zeros((0, 0))
    if color_type == 3:
        idx = img[:, :, 0]
        if int(idx.max()) >= len(palette):
            raise ValueError("palette index out of range")
        luma = palette[idx].astype(np.float64).dot([0.299, 0.587, 0.114])
    else:
        scale = 255.0 / ((1 << bit_depth) - 1)
        if color_type in (0, 4):  # gray / gray+alpha: luma IS the sample
            luma = img[:, :, 0].astype(np.float64) * scale
        else:
            luma = (
                img[:, :, :3].astype(np.float64) * scale
            ).dot([0.299, 0.587, 0.114])
    return width, height, luma


def _png_decode(payload: bytes) -> tuple:
    """(width, height, n_pixels, mean_luma) — see ``_png_luma``."""
    width, height, luma = _png_luma(payload)
    n = width * height
    return width, height, n, (float(luma.mean()) if n else 0.0)


def decode_image(payload: bytes) -> tuple:
    """(width, height, n_pixels, mean_luma) for one payload.

    PNG and JPEG — baseline sequential AND progressive (SOF2) —
    decode for real (``_png_decode`` / ``jpeg.decode_luma``);
    hierarchical JPEG is the remaining seam where PIL/libvips
    would plug in on a production image.
    """
    if payload.startswith(_PNG_MAGIC):
        return _png_decode(payload)
    if payload.startswith(_JPEG_MAGIC):
        # baseline, progressive, arithmetic (SOF9/SOF10), lossless
        # (SOF3), and 12-bit JPEG decode for real (numpy + stdlib,
        # ocr_spark/jpeg.py); hierarchical/12-bit-arithmetic streams
        # raise NotImplementedError inside — the remaining PIL seam
        from ocr_spark.jpeg import decode_luma

        w, h, mean = decode_luma(payload)
        return w, h, w * h, mean
    if not payload.startswith(FAKE_IMG_MAGIC):
        raise ValueError("unknown media format")
    width, height = struct.unpack_from("<II", payload, len(FAKE_IMG_MAGIC))
    pixels = memoryview(payload)[len(FAKE_IMG_MAGIC) + 8 :]
    n = width * height
    if len(pixels) != n:
        raise ValueError("truncated fake image")
    mean = (sum(pixels) / n) if n else 0.0
    return width, height, n, mean


def thumbnail(payload: bytes, factor: int = 4) -> bytes:
    """Deterministic 'resize': stride-subsample every ``factor``-th
    pixel in both axes. Real formats (PNG, JPEG) are decoded to their
    luma grid first; the output is always the uncompressed FAKE1IMG
    container (the pipeline's internal thumbnail representation —
    width/height header + raw gray bytes)."""
    import numpy as np

    if payload.startswith(_PNG_MAGIC):
        w, h, luma = _png_luma(payload)
        grid = np.round(luma).astype(np.uint8)
    elif payload.startswith(_JPEG_MAGIC):
        from ocr_spark.jpeg import decode_luma_grid

        w, h, grid = decode_luma_grid(payload)
    else:
        w, h, _, _ = decode_image(payload)  # validates the container
        pixels = memoryview(payload)[len(FAKE_IMG_MAGIC) + 8 :]
        grid = np.frombuffer(pixels, np.uint8).reshape(h, w)
    tw, th = max(1, w // factor), max(1, h // factor)
    out = grid[: th * factor : factor, : tw * factor : factor]
    return (
        FAKE_IMG_MAGIC
        + struct.pack("<II", tw, th)
        + out.astype(np.uint8).tobytes()
    )


def fake_audio_bytes(doc_id: int) -> bytes:
    """Deterministic fake audio: ``FAKE1AUD | u32 rate | u32 n | n
    constant u8 samples``; rate/length/level are closed forms of
    doc_id so decode output is SQL-predictable."""
    rate = 8000 + (doc_id % 8) * 1000
    n = 400 + doc_id % 600
    sample = (doc_id * 11) % 256
    return (
        FAKE_AUD_MAGIC + struct.pack("<II", rate, n) + bytes([sample]) * n
    )


def _wav_decode(payload: bytes) -> tuple:
    """Real WAV decode through the stdlib ``wave`` parser: every PCM
    width the container allows — 8-bit (unsigned), 16/24/32-bit
    (signed LE) — any channel count. mean_amp is normalized to the
    8-bit scale (|s-128| for u8, |s|/2^(8(w-1)) for wider) so the
    feature is commensurate with the fake format's. Compressed
    encodings (the ``wave`` parser rejects non-PCM WAVE forms) stay
    the soundfile/librosa seam."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload)) as w:
            rate = w.getframerate()
            n = w.getnframes()
            sw = w.getsampwidth()
            frames = w.readframes(n)
    except wave.Error as exc:
        raise ValueError(f"malformed WAV: {exc}") from exc
    if sw == 1:
        vals = np.abs(np.frombuffer(frames, np.uint8).astype(np.int64) - 128)
        scale = 1.0
    elif sw in (2, 4):
        vals = np.abs(
            np.frombuffer(frames, "<i2" if sw == 2 else "<i4").astype(np.int64)
        )
        scale = float(1 << (8 * (sw - 1)))
    elif sw == 3:  # signed 24-bit LE: widen to i4 with sign byte
        b = np.frombuffer(frames, np.uint8).reshape(-1, 3)
        ext = np.where(b[:, 2] >= 128, 255, 0).astype(np.uint8)
        vals = np.abs(
            np.column_stack([b, ext]).view("<i4").astype(np.int64).ravel()
        )
        scale = float(1 << 16)
    else:
        raise ValueError(f"bad WAV sample width {sw}")
    mean_amp = (float(vals.mean()) / scale) if len(vals) else 0.0
    duration_ms = round(n * 1000.0 / rate, 3) if rate else 0.0
    return rate, n, duration_ms, mean_amp


def decode_audio(payload: bytes) -> tuple:
    """(sample_rate, n_samples, duration_ms, mean_amp); PCM WAV
    decodes for real (``_wav_decode``); compressed audio is the
    remaining codec seam."""
    if payload.startswith(_WAV_MAGIC) and payload[8:12] == b"WAVE":
        return _wav_decode(payload)
    if payload.startswith(_WAV_MAGIC):
        raise ValueError("RIFF container without WAVE form")
    if not payload.startswith(FAKE_AUD_MAGIC):
        raise ValueError("unknown media format")
    rate, n = struct.unpack_from("<II", payload, len(FAKE_AUD_MAGIC))
    samples = memoryview(payload)[len(FAKE_AUD_MAGIC) + 8 :]
    if len(samples) != n:
        raise ValueError("truncated fake audio")
    duration_ms = round(n * 1000.0 / rate, 3)
    mean_amp = (sum(abs(s - 128) for s in samples) / n) if n else 0.0
    return rate, n, duration_ms, mean_amp


def fake_video_bytes(doc_id: int) -> bytes:
    """Deterministic fake video: ``FAKE1VID | u32 n_frames | u32 w |
    u32 h | n_frames frames of w*h bytes``; frame f's constant pixel
    is (doc_id*13 + f) % 256."""
    n_frames = 4 + doc_id % 12
    w, h = 8, 8
    body = b"".join(
        bytes([(doc_id * 13 + f) % 256]) * (w * h) for f in range(n_frames)
    )
    return FAKE_VID_MAGIC + struct.pack("<III", n_frames, w, h) + body


def demux_video_info(payload: bytes) -> tuple:
    """(n_samples, n_keyframes, duration_ms, total_bytes) for one
    video payload. MP4 demuxes for REAL (``ocr_spark/mp4.py`` walks
    the ISO BMFF sample tables — stts/stsz/stsc/stco/stss); the fake
    format reports its closed-form fields (25 fps assumed). Only
    DECODING sample payloads remains the ffmpeg seam."""
    if len(payload) > 8 and payload[4:8] == _MP4_FTYP:
        from ocr_spark.mp4 import demux_video

        t = demux_video(payload)
        return (
            t.n_samples,
            sum(t.keyframes),
            t.duration_ms(),
            sum(t.sizes),
        )
    if payload.startswith(b"\x00\x00\x00\x01") or payload.startswith(
        b"\x00\x00\x01"
    ):
        # raw Annex B H.264: NAL census via the real bitstream parser
        # (no timestamps in an elementary stream -> 25 fps assumed,
        # same convention as the fake format)
        from ocr_spark.h264 import stream_info

        info = stream_info(payload)
        return (
            info["n_slices"],
            info["n_idr"],
            info["n_slices"] * 40.0,
            len(payload),
        )
    if not payload.startswith(FAKE_VID_MAGIC):
        raise ValueError("unknown media format")
    n_frames, w, h = struct.unpack_from("<III", payload, len(FAKE_VID_MAGIC))
    return n_frames, n_frames, n_frames * 40.0, n_frames * w * h


def sample_frames(payload: bytes, stride: int = 4) -> list:
    """Frame sampling: decode every ``stride``-th frame, return
    [(frame_idx, mean_luma)] — the video analog of thumbnailing.
    Raw Annex B H.264 elementary streams decode for REAL when their
    macroblocks are I_PCM (``ocr_spark/h264.py``: NAL/SPS/PPS/slice
    parse + lossless PCM reconstruction); coded-residual macroblocks
    raise inside — the narrowed ffmpeg seam. For MP4 the demux half
    is real (``sample_stride_frames`` yields the seek plan); decoding
    the contained codec payloads is the same seam."""
    if payload.startswith(b"\x00\x00\x00\x01") or payload.startswith(
        b"\x00\x00\x01"
    ):
        from ocr_spark.h264 import decode_annexb_luma

        frames = decode_annexb_luma(payload)
        return [
            (f, float(frames[f].mean())) for f in range(0, len(frames), stride)
        ]
    if len(payload) > 8 and payload[4:8] == _MP4_FTYP:
        raise NotImplementedError(
            "MP4 demux is real (ocr_spark.mp4.sample_stride_frames gives "
            "the seek plan); decoding the codec payloads needs "
            "ffmpeg/pyav at this seam (raw Annex B I_PCM streams decode "
            "via ocr_spark.h264)"
        )
    if not payload.startswith(FAKE_VID_MAGIC):
        raise ValueError("unknown media format")
    n_frames, w, h = struct.unpack_from("<III", payload, len(FAKE_VID_MAGIC))
    frames = memoryview(payload)[len(FAKE_VID_MAGIC) + 12 :]
    if len(frames) != n_frames * w * h:
        raise ValueError("truncated fake video")
    out = []
    for f in range(0, n_frames, stride):
        frame = frames[f * w * h : (f + 1) * w * h]
        out.append((f, sum(frame) / (w * h)))
    return out


# ---------------------------------------------------------------------------
# mapInPandas stages
# ---------------------------------------------------------------------------


def _media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        ids = b["doc_id"].tolist()
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "kind": ["image"] * len(ids),
                "payload": [fake_image_bytes(int(i)) for i in ids],
            }
        )


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        out = {k: [] for k in ("doc_id", "kind", "width", "height", "n_pixels", "mean_luma")}
        for doc_id, kind, payload in zip(b["doc_id"], b["kind"], b["payload"]):
            w, h, n, mean = decode_image(payload)
            out["doc_id"].append(doc_id)
            out["kind"].append(kind)
            out["width"].append(w)
            out["height"].append(h)
            out["n_pixels"].append(n)
            out["mean_luma"].append(mean)
        df = pd.DataFrame(out)
        df["width"] = df["width"].astype("int32")
        df["height"] = df["height"].astype("int32")
        df["n_pixels"] = df["n_pixels"].astype("int64")
        yield df


def _thumb_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        rows = {"doc_id": [], "width": [], "height": [], "payload": []}
        for doc_id, payload in zip(b["doc_id"], b["payload"]):
            t = thumbnail(payload)
            w, h, _, _ = decode_image(t)
            rows["doc_id"].append(doc_id)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["payload"].append(t)
        df = pd.DataFrame(rows)
        df["width"] = df["width"].astype("int32")
        df["height"] = df["height"].astype("int32")
        yield df


def _audio_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        rows = {k: [] for k in ("doc_id", "sample_rate", "n_samples", "duration_ms", "mean_amp")}
        for doc_id in b["doc_id"]:
            rate, n, dur, amp = decode_audio(fake_audio_bytes(int(doc_id)))
            rows["doc_id"].append(doc_id)
            rows["sample_rate"].append(rate)
            rows["n_samples"].append(n)
            rows["duration_ms"].append(dur)
            rows["mean_amp"].append(amp)
        df = pd.DataFrame(rows)
        df["sample_rate"] = df["sample_rate"].astype("int32")
        df["n_samples"] = df["n_samples"].astype("int32")
        yield df


def _frame_batches(stride: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"doc_id": [], "frame_idx": [], "mean_luma": []}
            for doc_id in b["doc_id"]:
                for f, luma in sample_frames(
                    fake_video_bytes(int(doc_id)), stride
                ):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(f)
                    rows["mean_luma"].append(luma)
            df = pd.DataFrame(rows)
            df["frame_idx"] = df["frame_idx"].astype("int32")
            yield df

    return fn


def fake_media_from_docs(docs: DataFrame) -> DataFrame:
    """documents(doc_id, ...) -> media(doc_id, kind, payload binary)."""
    return docs.select("doc_id").mapInPandas(_media_batches, MEDIA_SCHEMA)


def audio_features_from_docs(docs: DataFrame) -> DataFrame:
    """Derived fake-audio payloads decoded to typed features — the
    audio leg of the multimodal plumbing (bytes genuinely parsed)."""
    return docs.select("doc_id").mapInPandas(_audio_batches, AUDIO_SCHEMA)


def video_frame_samples(docs: DataFrame, stride: int = 4) -> DataFrame:
    """Derived fake-video payloads frame-sampled every ``stride``
    frames — a row-fan-out media op (one input row -> one row per
    sampled frame)."""
    return docs.select("doc_id").mapInPandas(
        _frame_batches(stride), FRAME_SCHEMA
    )


def _demux_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        ids, ns, nk, dur, tb = [], [], [], [], []
        for doc_id in b["doc_id"]:
            payload = fake_video_bytes(int(doc_id))
            n, k, d, t = demux_video_info(payload)
            ids.append(doc_id)
            ns.append(n)
            nk.append(k)
            dur.append(d)
            tb.append(t)
        yield pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "n_samples": pd.array(ns, dtype="int32"),
                "n_keyframes": pd.array(nk, dtype="int32"),
                "duration_ms": pd.array(dur, dtype="float64"),
                "total_bytes": pd.array(tb, dtype="int64"),
            }
        )


def video_demux_stats(docs: DataFrame) -> DataFrame:
    """Per-video sample-table stats via ``demux_video_info`` — the
    stage a 100 TB video corpus runs to plan frame-decode work
    (byte-bounded batches, keyframe-aligned seeks) without touching
    codec payloads."""
    return docs.select("doc_id").mapInPandas(_demux_batches, DEMUX_SCHEMA)


CENSUS_SCHEMA = "doc_id bigint, codec string, width int, height int, luma bigint"


def _tiny_gray_png(w: int, h: int, v: int) -> bytes:
    """Minimal grayscale 8-bit filter-0 PNG of a constant image —
    in-package encoder so the census stage can plant real PNG bytes."""
    import struct as st
    import zlib

    def chunk(tag, body):
        return (
            st.pack(">I", len(body)) + tag + body
            + st.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = st.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = (b"\x00" + bytes([v]) * w) * h
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _census_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocr_spark.h264 import decode_annexb_luma, encode_gray_ipcm
    from ocr_spark.h264 import stream_info as h264_info
    from ocr_spark.jpeg import encode_gray

    for b in batches:
        ids, codecs, ws, hs, lumas = [], [], [], [], []
        for doc_id in b["doc_id"]:
            d = int(doc_id)
            v = 2 * (d % 112)  # even -> DC-only JPEG roundtrips exactly
            w = 16 + 2 * (d % 24)
            h = 16 + 2 * (d % 16)
            k = d % 3
            if k == 0:
                codec = "png"
                gw, gh, _n, mean = decode_image(_tiny_gray_png(w, h, v))
            elif k == 1:
                codec = "jpeg"
                px = np.full((h, w), v, dtype=np.uint8)
                gw, gh, _n, mean = decode_image(encode_gray(px))
            else:
                codec = "h264"
                px = np.full((h, w), v, dtype=np.uint8)
                stream = encode_gray_ipcm([px])
                info = h264_info(stream)
                gw, gh = info["width"], info["height"]
                mean = float(decode_annexb_luma(stream)[0].mean())
            ids.append(d)
            codecs.append(codec)
            ws.append(gw)
            hs.append(gh)
            lumas.append(int(round(mean)))
        yield pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "codec": pd.array(codecs, dtype="string"),
                "width": pd.array(ws, dtype="int32"),
                "height": pd.array(hs, dtype="int32"),
                "luma": pd.array(lumas, dtype="int64"),
            }
        )


def codec_census_from_docs(docs: DataFrame) -> DataFrame:
    """Per-document REAL-codec decode census: plants one genuine
    PNG / baseline-JPEG / H.264-I_PCM payload per row (constant
    frames whose value/dims are closed-form in doc_id) and decodes
    it back through the full codec stack inside one Arrow batch —
    the driver-facing proof that the real codecs, not just the fake
    format, run Spark-side. Single narrow mapInPandas; zero shuffle;
    constant-value frames make every codec's output exactly
    SQL-statable (PNG and I_PCM are lossless; an even-valued
    constant JPEG block is DC-only and survives Q50 quantization
    bit-exactly)."""
    return docs.select("doc_id").mapInPandas(_census_batches, CENSUS_SCHEMA)


SAFE_DECODED_SCHEMA = DECODED_SCHEMA + ", status string, error string"


def _decode_batches_safe(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    cols = (
        "doc_id", "kind", "width", "height", "n_pixels", "mean_luma",
        "status", "error",
    )
    for b in batches:
        out = {k: [] for k in cols}
        for doc_id, kind, payload in zip(
            b["doc_id"], b["kind"], b["payload"]
        ):
            try:
                w, h, n, mean = decode_image(payload)
                row = (w, h, n, mean, "completed", None)
            except NotImplementedError as exc:
                row = (None, None, None, None, "unsupported", str(exc)[:200])
            except Exception as exc:  # corrupt payload: error row, R2
                row = (None, None, None, None, "error", str(exc)[:200])
            out["doc_id"].append(doc_id)
            out["kind"].append(kind)
            for k, v in zip(cols[2:], row):
                out[k].append(v)
        df = pd.DataFrame(out)
        df["width"] = df["width"].astype("Int32")
        df["height"] = df["height"].astype("Int32")
        df["n_pixels"] = df["n_pixels"].astype("Int64")
        yield df


def decode_media(media: DataFrame) -> DataFrame:
    """media -> per-item decoded metadata + features (Arrow-batched).
    STRICT variant for trusted/planted media (the oracle-gated query
    path): a malformed payload raises and fails the task. Crawled
    media goes through ``decode_media_safe``."""
    return media.mapInPandas(_decode_batches, DECODED_SCHEMA)


def decode_media_safe(media: DataFrame) -> DataFrame:
    """Crawl-facing decode: per-row try/except -> status/error
    columns (the R2 poison-row rule the extraction stage follows —
    one corrupt JPEG among 10^12 pages must cost one error row, not
    the stage). ``status`` is 'completed' / 'unsupported' (declared
    codec seams) / 'error' (malformed bytes)."""
    return media.mapInPandas(_decode_batches_safe, SAFE_DECODED_SCHEMA)


def media_thumbnails(media: DataFrame) -> DataFrame:
    """media -> stride-subsampled thumbnails (binary out, binary in)."""
    return media.select("doc_id", "payload").mapInPandas(
        _thumb_batches, THUMB_SCHEMA
    )
