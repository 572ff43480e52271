"""H.264/AVC bitstream layer — pure stdlib + numpy, no external libs.

What is REAL here (ITU-T H.264, public spec):

- Annex B byte-stream framing: start-code scan (3- and 4-byte),
  emulation-prevention removal (00 00 03 xx -> 00 00 xx) and, on the
  encoder, insertion (§7.4.1 / B.1).
- NAL unit header parse (§7.3.1) and Exp-Golomb ue(v)/se(v) coding
  (§9.1) in both directions.
- Sequence parameter set parse (§7.3.2.1): all profiles' syntax up
  to and including the high-profile chroma/bit-depth/scaling-list
  extension, frame cropping -> exact pixel dimensions. This is the
  metadata path a crawl pipeline actually needs: width/height/
  profile from the first NAL units without decoding a single block.
- Picture parameter set parse (§7.3.2.2) and I-slice header parse
  (§7.3.3) for CAVLC streams.
- I_PCM macroblock decode (§7.3.5, mb_type 25 in I slices): byte
  alignment + raw 16x16 luma / 2x 8x8 chroma samples. I_PCM is
  lossless, so the decoder reconstructs fixture frames EXACTLY —
  the invariant the tests pin.

What is NOT: CAVLC/CABAC residual decode, intra prediction, inter
prediction, deblocking. Streams whose macroblocks are anything but
I_PCM raise NotImplementedError — that is the ffmpeg/pyav seam, now
narrowed from "any H.264 payload" to "coded-residual macroblocks".

The fixture encoder emits a spec-shaped Annex B stream: one SPS
(baseline, pic_order_cnt_type=2, frame cropping for non-multiple-of-
16 sizes), one PPS, then one IDR slice per frame with every
macroblock I_PCM. Grey (128) chroma; 4:2:0, 8-bit.
"""

from __future__ import annotations

import numpy as np

_HIGH_PROFILES = frozenset(
    (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
)


# ---------------------------------------------------------------------------
# RBSP <-> NAL byte plumbing
# ---------------------------------------------------------------------------


def split_annexb(stream: bytes) -> list:
    """Split an Annex B byte stream into raw NAL units (no start
    codes, emulation prevention still present)."""
    nals = []
    i = 0
    n = len(stream)
    # find first start code
    starts = []
    while i + 2 < n:
        if stream[i] == 0 and stream[i + 1] == 0 and stream[i + 2] == 1:
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    if not starts:
        raise ValueError("no Annex B start code")
    for j, s in enumerate(starts):
        e = n if j + 1 == len(starts) else starts[j + 1] - 3
        # the next start code may be 4-byte (00 00 00 01): its leading
        # zero belongs to the separator, not this NAL
        while e > s and stream[e - 1] == 0:
            e -= 1
        nals.append(stream[s:e])
    return nals


def unescape_rbsp(nal: bytes) -> bytes:
    """Strip emulation-prevention bytes: 00 00 03 -> 00 00."""
    out = bytearray()
    i = 0
    n = len(nal)
    while i < n:
        if i + 2 < n and nal[i] == 0 and nal[i + 1] == 0 and nal[i + 2] == 3:
            out += nal[i : i + 2]
            i += 3
        else:
            out.append(nal[i])
            i += 1
    return bytes(out)


def escape_rbsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes: any 00 00 followed by
    00/01/02/03 gets a 03 interposed."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n):
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self):
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("bad Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self):
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def byte_align(self):
        while self.pos & 7:
            if self.u(1) != 0:
                raise ValueError("nonzero pcm_alignment bit")

    def bytes_raw(self, n):
        assert self.pos & 7 == 0
        s = self.pos >> 3
        self.pos += 8 * n
        return self.data[s : s + n]


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def u(self, value, n):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    def ue(self, v):
        k = v + 1
        nbits = k.bit_length()
        self.u(0, nbits - 1)
        self.u(k, nbits)

    def se(self, v):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def byte_align_zero(self):
        while self.n:
            self.u(0, 1)

    def bytes_raw(self, data):
        assert self.n == 0
        self.buf += data

    def rbsp_trailing(self):
        self.u(1, 1)  # rbsp_stop_one_bit
        self.byte_align_zero()

    def rbsp(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# parameter-set parsing
# ---------------------------------------------------------------------------


def parse_sps(rbsp: bytes) -> dict:
    """Parse a seq_parameter_set_rbsp (§7.3.2.1) into the fields the
    pipeline needs; exact crop-adjusted width/height included."""
    r = _BitReader(rbsp)
    profile = r.u(8)
    r.u(8)  # constraint flags + reserved
    level = r.u(8)
    sps_id = r.ue()
    chroma_format_idc = 1  # default 4:2:0
    separate_colour = 0
    if profile in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_colour = r.u(1)
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass
        if r.u(1):  # seq_scaling_matrix_present
            for i in range(8 if chroma_format_idc != 3 else 12):
                if r.u(1):  # scaling list present
                    size = 16 if i < 6 else 64
                    last, nxt = 8, 8
                    for _ in range(size):
                        if nxt:
                            nxt = (last + r.se() + 256) % 256
                        last = nxt if nxt else last
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    log2_max_poc_lsb = 0
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed
    w_mbs = r.ue() + 1
    h_map = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field
    r.u(1)  # direct_8x8_inference
    crop = (0, 0, 0, 0)
    if r.u(1):  # frame_cropping_flag
        crop = (r.ue(), r.ue(), r.ue(), r.ue())  # left right top bottom
    # §7.4.2.1.1 crop units
    chroma_array_type = 0 if separate_colour else chroma_format_idc
    if chroma_array_type == 0:
        cux, cuy = 1, 2 - frame_mbs_only
    else:
        sub_w = 2 if chroma_format_idc in (1, 2) else 1
        sub_h = 2 if chroma_format_idc == 1 else 1
        cux, cuy = sub_w, sub_h * (2 - frame_mbs_only)
    width = 16 * w_mbs - cux * (crop[0] + crop[1])
    height = 16 * h_map * (2 - frame_mbs_only) - cuy * (crop[2] + crop[3])
    return {
        "profile_idc": profile,
        "level_idc": level,
        "sps_id": sps_id,
        "chroma_format_idc": chroma_format_idc,
        "log2_max_frame_num": log2_max_frame_num,
        "pic_order_cnt_type": poc_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "pic_width_in_mbs": w_mbs,
        "pic_height_in_map_units": h_map,
        "frame_mbs_only_flag": frame_mbs_only,
        "crop": crop,
        "width": width,
        "height": height,
    }


def parse_pps(rbsp: bytes) -> dict:
    """Parse a pic_parameter_set_rbsp (§7.3.2.2), minimal fields."""
    r = _BitReader(rbsp)
    pps_id = r.ue()
    sps_id = r.ue()
    entropy_cabac = r.u(1)
    bottom_field_poc = r.u(1)
    if r.ue() != 0:  # num_slice_groups_minus1
        raise NotImplementedError("FMO slice groups need a real decoder")
    r.ue()  # num_ref_idx_l0_default_active_minus1
    r.ue()  # num_ref_idx_l1_default_active_minus1
    r.u(1)  # weighted_pred_flag
    r.u(2)  # weighted_bipred_idc
    r.se()  # pic_init_qp_minus26
    r.se()  # pic_init_qs_minus26
    r.se()  # chroma_qp_index_offset
    deblock_ctrl = r.u(1)
    r.u(1)  # constrained_intra_pred
    r.u(1)  # redundant_pic_cnt_present
    return {
        "pps_id": pps_id,
        "sps_id": sps_id,
        "entropy_coding_mode_cabac": entropy_cabac,
        "bottom_field_poc": bottom_field_poc,
        "deblocking_filter_control_present": deblock_ctrl,
    }


# ---------------------------------------------------------------------------
# slice + I_PCM decode
# ---------------------------------------------------------------------------


def _decode_idr_ipcm(rbsp, sps, pps, idr):
    """Parse one I-slice header (§7.3.3) and decode all-I_PCM slice
    data into a full luma frame. Raises NotImplementedError at the
    first coded-residual macroblock."""
    r = _BitReader(rbsp)
    first_mb = r.ue()
    slice_type = r.ue()
    if slice_type % 5 != 2:  # 2/7 = I
        raise NotImplementedError(
            "only I slices decode here; P/B need a real decoder"
        )
    r.ue()  # pic_parameter_set_id
    r.u(sps["log2_max_frame_num"])  # frame_num
    if not sps["frame_mbs_only_flag"]:
        if r.u(1):  # field_pic_flag
            raise NotImplementedError("field pictures need a real decoder")
    if idr:
        r.ue()  # idr_pic_id
    if sps["pic_order_cnt_type"] == 0:
        r.u(sps["log2_max_poc_lsb"])
        if pps["bottom_field_poc"]:
            r.se()
    if idr:
        r.u(1)  # no_output_of_prior_pics
        r.u(1)  # long_term_reference_flag
    if pps["entropy_coding_mode_cabac"]:
        raise NotImplementedError("CABAC slice data needs a real decoder")
    r.se()  # slice_qp_delta
    if pps["deblocking_filter_control_present"]:
        if r.ue() != 1:  # disable_deblocking_filter_idc
            r.se()
            r.se()
    if first_mb != 0:
        raise NotImplementedError("multi-slice pictures not decoded here")

    wm, hm = sps["pic_width_in_mbs"], sps["pic_height_in_map_units"]
    luma = np.zeros((hm * 16, wm * 16), dtype=np.uint8)
    for mb in range(wm * hm):
        mb_type = r.ue()
        if mb_type != 25:  # I_PCM
            raise NotImplementedError(
                "coded-residual macroblocks (CAVLC) are the ffmpeg seam; "
                "only I_PCM decodes here"
            )
        r.byte_align()
        my, mx = divmod(mb, wm)
        block = np.frombuffer(r.bytes_raw(256), dtype=np.uint8)
        luma[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = (
            block.reshape(16, 16)
        )
        r.bytes_raw(128)  # 2x 8x8 chroma (4:2:0), not reconstructed
    return luma[: sps["height"], : sps["width"]]


def stream_info(stream: bytes) -> dict:
    """Cheap metadata pass over an Annex B stream: NAL census +
    dimensions from the first SPS — no block decoding. The call a
    100 TB media-curation pipeline makes per payload."""
    nal_counts = {}
    sps = None
    for nal in split_annexb(stream):
        if not nal:
            continue
        ntype = nal[0] & 0x1F
        nal_counts[ntype] = nal_counts.get(ntype, 0) + 1
        if ntype == 7 and sps is None:
            sps = parse_sps(unescape_rbsp(nal[1:]))
    return {
        "n_nals": sum(nal_counts.values()),
        "n_idr": nal_counts.get(5, 0),
        "n_slices": nal_counts.get(1, 0) + nal_counts.get(5, 0),
        "width": sps["width"] if sps else None,
        "height": sps["height"] if sps else None,
        "profile_idc": sps["profile_idc"] if sps else None,
    }


def decode_annexb_luma(stream: bytes) -> list:
    """Decode every IDR/I slice of an Annex B stream to luma frames
    (numpy uint8 arrays). Real for I_PCM macroblocks; coded residuals
    raise NotImplementedError (the ffmpeg seam)."""
    sps_by_id = {}
    pps_by_id = {}
    frames = []
    for nal in split_annexb(stream):
        if not nal:
            continue
        ntype = nal[0] & 0x1F
        rbsp = unescape_rbsp(nal[1:])
        if ntype == 7:
            s = parse_sps(rbsp)
            sps_by_id[s["sps_id"]] = s
        elif ntype == 8:
            p = parse_pps(rbsp)
            pps_by_id[p["pps_id"]] = p
        elif ntype in (1, 5):
            if not sps_by_id or not pps_by_id:
                raise ValueError("slice before SPS/PPS")
            # fixtures carry one SPS/PPS; real code would bind via
            # the slice header's pic_parameter_set_id
            sps = next(iter(sps_by_id.values()))
            pps = next(iter(pps_by_id.values()))
            frames.append(_decode_idr_ipcm(rbsp, sps, pps, ntype == 5))
    return frames


# ---------------------------------------------------------------------------
# fixture encoder: IDR-only, all-I_PCM baseline stream
# ---------------------------------------------------------------------------


def encode_gray_ipcm(frames) -> bytes:
    """Encode grayscale frames (uint8 arrays, same shape) as an
    Annex B H.264 stream: SPS + PPS + one IDR I_PCM slice per frame.
    Lossless by construction, so decode_annexb_luma(result) must
    equal the input exactly. Grey chroma, 4:2:0 8-bit, baseline
    profile, pic_order_cnt_type=2."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape
    wm, hm = (w + 15) // 16, (h + 15) // 16

    def nal(ref_idc, ntype, rbsp):
        return (
            b"\x00\x00\x00\x01"
            + bytes([(ref_idc << 5) | ntype])
            + escape_rbsp(rbsp)
        )

    bw = _BitWriter()
    bw.u(66, 8)  # profile_idc: baseline
    bw.u(0, 8)  # constraint flags
    bw.u(40, 8)  # level 4.0
    bw.ue(0)  # sps_id
    bw.ue(0)  # log2_max_frame_num_minus4 -> u(4) frame_num
    bw.ue(2)  # pic_order_cnt_type 2: no POC fields in slice headers
    bw.ue(1)  # max_num_ref_frames
    bw.u(0, 1)  # gaps_in_frame_num_value_allowed
    bw.ue(wm - 1)
    bw.ue(hm - 1)
    bw.u(1, 1)  # frame_mbs_only
    bw.u(0, 1)  # direct_8x8_inference
    cr, cb = wm * 16 - w, hm * 16 - h
    if cr or cb:
        bw.u(1, 1)  # frame_cropping_flag
        bw.ue(0)
        bw.ue(cr // 2)  # CropUnitX = 2 (4:2:0)
        bw.ue(0)
        bw.ue(cb // 2)  # CropUnitY = 2 (frame_mbs_only)
    else:
        bw.u(0, 1)
    bw.u(0, 1)  # vui_parameters_present
    bw.rbsp_trailing()
    out = bytearray(nal(3, 7, bw.rbsp()))
    if (cr | cb) & 1:
        raise ValueError("frame dims must be even (4:2:0 crop units)")

    bw = _BitWriter()
    bw.ue(0)  # pps_id
    bw.ue(0)  # sps_id
    bw.u(0, 1)  # entropy_coding_mode: CAVLC
    bw.u(0, 1)  # bottom_field_poc
    bw.ue(0)  # num_slice_groups_minus1
    bw.ue(0)
    bw.ue(0)  # num_ref_idx defaults
    bw.u(0, 1)  # weighted_pred
    bw.u(0, 2)  # weighted_bipred
    bw.se(0)  # pic_init_qp_minus26
    bw.se(0)  # pic_init_qs_minus26
    bw.se(0)  # chroma_qp_index_offset
    bw.u(0, 1)  # deblocking_filter_control_present
    bw.u(0, 1)  # constrained_intra_pred
    bw.u(0, 1)  # redundant_pic_cnt_present
    bw.rbsp_trailing()
    out += nal(3, 8, bw.rbsp())

    grey = bytes([128]) * 128
    for fi, frame in enumerate(frames):
        padded = np.full((hm * 16, wm * 16), 128, dtype=np.uint8)
        padded[:h, :w] = frame
        bw = _BitWriter()
        bw.ue(0)  # first_mb_in_slice
        bw.ue(7)  # slice_type: I (all slices in picture)
        bw.ue(0)  # pic_parameter_set_id
        bw.u(fi % 16, 4)  # frame_num (u(log2_max_frame_num)=u(4))
        bw.ue(fi % 2)  # idr_pic_id
        bw.u(0, 1)  # no_output_of_prior_pics
        bw.u(0, 1)  # long_term_reference_flag
        bw.se(0)  # slice_qp_delta
        for mb in range(wm * hm):
            bw.ue(25)  # mb_type I_PCM
            bw.byte_align_zero()  # pcm_alignment_zero_bit
            my, mx = divmod(mb, wm)
            bw.bytes_raw(
                padded[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16]
                .tobytes()
            )
            bw.bytes_raw(grey)  # Cb + Cr 8x8 each
        bw.rbsp_trailing()
        out += nal(3, 5, bw.rbsp())
    return bytes(out)


# ---------------------------------------------------------------------------
# AVCC layer (MP4 carriage): avcC record + length-prefixed NALs
# ---------------------------------------------------------------------------
#
# Inside ISO BMFF the codec config travels as an AVCDecoderConfiguration
# Record ('avcC' in the stsd sample entry) and samples carry
# length-prefixed NAL units instead of Annex B start codes
# (ISO/IEC 14496-15, public spec). Parsing avcC is how a pipeline
# gets width/height for an MP4 without touching a single sample.


def build_avcc(sps_nal: bytes, pps_nal: bytes,
               length_size: int = 4) -> bytes:
    """Assemble an AVCDecoderConfigurationRecord from raw SPS/PPS
    NAL units (header byte + EPB-escaped payload, no start codes)."""
    import struct

    return (
        bytes([1, sps_nal[1], sps_nal[2], sps_nal[3],
               0xFC | (length_size - 1), 0xE0 | 1])
        + struct.pack(">H", len(sps_nal)) + sps_nal
        + bytes([1])
        + struct.pack(">H", len(pps_nal)) + pps_nal
    )


def parse_avcc(record: bytes) -> dict:
    """Parse an avcC record: SPS/PPS lists + NAL length size; the
    first SPS is parsed through to exact pixel dimensions."""
    import struct

    if not record or record[0] != 1:
        raise ValueError("not an avcC record")
    length_size = (record[4] & 3) + 1
    n_sps = record[5] & 0x1F
    pos = 6
    sps_list = []
    for _ in range(n_sps):
        (ln,) = struct.unpack_from(">H", record, pos)
        pos += 2
        sps_list.append(record[pos : pos + ln])
        pos += ln
    n_pps = record[pos]
    pos += 1
    pps_list = []
    for _ in range(n_pps):
        (ln,) = struct.unpack_from(">H", record, pos)
        pos += 2
        pps_list.append(record[pos : pos + ln])
        pos += ln
    sps = parse_sps(unescape_rbsp(sps_list[0][1:])) if sps_list else None
    return {
        "length_size": length_size,
        "sps_nals": sps_list,
        "pps_nals": pps_list,
        "width": sps["width"] if sps else None,
        "height": sps["height"] if sps else None,
        "profile_idc": sps["profile_idc"] if sps else None,
    }


def split_avcc_sample(sample: bytes, length_size: int = 4) -> list:
    """Split one length-prefixed (AVCC) sample into raw NAL units."""
    nals = []
    pos = 0
    n = len(sample)
    while pos + length_size <= n:
        ln = int.from_bytes(sample[pos : pos + length_size], "big")
        pos += length_size
        if pos + ln > n:
            raise ValueError("truncated AVCC NAL")
        nals.append(sample[pos : pos + ln])
        pos += ln
    return nals


def annexb_to_avcc(stream: bytes, length_size: int = 4) -> tuple:
    """Repackage an Annex B stream as (avcC record, [samples]) — one
    sample per slice NAL, parameter sets lifted into the record. The
    inverse of what a demuxer does; used to make MP4-shaped fixtures
    from the Annex B fixture encoder."""
    sps_nal = pps_nal = None
    samples = []
    for nal in split_annexb(stream):
        if not nal:
            continue
        ntype = nal[0] & 0x1F
        if ntype == 7:
            sps_nal = nal
        elif ntype == 8:
            pps_nal = nal
        elif ntype in (1, 5):
            samples.append(len(nal).to_bytes(length_size, "big") + nal)
    if sps_nal is None or pps_nal is None:
        raise ValueError("stream lacks SPS/PPS")
    return build_avcc(sps_nal, pps_nal, length_size), samples


def decode_avcc_sample_luma(sample: bytes, avcc: dict):
    """Decode one AVCC sample's I/IDR slice to a luma frame using the
    record's parameter sets (I_PCM macroblocks; coded residuals raise
    — the ffmpeg seam)."""
    sps = parse_sps(unescape_rbsp(avcc["sps_nals"][0][1:]))
    pps = parse_pps(unescape_rbsp(avcc["pps_nals"][0][1:]))
    for nal in split_avcc_sample(sample, avcc["length_size"]):
        ntype = nal[0] & 0x1F
        if ntype in (1, 5):
            return _decode_idr_ipcm(
                unescape_rbsp(nal[1:]), sps, pps, ntype == 5
            )
    raise ValueError("sample has no slice NAL")
