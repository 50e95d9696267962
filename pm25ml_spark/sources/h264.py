"""H.264/AVC parameter-set parsing (ISO/IEC 14496-10 / ITU-T H.264).

Closes the video-METADATA half of the multimodal seam: a 100 TB crawl
pipeline needs resolution / profile / level to filter and bucket videos
long before (or instead of) pixel decode, and those live in the SPS NAL
inside the container's ``avcC`` box — no entropy decoding required.
This module implements, from the public spec only:

- RBSP extraction (emulation-prevention 00 00 03 removal, §7.4.1.1),
- an exp-Golomb bit reader (ue(v)/se(v), §9.1),
- ``parse_sps`` (§7.3.2.1.1): profile/level, frame dimensions from
  ``pic_width_in_mbs_minus1`` / ``pic_height_in_map_units_minus1`` with
  frame-cropping and interlace handling, chroma format for the High
  profiles (incl. skipping scaling lists),
- ``parse_avcc`` (ISO 14496-15 §5.2.4.1): the decoder-configuration
  record that carries SPS/PPS verbatim.

Pixel decode (CABAC/CAVLC, prediction, deblocking) remains behind the
ffmpeg seam by design — see `sources/mp4.py`.
"""

from __future__ import annotations


def rbsp_from_nal(nal: bytes) -> bytes:
    """Strip the 1-byte NAL header and emulation-prevention bytes
    (00 00 03 → 00 00, §7.4.1.1)."""
    out = bytearray()
    i = 1  # skip nal_unit_type header byte
    n = len(nal)
    while i < n:
        if i + 2 < n and nal[i] == 0 and nal[i + 1] == 0 and nal[i + 2] == 3:
            out += b"\x00\x00"
            i += 3
        else:
            out.append(nal[i])
            i += 1
    return bytes(out)


class ExpGolombReader:
    """MSB-first bit reader with ue(v)/se(v) (§9.1)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("truncated RBSP")
        b = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def ue(self) -> int:
        zeros = 0
        while self.bit() == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("malformed exp-Golomb code")
        return (1 << zeros) - 1 + (self.bits(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


def _skip_scaling_list(r: ExpGolombReader, size: int) -> None:
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + r.se() + 256) % 256
        if nxt != 0:
            last = nxt


def parse_sps(nal: bytes) -> dict:
    """Parse a seq_parameter_set NAL (§7.3.2.1.1) → metadata dict:
    profile_idc, level_idc, chroma_format_idc, width, height,
    frame_mbs_only (False ⇒ interlaced-capable stream)."""
    if not nal or (nal[0] & 0x1F) != 7:
        raise ValueError("not an SPS NAL unit")
    r = ExpGolombReader(rbsp_from_nal(nal))
    profile_idc = r.bits(8)
    r.bits(8)  # constraint flags + reserved
    level_idc = r.bits(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1  # 4:2:0 default outside the High profiles
    separate_colour_plane = 0
    bit_depth_luma = 8
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_colour_plane = r.bit()
        bit_depth_luma = r.ue() + 8
        r.ue()  # bit_depth_chroma_minus8
        r.bit()  # qpprime_y_zero_transform_bypass_flag
        if r.bit():  # seq_scaling_matrix_present_flag
            n_lists = 8 if chroma_format_idc != 3 else 12
            for i in range(n_lists):
                if r.bit():  # seq_scaling_list_present_flag[i]
                    _skip_scaling_list(r, 16 if i < 6 else 64)
    r.ue()  # log2_max_frame_num_minus4
    pic_order_cnt_type = r.ue()
    if pic_order_cnt_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif pic_order_cnt_type == 1:
        r.bit()  # delta_pic_order_always_zero_flag
        r.se()  # offset_for_non_ref_pic
        r.se()  # offset_for_top_to_bottom_field
        for _ in range(r.ue()):  # num_ref_frames_in_pic_order_cnt_cycle
            r.se()
    r.ue()  # max_num_ref_frames
    r.bit()  # gaps_in_frame_num_value_allowed_flag
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only = r.bit()
    if not frame_mbs_only:
        r.bit()  # mb_adaptive_frame_field_flag
    r.bit()  # direct_8x8_inference_flag

    width = pic_width_in_mbs * 16
    height = pic_height_in_map_units * 16 * (1 if frame_mbs_only else 2)
    if r.bit():  # frame_cropping_flag (§7.4.2.1.1 crop-unit table)
        left, right, top, bottom = r.ue(), r.ue(), r.ue(), r.ue()
        if chroma_format_idc == 0 or separate_colour_plane:
            cw, ch = 1, 1
        elif chroma_format_idc == 1:
            cw, ch = 2, 2
        elif chroma_format_idc == 2:
            cw, ch = 2, 1
        else:
            cw, ch = 1, 1
        ch *= 1 if frame_mbs_only else 2
        width -= (left + right) * cw
        height -= (top + bottom) * ch
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "chroma_format_idc": chroma_format_idc,
        "bit_depth_luma": bit_depth_luma,
        "width": width,
        "height": height,
        "frame_mbs_only": bool(frame_mbs_only),
    }


def parse_avcc(avcc: bytes) -> dict:
    """Parse an AVCDecoderConfigurationRecord (ISO 14496-15 §5.2.4.1):
    returns nal_length_size and the raw SPS/PPS NAL lists, plus the
    first SPS's parsed metadata under ``sps``."""
    if len(avcc) < 7 or avcc[0] != 1:
        raise ValueError("not an avcC configuration record (version != 1)")
    nal_length_size = (avcc[4] & 0x03) + 1
    n_sps = avcc[5] & 0x1F
    pos = 6
    sps_list = []
    for _ in range(n_sps):
        ln = int.from_bytes(avcc[pos : pos + 2], "big")
        sps_list.append(avcc[pos + 2 : pos + 2 + ln])
        pos += 2 + ln
    n_pps = avcc[pos]
    pos += 1
    pps_list = []
    for _ in range(n_pps):
        ln = int.from_bytes(avcc[pos : pos + 2], "big")
        pps_list.append(avcc[pos + 2 : pos + 2 + ln])
        pos += 2 + ln
    out = {
        "nal_length_size": nal_length_size,
        "sps": parse_sps(sps_list[0]) if sps_list else None,
        "sps_nals": sps_list,
        "pps_nals": pps_list,
    }
    return out


# ---------------------------------------------------------------------------
# SPS/avcC writers — fixture generators for round-trip tests (the parser's
# golden test is hand-derived bit-by-bit, independent of this writer).
# ---------------------------------------------------------------------------


class ExpGolombWriter:
    def __init__(self):
        self.bits_list: list[int] = []

    def bit(self, b: int) -> None:
        self.bits_list.append(b & 1)

    def bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def ue(self, v: int) -> None:
        code = v + 1
        n = code.bit_length()
        self.bits(0, n - 1)
        self.bits(code, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp(self) -> bytes:
        out = self.bits_list + [1]  # rbsp_stop_one_bit
        while len(out) % 8:
            out.append(0)
        return bytes(
            int("".join(map(str, out[i : i + 8])), 2) for i in range(0, len(out), 8)
        )


def build_sps(
    width_mbs: int,
    height_map_units: int,
    profile_idc: int = 66,
    level_idc: int = 30,
    crop: tuple[int, int, int, int] = (0, 0, 0, 0),
) -> bytes:
    """Minimal valid Baseline-family SPS NAL for fixtures (4:2:0,
    frame_mbs_only=1). Emulation prevention is applied."""
    w = ExpGolombWriter()
    w.bits(profile_idc, 8)
    w.bits(0, 8)  # constraint/reserved
    w.bits(level_idc, 8)
    w.ue(0)  # sps id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0)  # pic_order_cnt_type
    w.ue(0)  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)  # max_num_ref_frames
    w.bit(0)  # gaps_in_frame_num
    w.ue(width_mbs - 1)
    w.ue(height_map_units - 1)
    w.bit(1)  # frame_mbs_only_flag
    w.bit(1)  # direct_8x8_inference_flag
    if any(crop):
        w.bit(1)
        for c in crop:
            w.ue(c)
    else:
        w.bit(0)
    w.bit(0)  # vui_parameters_present_flag
    rbsp = w.rbsp()
    # emulation prevention on the payload
    out = bytearray([0x67])  # nal_ref_idc=3, type=7
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def build_avcc(sps: bytes, pps: bytes = b"\x68\xce\x38\x80") -> bytes:
    """AVCDecoderConfigurationRecord embedding one SPS + one PPS."""
    return (
        bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
        + len(sps).to_bytes(2, "big")
        + sps
        + bytes([1])
        + len(pps).to_bytes(2, "big")
        + pps
    )
