"""H.264 SPS/avcC metadata parsing (sources/h264.py).

The golden SPS below is hand-derived from ITU-T H.264 §7.3.2.1.1 —
independent of the module's own writer, so writer/parser bugs cannot
cancel out:

    NAL header: 0x67 (ref_idc 3, type 7)
    profile_idc=66 → 0x42 ; constraints → 0x00 ; level_idc=10 → 0x0A
    then bit fields:
      sps_id            ue(0)  = 1
      log2_max_frame_num ue(0) = 1
      pic_order_cnt_type ue(0) = 1
      log2_max_poc_lsb  ue(0)  = 1
      max_num_ref_frames ue(1) = 010
      gaps_allowed      u(1)   = 0
      width_mbs-1       ue(3)  = 00100
      height_units-1    ue(2)  = 011
      frame_mbs_only    u(1)   = 1
      direct_8x8        u(1)   = 1
      cropping          u(1)   = 0
      vui_present       u(1)   = 0
      stop bit                 = 1, pad 000
    = 11110100 00100011 11001000 = F4 23 C8  → 64×48 px
"""

from __future__ import annotations

import pytest

from pm25ml_spark.sources.h264 import (
    ExpGolombReader,
    ExpGolombWriter,
    build_avcc,
    build_sps,
    parse_avcc,
    parse_sps,
    rbsp_from_nal,
)

GOLDEN_SPS = bytes([0x67, 0x42, 0x00, 0x0A, 0xF4, 0x23, 0xC8])


def test_golden_sps_hand_derived():
    m = parse_sps(GOLDEN_SPS)
    assert m["width"] == 64 and m["height"] == 48
    assert m["profile_idc"] == 66 and m["level_idc"] == 10
    assert m["chroma_format_idc"] == 1 and m["frame_mbs_only"] is True


def test_exp_golomb_codes():
    # ue: 0→'1', 1→'010', 2→'011', 3→'00100'; se maps 1,-1,2,-2…
    r = ExpGolombReader(bytes([0b10100110, 0b01000000]))
    assert r.ue() == 0 and r.ue() == 1 and r.ue() == 2 and r.ue() == 3
    w = ExpGolombWriter()
    for v in (0, 1, 2, 3, 17, 255):
        w.ue(v)
    for v in (1, -1, 5, -7):
        w.se(v)
    r2 = ExpGolombReader(w.rbsp())
    assert [r2.ue() for _ in range(6)] == [0, 1, 2, 3, 17, 255]
    assert [r2.se() for _ in range(4)] == [1, -1, 5, -7]


def test_writer_parser_roundtrip_with_cropping():
    # 120×68 MBs cropped right 1 / bottom 4 chroma units (4:2:0 ⇒ ×2)
    sps = build_sps(120, 68, level_idc=40, crop=(0, 1, 0, 4))
    m = parse_sps(sps)
    assert (m["width"], m["height"]) == (1918, 1080)


def test_high_profile_sps_with_chroma_and_scaling_skip():
    # hand-compose a High (100) SPS: chroma 4:2:0, no scaling lists
    w = ExpGolombWriter()
    w.bits(100, 8)
    w.bits(0, 8)
    w.bits(41, 8)
    w.ue(0)  # sps id
    w.ue(1)  # chroma_format_idc 4:2:0
    w.ue(0)  # bit_depth_luma_minus8
    w.ue(0)  # bit_depth_chroma_minus8
    w.bit(0)  # transform bypass
    w.bit(0)  # no scaling matrix
    w.ue(0)  # log2_max_frame_num
    w.ue(2)  # pic_order_cnt_type 2 (no extra fields)
    w.ue(4)  # max_num_ref_frames
    w.bit(0)
    w.ue(79)  # 80 MBs wide = 1280
    w.ue(44)  # 45 units = 720
    w.bit(1)  # frame_mbs_only
    w.bit(1)
    w.bit(0)  # no cropping
    w.bit(0)  # no vui
    nal = bytes([0x67]) + w.rbsp()
    m = parse_sps(nal)
    assert (m["width"], m["height"]) == (1280, 720)
    assert m["profile_idc"] == 100 and m["bit_depth_luma"] == 8


def test_interlaced_height_doubles():
    w = ExpGolombWriter()
    w.bits(66, 8); w.bits(0, 8); w.bits(30, 8)
    w.ue(0); w.ue(0); w.ue(2)  # poc type 2
    w.ue(1); w.bit(0)
    w.ue(44)  # 45 MBs wide
    w.ue(17)  # 18 map units
    w.bit(0)  # frame_mbs_only = 0 → field coding, height ×2
    w.bit(0)  # mb_adaptive_frame_field_flag
    w.bit(1)
    w.bit(0); w.bit(0)
    m = parse_sps(bytes([0x67]) + w.rbsp())
    assert (m["width"], m["height"]) == (720, 576)
    assert m["frame_mbs_only"] is False


def test_emulation_prevention_stripped():
    assert rbsp_from_nal(b"\x67\x00\x00\x03\x01\xff") == b"\x00\x00\x01\xff"
    assert rbsp_from_nal(b"\x67\x00\x00\x03\x03\x42") == b"\x00\x00\x03\x42"


def test_rejections():
    with pytest.raises(ValueError, match="not an SPS"):
        parse_sps(b"\x68\x00")  # PPS NAL type
    with pytest.raises(ValueError, match="avcC"):
        parse_avcc(b"\x02\x42\x00\x0a\xff\xe1")
    with pytest.raises(ValueError, match="truncated"):
        parse_sps(bytes([0x67, 0x42, 0x00]))


def test_avcc_through_mp4_container():
    from pm25ml_spark.sources.mp4 import build_mp4, parse_mp4

    avcc = build_avcc(build_sps(8, 6, level_idc=20))
    payload = build_mp4([b"f" * 9] * 3, codec=b"avc1", avcc=avcc)
    (track,) = parse_mp4(payload)
    assert track.codec == "avc1"
    cfg = parse_avcc(track.codec_config)
    assert cfg["nal_length_size"] == 4
    assert (cfg["sps"]["width"], cfg["sps"]["height"]) == (128, 96)
    assert len(cfg["pps_nals"]) == 1
    # non-AVC files keep codec_config None
    (plain,) = parse_mp4(build_mp4([b"x" * 5] * 2))
    assert plain.codec_config is None
