"""MP4 (ISO BMFF, ISO/IEC 14496-12) structure parser + fixture builder.

Makes the video half of the multimodal family real at the CONTAINER
level: frame sampling (`multimodal.sample_frames`) walks the actual
sample tables — ``stts`` (timestamps), ``stss`` (keyframes), ``stsc`` /
``stsz`` / ``stco``/``co64`` (byte ranges) — and returns each sampled
frame's real compressed bytes + timestamp. Pixel decode of those frames
(H.264/HEVC entropy decoding) stays behind the ffmpeg seam; everything
a distributed sampling pipeline needs before the codec — locating,
slicing, and time-indexing frames inside a 100 TB video corpus without
decoding them — happens here, numpy/stdlib only, from the public spec.

The builder emits minimal-but-valid single-track files (ftyp + mdat +
moov with full sample tables) so the parser is tested against real box
structure rather than a mock.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


@dataclass(frozen=True)
class Mp4Sample:
    index: int  # 0-based
    offset: int  # absolute byte offset in the file
    size: int
    time_s: float  # decode timestamp in seconds
    keyframe: bool


@dataclass(frozen=True)
class Mp4Track:
    handler: str  # 'vide' | 'soun' | ...
    codec: str  # sample-entry fourcc, e.g. 'avc1', 'mp4v'
    timescale: int
    width: int
    height: int
    samples: list[Mp4Sample]
    # raw AVCDecoderConfigurationRecord (the `avcC` child of an avc1
    # sample entry) when present — parse with sources.h264.parse_avcc
    # for SPS-level metadata (true coded resolution, profile, level)
    # without touching a single coded frame
    codec_config: bytes | None = None


def _boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", buf[pos : pos + 4])[0]
        btype = buf[pos + 4 : pos + 8].decode("latin-1")
        head = 8
        if size == 1:
            size = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
            head = 16
        elif size == 0:
            size = end - pos
        if size < head:
            raise ValueError(f"bad box size {size} for {btype!r} at {pos}")
        if pos + size > end:
            raise ValueError(
                f"box {btype!r} at {pos} extends past EOF "
                f"({pos + size} > {end}): truncated file"
            )
        yield btype, pos + head, pos + size
        pos += size


def _find(buf, start, end, btype):
    for t, s, e in _boxes(buf, start, end):
        if t == btype:
            return s, e
    return None


def parse_mp4(payload: bytes) -> list[Mp4Track]:
    """Parse every track's sample table -> list of Mp4Track.

    Raises ``ValueError`` on ANY malformed input — internal faults
    (truncated tables, boxes pointing past EOF, missing children) are
    converted at this boundary so distributed readers can quarantine
    bad files with one except."""
    try:
        return _parse_mp4(payload)
    except ValueError:
        raise
    except (
        IndexError,
        KeyError,
        TypeError,
        struct.error,
        OverflowError,
        ZeroDivisionError,
    ) as exc:
        raise ValueError(
            f"corrupt MP4 container: {type(exc).__name__}: {exc}"
        ) from exc


def _parse_mp4(payload: bytes) -> list[Mp4Track]:
    # magic check BEFORE walking boxes: non-MP4 bytes should say so
    # rather than fail on a garbage box size
    if payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 file (missing leading ftyp box)")
    top = list(_boxes(payload, 0, len(payload)))
    moov = next(((s, e) for t, s, e in top if t == "moov"), None)
    if moov is None:
        raise ValueError("no moov box")
    tracks = []
    for t, s, e in _boxes(payload, *moov):
        if t == "trak":
            tracks.append(_parse_trak(payload, s, e))
    return tracks


def _parse_trak(buf: bytes, start: int, end: int) -> Mp4Track:
    mdia = _find(buf, start, end, "mdia")
    if mdia is None:
        raise ValueError("trak without mdia")
    mdhd = _find(buf, *mdia, "mdhd")
    version = buf[mdhd[0]]
    timescale = struct.unpack(
        ">I", buf[mdhd[0] + (20 if version == 1 else 12) : mdhd[0] + (24 if version == 1 else 16)]
    )[0]
    if timescale == 0:
        raise ValueError("mdhd timescale is 0 (corrupt media header)")
    hdlr = _find(buf, *mdia, "hdlr")
    handler = buf[hdlr[0] + 8 : hdlr[0] + 12].decode("latin-1")
    minf = _find(buf, *mdia, "minf")
    stbl = _find(buf, *minf, "stbl")

    # stsd: codec fourcc (+ width/height for visual entries)
    stsd = _find(buf, *stbl, "stsd")
    codec, width, height = "", 0, 0
    codec_config = None
    if stsd is not None:
        entry = stsd[0] + 8  # ver/flags + entry_count
        codec = buf[entry + 4 : entry + 8].decode("latin-1")
        if handler == "vide":
            width, height = struct.unpack(">HH", buf[entry + 32 : entry + 36])
            # visual sample entry: 8-byte box header + 78 fixed bytes,
            # then child boxes (avcC for AVC streams, ISO 14496-15)
            (entry_size,) = struct.unpack(">I", buf[entry : entry + 4])
            child_start, child_end = entry + 86, entry + entry_size
            if child_end <= len(buf):
                for btype, ps, pe in _boxes(buf, child_start, child_end):
                    if btype == "avcC":
                        codec_config = bytes(buf[ps:pe])
                        break

    def full(btype):
        found = _find(buf, *stbl, btype)
        return None if found is None else (found[0] + 4, found[1])  # skip ver/flags

    # stts -> per-sample decode times
    s, _ = full("stts")
    (n_runs,) = struct.unpack(">I", buf[s : s + 4])
    times: list[int] = []
    t = 0
    p = s + 4
    for _ in range(n_runs):
        cnt, delta = struct.unpack(">II", buf[p : p + 8])
        for _ in range(cnt):
            times.append(t)
            t += delta
        p += 8

    # stsz -> sizes
    s, _ = full("stsz")
    fixed, count = struct.unpack(">II", buf[s : s + 8])
    if fixed:
        sizes = [fixed] * count
    else:
        sizes = list(
            struct.unpack(f">{count}I", buf[s + 8 : s + 8 + 4 * count])
        )

    # stss -> keyframe sample numbers (absent = every sample is a sync point)
    sync = full("stss")
    if sync is None:
        keyframes = None
    else:
        s, _ = sync
        (n,) = struct.unpack(">I", buf[s : s + 4])
        keyframes = {
            v - 1 for v in struct.unpack(f">{n}I", buf[s + 4 : s + 4 + 4 * n])
        }

    # stsc runs + stco/co64 -> absolute offsets
    s, _ = full("stsc")
    (n,) = struct.unpack(">I", buf[s : s + 4])
    stsc = [
        struct.unpack(">III", buf[s + 4 + 12 * i : s + 16 + 12 * i])
        for i in range(n)
    ]
    co = full("stco")
    if co is not None:
        s, _ = co
        (n,) = struct.unpack(">I", buf[s : s + 4])
        chunk_offsets = list(
            struct.unpack(f">{n}I", buf[s + 4 : s + 4 + 4 * n])
        )
    else:
        s, _ = full("co64")
        (n,) = struct.unpack(">I", buf[s : s + 4])
        chunk_offsets = list(
            struct.unpack(f">{n}Q", buf[s + 4 : s + 4 + 8 * n])
        )

    if len(times) < len(sizes):
        raise ValueError(
            f"stts covers {len(times)} samples but stsz declares "
            f"{len(sizes)} (corrupt timing table)"
        )
    # expand sample-to-chunk runs into per-sample offsets
    samples: list[Mp4Sample] = []
    si = 0
    for ri, (first_chunk, per_chunk, _desc) in enumerate(stsc):
        last_chunk = (
            stsc[ri + 1][0] - 1 if ri + 1 < len(stsc) else len(chunk_offsets)
        )
        for ci in range(first_chunk - 1, last_chunk):
            off = chunk_offsets[ci]
            for _ in range(per_chunk):
                if si >= len(sizes):
                    break
                samples.append(
                    Mp4Sample(
                        index=si,
                        offset=off,
                        size=sizes[si],
                        time_s=times[si] / timescale,
                        keyframe=keyframes is None or si in keyframes,
                    )
                )
                off += sizes[si]
                si += 1
    if si != len(sizes):
        raise ValueError(
            f"sample tables inconsistent: placed {si} of {len(sizes)} samples"
        )
    return Mp4Track(
        handler=handler,
        codec=codec,
        codec_config=codec_config,
        timescale=timescale,
        width=width,
        height=height,
        samples=samples,
    )


def extract_frames(
    payload: bytes,
    every_n: int | None = None,
    n_frames: int | None = None,
    keyframes_only: bool = False,
) -> list[tuple[int, float, bytes]]:
    """Slice sampled video frames out of an MP4 payload WITHOUT decoding:
    -> [(frame index, timestamp seconds, compressed frame bytes)].

    Sampling: ``keyframes_only`` restricts to sync samples (the cheap
    seek points a real pipeline samples); then ``every_n`` takes every
    n-th of those, or ``n_frames`` takes an even spread."""
    video = [t for t in parse_mp4(payload) if t.handler == "vide"]
    if not video:
        raise ValueError("no video track")
    samples = video[0].samples
    if keyframes_only:
        samples = [s for s in samples if s.keyframe]
    if every_n is not None:
        samples = samples[::every_n]
    elif n_frames is not None and samples:
        step = max(len(samples) // max(n_frames, 1), 1)
        samples = samples[::step][:n_frames]
    for s in samples:
        if s.offset + s.size > len(payload):
            raise ValueError(
                f"sample {s.index} byte range [{s.offset}, "
                f"{s.offset + s.size}) extends past EOF ({len(payload)}): "
                "truncated mdat"
            )
    return [
        (s.index, s.time_s, payload[s.offset : s.offset + s.size])
        for s in samples
    ]


# ---------------------------------------------------------------------------
# fixture builder
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def build_mp4(
    frames: list[bytes],
    fps: int = 10,
    width: int = 64,
    height: int = 48,
    keyframe_every: int = 5,
    codec: bytes = b"mp4v",
    avcc: bytes | None = None,
) -> bytes:
    """Minimal valid single-video-track MP4: ftyp + mdat (frame bytes,
    one chunk) + moov with real stts/stss/stsc/stsz/stco tables."""
    timescale = fps * 100
    delta = 100
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    data_start = len(ftyp) + 8  # mdat header is 8 bytes

    n = len(frames)
    stts = _box(b"stts", struct.pack(">IIII", 0, 1, n, delta))
    keyframes = list(range(1, n + 1, keyframe_every))
    stss = _box(
        b"stss",
        struct.pack(">II", 0, len(keyframes))
        + struct.pack(f">{len(keyframes)}I", *keyframes),
    )
    stsc = _box(b"stsc", struct.pack(">IIIII", 0, 1, 1, n, 1))
    stsz = _box(
        b"stsz",
        struct.pack(">III", 0, 0, n)
        + struct.pack(f">{n}I", *[len(f) for f in frames]),
    )
    stco = _box(b"stco", struct.pack(">III", 0, 1, data_start))
    entry = struct.pack(">I", 86) + codec + bytes(6) + struct.pack(">H", 1)
    entry += bytes(16)  # pre-defined/reserved
    entry += struct.pack(">HH", width, height)
    entry += struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
    entry += struct.pack(">I", 0) + struct.pack(">H", 1)
    entry += bytes(32)  # compressor name
    entry += struct.pack(">Hh", 24, -1)
    if avcc is not None:  # avc1-style entry: append the avcC child box
        entry += _box(b"avcC", avcc)
        entry = struct.pack(">I", len(entry)) + entry[4:]  # patch size
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + entry)
    stbl = _box(b"stbl", stsd + stts + stss + stsc + stsz + stco)
    vmhd = _box(b"vmhd", struct.pack(">I", 1) + bytes(8))
    dref = _box(
        b"dref", struct.pack(">II", 0, 1) + _box(b"url ", struct.pack(">I", 1))
    )
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    duration = n * delta
    mdhd = _box(
        b"mdhd", struct.pack(">IIIIIHH", 0, 0, 0, timescale, duration, 0x55C4, 0)
    )
    hdlr = _box(b"hdlr", struct.pack(">II", 0, 0) + b"vide" + bytes(12) + b"v\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _box(
        b"tkhd",
        struct.pack(">IIIII", 0x7, 0, 0, 1, 0)
        + struct.pack(">I", duration)
        + bytes(8)
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _box(
        b"mvhd",
        struct.pack(">IIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + bytes(10)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24)
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
