"""Baseline JPEG codec (ITU-T T.81), numpy + stdlib only.

Closes the JPEG half of the multimodal decode seam
(`sources/multimodal.decode_to_array`) the same way `netcdf3.py` /
`hdf5_min.py` closed the granule formats: implemented from the public
spec, not from any codec's source. Scope — baseline sequential DCT,
8-bit, 1 or 3 components, 4:4:4 / 4:2:2 / 4:2:0 sampling, restart
markers; progressive/arithmetic/12-bit are out of scope and raise.

The encoder (quality-scaled Annex K quantization tables, Annex K.3
Huffman tables, optional 4:2:0 subsampling) exists to produce REAL
JPEG streams for tests and synthetic media tables. To avoid
symmetric-bug blindness in round-trip tests, the unit suite also pins
the building blocks independently (DCT/IDCT inverse pair, Huffman
canonical-code construction, zigzag involution) — see
`tests/test_jpeg.py`.

Performance note: entropy (Huffman) decode is sequential by nature and
runs in interpreted Python here — fine for fixture-sized images inside
`mapInPandas` tasks; PIL remains the fast path in
`multimodal.decode_to_array` when importable. The block transform is
vectorized (stacked 8×8 matmuls).
"""

from __future__ import annotations

import struct

import numpy as np

# -- constants from the public spec (T.81 Annex K) --------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal DCT-II basis: block_dct = C @ B @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_C *= 0.5
_C[0, :] *= 1.0 / np.sqrt(2.0)


def dct2(blocks: np.ndarray) -> np.ndarray:
    """Forward 2-D DCT on stacked (n, 8, 8) blocks."""
    return _C @ blocks @ _C.T


def idct2(coefs: np.ndarray) -> np.ndarray:
    """Inverse 2-D DCT on stacked (n, 8, 8) blocks."""
    return _C.T @ coefs @ _C


def build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C canonical code generation: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Canonical Huffman decode via per-length (min, max, value-offset)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bit()
            if code <= self.maxcode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("invalid Huffman code in entropy stream")


class _BitReader:
    """MSB-first reader over an entropy segment with 0xFF00 de-stuffing."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.cur = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            self.cur = b
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.nbits = 0


def _extend(v: int, n: int) -> int:
    """T.81 EXTEND: map the n-bit magnitude code to its signed value."""
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


def _magnitude(v: int) -> int:
    """Number of bits needed for the JPEG magnitude category of v."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.cur = (self.cur << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.cur = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # 1-pad


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG-style quality scaling of the Annex K tables (public formula)."""
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.floor((table * scale + 50) / 100)
    return np.clip(q, 1, 255)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a plane to 8-multiples by edge replication, split into blocks
    in raster order -> (blocks (n,8,8), blocks_y, blocks_x)."""
    h, w = plane.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    by, bx = H // 8, W // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, by, bx


def _encode_block(
    writer: _BitWriter,
    coefs: np.ndarray,  # quantized, zigzag order, int
    dc_pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    diff = int(coefs[0]) - dc_pred
    n = _magnitude(diff)
    code, length = dc_codes[n]
    writer.write(code, length)
    if n:
        writer.write(diff if diff >= 0 else diff + (1 << n) - 1, n)
    run = 0
    last_nz = int(np.max(np.nonzero(coefs)[0])) if np.any(coefs[1:]) else 0
    for k in range(1, 64):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        n = _magnitude(v)
        code, length = ac_codes[(run << 4) | n]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << n) - 1, n)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(coefs[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline JFIF stream; ``subsample=True`` uses 4:2:0 chroma;
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (what camera/libjpeg streams commonly do)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(img.astype(np.float64))
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            H, W = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = np.pad(cb, ((0, H - h), (0, W - w)), mode="edge")
            crp = np.pad(cr, ((0, H - h), (0, W - w)), mode="edge")
            cb = cbp.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tid, q in ((0, qy),) + (((1, qc),) if not gray else ()):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(q[z]) for z in ZIGZAG)
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    samp_y = 0x22 if (subsample and not gray) else 0x11
    comps = [(1, samp_y, 0)] + ([] if gray else [(2, 0x11, 1), (3, 0x11, 1)])
    for cid, samp, qid in comps:
        out += bytes([cid, samp, qid])
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        tables += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid, _, qid in comps:
        out += bytes([cid, 0x00 if cid == 1 else 0x11])
    out += b"\x00\x3f\x00"  # Ss, Se, Ah/Al

    dc_codes_y = build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes_y = build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_codes_c = build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_codes_c = build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    # per-component quantized blocks (raster order)
    comp_blocks = []
    for i, plane in enumerate(planes):
        q = qy if i == 0 else qc
        blocks, by, bx = _to_blocks(plane - 128.0)
        coefs = dct2(blocks)
        quant = np.round(coefs / q.reshape(8, 8)).astype(np.int32)
        zz = quant.reshape(-1, 64)[:, ZIGZAG]
        comp_blocks.append((zz, by, bx))

    writer = _BitWriter()
    preds = [0] * len(planes)
    rst_n = 0

    def maybe_restart(mcu_index: int) -> None:
        nonlocal rst_n, preds
        if restart_interval and mcu_index and mcu_index % restart_interval == 0:
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + (rst_n % 8)])
            rst_n += 1
            preds = [0] * len(planes)

    if gray or not subsample:
        # 1×1 sampling: MCU = one block per component, interleaved
        nblocks = comp_blocks[0][1] * comp_blocks[0][2]
        for bi in range(nblocks):
            maybe_restart(bi)
            for ci, (zz, _, _) in enumerate(comp_blocks):
                dc = dc_codes_y if ci == 0 else dc_codes_c
                ac = ac_codes_y if ci == 0 else ac_codes_c
                preds[ci] = _encode_block(writer, zz[bi], preds[ci], dc, ac)
    else:
        # 4:2:0 MCU: 4 luma blocks (2×2) + 1 Cb + 1 Cr
        _, by_y, bx_y = comp_blocks[0]
        mcu_y, mcu_x = -(-by_y // 2), -(-bx_y // 2)
        for my in range(mcu_y):
            for mx in range(mcu_x):
                maybe_restart(my * mcu_x + mx)
                for dy in range(2):
                    for dx in range(2):
                        yb = min(2 * my + dy, by_y - 1)
                        xb = min(2 * mx + dx, bx_y - 1)
                        preds[0] = _encode_block(
                            writer,
                            comp_blocks[0][0][yb * bx_y + xb],
                            preds[0],
                            dc_codes_y,
                            ac_codes_y,
                        )
                for ci in (1, 2):
                    zz, by_c, bx_c = comp_blocks[ci]
                    yb, xb = min(my, by_c - 1), min(mx, bx_c - 1)
                    preds[ci] = _encode_block(
                        writer, zz[yb * bx_c + xb], preds[ci], dc_codes_c, ac_codes_c
                    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG -> uint8 array, (h, w) if single-component
    else (h, w, 3) RGB.

    Raises ``ValueError`` on ANY malformed input (truncation, bit rot,
    wrong process) — internal faults are converted at this boundary so
    distributed readers can quarantine bad files with one except."""
    try:
        return _decode_jpeg(payload)
    except ValueError:
        raise
    except (
        IndexError,
        KeyError,
        struct.error,
        OverflowError,
        ZeroDivisionError,
        MemoryError,
    ) as exc:
        raise ValueError(
            f"corrupt JPEG stream: {type(exc).__name__}: {exc}"
        ) from exc


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            q = 0
            while q < len(body):
                pq, tq = body[q] >> 4, body[q] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                # kept in ZIGZAG order: dequantization multiplies the
                # zigzag-ordered coefficient vector elementwise
                quant[tq] = np.frombuffer(
                    body[q + 1 : q + 65], dtype=np.uint8
                ).astype(np.float64)
                q += 65
        elif marker == 0xC4:  # DHT
            q = 0
            while q < len(body):
                tc, th = body[q] >> 4, body[q] & 0x0F
                bits = list(body[q + 1 : q + 17])
                nvals = sum(bits)
                vals = list(body[q + 17 : q + 17 + nvals])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
                q += 17 + nvals
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, h, w, ncomp = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            # a corrupt header can declare 65535×65535 and OOM the task on
            # plane allocation; even pathological real JPEGs stay far
            # under 4096 pixels per payload byte (an 8×8 block costs >=2
            # bits), so beyond that the header is lying
            if h == 0 or w == 0 or h * w > max(len(payload), 64) * 4096:
                raise ValueError(
                    f"implausible SOF dimensions {h}x{w} for "
                    f"{len(payload)}-byte payload"
                )
            comps = []
            for i in range(ncomp):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (marker 0xFF{marker:02X}); "
                "baseline sequential only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            data_start = pos + seglen
            return _decode_scan(
                payload, data_start, frame, scan, quant, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    raise ValueError("no scan data found")


def _decode_scan(
    payload, pos, frame, scan, quant, huff_dc, huff_ac, restart_interval
):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_x = -(-w // (8 * hmax))
    mcu_y = -(-h // (8 * vmax))
    # per-component block grids (MCU-padded)
    planes = {}
    for cid, hi, vi, tq in comps:
        planes[cid] = np.zeros((mcu_y * vi * 8, mcu_x * hi * 8))

    # entropy segment runs to the next non-RST marker
    reader = _BitReader(payload[pos:])
    preds = {cid: 0 for cid, *_ in comps}
    scan_info = {cs: (td, ta) for cs, td, ta in scan}
    comp_by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}

    mcu_count = 0
    for my in range(mcu_y):
        for mx in range(mcu_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align()
                if (
                    reader.data[reader.pos] == 0xFF
                    and 0xD0 <= reader.data[reader.pos + 1] <= 0xD7
                ):
                    reader.pos += 2
                preds = {cid: 0 for cid in preds}
            for cid, *_ in comps:
                hi, vi, tq = comp_by_id[cid]
                td, ta = scan_info[cid]
                for by in range(vi):
                    for bx in range(hi):
                        zz = _decode_block(
                            reader, huff_dc[td], huff_ac[ta], preds, cid
                        )
                        coefs = np.zeros(64)
                        coefs[ZIGZAG] = zz * quant[tq]
                        block = idct2(coefs.reshape(8, 8)) + 128.0
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # upsample each component to full resolution and crop
    full = []
    for cid, hi, vi, tq in comps:
        p = planes[cid]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        # round, don't floor: a flooring astype would bias grayscale a
        # half-LSB low relative to the RGB path (and libjpeg)
        return np.round(np.clip(full[0], 0, 255)).astype(np.uint8)
    rgb = _ycbcr_to_rgb(full[0], full[1], full[2])
    return np.round(rgb).astype(np.uint8)


def _decode_block(reader, dc_table, ac_table, preds, cid) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int64)
    n = dc_table.decode(reader)
    diff = _extend(reader.receive(n), n)
    preds[cid] += diff
    zz[0] = preds[cid]
    k = 1
    while k < 64:
        rs = ac_table.decode(reader)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.receive(size), size)
        k += 1
    return zz
