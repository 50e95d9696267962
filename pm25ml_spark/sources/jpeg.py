"""Baseline JPEG codec (ITU-T T.81), numpy + stdlib only.

Closes the JPEG half of the multimodal decode seam
(`sources/multimodal.decode_to_array`) the same way `netcdf3.py` /
`hdf5_min.py` closed the granule formats: implemented from the public
spec, not from any codec's source. Scope — baseline sequential DCT
(SOF0/1) AND progressive (SOF2, spectral selection + successive
approximation, T.81 Annex G — a large share of real web-crawl images),
8-bit, 1 or 3 components, 4:4:4 / 4:2:2 / 4:2:0 sampling, restart
markers; lossless/arithmetic/12-bit are out of scope and raise.

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
# progressive encoder (SOF2) — spectral selection + successive
# approximation, mirroring T.81 Annex G.1.1. Exists to produce REAL
# progressive streams for the decoder's round-trip tests (the scan
# script is the IJG default shape). 4:4:4 / grayscale only; the AC
# tables are a deterministic flat 256-symbol table (every progressive
# symbol incl. EOBn encodable; compression is secondary for fixtures).
# ---------------------------------------------------------------------------

FLAT_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0]
FLAT_AC_VALS = list(range(256))


class _ACProgEncoder:
    """Shared EOB-run machinery for AC first/refinement scans."""

    def __init__(self, writer: _BitWriter, codes: dict):
        self.w = writer
        self.codes = codes
        self.eobrun = 0
        self.be: list[int] = []  # correction bits buffered across EOB blocks

    def _sym(self, s: int) -> None:
        code, length = self.codes[s]
        self.w.write(code, length)

    def emit_eobrun(self) -> None:
        if self.eobrun:
            nb = self.eobrun.bit_length() - 1
            self._sym(nb << 4)
            if nb:
                self.w.write(self.eobrun - (1 << nb), nb)
            self.eobrun = 0
        for b in self.be:
            self.w.write(b, 1)
        self.be = []

    def first_block(self, zz: np.ndarray, ss: int, se: int, al: int) -> None:
        r = 0
        for k in range(ss, se + 1):
            t = int(zz[k])
            mag = (t if t >= 0 else -t) >> al
            if mag == 0:
                r += 1
                continue
            self.emit_eobrun()
            while r > 15:
                self._sym(0xF0)
                r -= 16
            nb = mag.bit_length()
            self._sym((r << 4) | nb)
            v = mag if t >= 0 else -mag
            self.w.write(v if v >= 0 else v + (1 << nb) - 1, nb)
            r = 0
        if r:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()

    def refine_block(self, zz: np.ndarray, ss: int, se: int, al: int) -> None:
        absv = [(abs(int(zz[k])) >> al) for k in range(ss, se + 1)]
        eob = -1  # band index of the LAST newly-nonzero coefficient
        for i, a in enumerate(absv):
            if a == 1:
                eob = i
        r = 0
        br: list[int] = []
        for i, a in enumerate(absv):
            if a == 0:
                r += 1
                continue
            # flush ZRLs at EVERY nonzero (history included) so buffered
            # correction bits stay positionally inside the 16-zero window
            # the decoder walks; folded into EOB when no new coef follows
            while r > 15 and i <= eob:
                self.emit_eobrun()
                self._sym(0xF0)
                r -= 16
                for b in br:
                    self.w.write(b, 1)
                br = []
            if a > 1:  # history coefficient: correction bit, run continues
                br.append(a & 1)
                continue
            self.emit_eobrun()
            self._sym((r << 4) | 1)
            self.w.write(1 if int(zz[ss + i]) > 0 else 0, 1)
            for b in br:
                self.w.write(b, 1)
            br = []
            r = 0
        if r or br:
            self.eobrun += 1
            self.be.extend(br)
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """Encode uint8 grayscale / RGB as a PROGRESSIVE (SOF2) JFIF stream.

    Same quantized coefficients as :func:`encode_jpeg` at the same
    quality (and the same 4:2:0 downsampling when ``subsample=True`` —
    the real-crawl default shape), so ``decode_jpeg(progressive)`` must
    equal ``decode_jpeg(baseline)`` bit-for-bit — the round-trip oracle
    the tests pin. Scan script: DC(Al=1) → Y AC 1-5 (Al=2) → Cr/Cb AC
    1-63 (Al=1) → Y AC 6-63 (Al=2) → Y AC refine (2→1) → DC refine →
    Cr/Cb/Y AC refine to Al=0 (the IJG default shape). DC scans run in
    interleaved MCU order over the MCU-padded grids; AC scans are
    non-interleaved over each component's OWN ceil-dims block grid
    (T.81 A.2.2 — a strict subset of the padded grid at 4:2:0)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive expects uint8")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)
    sub = subsample and not gray
    if gray:
        planes = [img.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(img.astype(np.float64))
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if sub:
            H, W = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = np.pad(cb, ((0, H - h), (0, W - w)), mode="edge")
            crp = np.pad(cr, ((0, H - h), (0, W - w)), mode="edge")
            cb = cbp.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]

    ncomp = 1 if gray else 3
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * ncomp
    hmax = max(s[0] for s in samp[:ncomp])
    vmax = max(s[1] for s in samp[:ncomp])
    mcu_x = -(-w // (8 * hmax))
    mcu_y = -(-h // (8 * vmax))

    comp_zz = []  # per comp: (zz (by_pad*bx_pad, 64), bx_pad, bx_n, by_n)
    for i, plane in enumerate(planes):
        hi, vi = samp[i]
        q = qy if i == 0 else qc
        # pad the plane so blocking yields the MCU-padded grid the
        # interleaved DC scan walks (edge replication, like baseline)
        ph, pw = mcu_y * vi * 8, mcu_x * hi * 8
        padded = np.pad(
            plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        blocks, by_pad, bx_pad = _to_blocks(padded - 128.0)
        quant = np.round(dct2(blocks) / q.reshape(8, 8)).astype(np.int32)
        zz = quant.reshape(-1, 64)[:, ZIGZAG]
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        comp_zz.append((zz, bx_pad, -(-cw // 8), -(-ch // 8)))

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tid, q in ((0, qy),) + (((1, qc),) if not gray else ()):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(q[z]) for z in ZIGZAG)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    samp_y = 0x22 if sub else 0x11
    comps = [(1, samp_y, 0)] + ([] if gray else [(2, 0x11, 1), (3, 0x11, 1)])
    for cid, sampb, qid in comps:
        out += bytes([cid, sampb, qid])
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, FLAT_AC_BITS, FLAT_AC_VALS)]
    if not gray:
        tables.append((0x01, DC_CHROMA_BITS, DC_CHROMA_VALS))
    for tc_th, bits, vals in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)

    dc_codes = [build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    if not gray:
        dc_codes += [build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)] * 2
    ac_codes = build_huffman_codes(FLAT_AC_BITS, FLAT_AC_VALS)

    def sos(sel, ss, se, ah, al):
        seg = bytes([len(sel)])
        for cid, td, ta in sel:
            seg += bytes([cid, (td << 4) | ta])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(seg)) + seg

    def dc_blocks_mcu_order():
        """(ci, flat block index) in interleaved MCU order."""
        for my in range(mcu_y):
            for mx in range(mcu_x):
                for ci in range(ncomp):
                    hi, vi = samp[ci]
                    bx_pad = comp_zz[ci][1]
                    for byi in range(vi):
                        for bxi in range(hi):
                            yield ci, (my * vi + byi) * bx_pad + (mx * hi + bxi)

    def dc_first(al: int) -> bytes:
        wtr = _BitWriter()
        preds = [0] * ncomp
        for ci, bi in dc_blocks_mcu_order():
            v = int(comp_zz[ci][0][bi][0]) >> al  # arithmetic shift (T.81 DC)
            diff = v - preds[ci]
            preds[ci] = v
            n = _magnitude(diff)
            code, length = dc_codes[ci][n]
            wtr.write(code, length)
            if n:
                wtr.write(diff if diff >= 0 else diff + (1 << n) - 1, n)
        wtr.flush()
        return bytes(wtr.out)

    def dc_refine(al: int) -> bytes:
        wtr = _BitWriter()
        for ci, bi in dc_blocks_mcu_order():
            wtr.write((int(comp_zz[ci][0][bi][0]) >> al) & 1, 1)
        wtr.flush()
        return bytes(wtr.out)

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        zz, bx_pad, bx_n, by_n = comp_zz[ci]
        wtr = _BitWriter()
        enc = _ACProgEncoder(wtr, ac_codes)
        for byi in range(by_n):  # non-interleaved: the component's own grid
            for bxi in range(bx_n):
                if ah == 0:
                    enc.first_block(zz[byi * bx_pad + bxi], ss, se, al)
                else:
                    enc.refine_block(zz[byi * bx_pad + bxi], ss, se, al)
        enc.emit_eobrun()
        wtr.flush()
        return bytes(wtr.out)

    all_dc = [(cid, 0 if i == 0 else 1, 0) for i, (cid, _, _) in enumerate(comps)]
    out += sos(all_dc, 0, 0, 0, 1) + dc_first(1)
    out += sos([(1, 0, 0)], 1, 5, 0, 2) + ac_scan(0, 1, 5, 0, 2)
    if not gray:
        out += sos([(3, 0, 0)], 1, 63, 0, 1) + ac_scan(2, 1, 63, 0, 1)
        out += sos([(2, 0, 0)], 1, 63, 0, 1) + ac_scan(1, 1, 63, 0, 1)
    out += sos([(1, 0, 0)], 6, 63, 0, 2) + ac_scan(0, 6, 63, 0, 2)
    out += sos([(1, 0, 0)], 1, 63, 2, 1) + ac_scan(0, 1, 63, 2, 1)
    out += sos(all_dc, 0, 0, 1, 0) + dc_refine(0)
    if not gray:
        out += sos([(3, 0, 0)], 1, 63, 1, 0) + ac_scan(2, 1, 63, 1, 0)
        out += sos([(2, 0, 0)], 1, 63, 1, 0) + ac_scan(1, 1, 63, 1, 0)
    out += sos([(1, 0, 0)], 1, 63, 1, 0) + ac_scan(0, 1, 63, 1, 0)
    out += b"\xff\xd9"
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
    progressive = False
    coef_store: dict[int, np.ndarray] = {}
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
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
            if progressive:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcu_x = -(-w // (8 * hmax))
                mcu_y = -(-h // (8 * vmax))
                for cid, hi, vi, tq in comps:
                    coef_store[cid] = np.zeros(
                        (mcu_y * vi, mcu_x * hi, 64), dtype=np.int32
                    )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (marker 0xFF{marker:02X}); "
                "baseline sequential and progressive only"
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
            if not progressive:
                return _decode_scan(
                    payload, data_start, frame, scan, quant, huff_dc,
                    huff_ac, restart_interval,
                )
            params = (
                body[1 + 2 * ns],  # Ss
                body[2 + 2 * ns],  # Se
                body[3 + 2 * ns] >> 4,  # Ah
                body[3 + 2 * ns] & 0x0F,  # Al
            )
            end = _entropy_end(payload, data_start)
            _decode_progressive_scan(
                payload, data_start, end, frame, scan, params, huff_dc,
                huff_ac, restart_interval, coef_store,
            )
            pos = end
            continue
        pos += seglen
    if progressive and coef_store:
        return _reconstruct_progressive(frame, coef_store, quant)
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


# ---------------------------------------------------------------------------
# progressive (SOF2) decoding — T.81 Annex G.1.2, spectral selection +
# successive approximation. Coefficients accumulate across scans in
# per-component zigzag arrays; dequantize + IDCT happen once at EOI.
# ---------------------------------------------------------------------------


def _entropy_end(payload: bytes, start: int) -> int:
    """First non-RST, non-stuffed marker after ``start``: the scan's
    entropy segment ends there."""
    i = start
    n = len(payload)
    while i < n - 1:
        if payload[i] == 0xFF:
            nxt = payload[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    return n


def _refine_nonzero(reader: _BitReader, zz: np.ndarray, lo: int, hi: int, p1: int) -> None:
    """Append correction bits to already-nonzero coefficients in
    zz[lo..hi] (G.1.2.3: one bit per nonzero coefficient)."""
    for i in range(lo, hi + 1):
        if zz[i]:
            if reader.bit() and (abs(int(zz[i])) & p1) == 0:
                zz[i] += p1 if zz[i] > 0 else -p1


def _ac_first_block(reader, ac, zz, ss, se, al, eobrun) -> int:
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = ac.decode(reader)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC run past end of spectral band")
        zz[k] = _extend(reader.receive(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, ac, zz, ss, se, al, eobrun) -> int:
    p1 = 1 << al
    if eobrun:
        _refine_nonzero(reader, zz, ss, se, p1)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = ac.decode(reader)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:  # EOB run starts; current block still refines
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.receive(r)
                _refine_nonzero(reader, zz, k, se, p1)
                return eobrun
            # ZRL: pass over 16 zero-history coefficients
            cnt = 16
            while k <= se and cnt:
                if zz[k]:
                    if reader.bit() and (abs(int(zz[k])) & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else -p1
                else:
                    cnt -= 1
                k += 1
            continue
        if s != 1:
            raise ValueError("refinement scan magnitude must be 1")
        newval = p1 if reader.bit() else -p1
        # skip r zero-history coefficients, refining nonzero on the way
        while k <= se:
            if zz[k]:
                if reader.bit() and (abs(int(zz[k])) & p1) == 0:
                    zz[k] += p1 if zz[k] > 0 else -p1
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if k > se:
            raise ValueError("refinement placement past end of band")
        zz[k] = newval
        k += 1
    return 0


def _decode_progressive_scan(
    payload, pos, end, frame, scan, params, huff_dc, huff_ac,
    restart_interval, coef_store,
):
    """One SOS worth of entropy data into ``coef_store`` (cid ->
    (blocks_y, blocks_x, 64) int32, zigzag order). Returns nothing; the
    caller advances to ``end``."""
    h, w, comps = frame
    ss, se, ah, al = params
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    comp_by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    scan_info = {cs: (td, ta) for cs, td, ta in scan}
    reader = _BitReader(payload[pos:end])
    preds = {cid: 0 for cid in scan_info}
    state = {"eobrun": 0, "mcu": 0}

    def maybe_restart():
        if restart_interval and state["mcu"] and state["mcu"] % restart_interval == 0:
            reader.align()
            if (
                reader.pos + 1 < len(reader.data)
                and reader.data[reader.pos] == 0xFF
                and 0xD0 <= reader.data[reader.pos + 1] <= 0xD7
            ):
                reader.pos += 2
            for cid in preds:
                preds[cid] = 0
            state["eobrun"] = 0

    if ss == 0:  # DC scan (interleaved or single-component)
        if se != 0:
            raise ValueError("DC progressive scan must have Se=0")
        mcu_x = -(-w // (8 * hmax))
        mcu_y = -(-h // (8 * vmax))
        interleaved = len(scan) > 1
        if not interleaved:
            cid = scan[0][0]
            hi, vi, _ = comp_by_id[cid]
            cw = -(-(w * hi) // hmax)
            ch = -(-(h * vi) // vmax)
            bx_n, by_n = -(-cw // 8), -(-ch // 8)
            for by in range(by_n):
                for bx in range(bx_n):
                    maybe_restart()
                    zz = coef_store[cid][by, bx]
                    _dc_prog(reader, huff_dc, scan_info, preds, cid, zz, ah, al)
                    state["mcu"] += 1
            return
        for my in range(mcu_y):
            for mx in range(mcu_x):
                maybe_restart()
                for cid, hi, vi, tq in comps:
                    for by in range(vi):
                        for bx in range(hi):
                            zz = coef_store[cid][my * vi + by, mx * hi + bx]
                            _dc_prog(
                                reader, huff_dc, scan_info, preds, cid, zz, ah, al
                            )
                state["mcu"] += 1
        return

    # AC scan: always single-component, raster order over the
    # component's OWN (non-MCU-padded) block grid
    if len(scan) != 1:
        raise ValueError("AC progressive scan must be single-component")
    cid = scan[0][0]
    td, ta = scan_info[cid]
    hi, vi, _ = comp_by_id[cid]
    cw = -(-(w * hi) // hmax)
    ch = -(-(h * vi) // vmax)
    bx_n, by_n = -(-cw // 8), -(-ch // 8)
    if ta not in huff_ac:  # both first and refinement passes decode symbols
        raise ValueError(f"AC table {ta} undefined")
    for by in range(by_n):
        for bx in range(bx_n):
            maybe_restart()
            zz = coef_store[cid][by, bx]
            if ah == 0:
                state["eobrun"] = _ac_first_block(
                    reader, huff_ac[ta], zz, ss, se, al, state["eobrun"]
                )
            else:
                state["eobrun"] = _ac_refine_block(
                    reader, huff_ac[ta], zz, ss, se, al, state["eobrun"]
                )
            state["mcu"] += 1


def _dc_prog(reader, huff_dc, scan_info, preds, cid, zz, ah, al) -> None:
    if ah == 0:  # first pass: Huffman diff, shifted by the point transform
        td, _ = scan_info[cid]
        n = huff_dc[td].decode(reader)
        preds[cid] += _extend(reader.receive(n), n)
        # explicit masked int32 cast: a hostile stream can walk the DC
        # predictor past 2^31 (unbounded diff accumulation), and the
        # implicit out-of-bound Python-int -> int32 store is a NumPy 1.x
        # DeprecationWarning / NumPy 2 OverflowError. Spec-valid streams
        # never wrap; corrupt ones decode to garbage pixels, not a crash.
        zz[0] = np.int32(((preds[cid] << al) + 2**31) % 2**32 - 2**31)
    else:  # refinement: one raw bit
        if reader.bit():
            zz[0] |= 1 << al


def _reconstruct_progressive(frame, coef_store, quant):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for cid, hi, vi, tq in comps:
        coefs = coef_store[cid].astype(np.float64)  # (by, bx, 64) zigzag
        by, bx = coefs.shape[:2]
        deq = np.zeros_like(coefs)
        deq[:, :, ZIGZAG] = coefs * quant[tq]
        blocks = idct2(deq.reshape(by * bx, 8, 8)) + 128.0
        plane = (
            blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        if hi != hmax or vi != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        full.append(plane[:h, :w])
    if len(full) == 1:
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
