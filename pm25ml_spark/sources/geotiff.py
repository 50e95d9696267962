"""Minimal GeoTIFF codec (numpy + stdlib zlib, from the TIFF 6.0 and
OGC GeoTIFF 1.1 specs) for single-band float rasters.

The terminal raster family already writes NetCDF-3, netCDF-4/HDF5 and
Zarr; GeoTIFF is the interchange format every GIS stack ingests, so the
sink grows a per-day ``write_geotiff`` / ``read_geotiff`` pair:

- little-endian classic TIFF: header ``II*\\0`` + one IFD;
- one strip per row band of ``rows_per_strip`` rows, SampleFormat=IEEE
  float (339=3), BitsPerSample 32, Photometric min-is-black,
  Compression 1 (none) or 8 (zlib/"Adobe deflate");
- georeferencing via ModelPixelScaleTag (33550), ModelTiepointTag
  (33922) and a GeoKeyDirectory (34735) declaring a projected CRS
  (GTModelType=1) with a user-supplied EPSG code; nodata via the GDAL
  ASCII convention (42113).

Values are written north-up (row 0 = max y), the GeoTIFF convention,
from the engine's ascending-y cube — the reader flips back, and the
round-trip test pins the equality.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_II = b"II"
_MAGIC = 42

# TIFF tag ids
_T_WIDTH, _T_LENGTH, _T_BITS, _T_COMP = 256, 257, 258, 259
_T_PHOTO, _T_STRIP_OFF, _T_SPP, _T_ROWS_PER_STRIP = 262, 273, 277, 278
_T_STRIP_CNT, _T_SAMPLE_FMT = 279, 339
_T_PREDICTOR = 317
_T_TILE_W, _T_TILE_L, _T_TILE_OFF, _T_TILE_CNT = 322, 323, 324, 325
_T_PIXEL_SCALE, _T_TIEPOINT, _T_GEOKEYS, _T_NODATA = 33550, 33922, 34735, 42113

_TYPE_SHORT, _TYPE_LONG, _TYPE_ASCII, _TYPE_DOUBLE = 3, 4, 2, 12
_TYPE_SIZE = {_TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_ASCII: 1, _TYPE_DOUBLE: 8}


def _pack_values(ttype: int, values) -> bytes:
    if ttype == _TYPE_SHORT:
        return struct.pack(f"<{len(values)}H", *values)
    if ttype == _TYPE_LONG:
        return struct.pack(f"<{len(values)}I", *values)
    if ttype == _TYPE_DOUBLE:
        return struct.pack(f"<{len(values)}d", *values)
    if ttype == _TYPE_ASCII:
        return bytes(values)
    raise ValueError(ttype)


def write_geotiff(
    path: str,
    grid: np.ndarray,
    ys: np.ndarray,
    xs: np.ndarray,
    epsg: int = 7755,
    compress: bool = True,
    nodata: float = float("nan"),
    rows_per_strip: int = 64,
) -> str:
    """Write one (y, x) float32 grid (ascending y) as a GeoTIFF."""
    grid = np.asarray(grid, dtype=np.float32)
    h, w = grid.shape
    if (h, w) != (len(ys), len(xs)):
        raise ValueError("grid shape does not match coordinate axes")
    north_up = grid[::-1, :]  # row 0 = northmost
    dx = float(np.diff(xs).mean()) if w > 1 else 1.0
    dy = abs(float(np.diff(ys).mean())) if h > 1 else 1.0
    # tiepoint: raster (0,0) upper-left corner -> model coordinates
    origin_x = float(xs[0]) - dx / 2.0
    origin_y = float(ys[-1]) + dy / 2.0

    strips = []
    for r0 in range(0, h, rows_per_strip):
        raw = np.ascontiguousarray(north_up[r0 : r0 + rows_per_strip]).tobytes()
        strips.append(zlib.compress(raw, 6) if compress else raw)

    # GeoKeyDirectory: version 1.1.0; ModelType=Projected(1),
    # RasterType=PixelIsArea(1), ProjectedCRS=epsg
    geokeys = [
        1, 1, 0, 3,
        1024, 0, 1, 1,
        1025, 0, 1, 1,
        3072, 0, 1, epsg,
    ]
    nodata_ascii = f"{nodata}".encode() + b"\x00"

    tags: list[tuple[int, int, int, list]] = [
        (_T_WIDTH, _TYPE_LONG, 1, [w]),
        (_T_LENGTH, _TYPE_LONG, 1, [h]),
        (_T_BITS, _TYPE_SHORT, 1, [32]),
        (_T_COMP, _TYPE_SHORT, 1, [8 if compress else 1]),
        (_T_PHOTO, _TYPE_SHORT, 1, [1]),
        (_T_STRIP_OFF, _TYPE_LONG, len(strips), None),  # patched below
        (_T_SPP, _TYPE_SHORT, 1, [1]),
        (_T_ROWS_PER_STRIP, _TYPE_LONG, 1, [rows_per_strip]),
        (_T_STRIP_CNT, _TYPE_LONG, len(strips), [len(s) for s in strips]),
        (_T_SAMPLE_FMT, _TYPE_SHORT, 1, [3]),
        (_T_PIXEL_SCALE, _TYPE_DOUBLE, 3, [dx, dy, 0.0]),
        (
            _T_TIEPOINT,
            _TYPE_DOUBLE,
            6,
            [0.0, 0.0, 0.0, origin_x, origin_y, 0.0],
        ),
        (_T_GEOKEYS, _TYPE_SHORT, len(geokeys), geokeys),
        (_T_NODATA, _TYPE_ASCII, len(nodata_ascii), nodata_ascii),
    ]

    # layout: header(8) + IFD + out-of-line tag values + strip data
    n_tags = len(tags)
    ifd_size = 2 + n_tags * 12 + 4
    pos = 8 + ifd_size
    # out-of-line value area
    value_blobs: dict[int, tuple[int, bytes]] = {}
    for tag, ttype, count, values in tags:
        if values is None:
            continue
        size = _TYPE_SIZE[ttype] * count
        if size > 4:
            blob = _pack_values(ttype, values)
            value_blobs[tag] = (pos, blob)
            pos += len(blob) + (len(blob) % 2)
    # strip offsets after value area
    strip_off_pos = None
    n_strips = len(strips)
    if n_strips * 4 > 4:
        strip_off_pos = pos
        pos += n_strips * 4
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    out = bytearray()
    out += _II + struct.pack("<H", _MAGIC) + struct.pack("<I", 8)
    out += struct.pack("<H", n_tags)
    for tag, ttype, count, values in sorted(tags):
        if tag == _T_STRIP_OFF:
            if strip_off_pos is None:
                payload = struct.pack("<I", strip_offsets[0])
            else:
                payload = struct.pack("<I", strip_off_pos)
        else:
            size = _TYPE_SIZE[ttype] * count
            if size > 4:
                payload = struct.pack("<I", value_blobs[tag][0])
            else:
                payload = _pack_values(ttype, values).ljust(4, b"\x00")
        out += struct.pack("<HHI", tag, ttype, count) + payload
    out += struct.pack("<I", 0)  # no next IFD
    for tag, ttype, count, values in sorted(tags):
        if tag in value_blobs:
            off, blob = value_blobs[tag]
            assert len(out) == off, (tag, len(out), off)
            out += blob
            if len(blob) % 2:
                out += b"\x00"
    if strip_off_pos is not None:
        assert len(out) == strip_off_pos
        out += struct.pack(f"<{n_strips}I", *strip_offsets)
    for s in strips:
        out += s

    target = path if path.endswith(".tif") else f"{path}.tif"
    with open(target, "wb") as f:
        f.write(bytes(out))
    return target


def _undo_fp_predictor(raw: bytes, w: int, bps: int = 4) -> bytes:
    """Undo the TIFF floating-point predictor (TechNote 3, predictor=3)
    for one strip/tile of ``w``-sample float rows: each row's bytes were
    split into big-endian byte planes then horizontally differenced —
    decode is a mod-256 cumulative sum per row followed by plane
    re-interleave back to little-endian sample order. Foreign GIS
    writers (GDAL ``PREDICTOR=3`` deflate exports) use this layout."""
    row_bytes = w * bps
    if len(raw) % row_bytes:
        raise ValueError(
            "floating-point-predictor data is not a whole number of rows"
        )
    n_rows = len(raw) // row_bytes
    a = np.frombuffer(raw, dtype=np.uint8).reshape(n_rows, row_bytes)
    a = np.cumsum(a, axis=1, dtype=np.uint32).astype(np.uint8)  # mod 256
    planes = a.reshape(n_rows, bps, w)
    # plane 0 holds the MOST significant byte: reverse to little-endian
    return np.transpose(planes[:, ::-1, :], (0, 2, 1)).tobytes()


def read_geotiff(path: str) -> dict:
    """Read a GeoTIFF written by :func:`write_geotiff` — and foreign
    single-band, single-IFD float32 little-endian TIFFs: strip- OR
    tile-organized, compression none/deflate, with the floating-point
    predictor (3) handled and the integer horizontal predictor (2)
    cleanly rejected (it is not defined for IEEE float samples).
    Returns ascending-y values + coordinate axes + the declared EPSG
    code and nodata."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] != _II or struct.unpack("<H", buf[2:4])[0] != _MAGIC:
        raise ValueError("not a little-endian classic TIFF")
    (ifd_off,) = struct.unpack("<I", buf[4:8])
    (n_tags,) = struct.unpack("<H", buf[ifd_off : ifd_off + 2])
    tags = {}
    for i in range(n_tags):
        p = ifd_off + 2 + i * 12
        tag, ttype, count = struct.unpack("<HHI", buf[p : p + 8])
        size = _TYPE_SIZE.get(ttype, 1) * count
        if size <= 4:
            raw = buf[p + 8 : p + 8 + size]
        else:
            (off,) = struct.unpack("<I", buf[p + 8 : p + 12])
            raw = buf[off : off + size]
        if ttype == _TYPE_SHORT:
            vals = list(struct.unpack(f"<{count}H", raw))
        elif ttype == _TYPE_LONG:
            vals = list(struct.unpack(f"<{count}I", raw))
        elif ttype == _TYPE_DOUBLE:
            vals = list(struct.unpack(f"<{count}d", raw))
        elif ttype == _TYPE_ASCII:
            vals = raw
        else:
            vals = raw
        tags[tag] = vals
    w, h = tags[_T_WIDTH][0], tags[_T_LENGTH][0]
    comp = tags[_T_COMP][0]
    if comp not in (1, 8):
        raise ValueError(f"unsupported compression {comp}")
    if tags.get(_T_SAMPLE_FMT, [1])[0] != 3 or tags[_T_BITS][0] != 32:
        raise ValueError("only float32 samples supported")
    predictor = tags.get(_T_PREDICTOR, [1])[0]
    if predictor not in (1, 3):
        # predictor 2 (horizontal integer differencing) is defined for
        # integer samples only — applying it to IEEE floats would decode
        # garbage, so reject loudly rather than guess
        raise ValueError(
            f"unsupported TIFF predictor {predictor} for float32 samples "
            "(only 1=none and 3=floating-point)"
        )
    if _T_TILE_OFF in tags:
        # tiled organization (the GDAL -co TILED=YES export layout):
        # fixed tile grid, edge tiles padded to full tile size
        tw, tl = tags[_T_TILE_W][0], tags[_T_TILE_L][0]
        offsets, counts = tags[_T_TILE_OFF], tags[_T_TILE_CNT]
        tiles_across = -(-w // tw)
        tiles_down = -(-h // tl)
        if len(offsets) != tiles_across * tiles_down:
            raise ValueError(
                f"tile count {len(offsets)} does not cover the "
                f"{tiles_down}x{tiles_across} tile grid"
            )
        north_up = np.empty((h, w), dtype="<f4")
        for t, (off, cnt) in enumerate(zip(offsets, counts)):
            raw = buf[off : off + cnt]
            if comp == 8:
                raw = zlib.decompress(raw)
            if predictor == 3:
                raw = _undo_fp_predictor(raw, tw)
            tile = np.frombuffer(raw, dtype="<f4", count=tl * tw).reshape(
                tl, tw
            )
            r0 = (t // tiles_across) * tl
            c0 = (t % tiles_across) * tw
            north_up[r0 : r0 + tl, c0 : c0 + tw] = tile[
                : h - r0, : w - c0
            ]
    else:
        rows_per_strip = tags.get(_T_ROWS_PER_STRIP, [h])[0]
        if _T_STRIP_OFF not in tags or _T_STRIP_CNT not in tags:
            raise ValueError("TIFF has no strip or tile offsets")
        offsets, counts = tags[_T_STRIP_OFF], tags[_T_STRIP_CNT]
        rows = []
        for i, (off, cnt) in enumerate(zip(offsets, counts)):
            raw = buf[off : off + cnt]
            if comp == 8:
                raw = zlib.decompress(raw)
            if predictor == 3:
                raw = _undo_fp_predictor(raw, w)
            n_rows = min(rows_per_strip, h - i * rows_per_strip)
            rows.append(
                np.frombuffer(raw, dtype="<f4", count=n_rows * w).reshape(
                    n_rows, w
                )
            )
        north_up = np.vstack(rows)
    if 34264 in tags and _T_PIXEL_SCALE not in tags:
        raise ValueError(
            "GeoTIFF uses ModelTransformationTag (34264), which this "
            "reader does not support — only PixelScale + Tiepoint"
        )
    if _T_PIXEL_SCALE in tags and _T_TIEPOINT in tags:
        dx, dy, _ = tags[_T_PIXEL_SCALE]
        # the tiepoint may anchor ANY raster pixel (i, j), not just the
        # upper-left corner — shift back to pixel (0, 0) before building
        # the axes (OGC GeoTIFF §B.1.4)
        tie_i, tie_j, _, tie_x, tie_y, _ = tags[_T_TIEPOINT]
        origin_x = tie_x - tie_i * dx
        origin_y = tie_y + tie_j * dy
    else:
        # plain (non-geo) float TIFF: degrade to pixel-index axes rather
        # than a KeyError — the docstring promises any strip float32 TIFF
        dx = dy = 1.0
        origin_x, origin_y = 0.0, float(h)
    xs = origin_x + dx / 2.0 + dx * np.arange(w)
    ys_desc = origin_y - dy / 2.0 - dy * np.arange(h)
    epsg = None
    gk = tags.get(_T_GEOKEYS)
    if gk:
        # header is 4 shorts, then 4 shorts per key:
        # (KeyID, TIFFTagLocation, Count, Value)
        for i in range(4, len(gk) - 3, 4):
            if gk[i] == 3072:
                epsg = gk[i + 3]
    # ascii nodata, GDAL convention
    nodata = None
    if _T_NODATA in tags:
        try:
            nodata = float(bytes(tags[_T_NODATA]).rstrip(b"\x00").decode())
        except ValueError:
            nodata = None
    return {
        "values": north_up[::-1, :],  # back to ascending y
        "ys": ys_desc[::-1],
        "xs": xs,
        "epsg": epsg,
        "nodata": nodata,
    }


def write_geotiff_days(
    path_prefix: str,
    cube: np.ndarray,
    dates: np.ndarray,
    ys: np.ndarray,
    xs: np.ndarray,
    **kw,
) -> list[str]:
    """One GeoTIFF per day from a (time, y, x) cube — the per-date export
    shape GIS consumers expect (a multi-band day stack hides the date)."""
    out = []
    for t, d in enumerate(np.asarray(dates, dtype="datetime64[D]")):
        out.append(write_geotiff(f"{path_prefix}_{d}.tif", cube[t], ys, xs, **kw))
    return out
