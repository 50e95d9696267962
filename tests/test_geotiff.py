"""GeoTIFF codec tests (sources/geotiff.py): round trip, georeferencing
math, compression variants, and degenerate grids."""

from __future__ import annotations

import numpy as np
import pytest

from pm25ml_spark.sources.geotiff import (
    read_geotiff,
    write_geotiff,
    write_geotiff_days,
)


def _grid():
    rng = np.random.default_rng(5)
    ys = np.array([100.0, 200.0, 300.0, 400.0, 500.0])
    xs = np.array([10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0])
    g = rng.normal(size=(5, 7)).astype(np.float32)
    g[1, 2] = np.nan
    return g, ys, xs


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip_values_and_axes(tmp_path, compress):
    g, ys, xs = _grid()
    p = write_geotiff(str(tmp_path / "t"), g, ys, xs, compress=compress)
    out = read_geotiff(p)
    np.testing.assert_array_equal(out["values"], g)
    np.testing.assert_allclose(out["ys"], ys)
    np.testing.assert_allclose(out["xs"], xs)
    assert out["epsg"] == 7755
    assert np.isnan(out["nodata"])


def test_multi_strip_layout(tmp_path):
    rng = np.random.default_rng(9)
    ys = np.arange(100, dtype=np.float64) * 10
    xs = np.arange(40, dtype=np.float64) * 10
    g = rng.normal(size=(100, 40)).astype(np.float32)
    p = write_geotiff(str(tmp_path / "s"), g, ys, xs, rows_per_strip=16)
    out = read_geotiff(p)
    np.testing.assert_array_equal(out["values"], g)


def test_file_is_north_up_on_disk(tmp_path):
    """Row 0 of the stored raster must be the NORTHMOST row (GeoTIFF
    convention), i.e. the LAST row of the ascending-y input grid."""
    ys = np.array([0.0, 10.0])
    xs = np.array([0.0, 10.0])
    g = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)  # y=10 row: 3,4
    p = write_geotiff(str(tmp_path / "n"), g, ys, xs, compress=False)
    buf = open(p, "rb").read()
    first_row = np.frombuffer(buf[-16:], dtype="<f4")  # last strip = data
    # stored order: north row (3,4) first, so the FILE tail is (1,2)
    np.testing.assert_array_equal(first_row[-2:], [1.0, 2.0])
    out = read_geotiff(p)
    np.testing.assert_array_equal(out["values"], g)


def test_geotransform_origin_is_pixel_corner(tmp_path):
    g, ys, xs = _grid()
    p = write_geotiff(str(tmp_path / "o"), g, ys, xs)
    out = read_geotiff(p)
    # axes reconstruct exactly from corner + half-pixel offsets
    np.testing.assert_allclose(out["xs"], xs)
    np.testing.assert_allclose(out["ys"], ys)


def test_per_day_export_names_and_content(tmp_path):
    g, ys, xs = _grid()
    cube = np.stack([g, g * 2])
    dates = np.array(["2024-03-01", "2024-03-02"], dtype="datetime64[D]")
    paths = write_geotiff_days(str(tmp_path / "pm"), cube, dates, ys, xs)
    assert [p.split("_")[-1] for p in paths] == ["2024-03-01.tif", "2024-03-02.tif"]
    out1 = read_geotiff(paths[1])
    np.testing.assert_array_equal(out1["values"], g * 2)


def test_reject_non_tiff(tmp_path):
    p = tmp_path / "x.tif"
    p.write_bytes(b"MM\x00\x2a" + b"\x00" * 16)
    with pytest.raises(ValueError, match="little-endian"):
        read_geotiff(str(p))


def test_plain_tiff_without_geo_tags_degrades_to_index_axes(tmp_path):
    """A non-geo float strip TIFF (no ModelPixelScale/Tiepoint) reads
    with pixel-index axes instead of raising KeyError."""
    g, ys, xs = _grid()
    p = write_geotiff(str(tmp_path / "geo"), g, ys, xs, compress=False)
    buf = bytearray(open(p, "rb").read())
    # surgically retag the geo tags to private ids the reader ignores
    import struct as _s

    (n_tags,) = _s.unpack("<H", buf[8:10])
    for i in range(n_tags):
        off = 10 + i * 12
        (tag,) = _s.unpack("<H", buf[off : off + 2])
        if tag in (33550, 33922, 34735):
            buf[off : off + 2] = _s.pack("<H", 65000 + (tag % 100))
    p2 = tmp_path / "plain.tif"
    p2.write_bytes(bytes(buf))
    out = read_geotiff(str(p2))
    np.testing.assert_array_equal(out["values"], g)
    # index axes: centered unit pixels
    np.testing.assert_allclose(out["xs"], 0.5 + np.arange(g.shape[1]))
    assert out["epsg"] is None


def test_noncorner_tiepoint_honored(tmp_path):
    """A tiepoint anchoring pixel (2, 3) instead of (0, 0) must shift
    the reconstructed axes back — OGC GeoTIFF allows any anchor."""
    import struct as _s

    g, ys, xs = _grid()
    p = write_geotiff(str(tmp_path / "t"), g, ys, xs, compress=False)
    buf = bytearray(open(p, "rb").read())
    out0 = read_geotiff(p)
    # locate the tiepoint payload (6 doubles, out of line) and rewrite
    # it to anchor pixel (2,3): model coords shift by (2*dx, -3*dy)
    (n_tags,) = _s.unpack("<H", buf[8:10])
    for i in range(n_tags):
        off = 10 + i * 12
        tag, ttype, count = _s.unpack("<HHI", buf[off : off + 8])
        if tag == 33922:
            (voff,) = _s.unpack("<I", buf[off + 8 : off + 12])
            vals = list(_s.unpack("<6d", buf[voff : voff + 48]))
            dx, dy = 10.0, 100.0
            vals = [2.0, 3.0, 0.0, vals[3] + 2 * dx, vals[4] - 3 * dy, 0.0]
            buf[voff : voff + 48] = _s.pack("<6d", *vals)
    p2 = tmp_path / "anchored.tif"
    p2.write_bytes(bytes(buf))
    out = read_geotiff(str(p2))
    np.testing.assert_allclose(out["xs"], out0["xs"])
    np.testing.assert_allclose(out["ys"], out0["ys"])


# ---------------------------------------------------------------------------
# Foreign-writer variants: a hand-rolled TIFF builder (independent of
# write_geotiff) produces the layouts real GIS exports use — tiled
# organization (GDAL -co TILED=YES) and deflate with the floating-point
# predictor (GDAL PREDICTOR=3) — plus the integer horizontal predictor
# the reader must cleanly reject for float samples.

import struct as _s
import zlib as _zlib

_TYPE_FMT = {3: "H", 4: "I", 12: "d"}
_TYPE_SZ = {3: 2, 4: 4, 2: 1, 12: 8}


def _pack_tag_raw(ttype, vals):
    if ttype == 2:
        return bytes(vals)
    return _s.pack(f"<{len(vals)}{_TYPE_FMT[ttype]}", *vals)


def _build_foreign_tiff(tag_values, blobs, off_tag, cnt_tag):
    """Classic little-endian TIFF: header | IFD | out-of-line values |
    data blobs, with blob offsets patched into ``off_tag``."""
    tag_values = dict(tag_values)
    tag_values[cnt_tag] = (4, [len(b) for b in blobs])
    tag_values[off_tag] = (4, [0] * len(blobs))  # patched below
    tags = sorted(tag_values)
    pos = 8 + 2 + len(tags) * 12 + 4
    off_positions = {}
    for t in tags:
        ttype, vals = tag_values[t]
        if _TYPE_SZ[ttype] * len(vals) > 4:
            off_positions[t] = pos
            pos += _TYPE_SZ[ttype] * len(vals)
    blob_offsets = []
    for b in blobs:
        blob_offsets.append(pos)
        pos += len(b)
    tag_values[off_tag] = (4, blob_offsets)
    out = b"II" + _s.pack("<H", 42) + _s.pack("<I", 8)
    out += _s.pack("<H", len(tags))
    for t in tags:
        ttype, vals = tag_values[t]
        raw = _pack_tag_raw(ttype, vals)
        out += _s.pack("<HHI", t, ttype, len(vals))
        out += raw.ljust(4, b"\0") if len(raw) <= 4 else _s.pack(
            "<I", off_positions[t]
        )
    out += _s.pack("<I", 0)
    for t in tags:
        ttype, vals = tag_values[t]
        raw = _pack_tag_raw(ttype, vals)
        if len(raw) > 4:
            out += raw
    for b in blobs:
        out += b
    return out


def _fp_predict(rows):
    """TIFF TechNote-3 floating-point predictor ENCODE for (n, w) <f4
    rows: little-endian bytes -> big-endian byte planes -> horizontal
    byte differencing."""
    n, w = rows.shape
    le = np.ascontiguousarray(rows, dtype="<f4").view(np.uint8).reshape(
        n, w, 4
    )
    be_planes = le[:, :, ::-1].transpose(0, 2, 1).reshape(n, 4 * w)
    diff = be_planes.astype(np.int16)
    diff[:, 1:] = diff[:, 1:] - be_planes[:, :-1].astype(np.int16)
    return (diff & 0xFF).astype(np.uint8).tobytes()


_BASE_TAGS = {
    258: (3, [32]),  # BitsPerSample
    339: (3, [3]),  # SampleFormat IEEE float
}


def _fgrid(h, w):
    return (np.arange(h * w, dtype="<f4").reshape(h, w) * 0.5) - 7.25


def test_foreign_tiled_uncompressed(tmp_path):
    h, w, tl, tw = 25, 20, 16, 16
    north_up = _fgrid(h, w)
    blobs = []
    for r0 in range(0, h, tl):
        for c0 in range(0, w, tw):
            tile = np.zeros((tl, tw), dtype="<f4")
            blk = north_up[r0 : r0 + tl, c0 : c0 + tw]
            tile[: blk.shape[0], : blk.shape[1]] = blk
            blobs.append(tile.tobytes())
    tags = dict(_BASE_TAGS)
    tags.update({256: (4, [w]), 257: (4, [h]), 259: (3, [1]),
                 322: (4, [tw]), 323: (4, [tl])})
    p = tmp_path / "tiled.tif"
    p.write_bytes(_build_foreign_tiff(tags, blobs, 324, 325))
    out = read_geotiff(str(p))
    np.testing.assert_array_equal(out["values"][::-1], north_up)


def test_foreign_tiled_deflate_fp_predictor(tmp_path):
    h, w, tl, tw = 10, 9, 4, 4
    north_up = _fgrid(h, w)
    blobs = []
    for r0 in range(0, h, tl):
        for c0 in range(0, w, tw):
            tile = np.zeros((tl, tw), dtype="<f4")
            blk = north_up[r0 : r0 + tl, c0 : c0 + tw]
            tile[: blk.shape[0], : blk.shape[1]] = blk
            blobs.append(_zlib.compress(_fp_predict(tile)))
    tags = dict(_BASE_TAGS)
    tags.update({256: (4, [w]), 257: (4, [h]), 259: (3, [8]),
                 317: (3, [3]), 322: (4, [tw]), 323: (4, [tl])})
    p = tmp_path / "tiled_pred.tif"
    p.write_bytes(_build_foreign_tiff(tags, blobs, 324, 325))
    out = read_geotiff(str(p))
    np.testing.assert_array_equal(out["values"][::-1], north_up)


def test_foreign_strips_deflate_fp_predictor(tmp_path):
    h, w, rps = 10, 6, 7  # last strip is a partial (3 rows)
    north_up = _fgrid(h, w)
    blobs = [
        _zlib.compress(_fp_predict(north_up[r0 : r0 + rps]))
        for r0 in range(0, h, rps)
    ]
    tags = dict(_BASE_TAGS)
    tags.update({256: (4, [w]), 257: (4, [h]), 259: (3, [8]),
                 278: (4, [rps]), 317: (3, [3])})
    p = tmp_path / "strip_pred.tif"
    p.write_bytes(_build_foreign_tiff(tags, blobs, 273, 279))
    out = read_geotiff(str(p))
    np.testing.assert_array_equal(out["values"][::-1], north_up)


def test_foreign_horizontal_predictor_rejected(tmp_path):
    h, w = 4, 4
    north_up = _fgrid(h, w)
    tags = dict(_BASE_TAGS)
    tags.update({256: (4, [w]), 257: (4, [h]), 259: (3, [1]),
                 278: (4, [h]), 317: (3, [2])})
    p = tmp_path / "pred2.tif"
    p.write_bytes(
        _build_foreign_tiff(tags, [north_up.tobytes()], 273, 279)
    )
    with pytest.raises(ValueError, match="predictor 2"):
        read_geotiff(str(p))
