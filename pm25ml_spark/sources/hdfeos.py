"""HDF5/HDF-EOS granule decode (SURVEY S13), numpy only.

Two real-file layouts, both decoded through ``sources/hdf5_min``:

- **HDF-EOS L3 grids** (OMI OMNO2d): data lives under
  ``HDFEOS/GRIDS/<grid>/Data Fields`` with NO coordinate variables — the
  lon/lat axes are *rebuilt* from the grid attributes ``GridSpan`` (a
  stringified ``(min_lon, max_lon, min_lat, max_lat)`` tuple),
  ``GridSpacing`` (``(lon_res, lat_res)``), and validated against
  ``NumberOfLongitudesInGrid``/``NumberOfLatitudesInGrid`` — exactly the
  reference's ``Omno2dReader`` semantics (`data_reader_omno2d.py:89-159`,
  incl. the half-cell centre adjustment). The granule date comes from
  ``HDFEOS/ADDITIONAL/FILE_ATTRIBUTES`` GranuleYear/Month/Day
  (`data_reader_omno2d.py:76-87`).
- **NetCDF-4-style files** (MERRA-2 as HDF5): root-level coordinate
  datasets ``lon``/``lat``/``time`` (optional ``lev``) plus the data
  variable; decode applies the same validate/CF-unpack/bbox/time-mean
  semantics as the classic-codec path (`data_reader_merra.py:26-98`,
  mirrored by ``raster.decode_granule_netcdf3``). Variable axes are
  matched to coordinate datasets by equal length — the layout every
  MERRA granule has — rather than by chasing NetCDF-4 DIMENSION_LIST
  object references.
"""

from __future__ import annotations

from ast import literal_eval

import numpy as np

from pm25ml_spark.sources.hdf5_min import H5File, read_hdf5


def extract_omi_date(h5: H5File) -> str:
    """Granule date from FILE_ATTRIBUTES (data_reader_omno2d.py:76-87)."""
    attrs = h5.group("HDFEOS/ADDITIONAL/FILE_ATTRIBUTES").attrs
    y, m, d = (int(attrs[k]) for k in ("GranuleYear", "GranuleMonth", "GranuleDay"))
    return f"{y:04d}-{m:02d}-{d:02d}"


def build_omi_coords(h5: H5File, grid_name: str) -> tuple[np.ndarray, np.ndarray]:
    """Rebuild (lon, lat) cell-centre axes from HDF-EOS grid attributes
    (data_reader_omno2d.py:89-159): ``arange(min, max, res) + res/2``,
    then validate the lengths against the NumberOf*InGrid attributes."""
    attrs = h5.group(f"HDFEOS/GRIDS/{grid_name}").attrs
    min_lon, max_lon, min_lat, max_lat = literal_eval(str(attrs["GridSpan"]))
    lon_res, lat_res = literal_eval(str(attrs["GridSpacing"]))
    lon = np.arange(min_lon, max_lon, lon_res) + lon_res / 2.0
    lat = np.arange(min_lat, max_lat, lat_res) + lat_res / 2.0
    lon_len = int(attrs["NumberOfLongitudesInGrid"])
    lat_len = int(attrs["NumberOfLatitudesInGrid"])
    if lat_len != len(lat):
        raise ValueError(
            f"lat length {lat_len} does not match generated grid length {len(lat)}"
        )
    if lon_len != len(lon):
        raise ValueError(
            f"lon length {lon_len} does not match generated grid length {len(lon)}"
        )
    return lon, lat


def _find_grid(h5: H5File, variable: str) -> str:
    """Pick the HDF-EOS grid whose Data Fields contain ``variable``."""
    grids = h5.group("HDFEOS/GRIDS")
    for name, grp in grids.groups.items():
        fields = grp.groups.get("Data Fields")
        if fields is not None and variable in fields.datasets:
            return name
    raise ValueError(
        f"no HDFEOS grid contains variable {variable!r}; grids: {list(grids.groups)}"
    )


def decode_granule_hdfeos(
    path: str,
    variable: str,
    bbox: tuple[float, float, float, float] | None = None,
    grid_name: str | None = None,
    h5: H5File | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode an HDF-EOS L3 grid granule -> (lons, lats, grid2d[lat, lon]).

    Same return contract as ``raster.decode_granule_netcdf3`` so the
    distributed reader treats both formats identically. ``bbox`` is
    (west, south, east, north). L3 grids are 2-D daily composites — no
    time axis, so no time mean. Pass an already-parsed ``h5`` (the
    dispatcher does) to avoid re-reading the file."""
    from pm25ml_spark.sources.raster import _cf_unpack

    h5 = h5 if h5 is not None else read_hdf5(path)
    grid = grid_name or _find_grid(h5, variable)
    lons, lats = build_omi_coords(h5, grid)
    ds = h5.dataset(f"HDFEOS/GRIDS/{grid}/Data Fields/{variable}")
    if ds.shape != (len(lats), len(lons)):
        raise ValueError(
            f"{variable}: shape {ds.shape} != (lat, lon) ({len(lats)}, {len(lons)})"
        )
    vals = _cf_unpack(ds.read(), ds.attrs)
    if bbox is not None:
        min_lon, min_lat, max_lon, max_lat = bbox  # (W, S, E, N)
        li = np.flatnonzero((lons >= min_lon) & (lons <= max_lon))
        la = np.flatnonzero((lats >= min_lat) & (lats <= max_lat))
        lons, lats = lons[li], lats[la]
        vals = vals[la[:, None], li[None, :]]
    return lons, lats, vals


_EXPECTED_DIMS = ("lon", "lat", "time")
_OPTIONAL_DIMS = ("lev",)


def decode_granule_hdf5_netcdf4(
    path: str,
    variable: str,
    bbox: tuple[float, float, float, float] | None = None,
    level: int | None = None,
    h5: H5File | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a NetCDF-4 (HDF5 container) granule with MERRA semantics:
    validate coordinate datasets, optional lev select, bbox subset,
    CF-unpack, mean over time -> (lons, lats, grid2d[lat, lon])."""
    from pm25ml_spark.sources.raster import _cf_unpack

    h5 = h5 if h5 is not None else read_hdf5(path)
    root = h5.root
    missing = [d for d in _EXPECTED_DIMS if d not in root.datasets]
    if missing:
        raise ValueError(
            f"granule missing expected coordinates {missing}; "
            f"has {list(root.datasets)}"
        )
    if variable not in root.datasets:
        raise ValueError(
            f"variable {variable!r} not in granule {list(root.datasets)}"
        )
    coords = {
        d: root.datasets[d].read().astype(np.float64)
        for d in _EXPECTED_DIMS + _OPTIONAL_DIMS
        if d in root.datasets
    }
    var = root.datasets[variable]
    # match axes to coordinates by length (every MERRA axis length is
    # distinct: time 1-24, lev 42/72, lat 361, lon 576)
    sizes = {d: len(v) for d, v in coords.items()}
    vdims = []
    for axis_len in var.shape:
        matches = [d for d, n in sizes.items() if n == axis_len]
        if len(matches) != 1:
            raise ValueError(
                f"ambiguous axis of length {axis_len}: matches {matches}"
            )
        vdims.append(matches[0])
    if sorted(set(vdims)) != sorted(vdims):
        raise ValueError(f"repeated coordinate in axes {vdims}")
    vals = _cf_unpack(var.read(), var.attrs)
    lons, lats = coords["lon"], coords["lat"]

    if "lev" in vdims:
        if level is None:
            raise ValueError(
                "granule has a 'lev' dimension but no level was specified"
            )
        vals = np.take(vals, level, axis=vdims.index("lev"))
        vdims = [d for d in vdims if d != "lev"]
    elif level is not None:
        raise ValueError("level specified but granule has no 'lev' dimension")

    order = [vdims.index(d) for d in ("time", "lat", "lon")]
    vals = np.transpose(vals, order)
    if bbox is not None:
        min_lon, min_lat, max_lon, max_lat = bbox
        li = np.flatnonzero((lons >= min_lon) & (lons <= max_lon))
        la = np.flatnonzero((lats >= min_lat) & (lats <= max_lat))
        lons, lats = lons[li], lats[la]
        vals = vals[:, la[:, None], li[None, :]]
    with np.errstate(invalid="ignore"):
        grid = np.nanmean(vals, axis=0)
    return lons, lats, grid


def decode_granule_hdf5(
    path: str,
    variable: str,
    bbox: tuple[float, float, float, float] | None = None,
    level: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dispatch an HDF5 granule to the HDF-EOS or NetCDF-4-style decoder
    by probing for the HDFEOS group; the file is parsed exactly once."""
    h5 = read_hdf5(path)
    if "HDFEOS" in h5.root.groups:
        if level is not None:
            raise ValueError(
                "level select is a NetCDF-4/MERRA parameter; HDF-EOS L3 "
                "grids are 2-D"
            )
        return decode_granule_hdfeos(path, variable, bbox=bbox, h5=h5)
    return decode_granule_hdf5_netcdf4(
        path, variable, bbox=bbox, level=level, h5=h5
    )
