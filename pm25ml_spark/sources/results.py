"""Terminal raster export (SURVEY K4 pivot + S17 NetCDF sink).

The final prediction is one country-sized raster (33k cells × days of
float32 — a few hundred MB at most), so the pivot runs on the driver after
``toPandas()`` exactly as the reference does (grid.py:122-185). The sink
(S17) mirrors `netcdf_final_result_writer.py:46-153`: CF-1.8 attributes,
days-since-2000 gregorian time, projection-metre x/y axes, grid_mapping +
GeoTransform — written as real NetCDF via the numpy-only classic codec
(`sources/netcdf3`). The reference's zlib-5 chunked encoding is an
HDF5-backed (NetCDF-4) feature: when netCDF4 is importable that path is
used; otherwise the classic file carries identical data and metadata,
uncompressed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from pm25ml_spark.sources.netcdf3 import read_netcdf3, write_netcdf3

try:  # optional: zlib-compressed NetCDF-4 encoding
    import netCDF4  # noqa: F401

    HAS_NETCDF4 = True
except ImportError:
    HAS_NETCDF4 = False


def pivot_to_raster(
    df: DataFrame,
    grid: DataFrame,
    value_col: str,
    date_col: str = "date",
    x_col: str = "original_x",
    y_col: str = "original_y",
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """K4: (grid_id, date, value) long table → dense (time, y, x) cube.

    Outer-joins the data onto the full grid (grid.py:144-165) so missing
    cells become NaN, then pivots on the driver. Returns
    (cube[t,y,x] float32, dates, ys, xs).
    """
    joined = (
        grid.select("grid_id", x_col, y_col)
        .join(df.select("grid_id", date_col, value_col), "grid_id", "left")
        .toPandas()
    )
    dates = np.sort(joined[date_col].dropna().unique())
    ys = np.sort(joined[y_col].unique())
    xs = np.sort(joined[x_col].unique())
    cube = np.full((len(dates), len(ys), len(xs)), np.nan, dtype=np.float32)
    # vectorized fill: factorize each axis into index arrays and assign
    # in one fancy-indexing statement — a per-row Python loop costs
    # minutes at the reference scale (33k cells × 365 days ≈ 12M rows)
    filled = joined.dropna(subset=[date_col])
    ti = np.searchsorted(dates, filled[date_col].to_numpy())
    yi = np.searchsorted(ys, filled[y_col].to_numpy())
    xi = np.searchsorted(xs, filled[x_col].to_numpy())
    cube[ti, yi, xi] = filled[value_col].to_numpy(dtype=np.float32)
    return cube, dates, ys, xs


_TIME_EPOCH = np.datetime64("2000-01-01")


def write_raster(
    path: str,
    cube: np.ndarray,
    dates: np.ndarray,
    ys: np.ndarray,
    xs: np.ndarray,
    value_name: str = "value",
) -> str:
    """S17 sink: CF-1.8 NetCDF with the reference's encoding intent
    (netcdf_final_result_writer.py:46-153): days-since-2000 gregorian
    time, projection_x/y_coordinate metre axes, grid_mapping spatial_ref,
    GeoTransform. zlib complevel-5 chunked compression needs the NetCDF-4
    (HDF5) container → only when netCDF4 is importable; the classic file
    written here is identical in data + metadata, uncompressed."""
    if HAS_NETCDF4:  # pragma: no cover - not installed in this container
        raise NotImplementedError(
            "zlib-5 chunked NetCDF-4 encoding: port "
            "netcdf_final_result_writer.py:87-100 onto the netCDF4 API"
        )
    out = path if path.endswith(".nc") else f"{path}.nc"
    days = (
        (np.asarray(dates, dtype="datetime64[D]") - _TIME_EPOCH)
        .astype("timedelta64[D]")
        .astype(np.int32)
    )
    dx = float(np.diff(xs).mean()) if len(xs) > 1 else 1.0
    dy = abs(float(np.diff(ys).mean())) if len(ys) > 1 else 1.0
    # GDAL-style GeoTransform CONSISTENT WITH THE STORED ROW ORDER: the
    # cube's row r sits at ys[r] (ascending), so the y origin is the
    # bottom edge and the row step is +dy. (The reference emits -dy
    # because its xarray cube is north-up/descending-y; emitting -dy over
    # ascending rows would georeference the raster vertically mirrored.)
    gt = f"{xs[0] - dx / 2.0} {dx} 0.0 {ys[0] - dy / 2.0} 0.0 {dy}"
    write_netcdf3(
        out,
        dims={"time": len(days), "y": len(ys), "x": len(xs)},
        variables={
            value_name: (
                ("time", "y", "x"),
                cube.astype(np.float32),
                {
                    "_FillValue": np.float32(np.nan),
                    "coordinates": "time y x",
                    "grid_mapping": "spatial_ref",
                },
            ),
            "time": (
                ("time",),
                days,
                {
                    "standard_name": "time",
                    "axis": "T",
                    "units": "days since 2000-01-01 00:00:00",
                    "calendar": "gregorian",
                },
            ),
            "y": (
                ("y",),
                np.asarray(ys, dtype=np.float64),
                {
                    "standard_name": "projection_y_coordinate",
                    "long_name": "Northing",
                    "units": "m",
                    "axis": "Y",
                },
            ),
            "x": (
                ("x",),
                np.asarray(xs, dtype=np.float64),
                {
                    "standard_name": "projection_x_coordinate",
                    "long_name": "Easting",
                    "units": "m",
                    "axis": "X",
                },
            ),
            # full CF CRS attrs (crs_wkt etc.) come from pyproj in the
            # reference; without it we pin the EPSG code + GeoTransform
            "spatial_ref": (
                (),
                np.int32(0),
                {"spatial_ref": "EPSG:7755", "GeoTransform": gt},
            ),
        },
        global_attrs={"Conventions": "CF-1.8", "GeoTransform": gt},
    )
    return out


def read_raster(path: str) -> dict[str, np.ndarray]:
    """Read a raster written by :func:`write_raster` (or legacy .npz)."""
    if path.endswith(".npz"):
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    _, variables, _ = read_netcdf3(path)
    out = {}
    for name, (_, arr, attrs) in variables.items():
        if name == "time":
            arr = (
                _TIME_EPOCH + arr.astype("timedelta64[D]")
            ).astype("datetime64[D]")
        out[name] = arr
    return out
