"""Terminal raster export (SURVEY K4 pivot + S17 NetCDF sink).

The final prediction is one country-sized raster (33k cells × days of
float32 — a few hundred MB at most), so the pivot runs on the driver after
``toPandas()`` exactly as the reference does (grid.py:122-185). The NetCDF
encoding step (zlib-5, CF-1.8 attrs — netcdf_final_result_writer.py:46-153)
needs netCDF4/xarray which are not dependencies; the sink seam writes a
compressed ``.npz`` with identical array content + coordinate vectors, and
raises a marked NotImplementedError where the CF-NetCDF writer plugs in.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

try:  # optional: real NetCDF encoding
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


def write_raster(
    path: str,
    cube: np.ndarray,
    dates: np.ndarray,
    ys: np.ndarray,
    xs: np.ndarray,
) -> str:
    """S17 sink seam. With netCDF4 installed this would emit CF-1.8 NetCDF
    (zlib complevel 5, chunks (16,82,72), EPSG:7755 spatial_ref, days-
    since-2000 time encoding — netcdf_final_result_writer.py:87-153).
    Fallback: compressed npz with the same arrays."""
    if HAS_NETCDF4:  # pragma: no cover - not installed in this container
        raise NotImplementedError(
            "CF-NetCDF writer: port netcdf_final_result_writer.py:46-153"
        )
    out = path if path.endswith(".npz") else f"{path}.npz"
    np.savez_compressed(
        out, value=cube, time=dates.astype(str), y=ys, x=xs
    )
    return out


def read_raster(path: str) -> dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}
