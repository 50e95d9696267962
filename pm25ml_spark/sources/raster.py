"""Gridded-raster sources (SURVEY S12/S13 + K2) as distributed readers.

Reference shape: NASA granules (NetCDF / HDF-EOS) are opened with
xarray/h5netcdf, bbox-subset, time-averaged to a day grid, then regridded
to the 33k grid centroids (`collectors/ned/*`). Spark-first shape:

    granule manifest DataFrame (path, date, variable)
      → mapInPandas(reader_udf)           # one granule per task
      → long rows (grid_id, date, value)
      → scaffold completion + archive write

The container has no NetCDF/HDF libraries, so the *decode* step is behind
an import-try: with h5netcdf/xarray present the real decoder runs; without
them a clearly-marked deterministic fake produces a plane-valued raster so
the plumbing (schema, batching, regrid math, scaffold join) is fully
testable. The regrid kernel (K2) is pure numpy bilinear — no scipy.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # optional: real NetCDF decode (not available in this container)
    import h5netcdf  # noqa: F401

    HAS_NETCDF = True
except ImportError:
    HAS_NETCDF = False


@dataclass(frozen=True)
class RasterGranule:
    """One day-file of one dataset (data_retriever_raw.py granule unit)."""

    path: str
    date: str  # YYYY-MM-DD
    variable: str


def decode_granule(path: str, variable: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (lons, lats, grid2d) for a granule.

    STUB when NetCDF libs are absent: a deterministic synthetic raster on a
    fixed lattice whose value is a plane a·lon + b·lat + c derived from the
    path hash — bilinear regridding of a plane is exact, which the tests
    exploit. Replace-by-import: installing h5netcdf activates the real
    reader (`data_reader_merra.py:26-98` semantics: open, validate dims,
    bbox subset, mean over time)."""
    if HAS_NETCDF:  # pragma: no cover - not installed in this container
        raise NotImplementedError(
            "real NetCDF decode: open h5netcdf, validate dims (lon,lat,time), "
            "bbox-subset, mean over time — port of data_reader_merra.py:26-98"
        )
    # md5, NOT builtin hash(): str hash is salted per process (pyspark
    # only pins PYTHONHASHSEED when the env doesn't set one), and a
    # retried/speculative task re-decoding the same granule to different
    # values breaks Spark's recompute-on-failure assumption
    import hashlib

    seed = int(hashlib.md5(path.encode()).hexdigest()[:8], 16) % 1000
    lons = np.arange(60.0, 100.0, 2.0)
    lats = np.arange(5.0, 40.0, 2.5)
    a, b, c = 0.1 + seed * 1e-4, 0.2, float(seed % 7)
    grid = a * lons[None, :] + b * lats[:, None] + c
    return lons, lats, grid


def bilinear_regrid(
    lons: np.ndarray,
    lats: np.ndarray,
    grid2d: np.ndarray,
    q_lon: np.ndarray,
    q_lat: np.ndarray,
) -> np.ndarray:
    """K2: sample a regular lon×lat raster at query points, bilinear;
    points outside the raster are clamped to the edge (nearest)."""
    xi = np.clip(np.searchsorted(lons, q_lon) - 1, 0, len(lons) - 2)
    yi = np.clip(np.searchsorted(lats, q_lat) - 1, 0, len(lats) - 2)
    x0, x1 = lons[xi], lons[xi + 1]
    y0, y1 = lats[yi], lats[yi + 1]
    tx = np.clip((q_lon - x0) / (x1 - x0), 0.0, 1.0)
    ty = np.clip((q_lat - y0) / (y1 - y0), 0.0, 1.0)
    v00 = grid2d[yi, xi]
    v10 = grid2d[yi, xi + 1]
    v01 = grid2d[yi + 1, xi]
    v11 = grid2d[yi + 1, xi + 1]
    return (
        v00 * (1 - tx) * (1 - ty)
        + v10 * tx * (1 - ty)
        + v01 * (1 - tx) * ty
        + v11 * tx * ty
    )


RASTER_ROW_SCHEMA = StructType(
    [
        StructField("grid_id", LongType()),
        StructField("date", StringType()),
        StructField("variable", StringType()),
        StructField("value", DoubleType()),
    ]
)


def read_granules_to_grid(
    spark: SparkSession,
    granules: list[RasterGranule],
    grid_pdf: pd.DataFrame,  # columns: grid_id, lon, lat (33k rows — broadcastable)
) -> DataFrame:
    """Distributed granule reader: one manifest row per granule, decoded
    and regridded inside mapInPandas (one task per granule, matching the
    reference's file-per-day unit of work)."""
    manifest = spark.createDataFrame(
        [(g.path, g.date, g.variable) for g in granules],
        "path string, date string, variable string",
    ).repartition(max(1, min(len(granules), 64)))

    g_ids = grid_pdf["grid_id"].to_numpy()
    g_lon = grid_pdf["lon"].to_numpy(dtype=np.float64)
    g_lat = grid_pdf["lat"].to_numpy(dtype=np.float64)

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                lons, lats, grid2d = decode_granule(row.path, row.variable)
                vals = bilinear_regrid(lons, lats, grid2d, g_lon, g_lat)
                yield pd.DataFrame(
                    {
                        "grid_id": g_ids,
                        "date": row.date,
                        "variable": row.variable,
                        "value": vals,
                    }
                )

    return manifest.mapInPandas(fn, schema=RASTER_ROW_SCHEMA)
