"""Grid spatial dimension table (SURVEY §1.1 Grid, S11/S19).

The reference loads a shapefile zip + CSV maps into a 33,074-row Polars
frame (`collectors/grid.py:188-313`) with pyshp/shapely/pyproj. Here the
same load is real but numpy-only: `.shp`/`.dbf` parse + shoelace centroid
+ LCC-2SP inverse reprojection live in `sources/shapefile_io` (public
ESRI/dBASE/EPSG specs). Projections other than Lambert Conformal Conic
still need pyproj — that seam raises clearly. A deterministic synthetic
builder remains for tests that don't care about the file path.

The grid is dimension-sized by contract → always broadcast into joins.
"""

from __future__ import annotations

import tempfile
import zipfile
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GRID_COLUMNS = [
    "grid_id",
    "id_50km",
    "k_region",
    "lon",
    "lat",
    "original_x",
    "original_y",
]


def _load_shapefile_rows(tmp_dir: str, shapefile_zip: str) -> pd.DataFrame:
    """Unzip + parse the grid shapefile (grid.py:244-313 semantics):
    per polygon — grid_id attribute, projected centroid (original_x/y,
    rounded to whole metres as the reference does), reprojected WGS-84
    centroid (lon/lat), WKT of both geometries."""
    from pm25ml_spark.sources.shapefile_io import (
        parse_prj_lcc,
        polygon_centroid,
        polygon_wkt,
        read_shapefile,
    )

    with zipfile.ZipFile(shapefile_zip, "r") as zf:
        zf.extractall(tmp_dir)
    tmp = Path(tmp_dir)
    shp = next(tmp.rglob("*.shp"), None)
    prj = next(tmp.rglob("*.prj"), None)
    if shp is None:
        raise ValueError("Shapefile (.shp) not found in the ZIP archive.")
    if prj is None:
        raise ValueError("Projection file (.prj) not found in the ZIP archive.")
    proj = parse_prj_lcc(prj.read_text())

    rows = []
    for rec in read_shapefile(str(shp)):
        if "grid_id" not in rec.attrs:
            raise ValueError("grid_id not found in shapefile attributes.")
        ring = rec.parts[0]
        cx, cy = polygon_centroid(ring)
        # reproject the ring + centroid to WGS-84
        lonlat_ring = np.array([proj.inverse(px, py) for px, py in ring])
        lon, lat = proj.inverse(cx, cy)
        rows.append(
            {
                "grid_id": int(rec.attrs["grid_id"]),
                "original_x": float(round(cx)),
                "original_y": float(round(cy)),
                "lon": lon,
                "lat": lat,
                "geometry_wkt": polygon_wkt(lonlat_ring),
                "original_geometry_wkt": polygon_wkt(ring),
            }
        )
    return pd.DataFrame(rows)


def load_grid_from_files(
    spark: SparkSession,
    shapefile_zip: str,
    csv_50km: str | None = None,
    region_parquet: str | None = None,
) -> DataFrame:
    """Real grid load (grid.py:188-241): shapefile zip → per-cell centroid
    + reprojection, left-joined with the 10km→50km CSV map and the region
    parquet. The dimension is driver-built (33k rows) and returned as a
    broadcastable DataFrame, exactly how every J4/J8 join consumes it."""
    with tempfile.TemporaryDirectory(prefix="pm25ml_grid_") as tmp_dir:
        pdf = _load_shapefile_rows(tmp_dir, shapefile_zip)
    grid = spark.createDataFrame(pdf)
    if csv_50km is not None:
        m50 = (
            spark.read.option("header", "true")
            .csv(csv_50km)
            .select(
                F.col("grid_id_10km").cast("long").alias("grid_id"),
                F.col("grid_id_50km").cast("long").alias("id_50km"),
            )
        )
        grid = grid.join(F.broadcast(m50), "grid_id", "left")
    else:
        grid = grid.withColumn("id_50km", F.lit(None).cast("long"))
    if region_parquet is not None:
        regions = spark.read.parquet(region_parquet).select(
            F.col("grid_id").cast("long").alias("grid_id"),
            # cast to long: the parquet may store int32, and the no-parquet
            # branch below yields long — both paths must return one schema
            F.col("k_region").cast("long").alias("k_region"),
        )
        grid = grid.join(F.broadcast(regions), "grid_id", "left")
    else:
        grid = grid.withColumn("k_region", F.lit(None).cast("long"))
    return grid.select(*GRID_COLUMNS, "geometry_wkt", "original_geometry_wkt")


def synthetic_grid(
    spark: SparkSession,
    nx: int = 8,
    ny: int = 8,
    step_m: float = 10_000.0,
    lon0: float = 70.0,
    lat0: float = 10.0,
) -> DataFrame:
    """Deterministic F1-shaped lattice: nx×ny cells, 10 km step, coarse
    50 km key (5×5 blocks), k_region clusters, EPSG:4326-ish centroids."""
    xi, yi = np.meshgrid(np.arange(nx), np.arange(ny))
    xi, yi = xi.ravel(), yi.ravel()
    pdf = pd.DataFrame(
        {
            "grid_id": np.arange(nx * ny, dtype=np.int64),
            "id_50km": (yi // 5) * ((nx + 4) // 5) + (xi // 5),
            "k_region": (xi + yi) % 4,
            "lon": lon0 + xi * 0.09,
            "lat": lat0 + yi * 0.09,
            "original_x": xi * step_m,
            "original_y": yi * step_m,
        }
    )
    pdf["id_50km"] = pdf["id_50km"].astype(np.int64)
    pdf["k_region"] = pdf["k_region"].astype(np.int64)
    return spark.createDataFrame(pdf[GRID_COLUMNS])
