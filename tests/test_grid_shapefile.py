"""S11 grid source: numpy-only shapefile load + LCC reprojection tests
(mirrors collectors/grid.py:188-313 and its fixtures, without the geo
stack)."""

from __future__ import annotations

import zipfile

import numpy as np
import pandas as pd
import pytest

from pm25ml_spark.sources.grid import load_grid_from_files
from pm25ml_spark.sources.shapefile_io import (
    LambertConformalConic2SP,
    parse_prj_lcc,
    polygon_centroid,
    read_shapefile,
    write_shapefile_polygons,
)

# India-NSF-style LCC parameters (WGS-84 ellipsoid)
_LCC = LambertConformalConic2SP(
    a=6378137.0,
    inv_f=298.257223563,
    lat_origin=24.0,
    lon_origin=80.0,
    lat_1=12.472955,
    lat_2=35.172806,
    false_easting=4000000.0,
    false_northing=4000000.0,
)

_PRJ_WKT = (
    'PROJCS["India_NSF_LCC",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],'
    'UNIT["Degree",0.0174532925199433]],'
    'PROJECTION["Lambert_Conformal_Conic_2SP"],'
    'PARAMETER["False_Easting",4000000.0],'
    'PARAMETER["False_Northing",4000000.0],'
    'PARAMETER["Central_Meridian",80.0],'
    'PARAMETER["Standard_Parallel_1",12.472955],'
    'PARAMETER["Standard_Parallel_2",35.172806],'
    'PARAMETER["Latitude_Of_Origin",24.0],UNIT["Meter",1.0]]'
)


def test_lcc_forward_inverse_roundtrip():
    for lon, lat in [(80.0, 24.0), (72.5, 12.0), (95.1, 34.9), (68.0, 8.0)]:
        x, y = _LCC.forward(lon, lat)
        lon2, lat2 = _LCC.inverse(x, y)
        assert lon2 == pytest.approx(lon, abs=1e-9)
        assert lat2 == pytest.approx(lat, abs=1e-9)


def test_lcc_origin_maps_to_false_origin():
    x, y = _LCC.forward(80.0, 24.0)
    assert x == pytest.approx(4000000.0, abs=1e-6)
    assert y == pytest.approx(4000000.0, abs=1e-6)


def test_lcc_scale_is_unity_on_standard_parallels():
    """Defining property of 2SP LCC: scale factor 1 on both standard
    parallels (validates the n/F constants jointly)."""
    import math

    n, F, _ = _LCC._constants()
    for lat in (_LCC.lat_1, _LCC.lat_2):
        phi = math.radians(lat)
        m = _LCC._m(phi)
        r = _LCC.a * F * _LCC._t(phi) ** n
        scale = r * n / (_LCC.a * m)
        assert scale == pytest.approx(1.0, abs=1e-12)


def test_prj_parse_matches_params():
    proj = parse_prj_lcc(_PRJ_WKT)
    assert proj == _LCC
    with pytest.raises(NotImplementedError, match="Lambert"):
        parse_prj_lcc('PROJCS["x",PROJECTION["Transverse_Mercator"]]')


def _square(x0: float, y0: float, step: float) -> np.ndarray:
    return np.array(
        [[x0, y0], [x0 + step, y0], [x0 + step, y0 + step], [x0, y0 + step]]
    )


def test_shapefile_roundtrip(tmp_path):
    base = str(tmp_path / "cells")
    polys = [_square(4e6 + i * 1e4, 4e6, 1e4) for i in range(3)]
    attrs = [{"grid_id": 10 + i, "name": f"c{i}"} for i in range(3)]
    write_shapefile_polygons(base, polys, attrs, prj_wkt=_PRJ_WKT)
    recs = read_shapefile(base + ".shp")
    assert [r.attrs["grid_id"] for r in recs] == [10, 11, 12]
    assert recs[1].attrs["name"] == "c1"
    cx, cy = polygon_centroid(recs[0].parts[0])
    assert cx == pytest.approx(4e6 + 5e3)
    assert cy == pytest.approx(4e6 + 5e3)


def _grid_zip(tmp_path, n=4) -> str:
    base = str(tmp_path / "grid_india_10km")
    polys, attrs = [], []
    gid = 1
    for yi in range(n):
        for xi in range(n):
            polys.append(_square(4e6 + xi * 1e4, 4e6 + yi * 1e4, 1e4))
            attrs.append({"grid_id": gid})
            gid += 1
    write_shapefile_polygons(base, polys, attrs, prj_wkt=_PRJ_WKT)
    zpath = str(tmp_path / "grid.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for ext in (".shp", ".dbf", ".prj"):
            zf.write(base + ext, "grid_india_10km/grid_india_10km" + ext)
    return zpath


def test_load_grid_from_files(spark, tmp_path):
    zpath = _grid_zip(tmp_path)
    # 10km→50km map + region parquet, as the reference joins them
    pd.DataFrame(
        {"grid_id_10km": range(1, 17), "grid_id_50km": [1] * 16}
    ).to_csv(tmp_path / "map50.csv", index=False)
    spark.createDataFrame(
        pd.DataFrame({"grid_id": range(1, 17), "k_region": [2] * 16})
    ).write.parquet(str(tmp_path / "regions.parquet"))

    grid = load_grid_from_files(
        spark,
        zpath,
        str(tmp_path / "map50.csv"),
        str(tmp_path / "regions.parquet"),
    ).toPandas().sort_values("grid_id")
    assert len(grid) == 16
    # projected centroids: cell centres on the 10 km lattice, whole metres
    assert grid.iloc[0].original_x == pytest.approx(4e6 + 5e3)
    assert grid.iloc[0].original_y == pytest.approx(4e6 + 5e3)
    # reprojected centroid must invert back to the projected centroid
    x, y = _LCC.forward(grid.iloc[5].lon, grid.iloc[5].lat)
    assert x == pytest.approx(grid.iloc[5].original_x, abs=1e-3)
    assert y == pytest.approx(grid.iloc[5].original_y, abs=1e-3)
    # joined maps
    assert (grid.id_50km == 1).all()
    assert (grid.k_region == 2).all()
    assert grid.iloc[0].geometry_wkt.startswith("POLYGON")


def test_load_grid_missing_prj_rejected(spark, tmp_path):
    base = str(tmp_path / "nop")
    write_shapefile_polygons(
        base, [_square(0, 0, 1)], [{"grid_id": 1}], prj_wkt=None
    )
    zpath = str(tmp_path / "noprj.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for ext in (".shp", ".dbf"):
            zf.write(base + ext, "g" + ext)
    with pytest.raises(ValueError, match="Projection file"):
        load_grid_from_files(spark, zpath)
