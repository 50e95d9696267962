"""Spatial-interpolation golden tests (mirrors
imputation/spatial/daily_spatial_interpolator__test.py: a 4×4 lattice with
a known NaN pattern; interior cells resolve by linear interpolation,
hull-exterior cells by nearest-neighbour; valid cells unchanged)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pm25ml_spark.operators.interpolation import (
    daily_spatial_interpolate,
    interpolate_frame,
)


def lattice_4x4() -> pd.DataFrame:
    """4×4 lattice, 10 km step. Values = x/10000 + y/10000 (a plane),
    so any linear interpolation must reproduce the plane exactly."""
    rows = []
    gid = 0
    for yi in range(4):
        for xi in range(4):
            rows.append(
                {
                    "grid_id": gid,
                    "date": "2023-01-01",
                    "original_x": 10000.0 * xi,
                    "original_y": 10000.0 * yi,
                    "value": float(xi + yi),
                }
            )
            gid += 1
    return pd.DataFrame(rows)


def test_interior_linear_exact_on_plane():
    pdf = lattice_4x4()
    # knock out interior cells (1,1), (2,2) and edge-interior (1,0)
    for gid in (5, 10, 1):
        pdf.loc[pdf.grid_id == gid, "value"] = np.nan
    out = interpolate_frame(pdf.copy(), ["value"])
    # plane is linear → axis-linear interpolation reproduces it exactly
    expect = lattice_4x4()["value"]
    assert np.allclose(out.sort_values("grid_id")["value"].to_numpy(), expect)


def test_valid_values_preserved_exactly():
    pdf = lattice_4x4()
    pdf.loc[pdf.grid_id == 5, "value"] = np.nan
    out = interpolate_frame(pdf.copy(), ["value"])
    valid = pdf["value"].notna()
    assert (out.loc[valid, "value"] == pdf.loc[valid, "value"]).all()


def test_corner_outside_hull_nearest():
    pdf = lattice_4x4()
    # knock out a corner (0,0) AND its axis neighbours → no interior
    # linear estimate → nearest valid fill
    for gid in (0, 1, 4):
        pdf.loc[pdf.grid_id == gid, "value"] = np.nan
    out = interpolate_frame(pdf.copy(), ["value"])
    got = out.set_index("grid_id")["value"]
    # grid 1 at (10000,0): row has valid at x=20000,30000 → interior? no
    # (1 is left of both) → nearest = (20000,0) value 2.0
    assert got[1] == pytest.approx(2.0)
    # corner 0 at (0,0): nearest valid is (10000,10000) dist √2·10⁴ vs
    # (20000, 0) dist 2·10⁴ → picks (10000,10000) = 2.0
    assert got[0] == pytest.approx(2.0)


def test_all_null_column_left_untouched():
    pdf = lattice_4x4()
    pdf["value"] = np.nan
    out = interpolate_frame(pdf.copy(), ["value"])
    assert out["value"].isna().all()


def test_distributed_by_date(spark):
    pdf1 = lattice_4x4()
    pdf1.loc[pdf1.grid_id == 5, "value"] = np.nan
    pdf2 = lattice_4x4()
    pdf2["date"] = "2023-01-02"
    pdf2.loc[pdf2.grid_id == 10, "value"] = np.nan
    df = spark.createDataFrame(pd.concat([pdf1, pdf2]))
    out = daily_spatial_interpolate(df, ["value"]).toPandas()
    assert out["value"].notna().all()
    d1 = out[(out.date == "2023-01-01") & (out.grid_id == 5)]["value"].iloc[0]
    d2 = out[(out.date == "2023-01-02") & (out.grid_id == 10)]["value"].iloc[0]
    assert d1 == pytest.approx(2.0)  # plane value at (1,1)
    assert d2 == pytest.approx(4.0)  # plane value at (2,2)
