"""Visualization sinks: the distributed half must bound what reaches the
driver; the matplotlib half is import-gated. The heatmap color channel is
pinned to the elevation barycenter (reference plots column='elevation',
/root/reference/scripts/usgs_lidar.py:361-381)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from usgs_lidar_spark.viz import (
    dem_raster,
    heatmap_frame,
    load_heatmap,
    plot_terrain_frame,
    save_dem,
    save_heatmap,
)


@pytest.fixture()
def points(spark):
    return spark.range(5000).select(
        (F.col("id") * 3.7 % 300).alias("x"),
        (F.col("id") * 7.1 % 300).alias("y"),
        (F.col("id") % 50 + 300.0).alias("z"),
    )


def test_heatmap_frame_bounded(points):
    pdf = heatmap_frame(points, resolution=3.0, max_rows=100)
    assert len(pdf) <= 100
    assert set(pdf.columns) == {"x", "y", "z", "n_points"}


def test_heatmap_frame_z_is_cell_mean_elevation(spark):
    # Two cells: cell (0,0) holds z=10 and 20 (mean 15), far cell holds 99.
    rows = [(0.0, 0.0, 10.0), (1.0, 1.0, 20.0), (100.0, 100.0, 99.0)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    pdf = heatmap_frame(df, resolution=3.0).sort_values("x")
    assert list(pdf["z"]) == [15.0, 99.0]


def test_terrain_frame(points):
    pdf = plot_terrain_frame(points, resolution=10.0)
    assert set(pdf.columns) == {"x", "y", "z"}
    assert 0 < len(pdf) <= 5000


def test_save_heatmap_png_colors_by_elevation(spark, tmp_path):
    pytest.importorskip("matplotlib")
    # Uniform density (one point per cell) but varying z: the default
    # elevation-colored PNG must differ from the density-colored one
    # (which collapses to a single color) — pins that the color channel
    # is z-derived, not n_points.
    df = spark.range(200).select(
        (F.col("id") * 10.0).alias("x"),
        F.lit(0.0).alias("y"),
        (F.col("id") % 37 * 5.0).alias("z"),
    )
    p_elev = save_heatmap(df, str(tmp_path / "elev.png"), title="t")
    p_dens = save_heatmap(
        df, str(tmp_path / "dens.png"), title="t", color_by="density"
    )
    import os

    assert os.path.getsize(p_elev) > 0
    with open(p_elev, "rb") as a, open(p_dens, "rb") as b:
        assert a.read() != b.read()
    with pytest.raises(ValueError):
        save_heatmap(df, str(tmp_path / "x.png"), color_by="points")


def test_load_heatmap_roundtrip(points, tmp_path):
    pytest.importorskip("matplotlib")
    png = save_heatmap(points, str(tmp_path / "hm.png"))
    img = load_heatmap(png)
    assert img.ndim == 3 and img.shape[0] > 0 and img.shape[1] > 0


def test_dem_raster_grid(spark):
    import numpy as np

    rows = [(0.0, 0.0, 10.0), (1.0, 1.0, 20.0), (6.0, 0.0, 40.0)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    grid, transform = dem_raster(df, resolution=3.0)
    # Cells: (0,0) mean 15, (2,0) = 40 -> 1 row x 3 cols, middle NaN.
    assert grid.shape == (1, 3)
    assert grid[0, 0] == 15.0 and grid[0, 2] == 40.0
    assert np.isnan(grid[0, 1])
    assert transform["pixel_size"] == 3.0


def test_dem_raster_world_georeferencing(spark):
    """The transform origin must carry WORLD coordinates: voxel keys are
    anchored at the global data min, so a grid over x in [100, 106],
    y in [50, 60] has top-left corner (100, 50 + (iy_max+1)*res)."""
    rows = [(100.0, 50.0, 1.0), (106.0, 60.0, 2.0)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    grid, t = dem_raster(df, resolution=3.0)
    assert t["pixel_size"] == 3.0
    assert t["x_origin"] == 100.0  # min_x + ix0(=0)*res
    # iy_max = floor((60-50)/3) = 3 -> y_origin = 50 + 4*3 = 62
    assert t["y_origin"] == 62.0
    # world x of the rightmost occupied cell's left edge:
    # ix = floor((106-100)/3) = 2 -> 100 + 2*3 = 106 <= 106 < 109
    assert grid.shape == (4, 3)


def test_dem_raster_row_order_top_is_max_y(spark):
    import numpy as np  # noqa: F401

    rows = [(0.0, 0.0, 1.0), (0.0, 10.0, 2.0)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    grid, _ = dem_raster(df, resolution=3.0)
    # GIS convention: row 0 = max y.
    assert grid[0, 0] == 2.0 and grid[-1, 0] == 1.0


def test_dem_raster_cell_cap(points):
    with pytest.raises(ValueError):
        dem_raster(points, resolution=3.0, max_cells=10)


def test_save_dem_npy_and_png(points, tmp_path):
    import os

    import numpy as np

    p = save_dem(points, str(tmp_path / "dem.npy"), resolution=10.0)
    arr = np.load(p)
    assert arr.ndim == 2 and arr.size > 0
    pytest.importorskip("matplotlib")
    p2 = save_dem(points, str(tmp_path / "dem.png"), resolution=10.0)
    assert os.path.getsize(p2) > 0
    with pytest.raises(ValueError):
        save_dem(points, str(tmp_path / "dem.xyz"))
