"""Visualization sinks: the distributed half must bound what reaches the
driver; the matplotlib half is import-gated."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from usgs_lidar_spark.viz import heatmap_frame, plot_terrain_frame, save_heatmap


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
    assert set(pdf.columns) == {"x", "y", "n_points"}


def test_terrain_frame(points):
    pdf = plot_terrain_frame(points, resolution=10.0)
    assert set(pdf.columns) == {"x", "y", "z"}
    assert 0 < len(pdf) <= 5000


def test_save_heatmap_png(points, tmp_path):
    pytest.importorskip("matplotlib")
    out = save_heatmap(points, str(tmp_path / "hm.png"), title="t")
    import os

    assert os.path.getsize(out) > 0
