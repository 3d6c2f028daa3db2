"""Driver-side visualization sinks (SURVEY.md §2 K3-K5).

Reference: `save_heatmap`/`load_heatmap`/`plot_terrain`
(/root/reference/scripts/usgs_lidar.py:342-398) render the FULL point set
through matplotlib. The engine's rule: Spark bounds the data first (voxel
downsample or sample()), and only the bounded aggregate crosses to the
driver — a 100 TB table renders through its ~1e5-voxel decimation, never
through collect() of raw points.

matplotlib is import-gated: headless clusters without it can still use
every query path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from usgs_lidar_spark.operators.voxel import voxel_downsample

#: Hard cap on rows allowed to reach the driver for plotting.
MAX_PLOT_ROWS = 500_000


def _bounded_pandas(df: DataFrame, max_rows: int):
    n = df.count()
    if n > max_rows:
        # sample() is probabilistic — limit() enforces the hard cap.
        df = df.sample(fraction=max_rows / n, seed=42).limit(max_rows)
    return df.toPandas()


def heatmap_frame(
    points: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    z_col: str = "z",
    resolution: float = 3.0,
    max_rows: int = MAX_PLOT_ROWS,
):
    """The distributed half of save_heatmap: voxel-decimate then collect a
    bounded frame (columns x, y, z = barycenters)."""
    vox = voxel_downsample(points, [x_col, y_col], [resolution, resolution])
    frame = vox.selectExpr(
        f"c{x_col} AS x", f"c{y_col} AS y", "n_points"
    )
    pdf = _bounded_pandas(frame, max_rows)
    return pdf


def save_heatmap(points: DataFrame, png_path: str, title: str = "", **kw) -> str:
    """K3: render a 2D heatmap PNG (terrain colormap like the reference's
    cmap='terrain', scripts/usgs_lidar.py:361-381)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pdf = heatmap_frame(points, **kw)
    fig, ax = plt.subplots(figsize=(10, 8))
    sc = ax.scatter(pdf["x"], pdf["y"], c=pdf["n_points"], s=2, cmap="terrain")
    fig.colorbar(sc, ax=ax)
    ax.set_title(title)
    fig.savefig(png_path, dpi=120)
    plt.close(fig)
    return png_path


def plot_terrain_frame(
    points: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    z_col: str = "z",
    resolution: float = 3.0,
    max_rows: int = MAX_PLOT_ROWS,
):
    """K5's distributed half: bounded (x, y, z) frame for a 3D scatter."""
    vox = voxel_downsample(points, [x_col, y_col, z_col], [resolution] * 3)
    frame = vox.selectExpr(
        f"c{x_col} AS x", f"c{y_col} AS y", f"c{z_col} AS z"
    )
    return _bounded_pandas(frame, max_rows)
