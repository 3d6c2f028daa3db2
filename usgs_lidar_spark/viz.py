"""Driver-side visualization + raster sinks (SURVEY.md §2 K3-K5).

Reference: `save_heatmap`/`load_heatmap`/`plot_terrain`
(/root/reference/scripts/usgs_lidar.py:342-398) render the FULL point set
through matplotlib, colored by the `elevation` column with cmap="terrain".
The engine's rule: Spark bounds the data first (voxel downsample or
sample()), and only the bounded aggregate crosses to the driver — a 100 TB
table renders through its ~1e5-voxel decimation, never through collect()
of raw points.

matplotlib / rasterio are import-gated: headless clusters without them can
still use every query path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    """The distributed half of save_heatmap: voxel over (x, y), barycenter
    x/y plus the MEAN ELEVATION per cell, then collect a bounded frame.

    Columns: x, y (cell barycenters), z (mean of ``z_col`` within the
    cell — the color channel, matching the reference's
    ``df.plot(column='elevation')``), n_points (cell density).
    """
    vox = voxel_downsample(
        points, [x_col, y_col], [resolution, resolution], value_cols=[z_col]
    )
    frame = vox.selectExpr(
        f"c{x_col} AS x", f"c{y_col} AS y", f"c{z_col} AS z", "n_points"
    )
    return _bounded_pandas(frame, max_rows)


def save_heatmap(
    points: DataFrame,
    png_path: str,
    title: str = "",
    color_by: str = "elevation",
    **kw,
) -> str:
    """K3: render a 2D heatmap PNG. ``color_by='elevation'`` (default)
    colors cells by the z barycenter with cmap='terrain', matching the
    reference's ``df.plot(column='elevation', cmap='terrain')``
    (/root/reference/scripts/usgs_lidar.py:361-381); ``color_by='density'``
    is an engine extension that colors by per-cell point count."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if color_by not in ("elevation", "density"):
        raise ValueError(f"color_by must be elevation|density, got {color_by!r}")
    pdf = heatmap_frame(points, **kw)
    color = pdf["z"] if color_by == "elevation" else pdf["n_points"]
    fig, ax = plt.subplots(figsize=(10, 8))
    sc = ax.scatter(pdf["x"], pdf["y"], c=color, s=2, cmap="terrain")
    fig.colorbar(sc, ax=ax)
    ax.set_title(title)
    ax.set_xlabel("Longitude")
    ax.set_ylabel("Latitude")
    fig.savefig(png_path, dpi=120)
    plt.close(fig)
    return png_path


def load_heatmap(png_path: str, show: bool = False):
    """K4: load a saved heatmap PNG back into an image array (reference
    ``load_heatmap``, /root/reference/scripts/usgs_lidar.py:383-398 —
    imread + imshow). Driver-side by nature; returns the image array so
    headless tests can assert on it, and only calls ``plt.show()`` when
    asked."""
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.image as mpimg
    import matplotlib.pyplot as plt

    img = mpimg.imread(png_path)
    fig, ax = plt.subplots(figsize=(12, 10))
    ax.imshow(img)
    ax.axis("off")
    if show:
        plt.show()
    else:
        plt.close(fig)
    return img


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


def dem_raster(
    points: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    z_col: str = "z",
    resolution: float = 3.0,
    max_cells: int = MAX_PLOT_ROWS,
):
    """Materialize the voxel grid as a dense 2D DEM raster (the reference
    ships the equivalent artifact as ``data/dem.tif``; SURVEY.md §1.5).

    Distributed part: voxel over (x, y) with mean elevation per cell —
    shuffle bounded by occupied-cell count. Driver part: scatter the
    bounded cell list into a dense row-major numpy grid (row 0 = max y,
    GIS raster convention; empty cells = NaN).

    Returns ``(grid, transform)`` where ``transform`` is the GeoTIFF-style
    dict ``{x_origin, y_origin, pixel_size}`` with (x_origin, y_origin)
    the top-left cell corner IN WORLD COORDINATES: voxel keys are anchored
    at the per-axis global data min (voxel_keys), so the key->world map is
    ``min + key*resolution`` — a ``save_dem`` GeoTIFF is genuinely
    georeferenced, matching the reference's data/dem.tif artifact.
    """
    import numpy as np

    vox = voxel_downsample(
        points, [x_col, y_col], [resolution, resolution], value_cols=[z_col]
    )
    cells = vox.select(
        f"i{x_col}", f"i{y_col}", f"c{z_col}"
    )
    # Single collect with a +1 sentinel row enforces max_cells — a separate
    # count() action would run the whole distributed aggregation twice.
    pdf = cells.limit(max_cells + 1).toPandas()
    if len(pdf) > max_cells:
        # Failure branch only: a count() here costs one extra aggregation
        # but restores the informative message the sentinel row elides.
        n_occupied = cells.count()
        raise ValueError(
            f"DEM raster has {n_occupied} occupied cells, exceeding "
            f"max_cells={max_cells}; raise `resolution` to decimate further"
        )
    if len(pdf) == 0:
        return np.full((0, 0), np.nan), {
            "x_origin": 0.0, "y_origin": 0.0, "pixel_size": resolution,
        }
    # World anchor of the voxel grid: the same global per-axis mins the key
    # computation used. A scalar two-column agg — one cheap scan, driver
    # sees two doubles.
    mins = points.agg(
        F.min(x_col).alias("mx"), F.min(y_col).alias("my")
    ).collect()[0]
    min_x, min_y = float(mins["mx"]), float(mins["my"])
    ix = pdf[f"i{x_col}"].to_numpy()
    iy = pdf[f"i{y_col}"].to_numpy()
    z = pdf[f"c{z_col}"].to_numpy(dtype=float)
    ix0, iy0 = int(ix.min()), int(iy.min())
    w, h = int(ix.max()) - ix0 + 1, int(iy.max()) - iy0 + 1
    grid = np.full((h, w), np.nan)
    grid[(iy.max() - iy).astype(int), (ix - ix0).astype(int)] = z
    transform = {
        "x_origin": min_x + ix0 * resolution,
        "y_origin": min_y + (int(iy.max()) + 1) * resolution,
        "pixel_size": resolution,
    }
    return grid, transform


def save_dem(
    points: DataFrame,
    path: str,
    **kw,
) -> str:
    """Write the DEM raster to disk. ``.npy`` always works (numpy);
    ``.tif`` requires rasterio (import-gated — not in the base image);
    ``.png`` renders through matplotlib's terrain colormap."""
    import numpy as np

    grid, transform = dem_raster(points, **kw)
    if path.endswith(".npy"):
        np.save(path, grid)
    elif path.endswith(".tif") or path.endswith(".tiff"):
        try:
            import rasterio
            from rasterio.transform import from_origin
        except ImportError as e:  # pragma: no cover - rasterio not baked in
            raise NotImplementedError(
                "GeoTIFF output needs rasterio, which is not installed; "
                "use .npy or .png"
            ) from e
        t = from_origin(
            transform["x_origin"], transform["y_origin"],
            transform["pixel_size"], transform["pixel_size"],
        )
        with rasterio.open(
            path, "w", driver="GTiff", height=grid.shape[0],
            width=grid.shape[1], count=1, dtype=grid.dtype, transform=t,
        ) as dst:
            dst.write(grid, 1)
    elif path.endswith(".png"):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 8))
        im = ax.imshow(grid, cmap="terrain")
        fig.colorbar(im, ax=ax)
        fig.savefig(path, dpi=120)
        plt.close(fig)
    else:
        raise ValueError(f"unsupported DEM extension: {path}")
    return path
