"""Terrain derivatives over voxel grids: IDW regridding and TWI.

These are the reference's DECLARED-but-unimplemented features
(SURVEY.md §2 Z1/Z2): README.md:43-54 promises a TWI column and
interpolation-to-grid; no reference code computes either. The engine
defines them with standard formulas over the voxel grid.

Scale design — neighborhood access without a non-equi join:
a 3x3 stencil via self-join on `abs(ix-jx)<=1 AND abs(iy-jy)<=1` would be
a BroadcastNestedLoopJoin (quadratic). Instead every cell OFFERS its value
to its 9 neighbor positions (a 9x explode — narrow), and one equi-shuffle
on the receiving cell key pivots the offers into 9 columns via conditional
aggregation. Cost: 9x row amplification + one hash shuffle — linear in
grid size, skew-free, identical at 100 TB.

Determinism: each (dx,dy) slot holds at most one neighbor, so the
conditional MAX is exact; the stencil arithmetic is a fixed-order closed
expression — bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _slot(dx: int, dy: int) -> str:
    return f"v_{'m' if dx < 0 else 'p' if dx > 0 else '0'}{'m' if dy < 0 else 'p' if dy > 0 else '0'}"


def neighbor_pivot(
    cells: DataFrame, ix: str = "ix", iy: str = "iy", val: str = "cz"
) -> DataFrame:
    """Pivot each cell's 3x3 neighborhood into columns v_mm..v_pp
    (v_00 = the cell itself; NULL where the neighbor cell is empty)."""
    offers = F.array(
        *[
            F.struct(
                (F.col(ix) + dx).alias("tix"),
                (F.col(iy) + dy).alias("tiy"),
                F.lit(-dx).alias("dx"),
                F.lit(-dy).alias("dy"),
                F.col(val).alias("v"),
            )
            for dx, dy in OFFSETS
        ]
    )
    long = cells.select(F.explode(offers).alias("o")).select("o.*")
    aggs = [
        F.max(
            F.when((F.col("dx") == dx) & (F.col("dy") == dy), F.col("v"))
        ).alias(_slot(dx, dy))
        for dx, dy in OFFSETS
    ]
    pivoted = long.groupBy(
        F.col("tix").alias(ix), F.col("tiy").alias(iy)
    ).agg(*aggs)
    # Keep only real cells (the pivot also materializes empty positions
    # that merely *received* offers).
    return pivoted.filter(F.col(_slot(0, 0)).isNotNull())


def idw_regrid(
    cells: DataFrame,
    ix: str = "ix",
    iy: str = "iy",
    val: str = "cz",
) -> DataFrame:
    """Z2: inverse-distance-weighted smoothing over the 3x3 neighborhood,
    w(dx,dy) = 1/(1 + dx^2 + dy^2); missing neighbors drop out of both
    numerator and denominator. Output: (ix, iy, idw_value)."""
    p = neighbor_pivot(cells, ix, iy, val)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for dx, dy in OFFSETS:
        s = F.col(_slot(dx, dy))
        w = 1.0 / (1.0 + dx * dx + dy * dy)
        num = num + F.when(s.isNotNull(), s * F.lit(w)).otherwise(F.lit(0.0))
        den = den + F.when(s.isNotNull(), F.lit(w)).otherwise(F.lit(0.0))
    return p.select(ix, iy, (num / den).alias("idw_value"))


def twi_grid(
    cells: DataFrame,
    ix: str = "ix",
    iy: str = "iy",
    val: str = "cz",
    cell_size: float = 1.0,
) -> DataFrame:
    """Z1: Topographic Wetness Index, TWI = ln(a / tan(beta)).

    * tan(beta) (slope) from central differences over the 3x3 stencil —
      requires all four axis neighbors (cells on the grid interior).
    * a (specific contributing area) uses the standard single-cell proxy:
      (1 + count of strictly-higher 8-neighbors) * cell_size — a
      one-hop approximation of flow accumulation (full accumulation is
      iterative and not a single relational pass; documented choice).
    Output: (ix, iy, tan_beta, contrib, twi)."""
    p = neighbor_pivot(cells, ix, iy, val)
    interior = p.filter(
        F.col("v_m0").isNotNull()
        & F.col("v_p0").isNotNull()
        & F.col("v_0m").isNotNull()
        & F.col("v_0p").isNotNull()
    )
    dzdx = (F.col("v_p0") - F.col("v_m0")) / F.lit(2.0 * cell_size)
    dzdy = (F.col("v_0p") - F.col("v_0m")) / F.lit(2.0 * cell_size)
    tan_beta = F.sqrt(dzdx * dzdx + dzdy * dzdy)
    higher = sum(
        (
            F.when(
                F.col(_slot(dx, dy)) > F.col("v_00"), F.lit(1)
            ).otherwise(F.lit(0))
            for dx, dy in OFFSETS
            if (dx, dy) != (0, 0)
        ),
        F.lit(0),
    )
    contrib = (F.lit(1) + higher).cast("double") * F.lit(cell_size)
    twi = F.log(contrib / F.greatest(tan_beta, F.lit(1e-6)))
    return interior.select(
        ix,
        iy,
        tan_beta.alias("tan_beta"),
        contrib.alias("contrib"),
        twi.alias("twi"),
    )
