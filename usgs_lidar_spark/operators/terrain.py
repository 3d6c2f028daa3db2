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


#: Non-center stencil offsets in deterministic preference order (ties in
#: steepest drop resolve to the LOWEST index — mirrored by the oracle SQL).
D8_OFFSETS = [(dx, dy) for dx, dy in OFFSETS if (dx, dy) != (0, 0)]

_SQRT2 = 1.4142135623730951


def d8_flow_directions(
    cells: DataFrame,
    ix: str = "ix",
    iy: str = "iy",
    val: str = "cz",
    cell_size: float = 1.0,
) -> DataFrame:
    """D8 flow routing: each cell drains to its steepest-descent neighbor
    (drop = (z - z_n)/dist, diagonal dist = cell_size*sqrt(2)); pits and
    flats (no strictly lower neighbor) emit no edge. Output:
    (ix, iy, tix, tiy) — one edge per draining cell.

    Deterministic: drops are rounded (9 dp) and ties resolve by stencil
    preference order, so the flow graph is bit-stable across engines and
    partitionings. Same neighbor-offer plan shape as the other stencil
    ops: no non-equi join anywhere."""
    p = neighbor_pivot(cells, ix, iy, val)
    cands = []
    for idx, (dx, dy) in enumerate(D8_OFFSETS):
        dist = cell_size * (_SQRT2 if dx != 0 and dy != 0 else 1.0)
        slot = F.col(_slot(dx, dy))
        cands.append(
            F.when(
                slot.isNotNull(),
                F.struct(
                    F.round((F.col("v_00") - slot) / F.lit(dist), 9).alias(
                        "drop"
                    ),
                    F.lit(-idx).alias("tb"),
                    F.lit(dx).alias("dx"),
                    F.lit(dy).alias("dy"),
                ),
            )
        )
    best = F.array_max(F.array(*cands))  # max drop, then lowest index
    return (
        p.withColumn("__best", best)
        .filter(F.col("__best.drop") > 0)
        .select(
            ix,
            iy,
            (F.col(ix) + F.col("__best.dx")).alias("tix"),
            (F.col(iy) + F.col("__best.dy")).alias("tiy"),
        )
    )


def flow_accumulation(
    cells: DataFrame,
    ix: str = "ix",
    iy: str = "iy",
    val: str = "cz",
    cell_size: float = 1.0,
    max_iter: int = 64,
    on_unconverged: str = "warn",
    stats: dict | None = None,
) -> DataFrame:
    """Iterative D8 flow accumulation — the full upstream-area computation
    the one-hop TWI proxy approximates. acc(c) = 1 + sum of acc over all
    cells draining into c; computed by fixpoint iteration
    acc_{k+1} = 1 + inflow(acc_k), which stabilizes once k reaches the
    longest flow-path length (the flow graph is a forest — each cell has
    at most one outflow — so the iteration is exact, not approximate).

    Scale shape per round: one equi-shuffle of (edge, acc) keyed by the
    receiving cell + a scalar-only convergence count (the same discipline
    as operators/graph connected components; per-round localCheckpoint
    truncates lineage). Rounds track the longest drainage path — fine for
    voxel-tile DEMs; continental river networks would want the
    pointer-doubling rewrite (graph.py's star pattern applied to paths).

    Output: (ix, iy, acc) for every input cell."""
    import warnings

    from usgs_lidar_spark.operators.graph import ConvergenceWarning

    edges = d8_flow_directions(cells, ix, iy, val, cell_size).localCheckpoint()
    base = cells.select(ix, iy).localCheckpoint()
    acc = base.withColumn("acc", F.lit(1).cast("long"))
    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        inflow = (
            edges.join(acc, [ix, iy])
            .groupBy(F.col("tix").alias(ix), F.col("tiy").alias(iy))
            .agg(F.sum("acc").alias("__in"))
        )
        new_acc = (
            base.join(inflow, [ix, iy], "left")
            .select(
                ix,
                iy,
                (F.lit(1) + F.coalesce(F.col("__in"), F.lit(0)))
                .cast("long")
                .alias("acc"),
            )
            .localCheckpoint()
        )
        changed = (
            new_acc.alias("n")
            .join(acc.alias("o"), [ix, iy])
            .filter(F.col("n.acc") != F.col("o.acc"))
            .count()
        )
        acc = new_acc
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats.update({"rounds": rounds, "converged": converged})
    if not converged:
        msg = (
            f"flow_accumulation hit max_iter={max_iter} before converging — "
            "accumulation values on the longest paths are partial"
        )
        if on_unconverged == "raise":
            raise RuntimeError(msg)
        warnings.warn(msg, ConvergenceWarning, stacklevel=2)
    return acc


def hillshade_grid(
    cells: DataFrame,
    ix: str = "ix",
    iy: str = "iy",
    val: str = "cz",
    cell_size: float = 1.0,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
) -> DataFrame:
    """Analytical hillshade over the cell grid (the DEM-visualization
    companion of TWI): illumination of each interior cell by a light at
    (azimuth, altitude), the standard cartographic formula — but
    algebraically reduced so NO trigonometric function ever touches
    data:

        shade = (cos z + sin z * (-sin a * dz/dx - cos a * dz/dy))
                / sqrt(1 + tan_beta^2),   clamped to [0, 1], x255

    For an x=east / y=north (y-up) grid with azimuth clockwise from
    north, the sun unit vector is (sin a sin z, cos a sin z, cos z) and
    the upward surface normal is (-dzdx, -dzdy, 1)/sqrt(1+t^2); shade is
    their dot product, i.e. cos(slope) = 1/sqrt(1+t^2) and
    sin(slope)*cos(a - aspect) = (-sin a * dzdx - cos a * dzdy)
    /sqrt(1+t^2). (cos/sin of the constant sun angles are
    Python-computed literals.) Only +,*,/
    and sqrt run on data, so the result is bit-reproducible in any
    engine — the determinism trap with atan2/cos/sin libm variance
    never opens. Same 3x3 neighbor-offer stencil as twi_grid; one
    shuffle, interior cells only. Output: (ix, iy, hillshade)."""
    import math

    z = math.radians(90.0 - altitude_deg)
    a = math.radians(azimuth_deg)
    cos_z, sin_z = math.cos(z), math.sin(z)
    cos_a, sin_a = math.cos(a), math.sin(a)

    p = neighbor_pivot(cells, ix, iy, val)
    interior = p.filter(
        F.col("v_m0").isNotNull()
        & F.col("v_p0").isNotNull()
        & F.col("v_0m").isNotNull()
        & F.col("v_0p").isNotNull()
    )
    dzdx = (F.col("v_p0") - F.col("v_m0")) / F.lit(2.0 * cell_size)
    dzdy = (F.col("v_0p") - F.col("v_0m")) / F.lit(2.0 * cell_size)
    t2 = dzdx * dzdx + dzdy * dzdy
    raw = (
        F.lit(cos_z)
        + F.lit(sin_z) * (F.lit(-sin_a) * dzdx + F.lit(-cos_a) * dzdy)
    ) / F.sqrt(F.lit(1.0) + t2)
    shade = F.greatest(F.lit(0.0), F.least(F.lit(1.0), raw)) * F.lit(255.0)
    return interior.select(ix, iy, shade.alias("hillshade"))
