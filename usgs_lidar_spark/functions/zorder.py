"""Z-order (Morton) keys for spatial clustering — pure column bit math.

The point-table layout (sources/writers.py) approximates the EPT octree
with parquet row-group min/max stats; a linear (x, y) sort makes the
stats tight in x but loose in y. Sorting by the Morton code instead
interleaves the two dimensions, so each row group covers a compact square
— bbox predicates then prune row groups in BOTH axes (the property that
makes z-ordering the standard layout for spatial scans at scale).

Everything is built-in integer expressions (quantize -> interleave bits),
so the key computation is codegen'd and adds no Python to the write path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(col: Column | str, lo: float, hi: float, bits: int = 16) -> Column:
    """Map [lo, hi] -> integer [0, 2^bits), clamped."""
    c = F.col(col) if isinstance(col, str) else col
    n = (1 << bits) - 1
    scaled = ((c - F.lit(lo)) / F.lit(hi - lo)) * n
    return F.least(
        F.greatest(F.floor(scaled).cast("long"), F.lit(0)), F.lit(n)
    )


def morton_key(
    x: Column | str,
    y: Column | str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bits: int = 16,
) -> Column:
    """Interleaved 2-D Morton code (y gets the even bit positions, x the
    odd) as a long — 2*bits significant bits."""
    qx = quantize(x, *x_range, bits=bits)
    qy = quantize(y, *y_range, bits=bits)
    key = F.lit(0).cast("long")
    for j in range(bits):
        bit_x = F.shiftright(qx, j).bitwiseAND(F.lit(1).cast("long"))
        bit_y = F.shiftright(qy, j).bitwiseAND(F.lit(1).cast("long"))
        key = key + F.shiftleft(bit_x, 2 * j + 1) + F.shiftleft(bit_y, 2 * j)
    return key
