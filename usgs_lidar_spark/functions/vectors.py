"""Vector math over ArrayType(FloatType) embedding columns — pure
higher-order Catalyst expressions (zip_with / aggregate), no UDF. Elements
are cast to double before any arithmetic so results are reproducible and
engine-comparable (float accumulation would drift).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential left-fold dot product in double precision."""
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0 when either norm is 0."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(d / (na * nb))


def sign_lsh_bucket(a: Column | str, n_bits: int = 8) -> Column:
    """Deterministic LSH bucket: sign bits of the first `n_bits` dimensions
    (axis-aligned random-projection hashing — hyperplanes are the coordinate
    axes, so no seeded randomness is needed and the oracle can reproduce it).
    bucket = sum_j (a[j] > 0) << j, a long in [0, 2^n_bits)."""
    arr = _c(a)
    b = F.lit(0).cast("long")
    for j in range(n_bits):
        b = b + F.when(arr.getItem(j) > 0, F.lit(1 << j)).otherwise(0).cast("long")
    return b
