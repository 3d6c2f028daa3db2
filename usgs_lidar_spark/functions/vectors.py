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


def quantize_exact(a: Column | str, qbits: int = 20) -> Column:
    """Exactly-reproducible integer quantization of a float/double vector:
    ``q_i = floor(x_i * 2^qbits)`` as BIGINT.

    Every step is bit-deterministic in ANY IEEE-754 engine: multiplying a
    double by a power of two only shifts the exponent (no rounding, barring
    under/overflow at magnitudes this pipeline never sees), and floor of an
    exact double is unambiguous. Unlike decimal ROUND(x, d) — whose binary
    half-way behavior is the classic cross-engine knife edge — there is no
    rounding decision anywhere, so Spark, DuckDB, and Python's
    ``math.floor(x * 2.0**qbits)`` all produce the SAME integers from the
    same inputs. Integer dot products / norms over quantized vectors are
    then exact BIGINT arithmetic: order-independent, hash-stable across
    engines, layouts, and SIMD summation strategies."""
    return F.transform(
        _c(a),
        lambda x: F.floor(x.cast("double") * F.lit(float(2**qbits))).cast("long"),
    )


def dot_q(a: Column | str, b: Column | str) -> Column:
    """Exact BIGINT dot product of two already-quantized integer vectors.

    Overflow envelope: each product is <= 2^(2*qbits) for unit-scale
    inputs, so the dot is <= dim * 2^(2*qbits) (~2^46 at qbits=20,
    dim=64) — safely inside int64 per row. Downstream SUMs over many
    rows are the caller's responsibility: Spark wraps silently past
    2^63 while DuckDB promotes to HUGEINT, so a cross-engine hash
    breaks exactly at the wrap. See `ivf_drift_metrics_exact` for the
    worked per-cell cardinality bound."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)
