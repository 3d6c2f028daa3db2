"""Bit-exact NumPy twins of the engine's Catalyst vector expressions,
for Arrow-vectorized kernels (guide §4.2: hand whole batches to native
vectorized code instead of per-element interpreted lambdas).

The expression forms these mirror are `functions/vectors.dot` /
`norm` (sequential left-fold in double precision) and Spark's
`round(double, d)` (HALF_UP over the value's shortest decimal
representation). Every helper here reproduces the exact IEEE operation
sequence of its Catalyst twin, so an operator can swap its interpreted
higher-order-function scoring for a NumPy kernel WITHOUT changing a
single output bit — the property the DuckDB oracles pin.

Why not plain ``numpy.dot`` / ``numpy.round``: BLAS reorders the
summation (pairwise/SIMD) which can flip the 4th rounded decimal on
boundary values, and ``np.round`` is HALF_EVEN over the binary value
while Spark rounds the SHORTEST DECIMAL representation HALF_UP
(BigDecimal.valueOf). Both differences are rare but fatal to a
hash-pinned oracle; the helpers below pay a small constant factor to
remove them entirely (verified on 3e5 adversarial values and the full
driver replica).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np


def seqfold_dot(C: np.ndarray, S: np.ndarray) -> np.ndarray:
    """All-pairs dot products with the exact IEEE addition order of
    ``aggregate(zip_with(a, b, x*y), 0.0, +)``: a sequential left-fold
    over dimensions. C: (n, d) float64, S: (m, d) float64 → (n, m).

    Each output element is (((0.0 + p_0) + p_1) + ... + p_{d-1}) with
    p_i computed as a single double multiply — identical to the
    Catalyst fold, because elementwise ``+=`` over the accumulator
    performs one correctly-rounded add per step in the same order."""
    n, m = C.shape[0], S.shape[0]
    acc = np.zeros((n, m), dtype=np.float64)
    for i in range(C.shape[1]):
        acc += C[:, i, None] * S[None, :, i]
    return acc


def seqfold_sqnorm(V: np.ndarray) -> np.ndarray:
    """Sequential-fold sum of squares per row (the ``dot(a, a)`` twin)."""
    acc = np.zeros(V.shape[0], dtype=np.float64)
    for i in range(V.shape[1]):
        acc += V[:, i] * V[:, i]
    return acc


def spark_round_double(y: np.ndarray, digits: int = 4) -> np.ndarray:
    """Vectorized bit-exact replica of Spark's ``round(double, digits)``
    (= BigDecimal.valueOf(x).setScale(digits, HALF_UP).toDouble: HALF_UP
    over the SHORTEST decimal representation, zero always +0.0).

    Fast path: floor(y*10^d + 0.5) / 10^d — equal to Spark's result
    everywhere except within ~1e-9 of a decimal .5 tie, where binary
    and shortest-decimal views can disagree; values inside a 1e-6
    guard band are re-done exactly via Decimal(repr(x)) (Python repr
    is the same shortest round-trip representation java.lang.Double
    uses). Verified mismatch-free on 3e5 random + boundary-heavy
    values against a live Spark session."""
    scale = 10.0 ** digits
    scaled = y * scale
    fast = np.floor(scaled + 0.5) / scale
    frac = scaled - np.floor(scaled)
    near = np.abs(frac - 0.5) < 1e-6
    if near.any():
        q = Decimal(1).scaleb(-digits)
        flat = fast.reshape(-1)
        yflat = y.reshape(-1)
        for i in np.nonzero(near.reshape(-1))[0]:
            flat[i] = float(
                Decimal(repr(float(yflat[i]))).quantize(
                    q, rounding=ROUND_HALF_UP
                )
            )
    return fast + 0.0  # normalize -0.0 → +0.0 (BigDecimal zero is unsigned)


def list_array_to_matrix(arr, expect_dim: int | None = None) -> np.ndarray:
    """pyarrow List<float*> column → (n, d) float64 matrix (exact cast).

    Raises loudly on ragged rows or nulls — the vector operators'
    contract is fixed-dimension non-null embeddings (the expression
    path would silently produce NULL similarities there, which no
    caller wants)."""
    if arr.null_count:
        raise ValueError("null embedding in Arrow vector batch")
    offsets = arr.offsets.to_numpy()
    widths = np.diff(offsets)
    if len(widths) == 0:
        return np.zeros((0, expect_dim or 0), dtype=np.float64)
    dim = int(widths[0])
    if not (widths == dim).all() or (expect_dim is not None and dim != expect_dim):
        raise ValueError(
            f"ragged embedding dims in Arrow vector batch: "
            f"{sorted(set(widths.tolist()))[:5]} expect={expect_dim}"
        )
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(widths), dim).astype(np.float64)
