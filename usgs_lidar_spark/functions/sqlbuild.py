"""Single-parse SQL builders for loop-generated expression trees.

Building a k*dim-literal expression tree through the PySpark Column API
costs one py4j round trip per operator node — measured 3,074 calls for
the 64-permutation MinHash signature aggregate and 3,735 for an
8-centroid x 32-dim cosine argmax, ~0.5 ms each on a loaded driver
(guide §7.3: very large expression trees make PLAN CONSTRUCTION itself
the bottleneck; the fix it prescribes is "avoid generating gigantic
expression trees in loops"). Rendering the same expression as ONE SQL
string parsed JVM-side (`F.expr`) collapses each constructor to a
handful of round trips.

Exactness contract: every builder here must produce an ANALYZED PLAN
SEMANTICALLY EQUAL (`LogicalPlan.sameResult`) to the Column-API form it
replaces — equality of the analyzed plans guarantees bit-identical
results under any execution AND preserves `.cache()` lookups across
reconstructions (Spark's CacheManager matches cached frames by
sameResult, which is what lets a warm session's shingle/band caches
serve every consumer). `tests/test_sqlbuild_parity.py` pins sameResult
for each converted constructor against the frozen Column-API original.

Literal rendering rules (the parts that would silently change results
if done sloppily):
  * doubles render via ``repr(float(x))`` + ``D`` — Python repr is the
    shortest round-trip decimal and Java's Double.parseDouble is
    correctly rounded, so the parsed double is BIT-IDENTICAL to the
    Python float `F.lit` would have shipped; non-finite values are
    rejected loudly (no SQL literal form matches lit(nan/inf) exactly);
  * small ints render bare (parser yields IntegerType, same as
    ``F.lit(py_int)`` below 2^31); values cast long in the composed
    form render as ``CAST(v AS BIGINT)`` so the analyzed tree keeps the
    same Cast node;
  * identifiers are backquoted (backticks doubled) so caller-provided
    column names parse as the same single attribute reference.
"""

from __future__ import annotations

import math


def dlit(x: float) -> str:
    """Exact SQL double literal for a finite Python float."""
    x = float(x)
    if not math.isfinite(x):
        raise ValueError(f"no exact SQL literal for non-finite double {x!r}")
    return repr(x) + "D"


def qident(name: str) -> str:
    """Backquoted SQL identifier (backticks in the name doubled)."""
    return "`" + name.replace("`", "``") + "`"
