"""Regenerate committed golden fixtures for queries with no SQL oracle.

The registry entries whose semantics are defined over Spark's own
HLL / KLL sketch kernels (``sketch_approx_stats``,
``sketch_hll_mergeable``) cannot be cross-checked by DuckDB, but they
ARE bit-deterministic for a fixed input: Spark's HyperLogLog++ /
percentile_approx estimates are pure functions of the value multiset.
So we pin them with committed expected outputs at sf0.01 (the driver's
correctness scale) and assert exact equality in pytest — turning
"rows-only" checks into hard ones. (The xxhash64 SimHash pair that used
to live here was retired in round 10: `dedup_simhash_portable` /
`dedup_simhash_portable_pairs` carry the SimHash tier under HARD DuckDB
oracles, so the golden set stays minimal.)

Usage: python tools/make_goldens.py   (rewrites tests/fixtures/golden_*.json)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

GOLDEN_QUERIES = (
    "sketch_approx_stats",
    # Datasketches HLL tiers: union is commutative/associative and the
    # estimate a pure function of the value multiset -> bit-deterministic
    # under any partitioning, same pinning contract as the trio above.
    "sketch_hll_mergeable",
)
SF_DIR = "/root/testdata/sf0.01"
FIXTURES = REPO / "tests" / "fixtures"


def canonical_rows(df) -> list[list]:
    """Order-insensitive, JSON-serializable canonical form: rows as value
    lists in schema column order, sorted by their JSON encoding (floats
    via repr — exact double round-trip)."""
    rows = [[r[c] for c in df.columns] for r in df.collect()]
    return sorted(rows, key=lambda row: json.dumps(row, default=str))


def main() -> None:
    from usgs_lidar_spark.plans import queries as q
    from usgs_lidar_spark.session import get_spark

    spark = get_spark(app_name="make-goldens", cpus=8, shuffle_partitions=8)
    for name in GOLDEN_QUERIES:
        df = q.QUERIES[name](spark, SF_DIR)
        payload = {
            "query": name,
            "sf_dir": SF_DIR,
            "columns": df.columns,
            "dtypes": df.dtypes,
            "rows": canonical_rows(df),
        }
        out = FIXTURES / f"golden_{name}.json"
        out.write_text(json.dumps(payload, indent=1, default=str) + "\n")
        print(f"wrote {out} ({len(payload['rows'])} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
