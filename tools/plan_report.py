"""Plan audit: print the physical-plan shape digest for every bench
headliner (and any extra query names passed as arguments) at sf0.001 —
the human-readable companion of tests/test_plans.py's pinned digests.

Reads the same digest function the tests use, so a row here exactly
matches what the regression guard would compare. Use it when auditing
a new query's plan before pinning, or to eyeball the whole headliner
surface after a Spark upgrade:

    python tools/plan_report.py                  # all bench headliners
    python tools/plan_report.py q1_pricing_summary sim_topk_sq8
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> None:
    from bench import HEADLINE
    from test_plans import _plan, plan_digest
    from usgs_lidar_spark.session import get_spark

    names = sys.argv[1:] or HEADLINE
    spark = get_spark("plan-report", cpus=8, shuffle_partitions=8)
    width = max(len(n) for n in names)
    for name in names:
        spark.catalog.clearCache()
        try:
            d = plan_digest(_plan(spark, name))
        except Exception as e:  # surface, keep going
            print(f"{name:{width}s}  ERROR {str(e)[:80]}")
            continue
        parts = ", ".join(f"{k}={v}" for k, v in sorted(d.items()))
        print(f"{name:{width}s}  {parts}")
    spark.stop()


if __name__ == "__main__":
    main()
