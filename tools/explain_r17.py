"""Capture `.explain("formatted")` for bench headliners into plans/r17/.

Usage:
    python tools/explain_r17.py before                 # all headliners
    python tools/explain_r17.py after q1 q2 ...        # a subset

Writes plans/r17/<query>_<tag>.txt — the optimization-round evidence
files (OPTIMIZATION_r17.md cites them). Runs at the driver's bench
configuration (SF_DIR=sf0.1, local[32], shuffle=32) so the captured
plans are the ones the bench times.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINE
    from usgs_lidar_spark.plans.queries import QUERIES
    from usgs_lidar_spark.session import get_spark

    names = sys.argv[2:] or HEADLINE
    out_dir = REPO / "plans" / "r17"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("explain-r17")
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            txt = (
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
        except Exception as e:  # surface, keep going
            txt = f"ERROR capturing plan: {e}\n"
        (out_dir / f"{name}_{tag}.txt").write_text(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
