"""Time a single registered query in isolation (guide §1.4): warmup run,
then N timed runs with bench-parity forcing (count / HASH_FORCED agg) and
N with the noop sink (computes every output column, no sink cost).

    python tools/qtime.py sim_knn_label_gate [n_runs] [sf_dir]

Prints per-run walls; use it to attribute a query's bench seconds before
and after a change without paying a full bench sweep.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from bench import _force
    from usgs_lidar_spark.plans.queries import QUERIES
    from usgs_lidar_spark.session import get_spark

    spark = get_spark("qtime")
    spark.sparkContext.setJobDescription(f"qtime:{name}")
    t0 = time.perf_counter()
    _force(QUERIES[name](spark, sf_dir), name)
    print(f"warmup: {time.perf_counter() - t0:.3f}s")
    for tag, force in (
        ("bench", lambda df: _force(df, name)),
        (
            "noop",
            lambda df: df.write.format("noop").mode("overwrite").save(),
        ),
    ):
        for i in range(n_runs):
            t0 = time.perf_counter()
            force(QUERIES[name](spark, sf_dir))
            print(f"{tag} run {i}: {time.perf_counter() - t0:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
