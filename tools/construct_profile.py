"""Split each headline query's bench wall into CONSTRUCTION vs EXECUTION.

bench.py times `QUERIES[name](spark, SF_DIR)` + force per run, so the
per-run wall = plan construction (python expression building, py4j round
trips, any eager pins/collects the operator pays at build time) +
execution (the forced action). This tool attributes the two so that
optimization effort lands where the time actually goes (guide §1.1):
a query whose wall is 80% construction needs fewer/larger py4j calls or
fewer eager build-time jobs, not a better physical plan.

Usage: python tools/construct_profile.py [rounds] [query ...]
Writes a table to stdout sorted by steady-state construction time.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from bench import HEADLINE, SF_DIR, _force  # noqa: E402
from usgs_lidar_spark.plans.queries import QUERIES  # noqa: E402
from usgs_lidar_spark.session import get_spark  # noqa: E402


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    names = sys.argv[2:] or list(HEADLINE)

    spark = get_spark(app_name="construct-profile")
    # Warmup exactly like bench.py: compile plan shapes, fill operator
    # caches, so the timed rounds see the steady state the bench medians
    # measure.
    for name in names:
        _force(QUERIES[name](spark, SF_DIR), name)

    cons: dict[str, list[float]] = {n: [] for n in names}
    execu: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(rounds):
        for name in names:
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF_DIR)
            t1 = time.perf_counter()
            _force(df, name)
            t2 = time.perf_counter()
            cons[name].append(t1 - t0)
            execu[name].append(t2 - t1)

    rows = []
    for name in names:
        c = min(cons[name])
        e = min(execu[name])
        rows.append((c, e, name))
    rows.sort(reverse=True)
    print(f"{'query':42s} {'construct':>9s} {'execute':>9s} {'c_frac':>6s}")
    tot_c = tot_e = 0.0
    for c, e, name in rows:
        tot_c += c
        tot_e += e
        print(f"{name:42s} {c:9.3f} {e:9.3f} {c / max(c + e, 1e-9):6.0%}")
    print(f"{'TOTAL (min-of-rounds)':42s} {tot_c:9.3f} {tot_e:9.3f} "
          f"{tot_c / max(tot_c + tot_e, 1e-9):6.0%}")
    spark.stop()


if __name__ == "__main__":
    main()
