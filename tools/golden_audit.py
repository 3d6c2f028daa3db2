"""Per-round audit artifact for the golden-pinned queries (VERDICT r5
item 8): the engine-kernel queries with no SQL oracle (HLL /
percentile / Datasketches sketches; 2 since the round-10 SimHash
retirement) are exactly pinned by
pytest against committed fixtures, but the driver's CORRECTNESS rows
record them as rows-only — so their per-round pass/fail had no audit
trail outside a full pytest log. This tool re-runs each golden query at
sf0.01, compares it to its committed fixture the same way
tests/test_goldens.py does, and writes GOLDENS.json at the repo root:

    {"round": N, "results": {name: {"fixture_sha256": ..., "rows": n,
                                    "pass": true}}}

``round`` is inferred as max(CORRECTNESS_r*.json) + 1 — the round whose
verify this run accompanies. Run once per round alongside bench:

    python tools/golden_audit.py
"""

from __future__ import annotations

import hashlib
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from tools.make_goldens import GOLDEN_QUERIES, SF_DIR, canonical_rows  # noqa: E402

FIXTURES = REPO / "tests" / "fixtures"


def current_round() -> int:
    rounds = [
        int(m.group(1))
        for f in REPO.glob("CORRECTNESS_r*.json")
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", f.name))
    ]
    return (max(rounds) + 1) if rounds else 1


def main() -> int:
    from usgs_lidar_spark.plans import queries as q
    from usgs_lidar_spark.session import get_spark

    spark = get_spark(app_name="golden-audit")
    results: dict[str, dict] = {}
    failed = False
    for name in GOLDEN_QUERIES:
        fixture = FIXTURES / f"golden_{name}.json"
        raw = fixture.read_bytes()
        golden = json.loads(raw)
        df = q.QUERIES[name](spark, SF_DIR)
        ok = (
            df.columns == golden["columns"]
            and [list(dt) for dt in df.dtypes] == golden["dtypes"]
            and canonical_rows(df) == [list(r) for r in golden["rows"]]
        )
        failed |= not ok
        results[name] = {
            "fixture_sha256": hashlib.sha256(raw).hexdigest()[:16],
            "rows": len(golden["rows"]),
            "pass": ok,
        }
        print(f"[{'OK' if ok else 'FAIL'}] {name}", file=sys.stderr)
    spark.stop()
    out = {"round": current_round(), "sf_dir": SF_DIR, "results": results}
    (REPO / "GOLDENS.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
