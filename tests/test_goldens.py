"""Hard checks for the engine-kernel queries with no SQL oracle.

``sketch_approx_stats`` / ``sketch_hll_mergeable`` are defined over
Spark's HLL++ / percentile_approx / Datasketches kernels — DuckDB cannot
reproduce them, so the driver records only a rows-only check. These
tests close that gap with committed golden outputs at sf0.01
(regenerate via ``python tools/make_goldens.py``): the sketch estimates
were verified stable across 2/8/32-way parallelism (HLL merge is
commutative; the percentile summaries proved partition-order-stable on
this input) before pinning.

A semantic regression in either now fails pytest exactly, instead of
sailing through the driver's row count. (The xxhash64 SimHash goldens
were retired in round 10 — the portable-hash twins carry the SimHash
tier under hard DuckDB oracles.)
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from tools.make_goldens import GOLDEN_QUERIES, SF_DIR, canonical_rows
from usgs_lidar_spark.plans import queries as q

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_no_oracle_query_matches_committed_golden(spark, name):
    golden = json.loads((FIXTURES / f"golden_{name}.json").read_text())
    df = q.QUERIES[name](spark, SF_DIR)
    assert df.columns == golden["columns"]
    assert [list(dt) for dt in df.dtypes] == golden["dtypes"]
    got = canonical_rows(df)
    assert len(got) == len(golden["rows"])
    for i, (g, w) in enumerate(zip(got, golden["rows"])):
        assert g == w, f"{name} row {i}: got {g}, golden {w}"


def test_every_registry_query_has_oracle_or_golden():
    """Registry-wide invariant: every queries() entry carries EITHER a
    DuckDB oracle (driver hash-match) OR a committed golden (exact pin
    here). No query is rows-only."""
    goldens = {
        f.stem.removeprefix("golden_") for f in FIXTURES.glob("golden_*.json")
    }
    unchecked = [
        n for n in q.QUERIES if n not in q.ORACLE and n not in goldens
    ]
    assert not unchecked, f"queries with neither oracle nor golden: {unchecked}"


def test_hll_mergeable_tiers_accuracy(spark):
    """The merged-tier HLL estimates stay within 5% of exact distinct
    counts at sf0.01, and every leaf estimate is positive — the sketch
    is wired to the right column, not just deterministic."""
    df = q.QUERIES["sketch_hll_mergeable"](spark, SF_DIR)
    rows = df.collect()
    leafs = [r for r in rows if r["status"] != "ALL"]
    assert leafs and all(r["approx_nd"] > 0 for r in leafs)
    for r in leafs:
        assert abs(r["approx_nd"] - r["exact_nd"]) <= max(
            2, 0.05 * r["exact_nd"]
        ), r


def test_goldens_audit_artifact_current():
    """GOLDENS.json (the per-round audit artifact tools/golden_audit.py
    writes) must reference the CURRENT committed fixtures and report
    every golden as passing — a stale or red artifact fails the suite."""
    import hashlib

    audit = json.loads((FIXTURES.parent.parent / "GOLDENS.json").read_text())
    assert set(audit["results"]) == set(GOLDEN_QUERIES)
    for name, rec in audit["results"].items():
        raw = (FIXTURES / f"golden_{name}.json").read_bytes()
        assert rec["fixture_sha256"] == hashlib.sha256(raw).hexdigest()[:16], (
            f"{name}: GOLDENS.json is stale — rerun tools/golden_audit.py"
        )
        assert rec["pass"] is True
