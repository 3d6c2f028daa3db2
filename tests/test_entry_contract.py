"""Driver-contract shim tests: verification rotation order.

The rotation in __spark_entry__ is verification-process policy (see its
docstring); these tests pin (a) that it still parses the committed
CORRECTNESS_r*.json artifact format — a silent format change would
degrade the rotation to registration order and starve old queries of
re-verification — and (b) the sentinel/rotation invariants.
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry
from usgs_lidar_spark.plans import queries as q

REPO = Path(entry.__file__).resolve().parent


def test_correctness_artifact_format_still_parses():
    """Each committed CORRECTNESS_r*.json must be a {query_name: record}
    dict whose names overlap the registry — the shape the rotation's
    last-round scan depends on."""
    files = sorted(REPO.glob("CORRECTNESS_r*.json"))
    assert files, "no committed CORRECTNESS artifacts found"
    registry = set(q.QUERIES)
    seen_any = False
    for f in files:
        recorded = json.loads(f.read_text())
        assert isinstance(recorded, dict) and recorded, f.name
        overlap = registry & set(recorded)
        assert overlap, (
            f"{f.name}: no recorded name matches the registry — artifact "
            "format or naming changed; fix _verification_rotation_order"
        )
        seen_any = True
        for name, rec in recorded.items():
            assert isinstance(rec, dict), (f.name, name)
    assert seen_any


def test_rotation_sentinels_pinned_first():
    names = list(q.QUERIES)
    order = entry._verification_rotation_order(names)
    present = [s for s in entry._SENTINELS if s in names]
    assert present == list(entry._SENTINELS), "sentinel missing from registry"
    assert order[: len(present)] == present
    assert sorted(order) == sorted(names)  # permutation, nothing dropped


def test_rotation_prefers_least_recently_verified():
    """Non-sentinel never-verified names sort before multi-round-green
    ones; ties keep registration order. Only a GOOD row (full match or
    the designed no_oracle outcome) counts as verified — a query whose
    latest driver appearance FAILED keeps its previous green round and
    so re-queues near the front (r8 fix: graph_pagerank_parts' red r6
    row had pushed it out of the next window)."""
    names = list(q.QUERIES)
    order = entry._verification_rotation_order(names)
    last_round: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(f.stem.split("_r")[1])
        for name, row in json.loads(f.read_text()).items():
            good = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ) or row.get("err") == "no_oracle"
            if good:
                last_round[name] = max(rnd, last_round.get(name, 0))
    tail = order[len(entry._SENTINELS) :]
    keys = [last_round.get(n, -1) for n in tail]
    assert keys == sorted(keys), "rotation tail not least-recently-verified"


def test_rotation_requeues_failed_query(tmp_path):
    """A red row must NOT count as verification: the failed query
    re-queues with never-verified priority, while a no_oracle row (the
    golden-pinned queries' designed outcome) still counts as verified."""
    good = {"rows_match": True, "schema_match": True, "hash_match": True,
            "err": None}
    red = dict(good, hash_match=False)
    golden = dict(good, hash_match=False, err="no_oracle")
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q_red": good, "q_green": good, "q_golden": golden})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q_red": red})
    )
    names = [*entry._SENTINELS, "q_green", "q_red", "q_golden", "q_new"]
    orig = entry._REPO
    entry._ROTATION_CACHE.clear()
    entry._REPO = str(tmp_path)
    try:
        order = entry._verification_rotation_order(names)
    finally:
        entry._REPO = orig
        entry._ROTATION_CACHE.clear()
    tail = order[len(entry._SENTINELS):]
    # q_new never verified (-1) first by registration... but q_red's
    # last GOOD round is r1, same as green/golden; q_red must not be
    # ranked as if verified in r2.
    assert tail == ["q_new", "q_green", "q_red", "q_golden"]


def test_rotation_without_artifacts_degrades_to_registration_order(tmp_path):
    """Fresh-checkout behavior: sentinels first, then registration order."""
    names = ["zz_custom", *entry._SENTINELS[:2], "aa_custom"]
    orig = entry._REPO
    entry._ROTATION_CACHE.clear()
    entry._REPO = str(tmp_path)  # no CORRECTNESS files here
    try:
        order = entry._verification_rotation_order(names)
    finally:
        entry._REPO = orig
        entry._ROTATION_CACHE.clear()
    assert order == [*entry._SENTINELS[:2], "zz_custom", "aa_custom"]


def test_replica_sweep_artifact_matches_registry():
    """The latest committed REPLICA_r{N}.json (the machine-readable
    four-scenario full-registry sweep, tools/replica_sweep.py) must stay
    in lockstep with the live registry: same name set, all four
    scenarios per name, zero failures, and 'golden' status only for the
    queries that genuinely have no SQL oracle. Registering a query
    without sweeping it (``replica_sweep.py --update <name>``) fails
    here — the same drift-guard discipline as the COVERAGE totals test,
    extended to the artifact that covers the ~78% of the registry
    outside each round's 50-row driver window."""
    files = sorted(
        REPO.glob("REPLICA_r*.json"),
        key=lambda f: int(f.stem.split("_r")[1]),
    )
    assert files, (
        "no committed REPLICA_r*.json — run tools/replica_sweep.py"
    )
    art = json.loads(files[-1].read_text())
    rows = art["rows"]
    by_name: dict[str, set[str]] = {}
    for r in rows:
        by_name.setdefault(r["name"], set()).add(r["scenario"])
    assert set(by_name) == set(q.QUERIES), (
        f"artifact/registry drift: only-in-artifact="
        f"{sorted(set(by_name) - set(q.QUERIES))[:5]} only-in-registry="
        f"{sorted(set(q.QUERIES) - set(by_name))[:5]} — re-run "
        "tools/replica_sweep.py (or --update the new names)"
    )
    want_scen = {"driver", "odd", "no_aqe", "sf0.1"}
    short = {n: s for n, s in by_name.items() if s != want_scen}
    assert not short, f"incomplete scenario coverage: {dict(list(short.items())[:3])}"
    bad = [r for r in rows if r["status"] == "fail"]
    assert not bad, f"failed sweep rows committed: {bad[:5]}"
    golden_names = {r["name"] for r in rows if r["status"] == "golden"}
    assert golden_names == set(q.QUERIES) - set(q.ORACLE), (
        "golden-status rows must be exactly the no-SQL-oracle queries"
    )
    assert art["n_fail"] == 0
    # Content fingerprints (ADVICE r9): a row swept against an OLDER
    # version of a query (its function source or oracle SQL has since
    # changed) is stale evidence — the name-set check alone would let a
    # semantics change ride on old pass rows forever.
    from tools.replica_sweep import registry_fingerprints

    fps = registry_fingerprints()
    stale = sorted(
        {r["name"] for r in rows if r.get("fp") != fps[r["name"]]}
    )
    assert not stale, (
        f"artifact rows swept against outdated query definitions: "
        f"{stale[:5]} — re-run tools/replica_sweep.py --update on them"
    )


def test_coverage_md_totals_match_registry():
    """COVERAGE.md's header totals sentence is the document's single
    source of truth; it must track the live registry (VERDICT r5 wrong
    #4: a stale totals paragraph undermines the whole inventory)."""
    import re

    text = (REPO / "COVERAGE.md").read_text()
    m = re.search(
        r"Totals: (\d+) registered queries — (\d+) DuckDB-oracled \+ "
        r"(\d+) golden-pinned",
        text,
    )
    assert m, "COVERAGE.md totals sentence missing or reformatted"
    registered, oracled, golden = (int(g) for g in m.groups())
    assert registered == len(q.QUERIES)
    assert oracled == len(q.ORACLE)
    assert golden == len(q.QUERIES) - len(q.ORACLE)
    # The sweep-arithmetic sentence drifted unguarded two rounds
    # running (227 vs 230 in r10, 230x4=920 vs 235x4=940 in r11)
    # because only the Totals: sentence above was parsed. Guard it
    # against the latest committed sweep artifact's own counters.
    import json
    import re as _re

    sweep = _re.search(
        r"(\d+)\s+queries x \{driver, odd-layout, NO_AQE, sf0\.1\} = "
        r"(\d+)\s*\n?rows",
        text,
    )
    assert sweep, "COVERAGE.md sweep-arithmetic sentence missing"
    latest = max(
        REPO.glob("REPLICA_r*.json"),
        key=lambda f: int(_re.search(r"r(\d+)", f.name).group(1)),
    )
    art = json.loads(latest.read_text())
    assert int(sweep.group(1)) == art["n_queries"], (
        f"COVERAGE.md sweep sentence says {sweep.group(1)} queries but "
        f"{latest.name} records {art['n_queries']}"
    )
    assert int(sweep.group(2)) == art["n_rows"], (
        f"COVERAGE.md sweep sentence says {sweep.group(2)} rows but "
        f"{latest.name} records {art['n_rows']}"
    )
