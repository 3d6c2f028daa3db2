"""Machine-readable full-registry verification sweep -> REPLICA_r{N}.json.

The round driver's hard signal (CORRECTNESS_r{N}.json) caps at 50 queries
per round, so with 220+ registered queries ~78% of the surface per round
was verified only by builder-side sweeps described in COVERAGE.md prose.
This tool converts that prose into a committed, auditable artifact: one
row per (query, scenario) for the SAME four scenarios the per-addition
workflow runs —

    driver   : local[8],  shuffle=8,  AQE on,  sf0.01  (driver layout)
    odd      : local[5],  shuffle=3,  AQE on,  sf0.01  (partitioning shake-out)
    no_aqe   : local[8],  shuffle=8,  AQE OFF, sf0.01  (catches plan bombs
               AQE masks and partition-dependent bugs — the round-8 lesson)
    sf0.1    : local[8],  shuffle=8,  AQE on,  sf0.1   (10x scale)

Each scenario shells out to tools/driver_replica.py (the authoritative
oracle comparator — no second compare implementation to drift) and parses
its per-query verdict lines. Status values:

    ok        — full row-count + schema + value parity vs the DuckDB oracle
    golden    — no ANSI-SQL oracle by design; values pinned exactly by
                tests/test_goldens.py (GOLDENS.json audit trail)
    fail      — any mismatch or error (the sweep exits non-zero)

Usage:
    python tools/replica_sweep.py                 # full registry, 4 scenarios
    python tools/replica_sweep.py --update A B    # re-run only queries A, B
                                                  # and merge into the artifact

--update keeps the artifact in lockstep with the registry at every
query-registering commit without a 70-minute full regeneration: the
per-addition workflow already runs exactly these four sweeps for each new
query, so recording them is free. tests/test_entry_contract.py enforces
that the artifact's name set equals the live registry (the same
drift-guard pattern as the COVERAGE.md totals test).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

SCENARIOS = [
    # (key, env overrides, sf_dir)
    ("driver", {}, "/root/testdata/sf0.01"),
    (
        "odd",
        {"REPLICA_CORES": "5", "REPLICA_SHUFFLE": "3"},
        "/root/testdata/sf0.01",
    ),
    ("no_aqe", {"REPLICA_NO_AQE": "1"}, "/root/testdata/sf0.01"),
    ("sf0.1", {}, "/root/testdata/sf0.1"),
]

_LINE = re.compile(r"^\[(OK|FAIL|rows-only)\] (\S+):")


def current_round() -> int:
    """Round N = 1 + the latest committed CORRECTNESS_r{N}.json."""
    rounds = [
        int(m.group(1))
        for f in REPO.glob("CORRECTNESS_r*.json")
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", f.name))
    ]
    return max(rounds, default=0) + 1


def registry_names() -> tuple[list[str], set[str]]:
    """(all registered query names, names WITHOUT a SQL oracle)."""
    sys.path.insert(0, str(REPO))
    from usgs_lidar_spark.plans.queries import ORACLE, QUERIES

    return list(QUERIES), set(QUERIES) - set(ORACLE)


def registry_fingerprints() -> dict[str, str]:
    """Per-query content fingerprint: sha256 over the query function's
    SOURCE plus its oracle SQL (ADVICE r9: keying --update merges by
    name alone let a semantics change ride on stale pass rows with
    nothing forcing a re-sweep). A row whose fingerprint no longer
    matches the live registry is flagged stale by
    tests/test_entry_contract.py — changing a query's body or oracle
    without re-sweeping it now fails the suite."""
    import hashlib
    import inspect

    sys.path.insert(0, str(REPO))
    from usgs_lidar_spark.plans.queries import ORACLE, QUERIES

    out = {}
    for name, fn in QUERIES.items():
        blob = inspect.getsource(fn) + "\n---\n" + ORACLE.get(name, "")
        out[name] = hashlib.sha256(blob.encode()).hexdigest()[:16]
    return out


def run_scenario(key: str, env_over: dict, sf_dir: str, only: list[str]) -> dict:
    """One driver_replica subprocess; returns {name: 'ok'|'fail'|'rows-only'}."""
    env = dict(os.environ)
    env.update(env_over)
    cmd = [sys.executable, str(REPO / "tools" / "driver_replica.py"), sf_dir]
    cmd += only
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd=str(REPO), env=env,
        timeout=7200,
    )
    out: dict[str, str] = {}
    for line in proc.stdout.splitlines():
        m = _LINE.match(line.strip())
        if m:
            out[m.group(2)] = m.group(1).lower()
    if proc.returncode != 0 and "fail" not in set(out.values()):
        # Process-level failure without per-query verdicts (crash, OOM):
        # surface it loudly rather than writing a silently-short artifact.
        sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-4000:])
        raise RuntimeError(f"scenario {key}: replica exited {proc.returncode}")
    return out


def main() -> int:
    args = sys.argv[1:]
    update_only: list[str] = []
    if args and args[0] == "--update":
        update_only = args[1:]
        if not update_only:
            raise SystemExit("--update requires query names")

    names, no_oracle = registry_names()
    if update_only:
        unknown = set(update_only) - set(names)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")

    rnd = current_round()
    fps = registry_fingerprints()
    artifact = REPO / f"REPLICA_r{rnd}.json"
    rows: dict[tuple[str, str], dict] = {}
    if update_only:
        # Merge into the LATEST committed sweep (which may be a prior
        # round's: rows carry over until a query is re-swept, so the
        # artifact stays registry-complete across round boundaries).
        # Carried rows KEEP their recorded fingerprint — re-stamping
        # them from the live registry would hide exactly the staleness
        # the fingerprint exists to flag. Rows for queries no longer in
        # the registry are dropped (retirements). Legacy rows with no
        # fp field (pre-fingerprint artifacts) backfill from the live
        # registry — faithful only at the migration point, where every
        # query changed since that sweep is itself in the --update set.
        priors = sorted(
            REPO.glob("REPLICA_r*.json"),
            key=lambda f: int(re.search(r"r(\d+)", f.name).group(1)),
        )
        if priors:
            for r in json.loads(priors[-1].read_text())["rows"]:
                if r["name"] not in names:
                    continue
                r.setdefault("fp", fps[r["name"]])
                rows[(r["name"], r["scenario"])] = r

    targets = update_only or names
    for key, env_over, sf_dir in SCENARIOS:
        print(f"=== scenario {key} ({len(targets)} queries) ===", flush=True)
        got = run_scenario(key, env_over, sf_dir, update_only)
        missing = set(targets) - set(got)
        if missing:
            raise RuntimeError(
                f"scenario {key}: no verdict line for {sorted(missing)[:5]}..."
            )
        for name in targets:
            status = got[name]
            if status == "rows-only":
                status = "golden" if name in no_oracle else "fail"
            rows[(name, key)] = {
                "name": name,
                "scenario": key,
                "layout": "odd" if key == "odd" else "driver",
                "no_aqe": key == "no_aqe",
                "sf": "sf0.1" if key == "sf0.1" else "sf0.01",
                "status": status,
                "fp": fps[name],
            }
        print(
            f"    {sum(1 for n in targets if got[n] == 'ok')} ok / "
            f"{len(targets)}",
            flush=True,
        )

    n_fail = sum(1 for r in rows.values() if r["status"] == "fail")
    out = {
        "round": rnd,
        "generated_by": "tools/replica_sweep.py",
        "scenarios": [k for k, _e, _s in SCENARIOS],
        "n_queries": len({k[0] for k in rows}),
        "n_rows": len(rows),
        "n_fail": n_fail,
        "rows": [rows[k] for k in sorted(rows)],
    }
    artifact.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {artifact.name}: {out['n_queries']} queries x "
          f"{len(SCENARIOS)} scenarios, {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
