"""Driver-replica: exercises __spark_entry__.py exactly the way the round
driver does — vanilla SparkSession (none of the engine's session confs),
entry() smoke at sf0.001, then every queries() entry vs its oracle_sql()
via DuckDB at sf0.01 with an order-insensitive compare.

Usage: python tools/driver_replica.py [sf_dir] [query_name ...]
(with query names: checks only those — the fast loop while building one)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from parity import canonical_rows  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    # Vanilla session — deliberately NOT usgs_lidar_spark.session.get_spark:
    # proves the contract works on a driver-provided session. REPLICA_CORES /
    # REPLICA_SHUFFLE override parallelism for determinism shake-outs
    # (results must be identical under any partitioning).
    import os

    cores = os.environ.get("REPLICA_CORES", "8")
    shuffle = os.environ.get("REPLICA_SHUFFLE", "8")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.ui.enabled", "false")
        .appName("driver-replica")
    )
    # REPLICA_NO_AQE=1: re-verify the whole surface with adaptive
    # execution OFF — results must be bit-identical either way (AQE
    # re-plans physical partitioning at runtime; round 6's global_rank
    # partition-id bug is the class of failure this sweep exists to
    # catch).
    if os.environ.get("REPLICA_NO_AQE"):
        builder = builder.config("spark.sql.adaptive.enabled", "false")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if not ONLY:
        t0 = time.time()
        res = entrymod.entry(spark)
        rows = res.count()
        print(
            f"[smoke] entry() -> {rows} rows, schema={res.columns} "
            f"({time.time()-t0:.1f}s)"
        )
        assert rows > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if ONLY:
        unknown = ONLY - set(qs)
        assert not unknown, f"unknown queries: {sorted(unknown)}"
        qs = {k: v for k, v in qs.items() if k in ONLY}
    failed = []
    for name in sorted(qs):
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark error {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        ddf = con.execute(oracles[name]).fetchdf()
        s_cols, s_rows = canonical_rows(sdf)
        d_cols, d_rows = canonical_rows(ddf)
        ok = s_cols == d_cols and s_rows == d_rows
        status = "OK" if ok else "FAIL"
        print(
            f"[{status}] {name}: spark {len(s_rows)} rows vs duck {len(d_rows)} rows "
            f"({time.time()-t0:.1f}s)"
        )
        if not ok:
            failed.append(name)
            if s_cols != d_cols:
                print(f"   cols spark={s_cols} duck={d_cols}")
            else:
                for a, b in zip(s_rows, d_rows):
                    if a != b:
                        print(f"   first diff:\n   spark={a}\n   duck ={b}")
                        break
    print(f"\n{len(qs)} queries, {len(oracles)} oracled, {len(failed)} failed")
    if failed:
        print("FAILED:", failed)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
