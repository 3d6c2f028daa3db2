"""Incremental-vs-full passage-dedup A/B at the 10x point (SCALE.md):
what an INGEST actually pays. Full = chunk_dedup_docs over the whole
10x corpus. Incremental = the last 10% of doc ids arriving as a batch,
deduped against a PERSISTED digest store built (untimed, own session)
from the first 90% — the steady-state cost of the streaming ingest
path, which reads 64-hex digests instead of re-chunking history.

Usage: python tools/scale_round8d.py   # one JSON line per scenario
"""

from __future__ import annotations

import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from tools.scale_round8 import timed  # noqa: E402
from tools.sf1_bench import SF1, WORK, build_sf1  # noqa: E402

STORE = WORK / "chunk_digest_store"


def hash_force(df) -> int:
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007))).alias("h"),
    ).collect()[0]
    return int(row["n"])


def main() -> None:
    build_sf1()
    docs_path = str(SF1 / "documents.parquet")

    # Untimed store build over the first 90% of ids, own session.
    from tools.scale_experiment import make_session

    shutil.rmtree(STORE, ignore_errors=True)
    spark = make_session("store-build", WORK / "log_r8d_store")
    docs = spark.read.parquet(docs_path)
    cut = int(docs.count() * 0.9)
    from usgs_lidar_spark.operators.dedup import chunk_digests

    chunk_digests(
        docs.filter(f"doc_id < {cut}"), chunk_tokens=4
    ).write.mode("overwrite").parquet(str(STORE))
    spark.stop()

    def full(spark) -> int:
        from usgs_lidar_spark.operators.dedup import chunk_dedup_docs

        return hash_force(
            chunk_dedup_docs(spark.read.parquet(docs_path), chunk_tokens=4)
        )

    def incremental(spark) -> int:
        from usgs_lidar_spark.operators.dedup import chunk_dedup_incremental

        d = spark.read.parquet(docs_path)
        batch = d.filter(f"doc_id >= {cut}")
        seen = spark.read.parquet(str(STORE))
        return hash_force(
            chunk_dedup_incremental(batch, seen, chunk_tokens=4)
        )

    for name, fn in (("full_10x", full), ("incremental_10pct_batch", incremental)):
        timed(f"chunkdedup_{name}", "warm0", fn)  # JIT warm, discarded
        print(json.dumps(timed(f"chunkdedup_{name}", "t", fn)), flush=True)


if __name__ == "__main__":
    main()
