"""Streaming materialized view: a grouped rollup kept fresh by merging
each micro-batch's partial aggregate into a versioned stored state —
operators/rollup.py's algebra driven by foreachBatch.

Why not a plain streaming aggregation? `groupBy().agg()` on a stream
keeps its state in the state store and, in complete/update modes,
re-emits the whole (or changed) result per batch — fine for windowed
event-time aggs with watermark eviction, wrong for an UNWINDOWED
all-time rollup whose key space grows forever: that state can never be
evicted and lives inside the streaming query. This sink keeps the state
OUT of the stream as plain parquet anyone can read, merge cost
O(batch + rollup) per micro-batch.

Exactly-once: foreachBatch is at-least-once, so the publish is keyed by
batch id — version directory ``v<batchId>`` plus an atomic manifest
swap (tmp + os.replace, same protocol as streaming/compact.py). A
replayed batch rewrites ITS OWN version dir from the SAME previous
version (the manifest only ever points at a batch id < the replayed
one... a replay of batch N finds the manifest at N and rebuilds v<N>
from v<M>, M < N, byte-identically) and re-swaps the manifest — no
double counting, proven by the crash-restart test.

Scale: the merge is the rollup algebra's union+reduce (group-cardinality
sized state); the stream's own state store holds nothing but source
offsets. Driver-side file ops are manifest-sized.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from usgs_lidar_spark.operators.rollup import merge_rollup, rollup_state

MANIFEST = "MANIFEST.json"


def _read_manifest(path: str) -> dict | None:
    p = Path(path) / MANIFEST
    if not p.is_file():
        return None
    return json.loads(p.read_text())


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """The current materialized rollup (manifest-pointed version)."""
    m = _read_manifest(path)
    if m is None:
        raise FileNotFoundError(f"no rollup published under {path}")
    return spark.read.parquet(str(Path(path) / m["version_dir"]))


def rollup_writer(
    path: str,
    keys: list[str],
    measures: list[tuple[str, str]],
    digits: int = 2,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch callback maintaining the versioned rollup."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        batch_state = rollup_state(df, keys, measures, digits)
        m = _read_manifest(path)
        # A replay of batch N must merge against the same base it used
        # the first time: any version with id < N qualifies (the manifest
        # can only point at N itself after a crash-after-publish, in
        # which case its PREVIOUS pointer is recorded in the manifest).
        if m is not None and m["batch_id"] >= batch_id:
            base_dir = m.get("prev_version_dir")
        else:
            base_dir = m["version_dir"] if m else None
        if base_dir:
            stored = spark.read.parquet(str(Path(path) / base_dir))
            merged = merge_rollup(stored, batch_state, keys, measures)
        else:
            merged = batch_state
        root = Path(path)
        root.mkdir(parents=True, exist_ok=True)
        vdir = f"v{batch_id}"
        merged.write.mode("overwrite").parquet(str(root / vdir))
        new_m = {
            "batch_id": batch_id,
            "version_dir": vdir,
            "prev_version_dir": base_dir,
        }
        tmp = root / f".{MANIFEST}.tmp"
        tmp.write_text(json.dumps(new_m))
        os.replace(tmp, root / MANIFEST)
        # Post-publish cleanup: keep the active version and its base (the
        # base is what a replay of THIS batch would rebuild from); every
        # older version is unreachable by both readers and replays.
        import shutil

        keep = {vdir, base_dir}
        for child in root.iterdir():
            if child.is_dir() and child.name.startswith("v") and child.name not in keep:
                shutil.rmtree(child, ignore_errors=True)

    return write_batch


def run_streaming_rollup(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    keys: list[str],
    measures: list[tuple[str, str]],
    digits: int = 2,
) -> None:
    """Drain available input (availableNow), maintaining the rollup
    exactly-once across restarts/replays."""
    q = (
        stream_df.writeStream.foreachBatch(
            rollup_writer(path, keys, measures, digits)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
