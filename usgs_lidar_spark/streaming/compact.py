"""Compaction for the idempotent streaming sink's one-dir-per-batch output.

A long-running stream through ``sink.idempotent_parquet_writer`` leaves
``batch_id=N`` directories, each holding one micro-batch's (often tiny)
files — the classic small-file problem: at 100 TB a reader would open
millions of files and the NameNode/listing cost dominates the scan.

``compact_sink`` is the batch job that fixes this WITHOUT stopping the
stream:

  1. read every sealed batch directory (``batch_id <= up_to_batch``;
     batches newer than that may still be replayed by a recovering
     stream, so they are never touched);
  2. rewrite them as one well-sized parquet dataset under
     ``_compacted/v<K>/`` (coalesced to ``target_partitions`` or
     partitioned by a user column — batch_id is preserved as a normal
     column so nothing is lost);
  3. atomically swap a JSON manifest (`_compacted/MANIFEST.json`, tmp
     file + ``os.replace``) recording the active LEVEL SET and the
     highest batch id it covers;
  4. only then delete the superseded batch directories (and, after a
     major compaction, the merged level dirs).

LEVELED, LSM-style (round 16 — same fix as `media_ingest`'s store: the
single-level form rewrote the ENTIRE compacted dataset every run,
O(store) write amplification and quadratic lifetime write volume under
periodic maintenance): the manifest lists MULTIPLE level dirs. A MINOR
compaction (the default) folds only the sealed tail into one NEW small
level — O(tail) bytes written, existing levels untouched. A MAJOR
compaction (``major=True``, or automatic when the level count would
pass ``max_levels``) merges all levels + tail into one dir. The
pre-leveling single-dir manifest format still reads (one-level set).

Crash-safety comes from the ordering: a crash before the manifest swap
leaves an orphan ``v<K>`` directory that readers ignore (the manifest
still points at the old state) and the NEXT compaction overwrites (it
reuses version K = active+1, mode overwrite); a crash after the swap
but before the deletes leaves garbage batch dirs that readers skip
(their ids are <= the manifest's ``max_batch_id``) and retired level
dirs no longer in the live set — `vacuum_sink` removes both, and
deliberately SPARES version dirs NEWER than the active manifest (a
concurrent compaction's in-progress build). Maintenance is
single-maintainer per sink, like the media store.

``read_sink`` is the matching reader: the live level set plus any batch
directories newer than the manifest — a consistent view at every point
of the protocol above.

Driver-side file operations use the local filesystem API; on HDFS/object
stores the same protocol holds with the corresponding rename primitive
(HDFS rename is atomic; object stores need a conditional put), which is
an environment binding, not a design change.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_BATCH_RE = re.compile(r"^batch_id=(\d+)$")
MANIFEST = "MANIFEST.json"


def _batch_dirs(sink_path: str) -> dict[int, Path]:
    root = Path(sink_path)
    out: dict[int, Path] = {}
    if root.is_dir():
        for child in root.iterdir():
            m = _BATCH_RE.match(child.name)
            if m and child.is_dir():
                out[int(m.group(1))] = child
    return out


def _read_manifest(sink_path: str) -> dict | None:
    f = Path(sink_path) / "_compacted" / MANIFEST
    if not f.exists():
        return None
    return json.loads(f.read_text())


def _levels(manifest: dict | None) -> list[dict]:
    """The manifest's live level list, oldest first — each entry
    ``{"dir": "v<K>", "max_batch_id": n}``. Handles both the round-16
    leveled format (``levels``) and the earlier single-dir one
    (``version_dir``), so an existing sink keeps compacting without
    migration."""
    if manifest is None:
        return []
    if "levels" in manifest:
        return [dict(lv) for lv in manifest["levels"]]
    return [
        {
            "dir": manifest["version_dir"],
            "max_batch_id": manifest["max_batch_id"],
        }
    ]


def compact_sink(
    spark: SparkSession,
    sink_path: str,
    up_to_batch: int | None = None,
    target_partitions: int | None = 1,
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    stats_columns: list[str] | None = None,
    major: bool = False,
    max_levels: int = 8,
) -> dict | None:
    """Rewrite sealed ``batch_id`` directories into a compacted dataset
    and atomically publish it via the manifest. Returns the new manifest,
    or None when there is nothing to compact.

    ``up_to_batch``: highest batch id considered sealed (default: all
    present). Leave headroom below the stream's current batch when the
    stream is live — a recovering stream may legitimately rewrite its
    LAST uncommitted batch directory, never older ones.
    ``target_partitions``: repartition width of the compacted write (the
    knob that fixes small files); None keeps the scan's partitioning.
    ``partition_by``: optional hive-partition columns for the compacted
    dataset (e.g. an event-date column) — the layout a 100 TB reader
    actually wants.
    ``cluster_by``: range-partition + sort the compacted write by these
    columns so each output file owns a tight value slice — what makes
    per-file stats selective.
    ``stats_columns``: after the write, build the per-file min/max
    sidecar (sources/stats_manifest) for these columns inside the new
    version dir; `read_sink_with_skipping` then prunes compacted files
    without opening their footers. Pass it at EVERY compaction of a
    skipping-read sink — each level carries its own sidecar.
    ``major`` / ``max_levels``: see the module docstring — minor folds
    only the tail (O(tail) bytes); major merges the live level set.
    """
    if int(max_levels) < 1:
        raise ValueError(f"max_levels must be >= 1, got {max_levels}")
    manifest = _read_manifest(sink_path)
    levels = _levels(manifest)
    already = manifest["max_batch_id"] if manifest else -1
    dirs = _batch_dirs(sink_path)
    todo = {
        b: p
        for b, p in dirs.items()
        if b > already and (up_to_batch is None or b <= up_to_batch)
    }
    major = bool(major) or (len(levels) + 1 > int(max_levels))
    if not todo and not (major and len(levels) > 1):
        return None  # nothing to fold (a 1-level major is already major)
    merged_levels = levels if major else []

    # basePath keeps batch_id as a (partition) column in the scan; it is
    # written back as a NORMAL column so compacted rows keep provenance.
    sources: list[DataFrame] = []
    if todo:
        sources.append(
            spark.read.option("basePath", sink_path)
            .parquet(*[str(p) for p in sorted(todo.values())])
        )
    for lv in merged_levels:
        sources.append(
            spark.read.parquet(
                str(Path(sink_path) / "_compacted" / lv["dir"])
            )
        )
    df = sources[0]
    for s in sources[1:]:
        df = df.unionByName(s)
    if cluster_by:
        n = target_partitions or df.rdd.getNumPartitions()
        df = df.repartitionByRange(n, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    elif target_partitions is not None:
        df = df.repartition(target_partitions)

    version = (manifest["version"] + 1) if manifest else 1
    comp_root = Path(sink_path) / "_compacted"
    comp_root.mkdir(exist_ok=True)
    vdir = f"v{version}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(comp_root / vdir))
    if stats_columns:
        from usgs_lidar_spark.sources.stats_manifest import write_stats_manifest

        write_stats_manifest(spark, str(comp_root / vdir), stats_columns)

    new_max = max(todo) if todo else already
    new_manifest = {
        "version": version,
        "levels": ([] if major else levels)
        + [{"dir": vdir, "max_batch_id": new_max if major else max(todo)}],
        "max_batch_id": new_max,
        "n_source_batches": len(todo)
        + (manifest["n_source_batches"] if manifest else 0),
    }
    tmp = comp_root / f".{MANIFEST}.tmp"
    tmp.write_text(json.dumps(new_manifest, indent=1))
    os.replace(tmp, comp_root / MANIFEST)  # the atomic publish point

    # Post-publish cleanup: superseded batch dirs and (after a major)
    # the merged level dirs.
    for p in todo.values():
        shutil.rmtree(p, ignore_errors=True)
    for lv in merged_levels:
        shutil.rmtree(comp_root / lv["dir"], ignore_errors=True)
    return new_manifest


def read_sink(spark: SparkSession, sink_path: str) -> DataFrame:
    """Consistent view of the sink at any protocol point: the manifest's
    live LEVEL dirs plus batch directories NEWER than its max_batch_id
    (uncompacted tail); plain batch-dir union when no compaction has
    run."""
    manifest = _read_manifest(sink_path)
    covered = manifest["max_batch_id"] if manifest else -1
    tail = [p for b, p in sorted(_batch_dirs(sink_path).items()) if b > covered]
    parts: list[DataFrame] = []
    for lv in _levels(manifest):
        parts.append(
            spark.read.parquet(
                str(Path(sink_path) / "_compacted" / lv["dir"])
            )
        )
    if tail:
        parts.append(
            spark.read.option("basePath", sink_path).parquet(
                *[str(p) for p in tail]
            )
        )
    if not parts:
        raise FileNotFoundError(f"empty sink: {sink_path}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def vacuum_sink(sink_path: str) -> dict:
    """Remove crash orphans the compaction protocol can legitimately
    leave behind: batch directories already covered by the manifest
    (crash after publish, before deletes), RETIRED ``v<J>`` level dirs
    neither in the active level set nor newer than the active version,
    and stale manifest tmp files. Never touches batch dirs newer than
    the manifest (the live tail), version dirs NEWER than the active
    version (a concurrent compaction's in-progress build — deleting one
    mid-build would kill that compaction at publish; a crashed build's
    orphan at active+1 is overwritten by the next compaction instead),
    or anything when no manifest exists (nothing is superseded yet).

    Safe to run at ANY time, concurrent with readers: everything removed
    is, by the manifest's word, unreachable through read_sink. Returns a
    summary of what was removed.
    """
    manifest = _read_manifest(sink_path)
    removed = {"batch_dirs": 0, "version_dirs": 0, "tmp_files": 0}
    comp_root = Path(sink_path) / "_compacted"
    if manifest is None:
        return removed
    live = {lv["dir"] for lv in _levels(manifest)}
    for b, p in _batch_dirs(sink_path).items():
        if b <= manifest["max_batch_id"]:
            shutil.rmtree(p, ignore_errors=True)
            removed["batch_dirs"] += 1
    if comp_root.is_dir():
        for child in comp_root.iterdir():
            if child.is_dir() and child.name not in live:
                tail = child.name[1:] if child.name.startswith("v") else ""
                if tail.isdigit() and int(tail) <= manifest["version"]:
                    shutil.rmtree(child, ignore_errors=True)
                    removed["version_dirs"] += 1
            elif child.is_file() and child.name.startswith(f".{MANIFEST}"):
                child.unlink(missing_ok=True)
                removed["tmp_files"] += 1
    return removed


def read_sink_with_skipping(
    spark: SparkSession,
    sink_path: str,
    ranges: dict[str, tuple[float | None, float | None]],
) -> DataFrame:
    """`read_sink` with manifest-pruned access to the compacted portion:
    compacted files whose per-file stats prove no range intersection are
    never opened; the (small) uncompacted tail is read in full. The
    ranges are re-applied as real predicates either way, so the result
    equals filter(read_sink(...)) exactly — skipping only changes which
    files get touched."""
    from usgs_lidar_spark.sources.stats_manifest import prune_files

    from usgs_lidar_spark.sources.stats_manifest import MANIFEST_DIR

    manifest = _read_manifest(sink_path)
    covered = manifest["max_batch_id"] if manifest else -1
    tail = [p for b, p in sorted(_batch_dirs(sink_path).items()) if b > covered]
    parts: list[DataFrame] = []
    for lv in _levels(manifest):
        vdir = str(Path(sink_path) / "_compacted" / lv["dir"])
        if not (Path(vdir) / MANIFEST_DIR).exists():
            # a level compacted without stats_columns has no sidecar:
            # read it whole (conservative — the predicates below still
            # apply, only file skipping is lost for this level)
            parts.append(spark.read.parquet(vdir))
            continue
        keep = prune_files(spark, vdir, ranges)
        if keep:
            # basePath: compact_sink allows partition_by + stats_columns
            # together, so the pruned file list can live under hive dirs;
            # without the anchor those partition columns would be dropped
            # and unionByName(allowMissingColumns) would null them.
            parts.append(spark.read.option("basePath", vdir).parquet(*keep))
        else:
            # everything pruned: keep the schema contribution (and the
            # not-empty contract) with a zero-row scan of the version dir
            parts.append(spark.read.parquet(vdir).limit(0))
    if tail:
        parts.append(
            spark.read.option("basePath", sink_path).parquet(
                *[str(p) for p in tail]
            )
        )
    if not parts:
        raise FileNotFoundError(f"empty sink: {sink_path}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    from pyspark.sql import functions as F

    for col, (lo, hi) in ranges.items():
        if lo is not None:
            out = out.filter(F.col(col) >= lo)
        if hi is not None:
            out = out.filter(F.col(col) <= hi)
    return out
