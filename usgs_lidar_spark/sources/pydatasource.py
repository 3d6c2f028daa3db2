"""Spark 4 Python DataSource: the region catalog as a first-class
`spark.read.format("lidar_catalog")` source.

The reference materializes its region catalog by a driver-side loop of
HTTP fetches appended row-at-a-time (scripts/usgs_lidar.py:263-271);
sources/crawl.py already distributes that fetch. This module goes one
step further and makes the catalog a REAL data source in the Spark 4
Python DataSource API (pyspark.sql.datasource, 4.0+; filter pushdown
4.1+):

  * `partitions()` shards the catalog's per-region JSON files into
    input partitions, so the scan parallelizes like any file source;
  * `pushFilters()` accepts EqualTo/In filters on `region` and prunes
    WHOLE FILES before anything is read (region == filename — the same
    partition-pruning contract hive layouts get from directory keys);
    every other filter is returned to Spark for post-scan evaluation;
  * `read()` parses its partition's files and yields typed rows.

The on-disk layout stands in for the remote catalog service: one JSON
object per `<region>.json` file (tests write fixtures; a production
binding would fetch from the catalog endpoint inside `read()` with the
same partitioning — the crawl module's connection-reuse guidance
applies unchanged).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

CATALOG_SCHEMA = (
    "region string, year int, n_points bigint, "
    "minx double, miny double, maxx double, maxy double"
)

_FIELDS = ["region", "year", "n_points", "minx", "miny", "maxx", "maxy"]


@dataclass
class _Shard(InputPartition):
    files: tuple[str, ...]


class CatalogReader(DataSourceReader):
    def __init__(self, options) -> None:
        self._path = options["path"]
        self._n_partitions = int(options.get("numPartitions", "4"))
        self._regions: set[str] | None = None  # None = no pushdown

    # -- filter pushdown (Spark 4.1): region equality/membership prunes
    #    whole files by name; everything else stays with Spark. Multiple
    #    pushed region predicates (e.g. region IN ('a','b') AND region IN
    #    ('b','c'), or EqualTo AND In) are ANDed, so the consumed sets must
    #    INTERSECT — overwriting would report both consumed while honoring
    #    only the last, returning rows that violate the first.
    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("region",):
                self._narrow({str(f.value)})
            elif isinstance(f, In) and f.attribute == ("region",):
                self._narrow({str(v) for v in f.value})
            else:
                yield f

    def _narrow(self, regions: set[str]) -> None:
        self._regions = (
            regions if self._regions is None else self._regions & regions
        )

    def _files(self) -> list[str]:
        out = []
        for name in sorted(os.listdir(self._path)):
            if not name.endswith(".json"):
                continue
            region = name[: -len(".json")]
            if self._regions is not None and region not in self._regions:
                continue
            out.append(os.path.join(self._path, name))
        return out

    def partitions(self):
        files = self._files()
        n = max(1, min(self._n_partitions, len(files)))
        chunks = [tuple(files[i::n]) for i in range(n)]
        return [_Shard(c) for c in chunks if c]

    def read(self, partition: _Shard) -> Iterator[tuple]:
        for fname in partition.files:
            with open(fname, "r", encoding="utf-8") as fh:
                doc = json.load(fh)
            yield tuple(doc.get(k) for k in _FIELDS)


class LidarCatalogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lidar_catalog"

    def schema(self) -> str:
        return CATALOG_SCHEMA

    def reader(self, schema) -> CatalogReader:
        return CatalogReader(self.options)

    def simpleStreamReader(self, schema) -> "CatalogStreamReader":
        return CatalogStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "CatalogWriter":
        return CatalogWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "CatalogStreamWriter":
        return CatalogStreamWriter(self.options)


def register(spark) -> None:
    """Register the format with a session: idempotent, call any time."""
    spark.dataSource.register(LidarCatalogDataSource)


class CatalogStreamReader(SimpleDataSourceStreamReader):
    """Streaming tail of the catalog directory: the offset is the sorted
    list position of the last file already served, so newly-dropped
    region shards arrive in the next micro-batch and a checkpoint
    restart replays deterministically (`readBetweenOffsets` re-reads the
    exact slice). Designed for the catalog's scale — thousands of
    regions, one small JSON each — where a per-file offset list in the
    checkpoint is perfectly fine."""

    def __init__(self, options) -> None:
        self._path = options["path"]

    def _files(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self._path) if f.endswith(".json")
        )

    def initialOffset(self) -> dict:
        return {"served": []}

    def _rows(self, names: list[str]) -> Iterator[tuple]:
        for name in names:
            with open(os.path.join(self._path, name), encoding="utf-8") as fh:
                doc = json.load(fh)
            yield tuple(doc.get(k) for k in _FIELDS)

    def read(self, start: dict):
        served = set(start["served"])
        new = [f for f in self._files() if f not in served]
        end = {"served": sorted(served | set(new))}
        # a LIST, not a generator: Spark's prefetch cache shallow-copies
        # the returned iterator for replay (datasource_internal.getCache),
        # which a generator cannot survive.
        return list(self._rows(new)), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        replay = sorted(set(end["served"]) - set(start["served"]))
        return list(self._rows(replay))


@dataclass
class _WroteFiles(WriterCommitMessage):
    files: tuple[str, ...]


class CatalogWriter(DataSourceWriter):
    """Batch write path of the catalog format: each task writes its
    partition's regions as `.<region>.json.tmp` files and reports them
    in its commit message; only `commit()` (driver, after every task
    succeeded) renames them into place — a task-level two-phase commit,
    so a failed/straggling task can never publish partial shards.
    `abort()` removes the temporaries."""

    def __init__(self, options, overwrite: bool) -> None:
        self._path = options["path"]
        self._overwrite = overwrite

    def write(self, iterator) -> _WroteFiles:
        os.makedirs(self._path, exist_ok=True)
        written = []
        for row in iterator:
            doc = {k: row[k] for k in _FIELDS}
            tmp = os.path.join(self._path, f".{doc['region']}.json.tmp")
            with open(tmp, "w", encoding="utf-8") as fh:
                json.dump(doc, fh)
            written.append(tmp)
        return _WroteFiles(tuple(written))

    def commit(self, messages) -> None:
        if self._overwrite:
            for name in list(os.listdir(self._path)):
                if name.endswith(".json"):
                    os.remove(os.path.join(self._path, name))
        for m in messages:
            for tmp in m.files:
                final = os.path.join(
                    os.path.dirname(tmp),
                    os.path.basename(tmp)[1:][: -len(".tmp")],
                )
                os.replace(tmp, final)

    def abort(self, messages) -> None:
        for m in messages:
            for tmp in m.files:
                try:
                    os.remove(tmp)
                except FileNotFoundError:
                    pass


class CatalogStreamWriter(DataSourceStreamWriter):
    """Streaming write path: each micro-batch's tasks stage their
    regions as `.<region>.json.<epoch>.tmp` and the per-batch commit()
    renames them into place — the same task-level two-phase publish as
    the batch writer, per epoch. A replayed batch (restart between the
    task writes and the rename) re-stages and re-renames the SAME final
    names, so the sink is idempotent under exactly-once retries;
    abort() drops that epoch's temporaries."""

    def __init__(self, options) -> None:
        self._path = options["path"]

    def write(self, iterator) -> _WroteFiles:
        os.makedirs(self._path, exist_ok=True)
        written = []
        for row in iterator:
            doc = {k: row[k] for k in _FIELDS}
            tmp = os.path.join(self._path, f".{doc['region']}.json.tmp")
            with open(tmp, "w", encoding="utf-8") as fh:
                json.dump(doc, fh)
            written.append(tmp)
        return _WroteFiles(tuple(written))

    def commit(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            for tmp in m.files:
                final = os.path.join(
                    os.path.dirname(tmp),
                    os.path.basename(tmp)[1:][: -len(".tmp")],
                )
                os.replace(tmp, final)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            for tmp in m.files:
                try:
                    os.remove(tmp)
                except FileNotFoundError:
                    pass
