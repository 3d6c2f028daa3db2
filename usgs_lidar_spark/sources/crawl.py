"""Distributed catalog crawl (SURVEY.md §2 S5, §3.2).

The reference crawls 1,597 `ept.json` endpoints with a serial driver-side
urllib3 loop, appending one row at a time and rewriting the CSV inside the
loop (/root/reference/scripts/usgs_lidar.py:245-276 — an O(n^2) sink).

Engine design: the filename list becomes a DataFrame, repartitioned for
fan-out; each partition runs an HTTP fetcher with connection reuse inside
``mapInPandas`` (Arrow batches in/out, one session per partition); the JSON
payload is parsed with JVM-side `from_json` + `element_at` — the Python
side only moves bytes. The sink is a single distributed write after the
crawl, never inside the loop.

The fetcher is injectable so tests run without network; the default uses
urllib3 (import-gated).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from usgs_lidar_spark.functions.strings import extract_year, name_prefix, strip_chars

#: EPT metadata payload schema — bounds is [xmin,ymin,zmin,xmax,ymax,zmax]
#: (SURVEY.md §1.2; the reference indexes bounds[0],[3],[1],[4]).
EPT_JSON_SCHEMA = T.StructType(
    [
        T.StructField("bounds", T.ArrayType(T.DoubleType())),
        T.StructField("points", T.LongType()),
    ]
)

FETCHED_SCHEMA = T.StructType(
    [
        T.StructField("filename", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("payload", T.StringType()),
    ]
)


#: HTTP statuses worth retrying: throttling and transient server errors.
_RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504})


def fetch_with_retry(
    request_fn: Callable[[str], tuple[int, str | None]],
    url: str,
    retries: int = 3,
    backoff_seconds: float = 0.5,
    sleep: Callable[[float], None] | None = None,
) -> tuple[int, str | None]:
    """Bounded-retry wrapper around one GET: exceptions and retryable
    statuses (429/5xx) back off exponentially (0.5s, 1s, 2s, ...) up to
    ``retries`` re-attempts; the final failure is returned, never raised
    (a crawl partition must not die on one flaky endpoint). Pure logic —
    inject ``request_fn``/``sleep`` to test without a network."""
    import time

    sleep = sleep or time.sleep
    status, payload = -1, None
    for attempt in range(retries + 1):
        try:
            status, payload = request_fn(url)
        except Exception:
            status, payload = -1, None
        if status == 200 or (status != -1 and status not in _RETRYABLE_STATUSES):
            return status, payload
        if attempt < retries:
            sleep(backoff_seconds * (2**attempt))
    return status, payload


def default_http_fetcher(
    base_url: str, retries: int = 3, backoff_seconds: float = 0.5
) -> Callable[[pd.Series], pd.DataFrame]:
    """Returns a per-partition fetcher using one pooled urllib3 connection
    (the distributed analog of the reference's serial GET loop), with
    bounded exponential-backoff retries on transient failures."""

    def fetch(names: pd.Series) -> pd.DataFrame:
        import urllib3  # deferred: executors import it, driver may not have it

        http = urllib3.PoolManager()

        def request(url: str) -> tuple[int, str | None]:
            r = http.request("GET", url, timeout=10.0)
            return r.status, r.data.decode("utf-8", "replace")

        rows = []
        for name in names:
            url = f"{base_url}/{name}/ept.json"
            status, payload = fetch_with_retry(
                request, url, retries=retries, backoff_seconds=backoff_seconds
            )
            rows.append((name, status, payload))
        return pd.DataFrame(rows, columns=["filename", "status", "payload"])

    return fetch


def crawl_catalog(
    filenames: DataFrame,
    fetcher: Callable[[pd.Series], pd.DataFrame],
    partitions: int = 64,
) -> DataFrame:
    """Crawl all endpoints and build the region catalog
    (filename, region, year, xmin, xmax, ymin, ymax, points).

    `filenames`: a 1-column DataFrame (`value`) of catalog entries.
    Failed fetches (status != 200) are dropped — matching the reference's
    status guard (scripts/usgs_lidar.py:259), which is why its 1,597 crawled
    endpoints yield 1,594 catalog rows.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fetcher(pdf["value"])

    fetched = filenames.repartition(partitions).mapInPandas(run, FETCHED_SCHEMA)
    parsed = (
        fetched.filter(F.col("status") == 200)
        .withColumn("j", F.from_json("payload", EPT_JSON_SCHEMA))
        .select(
            strip_chars("filename", "/").alias("filename"),
            name_prefix("filename").alias("region"),
            extract_year("filename").alias("year"),
            F.element_at("j.bounds", 1).alias("xmin"),
            F.element_at("j.bounds", 4).alias("xmax"),
            F.element_at("j.bounds", 2).alias("ymin"),
            F.element_at("j.bounds", 5).alias("ymax"),
            F.col("j.points").alias("points"),
        )
    )
    return parsed
