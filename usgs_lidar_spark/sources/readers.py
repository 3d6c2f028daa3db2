"""Readers (SURVEY.md §2 S2-S4).

Reference behaviors re-expressed:
  * S2 `read_csv` with custom null tokens ["n/a", "na", "undefined"]
    (/root/reference/scripts/usgs_lidar.py:84-104). Spark's CSV reader
    takes ONE nullValue, so the remaining tokens are normalized with a
    post-read replace — still JVM-side expressions.
  * S3 `read_json` (:40-55) — config documents stay driver-side
    (plain json.load); data JSON goes through spark.read.json.
  * S4 `read_txt` (:204-222) — spark.read.text.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The reference's missing-value tokens (scripts/usgs_lidar.py:84).
NULL_TOKENS = ["n/a", "na", "undefined"]


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    null_tokens: list[str] | None = None,
) -> DataFrame:
    """CSV with header and the reference's null-token semantics."""
    tokens = NULL_TOKENS if null_tokens is None else null_tokens
    reader = (
        spark.read.option("header", True)
        .option("nullValue", tokens[0] if tokens else None)
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    if len(tokens) > 1:
        # Remaining tokens -> NULL on every string column (JVM-side).
        for name, dtype in df.dtypes:
            if dtype == "string":
                df = df.withColumn(
                    name,
                    F.when(F.col(name).isin(tokens[1:]), F.lit(None)).otherwise(
                        F.col(name)
                    ),
                )
    return df


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """S4: one row per line, column `value` (the catalog filename list)."""
    return spark.read.text(path)


def read_json_config(path: str) -> dict:
    """S3 for config documents (the reference's pipeline template): a
    driver-side dict — never a DataFrame."""
    with open(path) as f:
        return json.load(f)


def read_json_data(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """S3 for data: distributed JSON-lines scan."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_json_data_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines scan that QUARANTINES malformed rows instead of silently
    nulling (PERMISSIVE's default) or dropping (DROPMALFORMED) them:
    returns (good, quarantined) where `good` carries the declared schema
    and `quarantined` holds each bad line's raw text for triage.

    At ingest scale a malformed-row policy must be explicit: crawl/vendor
    feeds always contain some garbage, DROPMALFORMED hides it, and
    FAILFAST turns one bad byte into a dead 100 TB backfill. The
    quarantine frame is the auditable middle: the pipeline proceeds,
    nothing is silently lost, and the bad lines land in their own sink.

    Spark caveat handled here: the corrupt-record column cannot be the
    only selected column (the scan would short-circuit parsing), and
    since Spark 3 a query may not select ONLY the corrupt column from
    the raw scan — so the split materializes the flag into a normal
    boolean first.
    """
    full = T.StructType(
        schema.fields + [T.StructField(corrupt_col, T.StringType())]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    ).cache()  # one parse feeds both halves
    good = raw.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantined = raw.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, quarantined


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    null_tokens: list[str] | None = None,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of read_json_data_quarantine, composed with the
    reference's null-token semantics on the good half."""
    tokens = NULL_TOKENS if null_tokens is None else null_tokens
    full = T.StructType(
        schema.fields + [T.StructField(corrupt_col, T.StringType())]
    )
    raw = (
        spark.read.option("header", True)
        .schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("nullValue", tokens[0] if tokens else None)
        .csv(path)
    ).cache()
    good = raw.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    if len(tokens) > 1:
        for name, dtype in good.dtypes:
            if dtype == "string":
                good = good.withColumn(
                    name,
                    F.when(F.col(name).isin(tokens[1:]), F.lit(None)).otherwise(
                        F.col(name)
                    ),
                )
    quarantined = raw.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, quarantined


def read_orc(spark, path: str):
    """ORC scan — same predicate-pushdown/column-pruning contract as the
    parquet paths (ORC carries its own stripe-level min/max indexes, so
    the row-group-skipping story transfers)."""
    return spark.read.orc(path)


def write_orc(df, path: str, mode: str = "overwrite") -> None:
    """ORC sink for interop with Hive-era warehouses; columnar like
    parquet, so the engine's layout guidance (partition + sort within
    partitions) applies unchanged."""
    df.write.mode(mode).orc(path)
