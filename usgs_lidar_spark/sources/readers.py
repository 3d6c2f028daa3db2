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
