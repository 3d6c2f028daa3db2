"""Binary-column plumbing for multimodal data.

Design for 100 TB of media:
  * media lives in a `content: binary` column next to typed metadata
    (media_type, n_bytes, width/height/duration when known) — Parquet
    stores it page-compressed, and predicate pushdown on the metadata
    columns prunes scans without touching bytes;
  * all per-item Python work runs through ``mapInPandas`` — Arrow moves
    whole columnar batches across the JVM<->Python boundary once per
    partition chunk, never per row;
  * decode is stubbed here (no imaging libs in this container): the
    plumbing (schemas, batch shapes, signatures) is real; a deterministic
    fake decoder keeps the path testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of a multimodal media table.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("content", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

#: Output schema of binary_feature_extract.
FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_byte", T.IntegerType()),
        T.StructField("byte_sum_mod", T.LongType()),
    ]
)


def to_media_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media table from a text column (UTF-8 bytes stand in for
    media payloads in tests — the schema/plumbing is what matters)."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        content.alias("content"),
        F.length(content).cast("long").alias("n_bytes"),
    )


def binary_feature_extract(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Features are deliberately simple and SQL-checkable (byte length, first
    byte, byte-sum mod 997) — the point is the mapInPandas path: columnar
    Arrow transfer, per-batch pandas work, typed output schema.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(len).astype("int64"),
                    "head_byte": content.map(
                        lambda b: int(b[0]) if len(b) else -1
                    ).astype("int32"),
                    "byte_sum_mod": content.map(
                        lambda b: int(sum(b)) % 997
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(extract, FEATURES_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """Real image decode (width/height/channels + resize). STUB: the
    container ships no imaging libraries; on a real cluster, implement
    `extract` with PIL/cv2 inside the same mapInPandas shape as
    binary_feature_extract."""
    raise NotImplementedError(
        "image decoding requires an imaging library (PIL/cv2) not present "
        "in this environment; use fake_decode_image for plumbing tests"
    )


#: Output schema of fake_decode_image — what a real decoder would emit.
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def fake_decode_image(media: DataFrame) -> DataFrame:
    """Deterministic fake decoder: derives plausible dimensions from the
    byte content (so tests exercise the exact schema/batch path a real
    decoder would use)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["content"].map(len)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "channels": pd.Series([3] * len(pdf), dtype="int32"),
                }
            )

    return media.mapInPandas(decode, DECODED_SCHEMA)
