"""Multimodal column support: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched pandas over mapInPandas.

The decode step is STUBBED (the container has no imaging/audio libraries);
the Spark-side plumbing — schema, batching, partitioning, UDF signatures —
is real and tested. Swap `fake_decode_image` for a real decoder (PIL/ffmpeg)
on a cluster with the libraries installed and nothing else changes.
"""

from usgs_lidar_spark.multimodal.binary_ops import (  # noqa: F401
    MEDIA_SCHEMA,
    binary_feature_extract,
    decode_image,
    fake_decode_image,
    to_media_table,
)
