"""Multimodal column support: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched pandas over mapInPandas.

Three decode tiers, cheapest first:
  * `probe_image_dims` — pure-Python PNG/JPEG/GIF/BMP header parsing
    (width/height/channels from the leading bytes, no imaging library,
    no pixel decode) — the 100 TB filtering pass;
  * `decode_image` — full PIL decode, import-gated (this container ships
    no imaging libs; the path is real and tested wherever PIL exists);
  * `fake_decode_image` — deterministic stand-in that exercises the exact
    mapInPandas schema/batch shape with zero deps.
"""

from usgs_lidar_spark.multimodal.binary_ops import (  # noqa: F401
    DECODED_SCHEMA,
    MEDIA_SCHEMA,
    binary_feature_extract,
    decode_image,
    fake_decode_image,
    have_pil,
    probe_image_dims,
    to_media_table,
)
