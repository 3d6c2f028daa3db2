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

Transform tier: `resize_image` (PIL-gated) / `fake_resize_image`
(deterministic tiling stand-in, same schema and output-size profile) and
`sample_frames` — byte-chunk frame sampling, the one-to-many mapInPandas
shape (real for raw frame buffers; container formats would wrap a codec
decode in the same contract), oracle-checked as `mm_frame_sample`.

Near-dup tier: `dhash_image` (PIL-gated perceptual difference-hash,
four 16-bit bands) / `fake_dhash_image` (identical band packing over a
deterministic byte-grid decode — DuckDB-reproducible) and
`near_dup_media_by_dhash` — Hamming-banded near-dup pairs, lossless at
Hamming <= 3 by pigeonhole, never all-pairs; oracle-checked as
`mm_dhash_fingerprint` / `mm_near_dedup`.
"""

from usgs_lidar_spark.multimodal.binary_ops import (  # noqa: F401
    DECODED_SCHEMA,
    DHASH_SCHEMA,
    FRAMES_SCHEMA,
    MEDIA_SCHEMA,
    RESIZED_SCHEMA,
    audio_energy_fingerprint,
    audio_rms_windows,
    binary_feature_extract,
    decode_image,
    dedup_media_by_content,
    dhash_image,
    fake_decode_image,
    fake_dhash_image,
    fake_dhash_image_wide,
    fake_resize_image,
    have_pil,
    image_text_gate,
    near_dup_media_by_dhash,
    near_dup_media_by_dhash_combo,
    near_dup_video_by_frames,
    probe_image_dims,
    resize_image,
    sample_frames,
    semantic_verify_pairs,
    shard_payload_blobs,
    to_media_table,
)
