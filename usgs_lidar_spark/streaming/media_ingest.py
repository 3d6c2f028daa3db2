"""Exactly-once streaming PERCEPTUAL media near-dup ingest — the media
tier's version of `streaming/ingest.py`'s chunk-dedup protocol: each
arriving micro-batch of media is dHashed, paired against committed
history through the banded index, and folded into the corpus labeling
with `connected_components_incremental` — no re-clustering of the base
graph, no payload ever re-read.

State, batch_id-versioned like the digest store (replay safety by
addressable history — a replayed batch sees exactly the committed view
its first attempt saw and rewrites identical bytes):

  * ``store/batch_id=<n>/dp=<bucket>/`` — the batch's EXPLODED band
    index rows (band_idx, band_val, media_id, all four bands), hive-
    bucketed by ``dp`` = band_val % dp_buckets (a writer knob, fixed
    for the store's lifetime; size it so batch-rows/bucket lands in
    the thousands — SCALE.md round 14 measured 256 buckets turning
    small batches into a small-file storm). The probe pushes the
    incoming batch's distinct dp values (<= dp_buckets, a knob-bounded
    collect) as a literal partition filter; pruning is SOUND because a
    candidate pair must share an exact (band_idx, band_val) key, so
    any history row that can pair with the batch lives in a dp bucket
    the batch itself occupies.
  * ``labels/batch_id=<n>/`` — the FULL (id, label) corpus labeling
    after batch n (min-id labels, the engine-wide keeper convention).
    O(corpus) 16-byte rows per batch: the labeling IS the product; old
    versions are sealed history and can be vacuumed once the stream
    checkpoint passes them.

Per batch: hash (map-only, payloads never leave their scan), one
prefix-pruned banded join against history + the batch itself (only
(id, bands) rows move), and one contracted-graph CC whose size is
O(touched labels + batch) — independent of the base corpus
(`connected_components_incremental`'s contract). Because min-id labels
compose, draining the stream reproduces the ONE-SHOT
`collapse_clusters` over the full corpus bit-for-bit — pinned,
including a crash replay in the write→commit window, by
tests/test_streaming.py::test_streaming_media_neardup_ingest (the batch
twin `mm_near_dedup` carries the hard DuckDB oracle for the same
composition).

Hasher contract: any DHASH_SCHEMA-shaped hasher plugs in
(`fake_dhash_image` default; `dhash_image` where PIL exists;
`audio_energy_fingerprint` for audio). Items whose hasher emits NULL
bands (audio's too-short convention) are indexed as vertices but never
pair — they stay singletons, exactly as in the batch operator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Pinned store schema: probe reads never run inference (a crashed
#: batch's partially-written directory is never opened — the
#: strictly-older batch_id filter prunes it first).
HASH_STORE_SCHEMA = (
    "band_idx int, band_val bigint, media_id bigint, "
    "b0 bigint, b1 bigint, b2 bigint, b3 bigint, "
    "batch_id bigint, dp string"
)

LABELS_SCHEMA = "id bigint, label bigint"


def _exploded_bands(hashes: DataFrame) -> DataFrame:
    """(band_idx, band_val, media_id, b0..b3) — one row per non-NULL
    band; NULL-banded items (the audio too-short convention) emit no
    index rows and therefore never pair."""
    bands = F.posexplode(F.array("b0", "b1", "b2", "b3")).alias(
        "band_idx", "band_val"
    )
    return (
        hashes.select("media_id", "b0", "b1", "b2", "b3", bands)
        .filter(F.col("band_val").isNotNull())
        .select(
            "band_idx", "band_val", "media_id", "b0", "b1", "b2", "b3"
        )
    )


def read_hash_store_before(
    spark,
    store_path: str,
    batch_id: int,
    prefixes: list[str] | None = None,
) -> DataFrame:
    """Band-index rows of all batches STRICTLY older than ``batch_id``,
    optionally restricted to the dp buckets in ``prefixes`` (sound for
    pair probing — see module docstring). Missing store (first batch)
    reads as zero rows; any other read failure re-raises loudly (the
    silent-rot contract of `streaming/ingest.read_store_before`)."""
    from pyspark.errors import AnalysisException

    pred = F.col("batch_id") < batch_id
    if prefixes is not None:
        pred = pred & F.col("dp").isin(list(prefixes))
    try:
        store = spark.read.schema(HASH_STORE_SCHEMA).parquet(store_path)
    except AnalysisException as e:
        cond = getattr(e, "getCondition", getattr(e, "getErrorClass", None))
        if cond is not None and cond() == "PATH_NOT_FOUND":
            return spark.createDataFrame([], HASH_STORE_SCHEMA).drop(
                "batch_id", "dp"
            )
        raise
    return store.filter(pred).drop("batch_id", "dp")


def read_labels_before(spark, labels_path: str, batch_id: int) -> DataFrame:
    """The committed labeling as of the LATEST batch strictly older
    than ``batch_id`` (directory-addressed, so a replayed batch's own
    crashed labels/batch_id=n output is never consulted). Fresh store
    reads as zero rows."""
    from pathlib import Path

    root = Path(labels_path)
    if not root.exists():
        return spark.createDataFrame([], LABELS_SCHEMA)
    sealed = [
        int(p.name.split("=", 1)[1])
        for p in root.glob("batch_id=*")
        if p.is_dir() and p.name.split("=", 1)[1].isdigit()
    ]
    older = [b for b in sealed if b < batch_id]
    if not older:
        return spark.createDataFrame([], LABELS_SCHEMA)
    latest = max(older)
    return spark.read.schema(LABELS_SCHEMA).parquet(
        f"{labels_path}/batch_id={latest}"
    )


def media_neardup_ingest_writer(
    store_path: str,
    labels_path: str,
    max_hamming: int = 3,
    hasher: Callable[[DataFrame], DataFrame] | None = None,
    dp_buckets: int = 256,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch callback implementing the versioned near-dup
    protocol above. Batch input: media rows (media_id, content).
    Publishes the batch's band-index rows and the updated full corpus
    labeling; both writes are pure functions of (batch, committed
    history), so replays rewrite identical bytes.

    ``dp_buckets`` sizes the store's band-value partitioning (probe
    pruning granularity vs files-per-batch; the prefix set collected
    per batch is bounded by it). A store must keep ONE value for its
    lifetime — dp is part of the on-disk layout.

    WHEN INCREMENTAL PAYS (measured, SCALE.md round 14): per batch this
    writer re-reads NO payloads — the hash pass touches only the
    arriving batch — but it does rewrite the full O(corpus) labeling
    and probe the band index, so at toy payload sizes a from-scratch
    re-cluster of everything can be cheaper than one ingest batch. The
    crossover is payload-bound: one-shot-per-arrival re-decodes every
    payload every time (the dominant cost of a real image/video corpus
    — decode is orders of magnitude heavier than these fixtures' fake
    byte-grid hash), while the incremental fold's marginal cost is
    batch decode + index-row work. Run the ingest when payload decode
    dominates or the corpus no longer fits a comfortable re-cluster;
    re-cluster in batch when it does."""
    if not 0 <= int(max_hamming) <= 7:
        raise ValueError(
            f"max_hamming must be in [0, 7] for 4x16-bit banding, got "
            f"{max_hamming}"
        )

    def ingest(batch: DataFrame, batch_id: int) -> None:
        from usgs_lidar_spark.multimodal import fake_dhash_image
        from usgs_lidar_spark.operators.graph import (
            connected_components_incremental,
        )

        spark = batch.sparkSession
        hashes = (hasher or fake_dhash_image)(batch).localCheckpoint(
            eager=False
        )
        ex = _exploded_bands(hashes).withColumn(
            "dp",
            F.pmod(F.col("band_val"), F.lit(int(dp_buckets))).cast(
                "string"
            ),
        ).localCheckpoint(eager=False)
        prefixes = [
            r["dp"] for r in ex.select("dp").distinct().collect()
        ]
        hist = read_hash_store_before(spark, store_path, batch_id, prefixes)
        # Candidates: batch side a vs (batch ∪ history) side b on the
        # exact band key — every pair has >= 1 new endpoint (the
        # incremental-CC contract); old-old pairs are already folded
        # into the committed labeling.
        a = ex.select(
            "band_idx",
            "band_val",
            F.col("media_id").alias("id_a"),
            *[F.col(f"b{q}").alias(f"a{q}") for q in range(4)],
        )
        b = (
            ex.drop("dp")
            .unionByName(hist)
            .select(
                "band_idx",
                "band_val",
                F.col("media_id").alias("id_b"),
                *[F.col(f"b{q}").alias(f"c{q}") for q in range(4)],
            )
        )
        ham = sum(
            F.bit_count(F.col(f"a{q}").bitwiseXOR(F.col(f"c{q}")))
            for q in range(4)
        ).cast("long")
        pairs = (
            a.join(b, ["band_idx", "band_val"])
            .filter(F.col("id_a") != F.col("id_b"))
            .withColumn("hamming", ham)
            .filter(F.col("hamming") <= int(max_hamming))
            .select(
                F.least("id_a", "id_b").alias("src"),
                F.greatest("id_a", "id_b").alias("dst"),
            )
            .distinct()
        )
        old = read_labels_before(spark, labels_path, batch_id)
        labels = connected_components_incremental(
            old,
            hashes.select(F.col("media_id").alias("id")),
            pairs,
        )
        labels.write.mode("overwrite").parquet(
            f"{labels_path}/batch_id={batch_id}"
        )
        ex.withColumn("batch_id", F.lit(int(batch_id))).write.partitionBy(
            "dp"
        ).mode("overwrite").parquet(f"{store_path}/batch_id={batch_id}")

    return ingest


def run_media_neardup_ingest(
    stream_df: DataFrame,
    store_path: str,
    labels_path: str,
    checkpoint: str,
    max_hamming: int = 3,
    hasher: Callable[[DataFrame], DataFrame] | None = None,
) -> None:
    """Drain all available media through the exactly-once near-dup
    ingest (availableNow trigger). Restart with the same checkpoint
    resumes after the last committed batch; replays rewrite identical
    bytes into the same batch_id directories."""
    q = (
        stream_df.writeStream.foreachBatch(
            media_neardup_ingest_writer(
                store_path, labels_path, max_hamming, hasher
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
