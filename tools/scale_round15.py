"""Round-15 scale measurements (SCALE.md).

Scenarios:

  * media_store_compaction — lifecycle cost of the media ingest's
    versioned state over a 10-batch drain: the band-index store
    accumulates one batch_id=<n>/dp=<bucket> tree per micro-batch and
    the labels store one full corpus labeling per batch — the
    small-file / unbounded-history problem `compact_media_store` +
    `vacuum_media_labels`/`vacuum_media_store` exist to fix. Measured:
    store file count + bytes and a full history-probe wall BEFORE vs
    AFTER compaction (probe row set asserted identical), labels
    versions before vs after vacuum, and the post-compaction ingest
    wall of one more batch (the probe now reads the merged dataset).

  * media_ingest_two_tier — per-batch cost of the TWO-TIER streaming
    media ingest (dHash candidates + embedding-cosine pair verify)
    vs the perceptual-only ingest on the same 5-batch drain: the
    verify adds two id-keyed embedding joins per batch, priced here.

Usage: python tools/scale_round15.py [media_store_compaction media_ingest_two_tier]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from tools.scale_round8 import WORK  # noqa: E402


def media_store_compaction(
    n_batches: int = 10, batch_rows: int = 20_000, chars: int = 4_000
):
    import shutil as _sh

    from pyspark.sql import functions as FF

    from tools.scale_experiment import make_session
    from tools.scale_round14 import _media
    from usgs_lidar_spark.streaming.media_ingest import (
        compact_media_store,
        list_sealed_batches,
        media_neardup_ingest_writer,
        read_hash_store_before,
        vacuum_media_labels,
        vacuum_media_store,
    )

    work = WORK / "media_compact"
    _sh.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)
    spark = make_session("media-compact-scale", work / "log")
    store, labels = str(work / "store"), str(work / "labels")
    writer = media_neardup_ingest_writer(
        store, labels, max_hamming=3, dp_buckets=16
    )

    def batch_df(b: int):
        base = _media(
            spark, batch_rows, offset=b * batch_rows, chars=chars
        ).select("media_id", "content")
        if b == 0:
            return base
        prev = _media(
            spark, 1000, offset=(b - 1) * batch_rows, chars=chars
        ).select(FF.col("media_id").alias("src_id"), "content")
        reup = prev.select(
            (
                FF.col("src_id")
                - (b - 1) * batch_rows
                + b * batch_rows
                + batch_rows
                - 1000
            ).alias("media_id"),
            "content",
        )
        return base.filter(
            FF.col("media_id") < b * batch_rows + batch_rows - 1000
        ).unionByName(reup)

    walls = []
    for b in range(n_batches):
        df = batch_df(b).localCheckpoint()
        t0 = time.perf_counter()
        writer(df, b)
        walls.append(round(time.perf_counter() - t0, 2))

    def store_stats():
        files = list(Path(store).rglob("*.parquet"))
        return len(files), sum(f.stat().st_size for f in files)

    def probe():
        t0 = time.perf_counter()
        h = read_hash_store_before(spark, store, n_batches).agg(
            FF.count(FF.lit(1)),
            FF.sum(
                FF.pmod(FF.xxhash64("media_id", "band_val"), FF.lit(10**9))
            ),
        ).collect()[0]
        return time.perf_counter() - t0, (h[0], h[1])

    files_pre, bytes_pre = store_stats()
    t_probe_pre, fp_pre = probe()
    label_versions_pre = len(list_sealed_batches(spark, labels))

    t0 = time.perf_counter()
    compact_media_store(spark, store, up_to_batch=n_batches - 1)
    t_compact = time.perf_counter() - t0
    vacuumed = vacuum_media_labels(
        spark, labels, committed_batch_id=n_batches - 1
    )
    vacuum_media_store(spark, store)

    files_post, bytes_post = store_stats()
    t_probe_post, fp_post = probe()

    # one more incremental batch against the compacted store
    df = batch_df(n_batches).localCheckpoint()
    t0 = time.perf_counter()
    writer(df, n_batches)
    t_next_batch = round(time.perf_counter() - t0, 2)

    print(
        json.dumps(
            {
                "scenario": "media_store_compaction",
                "batch_rows": batch_rows,
                "n_batches": n_batches,
                "per_batch_sec": walls,
                "store_files_pre": files_pre,
                "store_files_post": files_post,
                "store_mb_pre": round(bytes_pre / 1e6, 1),
                "store_mb_post": round(bytes_post / 1e6, 1),
                "probe_sec_pre": round(t_probe_pre, 2),
                "probe_sec_post": round(t_probe_post, 2),
                "probe_rows_identical": fp_pre == fp_post,
                "compact_sec": round(t_compact, 2),
                "label_versions_pre": label_versions_pre,
                "label_versions_vacuumed": vacuumed,
                "ingest_after_compact_sec": t_next_batch,
            }
        ),
        flush=True,
    )
    spark.stop()


def media_ingest_two_tier(
    n_batches: int = 5, batch_rows: int = 20_000, chars: int = 4_000
):
    """Per-batch walls: perceptual-only vs two-tier (embedding verify)
    over the same synthetic drain. Embeddings: every media_id gets a
    deterministic 8-dim vector; planted near-copies share their
    source's vector (verify keeps them), so cluster structure matches
    the perceptual run and the delta is pure verify overhead."""
    import shutil as _sh

    from pyspark.sql import functions as FF

    from tools.scale_experiment import make_session
    from tools.scale_round14 import _media
    from usgs_lidar_spark.streaming.media_ingest import (
        media_neardup_ingest_writer,
    )

    work = WORK / "media_two_tier"
    _sh.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)
    spark = make_session("media-two-tier-scale", work / "log")
    total = n_batches * batch_rows + batch_rows

    # vector id: near-copies (id % 5 == 0 inside _media share content
    # with id-1) get id-1's vector so the verify confirms them.
    base_ids = spark.range(total).select(FF.col("id").alias("media_id"))
    src = FF.when(
        (FF.col("media_id") % 5 == 0) & (FF.col("media_id") > 0),
        FF.col("media_id") - 1,
    ).otherwise(FF.col("media_id"))
    emb = base_ids.select(
        "media_id",
        FF.array(
            *[
                (
                    FF.pmod(FF.xxhash64(src, FF.lit(d)), FF.lit(201)) - 100
                ).cast("double")
                / 100.0
                for d in range(8)
            ]
        ).alias("embedding"),
    ).localCheckpoint()

    def batch_df(b: int):
        return _media(
            spark, batch_rows, offset=b * batch_rows, chars=chars
        ).select("media_id", "content")

    out = {"scenario": "media_ingest_two_tier", "batch_rows": batch_rows}
    for tag, kwargs in (
        ("perceptual", {}),
        ("two_tier", {"embeddings": emb, "verify_threshold": 0.9}),
    ):
        writer = media_neardup_ingest_writer(
            str(work / f"store_{tag}"),
            str(work / f"labels_{tag}"),
            max_hamming=3,
            dp_buckets=16,
            **kwargs,
        )
        walls = []
        for b in range(n_batches):
            df = batch_df(b).localCheckpoint()
            t0 = time.perf_counter()
            writer(df, b)
            walls.append(round(time.perf_counter() - t0, 2))
        out[f"per_batch_sec_{tag}"] = walls
    # same clusters? two-tier keeps planted pairs (same vector) so the
    # labelings must agree exactly on this fixture.
    a = spark.read.parquet(
        str(work / f"labels_perceptual/batch_id={n_batches - 1}")
    )
    b = spark.read.parquet(
        str(work / f"labels_two_tier/batch_id={n_batches - 1}")
    )
    out["labelings_equal"] = (
        a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    )
    print(json.dumps(out), flush=True)
    spark.stop()


def main() -> None:
    which = sys.argv[1:] or ["media_store_compaction"]
    if "media_store_compaction" in which:
        media_store_compaction()
    if "media_ingest_two_tier" in which:
        media_ingest_two_tier()


if __name__ == "__main__":
    main()
