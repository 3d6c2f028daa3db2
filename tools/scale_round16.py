"""Round-16 scale measurements (SCALE.md).

Scenarios:

  * compaction_leveled — the write-amplification A/B the leveling
    exists to win (r15 verdict item 1): a 20-batch drain with inline
    maintenance every 2 batches, run twice — LEVELED (minor folds only
    the tail into a new level; major only at the max_levels trigger)
    vs the round-15 SINGLE-LEVEL discipline (every maintenance run
    rewrites the whole compacted dataset, simulated with major=True).
    Measured per maintenance run: bytes written into the new version
    dir, level count, and the lifetime total — leveled minors must stay
    FLAT as the store grows while single-level grows linearly
    (quadratic lifetime volume).

  * materialize_payloads — the byte mover at 1x/10x: drain the media
    ingest, then cut shards WITH payload materialization
    (`materialize_media_shards(payloads=, payload_out=)`). Measured:
    materialize wall, shuffle R/W from the event log (the payload
    bytes must move ~once), and the exact conservation invariant
    sum(shard_n_bytes) == sum(keeper payload bytes).

  * gates_fixed_reference — deployment-shape scale points for the
    round-16 gates (fuzzy decon / kNN label vote): corpus 10x, the
    reference side (benchmark suite / labeled seeds) held at its fixed
    1x size — the linear-in-corpus claim the naive both-sides-x10
    sf1_bench rows cannot carry.

Usage: python tools/scale_round16.py [compaction_leveled
       materialize_payloads gates_fixed_reference]
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


def _dir_bytes(p: Path) -> int:
    return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


def compaction_leveled(
    n_batches: int = 20, batch_rows: int = 20_000, every: int = 2
):
    import shutil as _sh

    from tools.scale_experiment import make_session
    from tools.scale_round14 import _media
    from usgs_lidar_spark.streaming.media_ingest import (
        _read_store_manifest,
        compact_media_store,
        media_neardup_ingest_writer,
        read_hash_store_before,
        vacuum_media_labels,
        vacuum_media_store,
    )

    work = WORK / "compact_leveled"
    _sh.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)
    spark = make_session("compact-leveled-scale", work / "log")

    def drain(tag: str, major_every_time: bool) -> dict:
        store = str(work / f"store_{tag}")
        labels = str(work / f"labels_{tag}")
        writer = media_neardup_ingest_writer(
            store, labels, max_hamming=3, dp_buckets=16
        )
        runs = []
        for b in range(n_batches):
            df = _media(
                spark, batch_rows, offset=b * batch_rows, chars=150
            ).select("media_id", "content").localCheckpoint()
            writer(df, b)
            if b > 0 and b % every == 0:
                pre = _read_store_manifest(spark, store)
                t0 = time.perf_counter()
                m = compact_media_store(
                    spark, store, up_to_batch=b - 1,
                    major=major_every_time,
                )
                dt = time.perf_counter() - t0
                vacuum_media_labels(spark, labels, committed_batch_id=b - 1)
                vacuum_media_store(spark, store)
                if m is not None:
                    vdir = Path(store) / "_compacted" / f"v{m['version']}"
                    runs.append(
                        {
                            "batch": b,
                            "version": m["version"],
                            "n_levels": len(m["levels"]),
                            "mb_written": round(
                                _dir_bytes(vdir) / 1e6, 2
                            ),
                            "sec": round(dt, 2),
                            "was_major": major_every_time
                            or (
                                pre is not None
                                and len(m["levels"]) == 1
                            ),
                        }
                    )
        # final consistency probe: the full history view row count
        n = read_hash_store_before(spark, store, n_batches).count()
        return {
            "runs": runs,
            "total_mb_written": round(
                sum(r["mb_written"] for r in runs), 2
            ),
            "probe_rows": n,
        }

    leveled = drain("leveled", major_every_time=False)
    single = drain("single", major_every_time=True)
    print(
        json.dumps(
            {
                "scenario": "compaction_leveled",
                "n_batches": n_batches,
                "batch_rows": batch_rows,
                "compact_every": every,
                "leveled": leveled,
                "single_level": single,
                "probe_rows_identical": leveled["probe_rows"]
                == single["probe_rows"],
            }
        ),
        flush=True,
    )
    spark.stop()


def materialize_payloads(rows: int = 20_000, chars: int = 4_000):
    import shutil as _sh

    from pyspark.sql import functions as FF

    from tools.scale_experiment import make_session, shuffle_bytes
    from tools.scale_round14 import _media
    from usgs_lidar_spark.streaming.media_ingest import (
        materialize_media_shards,
        media_neardup_ingest_writer,
    )

    for factor, tag in ((1, "1x"), (10, "10x")):
        n = rows * factor
        work = WORK / f"mat_payloads_{tag}"
        _sh.rmtree(work, ignore_errors=True)
        work.mkdir(parents=True)
        log = work / "log"
        spark = make_session(f"mat-payloads-{tag}", log)
        store, labels = str(work / "store"), str(work / "labels")
        writer = media_neardup_ingest_writer(
            store, labels, max_hamming=3, dp_buckets=16
        )
        media = (
            _media(spark, n, chars=chars)
            .select("media_id", "content")
            .localCheckpoint()
        )
        third = n // 3
        for b, flt in enumerate(
            (
                FF.col("media_id") < third,
                (FF.col("media_id") >= third)
                & (FF.col("media_id") < 2 * third),
                FF.col("media_id") >= 2 * third,
            )
        ):
            writer(media.filter(flt), b)
        # the payload store a real cut reads: parquet on disk (also what
        # gives Catalyst true size stats for the join strategy choice)
        media.write.mode("overwrite").parquet(str(work / "payloads"))
        spark.stop()
        for strict in (True, False):
            mode = "strict" if strict else "trusted"
            mlog = work / f"log_{mode}"
            mspark = make_session(f"mat-payloads-{tag}-{mode}", mlog)
            mmedia = mspark.read.parquet(str(work / "payloads"))
            mmeta = mmedia.select(
                "media_id",
                FF.length("content").cast("long").alias("n_bytes"),
            )
            t0 = time.perf_counter()
            packed = materialize_media_shards(
                mspark,
                labels,
                mmeta,
                str(work / f"shards_{mode}"),
                budget=1 << 20,
                n_streams=8,
                payloads=mmedia,
                payload_out=str(work / f"shard_bytes_{mode}"),
                strict_payloads=strict,
            )
            wall = time.perf_counter() - t0
            keeper_bytes = packed.agg(FF.sum("n_bytes")).collect()[0][0]
            blob_bytes = (
                mspark.read.parquet(str(work / f"shard_bytes_{mode}"))
                .agg(FF.sum("shard_n_bytes"), FF.count(FF.lit(1)))
                .collect()[0]
            )
            mspark.stop()
            rd, wr = shuffle_bytes(mlog)
            print(
                json.dumps(
                    {
                        "scenario": f"materialize_payloads_{tag}_{mode}",
                        "media_rows": n,
                        "payload_mb": round(n * chars / 1e6, 1),
                        "materialize_sec": round(wall, 2),
                        "n_shards": blob_bytes[1],
                        "keeper_payload_mb": round(keeper_bytes / 1e6, 1),
                        "shard_blob_mb": round(blob_bytes[0] / 1e6, 1),
                        "bytes_conserved": int(keeper_bytes)
                        == int(blob_bytes[0]),
                        "shuffle_read_mb": round(rd / 1e6, 1),
                        "shuffle_write_mb": round(wr / 1e6, 1),
                    }
                ),
                flush=True,
            )


def gates_fixed_reference():
    """Deployment-shape scale points for the round-16 curation gates:
    the CORPUS side grows 10x (the sf1_bench replicas) while the
    REFERENCE side — the benchmark suite / the hand-labeled seed set —
    stays the fixed 1x subset, which is how both gates actually run (an
    eval suite and a label budget don't grow with the crawl). The
    naive sf1_bench rows grow BOTH sides (seeds x corpus = 100x work;
    replica-densified pair graph), so these rows carry the linearity
    claim: wall and shuffle ~10x for 10x corpus."""
    import shutil as _sh

    from tools.scale_experiment import make_session, shuffle_bytes
    from tools.sf1_bench import SF01, SF1, build_sf1
    from usgs_lidar_spark.operators.dedup import minhash_decon_pairs
    from usgs_lidar_spark.operators.similarity import knn_label_vote

    from pyspark.sql import functions as FF

    build_sf1()
    for which in ("decon", "knn", "knn_ivf"):
        for tag, sf_dir in (("1x", SF01), ("10x", SF1)):
            log = WORK / f"fixedref_{which}_{tag}_log"
            _sh.rmtree(log, ignore_errors=True)
            spark = make_session(f"fixedref-{which}-{tag}", log)
            t0 = time.perf_counter()
            if which == "decon":
                corpus = spark.read.parquet(
                    str(sf_dir / "documents.parquet")
                ).filter("doc_id % 11 != 0")
                bench = spark.read.parquet(
                    str(SF01 / "documents.parquet")
                ).filter("doc_id % 11 = 0")
                out = minhash_decon_pairs(
                    corpus, bench, "text", "doc_id", threshold=0.6
                )
            else:
                from usgs_lidar_spark.operators.similarity import (
                    knn_label_vote_ivf,
                )

                corpus = spark.read.parquet(
                    str(sf_dir / "embeddings.parquet")
                ).filter("vec_id % 7 != 0")
                seeds = spark.read.parquet(
                    str(SF01 / "embeddings.parquet")
                ).filter("vec_id % 7 = 0")
                if which == "knn":
                    out = knn_label_vote(corpus, seeds, k=5, min_frac=0.6)
                else:
                    cents = [
                        (int(r["vec_id"]),
                         [float(x) for x in r["embedding"]])
                        for r in spark.read.parquet(
                            str(SF01 / "embeddings.parquet")
                        ).filter(FF.col("vec_id") < 8).collect()
                    ]
                    out = knn_label_vote_ivf(
                        corpus, seeds, cents, k=5, n_probe=2,
                        min_frac=0.6,
                    )
            n = out.count()
            wall = time.perf_counter() - t0
            spark.stop()
            rd, wr = shuffle_bytes(log)
            print(
                json.dumps(
                    {
                        "scenario": f"fixedref_{which}_{tag}",
                        "n_rows": n,
                        "sec": round(wall, 2),
                        "shuffle_read_mb": round(rd / 1e6, 1),
                        "shuffle_write_mb": round(wr / 1e6, 1),
                    }
                ),
                flush=True,
            )


def bloom_reduction():
    """The bloom semi-join reduction's shuffle A/B (the case
    `operators/bloomjoin.py` exists for): the URGENT-orders x lineitem
    join with broadcast fallback DISABLED (autoBroadcastJoinThreshold
    -1, plan-time and AQE — at 100 TB the build side is past any
    broadcast budget, which local scale cannot otherwise reproduce),
    plain SMJ vs bloom-prefiltered, at 1x (sf0.1) and 10x (sf1).
    Measured: wall, total shuffle R/W, and the join-input row cut."""
    import shutil as _sh

    from pyspark.sql import functions as FF

    from tools.scale_experiment import make_session, shuffle_bytes
    from tools.sf1_bench import SF01, SF1, build_sf1
    from usgs_lidar_spark.operators.bloomjoin import bloom_prefilter_join

    build_sf1()
    for tag, sf_dir in (("1x", SF01), ("10x", SF1)):
        for mode in ("plain", "bloom"):
            log = WORK / f"bloom_{mode}_{tag}_log"
            _sh.rmtree(log, ignore_errors=True)
            spark = make_session(f"bloom-{mode}-{tag}", log)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
            )
            li = spark.read.parquet(
                str(sf_dir / "lineitem.parquet")
            ).select("l_orderkey", "l_quantity")
            build = (
                spark.read.parquet(str(sf_dir / "orders.parquet"))
                .filter(FF.col("o_orderpriority") == "1-URGENT")
                .select(
                    FF.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
                )
            )
            t0 = time.perf_counter()
            if mode == "bloom":
                joined = bloom_prefilter_join(li, build, "l_orderkey")
            else:
                joined = li.join(build, "l_orderkey")
            n = (
                joined.groupBy(
                    FF.date_format("o_orderdate", "yyyy-MM").alias("m")
                )
                .agg(
                    FF.count(FF.lit(1)),
                    FF.sum(
                        FF.round(FF.col("l_quantity") * 100).cast("long")
                    ),
                )
                .count()
            )
            wall = time.perf_counter() - t0
            spark.stop()
            rd, wr = shuffle_bytes(log)
            print(
                json.dumps(
                    {
                        "scenario": f"bloom_join_{mode}_{tag}",
                        "n_groups": n,
                        "sec": round(wall, 2),
                        "shuffle_read_mb": round(rd / 1e6, 1),
                        "shuffle_write_mb": round(wr / 1e6, 1),
                    }
                ),
                flush=True,
            )


def main() -> None:
    WORK.mkdir(parents=True, exist_ok=True)
    which = sys.argv[1:] or ["compaction_leveled", "materialize_payloads"]
    for name in which:
        {
            "compaction_leveled": compaction_leveled,
            "materialize_payloads": materialize_payloads,
            "gates_fixed_reference": gates_fixed_reference,
            "bloom_reduction": bloom_reduction,
        }[name]()


if __name__ == "__main__":
    main()
