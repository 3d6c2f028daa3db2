"""Round-11 scale measurements (SCALE.md) at 1x (sf0.1) vs 10x
(tools/sf1_bench.py's token-rotated replicated documents — the same
harder-than-linear corpus every other SCALE row uses).

What each scenario is meant to prove:
  * dedup_source_overlap — the round-10 verdict's lead item: with the
    absolute df cap (max_df=20) the overlap matrix THINNED at 10x
    (89 pairs vs 190 at 1x — rotation-shared shingles drift past a
    fixed df as the corpus grows, so answers were silently
    incomparable across corpus sizes). The query now uses the
    fractional cap (max_df_frac=0.04, resolved against shingle-bearing
    docs with zero extra corpus passes inside `char_shingles`): the
    pair count must be STABLE 1x -> 10x while shuffle stays linear in
    capped shingle occurrences.
  * dedup_semantic_semdedup — the sf1 replicated embeddings are scaled
    (1 + 1e-4 k) copies of the originals, i.e. cosine-1 near-dups by
    construction: at 10x every cell is ~10x denser in REAL duplicates,
    so the within-cell candidate join pays its quadratic-per-cell cost
    on exactly the corpus SemDeDup is built for. The 100 TB mitigation
    is the standard one (k ~ sqrt(corpus): more, smaller cells as the
    corpus grows — the quantizer is a knob, the join shape is fixed);
    this row measures the fixed-k worst case honestly.

Method identical to tools/scale_round10.py: warm second run reported
(first pays whole-stage-codegen JIT), results fully materialized via an
all-column xxhash64 aggregate (a bare count() lets Catalyst prune the
interesting expressions), pmod to stay in int64 under ANSI mode.

Usage: python tools/scale_round11.py [name ...]  # one JSON line each
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from tools.scale_round8 import timed  # noqa: E402
from tools.sf1_bench import SF1, SF01, WORK, build_sf1  # noqa: E402

SCENARIOS = [
    "dedup_source_overlap",
    "dedup_semantic_semdedup",
]

#: ingest-probe experiment: history batches per scale tag.
PROBE_BATCH_DOCS = 4  # the small incoming batch whose probe we measure


def build_history_store(spark, sf_dir: str, tag: str, width: int) -> str:
    """Materialize a digest store the way chunk_dedup_ingest_writer
    does (batch_id + dp hive partitions), 5 history batches over the
    corpus, digest-prefix width ``width``. Idempotent per (tag, width)."""
    from pyspark.sql import functions as F

    from usgs_lidar_spark.operators.dedup import chunk_digests

    store = WORK / f"ingest_store_{tag}_w{width}"
    marker = store / "_BUILT"
    if marker.exists():
        return str(store)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    step = -(-n // 5)
    for b in range(5):
        batch = docs.filter(
            (F.col("doc_id") % n >= b * step)
            & (F.col("doc_id") % n < (b + 1) * step)
        )
        (
            chunk_digests(batch, chunk_tokens=32)
            .withColumn("dp", F.substring("digest", 1, width))
            .write.partitionBy("dp")
            .mode("overwrite")
            .parquet(f"{store}/batch_id={b}")
        )
    marker.parent.mkdir(parents=True, exist_ok=True)
    marker.write_text("ok")
    return str(store)


def run_probe(name: str, sf_dir: str, tag: str, width: int, pruned: bool):
    """Measure ONLY the history-side probe read (the anti-join's right
    side): bytes the store scan pays for one small incoming batch."""
    from pyspark.sql import functions as F

    from usgs_lidar_spark.operators.dedup import chunk_digests

    def body(spark) -> int:
        store = build_history_store(spark, sf_dir, tag, width)
        batch = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .filter(F.col("doc_id") < PROBE_BATCH_DOCS)
        )
        prefixes = None
        if pruned:
            prefixes = [
                r["dp"]
                for r in chunk_digests(batch, chunk_tokens=32)
                .select(F.substring("digest", 1, width).alias("dp"))
                .distinct()
                .collect()
            ]
        from usgs_lidar_spark.streaming.ingest import read_store_before

        seen = read_store_before(spark, store, 5, prefixes)
        row = seen.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.pmod(F.xxhash64("digest"), F.lit(1_000_000_007))
            ).alias("h"),
        ).collect()[0]
        return int(row["n"])

    return timed(name, tag, body)


def run_semdedup_sqrtk(sf_dir: str, tag: str) -> dict:
    """The SemDeDup scale knob measured: same corpus as the registered
    query (embeddings + 1.25x re-encodes) but k = ceil(sqrt(n)) seed
    cells instead of the fixed 8 — the standard SemDeDup sizing, which
    turns the sum-of-cell-squared candidate cost from n^2/k into
    ~n^1.5. The quantizer stays a driver-side list (k*dim floats) and
    assignment switches to ivf_assign's broadcast path past 64 cells —
    exactly what a real deployment does as the corpus grows."""
    import math

    from pyspark.sql import functions as F

    from usgs_lidar_spark.operators.similarity import semdedup_flags

    def body(spark) -> int:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        reups = emb.filter(F.col("vec_id") % 7 == 0).select(
            (F.col("vec_id") + 1000000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x * F.lit(1.25)).cast("float")
            ).alias("embedding"),
        )
        corpus = emb.unionByName(reups)
        n = corpus.count()
        k = math.ceil(math.sqrt(n))
        cents = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in emb.filter(F.col("vec_id") < k).collect()
        ]
        out = semdedup_flags(corpus, cents, threshold=0.99)
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.pmod(F.xxhash64(*out.columns), F.lit(1_000_000_007))
            ).alias("h"),
        ).collect()[0]
        return int(row["n"])

    return timed("semdedup_sqrtk", tag, body)


def run(name: str, sf_dir: str, tag: str) -> dict:
    from pyspark.sql import functions as F

    from usgs_lidar_spark.plans.queries import QUERIES

    def body(spark) -> int:
        df = QUERIES[name](spark, sf_dir)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007))
            ).alias("h"),
        ).collect()[0]
        return int(row["n"])

    return timed(name, tag, body)


def main() -> None:
    names = sys.argv[1:] or SCENARIOS
    build_sf1()
    timed("warmup", "0", lambda spark: spark.range(10).count())
    for name in names:
        if name == "semdedup_sqrtk":
            for tag, sf in (("1x", str(SF01)), ("10x", str(SF1))):
                run_semdedup_sqrtk(sf, tag)  # warm
                print(json.dumps(run_semdedup_sqrtk(sf, tag)), flush=True)
            continue
        if name == "ingest_probe":
            for tag, sf in (("1x", str(SF01)), ("10x", str(SF1))):
                for width, pruned in ((2, False), (2, True), (3, True)):
                    label = (
                        f"ingest_probe_w{width}_"
                        f"{'pruned' if pruned else 'full'}"
                    )
                    run_probe(label, sf, tag, width, pruned)  # warm
                    print(
                        json.dumps(run_probe(label, sf, tag, width, pruned)),
                        flush=True,
                    )
            continue
        for tag, sf in (("1x", str(SF01)), ("10x", str(SF1))):
            run(name, sf, tag)  # JIT warm, discarded
            print(json.dumps(run(name, sf, tag)), flush=True)


if __name__ == "__main__":
    main()
