"""Round-14 scale measurements (SCALE.md).

Scenarios (each generated DISTRIBUTIVELY — spark.range + xxhash64-seeded
expressions, no driver loops — and measured warm, second run reported,
results fully materialized via an all-column xxhash64 aggregate):

  * dhash_neardup — the perceptual near-dup path end to end
    (`fake_dhash_image` -> `near_dup_media_by_dhash` -> min-label CC)
    over a synthetic media corpus where every 5th payload is a
    one-middle-byte perturbation of its predecessor (the mm_near_dedup
    planted-duplicate shape, at scale). 1x vs 10x: the hash pass is
    map-only and the pair search is band-bucketed, so wall must stay
    near-linear and shuffled bytes must be (id, 4-band)-row-sized —
    payload bytes never appear in the shuffle (the payloads here are
    ~150 B; a real image corpus is 5-6 orders heavier per row, which
    is exactly why only-hashes-move is the design line).

  * decon_jammed_bench — the documented jammed-pack regime of
    `semantic_contamination` (an internally-duplicated benchmark: ONE
    exemplar re-encoded into 60% of the bench rows, all sharing one
    sign pattern, so the hot-pack guard's sub-block collapses into a
    single pack) measured with and without the compositional fix the
    round-13 docstring argued but never pinned: SemDeDup the bench
    first (`semdedup_flags`, keepers only) and run decon against the
    deduped bench. 1x vs 10x BENCH duplication at fixed corpus: the
    unfixed fold cost grows with the jammed pack (~linear in bench
    copies, paid per corpus row in the hot cell), the fixed one stays
    flat. Decision equality of the fix is pinned by the registered
    query `pipe_decon_dedup_bench`'s oracle, not here.

Usage: python tools/scale_round14.py [dhash_neardup decon_jammed_bench]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_round8 import WORK, timed  # noqa: E402

#: media corpus sizes (rows; every 5th row is a perturbed near-copy).
DHASH_N = {"1x": 20_000, "10x": 200_000}

#: decon sizes: fixed corpus, growing internally-duplicated bench.
DECON_CORPUS = 30_000
DECON_BENCH = {"1x": 2_000, "10x": 20_000}


def _media(spark, n: int, offset: int = 0, chars: int = 150):
    """Synthetic media frame (media_id, content): 150 lowercase chars
    per payload, xxhash64-derived; every 5th row repeats its
    predecessor's payload with the middle byte swapped for '~' — a
    perceptual near-dup the exact-content tier cannot catch.
    ``offset`` shifts BOTH the ids and the payload seeds (ids stay
    multiples of 5 apart across calls), so disjoint offset ranges
    generate disjoint payload populations — what the per-batch
    ingest scenario needs; ``chars`` sizes the payload (the ingest
    scenario uses heavier payloads so the one-shot comparison pays a
    realistic re-read cost)."""
    base = spark.range(n).select(
        (F.col("id") + int(offset)).alias("media_id"),
        # rows 5k and 5k+? share a seed: every 5th row re-derives its
        # PREDECESSOR's text, then perturbs one middle char.
        (
            F.when(F.col("id") % 5 == 0, F.col("id") - 1)
            .otherwise(F.col("id"))
            + int(offset)
        ).alias("seed"),
    )
    half = int(chars) // 2
    text = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(1), F.lit(int(chars))),
            lambda i: F.char(
                F.lit(97) + F.pmod(F.xxhash64(F.col("seed"), i), F.lit(26))
            ),
        ),
    )
    perturbed = F.concat(
        F.substring(text, 1, half - 1),
        F.lit("~"),
        F.substring(text, half + 1, int(chars) - half),
    )
    return base.select(
        "media_id",
        F.encode(
            F.when(F.col("media_id") % 5 == 0, perturbed).otherwise(text),
            "UTF-8",
        ).alias("content"),
    )


def dhash_neardup(tag: str, n: int) -> dict:
    from usgs_lidar_spark.multimodal import (
        fake_dhash_image,
        near_dup_media_by_dhash,
    )
    from usgs_lidar_spark.operators.graph import collapse_clusters

    def run(spark) -> int:
        media = _media(spark, n).localCheckpoint()  # exclude generation
        hashes = fake_dhash_image(media)
        pairs = near_dup_media_by_dhash(hashes, max_hamming=3)
        out = collapse_clusters(
            media.select("media_id"), pairs,
            id_col="media_id", pair_a="id_a", pair_b="id_b",
        )
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.pmod(F.xxhash64(*out.columns), F.lit(1_000_000_007))
            ).alias("h"),
            F.sum(F.col("is_kept").cast("long")).alias("kept"),
        ).collect()[0]
        print(f"    [{tag}] rows={row['n']} kept={row['kept']}")
        return int(row["n"])

    return timed("dhash_neardup", tag, run)


def _decon_frames(spark, n_corpus: int, n_bench: int):
    """Corpus: 80% unit-ish random 16-dim vectors spread over sign
    space, 20% rescaled copies of ONE leaked exemplar D (the realistic
    contamination case: the corpus actually contains mass near the
    leaked direction, all sharing D's sign pattern). Bench: 40%
    diverse re-encodes of random corpus rows + 60% copies of D
    (rescaled per copy — cosine exactly 1 to each other, one shared
    cell AND one sign pattern: the jammed pack the hot-pack guard's
    sub-block cannot split). Raw decon then pays |jam pack| fold work
    PER leaked corpus row; bench-dedup-first pays 1."""
    dims = list(range(16))
    exemplar = [0.5 + 0.02 * d for d in dims]
    rnd = F.array(
        *[
            (
                F.pmod(F.xxhash64(F.col("id"), F.lit(d)), F.lit(2001))
                - 1000
            ).cast("double")
            / 1000.0
            for d in dims
        ]
    )
    leaked = F.array(
        *[
            F.lit(exemplar[d]) * (1.0 + F.col("id").cast("double") / 1e8)
            for d in dims
        ]
    )
    corpus = spark.range(n_corpus).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") % 5 == 0, leaked).otherwise(rnd).alias(
            "embedding"
        ),
    )
    n_div = max(1, (n_bench * 2) // 5)
    diverse = spark.range(n_div).select(
        (F.col("id") * 97 % n_corpus).alias("src"),
        F.col("id").alias("bid"),
    )
    diverse = diverse.join(
        corpus.select(F.col("vec_id").alias("src"), "embedding"), "src"
    ).select(
        "bid",
        F.transform("embedding", lambda x: x * 1.25).alias("embedding"),
    )
    jam = spark.range(n_div, n_bench).select(
        F.col("id").alias("bid"),
        F.array(
            *[
                F.lit(exemplar[d])
                * (1.25 + F.col("id").cast("double") / 1e7)
                for d in dims
            ]
        ).alias("embedding"),
    )
    return corpus, diverse.unionByName(jam)


def decon_jammed_bench(tag: str, n_bench: int) -> dict:
    from usgs_lidar_spark.operators.similarity import (
        semantic_contamination,
        semdedup_flags,
    )

    def run(spark) -> int:
        corpus, bench = _decon_frames(spark, DECON_CORPUS, n_bench)
        corpus = corpus.localCheckpoint()
        bench = bench.localCheckpoint()
        cents = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in corpus.limit(24).collect()
        ]

        def flags_hash(b) -> tuple[int, int]:
            out = semantic_contamination(
                corpus, b, cents, threshold=0.99,
                max_pack_size=64, sub_bits=8,
            )
            row = out.agg(
                F.sum(F.col("contaminated").cast("long")).alias("c"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]
            return int(row["c"]), int(row["n"])

        import time

        t0 = time.perf_counter()
        c_raw, n = flags_hash(bench)
        t_raw = time.perf_counter() - t0

        t0 = time.perf_counter()
        # The bench self-dedup MUST run under the r13 representative
        # collapse: the jammed exemplar shares one cell AND one sign
        # pattern, so unguarded within-cell search is copies² (measured:
        # 277 s at 10x where the guarded form is seconds), while the
        # collapse keeps pair work linear and the keep set exact in
        # this regime (r13's pinned contract).
        bflags = semdedup_flags(
            bench.select(
                F.col("bid").alias("vec_id"), "embedding"
            ),
            cents, threshold=0.99,
            max_cell_size=64, sub_bits=8, max_bucket_size=16,
        )
        keepers = (
            bench.join(
                bflags.filter("keep").select(
                    F.col("vec_id").alias("bid")
                ),
                "bid",
            )
        )
        c_fix, _ = flags_hash(keepers)
        t_fix = time.perf_counter() - t0
        print(
            f"    [{tag}] corpus={DECON_CORPUS} bench={n_bench} "
            f"raw: {t_raw:.2f}s flagged={c_raw} | "
            f"dedup-first: {t_fix:.2f}s flagged={c_fix} "
            f"decision_equal={c_raw == c_fix}"
        )
        return n

    return timed("decon_jammed_bench", tag, run)


def dhash_combo(tag: str, n: int) -> dict:
    """The wide-hash band-COMBINATION variant of dhash_neardup: 128-bit
    `fake_dhash_image_wide` + `near_dup_media_by_dhash_combo` (8 bands,
    combo 2, radius 6). Exploded rows are C(8,2)=7x the single-band
    join's per item, but bucket keys are 32 bits — the trade that wins
    once uniform 16-bit buckets hold multiple rows (corpus in the low
    millions; analytic crossover, the measured claim here is that the
    combo plan itself stays linear and affordable at these sizes)."""
    from usgs_lidar_spark.multimodal import (
        fake_dhash_image_wide,
        near_dup_media_by_dhash_combo,
    )
    from usgs_lidar_spark.operators.graph import collapse_clusters

    def run(spark) -> int:
        media = _media(spark, n).localCheckpoint()
        hashes = fake_dhash_image_wide(media, n_bands=8)
        pairs = near_dup_media_by_dhash_combo(
            hashes, max_hamming=6, n_bands=8, combo=2
        )
        out = collapse_clusters(
            media.select("media_id"), pairs,
            id_col="media_id", pair_a="id_a", pair_b="id_b",
        )
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.pmod(F.xxhash64(*out.columns), F.lit(1_000_000_007))
            ).alias("h"),
            F.sum(F.col("is_kept").cast("long")).alias("kept"),
        ).collect()[0]
        print(f"    [{tag}] rows={row['n']} kept={row['kept']}")
        return int(row["n"])

    return timed("dhash_combo", tag, run)


def main() -> None:
    which = sys.argv[1:] or ["dhash_neardup", "decon_jammed_bench"]
    if "dhash_neardup" in which:
        for tag, n in DHASH_N.items():
            print(json.dumps(dhash_neardup(tag, n)), flush=True)
    if "decon_jammed_bench" in which:
        for tag, n in DECON_BENCH.items():
            print(json.dumps(decon_jammed_bench(tag, n)), flush=True)
    if "dhash_combo" in which:
        for tag, n in DHASH_N.items():
            print(json.dumps(dhash_combo(tag, n)), flush=True)
    if "media_ingest" in which:
        media_ingest_incremental()



def media_ingest_incremental(
    n_batches: int = 5, batch_rows: int = 20_000, chars: int = 4_000
):
    """Incremental media near-dup ingest vs re-cluster-from-scratch:
    drive `media_neardup_ingest_writer` directly (batch loop, no stream
    harness — the writer is the unit under test) over ``n_batches``
    equal media batches and record PER-BATCH wall, then compare the
    LAST batch's cost against a one-shot `collapse_clusters` over the
    full accumulated corpus (what a non-incremental pipeline would pay
    on every arrival). The incremental claim: per-batch wall stays
    ~flat as history grows (hash pass is batch-sized, the banded probe
    reads only prefix-matched history index rows, contracted CC is
    O(touched + batch)), while the one-shot cost grows with the corpus.
    Every 5th row inside a batch is a near-copy of its predecessor
    (intra-batch pairs) and each batch's first 1,000 rows are
    re-uploads of the PREVIOUS batch's first 1,000 (cross-batch
    merges), so the incremental fold genuinely exercises history."""
    import shutil as _sh
    import time

    from pyspark.sql import functions as FF

    from tools.scale_experiment import make_session
    from usgs_lidar_spark.multimodal import (
        fake_dhash_image,
        near_dup_media_by_dhash,
    )
    from usgs_lidar_spark.operators.graph import collapse_clusters
    from usgs_lidar_spark.streaming.media_ingest import (
        media_neardup_ingest_writer,
    )

    work = WORK / "media_ingest"
    _sh.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)
    spark = make_session("media-ingest-scale", work / "log")
    writer = media_neardup_ingest_writer(
        str(work / "store"), str(work / "labels"), max_hamming=3,
        dp_buckets=16,
    )

    def batch_df(b: int):
        base = _media(
            spark, batch_rows, offset=b * batch_rows, chars=chars
        ).select("media_id", "content")
        if b == 0:
            return base
        # the batch's LAST 1,000 ids instead re-upload the PREVIOUS
        # batch's first 1,000 payloads byte-for-byte — guaranteed
        # cross-batch merges the incremental fold must perform.
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
    # one-shot over the full corpus (what every arrival would cost
    # without the incremental fold)
    full = None
    for b in range(n_batches):
        d = batch_df(b)
        full = d if full is None else full.unionByName(d)
    full = full.localCheckpoint()
    t0 = time.perf_counter()
    one = collapse_clusters(
        full.select("media_id"),
        near_dup_media_by_dhash(fake_dhash_image(full), max_hamming=3),
        id_col="media_id", pair_a="id_a", pair_b="id_b",
    )
    n_one = one.count()
    t_one = time.perf_counter() - t0
    # parity: drained labels == one-shot labels
    drained = spark.read.parquet(
        str(work / "labels" / f"batch_id={n_batches - 1}")
    )
    got = {(r["id"], r["label"]) for r in drained.collect()}
    want = {(r["media_id"], r["cluster_id"]) for r in one.collect()}
    print(
        json.dumps(
            {
                "scenario": "media_ingest_incremental",
                "batch_rows": batch_rows,
                "per_batch_sec": walls,
                "oneshot_full_corpus_sec": round(t_one, 2),
                "corpus_rows": n_one,
                "drain_equals_oneshot": got == want,
            }
        ),
        flush=True,
    )
    spark.stop()

if __name__ == "__main__":
    main()
