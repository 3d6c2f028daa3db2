"""Round-13 scale measurements (SCALE.md): the hot-cell guard's MEASURED
skew behavior — the half of r11 item 1 that round 12 landed only as a
correctness parity test.

Two scenarios, both on deterministic synthetic Zipf corpora generated
DISTRIBUTIVELY (spark.range + xxhash64-seeded coordinates; no driver
loops, so the 10x corpus costs nothing to build):

  * hotcell_zipf — 80% of rows in one cell (Zipf head), within-cell
    vectors SIGN-DIVERSE on the first 8 dims (the sub_bits window):
    8 "weak" leading coordinates are pure ±1.0 noise, 8 "strong"
    trailing coordinates carry the cell direction. Every 5th row is a
    1.25x-scaled copy of its predecessor — a true dup that shares its
    source's signs exactly (positive scaling never flips a sign), so
    the guard provably loses nothing (the committed parity test) while
    the sub-block splits the hot cell ~uniformly over 2^8 buckets and
    Hamming<=1 multiprobe keeps ~(sub_bits+1)/2^sub_bits ~ 3.5% of its
    pairs. Guarded vs unguarded at 1x and 10x: the unguarded wall must
    go ~quadratic (the SCALE.md fixed-k lesson) while the guarded wall
    stays near-linear.

  * hotcell_degenerate — the guard's documented worst case, measured
    honestly: the hot cell is NEAR-IDENTICAL vectors (every coordinate
    base-dominated, perturbation 100x below magnitude), so all rows
    share ONE sign pattern, the sub-block collapses to a single
    bucket, and guarded cost degrades back to cell^2 exactly when
    duplication is most extreme. 1x vs 4x guarded: if wall grows
    ~quadratically (it must), the next rung is cap/representative-
    collapse — pick one representative per (cell, bucket) prefix when
    even the sub-block overflows — recorded in SCALE.md as the design
    follow-up, not silently.

Method identical to tools/scale_round11.py: warm second run reported,
results fully materialized via an all-column xxhash64 aggregate, pmod
to stay in int64 under ANSI mode.

Usage: python tools/scale_round13.py [hotcell_zipf hotcell_degenerate]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from tools.scale_round8 import timed  # noqa: E402

#: corpus sizes per scenario tag (rows before the every-5th dup copies
#: are counted — dups are IN the n, as scaled copies of row id-1).
ZIPF_N = {"1x": 1500, "10x": 15000}
DEGEN_N = {"1x": 3000, "4x": 12000}

#: ±1 strong-direction patterns, pairwise orthogonal (Hadamard rows).
BASES = [
    [1, 1, 1, 1, 1, 1, 1, 1],
    [1, -1, 1, -1, 1, -1, 1, -1],
    [1, 1, -1, -1, 1, 1, -1, -1],
]


def _u(src, salt: int):
    """Deterministic U(-0.5, 0.5) from (row source id, coordinate)."""
    from pyspark.sql import functions as F

    return (
        F.pmod(F.xxhash64(src, F.lit(salt)), F.lit(1000)).cast("double")
        / 1000.0
        - 0.5
    )


def zipf_corpus(spark, n: int, diverse: bool):
    """80/13/7 Zipf cell split. dim=16: coords 0-7 lead (the sub_bits
    window), coords 8-15 carry the cell direction. ``diverse=True`` puts
    pure ±1.0 noise in the leading coords (sign-diverse hot cell —
    the guard's design case); ``diverse=False`` makes every coordinate
    base-dominated with ~±0.005 noise (near-identical hot cell — the
    degenerate single-bucket case). Every 5th row is its predecessor
    scaled 1.25x (same cell, same signs, cosine 1: a true dup)."""
    from pyspark.sql import functions as F

    rows = spark.range(n).select(F.col("id").alias("vec_id"))
    is_dup = F.col("vec_id") % 5 == 4
    src = F.when(is_dup, F.col("vec_id") - 1).otherwise(F.col("vec_id"))
    r = F.pmod(F.xxhash64(src, F.lit(0)), F.lit(100))
    cell = F.when(r < 80, 0).when(r < 93, 1).otherwise(2)
    strong = F.element_at(
        F.array(*[F.array(*[F.lit(float(x)) for x in b]) for b in BASES]),
        cell + 1,
    )
    if diverse:
        # ±1.0 noise: random same-cell pairs sit at cos ~0.75, far from
        # the 0.99 threshold, so the only dup pairs are the scaled
        # copies (sign-identical by construction) and guarded == exact.
        lead = [_u(src, j + 1) * 2.0 for j in range(8)]
    else:
        lead = [F.lit(0.3) + _u(src, j + 1) / 100.0 for j in range(8)]
    noise = 0.1 if diverse else 0.01
    tail = [
        F.element_at(strong, j + 1) + _u(src, j + 9) * noise
        for j in range(8)
    ]
    scale = F.when(is_dup, F.lit(1.25)).otherwise(F.lit(1.0))
    return rows.select(
        "vec_id",
        F.array(*[(c * scale).cast("double") for c in lead + tail]).alias(
            "embedding"
        ),
    )


def run_hotcell(name: str, tag: str, n: int, diverse: bool,
                max_cell_size: int | None,
                max_bucket_size: int | None = None) -> dict:
    from pyspark.sql import functions as F

    from usgs_lidar_spark.operators.similarity import semdedup_flags

    cents = [
        (c, [0.0] * 8 + [float(x) for x in b]) for c, b in enumerate(BASES)
    ]

    def body(spark) -> int:
        out = semdedup_flags(
            zipf_corpus(spark, n, diverse),
            cents,
            threshold=0.99,
            max_cell_size=max_cell_size,
            sub_bits=8,
            max_bucket_size=max_bucket_size,
        )
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.pmod(F.xxhash64(*out.columns), F.lit(1_000_000_007))
            ).alias("h"),
        ).collect()[0]
        return int(row["n"])

    return timed(name, tag, body)


def synth_centroids(spark, k: int, dim: int = 64):
    """Deterministic synthetic quantizer as a DataFrame — xxhash64-seeded
    U(-0.5, 0.5) coordinates, generated distributively."""
    from pyspark.sql import functions as F

    return spark.range(k).select(
        F.col("id").alias("cid"),
        F.array(
            *[_u(F.col("id"), j + 1).alias(f"c{j}") for j in range(dim)]
        ).alias("cvec"),
    )


def run_two_level_ab(k: int, variant: str) -> dict:
    """Assignment wall at quantizer size k: flat one-row-broadcast
    `ivf_assign` vs `ivf_assign_two_level` (n_probe_coarse=1), corpus =
    sf0.1 embeddings replicated 10x (20k rows, dim 64). Flat cost per
    corpus row is k*dim HOF ops; two-level is ~2*sqrt(k)*dim plus one
    equi-join — the crossover this measures."""
    from pyspark.sql import functions as F

    from usgs_lidar_spark.operators.similarity import (
        derive_coarse_quantizer,
        ivf_assign,
        ivf_assign_two_level,
    )

    def body(spark) -> int:
        emb = spark.read.parquet(
            "/root/testdata/sf0.1/embeddings.parquet"
        ).select("vec_id", "embedding")
        reps = spark.range(10).select(F.col("id").alias("rep"))
        corpus = emb.crossJoin(F.broadcast(reps)).select(
            (F.col("vec_id") * 10 + F.col("rep")).alias("vec_id"),
            "embedding",
        )
        cdf = synth_centroids(spark, k).localCheckpoint()
        if variant == "flat":
            cents = [
                (int(r["cid"]), [float(x) for x in r["cvec"]])
                for r in cdf.collect()
            ]
            out = ivf_assign(corpus, cents)
        else:
            coarse = derive_coarse_quantizer(cdf)
            out = ivf_assign_two_level(corpus, cdf, coarse=coarse)
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64("vec_id", "__cid"),
                         F.lit(1_000_000_007))).alias("h"),
        ).collect()[0]
        return int(row["n"])

    return timed(f"assign_{variant}_k{k}", "20k_rows", body)


def run_semantic_decon(tag: str, reps: int, broadcast: bool) -> dict:
    """Semantic decontamination at 1x/10x corpus, FIXED benchmark (the
    real setting: the eval suite does not grow with the crawl). Corpus =
    sf0.1 embeddings replicated `reps`x under tiny per-replica rescales
    (cosine-invariant, so every replica of a leaked page stays a hit);
    bench = float32 x1.25 re-encodes of every 97th base vector (the
    registered query's construction). broadcast=True is the default
    zero-corpus-exchange plan; False is the cell-keyed shuffle-join
    fallback past the broadcast budget — both must scale ~linearly,
    and the broadcast form's shuffle bytes must stay ~0 at both
    scales (the packed bench side is the only thing that moves)."""
    from pyspark.sql import functions as F

    from usgs_lidar_spark.operators.similarity import semantic_contamination

    def body(spark) -> int:
        emb = spark.read.parquet(
            "/root/testdata/sf0.1/embeddings.parquet"
        ).select("vec_id", "embedding")
        rdf = spark.range(reps).select(F.col("id").alias("rep"))
        corpus = emb.crossJoin(F.broadcast(rdf)).select(
            (F.col("vec_id") * reps + F.col("rep")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: (
                    x * (F.lit(1.0) + F.col("rep").cast("double") * 1e-4)
                ).cast("float"),
            ).alias("embedding"),
        )
        bench = emb.filter(F.col("vec_id") % 97 == 0).select(
            F.transform(
                "embedding", lambda x: (x * F.lit(1.25)).cast("float")
            ).alias("embedding")
        )
        cents = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in emb.filter(F.col("vec_id") < 48).collect()
        ]
        out = semantic_contamination(
            corpus, bench, cents, threshold=0.99, broadcast_bench=broadcast
        )
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.pmod(
                    F.xxhash64("vec_id", "cid", "n_hits", "contaminated"),
                    F.lit(1_000_000_007),
                )
            ).alias("h"),
            F.sum(F.col("contaminated").cast("long")).alias("flagged"),
        ).collect()[0]
        print(f"#   flagged={row['flagged']}", flush=True)
        return int(row["n"])

    variant = "bcast" if broadcast else "shuffle"
    return timed(f"semantic_decon_{variant}", tag, body)


def run_hotbench(tag: str, reps: int, max_pack_size) -> dict:
    """Semantic decon under a GROWING clustered benchmark (the hot-pack
    guard's design case): corpus = sf0.1 embeddings (fixed), quantizer =
    the deliberately coarse fixed k=8 (hot packs by construction), bench
    = x1.25 re-encodes of every 3rd corpus vector replicated `reps`x
    under cosine-invariant rescales — sign patterns preserved, so every
    replica remains a true leak AND the pack stays sign-DIVERSE (one
    pattern per source row). Unguarded, every corpus row in a hot cell
    folds over the WHOLE pack (cost ~ corpus-in-cell x bench-in-cell);
    guarded, a row folds only over its Hamming<=1 pre-expanded pack
    (~(sub_bits+1)/2^sub_bits of it). Guarded wall should stay near-flat
    as the bench grows 10x; unguarded should grow ~linearly with it."""
    from pyspark.sql import functions as F

    from usgs_lidar_spark.operators.similarity import semantic_contamination

    def body(spark) -> int:
        emb = spark.read.parquet(
            "/root/testdata/sf0.1/embeddings.parquet"
        ).select("vec_id", "embedding")
        rdf = spark.range(reps).select(F.col("id").alias("rep"))
        bench = (
            emb.filter(F.col("vec_id") % 3 == 0)
            .crossJoin(F.broadcast(rdf))
            .select(
                F.transform(
                    "embedding",
                    lambda x: (
                        x * (F.lit(1.25) + F.col("rep").cast("double") * 1e-4)
                    ).cast("float"),
                ).alias("embedding")
            )
        )
        cents = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in emb.filter(F.col("vec_id") < 8).collect()
        ]
        out = semantic_contamination(
            emb, bench, cents, threshold=0.99,
            max_pack_size=max_pack_size, sub_bits=8,
        )
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.pmod(
                    F.xxhash64("vec_id", "cid", "n_hits", "contaminated"),
                    F.lit(1_000_000_007),
                )
            ).alias("h"),
            F.sum(F.col("contaminated").cast("long")).alias("flagged"),
        ).collect()[0]
        print(f"#   flagged={row['flagged']}", flush=True)
        return int(row["n"])

    label = "guarded" if max_pack_size is not None else "exact"
    return timed(f"hotbench_{label}", tag, body)


def main() -> None:
    names = sys.argv[1:] or ["hotcell_zipf", "hotcell_degenerate"]
    timed("warmup", "0", lambda spark: spark.range(10).count())
    if "hotcell_zipf" in names:
        for tag, n in ZIPF_N.items():
            for label, mcs in (("exact", None), ("guarded", 96)):
                nm = f"hotcell_zipf_{label}"
                run_hotcell(nm, tag, n, True, mcs)  # warm
                print(
                    json.dumps(run_hotcell(nm, tag, n, True, mcs)),
                    flush=True,
                )
    if "hotcell_degenerate" in names:
        for tag, n in DEGEN_N.items():
            for label, mbs in (("guarded", None), ("collapsed", 64)):
                nm = f"hotcell_degenerate_{label}"
                run_hotcell(nm, tag, n, False, 96, mbs)  # warm
                print(
                    json.dumps(run_hotcell(nm, tag, n, False, 96, mbs)),
                    flush=True,
                )
    if "hotbench" in names:
        for tag, reps in (("1x", 1), ("10x", 10)):
            for mps in (None, 16):
                run_hotbench(tag, reps, mps)  # warm
                print(json.dumps(run_hotbench(tag, reps, mps)), flush=True)
    if "semantic_decon" in names:
        for tag, reps in (("1x", 1), ("10x", 10)):
            for broadcast in (True, False):
                run_semantic_decon(tag, reps, broadcast)  # warm
                print(
                    json.dumps(run_semantic_decon(tag, reps, broadcast)),
                    flush=True,
                )
    if "two_level_ab" in names:
        # k stops at 1024: flat already loses at k=64 on this HOF-bound
        # corpus and its wall grows linearly in k (interpreted transform
        # over k candidate structs per row) — larger flat points are
        # minutes of no-new-information.
        for k in (64, 1024):
            for variant in ("flat", "two_level"):
                run_two_level_ab(k, variant)  # warm
                print(json.dumps(run_two_level_ab(k, variant)), flush=True)


if __name__ == "__main__":
    main()
