"""Round-14 A/B (SCALE.md): stride vs TRAINED coarse split, recall/cost
at n_probe_coarse in {1, 2, 4, all} — r13 verdict item 3 (the round-11
trained-IVF A/B shape, one level up).

Fixture: a CLUMPED fine quantizer — 240 fine centroids living in 24
well-separated clumps of 10, with cid order decorrelated from clump
membership (clump = xxhash(cid) % 24), so the stride split's evenly-
by-cid picks land on clumps at random while Lloyd iterations over the
centroid frame recover the clump structure. Corpus rows sit near clump
centers (noise well inside the inter-clump distance), so the flat
assignment is clump-faithful and coarse-split quality directly decides
how often probe-p finds the right pack.

Metric: agreement = fraction of corpus rows whose two-level assignment
equals flat `ivf_assign` (the exact answer), plus wall seconds per
variant. Probe-all must be 1.0 for BOTH methods (the pinned bit-exact
contract); the interesting rows are p < all.

Usage: python tools/coarse_trained_ab.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

N_CORPUS = 40_000
N_FINE = 240
N_CLUMPS = 24
DIM = 16


def build(spark):
    from usgs_lidar_spark.operators.similarity import ivf_assign

    def clump_center(key_col):
        # ±1 coordinates hashed from the clump id: well-separated
        # directions (expected pairwise cosine 0).
        return F.array(
            *[
                F.when(
                    F.pmod(F.xxhash64(key_col, F.lit(d)), F.lit(2)) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
                for d in range(DIM)
            ]
        )

    fine = spark.range(N_FINE).select(
        F.col("id").alias("cid"),
        F.pmod(F.xxhash64(F.col("id"), F.lit("clump")), F.lit(N_CLUMPS))
        .alias("__g"),
    )
    fine = fine.select(
        "cid",
        F.zip_with(
            clump_center(F.col("__g")),
            F.array(
                *[
                    (
                        F.pmod(
                            F.xxhash64(F.col("cid"), F.lit(1000 + d)),
                            F.lit(201),
                        )
                        - 100
                    ).cast("double")
                    / 2000.0
                    for d in range(DIM)
                ]
            ),
            lambda c, o: c + o,
        ).alias("cvec"),
    ).localCheckpoint()
    corpus = spark.range(N_CORPUS).select(
        F.col("id").alias("vec_id"),
        F.pmod(F.xxhash64(F.col("id"), F.lit("row")), F.lit(N_CLUMPS))
        .alias("__g"),
    )
    corpus = corpus.select(
        "vec_id",
        F.zip_with(
            clump_center(F.col("__g")),
            F.array(
                *[
                    (
                        F.pmod(
                            F.xxhash64(F.col("vec_id"), F.lit(2000 + d)),
                            F.lit(201),
                        )
                        - 100
                    ).cast("double")
                    / 1000.0
                    for d in range(DIM)
                ]
            ),
            lambda c, o: c + o,
        ).alias("embedding"),
    ).localCheckpoint()
    fine_list = [
        (int(r["cid"]), [float(x) for x in r["cvec"]])
        for r in fine.collect()
    ]
    flat = ivf_assign(corpus, fine_list).select(
        "vec_id", F.col("__cid").alias("flat_cid")
    ).localCheckpoint()
    return corpus, fine, flat


def main() -> None:
    from tools.scale_experiment import make_session
    from usgs_lidar_spark.operators.similarity import (
        derive_coarse_quantizer,
        ivf_assign_two_level,
    )

    work = Path("/tmp/coarse_ab_logs")
    spark = make_session("coarse-trained-ab", work)
    corpus, fine, flat = build(spark)
    # Round-15 grid: seeding x Lloyd iterations (it0 = raw seeds; the
    # round-14 rows are stride_it0 ("stride") and stride_it2 ("trained")).
    coarses = {}
    for seeding in ("stride", "kmeanspp"):
        for it in (0, 1, 2):
            coarses[f"{seeding}_it{it}"] = derive_coarse_quantizer(
                fine,
                method=("stride" if it == 0 else "trained"),
                n_iter=it,
                seeding=seeding,
            )
    for method, coarse in coarses.items():
        for p in (1, 2, 4, len(coarse)):
            # warmup compiles the plan; timed second run
            for timed in (False, True):
                t0 = time.perf_counter()
                two = ivf_assign_two_level(
                    corpus, fine, coarse=coarse, n_probe_coarse=p
                ).select("vec_id", F.col("__cid").alias("two_cid"))
                row = (
                    two.join(flat, "vec_id")
                    .agg(
                        F.avg(
                            (F.col("two_cid") == F.col("flat_cid")).cast(
                                "double"
                            )
                        ).alias("agree"),
                        F.count(F.lit(1)).alias("n"),
                    )
                    .collect()[0]
                )
                dt = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "method": method,
                        "n_probe_coarse": p,
                        "agree": round(float(row["agree"]), 4),
                        "n": int(row["n"]),
                        "sec": round(dt, 2),
                    }
                ),
                flush=True,
            )
    spark.stop()


def seed_batch_ab() -> None:
    """Round-16 (r15 verdict item 6): the kmeanspp seeding's
    driver-coordinated JOB COUNT and wall at batch_m in {1, 4, 16},
    plus the downstream probe-1 agreement of the raw-seed coarse —
    the tournament's pool-local picks must stay in the exact-seeding
    quality band while cutting the sequential scans ~m-fold."""
    from tools.scale_experiment import make_session
    from usgs_lidar_spark.operators.similarity import (
        derive_coarse_quantizer,
        ivf_assign_two_level,
        kmeanspp_seed_centroids,
    )

    work = Path("/tmp/coarse_ab_logs_batch")
    spark = make_session("kmeanspp-batch-ab", work)
    corpus, fine, flat = build(spark)
    sc = spark.sparkContext

    def n_jobs() -> int:
        return len(sc.statusTracker().getJobIdsForGroup(None))

    def probe1(coarse) -> float:
        row = (
            ivf_assign_two_level(
                corpus, fine, coarse=coarse, n_probe_coarse=1
            )
            .select("vec_id", F.col("__cid").alias("two_cid"))
            .join(flat, "vec_id")
            .agg(
                F.avg(
                    (F.col("two_cid") == F.col("flat_cid")).cast("double")
                ).alias("agree")
            )
            .collect()[0]
        )
        return round(float(row["agree"]), 4)

    g = 16  # ceil(sqrt(240)), the two-level tier's default
    for m in (1, 4, 16):
        kmeanspp_seed_centroids(fine, g, batch_m=m)  # warmup (plan JIT)
        j0 = n_jobs()
        t0 = time.perf_counter()
        seeds = kmeanspp_seed_centroids(fine, g, batch_m=m)
        dt = time.perf_counter() - t0
        jobs = n_jobs() - j0
        trained = derive_coarse_quantizer(
            fine, method="trained", n_iter=1, seeding="kmeanspp",
            seed_batch_m=m,
        )
        print(
            json.dumps(
                {
                    "batch_m": m,
                    "n_seeds": len(seeds),
                    "spark_jobs": jobs,
                    "seed_sec": round(dt, 2),
                    "probe1_agree": probe1(seeds),
                    "probe1_agree_plus1lloyd": probe1(trained),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    if "--batch" in sys.argv:
        seed_batch_ab()
    else:
        main()
