"""Trained-vs-seed IVF A/B (SCALE.md, VERDICT r9 item 2): what the
trained quantizer actually buys at serving time.

For sf0.1 (2,000 vectors, 20 query probes, k=10, n_probe=2, 8 cells):
build BOTH persisted indexes — cells seeded from the first 8 corpus
vectors (the `sim_topk_ivf` quantizer) vs cells TRAINED with two exact
Lloyd iterations (`kmeans_train_centroids`, the `sim_ivf_trained_serving`
quantizer) — then for each report:

  * mean recall@10 of the probe vs brute-force exact cosine top-10;
  * cell-occupancy balance (max/mean cell size — a skewed quantizer
    makes one probe read most of the corpus, the thing training fixes);
  * bytes of index the pruned probe scan READ (event-log Input Metrics)
    vs the index's total size on disk.

Usage: python tools/ivf_trained_ab.py                 # sf0.1 embeddings
       python tools/ivf_trained_ab.py clustered [n_probe]   # mixture

The second mode (round 11, VERDICT r10 item 2) answers the question the
sf0.1 run provably cannot: the synthetic sf embeddings are near-uniform,
so training showed a cell-balance win but a FLAT recall — uniform data
has no cluster structure for Lloyd iterations to discover. The
clustered mode builds a DETERMINISTIC mixture-of-Gaussians corpus
(numpy legacy RandomState(42) — frozen by NEP 19, reproducible across
versions: 16 well-separated centers in R^64, 2000 points ordered
CLUSTER-MAJOR, sigma=0.05 vs unit-scale centers) and re-runs the same
A/B. Cluster-major order makes first-k seeding pathological-realistic
(sorted/crawl-ordered corpora do exactly this): all 8 seed centroids
land inside cluster 0, so the seed quantizer slices the space
degenerately, while two exact Lloyd iterations walk the centroids out
to the real mass — the recall@10 lift at FIXED n_probe is the
datapoint a user deciding "should I train the quantizer" needs.
Queries: every 100th vector (one per 100-point run, spanning all 16
clusters).
"""

from __future__ import annotations

import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from tools.scale_round8 import dir_bytes, input_bytes  # noqa: E402
from tools.scale_experiment import make_session  # noqa: E402
from tools.sf1_bench import WORK  # noqa: E402

SF01 = "/root/testdata/sf0.1"
K, N_PROBE, N_QUERIES = 10, 2, 20

#: set by main() — "uniform" reads sf0.1, "clustered" reads the fixture.
MODE = "uniform"
CLUSTERED_PATH = WORK / "clustered_emb.parquet"
N_CLUSTERS, N_VECS, DIM, SIGMA = 16, 2000, 64, 0.05


def corpus_df(spark):
    if MODE == "uniform":
        return spark.read.parquet(f"{SF01}/embeddings.parquet")
    return spark.read.parquet(str(CLUSTERED_PATH))


def query_filter(col):
    from pyspark.sql import functions as F

    if MODE == "uniform":
        return col < N_QUERIES
    # clustered corpus is cluster-major: every 100th vector spans all
    # 16 clusters (2000/20 = 100).
    return col % 100 == 0


def build_clustered_fixture(spark) -> None:
    """Deterministic mixture-of-Gaussians corpus: 16 centers drawn
    uniform in [-1, 1]^64 (unit scale), 125 points per cluster at
    sigma=0.05 — tight, well-separated clusters — ordered CLUSTER-MAJOR
    so first-k seeding is degenerate (all seeds in cluster 0). Legacy
    RandomState keeps the draw bit-stable across numpy versions."""
    import numpy as np

    if CLUSTERED_PATH.exists():
        return
    rng = np.random.RandomState(42)
    centers = rng.uniform(-1.0, 1.0, size=(N_CLUSTERS, DIM))
    per = N_VECS // N_CLUSTERS
    rows = []
    vid = 0
    for c in range(N_CLUSTERS):
        pts = centers[c] + SIGMA * rng.standard_normal((per, DIM))
        for p in pts:
            rows.append((vid, [float(x) for x in p.astype(np.float32)], c))
            vid += 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).repartition(8).write.mode("overwrite").parquet(str(CLUSTERED_PATH))


def build(spark, variant: str, path: str) -> None:
    from pyspark.sql import functions as F

    from usgs_lidar_spark.operators.similarity import (
        kmeans_train_centroids,
        write_ivf_index,
    )

    emb = corpus_df(spark)
    seeds = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ]
    cents = (
        seeds
        if variant == "seed"
        else kmeans_train_centroids(emb, seeds, n_iter=2)
    )
    write_ivf_index(emb, cents, path)


def probe(spark, path: str) -> dict:
    from pyspark.sql import functions as F

    from usgs_lidar_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk_from_index,
        recall_at_k,
    )

    emb = corpus_df(spark)
    queries = emb.filter(query_filter(F.col("vec_id"))).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = ivf_topk_from_index(
        spark, path, queries, k=K, n_probe=N_PROBE
    )
    exact = cosine_topk_bruteforce(emb, queries, k=K)
    rec = recall_at_k(approx, exact).agg(
        F.avg("recall").alias("r"), F.count(F.lit(1)).alias("nq")
    ).collect()[0]
    occ = [
        int(r["n"])
        for r in spark.read.parquet(path)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    return {
        "mean_recall": round(float(rec["r"]), 4),
        "n_queries": int(rec["nq"]),
        "cell_max": max(occ),
        "cell_mean": round(sum(occ) / len(occ), 1),
        "n_cells_occupied": len(occ),
    }


def main() -> None:
    global MODE, N_PROBE
    if len(sys.argv) > 1:
        if sys.argv[1] not in ("uniform", "clustered"):
            raise SystemExit(f"unknown mode {sys.argv[1]!r}")
        MODE = sys.argv[1]
    if len(sys.argv) > 2:
        N_PROBE = int(sys.argv[2])
    if MODE == "clustered":
        spark = make_session("ivf-ab-fixture", WORK / "log_ab_fixture")
        build_clustered_fixture(spark)
        spark.stop()
    for variant in ("seed", "trained"):
        path = str(WORK / f"ivf_ab_{MODE}_{variant}")
        shutil.rmtree(path, ignore_errors=True)
        spark = make_session(f"ivf-ab-build-{variant}", WORK / f"log_ab_b_{variant}")
        build(spark, variant, path)
        spark.stop()
        # fresh event-logged session so input bytes cover ONLY the probe
        log_dir = WORK / f"log_ab_p_{variant}"
        shutil.rmtree(log_dir, ignore_errors=True)
        spark = make_session(f"ivf-ab-probe-{variant}", log_dir)
        stats = probe(spark, path)
        spark.stop()
        stats.update(
            variant=variant,
            mode=MODE,
            n_probe=N_PROBE,
            probe_input_mb=round(input_bytes(log_dir) / 1e6, 2),
            index_mb=round(dir_bytes(Path(path)) / 1e6, 2),
        )
        print(json.dumps(stats), flush=True)


if __name__ == "__main__":
    main()
