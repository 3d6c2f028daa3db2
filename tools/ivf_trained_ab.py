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

Usage: python tools/ivf_trained_ab.py   # one JSON line per variant
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


def build(spark, variant: str, path: str) -> None:
    from pyspark.sql import functions as F

    from usgs_lidar_spark.operators.similarity import (
        kmeans_train_centroids,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
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

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
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
    for variant in ("seed", "trained"):
        path = str(WORK / f"ivf_ab_{variant}")
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
            probe_input_mb=round(input_bytes(log_dir) / 1e6, 2),
            index_mb=round(dir_bytes(Path(path)) / 1e6, 2),
        )
        print(json.dumps(stats), flush=True)


if __name__ == "__main__":
    main()
