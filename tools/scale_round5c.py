"""10x scale points for the round-5-continuation operators (SCALE.md):
duplicate_ngram_spans, sq8_topk, cosine_range_search_lsh, and
pagerank_fixed, at 1x (sf0.1) vs 10x replicas under /tmp.

Reuses tools/scale_experiment.py's session/event-log/shuffle accounting
and its documents/embeddings replicas (rotation / rescale semantics
documented there — the 10x documents' pair graph DENSIFIES, a
harder-than-linear input). lineitem replicas offset l_orderkey per
replica while keeping part keys, so the co-purchase pair graph also
densifies: per-part support grows ~10x, pair count grows superlinearly.
Reported as measured, not as an independent-replica approximation.

Usage: python tools/scale_round5c.py [factor]   (default 10)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from pyspark.sql import functions as F  # noqa: E402

from scale_experiment import (  # noqa: E402
    SF_DIR,
    WORK,
    build_replicas,
    make_session,
    shuffle_bytes,
)


def _finish(spark, log_dir: Path, tag: str, op: str, t0: float, n: int) -> dict:
    wall = time.time() - t0
    spark.stop()
    rd, wr = shuffle_bytes(log_dir)
    return {
        "op": op,
        "tag": tag,
        "wall_s": round(wall, 2),
        "rows": n,
        "shuffle_read_mb": round(rd / 1e6, 1),
        "shuffle_write_mb": round(wr / 1e6, 1),
    }


def run_substring_spans(docs_path: str, tag: str) -> dict:
    from usgs_lidar_spark.operators.dedup import duplicate_ngram_spans

    log = WORK / f"log_spans_{tag}"
    spark = make_session(f"spans-{tag}", log)
    t0 = time.time()
    docs = spark.read.parquet(docs_path)
    out = duplicate_ngram_spans(docs, "text", "doc_id", n=8, min_docs=2)
    # NOT count(): the final left join has a unique right key, so count()
    # join-eliminates the whole dup-detection subtree and times only the
    # map-side totals. Summing the dup columns forces the real plan.
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_dup_grams").alias("d"),
        F.sum("dup_tokens_covered").alias("c"),
    ).collect()[0]
    return _finish(spark, log, tag, "duplicate_ngram_spans", t0, int(row["n"]))


def run_sq8(emb_path: str, tag: str) -> dict:
    from usgs_lidar_spark.operators.similarity import sq8_bounds, sq8_topk

    log = WORK / f"log_sq8_{tag}"
    spark = make_session(f"sq8-{tag}", log)
    t0 = time.time()
    emb = spark.read.parquet(emb_path)
    mins, scales = sq8_bounds(emb, "embedding")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n = sq8_topk(emb, q, mins, scales, k=5, rerank=25).count()
    return _finish(spark, log, tag, "sq8_topk_rerank", t0, n)


def run_range_lsh(emb_path: str, tag: str) -> dict:
    from usgs_lidar_spark.operators.similarity import cosine_range_search_lsh

    log = WORK / f"log_range_{tag}"
    spark = make_session(f"range-{tag}", log)
    t0 = time.time()
    emb = spark.read.parquet(emb_path)
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n = cosine_range_search_lsh(emb, q, threshold=0.30, n_bits=8).count()
    return _finish(spark, log, tag, "cosine_range_search_lsh", t0, n)


def _lineitem_replica(factor: int) -> Path:
    out = WORK / f"lineitem_x{factor}.parquet"
    if (out / "_SUCCESS").exists():
        return out
    spark = make_session("li-build", WORK / "log_li_build")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    n_ok = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    parts = [li]
    for k in range(1, factor):
        parts.append(li.withColumn("l_orderkey", F.col("l_orderkey") + k * n_ok))
    d = parts[0]
    for p in parts[1:]:
        d = d.unionByName(p)
    d.repartition(32).write.mode("overwrite").parquet(str(out))
    spark.stop()
    return out


def run_pagerank(li_path: str, tag: str) -> dict:
    from usgs_lidar_spark.operators.graph import pagerank_fixed

    log = WORK / f"log_pr_{tag}"
    spark = make_session(f"pr-{tag}", log)
    t0 = time.time()
    li = spark.read.parquet(li_path).select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).alias("s"))
        .filter(F.col("s") >= 2)
    )
    edges = pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    n = pagerank_fixed(edges, iterations=3).count()
    return _finish(spark, log, tag, "pagerank_fixed", t0, n)


def run_triangles(li_path: str, tag: str) -> dict:
    from usgs_lidar_spark.operators.graph import triangle_count

    log = WORK / f"log_tri_{tag}"
    spark = make_session(f"tri-{tag}", log)
    t0 = time.time()
    li = spark.read.parquet(li_path).select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("s"))
        .filter(F.col("s") >= 2)
        .select("src", "dst")
    )
    n = triangle_count(edges).count()
    return _finish(spark, log, tag, "triangle_count", t0, n)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    WORK.mkdir(parents=True, exist_ok=True)
    build_replicas(factor)
    li10 = _lineitem_replica(factor)
    scenarios = [
        lambda: run_substring_spans(f"{SF_DIR}/documents.parquet", "1x"),
        lambda: run_substring_spans(
            str(WORK / f"documents_x{factor}.parquet"), f"{factor}x"
        ),
        lambda: run_sq8(f"{SF_DIR}/embeddings.parquet", "1x"),
        lambda: run_sq8(str(WORK / f"embeddings_x{factor}.parquet"), f"{factor}x"),
        lambda: run_range_lsh(f"{SF_DIR}/embeddings.parquet", "1x"),
        lambda: run_range_lsh(
            str(WORK / f"embeddings_x{factor}.parquet"), f"{factor}x"
        ),
        lambda: run_pagerank(f"{SF_DIR}/lineitem.parquet", "1x"),
        lambda: run_pagerank(str(li10), f"{factor}x"),
        lambda: run_triangles(f"{SF_DIR}/lineitem.parquet", "1x"),
        lambda: run_triangles(str(li10), f"{factor}x"),
    ]
    for s in scenarios:
        print(json.dumps(s()), flush=True)


if __name__ == "__main__":
    main()
