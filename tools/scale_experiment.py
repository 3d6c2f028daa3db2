"""Scale experiment for the two heaviest extension operators (SCALE.md):
dedup_cluster_collapse (MinHash pairs -> connected components) and
sim_topk_ivf, at 1x (sf0.1) vs 10x (sf1-equivalent, synthesized by
replication into /tmp — driver testdata is read-only).

Replication notes (measured behavior, see SCALE.md):
  * documents: replica k rotates each doc's token list by 7k positions.
    Rotation only rewrites the two seam regions, so most char-8 shingles
    SURVIVE across replicas (and docs whose token count divides 7k are
    exact clones) — the 10x corpus therefore carries a much denser pair
    graph than 1x. That makes it a strictly HARDER-than-linear input;
    results are reported as measured, not as an independent-replica
    approximation;
  * embeddings: replica k rescales each component by (1 + 1e-4 k) —
    direction moves ~1e-4 rad, cells keep their population shape.

Each scenario runs in its OWN SparkSession with an event log; total
shuffle read/write bytes are summed from SparkListenerTaskEnd metrics, so
the reported volumes cover exactly that scenario's jobs.

Usage: python tools/scale_experiment.py [factor]   (default 10)
Prints one JSON line per scenario plus a summary table to stderr.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
WORK = Path("/tmp/scale_experiment")


def make_session(name: str, log_dir: Path) -> SparkSession:
    log_dir.mkdir(parents=True, exist_ok=True)
    return (
        SparkSession.builder.master("local[32]")
        .appName(name)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir.as_uri())
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def shuffle_bytes(log_dir: Path) -> tuple[int, int]:
    """(read_bytes, write_bytes) summed over every task in the app log."""
    rd = wr = 0
    for f in log_dir.rglob("*"):
        if f.is_dir() or f.name.startswith(".") or f.suffix == ".crc":
            continue
        for line in f.read_text(errors="ignore").splitlines():
            if '"SparkListenerTaskEnd"' not in line:
                continue
            ev = json.loads(line)
            tm = ev.get("Task Metrics") or {}
            srm = tm.get("Shuffle Read Metrics") or {}
            swm = tm.get("Shuffle Write Metrics") or {}
            rd += srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
            wr += swm.get("Shuffle Bytes Written", 0)
    return rd, wr


def build_replicas(factor: int) -> None:
    docs_out = WORK / f"documents_x{factor}.parquet"
    emb_out = WORK / f"embeddings_x{factor}.parquet"
    # _SUCCESS marker, not bare directory existence: a crashed prior run
    # leaves a partial directory that must be rebuilt, not reused.
    if (docs_out / "_SUCCESS").exists() and (emb_out / "_SUCCESS").exists():
        return
    spark = make_session("scale-build", WORK / "log_build")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    n_emb = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    doc_parts, emb_parts = [], []
    for k in range(factor):
        if k == 0:
            doc_parts.append(docs)
            emb_parts.append(emb)
            continue
        rot = k * 7
        toks = F.split(F.col("text"), " ")
        n = F.size(toks)
        # Rotate tokens by `rot` (mod length): breaks shingles across
        # replicas while preserving length/vocabulary.
        rotated = F.concat(
            F.slice(toks, (F.lit(rot) % n) + 1, n), F.slice(toks, 1, F.lit(rot) % n)
        )
        doc_parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + k * n_docs).withColumn(
                "text", F.array_join(rotated, " ")
            )
        )
        emb_parts.append(
            emb.withColumn("vec_id", F.col("vec_id") + k * n_emb).withColumn(
                "embedding",
                F.transform("embedding", lambda x: x * (1.0 + 1e-4 * k)),
            )
        )
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionByName(p)
    e = emb_parts[0]
    for p in emb_parts[1:]:
        e = e.unionByName(p)
    d.repartition(32).write.mode("overwrite").parquet(str(docs_out))
    e.repartition(32).write.mode("overwrite").parquet(str(emb_out))
    spark.stop()


def run_cluster_collapse(docs_path: str, tag: str) -> dict:
    from usgs_lidar_spark.operators.dedup import minhash_lsh_pairs
    from usgs_lidar_spark.operators.graph import connected_components

    log_dir = WORK / f"log_cc_{tag}"
    shutil.rmtree(log_dir, ignore_errors=True)
    spark = make_session(f"cc-{tag}", log_dir)
    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", k=8, num_perm=64, bands=32, threshold=0.6, max_df=20
    )
    # Materialize ONCE: localCheckpoint pins the pair list so the CC
    # stage (and its convergence counts) never re-executes the LSH
    # pipeline — cc_sec and the shuffle totals measure one run of each
    # stage, which is what the table claims.
    pairs = pairs.localCheckpoint()
    n_pairs = pairs.count()
    t_pairs = time.perf_counter() - t0
    stats: dict = {}
    t1 = time.perf_counter()
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = connected_components(
        docs.select(F.col("doc_id").alias("id")), edges, stats=stats
    )
    n_clusters = labels.select("cluster_id").distinct().count()
    n_rows = labels.count()
    t_cc = time.perf_counter() - t1
    spark.stop()
    rd, wr = shuffle_bytes(log_dir)
    return {
        "scenario": f"cluster_collapse_{tag}",
        "n_docs": n_docs,
        "n_pairs": n_pairs,
        "n_clusters": n_clusters,
        "n_rows": n_rows,
        "pairs_sec": round(t_pairs, 2),
        "cc_sec": round(t_cc, 2),
        "cc_rounds": stats.get("rounds"),
        "cc_converged": stats.get("converged"),
        "shuffle_read_mb": round(rd / 1e6, 1),
        "shuffle_write_mb": round(wr / 1e6, 1),
    }


def run_ivf(emb_path: str, tag: str) -> dict:
    from usgs_lidar_spark.operators.similarity import ivf_topk

    log_dir = WORK / f"log_ivf_{tag}"
    shutil.rmtree(log_dir, ignore_errors=True)
    spark = make_session(f"ivf-{tag}", log_dir)
    emb = spark.read.parquet(emb_path)
    n_vec = emb.count()
    # Fixed quantizer across scales: cells seeded from the original sf0.1
    # vec_ids so cell geometry is identical and only population grows.
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ]
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t0 = time.perf_counter()
    out = ivf_topk(
        emb, queries, cents, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", k=5, n_probe=2,
    )
    n_rows = out.count()
    dt = time.perf_counter() - t0
    spark.stop()
    rd, wr = shuffle_bytes(log_dir)
    return {
        "scenario": f"ivf_topk_{tag}",
        "n_vectors": n_vec,
        "n_rows": n_rows,
        "sec": round(dt, 2),
        "shuffle_read_mb": round(rd / 1e6, 1),
        "shuffle_write_mb": round(wr / 1e6, 1),
    }


def run_minhash_incremental(docs_path: str, tag: str) -> dict:
    """Full LSH near-dup run vs the incremental form (newest 10% of
    doc_ids play the incoming batch) on the SAME corpus — the claim
    under test: the incremental candidate join + verification cost
    tracks the batch, not the corpus pair density, because corpus bands
    only ever join against batch bands and corpus text is pulled only
    for actual collisions."""
    from usgs_lidar_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    log_dir = WORK / f"log_mhinc_{tag}"
    shutil.rmtree(log_dir, ignore_errors=True)
    spark = make_session(f"mhinc-{tag}", log_dir)
    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()
    t0 = time.perf_counter()
    n_full = minhash_lsh_pairs(
        docs, "text", "doc_id", k=8, num_perm=64, bands=32, threshold=0.6, max_df=20
    ).count()
    t_full = time.perf_counter() - t0
    t1 = time.perf_counter()
    n_inc = minhash_lsh_pairs_incremental(
        docs.withColumn("is_batch", F.col("doc_id") % 10 == 0),
        "text", "doc_id", "is_batch",
        k=8, num_perm=64, bands=32, threshold=0.6, max_df=20,
    ).count()
    t_inc = time.perf_counter() - t1
    spark.stop()
    rd, wr = shuffle_bytes(log_dir)
    return {
        "scenario": f"minhash_incremental_{tag}",
        "n_docs": n_docs,
        "full_pairs": n_full,
        "full_sec": round(t_full, 2),
        "incremental_pairs": n_inc,
        "incremental_sec": round(t_inc, 2),
        "shuffle_read_mb": round(rd / 1e6, 1),
        "shuffle_write_mb": round(wr / 1e6, 1),
    }


def run_snapshot_diff(factor: int, tag: str) -> dict:
    """snapshot_diff at 1x vs Nx orders: the claim under test is the
    hash-reduction — the full-outer reconciliation join shuffles
    (key, 64-bit payload hash), so shuffle bytes per row stay constant
    (~tens of bytes) no matter how wide the table, and wall scales with
    rows, not payload. The Nx snapshot pair is built inline (orderkey
    offset per replica, same mutation pattern as the cdc_snapshot_diff
    query: every 17th key dropped, every 13th repriced, every 19th
    reborn)."""
    from usgs_lidar_spark.operators.cdc import snapshot_diff

    log_dir = WORK / f"log_diff_{tag}"
    shutil.rmtree(log_dir, ignore_errors=True)
    spark = make_session(f"diff-{tag}", log_dir)
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    if factor > 1:
        maxkey = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
        parts = [
            o.withColumn("o_orderkey", F.col("o_orderkey") + k * maxkey)
            for k in range(factor)
        ]
        left = parts[0]
        for p in parts[1:]:
            left = left.unionByName(p)
    else:
        left = o
    left = left.localCheckpoint()  # measure the diff, not the replica build
    n_rows = left.count()
    base = left.filter(F.col("o_orderkey") % 17 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    born = left.filter(F.col("o_orderkey") % 19 == 0).select(
        (F.col("o_orderkey") + 1_000_000_000).alias("o_orderkey"),
        F.lit(42.0).alias("o_totalprice"),
        F.lit("N").alias("o_orderstatus"),
    )
    right = base.unionByName(born)
    t0 = time.perf_counter()
    n_diff = snapshot_diff(
        left, right, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    ).count()
    dt = time.perf_counter() - t0
    spark.stop()
    rd, wr = shuffle_bytes(log_dir)
    return {
        "scenario": f"snapshot_diff_{tag}",
        "n_rows": n_rows,
        "n_diff": n_diff,
        "sec": round(dt, 2),
        "shuffle_read_mb": round(rd / 1e6, 1),
        "shuffle_write_mb": round(wr / 1e6, 1),
        "shuffle_bytes_per_row": round(wr / max(n_rows, 1), 1),
    }


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    WORK.mkdir(parents=True, exist_ok=True)
    build_replicas(factor)
    scenarios = [
        lambda: run_cluster_collapse(f"{SF_DIR}/documents.parquet", "1x"),
        lambda: run_cluster_collapse(
            str(WORK / f"documents_x{factor}.parquet"), f"{factor}x"
        ),
        lambda: run_ivf(f"{SF_DIR}/embeddings.parquet", "1x"),
        lambda: run_ivf(str(WORK / f"embeddings_x{factor}.parquet"), f"{factor}x"),
        lambda: run_minhash_incremental(f"{SF_DIR}/documents.parquet", "1x"),
        lambda: run_minhash_incremental(
            str(WORK / f"documents_x{factor}.parquet"), f"{factor}x"
        ),
        lambda: run_snapshot_diff(1, "1x"),
        lambda: run_snapshot_diff(factor, f"{factor}x"),
    ]
    for scenario in scenarios:
        # Print as produced: a crash in a later scenario must not discard
        # completed results.
        print(json.dumps(scenario()), flush=True)


if __name__ == "__main__":
    main()
