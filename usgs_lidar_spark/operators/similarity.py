"""Similarity search over embedding columns (ArrayType(FloatType)).

North-star extension (SURVEY.md §2 "Extension operators"): brute-force
cosine top-k as the exact baseline, and a deterministic LSH-bucketed
variant as the scale path.

Scale design (100 TB of vectors):
  * brute force is a broadcast of the (small) query set against the corpus
    — embarrassingly parallel, no shuffle until the per-query top-k
    (which is a partial TopK per partition + tiny final merge);
  * the LSH variant buckets both sides by sign-bit hash so each query only
    scans its bucket — the equi-join on bucket id replaces the cross
    product; recall is traded via multi-probe (not implemented here);
  * dot products run as zip_with/aggregate higher-order expressions —
    JVM-side, no Python. For max throughput a Pandas-UDF matmul over
    mapInPandas batches would vectorize further; built-ins keep this
    oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from usgs_lidar_spark.functions.vectors import cosine, sign_lsh_bucket


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries x corpus, per-query window
    top-k. Ranking uses (rounded cosine DESC, corpus id ASC) so ties at
    the k boundary are deterministic across engines."""
    # Norms precomputed per side (once per vector, not once per pair) —
    # the arithmetic is identical to inline cosine (same expressions over
    # the same doubles), so oracle parity is unaffected while the HOF work
    # per pair drops to the dot product alone.
    from usgs_lidar_spark.functions.vectors import dot, norm

    cn = corpus.withColumn("__cnorm", norm(vec_col))
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        norm(vec_col).alias("__qnorm"),
    )
    joined = cn.crossJoin(F.broadcast(q)).filter(
        F.col(query_id_col) != F.col(id_col)
    )
    raw = F.when(
        (F.col("__cnorm") == 0) | (F.col("__qnorm") == 0), F.lit(0.0)
    ).otherwise(dot(vec_col, "__qvec") / (F.col("__cnorm") * F.col("__qnorm")))
    sim = F.round(raw, round_digits)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, F.col(id_col).alias("neighbor_id"), "sim", "rank")
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    n_bits: int = 8,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket (axis-aligned hyperplanes — deterministic, no seed), then exact
    cosine within the bucket. The bucket equi-join replaces the cross
    product; at 2^n_bits buckets each probe scans ~1/2^n_bits of the
    corpus."""
    from usgs_lidar_spark.functions.vectors import dot, norm

    cb = corpus.withColumn("__bucket", sign_lsh_bucket(vec_col, n_bits)).withColumn(
        "__cnorm", norm(vec_col)
    )
    qb = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        sign_lsh_bucket(vec_col, n_bits).alias("__bucket"),
        norm(vec_col).alias("__qnorm"),
    )
    joined = cb.join(F.broadcast(qb), "__bucket").filter(
        F.col(query_id_col) != F.col(id_col)
    )
    raw = F.when(
        (F.col("__cnorm") == 0) | (F.col("__qnorm") == 0), F.lit(0.0)
    ).otherwise(dot(vec_col, "__qvec") / (F.col("__cnorm") * F.col("__qnorm")))
    sim = F.round(raw, round_digits)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, F.col(id_col).alias("neighbor_id"), "sim", "rank")
    )


def cosine_topk_lsh_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    n_bits: int = 8,
    round_digits: int = 4,
) -> DataFrame:
    """Multi-probe sign-LSH ANN: each query probes its own bucket PLUS
    every 1-bit-flip neighbor bucket (all buckets within Hamming
    distance 1 — the recall fix for near-boundary vectors that
    single-probe ``cosine_topk_lsh`` trades away).

    Cost model at scale: the corpus side is untouched (one bucket per
    vector, same equi-join); only the query side multiplies by
    (n_bits + 1) probe rows, so each query scans ~(n_bits+1)/2^n_bits of
    the corpus — at n_bits=8 that is ~3.5% instead of single-probe's
    ~0.4%, for Hamming-1-complete recall. Probe buckets are pairwise
    distinct, so a corpus vector meets a query at most once — no
    dedup step. Wider probing (Hamming 2) is the same rewrite with
    flip-pair probes.
    """
    from usgs_lidar_spark.functions.vectors import dot, norm

    cb = corpus.withColumn("__bucket", sign_lsh_bucket(vec_col, n_bits)).withColumn(
        "__cnorm", norm(vec_col)
    )
    home = sign_lsh_bucket(vec_col, n_bits)
    probes = F.array(
        home,
        *[home.bitwiseXOR(F.lit(1 << j).cast("long")) for j in range(n_bits)],
    )
    qb = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.explode(probes).alias("__bucket"),
        norm(vec_col).alias("__qnorm"),
    )
    joined = cb.join(F.broadcast(qb), "__bucket").filter(
        F.col(query_id_col) != F.col(id_col)
    )
    raw = F.when(
        (F.col("__cnorm") == 0) | (F.col("__qnorm") == 0), F.lit(0.0)
    ).otherwise(dot(vec_col, "__qvec") / (F.col("__cnorm") * F.col("__qnorm")))
    sim = F.round(raw, round_digits)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, F.col(id_col).alias("neighbor_id"), "sim", "rank")
    )
