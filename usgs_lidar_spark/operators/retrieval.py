"""Keyword retrieval over the document corpus — the lookup stage of a
training-data pipeline (find the documents matching an eval probe, a
contamination report, a curation query) expressed as bounded equi-joins.

Not in the reference (its text surface is a regex year extractor,
``scripts/usgs_lidar.py:221-236``); this is north-star extension surface
alongside dedup/ANN/text-quality.

Design rules shared with the rest of the engine:

* **Integer-exact scoring.** Classic TF-IDF weights are ``tf * ln(N/df)``
  — a float whose last-ulp behavior differs across engines (libm ln), so
  a cross-engine value hash on it is a coin flip. The scoring here is
  ``tf * (SCALE div df)``: an integer "inverse document frequency" with
  the division's truncation documented, monotonically decreasing in df
  exactly like the log form, and bit-reproducible in ANY engine with
  64-bit integers. SCALE=10^9 keeps three-digit df resolution even for
  terms appearing in hundreds of millions of docs while Σ tf·idf stays
  far inside int64 for real corpora.
* **Only matching postings move.** Tokens are filtered to the query's
  term set BEFORE any aggregation, so the shuffled volume is the
  matching postings, not the corpus vocabulary; df for the (few) query
  terms is a second aggregate over the same filtered frame and joins
  back broadcast. The corpus text itself never shuffles.
* **Top-k is TakeOrdered.** Global (score DESC, doc_id ASC) limit-k —
  per-partition heads then one k-row merge on the driver, never a full
  sort.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from usgs_lidar_spark.functions.textstats import ws_tokens

#: Integer-idf scale: idf(term) = IDF_SCALE div df(term).
IDF_SCALE = 10**9

#: Fixed-point scale for the BM25 rational arithmetic (see bm25_topk):
#: 1/avgdl enters at this resolution; everything downstream is exact
#: 64-bit integer arithmetic.
BM25_Q6 = 10**6


def term_doc_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """The inverted-index posting list as a DataFrame: one (term,
    ``id_col``, tf) row per distinct term per document. Materialize it
    (partitioned/bucketed by term) when many queries will hit the same
    corpus; `tfidf_topk` builds the same frame on the fly restricted to
    one query's terms."""
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)
    return (
        docs.select(F.col(id_col), F.explode(tok).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_topk(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    lowercase: bool = True,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under integer-exact
    TF-IDF: score(d) = Σ_t tf(t, d) · (IDF_SCALE div df(t)) over the
    query's distinct terms, ranked (score DESC, id ASC). Returns
    (id_col, n_hit_terms, score, rank); only documents matching at
    least one term appear.

    df(t) counts documents containing t in the WHOLE corpus (computed
    from the filtered postings — a term absent from the corpus simply
    contributes no postings). The query term set is deduplicated
    (set-of-words semantics) and ships as a literal isin() filter right
    above the scan, so this is ONE corpus pass: postings → tf by
    (term, doc) → df attached by a count window over term (deriving df
    as a separate aggregate would re-expand the lineage into a second
    full corpus scan — the postings are tiny, the scan is not) →
    per-doc sum → TakeOrdered(k)."""
    terms = sorted({t.lower() if lowercase else t for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)
    postings = (
        docs.select(F.col(id_col), F.explode(tok).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf: Column = F.expr(f"{IDF_SCALE} div df")
    scored = (
        postings.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum(F.col("tf") * idf).alias("score"),
        )
    )
    return _rank_topk(scored, id_col, k, ["n_hit_terms", "score"])


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    lowercase: bool = True,
) -> DataFrame:
    """Top-k documents under an integer-exact BM25-style ranking —
    TF-saturation + document-length normalization with the engine's
    reciprocal integer idf, bit-reproducible in any 64-bit-integer
    engine.

    Classic BM25 (k1 = 1.2, b = 0.75) scores

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Both floating-point hazards are removed without changing the shape:

    * idf is the engine's reciprocal form ``IDF_SCALE div df`` (same
      monotone-decreasing-in-df role as ln(N/df), no libm — see module
      docstring), exactly as in `tfidf_topk`.
    * With k1 = 6/5 and b = 3/4 the TF fraction is the exact rational
      44·tf·avgdl / (40·tf·avgdl + 12·avgdl + 36·dl) — evaluated here
      with 1/avgdl pinned once at BM25_Q6 fixed-point resolution
      (``inv_avgdl_q6 = (N·10^6) div S``), after which numerator,
      denominator, and the final ``div`` are pure int64 ops:

        den_q7  = 10·tf·10^6 + 3·10^6 + 9·dl·inv_avgdl_q6   # 10^7·denom
        frac_q6 = (22·tf·10^12) div den_q7                   # ≤ 2.2·10^6
        score   = Σ_t (IDF_SCALE div df) · frac_q6           # ≤ 2.2·10^15/term

    Int64 envelope: the largest intermediate is 22·tf·10^12, safe for
    tf < 4·10^5 occurrences of one term in one document — beyond any
    real document that survives quality filtering (and far beyond the
    synthetic corpus).

    Scale shape is identical to `tfidf_topk`: the query's terms filter
    the postings right above the scan (only matching postings shuffle,
    the corpus text never moves); corpus stats (N docs, S total tokens)
    are one map-side aggregate broadcast back; df comes from a count
    window over the (tiny) filtered postings; top-k is TakeOrdered.
    Returns (id_col, n_hit_terms, score, rank) for the k best
    (score DESC, id ASC); only documents hitting ≥1 term appear.
    """
    contribs = _bm25_contribs(docs, query_terms, text_col, id_col, lowercase)
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    scored = contribs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hit_terms"),
        F.sum("contrib").alias("score"),
    )
    return _rank_topk(scored, id_col, k, ["n_hit_terms", "score"])


def _bm25_contribs(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str,
    id_col: str,
    lowercase: bool,
) -> DataFrame:
    """The shared integer-exact BM25 scoring frame: one (term, id_col,
    df, contrib) row per matching posting, built in ONE corpus pass —
    dl comes from the same select (size of the full token array), the
    explode sees only the query's terms (shuffled volume = matching
    postings), corpus length stats are a map-side aggregate broadcast
    back as two scalars, df is a count window over the filtered
    postings. Formulas documented at `bm25_topk`."""
    terms = sorted({t.lower() if lowercase else t for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)
    term_arr = F.array(*[F.lit(t) for t in terms])
    postings = (
        docs.select(
            F.col(id_col),
            F.size(tok).cast("long").alias("dl"),
            F.explode(
                F.filter(tok, lambda t: F.array_contains(term_arr, t))
            ).alias("term"),
        )
        .groupBy("term", id_col, "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = docs.select(F.size(tok).cast("long").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    )
    with_df = postings.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).crossJoin(F.broadcast(stats))
    return _bm25_formula(with_df).select("term", id_col, "df", "contrib")


def _bm25_formula(frame: DataFrame) -> DataFrame:
    """Apply the integer-exact BM25 contribution formula (documented at
    `bm25_topk`) to a frame carrying (tf, dl, df, n_docs,
    total_tokens); adds `contrib`."""
    return (
        frame.withColumn(
            "inv_avgdl_q6", F.expr(f"(n_docs * {BM25_Q6}) div total_tokens")
        )
        .withColumn(
            "den_q7",
            F.expr(f"10 * tf * {BM25_Q6} + 3 * {BM25_Q6}"
                   " + 9 * dl * inv_avgdl_q6"),
        )
        .withColumn(
            "frac_q6", F.expr(f"(22 * tf * {BM25_Q6} * {BM25_Q6}) div den_q7")
        )
        .withColumn("contrib", F.expr(f"({IDF_SCALE} div df) * frac_q6"))
    )


def _rank_topk(
    scored: DataFrame, id_col: str, k: int, extra_cols: list[str]
) -> DataFrame:
    """The retrieval tier's shared top-k tail: TakeOrdered on
    (score DESC, id ASC) — per-partition heads, k-row driver merge,
    never a full sort — then a rank window over the <= k survivors."""
    order = [F.col("score").desc(), F.col(id_col).asc()]
    return (
        scored.orderBy(*order)
        .limit(k)
        .select(
            id_col,
            *extra_cols,
            F.row_number()
            .over(Window.orderBy(*order))
            .cast("long")
            .alias("rank"),
        )
    )


def phrase_match(
    docs: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Exact consecutive-phrase search over the corpus: documents whose
    token stream contains ``phrase`` as adjacent whitespace tokens, with
    per-document match counts.

    Positional postings (posexplode) are filtered to the phrase's term
    SET right above the scan — only those terms' (id, pos) rows shuffle,
    once, into a per-document window ordered by position. A match at a
    row means: this row is the phrase's first term, and for each i the
    i-th following FILTERED row carries term i at original position
    pos+i. Any non-phrase token in between breaks the position
    arithmetic (lead(pos, i) != pos + i) and any out-of-order phrase
    token breaks the term equality — so the lead-window test is exactly
    consecutive-subsequence containment, without a self-join per term.
    Overlapping occurrences each count.

    Returns (id_col, n_matches, first_pos) — first_pos is the 0-based
    token offset of the earliest match — for matching documents only.
    """
    terms = [t.lower() if lowercase else t for t in phrase]
    if len(terms) < 2:
        raise ValueError("phrase needs >= 2 terms")
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)
    term_set = sorted(set(terms))
    pos = (
        docs.select(
            F.col(id_col), F.posexplode(tok).alias("pos", "term")
        )
        .filter(F.col("term").isin(term_set))
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [
        F.lead(c, i).over(w).alias(f"{c}{i}")
        for i in range(1, len(terms))
        for c in ("term", "pos")
    ]
    led = pos.select(id_col, "pos", "term", *leads)
    conds = [F.col("term") == terms[0]]
    for i, t in enumerate(terms[1:], start=1):
        conds.append(F.col(f"term{i}") == t)
        conds.append(F.col(f"pos{i}") == F.col("pos") + i)
    return (
        led.filter(reduce(lambda a, b: a & b, conds))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("pos").cast("long").alias("first_pos"),
        )
    )


#: Integer RRF contribution scale: contrib = RRF_SCALE div (rrf_k + rank).
RRF_SCALE = 10**6


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of N rankers, integer-exact.

    Classic RRF scores Σ_r 1/(rrf_k + rank_r(d)) — an irrational-free
    but float-summed formula. Here each contribution is the integer
    ``RRF_SCALE div (rrf_k + rank)`` (same strictly-decreasing-in-rank
    shape, rrf_k = 60 per the convention popularized by the original
    paper), an item absent from a ranker contributes exactly 0, and the
    fused score is an int64 sum — bit-reproducible in any engine, like
    the rest of the retrieval tier's scoring.

    Each input frame must carry (id_col, rank_col) with ranks that are
    themselves deterministic (the engine's rankers tie-break on id).
    Inputs are top-k short lists — tens of rows each — so the fusion's
    full-outer joins are trivially broadcastable; at scale the expensive
    work is INSIDE the rankers, which keep their own candidates-only
    shapes. Returns the fused top-k: (id_col, score, rank) ranked
    (score DESC, id ASC).
    """
    if len(rankings) < 2:
        raise ValueError("rrf_fuse needs >= 2 rankings")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    contribs = []
    for i, r in enumerate(rankings):
        contribs.append(
            r.select(
                F.col(id_col),
                F.expr(f"{RRF_SCALE} div ({rrf_k} + {rank_col})")
                .cast("long")
                .alias(f"__c{i}"),
            )
        )
    fused = reduce(
        lambda a, b: a.join(b, on=id_col, how="full_outer"), contribs
    )
    score = reduce(
        lambda a, b: a + b,
        [F.coalesce(F.col(f"__c{i}"), F.lit(0)) for i in range(len(contribs))],
    ).alias("score")
    scored = fused.select(id_col, score)
    return _rank_topk(scored, id_col, k, ["score"])


def bm25_topk_pruned(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    lowercase: bool = True,
) -> DataFrame:
    """`bm25_topk` with max-score candidate pruning (the WAND /
    block-max family's batch form) — identical results, smaller scored
    set.

    Two phases over the same one-pass postings frame:

    1. Seed threshold: the exact BM25 scores of documents matching the
       RAREST query term (fewest postings — the cheapest candidate set
       with the highest per-doc contributions); θ = the k-th best seed
       score (0 if fewer than k seeds — pruning then disables itself).
    2. Upper-bound prune: UB_t = max contribution of term t over its
       postings; a document's bound is Σ UB_t over the terms it
       matches. Documents with bound < θ cannot displace the k-th seed
       under ANY tie-break (strict inequality), so they drop before
       the per-document aggregation. Survivors are scored exactly.

    Every phase is postings-sized (never corpus-sized): UB is a
    #terms-row aggregate, the seed set is one term's postings, and the
    prune is a broadcast semi-filter on the postings frame. At 100 TB
    the win is scoring-set shrinkage on queries mixing rare and common
    terms — common-term-only documents fall under θ. Results are pinned
    row-identical to `bm25_topk` (same scores, same tie contract) by
    `test_bm25_pruned_parity`.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    contribs = _bm25_contribs(docs, query_terms, text_col, id_col, lowercase)
    # Cache: seeds, bounds, and the final aggregation all read this
    # postings-sized frame.
    contribs = contribs.localCheckpoint(eager=False)
    # Phase 1 — θ from the rarest term's docs, scored exactly.
    rarest = (
        contribs.groupBy("term")
        .agg(F.min("df").alias("df"))
        .orderBy(F.col("df").asc(), F.col("term").asc())
        .limit(1)
        .select("term")
    )
    seed_scores = (
        contribs.join(F.broadcast(rarest), "term")
        .select(id_col)
        .distinct()
        .join(contribs, id_col)
        .groupBy(id_col)
        .agg(F.sum("contrib").alias("score"))
    )
    theta = (
        seed_scores.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .agg(
            F.when(F.count(F.lit(1)) >= k, F.min("score"))
            .otherwise(F.lit(0))
            .alias("theta")
        )
    )
    # Phase 2 — per-term upper bounds; per-doc bound over a NARROW
    # (term, id, ub) projection; only survivor docs' postings reach the
    # exact-score aggregation (left-semi). The bound pass is an extra
    # postings-sized-but-narrow shuffle — the trade that pays when
    # survivors << matching docs (rare+common term mixes) and costs ~2x
    # narrow shuffle volume when θ prunes nothing.
    ub = contribs.groupBy("term").agg(F.max("contrib").alias("ub"))
    keep = (
        contribs.select("term", id_col)
        .join(F.broadcast(ub), "term")
        .groupBy(id_col)
        .agg(F.sum("ub").alias("bound"))
        .crossJoin(F.broadcast(theta))
        .filter(F.col("bound") >= F.col("theta"))
        .select(id_col)
    )
    survivors = (
        contribs.join(keep, id_col, "left_semi")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum("contrib").alias("score"),
        )
    )
    return _rank_topk(survivors, id_col, k, ["n_hit_terms", "score"])


#: Term-bucket count for the persisted inverted index: terms hash into
#: this many hive partitions (vocabulary-many dirs would be unusable).
INDEX_TERM_BUCKETS = 256


def _write_schema_sidecar(df: DataFrame, path: str) -> None:
    """Persist a dataset's schema as a one-row parquet sidecar. A
    partitionBy write of an EMPTY frame produces a directory with no
    data files and therefore no inferable schema — a subsequent read
    throws AnalysisException. The sidecar lets readers reconstruct the
    empty frame instead (empty-index bootstrap: build empty, stream
    appends in)."""
    df.sparkSession.createDataFrame(
        [(df.schema.json(),)], "schema_json string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_schema")


def _read_with_schema_fallback(spark, path: str) -> DataFrame:
    """Read a (possibly empty) partitioned dataset; on a schema-less
    directory, fall back to an empty frame with the sidecar's schema."""
    from pyspark.errors import AnalysisException
    from pyspark.sql.types import StructType

    try:
        return spark.read.option("basePath", path).parquet(path)
    except AnalysisException:
        import json as _json

        sj = spark.read.parquet(f"{path}/_schema").collect()[0]["schema_json"]
        return spark.createDataFrame(
            [], StructType.fromJson(_json.loads(sj))
        )


def write_term_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    n_buckets: int = INDEX_TERM_BUCKETS,
) -> None:
    """Materialize the FULL inverted index as a term-bucket-partitioned
    parquet dataset: postings (term, id, dl, tf) under hive partitions
    ``tb=pmod(xxhash64(term), n_buckets)``, plus corpus length stats
    (n_docs, total_tokens) as a ``_corpus_stats`` parquet sidecar
    (underscore prefix — data readers skip it, same convention as the
    IVF index's ``_centroids``).

    The layout IS the index: a query's terms map to <= |terms| buckets,
    so serving reads ~|terms|/n_buckets of the bytes (partition
    pruning) and the exact `term IN (...)` filter pushes into the
    parquet scan inside each bucket. df is NOT stored — all of a term's
    postings live in its one bucket, so df falls out of the read
    postings exactly, which keeps appends cheap (df is never stale).
    Repeated-query serving (`bm25_topk_from_index`) reads this instead
    of re-tokenizing the corpus per query.

    Zero-token documents (blank text) leave no explode rows, yet they
    count in n_docs — so each writes one MARKER row ``(term=' ',
    tf=0, dl=0)`` into the dataset. Real tokens are split on ``\\s+``
    and therefore never CONTAIN whitespace (though tab-only text does
    yield empty-STRING tokens — trim strips only spaces), so the
    one-space marker term is disjoint from real postings by
    construction; markers make the postings directory the COMPLETE
    source of truth (``rebuild_corpus_stats`` recovers n_docs exactly
    after a crash, empty docs included), and serving never scores them.
    One row per empty doc, dl=0 — negligible storage."""
    spark = docs.sparkSession
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)
    postings = _postings_with_markers(docs, tok, id_col, n_buckets)
    postings.write.mode("overwrite").partitionBy("tb").parquet(path)
    _write_schema_sidecar(postings, path)
    # coalesce: SUM over an EMPTY corpus is NULL — a NULL total_tokens
    # would poison append_to_term_index's int() advance and
    # bm25_topk_from_index's inv_avgdl_q6.
    docs.select(F.size(tok).cast("long").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("total_tokens"),
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_corpus_stats")


def _postings_with_markers(
    docs: DataFrame, tok, id_col: str, n_buckets: int
) -> DataFrame:
    """The persisted-index posting frame (term, id_col, dl, tf, tb):
    real postings from the tokenized text, plus one ``term=' '`` marker
    row per zero-token document (see `write_term_index` — markers make
    n_docs recoverable from the postings alone; the one-space term is
    unproducible because real tokens never contain whitespace)."""
    real = (
        docs.select(
            F.col(id_col),
            F.size(tok).cast("long").alias("dl"),
            F.explode(tok).alias("term"),
        )
        .groupBy("term", id_col, "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    markers = docs.filter(F.size(tok) == 0).select(
        F.lit(" ").alias("term"),
        F.col(id_col),
        F.lit(0).cast("long").alias("dl"),
        F.lit(0).cast("long").alias("tf"),
    )
    return real.unionByName(markers).withColumn(
        "tb", F.expr(f"pmod(xxhash64(term), {n_buckets})")
    )


def bm25_topk_from_index(
    spark,
    path: str,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    lowercase: bool = True,
    n_buckets: int = INDEX_TERM_BUCKETS,
) -> DataFrame:
    """`bm25_topk` served from a `write_term_index` dataset — the
    corpus is never rescanned or re-tokenized: the query's terms prune
    to their hash buckets' partition directories, the exact term filter
    pushes into those scans, df is derived from the read postings (each
    term's postings are complete within its bucket), corpus stats come
    from the sidecar. Row-identical to the on-the-fly ranker
    (`test_term_index_serving_parity`)."""
    terms = sorted({t.lower() if lowercase else t for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    idx = _read_with_schema_fallback(spark, path)
    # Partition pruning: tb IN (buckets of the query's terms) is a
    # literal predicate on the hive partition column; the exact term
    # filter then pushes into the pruned scans.
    bucket_of = {
        r["t"]: r["b"]
        for r in spark.createDataFrame([(t,) for t in terms], "t string")
        .select("t", F.expr(f"pmod(xxhash64(t), {n_buckets})").alias("b"))
        .collect()
    }
    probe = (
        idx.filter(F.col("tb").isin(sorted({int(b) for b in bucket_of.values()})))
        .filter(F.col("term").isin(terms))
        # Zero-token-doc marker rows (term=' ') are corpus-stat
        # bookkeeping, never scorable postings — and a pathological
        # ' ' query term matches nothing, exactly as in the on-the-fly
        # ranker (real tokens never contain whitespace).
        .filter(F.col("term") != F.lit(" "))
    )
    stats = spark.read.parquet(f"{path}/_corpus_stats")
    with_df = probe.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).crossJoin(F.broadcast(stats))
    scored = (
        _bm25_formula(with_df)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum("contrib").alias("score"),
        )
    )
    return _rank_topk(scored, id_col, k, ["n_hit_terms", "score"])


def append_to_term_index(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    n_buckets: int = INDEX_TERM_BUCKETS,
) -> None:
    """Incrementally grow a `write_term_index` dataset: the new batch's
    postings append into their term buckets and the ``_corpus_stats``
    sidecar is advanced by the batch's exact (n_docs, token) deltas —
    integer sums, so the result is indistinguishable from a full
    rebuild over the union corpus (`test_term_index_append_parity`).
    df needs no maintenance at all: it is derived from the read
    postings at serve time, and a (term, doc) posting appears exactly
    once across base + batches (disjoint doc ids are the caller's
    contract, as in any append-only corpus feed).

    Durability contract: the update is two writes (postings append,
    then sidecar overwrite) with no cross-file transaction — plain
    parquet directories have none. SINGLE WRITER ONLY, and readers
    must not race the sidecar overwrite (serve from a snapshot, or
    quiesce during maintenance). Crash recovery: a failure between the
    two writes leaves appended postings with stale stats — run
    `rebuild_corpus_stats(spark, path)` to recompute the sidecar
    exactly from the postings (the postings are always the source of
    truth; re-running the same append would double the postings, so
    recover, don't retry)."""
    spark = new_docs.sparkSession
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)
    (
        _postings_with_markers(new_docs, tok, id_col, n_buckets)
        .write.mode("append")
        .partitionBy("tb")
        .parquet(path)
    )
    old = spark.read.parquet(f"{path}/_corpus_stats").collect()[0]
    batch = (
        new_docs.select(F.size(tok).cast("long").alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long")
            .alias("total_tokens"),
        )
        .collect()[0]
    )
    spark.createDataFrame(
        [
            (
                int(old["n_docs"]) + int(batch["n_docs"]),
                # `or 0` on BOTH sides: an empty-corpus base written by a
                # pre-coalesce write_term_index may carry NULL.
                int(old["total_tokens"] or 0)
                + int(batch["total_tokens"] or 0),
            )
        ],
        "n_docs bigint, total_tokens bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_corpus_stats")


def rebuild_corpus_stats(spark, path: str, id_col: str = "doc_id") -> None:
    """Crash-recovery for the `_corpus_stats` sidecar: recompute
    (n_docs, total_tokens) exactly from the postings themselves — each
    document contributes one distinct id and one dl (dl is replicated
    across its term rows; MIN collapses the replicas, and any posting
    row of a doc carries the same dl by construction). Zero-token docs
    are recoverable too: build/append write a ``term=' '`` marker row
    per empty doc (dl=0), so the distinct-id count sees every doc. The
    schema-fallback read makes recovery on a still-empty index a no-op
    rebuild of the empty stats row rather than an AnalysisException.
    Run after a failure between `append_to_term_index`'s two writes."""
    idx = _read_with_schema_fallback(spark, path)
    per_doc = idx.groupBy(id_col).agg(F.min("dl").alias("dl"))
    per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("total_tokens"),
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_corpus_stats")


def proximity_match(
    docs: DataFrame,
    terms: list[str],
    window: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Unordered proximity search: documents where all of ``terms``
    (distinct) co-occur within a span of at most ``window`` tokens, in
    ANY order — the relaxation of `phrase_match` for "these words near
    each other" curation queries.

    Same scale shape as the phrase matcher: positional postings
    filtered to the term set above the scan, one per-document window
    ordered by position. A filtered posting at position p is an ANCHOR
    HIT iff the token window [p, p + window - 1] covers all m distinct
    terms — checked with a RANGE frame collect_set over the filtered
    postings, so term coverage is tested over the whole positional
    window, not over m consecutive postings (the consecutive-m-tuple
    formulation silently missed 3+-term matches whenever a repeated
    query term sat inside the minimal cluster, e.g. terms {a,b,c} over
    "a b b c": no consecutive triple is pairwise-distinct even though
    a@0..c@3 spans 4). n_matches counts anchor hits; first_pos is the
    earliest anchor. Deterministic, and pinned against a brute-force
    Python reference on random corpora including 3-term queries
    (`test_proximity_match_equals_python_reference`).
    """
    tset = sorted({t.lower() if lowercase else t for t in terms})
    m = len(tset)
    if m < 2:
        raise ValueError("terms must contain >= 2 distinct terms")
    if window < m:
        raise ValueError(f"window must be >= {m} (the term count)")
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)
    pos = (
        docs.select(
            F.col(id_col), F.posexplode(tok).alias("pos", "term")
        )
        .filter(F.col("term").isin(tset))
    )
    # RANGE frame: all filtered postings whose position lies in
    # [pos, pos + window - 1] — state per document is bounded by the
    # query terms' posting density inside one window, never the doc.
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rangeBetween(Window.currentRow, window - 1)
    )
    cov = pos.withColumn("__nt", F.size(F.collect_set("term").over(w)))
    return (
        cov.filter(F.col("__nt") == m)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("pos").cast("long").alias("first_pos"),
        )
    )
