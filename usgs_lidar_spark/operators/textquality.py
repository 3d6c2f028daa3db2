"""Repetition / chunking / corpus-frequency text operators.

The Gopher and C4 cleaning pipelines filter documents on *repetition*
signals (fraction of duplicated n-grams, dominance of the single most
frequent n-gram) and on *rarity* signals (documents made of tokens the
corpus has barely seen). This module provides those signals plus the
token-window chunker a training/RAG pipeline uses to split documents,
all as pure DataFrame compositions:

* every per-document metric is an explode -> groupBy(doc_id[, gram])
  aggregation — linear in corpus size, shuffled on (doc_id, gram) so a
  1000-executor cluster spreads even very hot documents;
* the corpus-frequency join is two-tier: the top `hot_vocab` tokens by
  count (exactly the keys that would skew a shuffle join — 'the', 'and'
  carry orders of magnitude more exploded rows than the tail) are
  broadcast, and only tail-token rows take the shuffle path;
* everything stays integer-exact until one final division, so results
  are bit-identical under any partitioning and across engines (no ln():
  libm rounding differs between engines in the last ulp, which is fatal
  for hash-compared oracles — rarity is scored as mean corpus frequency
  instead of mean log-prob).

Reference parity: the reference has no text tier; these extend the
north-star training-data scope (BASELINE.json) the same way the dedup /
similarity modules do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from usgs_lidar_spark.functions.textstats import ws_tokens


def _ngrams(tokens: Column, n: int) -> Column:
    """Word n-grams as space-joined strings; empty array when the doc has
    fewer than ``n`` tokens. Pure expression (sequence + transform), so
    it stays inside whole-stage codegen."""
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    gram = lambda i: F.array_join(F.slice(tokens, i + 1, n), " ")  # noqa: E731
    return F.when(F.size(tokens) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def repetition_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition signals over word n-grams.

    Returns one row per document: ``n_tokens``, ``type_token_ratio``
    (distinct/total unigrams), ``top_bigram_frac`` (share of bigram
    slots taken by the single most frequent bigram) and
    ``dup_trigram_frac`` (share of trigram slots occupied by a repeat
    of an earlier trigram). Documents too short for an n-gram get 0.0
    for that metric — a short doc is not "repetitive".

    Scale: two explode->count aggregations keyed by (doc, gram). No
    per-doc state ever materializes as an array on one executor; the
    max/distinct reductions are partial-aggregated map-side. A pathological
    single document is still spread across partitions until the final
    per-doc rollup, which carries 4 longs per gram, not the grams.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), ws_tokens(text_col).alias("t")
    )
    uni = toks.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("long").alias("n_types"),
    )

    big = (
        toks.select("doc_id", F.explode(_ngrams(F.col("t"), 2)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.max("c").alias("top_bigram_n"),
        )
    )
    tri = (
        toks.select("doc_id", F.explode(_ngrams(F.col("t"), 3)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_trigrams"),
            (F.sum("c") - F.count(F.lit(1))).alias("dup_trigram_n"),
        )
    )

    out = (
        uni.join(big, "doc_id", "left")
        .join(tri, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.when(F.col("n_tokens") > 0,
                   F.col("n_types").cast("double") / F.col("n_tokens"))
            .otherwise(F.lit(0.0))
            .alias("type_token_ratio"),
            F.when(F.col("n_bigrams").isNotNull() & (F.col("n_bigrams") > 0),
                   F.col("top_bigram_n").cast("double") / F.col("n_bigrams"))
            .otherwise(F.lit(0.0))
            .alias("top_bigram_frac"),
            F.when(F.col("n_trigrams").isNotNull() & (F.col("n_trigrams") > 0),
                   F.col("dup_trigram_n").cast("double") / F.col("n_trigrams"))
            .otherwise(F.lit(0.0))
            .alias("dup_trigram_frac"),
        )
    )
    return out


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token windows (the RAG / training
    chunker): chunk ``i`` covers tokens ``[i*stride, i*stride+chunk_tokens)``,
    and every start strictly inside the document yields a chunk, so the
    tail is kept as a short final chunk. Empty documents yield no rows.

    Returns (doc_id, chunk_id, start_tok, n_chunk_tokens, chunk_text).

    Scale: map-only — sequence+posexplode+slice are pure expressions, no
    shuffle, no UDF; output row count is ~n_tokens/stride per doc. The
    overlap re-materializes at most chunk_tokens/stride x the input
    bytes, the standard cost of striding.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), ws_tokens(text_col).alias("t")
    ).filter(F.size("t") > 0)
    starts = F.sequence(F.lit(0), F.size("t") - 1, F.lit(stride))
    chunks = toks.select(
        "doc_id",
        F.col("t"),
        F.posexplode(starts).alias("chunk_id", "start_tok"),
    )
    piece = F.slice(F.col("t"), F.col("start_tok") + 1, chunk_tokens)
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def corpus_freq_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hot_vocab: int = 1024,
    rare_threshold: int = 3,
) -> DataFrame:
    """Rarity scoring against the corpus's own unigram distribution.

    Per document: ``mean_token_count`` (average over token slots of how
    often that token appears in the whole corpus — low means the doc is
    made of tokens the corpus rarely sees) and ``rare_frac`` (fraction
    of token slots whose token occurs < ``rare_threshold`` times
    corpus-wide). Integer sums divided once, so bit-deterministic.

    Scale: the count lookup is the skew problem of text processing — the
    head of a Zipf distribution ('the') can be 1e6x the tail, so a naive
    shuffle join on token puts the whole head on one reducer. Two tiers:
    the ``hot_vocab`` most frequent tokens broadcast (they are few by
    construction and carry most of the exploded rows), and only the
    cache-miss rows — tail tokens, roughly uniform — take the shuffle
    join. Identical results, no hot partition.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(ws_tokens(text_col)).alias("w")
    )
    counts = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    hot = counts.orderBy(F.col("cnt").desc(), F.col("w")).limit(hot_vocab)

    with_hot = tok.join(
        F.broadcast(hot.withColumnRenamed("cnt", "hot_cnt")), "w", "left"
    )
    head = with_hot.filter(F.col("hot_cnt").isNotNull()).select(
        "doc_id", "w", F.col("hot_cnt").alias("cnt")
    )
    tail = (
        with_hot.filter(F.col("hot_cnt").isNull())
        .select("doc_id", "w")
        .join(counts, "w")
        .select("doc_id", "w", "cnt")
    )
    scored = head.unionByName(tail)

    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("cnt").alias("cnt_sum"),
        F.sum(F.when(F.col("cnt") < rare_threshold, 1).otherwise(0)).alias("rare_n"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        (F.col("cnt_sum").cast("double") / F.col("n_tokens")).alias(
            "mean_token_count"
        ),
        (F.col("rare_n").cast("double") / F.col("n_tokens")).alias("rare_frac"),
    )


def threshold_sweep(
    df: DataFrame,
    score_col: Column | str,
    weight_col: Column | str | None = None,
    resolution: int = 1000,
) -> DataFrame:
    """Filter-calibration sweep: for every observed score bucket, what a
    ``score >= threshold`` filter would KEEP — document count and
    (optionally) a weight such as token count. The tuning table a
    quality-filtering pipeline reads to pick its cutoff ("0.55 keeps 71%
    of docs / 64% of tokens").

    Scores bucket to ``floor(score * resolution)`` integer units first,
    so all downstream arithmetic is exact-integer; per-bucket partial
    aggregation shuffles at most ``resolution+1`` rows regardless of
    corpus size, and the suffix-sum window then runs over that bounded
    bucket domain — a single-task sort of <= resolution rows, which is
    the intended shape (the DATA never passes through it). Returns
    (bucket, threshold-inclusive keep stats): ``score_bucket``,
    ``n_docs`` in the bucket, ``n_kept`` and ``weight_kept`` at
    ``score >= bucket/resolution``."""
    from pyspark.sql import Window

    if resolution <= 0:
        raise ValueError(f"resolution must be positive, got {resolution}")
    s = F.col(score_col) if isinstance(score_col, str) else score_col
    w = (
        F.lit(1)
        if weight_col is None
        else (F.col(weight_col) if isinstance(weight_col, str) else weight_col)
    )
    bucketed = df.select(
        F.floor(s * resolution).cast("long").alias("score_bucket"),
        w.cast("long").alias("__w"),
    )
    per_bucket = bucketed.groupBy("score_bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__w").alias("__wsum"),
    )
    suffix = Window.orderBy(F.col("score_bucket").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_bucket.select(
        "score_bucket",
        "n_docs",
        F.sum("n_docs").over(suffix).alias("n_kept"),
        F.sum("__wsum").over(suffix).alias("weight_kept"),
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 30,
    lowercase: bool = True,
) -> DataFrame:
    """One byte-pair-encoding merge-round statistic at corpus scale:
    adjacent character-pair frequencies, aggregated over the
    WORD-FREQUENCY dictionary rather than the raw text — the classic
    BPE preprocessing trick (count each distinct word once, weight by
    its corpus frequency) that bounds the expensive character stage by
    |vocab|, not corpus tokens. This is the statistic a tokenizer
    trainer computes to pick its next merge; at 100 TB the first
    aggregate's shuffle is the vocabulary (tens of millions of rows,
    map-side combined from trillions of tokens) and the second is the
    pair domain (|vocab| * avg word length rows in, ~|alphabet|^2 rows
    out, map-side combined again). No per-document state, no UDF.

    Returns the ``top_k`` pairs as (pair, n, rank), ranked
    (n DESC, pair ASC) — deterministic, TakeOrdered, never a full sort.
    1-character words contribute no pairs (the CASE guard matters:
    Spark's sequence(1, 0) is the DESCENDING [1, 0], not empty)."""
    if top_k <= 0:
        raise ValueError(f"top_k must be positive, got {top_k}")
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)
    words = (
        docs.select(F.explode(tok).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.select(
        F.explode(
            F.expr(
                "CASE WHEN length(w) >= 2 THEN "
                "transform(sequence(1, length(w) - 1),"
                " i -> substring(w, i, 2)) "
                "ELSE array() END"
            )
        ).alias("pair"),
        "freq",
    )
    scored = pairs.groupBy("pair").agg(
        F.sum("freq").cast("long").alias("n")
    )
    order = [F.col("n").desc(), F.col("pair").asc()]
    return (
        scored.orderBy(*order)
        .limit(top_k)
        .select(
            "pair",
            "n",
            F.row_number().over(Window.orderBy(*order))
            .cast("long")
            .alias("rank"),
        )
    )
