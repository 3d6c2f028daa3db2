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


def skipgram_pairs(
    docs: DataFrame,
    window: int = 3,
    top_k: int = 50,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Skip-gram co-occurrence pair counts — the word2vec/GloVe training
    corpus statistic: every unordered token pair within ``window``
    positions of each other, counted over the whole corpus.

    Pair GENERATION is map-only: a nested sequence/transform expression
    emits each document's pairs inside whole-stage codegen — no
    positional self-join (the naive formulation shuffles the exploded
    positions table twice and joins it to itself; this shuffles nothing
    until the final count). Pairs are canonicalized (least, greatest)
    so "fast key" and "key fast" count together; per-pair counts are
    map-side combined, so the one shuffle carries ~|pair vocabulary|
    rows, not corpus positions. At 100 TB the output domain (bounded by
    vocab^2, in practice Zipf-concentrated) is the shuffle, which is
    the floor for this statistic.

    Returns the ``top_k`` pairs as (w1, w2, n, rank), ranked
    (n DESC, w1 ASC, w2 ASC) — deterministic TakeOrdered.
    """
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    if top_k <= 0:
        raise ValueError(f"top_k must be positive, got {top_k}")
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)
    # For i in [1, n-1]: partners j in [i+1, min(i+window, n)] — the
    # inner sequence is never descending because i <= n-1 bounds
    # i+1 <= min(i+window, n). Docs with < 2 tokens emit no pairs.
    pair_expr = (
        "CASE WHEN size(__t) >= 2 THEN "
        "flatten(transform(sequence(1, size(__t) - 1), i -> "
        f"transform(sequence(i + 1, least(i + {int(window)}, size(__t))), "
        "j -> struct("
        "least(element_at(__t, i), element_at(__t, j)) AS w1, "
        "greatest(element_at(__t, i), element_at(__t, j)) AS w2)))) "
        "ELSE array() END"
    )
    pairs = docs.select(tok.alias("__t")).select(
        F.explode(F.expr(pair_expr)).alias("p")
    )
    scored = pairs.groupBy(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    order = [F.col("n").desc(), F.col("w1").asc(), F.col("w2").asc()]
    return (
        scored.orderBy(*order)
        .limit(top_k)
        .select(
            "w1",
            "w2",
            "n",
            F.row_number().over(Window.orderBy(*order)).cast("long").alias("rank"),
        )
    )


#: Polynomial-hash modulus for token feature hashing (same constant as
#: functions/textstats.FP_MOD — any engine with 64-bit ints reproduces it).
_FEAT_MOD = 1_000_000_007


def _token_feature_expr(token_col: str, n_features: int) -> str:
    """SQL expression: hashing-trick feature id of a token column —
    polynomial rolling hash (acc*31 + ascii) mod 1e9+7, folded mod
    ``n_features``. Identical in Spark and ANSI SQL (list_reduce in
    DuckDB), unlike xxhash64/murmur which exist only in one engine."""
    return (
        f"aggregate(transform(sequence(1, length({token_col})), "
        f"i -> CAST(ascii(substring({token_col}, i, 1)) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % {_FEAT_MOD}) "
        f"% {int(n_features)}"
    )


def hashed_feature_score(
    docs: DataFrame,
    weights: DataFrame,
    n_features: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Serve a linear text classifier (fastText/logistic-style) over
    hashed token features — the standard quality-model scoring pass of
    an LLM data pipeline, reduced to its Spark shape: explode tokens,
    hash each into a FIXED feature space (the hashing trick — no vocab
    build, no dictionary shipping), join the tiny weight table, sum.

    ``weights`` is (feature_id BIGINT, weight BIGINT) — integer weights
    (fixed-point, the caller picks the scale) keep the score exact
    under any partitioning; at most ``n_features`` rows, so the join is
    always a broadcast: scoring is map-only at any corpus size, the
    per-doc sum is the only shuffle, keyed by doc — no skew (each doc
    contributes its own rows). Tokens whose feature has no weight row
    score 0. feature_id must be UNIQUE in ``weights`` (a model has one
    weight per feature); a duplicate row would multiply through the
    join and silently double-count — enforced here with a loud error.

    Returns (doc_id, n_tokens, score): score = sum over token SLOTS
    (repeats count) of weight[hash(token)].
    """
    if n_features <= 0:
        raise ValueError(f"n_features must be positive, got {n_features}")
    # Bounded check (weights is <= n_features rows by contract): a
    # duplicated feature_id would fan out the join and double-count.
    if not (
        weights.groupBy("feature_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .isEmpty()
    ):
        raise ValueError("weights must have a unique row per feature_id")
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tok).alias("__w")
    ).select(
        "doc_id", F.expr(_token_feature_expr("__w", n_features)).alias("feature_id")
    )
    joined = exploded.join(F.broadcast(weights), "feature_id", "left")
    per_doc = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.coalesce(F.sum("weight"), F.lit(0)).cast("long").alias("score"),
    )
    # Zero-token docs still get a row (n_tokens=0, score=0) — a scoring
    # pass must not silently drop documents.
    base = docs.select(F.col(id_col).alias("doc_id"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("score", F.lit(0)).cast("long").alias("score"),
    )


def bigram_surprisal(
    docs: DataFrame,
    lm_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    hot_vocab: int = 1024,
) -> DataFrame:
    """Integer-exact bigram language-model surprisal — the CCNet/Gopher
    "perplexity filter" signal without a float log anywhere: documents
    whose token transitions the reference corpus finds improbable score
    high and get filtered/downweighted.

    The LM is add-one-smoothed bigram counts over ``lm_docs`` (defaults
    to ``docs`` itself — self-scoring flags outlier documents). Each
    bigram slot (w1, w2) contributes

        floorlog2(ctx(w1) + V) - floorlog2(cnt(w1, w2) + 1)

    an integer within 1 bit of -log2 p_smoothed. floorlog2(n) is the
    binary bit length minus one — EXACT integer arithmetic (Spark
    ``length(conv(n,10,2))-1``, ANSI ``length(to_base(n,2))-1``), so the
    score is bit-identical across engines and partitionings, unlike
    ln()-based perplexity whose last-ulp libm drift breaks hash-compared
    oracles.

    Scale shape: bigram counts are one map-side-combined aggregate over
    the LM corpus (domain ~ vocab², Zipf-concentrated); context counts
    reduce from them (domain ~ vocab). The per-doc scoring join on w1
    hits the Zipf HEAD ('the' carries orders of magnitude more exploded
    rows than the tail), so context counts use the same two-tier
    hot-broadcast pattern as `corpus_freq_score`: the ``hot_vocab``
    hottest contexts broadcast, only tail rows shuffle. The (w1, w2)
    bigram join is left as a plain shuffle join — the bigram domain is
    far flatter than the unigram head (AQE skew-split covers residue).

    Returns (doc_id, n_bigrams, surprisal_bits); docs with < 2 tokens
    score (0, 0). Mean bits/bigram comparisons should cross-multiply
    (surprisal_bits * k vs n_bigrams * threshold) to stay exact.
    """
    lm = lm_docs if lm_docs is not None else docs
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)

    def doc_bigrams(frame: DataFrame, with_id: bool) -> DataFrame:
        cols = [F.col(id_col).alias("doc_id")] if with_id else []
        pairs = frame.select(*cols, tok.alias("__t")).select(
            *(["doc_id"] if with_id else []),
            F.explode(
                F.expr(
                    "CASE WHEN size(__t) >= 2 THEN "
                    "transform(sequence(1, size(__t) - 1), i -> struct("
                    "element_at(__t, i) AS w1, element_at(__t, i + 1) AS w2)) "
                    "ELSE array() END"
                )
            ).alias("p"),
        )
        return pairs.select(
            *(["doc_id"] if with_id else []),
            F.col("p.w1").alias("w1"),
            F.col("p.w2").alias("w2"),
        )

    # localCheckpoint: the head/tail tier branches below each reference
    # the LM stats, and diverging DAG branches RECOMPUTE shared subtrees
    # — without the pin the whole LM corpus scan + bigram aggregate ran
    # twice (plan audit: two TakeOrdered nodes for one hot list). The
    # checkpointed frame is the aggregated bigram table — bounded by the
    # (Zipf-concentrated) bigram vocabulary, never corpus-sized — so the
    # branches re-read a small local table instead of re-scanning the
    # corpus. The scoring side's `slots` scan is still evaluated once
    # per branch: that recompute is map-only (scan + explode, no
    # shuffle), the standard trade vs materializing corpus-sized state.
    big_counts = (
        doc_bigrams(lm, with_id=False)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("bc"))
        .localCheckpoint(eager=False)
    )
    ctx_counts = big_counts.groupBy("w1").agg(
        F.sum("bc").cast("long").alias("ctx")
    )
    # Smoothing vocabulary: distinct successor types in the LM corpus.
    v = big_counts.select(
        F.count_distinct("w2").cast("long").alias("__v")
    )

    slots = doc_bigrams(docs, with_id=True)
    hot = ctx_counts.orderBy(F.col("ctx").desc(), F.col("w1")).limit(hot_vocab)
    with_hot = slots.join(
        F.broadcast(hot.withColumnRenamed("ctx", "hot_ctx")), "w1", "left"
    )
    head = with_hot.filter(F.col("hot_ctx").isNotNull()).select(
        "doc_id", "w1", "w2", F.col("hot_ctx").alias("ctx")
    )
    tail = (
        with_hot.filter(F.col("hot_ctx").isNull())
        .select("doc_id", "w1", "w2")
        .join(ctx_counts, "w1", "left")
        .select("doc_id", "w1", "w2", F.coalesce("ctx", F.lit(0)).alias("ctx"))
    )
    with_ctx = head.unionByName(tail)
    with_bc = with_ctx.join(big_counts, ["w1", "w2"], "left").select(
        "doc_id", "ctx", F.coalesce("bc", F.lit(0)).alias("bc")
    )

    flog2 = lambda c: (  # noqa: E731
        F.length(F.conv(c.cast("string"), 10, 2)) - 1
    ).cast("long")
    scored = with_bc.crossJoin(F.broadcast(v)).select(
        "doc_id",
        (
            flog2(F.col("ctx") + F.col("__v")) - flog2(F.col("bc") + F.lit(1))
        ).alias("bits"),
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("bits").cast("long").alias("surprisal_bits"),
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("surprisal_bits", F.lit(0)).cast("long").alias("surprisal_bits"),
    )


def _bpe_merge_seq(seq: Column, left: str, right: str) -> Column:
    """Apply ONE learned BPE merge to a space-separated symbol sequence,
    greedy left-to-right, as pure string expressions: double the
    delimiter spaces so adjacent occurrences don't share boundary
    characters, replace non-overlapping ``' l  r '`` occurrences (string
    replace scans left-to-right — exactly BPE's greedy application
    order), then collapse delimiters back. Identical semantics in Spark
    and ANSI engines (validated against a Python reference), so the
    whole trainer is oracle-able."""
    padded = F.concat(F.lit(" "), F.replace(seq, F.lit(" "), F.lit("  ")), F.lit(" "))
    merged = F.replace(
        padded, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
    )
    return F.trim(F.replace(merged, F.lit("  "), F.lit(" ")))


def bpe_learn_merges(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    lowercase: bool = True,
    checkpoint_every: int = 4,
) -> DataFrame:
    """LEARN a byte-pair-encoding merge table — the actual tokenizer
    trainer loop, not just one round's statistic (`bpe_pair_counts`):
    iteratively count adjacent symbol-pair frequencies over the
    word-frequency dictionary, take the argmax pair (ties broken
    (left, right) ASC — deterministic), apply the merge greedily to
    every word's symbol sequence, repeat.

    Scale shape: the classic BPE trick bounds every iteration by the
    VOCABULARY, not the corpus — the corpus is touched once to build
    (word, freq), and each merge round is a map-only string rewrite of
    |vocab| rows plus one map-side-combined pair count whose output
    domain is ~|alphabet|² rows. The only driver data is ONE argmax row
    per round (the merge being learned — it must come to the driver; it
    parameterizes the next map). Lineage is localCheckpoint-pinned
    every ``checkpoint_every`` rounds so the rewrite chain doesn't
    re-execute from scratch as rounds accumulate.

    Stops early when no pair occurs twice (merging singletons is
    noise). Returns (step, left, right, n) — step 1-based, n the
    pair's weighted count at learn time.
    """
    merges, _frames = _bpe_train(
        docs, n_merges, text_col, lowercase, checkpoint_every
    )
    return docs.sparkSession.createDataFrame(
        merges, "step long, left string, right string, n long"
    )


def _bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str,
    lowercase: bool,
    checkpoint_every: int,
) -> tuple[list[tuple[int, str, str, int]], list[DataFrame]]:
    """The shared BPE trainer loop: returns (merges, frames) where
    frames[k] is the (w, seq, freq) vocabulary AFTER k merges (frames[0]
    is the initial character sequence dictionary; ``w`` — the original
    word — rides along untouched so `bpe_apply` can join documents to
    their final segmentations). Early-stops below pair count 2;
    len(frames) == len(merges) + 1."""
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    if checkpoint_every <= 0:
        raise ValueError(
            f"checkpoint_every must be positive, got {checkpoint_every}"
        )
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)
    vocab = (
        docs.select(F.explode(tok).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select(
            "w",
            F.expr(
                "array_join(transform(sequence(1, length(w)), "
                "i -> substring(w, i, 1)), ' ')"
            ).alias("seq"),
            "freq",
        )
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, int]] = []
    frames: list[DataFrame] = [vocab]
    cur = vocab
    for step in range(1, n_merges + 1):
        pairs = (
            cur.select(F.split("seq", " ").alias("s"), "freq")
            .filter(F.size("s") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1), "
                        "i -> struct(element_at(s, i) AS l, "
                        "element_at(s, i + 1) AS r))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").cast("long").alias("n"))
        )
        best = pairs.orderBy(F.col("n").desc(), "l", "r").limit(1).collect()
        if not best or int(best[0]["n"]) < 2:
            break
        l, r, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merges.append((step, l, r, n))
        cur = cur.select(
            "w", _bpe_merge_seq(F.col("seq"), l, r).alias("seq"), "freq"
        )
        if step % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
        frames.append(cur)
    return merges, frames


def bpe_compression_curve(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    lowercase: bool = True,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Tokenizer compression/fertility curve: corpus symbol count after
    each BPE merge round — the statistic a tokenizer-budget decision
    reads ("how many merges until tokens/word flattens"). Step 0 is the
    raw character count; step k applies the first k learned merges.

    One trainer run (`_bpe_train` — corpus scanned once, rounds bounded
    by |vocab|) plus one |vocab|-sized aggregate per step, unioned into
    a single plan, so the curve costs the trainer + n+1 tiny aggs.
    Returns (step, corpus_symbols) with corpus_symbols =
    sum(freq * symbols_in_word) — monotone non-increasing in step.
    """
    merges, frames = _bpe_train(
        docs, n_merges, text_col, lowercase, checkpoint_every
    )
    counts = [
        frame.select(
            F.lit(k).cast("long").alias("step"),
            F.coalesce(
                F.sum(F.size(F.split("seq", " ")).cast("long") * F.col("freq")),
                F.lit(0),
            )
            .cast("long")
            .alias("corpus_symbols"),
        )
        for k, frame in enumerate(frames)
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def bpe_apply(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Tokenizer SERVING: learn ``n_merges`` BPE merges on the corpus,
    then segment every document with them — per-doc BPE token counts,
    the number a sequence-packing / context-budget stage actually
    consumes. Segmentation is a JOIN, not a re-derivation: the trainer
    already holds every corpus word's final symbol sequence (frames[-1]
    keyed by ``w``), so applying the tokenizer is explode tokens ->
    equi-join the |vocab|-sized segmentation table -> sum symbols per
    doc. At 100 TB the segmentation table is vocab-sized (broadcast or
    one shuffle side), and no merge rewrite ever touches document rows.

    Returns (doc_id, n_words, n_bpe_tokens) for every input document
    (empty docs keep a (0, 0) row). n_bpe_tokens is monotone: at most
    total characters, at least n_words.
    """
    merges, frames = _bpe_train(
        docs, n_merges, text_col, lowercase, checkpoint_every
    )
    seg = frames[-1].select(
        "w", F.size(F.split("seq", " ")).cast("long").alias("n_sym")
    )
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)
    per_doc = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tok).alias("w"))
        .join(seg, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
        F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias("n_bpe_tokens"),
    )


def class_keyness(
    docs: DataFrame,
    class_col: str = "lang",
    top_k: int = 5,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Per-class keyword extraction by integer log-odds — which tokens
    are distinctive of each class (language, source, label): the
    Monroe-et-al "fightin' words" statistic, quantized to exact
    integer BITS so it is reproducible on any engine:

        keyness_bits = flog2(a+1) + flog2(d+1) - flog2(b+1) - flog2(c+1)

    where per (class, token): a = token count in the class, b = token
    count elsewhere, c = other tokens in the class, d = other tokens
    elsewhere — the add-one log-odds-ratio of the contingency table,
    each factor floored to its bit length (never overflows: no
    products, just four bit lengths, valid at ANY corpus size).

    Scale shape: one map-combined (class, token) count (the corpus's
    only full pass), token/class totals derived from it (vocab-sized
    and |classes|-sized reductions), and the final top-k rank window
    runs on the VOCAB domain partitioned by class — bounded by
    vocabulary, the corpus never passes through a window.

    Returns (class, token, n_in_class, keyness_bits, rank), ``top_k``
    rows per class, ranked (keyness_bits DESC, token ASC). Rows with a
    NULL class are dropped explicitly — a NULL-keyed group would
    silently vanish at the totals equi-join anyway; dropping at the
    scan makes that visible and keeps the filter pushed down.
    """
    if top_k <= 0:
        raise ValueError(f"top_k must be positive, got {top_k}")
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)
    cw = (
        docs.filter(F.col(class_col).isNotNull())
        .select(F.col(class_col).alias("class"), F.explode(tok).alias("w"))
        .groupBy("class", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
    )
    w_tot = cw.groupBy("w").agg(F.sum("a").cast("long").alias("nw"))
    c_tot = cw.groupBy("class").agg(F.sum("a").cast("long").alias("nc"))
    grand = cw.agg(F.sum("a").cast("long").alias("n"))

    flog2 = lambda c: (  # noqa: E731
        F.length(F.conv(c.cast("string"), 10, 2)) - 1
    ).cast("long")
    scored = (
        cw.join(w_tot, "w")
        .join(F.broadcast(c_tot), "class")
        .crossJoin(F.broadcast(grand))
        .select(
            "class",
            "w",
            "a",
            (
                flog2(F.col("a") + 1)
                + flog2((F.col("n") - F.col("nc")) - (F.col("nw") - F.col("a")) + 1)
                - flog2(F.col("nw") - F.col("a") + 1)
                - flog2(F.col("nc") - F.col("a") + 1)
            ).alias("keyness_bits"),
        )
    )
    win = Window.partitionBy("class").orderBy(
        F.col("keyness_bits").desc(), F.col("w").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(
            "class",
            F.col("w").alias("token"),
            F.col("a").alias("n_in_class"),
            "keyness_bits",
            "rank",
        )
    )


def rp_doc_embedding(
    docs: DataFrame,
    n_dims: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    seed: int = 0,
) -> DataFrame:
    """Deterministic random-projection document embedding — the bridge
    from the text tier to the ANN tier without a model: each token
    hashes to a sparse ternary row (Achlioptas sign matrix: P(+1) =
    P(-1) = 1/4, P(0) = 1/2 per dimension, drawn from the Lehmer hash
    of (token polyhash, dimension)), and a document's vector is the sum
    over its token slots. Distance structure follows the
    Johnson-Lindenstrauss sketch of token-count vectors; exact-integer
    output, so embeddings are identical on any engine/partitioning and
    the featurizer is hash-oracle-able — unlike model inference.

    Map-only until one (doc, dim)-keyed map-combined aggregate; the
    16x token-row expansion happens inside codegen (a literal-sequence
    transform), never as a join. Returns LONG format (doc_id, dim,
    val) — n_dims rows per doc including zeros, array-free so the
    driver compare and downstream pivots stay trivial; zero-token docs
    keep their n_dims zero rows (row in = rows out)."""
    if n_dims <= 0:
        raise ValueError(f"n_dims must be positive, got {n_dims}")
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)
    hashed = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tok).alias("__w")
    ).select(
        "doc_id",
        F.expr(
            f"aggregate(transform(sequence(1, length(__w)), "
            f"i -> CAST(ascii(substring(__w, i, 1)) AS BIGINT)), "
            f"CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % {_FEAT_MOD})"
        ).alias("__h"),
    )
    from usgs_lidar_spark.operators.pipeline import portable_hash_long

    cells = hashed.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_dims - 1)),
                lambda j: F.struct(
                    j.cast("long").alias("dim"),
                    (
                        portable_hash_long(
                            F.col("__h") * F.lit(17) + j, seed=seed
                        )
                        % 4
                    ).alias("__u"),
                ),
            )
        ).alias("c"),
    ).select(
        "doc_id",
        F.col("c.dim").alias("dim"),
        F.when(F.col("c.__u") == 0, F.lit(-1))
        .when(F.col("c.__u") == 2, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__v"),
    )
    summed = cells.groupBy("doc_id", "dim").agg(
        F.sum("__v").cast("long").alias("val")
    )
    base = docs.select(F.col(id_col).alias("doc_id")).crossJoin(
        F.broadcast(
            docs.sparkSession.range(n_dims).select(
                F.col("id").cast("long").alias("dim")
            )
        )
    )
    return base.join(summed, ["doc_id", "dim"], "left").select(
        "doc_id",
        "dim",
        F.coalesce("val", F.lit(0)).cast("long").alias("val"),
    )


def nb_train_bits(
    docs: DataFrame,
    label_col: Column | str,
    n_features: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """TRAIN the hashed-feature linear classifier in-engine, exactly —
    Naive-Bayes log-odds weights in integer BITS (the NB-weights half
    of the NBSVM recipe): per feature, the add-one log-odds of its
    occurrence mass under the positive vs negative class,

        w = flog2(a+1) + flog2(d+1) - flog2(b+1) - flog2(c+1)

    (a/b = the feature's token occurrences in +1/-1 docs, c/d = the
    other occurrences in +1/-1 docs — `class_keyness` applied to the
    hashing-trick feature space). flog2 is binary bit length: integer-
    exact in any engine, no products, overflow-free at any corpus size.

    ONE map-combined (feature, class) aggregate over the corpus — a
    single pass, no iteration, so unlike gradient training the whole
    procedure is trivially deterministic and SQL-oracle-able; the
    output (feature_id, weight) table feeds `hashed_feature_score`
    (serving) directly — train and serve are the same feature space by
    construction. ``label_col`` must evaluate to +1/-1.

    Returns all n_features rows (features unseen in training weigh 0).
    """
    if n_features <= 0:
        raise ValueError(f"n_features must be positive, got {n_features}")
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)
    fc = (
        docs.select(y.cast("long").alias("__y"), F.explode(tok).alias("__w"))
        .select(
            "__y",
            F.expr(_token_feature_expr("__w", n_features)).alias("feature_id"),
        )
        .groupBy("feature_id")
        .agg(
            F.sum(F.when(F.col("__y") == 1, 1).otherwise(0))
            .cast("long")
            .alias("a"),
            F.sum(F.when(F.col("__y") == 1, 0).otherwise(1))
            .cast("long")
            .alias("b"),
        )
    )
    tot = fc.agg(
        F.sum("a").cast("long").alias("ta"), F.sum("b").cast("long").alias("tb")
    )
    flog2 = lambda c: (  # noqa: E731
        F.length(F.conv(c.cast("string"), 10, 2)) - 1
    ).cast("long")
    scored = fc.crossJoin(F.broadcast(tot)).select(
        "feature_id",
        (
            flog2(F.col("a") + 1)
            + flog2(F.col("tb") - F.col("b") + 1)
            - flog2(F.col("b") + 1)
            - flog2(F.col("ta") - F.col("a") + 1)
        ).alias("weight"),
    )
    base = docs.sparkSession.range(n_features).select(
        F.col("id").cast("long").alias("feature_id")
    )
    return base.join(scored, "feature_id", "left").select(
        "feature_id",
        F.coalesce("weight", F.lit(0)).cast("long").alias("weight"),
    )


def dsir_weights_bits(
    docs: DataFrame,
    target_col: Column | str,
    n_features: int = 64,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """DSIR importance weights in integer BITS (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling", reduced
    to the engine's exact-integer recipe): per hashed token feature,
    the add-one-smoothed log-ratio of its occurrence mass under the
    TARGET distribution vs the RAW corpus,

        w = flog2(cnt_t + 1) + flog2(TR + V)
          - flog2(cnt_r + 1) - flog2(TT + V)

    (cnt_t/cnt_r = the feature's token occurrences in target / all
    docs, TT/TR their totals, V = n_features — an integer within 1 bit
    of log2(p_target(f) / p_raw(f)) under add-one smoothing). Unlike
    `nb_train_bits` this is UNSUPERVISED in the pipeline sense: the
    "label" is just membership in a small trusted target set (a quality
    corpus, a domain sample), and raw INCLUDES the target — the
    importance-ratio shape, not class log-odds. flog2 is binary bit
    length minus one: exact in any engine, no products, no overflow.

    ONE map-combined feature aggregate over the corpus (the flag rides
    each exploded token), totals as a broadcast scalar — a single pass,
    deterministic, SQL-oracle-able. Returns all ``n_features`` rows
    (feature_id, weight); features unseen anywhere get the smoothing
    prior flog2(TR+V) - flog2(TT+V). The output feeds
    `hashed_feature_score` directly, whose per-doc sum IS the DSIR
    document weight; resample by exact global rank on it
    (the `pipe_dsir_select` composition).

    ``target_col`` must evaluate to a non-null boolean per row.
    """
    if n_features <= 0:
        raise ValueError(f"n_features must be positive, got {n_features}")
    flag = F.col(target_col) if isinstance(target_col, str) else target_col
    tok = ws_tokens(text_col)
    if lowercase:
        tok = F.transform(tok, F.lower)
    fc = (
        docs.select(
            flag.cast("int").alias("__t"), F.explode(tok).alias("__w")
        )
        .select(
            "__t",
            F.expr(_token_feature_expr("__w", n_features)).alias(
                "feature_id"
            ),
        )
        .groupBy("feature_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cr"),
            F.sum("__t").cast("long").alias("ct"),
        )
    )
    base = docs.sparkSession.range(n_features).select(
        F.col("id").cast("long").alias("feature_id")
    )
    # Pin: `filled` is referenced twice below (the totals aggregate AND
    # the returned crossJoin). Without the pin the corpus-wide
    # explode+groupBy subtree can execute once per reference — the same
    # NO_AQE double-execution trap contaminated_docs and
    # pipe_dsir_select pin against — breaking the "single pass" claim.
    filled = base.join(fc, "feature_id", "left").select(
        "feature_id",
        F.coalesce("cr", F.lit(0)).cast("long").alias("cr"),
        F.coalesce("ct", F.lit(0)).cast("long").alias("ct"),
    ).localCheckpoint(eager=False)
    tot = filled.agg(
        F.sum("cr").cast("long").alias("tr"),
        F.sum("ct").cast("long").alias("tt"),
    )
    flog2 = lambda c: (  # noqa: E731
        F.length(F.conv(c.cast("string"), 10, 2)) - 1
    ).cast("long")
    v = F.lit(int(n_features))
    return filled.crossJoin(F.broadcast(tot)).select(
        "feature_id",
        (
            flog2(F.col("ct") + 1)
            + flog2(F.col("tr") + v)
            - flog2(F.col("cr") + 1)
            - flog2(F.col("tt") + v)
        ).cast("long").alias("weight"),
    )


def derive_piece_vocab(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 64,
    min_len: int = 2,
    max_len: int = 5,
) -> DataFrame:
    """Deterministic substring piece vocabulary: the ``vocab_size`` most
    frequent character substrings of length [min_len, max_len] over the
    corpus, ties broken lexicographically. The seed-from-the-data
    convention the quantizer paths use, applied to segmentation — train
    with a real unigram-LM EM loop when quality matters; the point here
    is an exactly-reproducible vocab both engines derive identically.

    Plan: substring explode (the `char_shingles` shape, one row per
    (position, length)), hash-aggregate counts with map-side combine,
    then a DISTRIBUTED top-k (orderBy + limit -> TakeOrderedAndProject,
    the o3_topk precedent) — never a global row_number window over the
    full distinct-piece set."""
    d = docs.select(F.col(text_col).alias("__t")).filter(
        F.length("__t") >= min_len
    )
    cand = (
        d.select(
            "__t",
            F.explode(F.sequence(F.lit(1), F.length("__t"))).alias("__s"),
        )
        .select(
            "__t",
            "__s",
            F.explode(
                F.sequence(F.lit(int(min_len)), F.lit(int(max_len)))
            ).alias("__l"),
        )
        .filter(F.col("__s") + F.col("__l") - 1 <= F.length("__t"))
        .select(F.expr("substring(__t, __s, __l)").alias("piece"))
    )
    freq = cand.groupBy("piece").agg(
        F.count(F.lit(1)).cast("long").alias("freq")
    )
    return freq.orderBy(F.desc("freq"), F.asc("piece")).limit(int(vocab_size))


def _viterbi_docs_frame(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    max_chars: int | None,
    fn_name: str,
) -> DataFrame:
    """(__id, __t, __n) frame shared by the two Viterbi rungs, with the
    max_chars bound as a LAZY per-row guard riding the existing scan
    (ADVICE r14: the first draft ran an eager max(length) agg + collect
    at plan-construction time — a second full text scan on every call).
    An over-long row trips `raise_error` AT EXECUTION, failing the job
    with the offending id/length before the quadratic fold runs for it;
    valid corpora pay zero extra work and the plan stays lazy. None
    disables the bound (the caller owns the quadratic risk)."""
    n = F.length(text_col).cast("int")
    if max_chars is not None:
        n = F.when(
            n > int(max_chars),
            F.raise_error(
                F.concat(
                    F.lit(f"{fn_name}: document "),
                    F.col(id_col).cast("string"),
                    F.lit(" is "),
                    F.length(text_col).cast("string"),
                    F.lit(
                        f" chars, over max_chars={int(max_chars)}; the "
                        "position fold is quadratic in document length "
                        "(see docstring) — raise max_chars deliberately "
                        "or pre-split long documents"
                    ),
                )
            ).cast("int"),
        ).otherwise(n)
    return docs.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
        n.alias("__n"),
    ).filter(F.col("__n") > 0)


def viterbi_min_pieces(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 2,
    max_len: int = 5,
    max_chars: int = 100_000,
) -> DataFrame:
    """OPTIMAL (Viterbi / shortest-path) segmentation of every document
    against a piece vocabulary — the objective greedy left-to-right BPE
    tokenization (`bpe_apply`) approximates: the minimum number of
    pieces covering the text, where a piece is any vocab entry or a
    single-character fallback (SentencePiece's unigram-LM Viterbi step,
    Kudo 2018 arXiv:1804.10959, with unit piece costs — the exact
    integer objective both engines reproduce bit-for-bit; weighted
    -log p costs would need cross-engine-identical logs, which no
    engine guarantees).

    Plan: the match LATTICE is relational — substring explode joined
    against the broadcast vocab gives (doc, start, end) spans, packed
    one row per doc (`collect_list`, bounded by text length x piece
    lengths); the DP itself is a single JVM-side higher-order fold
    (`F.aggregate` over char positions — the events_ewma_dyadic exact-
    sequential-fold precedent, no UDF): cost[i] = least(min over vocab
    spans ending at i of cost[start-1] + 1, cost[i-1] + 1), the
    single-char fallback making every position reachable so the fold
    never sees an empty min (array_min of no candidates is NULL and
    `least` skips NULLs — pinned semantics in BOTH engines). One
    corpus-keyed shuffle (the span pack), no driver participation.

    COMPLEXITY, honestly (ADVICE r13): the fold's accumulator is the
    whole cost prefix, appended one element per position with
    `concat(acc, array(...))` — a copy of the accumulator per step, so
    per-doc work is O(len^2 + len x |spans|) array churn, QUADRATIC in
    document length, not the linear DP a mutable-array engine runs
    (the DuckDB oracle's `list_append` accumulation has the identical
    shape, which is exactly why cross-engine parity holds). Fine at
    typical web-document lengths; a single 100k+-char outlier makes
    the fold quadratic in both time and transient memory, so documents
    longer than ``max_chars`` are REJECTED LOUDLY — a lazy per-row
    `raise_error` guard riding the existing scan (no extra corpus
    pass; the job fails at execution with the offending id/length),
    never a silent truncation, which would report a wrong optimum.
    Raise the cap deliberately, or pre-split pathological documents,
    when the corpus is known-heavy. The DuckDB oracle replays the identical
    fold with `list_reduce` (`pipe` prefix queries' lambda tier), so
    optimality itself is hash-checked, not approximated.

    Output: (id, n_chars, n_pieces, compression = n_chars / n_pieces
    as the correctly-rounded double of two exact integers)."""
    d = _viterbi_docs_frame(
        docs, text_col, id_col, max_chars, "viterbi_min_pieces"
    )
    cand = (
        d.select(
            "__id",
            "__t",
            "__n",
            F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("__s"),
        )
        .select(
            "__id",
            "__t",
            "__n",
            "__s",
            F.explode(
                F.sequence(F.lit(int(min_len)), F.lit(int(max_len)))
            ).alias("__l"),
        )
        .filter(F.col("__s") + F.col("__l") - 1 <= F.col("__n"))
        .select(
            "__id",
            "__s",
            (F.col("__s") + F.col("__l") - 1).alias("__e"),
            F.expr("substring(__t, __s, __l)").alias("piece"),
        )
    )
    spans = cand.join(F.broadcast(vocab.select("piece")), "piece").select(
        "__id",
        F.struct(F.col("__s").alias("s"), F.col("__e").alias("e")).alias(
            "__sp"
        ),
    )
    packs = spans.groupBy("__id").agg(F.collect_list("__sp").alias("__spans"))
    base = d.join(packs, "__id", "left").withColumn(
        "__spans",
        F.coalesce(
            F.col("__spans"),
            F.array().cast("array<struct<s:int,e:int>>"),
        ),
    )
    one = F.lit(1).cast("long")
    costs = F.aggregate(
        F.sequence(F.lit(1), F.col("__n")),
        F.array(F.lit(0).cast("long")),
        lambda acc, i: F.concat(
            acc,
            F.array(
                F.least(
                    F.array_min(
                        F.transform(
                            F.filter(
                                F.col("__spans"), lambda sp: sp["e"] == i
                            ),
                            lambda sp: F.element_at(acc, sp["s"]) + one,
                        )
                    ),
                    F.element_at(acc, i) + one,
                )
            ),
        ),
    )
    return base.select(
        F.col("__id").alias(id_col),
        F.col("__n").cast("long").alias("n_chars"),
        F.element_at(costs, F.col("__n") + 1).alias("n_pieces"),
        (
            F.col("__n").cast("double")
            / F.element_at(costs, F.col("__n") + 1)
        ).alias("compression"),
    )


def viterbi_min_cost(
    docs: DataFrame,
    vocab: DataFrame,
    fallback_cost: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    cost_col: str = "cost",
    min_len: int = 2,
    max_len: int = 5,
    max_chars: int = 100_000,
) -> DataFrame:
    """WEIGHTED Viterbi segmentation — `viterbi_min_pieces` with an
    integer cost per vocab piece instead of unit costs: the minimum
    TOTAL COST cover of each document, where a span costs its vocab
    row's ``cost_col`` and the single-char fallback costs
    ``fallback_cost``. This is the quality-aware rung of the unigram-LM
    Viterbi step (Kudo 2018, arXiv:1804.10959): real tokenizers charge
    -log p(piece); cross-engine logs don't reproduce bit-for-bit, so
    the engine-exact stand-in is any INTEGER cost schedule — the
    registered query uses frequency rank (cost = the piece's 1-based
    rank in `derive_piece_vocab`'s freq-desc/piece-asc order, fallback
    = vocab_size + 1), which preserves the -log p ORDERING (rank is
    monotone in frequency) while keeping the DP exact-integer and
    therefore oracle-hashable. Unit costs are the special case
    cost=1/fallback=1, and this function degenerates to
    `viterbi_min_pieces`' optimum value then.

    Plan and complexity are `viterbi_min_pieces`' exactly (lattice =
    substring explode x broadcast vocab, one span pack per doc, one
    JVM-side sequential fold carrying (s, e, w) structs; the fold's
    accumulator copy is quadratic in doc length — same honest caveat —
    so ``max_chars`` rejects outliers loudly via the lazy per-row scan guard).

    Output: (id, n_chars, total_cost, cost_per_char = the correctly-
    rounded double of two exact integers)."""
    if fallback_cost is None or int(fallback_cost) <= 0:
        raise ValueError(
            f"fallback_cost must be a positive integer, got {fallback_cost}"
        )
    d = _viterbi_docs_frame(
        docs, text_col, id_col, max_chars, "viterbi_min_cost"
    )
    cand = (
        d.select(
            "__id",
            "__t",
            "__n",
            F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("__s"),
        )
        .select(
            "__id",
            "__t",
            "__n",
            "__s",
            F.explode(
                F.sequence(F.lit(int(min_len)), F.lit(int(max_len)))
            ).alias("__l"),
        )
        .filter(F.col("__s") + F.col("__l") - 1 <= F.col("__n"))
        .select(
            "__id",
            "__s",
            (F.col("__s") + F.col("__l") - 1).alias("__e"),
            F.expr("substring(__t, __s, __l)").alias("piece"),
        )
    )
    spans = cand.join(
        F.broadcast(
            vocab.select("piece", F.col(cost_col).cast("long").alias("__w"))
        ),
        "piece",
    ).select(
        "__id",
        F.struct(
            F.col("__s").alias("s"),
            F.col("__e").alias("e"),
            F.col("__w").alias("w"),
        ).alias("__sp"),
    )
    packs = spans.groupBy("__id").agg(F.collect_list("__sp").alias("__spans"))
    base = d.join(packs, "__id", "left").withColumn(
        "__spans",
        F.coalesce(
            F.col("__spans"),
            F.array().cast("array<struct<s:int,e:int,w:long>>"),
        ),
    )
    fb = F.lit(int(fallback_cost)).cast("long")
    costs = F.aggregate(
        F.sequence(F.lit(1), F.col("__n")),
        F.array(F.lit(0).cast("long")),
        lambda acc, i: F.concat(
            acc,
            F.array(
                F.least(
                    F.array_min(
                        F.transform(
                            F.filter(
                                F.col("__spans"), lambda sp: sp["e"] == i
                            ),
                            lambda sp: F.element_at(acc, sp["s"]) + sp["w"],
                        )
                    ),
                    F.element_at(acc, i) + fb,
                )
            ),
        ),
    )
    return base.select(
        F.col("__id").alias(id_col),
        F.col("__n").cast("long").alias("n_chars"),
        F.element_at(costs, F.col("__n") + 1).alias("total_cost"),
        (
            F.element_at(costs, F.col("__n") + 1).cast("double")
            / F.col("__n")
        ).alias("cost_per_char"),
    )
