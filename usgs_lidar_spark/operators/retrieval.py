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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from usgs_lidar_spark.functions.textstats import ws_tokens

#: Integer-idf scale: idf(term) = IDF_SCALE div df(term).
IDF_SCALE = 10**9


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
    # limit-k first (TakeOrdered — per-partition heads, k-row merge);
    # the rank window then orders <= k rows, not the corpus.
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            "n_hit_terms",
            "score",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), F.col(id_col).asc()))
            .cast("long")
            .alias("rank"),
        )
    )
