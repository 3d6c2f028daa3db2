"""Round 8+ LLM-data tier: skipgrams, hashed classifier, surprisal, BPE learn/tokenize/pack, NB, DSIR select, kmeans steps, simhash twins, source overlap, bootstrap.

Mechanically split from plans/queries.py (round 11) — query function
source text is byte-identical to the single-file original, so every
REPLICA fingerprint (sha256 of query source + oracle SQL) is unchanged.
Registration happens at import time via `registry.query`; the import
order is fixed by plans/queries.py (the aggregator), preserving the
original definition order and every backward ORACLE[...] reference.
"""

from __future__ import annotations

from usgs_lidar_spark.plans.registry import (
    DataFrame,
    F,
    ORACLE,
    SparkSession,
    Window,
    _cached_index_path,
    _t,
    query,
)
from usgs_lidar_spark.plans.q1_classic import (
    _SHINGLE_CTE,
)
from usgs_lidar_spark.plans.q2_ann_pipeline import (
    _LEHMER_BUCKET,
    _LEHMER_STREAM,
    _cos4,
)
from usgs_lidar_spark.plans.q4_graph_search import (
    _FOLD64,
    _LEHMER_LONG,
)

# =====================================================================
# Round 8 continuation: corpus statistics + quality-model scoring +
# span-level dedup — the embedding-training / LM-filter / passage-dedup
# stages of the training-data pipeline.
# =====================================================================

_TOK_LOWER_SQL = (
    "list_transform(regexp_split_to_array(trim(text), '\\s+'), w -> lower(w))"
)


@query(
    "text_skipgram_pairs",
    oracle=f"""
    WITH t AS (
        SELECT {_TOK_LOWER_SQL} AS tk
        FROM documents WHERE length(trim(text)) > 0
    ), pos AS (
        SELECT tk, unnest(range(1, len(tk))) AS i FROM t WHERE len(tk) >= 2
    ), offs AS (SELECT unnest(range(1, 4)) AS d),
    pairs AS (
        SELECT least(tk[i], tk[i + d]) AS w1,
               greatest(tk[i], tk[i + d]) AS w2
        FROM pos CROSS JOIN offs WHERE i + d <= len(tk)
    ), counted AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
        FROM pairs GROUP BY w1, w2
    )
    SELECT w1, w2, n,
           CAST(row_number() OVER (ORDER BY n DESC, w1, w2) AS BIGINT) AS rank
    FROM counted ORDER BY n DESC, w1, w2 LIMIT 50
    """,
)
def text_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence pair counts (window 3, top 50) — the
    word2vec/GloVe embedding-training corpus statistic
    (`operators/textquality.skipgram_pairs`). Pair generation is a
    map-only nested-sequence expression (no positional self-join); the
    one shuffle carries the map-combined pair vocabulary. Deterministic
    ranking (n DESC, w1, w2)."""
    from usgs_lidar_spark.operators.textquality import skipgram_pairs

    return skipgram_pairs(
        _t(spark, sf_dir, "documents"), window=3, top_k=50
    )


@query(
    "text_hashed_classifier",
    oracle=f"""
    WITH weights AS (
        SELECT CAST(f AS BIGINT) AS feature_id,
               CAST({_LEHMER_LONG("f")} % 2001 - 1000 AS BIGINT) AS weight
        FROM (SELECT unnest(range(0, 256)) AS f)
    ), tokens AS (
        SELECT doc_id, unnest({_TOK_LOWER_SQL}) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), feats AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(w) + 1),
                                      i -> CAST(ascii(w[i]) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007) % 256
                   AS feature_id
        FROM tokens
    ), scored AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(coalesce(sum(weight), 0) AS BIGINT) AS score
        FROM feats LEFT JOIN weights USING (feature_id)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(s.score, 0) AS BIGINT) AS score
    FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
    """,
)
def text_hashed_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier SERVING over hashed token features
    (`operators/textquality.hashed_feature_score`): the fastText-style
    scoring pass of a data pipeline — hashing-trick features (256-way
    polynomial hash, no vocabulary build), broadcast integer weight
    table, map-only scoring, one doc-keyed sum. The weight table here
    is a deterministic Lehmer-derived fixture (what matters is the
    serving plumbing; real weights arrive as a dim table the same
    way), so both engines rebuild identical weights."""
    from usgs_lidar_spark.operators.pipeline import portable_hash_long
    from usgs_lidar_spark.operators.textquality import hashed_feature_score

    weights = spark.range(256).select(
        F.col("id").cast("long").alias("feature_id"),
        (portable_hash_long(F.col("id")) % 2001 - 1000)
        .cast("long")
        .alias("weight"),
    )
    return hashed_feature_score(
        _t(spark, sf_dir, "documents"), weights, n_features=256
    )


@query(
    "text_bigram_surprisal",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOK_LOWER_SQL} AS tk
        FROM documents WHERE length(trim(text)) > 0
    ), slots AS (
        SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
        FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
              FROM t WHERE len(tk) >= 2)
    ), bc AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS bc
        FROM slots GROUP BY w1, w2
    ), ctx AS (
        SELECT w1, CAST(sum(bc) AS BIGINT) AS ctx FROM bc GROUP BY w1
    ), v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM bc),
    scored AS (
        SELECT s.doc_id,
               (length(to_base(c.ctx + v.v, 2)) - 1)
               - (length(to_base(b.bc + 1, 2)) - 1) AS bits
        FROM slots s
        JOIN bc b USING (w1, w2)
        JOIN ctx c USING (w1)
        CROSS JOIN v
    ), per AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(bits) AS BIGINT) AS surprisal_bits
        FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(coalesce(p.surprisal_bits, 0) AS BIGINT) AS surprisal_bits
    FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
    """,
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact bigram LM surprisal — the CCNet/Gopher perplexity
    filter without a float log (`operators/textquality.
    bigram_surprisal`): add-one-smoothed self-scored bigram LM, each
    slot contributing floorlog2(ctx+V) - floorlog2(cnt+1) (binary bit
    length, exact in both engines), so the quality signal is
    bit-stable under any partitioning. Zipf-head context lookups take
    the two-tier hot-broadcast join; corpus stats are map-combined
    aggregates."""
    from usgs_lidar_spark.operators.textquality import bigram_surprisal

    return bigram_surprisal(_t(spark, sf_dir, "documents"))


@query(
    "dedup_chunk_reassemble",
    oracle="""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
        FROM documents WHERE length(trim(text)) > 0
    ), ch AS (
        SELECT doc_id, CAST(s // 4 AS BIGINT) AS chunk_id,
               array_to_string(list_slice(tk, s + 1, s + 4), ' ') AS ct
        FROM (SELECT doc_id, tk, unnest(range(0, len(tk), 4)) AS s FROM t)
    ), ranked AS (
        SELECT doc_id, chunk_id, ct,
               row_number() OVER (PARTITION BY ct
                                  ORDER BY doc_id, chunk_id) AS rn
        FROM ch
    ), kept AS (SELECT doc_id, chunk_id, ct FROM ranked WHERE rn = 1),
    tot AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
        FROM ch GROUP BY doc_id
    ), kp AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(ct, ' ' ORDER BY chunk_id) AS new_text
        FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(tot.n_chunks, 0) AS BIGINT) AS n_chunks,
           CAST(coalesce(kp.n_kept, 0) AS BIGINT) AS n_kept,
           coalesce(kp.new_text, '') AS new_text
    FROM documents d
    LEFT JOIN tot ON d.doc_id = tot.doc_id
    LEFT JOIN kp ON d.doc_id = kp.doc_id
    """,
)
def dedup_chunk_reassemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document passage dedup with reassembly (Lee et al. span
    dedup at 4-token chunk granularity, `operators/dedup.
    chunk_dedup_docs`): each distinct chunk survives only at its first
    corpus occurrence (min (doc_id, chunk_id) — map-combinable
    election over sha256 digests, text never shuffles), then documents
    rebuild from their surviving chunks in order. ~6% of chunks at
    sf0.01 are cross-doc duplicates, so the pass visibly rewrites
    texts. Every input doc returns a row (row in = row out)."""
    from usgs_lidar_spark.operators.dedup import chunk_dedup_docs

    return chunk_dedup_docs(
        _t(spark, sf_dir, "documents"), chunk_tokens=4
    )


def _bpe_oracle_sql(n_merges: int) -> str:
    """Programmatically unrolled DuckDB oracle for `bpe_learn_merges`:
    one (pairs, best, seq) CTE round per merge, replaying the same
    greedy space-doubling string rewrite the Spark trainer applies."""
    ctes = [
        "vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM ("
        "SELECT unnest(list_transform(regexp_split_to_array(trim(text), "
        "'\\s+'), x -> lower(x))) AS w FROM documents "
        "WHERE length(trim(text)) > 0) GROUP BY w)",
        "seq1 AS (SELECT w, array_to_string(list_transform("
        "range(1, length(w) + 1), i -> w[i]), ' ') AS seq, freq FROM vocab)",
    ]
    for k in range(1, n_merges + 1):
        ctes.append(
            f"pairs{k} AS (SELECT s[i] AS l, s[i + 1] AS r, "
            f"CAST(sum(freq) AS BIGINT) AS n FROM ("
            f"SELECT s, freq, unnest(range(1, len(s))) AS i FROM ("
            f"SELECT string_split(seq, ' ') AS s, freq FROM seq{k})) "
            f"GROUP BY s[i], s[i + 1])"
        )
        ctes.append(
            f"best{k} AS (SELECT l, r, n FROM pairs{k} "
            f"WHERE n >= 2 ORDER BY n DESC, l, r LIMIT 1)"
        )
        # LEFT JOIN ON TRUE, not CROSS JOIN: when a merge round
        # early-stops (best{k} empty — no pair occurs twice), the
        # trainer keeps the last vocabulary, so seq{k+1} must fall back
        # to seq{k} unchanged. A CROSS JOIN against the empty best{k}
        # would empty seq{k+1} and report zero symbols/segmentations
        # for every later step — a false mismatch vs the Spark trainer
        # on any corpus that exhausts its mergeable pairs.
        ctes.append(
            f"seq{k + 1} AS (SELECT w, CASE WHEN b.l IS NULL THEN seq "
            f"ELSE trim(replace(replace("
            f"' ' || replace(seq, ' ', '  ') || ' ', "
            f"' ' || b.l || '  ' || b.r || ' ', "
            f"' ' || b.l || b.r || ' '), '  ', ' ')) END AS seq, freq "
            f"FROM seq{k} LEFT JOIN best{k} b ON TRUE)"
        )
    unions = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS step, l AS left, r AS right, n "
        f"FROM best{k}"
        for k in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


@query("text_bpe_learn_merges", oracle=_bpe_oracle_sql(4))
def text_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE tokenizer TRAINER loop (4 merge rounds) —
    `operators/textquality.bpe_learn_merges`: iterative argmax pair +
    greedy merge application over the word-frequency dictionary.
    Every round is bounded by |vocab| (the corpus is scanned once);
    only the single learned (left, right, n) row reaches the driver
    per round — it parameterizes the next map. The oracle unrolls the
    same four rounds as CTEs over the same space-doubling string
    rewrite, so pair counts, argmax tie-breaks, AND the greedy
    application order are all value-pinned."""
    from usgs_lidar_spark.operators.textquality import bpe_learn_merges

    return bpe_learn_merges(_t(spark, sf_dir, "documents"), n_merges=4)


def _bpe_curve_oracle_sql(n_merges: int) -> str:
    """Oracle for `bpe_compression_curve`: the same unrolled trainer CTEs
    as `_bpe_oracle_sql`, finishing with one symbol-count aggregate per
    step (step 0 = raw characters)."""
    base = _bpe_oracle_sql(n_merges)
    ctes = base[: base.rindex("\n")]  # strip the merges-union tail
    # Step 0 (raw characters) always exists; step k >= 1 exists ONLY if
    # merge k was actually learned (the trainer early-stops and emits
    # fewer curve rows when no pair occurs twice). The EXISTS guard +
    # GROUP BY makes the row vanish with best{k} — an aggregate without
    # GROUP BY would emit a spurious 1-row-per-step tail instead.
    parts = [
        "SELECT CAST(0 AS BIGINT) AS step, "
        "CAST(coalesce(sum(len(string_split(seq, ' ')) * freq), 0) "
        "AS BIGINT) AS corpus_symbols FROM seq1"
    ]
    parts += [
        f"SELECT step, corpus_symbols FROM ("
        f"SELECT CAST({k} AS BIGINT) AS step, "
        f"CAST(sum(len(string_split(seq, ' ')) * freq) "
        f"AS BIGINT) AS corpus_symbols FROM seq{k + 1} "
        f"WHERE EXISTS (SELECT 1 FROM best{k}) GROUP BY 1)"
        for k in range(1, n_merges + 1)
    ]
    return ctes + "\n" + " UNION ALL ".join(parts)


@query("text_bpe_compression", oracle=_bpe_curve_oracle_sql(4))
def text_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer compression/fertility curve over 4 BPE merge rounds
    (`operators/textquality.bpe_compression_curve`): corpus symbol
    count after each learned merge — the budget statistic a tokenizer
    decision reads. One trainer run plus one |vocab|-sized aggregate
    per step; corpus_symbols is an exact BIGINT, monotone
    non-increasing in step. The oracle replays the trainer CTEs and
    counts symbols per round."""
    from usgs_lidar_spark.operators.textquality import bpe_compression_curve

    return bpe_compression_curve(_t(spark, sf_dir, "documents"), n_merges=4)


@query(
    "text_class_keyness",
    oracle=f"""
    WITH cw AS (
        SELECT lang AS class, w, CAST(count(*) AS BIGINT) AS a
        FROM (SELECT lang, unnest({_TOK_LOWER_SQL}) AS w
              FROM documents WHERE length(trim(text)) > 0)
        GROUP BY lang, w
    ), wt AS (SELECT w, CAST(sum(a) AS BIGINT) AS nw FROM cw GROUP BY w),
    ct AS (SELECT class, CAST(sum(a) AS BIGINT) AS nc FROM cw GROUP BY class),
    g AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM cw),
    scored AS (
        SELECT cw.class, cw.w, cw.a,
               CAST((length(to_base(cw.a + 1, 2)) - 1)
                  + (length(to_base((g.n - ct.nc) - (wt.nw - cw.a) + 1, 2)) - 1)
                  - (length(to_base(wt.nw - cw.a + 1, 2)) - 1)
                  - (length(to_base(ct.nc - cw.a + 1, 2)) - 1)
                  AS BIGINT) AS keyness_bits
        FROM cw JOIN wt USING (w) JOIN ct USING (class) CROSS JOIN g
    )
    SELECT class, w AS token, a AS n_in_class, keyness_bits,
           CAST(row_number() OVER (PARTITION BY class
                                   ORDER BY keyness_bits DESC, w)
                AS BIGINT) AS rank
    FROM scored QUALIFY rank <= 5
    """,
)
def text_class_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language keyword extraction by integer log-odds keyness
    (`operators/textquality.class_keyness`, top 5 per class): the
    Monroe-et-al distinctive-vocabulary statistic quantized to exact
    BITS (four bit lengths, no products — overflow-free at any corpus
    size, bit-identical across engines). One map-combined (class,
    token) pass over the corpus; totals reduce from it; the rank
    window runs on the vocab domain, never the corpus."""
    from usgs_lidar_spark.operators.textquality import class_keyness

    return class_keyness(_t(spark, sf_dir, "documents"), top_k=5)


@query(
    "events_funnel_ordered",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type,
               date_trunc('microseconds', ts) AS ts
        FROM events
    ), v AS (
        SELECT user_id, min(ts) AS t1 FROM ev
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM ev e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM ev e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(coalesce(sum(user_id), 0) AS BIGINT) AS user_id_sum
        FROM v
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'click', CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(user_id), 0) AS BIGINT) FROM c
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(user_id), 0) AS BIGINT) FROM p
    )
    """,
)
def events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase, strictly
    later timestamps at each step): per-stage user counts, the product
    analytics query. Each stage is a per-user min-timestamp aggregate
    over the PREVIOUS stage's survivors — three user-keyed
    map-combined aggregates plus two user-equi joins, no windows over
    the event stream; at any scale the state per user is one
    timestamp. user_id_sum pins the surviving SETS, not just counts.
    Timestamps compare at microsecond precision on both engines
    (events.ts is TIMESTAMP(NANOS) at rest; the loader truncates)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, k: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(k).cast("long").alias("stage"),
            F.lit(name).alias("event_type"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.coalesce(F.sum("user_id"), F.lit(0))
            .cast("long")
            .alias("user_id_sum"),
        )

    return (
        stage(v, 1, "view")
        .unionByName(stage(c, 2, "click"))
        .unionByName(stage(p, 3, "purchase"))
    )


@query(
    "pipe_split_leakage",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.6),
    sp AS (
        SELECT doc_id,
               CASE WHEN {_LEHMER_BUCKET("doc_id")} < 8000
                    THEN 'train' ELSE 'test' END AS split
        FROM documents
    )
    SELECT sa.split AS split_a, sb.split AS split_b,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(p.id_a + p.id_b) AS BIGINT) AS id_sum
    FROM pairs p
    JOIN sp sa ON p.id_a = sa.doc_id
    JOIN sp sb ON p.id_b = sb.doc_id
    GROUP BY sa.split, sb.split
    """,
)
def pipe_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split LEAKAGE audit — the eval-integrity check a
    training pipeline runs before trusting held-out numbers: near-dup
    pairs (MinHash-LSH, the already-oracled detector) bucketed by
    which splits the two documents landed in. A (train, test) or
    (test, train) row is leakage: the test doc has a near-duplicate in
    train. Composition of two oracled primitives — the pair scan is
    banded candidates only, the split column is a map-only hash, and
    the report joins |pairs| rows to a two-column split projection."""
    from usgs_lidar_spark.operators.dedup import minhash_lsh_pairs
    from usgs_lidar_spark.operators.pipeline import split_by_hash

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id",
        k=8, num_perm=64, bands=32, threshold=0.6, max_df=20,
    )
    splits = split_by_hash(
        docs, "doc_id", {"train": 0.8, "test": 0.2}
    ).select("doc_id", "split")
    sa = splits.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
        "split", "split_a"
    )
    sb = splits.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
        "split", "split_b"
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("id_a") + F.col("id_b")).cast("long").alias("id_sum"),
        )
    )


def _bpe_tokenize_oracle_sql(n_merges: int) -> str:
    """Oracle for `bpe_apply`: the unrolled trainer CTEs (which carry
    ``w`` through every rewrite), finished by joining each document's
    tokens to the final segmentation table and summing symbols."""
    base = _bpe_oracle_sql(n_merges)
    ctes = base[: base.rindex("\n")]
    return (
        ctes
        + f"""
    , toks AS (
        SELECT doc_id, unnest({_TOK_LOWER_SQL}) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), per AS (
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(len(string_split(f.seq, ' '))) AS BIGINT)
                   AS n_bpe_tokens
        FROM toks t JOIN seq{n_merges + 1} f USING (w)
        GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
           CAST(coalesce(p.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
    FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id"""
    )


@query("text_bpe_tokenize", oracle=_bpe_tokenize_oracle_sql(4))
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer SERVING (`operators/textquality.bpe_apply`): learn 4
    BPE merges, then segment every document by JOINING its tokens to
    the vocab-sized final segmentation table (no merge rewrite ever
    touches document rows) — per-doc BPE token counts, the number the
    packing / context-budget stages consume. Every doc keeps a row."""
    from usgs_lidar_spark.operators.textquality import bpe_apply

    return bpe_apply(_t(spark, sf_dir, "documents"), n_merges=4)


@query(
    "dedup_chunk_incremental",
    oracle="""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
        FROM documents WHERE length(trim(text)) > 0
    ), ch AS (
        SELECT doc_id, CAST(s // 4 AS BIGINT) AS chunk_id,
               array_to_string(list_slice(tk, s + 1, s + 4), ' ') AS ct
        FROM (SELECT doc_id, tk, unnest(range(0, len(tk), 4)) AS s FROM t)
    ), seen AS (SELECT DISTINCT ct FROM ch WHERE doc_id < 400),
    bat AS (SELECT * FROM ch WHERE doc_id >= 400),
    fresh AS (
        SELECT b.doc_id, b.chunk_id, b.ct
        FROM bat b LEFT JOIN seen s ON b.ct = s.ct
        WHERE s.ct IS NULL
    ), kept AS (
        SELECT doc_id, chunk_id, ct FROM (
            SELECT doc_id, chunk_id, ct,
                   row_number() OVER (PARTITION BY ct
                                      ORDER BY doc_id, chunk_id) AS rn
            FROM fresh) WHERE rn = 1
    ), tot AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
        FROM bat GROUP BY doc_id
    ), kp AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(ct, ' ' ORDER BY chunk_id) AS new_text
        FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(tot.n_chunks, 0) AS BIGINT) AS n_chunks,
           CAST(coalesce(kp.n_kept, 0) AS BIGINT) AS n_kept,
           coalesce(kp.new_text, '') AS new_text
    FROM (SELECT doc_id FROM documents WHERE doc_id >= 400) d
    LEFT JOIN tot ON d.doc_id = tot.doc_id
    LEFT JOIN kp ON d.doc_id = kp.doc_id
    """,
)
def dedup_chunk_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-ingest passage dedup (`operators/dedup.
    chunk_dedup_incremental`): the batch (doc_id >= 400) dedups against
    the ingested corpus (doc_id < 400) represented ONLY by its chunk
    digests — one digest-keyed anti-join (historical text never moves)
    then the within-batch election and reassembly. The oracle replays
    it with text equality (sha256 equality == text equality)."""
    from usgs_lidar_spark.operators.dedup import (
        chunk_dedup_incremental,
        chunk_digests,
    )

    docs = _t(spark, sf_dir, "documents")
    seen = chunk_digests(docs.filter(F.col("doc_id") < 400), chunk_tokens=4)
    return chunk_dedup_incremental(
        docs.filter(F.col("doc_id") >= 400), seen, chunk_tokens=4
    )


@query(
    "sim_embedding_gram",
    oracle="""
    WITH q AS (
        SELECT list_transform(
                   embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 4096.0) AS BIGINT)
               ) AS v
        FROM embeddings
    ), idx AS (SELECT unnest(range(1, 65)) AS i),
    pairs AS (SELECT a.i AS i, b.i AS j FROM idx a, idx b WHERE b.i >= a.i)
    SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
           CAST(sum(v[p.i] * v[p.j]) AS BIGINT) AS g
    FROM q CROSS JOIN pairs p GROUP BY p.i, p.j
    """,
)
def sim_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer Gram matrix of the (64-dim) embedding corpus
    (`operators/linalg.embed_gram_quantized`, qbits=12) — the
    distributed-PCA reduction: a numpy partial Gram per Arrow batch
    (the engine's one deliberate mapInPandas hot path — a
    batch-reducing kernel, not row-wise Python), d²-per-partition
    shuffle, BIGINT-exact under any partitioning. The oracle replays
    the quantized double loop; `pca_components`/`embed_pca_project`
    consume this reduction driver-side (d x d eigh) and project
    map-only."""
    from usgs_lidar_spark.operators.linalg import embed_gram_quantized

    return embed_gram_quantized(_t(spark, sf_dir, "embeddings"))


@query(
    "stats_poisson_bootstrap",
    oracle=f"""
    WITH reps AS (SELECT unnest(range(0, 32)) AS b),
    cells AS (
        SELECT r.b AS replicate, d.n_chars,
               (CASE WHEN u >= 790015083 THEN 1 ELSE 0 END
              + CASE WHEN u >= 1580030167 THEN 1 ELSE 0 END
              + CASE WHEN u >= 1975037709 THEN 1 ELSE 0 END
              + CASE WHEN u >= 2106706890 THEN 1 ELSE 0 END
              + CASE WHEN u >= 2139624185 THEN 1 ELSE 0 END) AS m
        FROM documents d CROSS JOIN reps r
        CROSS JOIN LATERAL (SELECT
            {_LEHMER_LONG(_FOLD64("d.doc_id") + " * 131 + r.b")}
            AS u) h
    ), agg AS (
        SELECT replicate, CAST(sum(m) AS BIGINT) AS n_eff,
               CAST(sum(m * n_chars) AS BIGINT) AS value_sum
        FROM cells WHERE m > 0 GROUP BY replicate
    )
    SELECT CAST(r.b AS BIGINT) AS replicate,
           CAST(coalesce(a.n_eff, 0) AS BIGINT) AS n_eff,
           CAST(coalesce(a.value_sum, 0) AS BIGINT) AS value_sum
    FROM reps r LEFT JOIN agg a ON r.b = a.replicate
    """,
)
def stats_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap (`operators/stats.
    poisson_bootstrap`, B=32) of sum/count of n_chars over documents —
    the production substitute for with-replacement resampling at
    100 TB (Chamandy et al.): per-(row, replicate) Poisson(1)
    multiplicities from fixed integer inverse-CDF thresholds on the
    Lehmer hash, so every engine and partitioning draws the SAME
    resamples. One map-only explode (zero-multiplicity cells dropped
    before the shuffle) + one replicate-keyed map-combined aggregate:
    B partial rows per partition on the wire. Replicate means
    value_sum/n_eff are the CI inputs."""
    from usgs_lidar_spark.operators.stats import poisson_bootstrap

    return poisson_bootstrap(
        _t(spark, sf_dir, "documents"), "n_chars", "doc_id",
        n_replicates=32,
    )


@query(
    "pipe_budget_select",
    oracle="""
    WITH scored AS (
        SELECT doc_id, n_chars, CAST(n_chars % 37 AS BIGINT) AS score
        FROM documents
    ), ordered AS (
        SELECT doc_id, n_chars,
               sum(n_chars) OVER (ORDER BY score DESC, doc_id ASC
                                  ROWS UNBOUNDED PRECEDING) AS cum
        FROM scored
    )
    SELECT CAST(count(*) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS weight_kept,
           CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
    FROM ordered WHERE cum <= 30000
    """,
)
def pipe_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained greedy curation (`operators/ranking.
    budget_prefix_select`): fill a 30k-char budget with the
    best-scoring documents ((score DESC, doc_id ASC) order, synthetic
    integer score n_chars % 37). The global ordered prefix-sum is fully
    distributed (round 11): per-score totals range-bucketed by VALUE,
    descending bucket offsets broadcast back over a <=1024-row bounded
    collect, the boundary score + remaining budget as one 1-row max_by
    broadcast — no data-sized driver pull, no distinct-score ceiling,
    and only the single BOUNDARY score's rows flow through a window —
    never a single-task global window; the oracle IS that naive global
    window, proving the scalable form row-identical."""
    from usgs_lidar_spark.operators.ranking import budget_prefix_select

    docs = _t(spark, sf_dir, "documents").withColumn(
        "score", (F.col("n_chars") % 37).cast("long")
    )
    kept = budget_prefix_select(
        docs, "score", "n_chars", budget=30000
    )
    return kept.agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("weight_kept"),
        F.coalesce(F.sum("doc_id"), F.lit(0)).cast("long").alias("id_sum"),
    )


@query(
    "text_rp_embedding",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOK_LOWER_SQL}) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), hashed AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(w) + 1),
                                      i -> CAST(ascii(w[i]) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007) AS h
        FROM toks
    ), dims AS (SELECT unnest(range(0, 16)) AS dim),
    cells AS (
        SELECT doc_id, d.dim,
               CASE ({_LEHMER_LONG("h * 17 + d.dim")}) % 4
                    WHEN 0 THEN -1 WHEN 2 THEN 1 ELSE 0 END AS v
        FROM hashed CROSS JOIN dims d
    ), summed AS (
        SELECT doc_id, dim, CAST(sum(v) AS BIGINT) AS val
        FROM cells GROUP BY doc_id, dim
    )
    SELECT d.doc_id, CAST(dd.dim AS BIGINT) AS dim,
           CAST(coalesce(s.val, 0) AS BIGINT) AS val
    FROM documents d CROSS JOIN dims dd
    LEFT JOIN summed s ON d.doc_id = s.doc_id AND dd.dim = s.dim
    """,
)
def text_rp_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random-projection document embeddings
    (`operators/textquality.rp_doc_embedding`, 16 dims): sparse
    ternary Achlioptas rows drawn from the Lehmer hash of (token
    polyhash, dim) — a Johnson-Lindenstrauss sketch of token counts,
    exact-integer so featurization is engine/partition-reproducible
    (the text -> ANN bridge without model inference). Map-only until
    one (doc, dim)-keyed map-combined aggregate."""
    from usgs_lidar_spark.operators.textquality import rp_doc_embedding

    return rp_doc_embedding(_t(spark, sf_dir, "documents"), n_dims=16)


def _bpe_pack_oracle_sql(n_merges: int) -> str:
    """Oracle for `pipe_pack_by_bpe`: the unrolled trainer CTEs, the
    per-doc segmentation join (as in `text_bpe_tokenize`), then the
    same per-language packing window as `pipe_pack_sequences` — but
    over REAL tokenizer counts."""
    base = _bpe_oracle_sql(n_merges)
    ctes = base[: base.rindex("\n")]
    return (
        ctes
        + f"""
    , toks AS (
        SELECT doc_id, unnest({_TOK_LOWER_SQL}) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), per AS (
        SELECT t.doc_id,
               CAST(sum(len(string_split(f.seq, ' '))) AS BIGINT) AS n_bpe
        FROM toks t JOIN seq{n_merges + 1} f USING (w)
        GROUP BY t.doc_id
    ), counts AS (
        SELECT d.doc_id, d.lang,
               CAST(coalesce(p.n_bpe, 0) AS BIGINT) AS n_bpe
        FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
    ), packed AS (
        SELECT doc_id, lang, n_bpe AS n_tokens,
               CAST(sum(n_bpe) OVER w - n_bpe AS BIGINT) AS token_start,
               CAST(sum(n_bpe) OVER w AS BIGINT) AS token_end
        FROM counts
        WINDOW w AS (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT doc_id, lang, n_tokens, token_start,
           CAST(floor(token_start / 2048.0) AS BIGINT) AS pack_id,
           token_start % 2048 AS pack_offset,
           token_end > (floor(token_start / 2048.0) + 1) * 2048
               AS split_across
    FROM packed"""
    )


@query("pipe_pack_by_bpe", oracle=_bpe_pack_oracle_sql(4))
def pipe_pack_by_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing by REAL tokenizer counts: learn 4 BPE merges,
    segment every document (`bpe_apply` — a vocab-sized join, no merge
    logic on document rows), then run the per-language 2048-token
    packing window over the BPE counts instead of whitespace counts —
    the composition a pretraining loader actually executes (context
    budgets are in tokenizer tokens, not words). Same one-shuffle pack
    shape as `pipe_pack_sequences`."""
    from usgs_lidar_spark.operators.pipeline import pack_sequences
    from usgs_lidar_spark.operators.textquality import bpe_apply

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    counts = bpe_apply(docs, n_merges=4).select("doc_id", "n_bpe_tokens")
    with_counts = docs.join(counts, "doc_id").select(
        "doc_id", "lang", "n_bpe_tokens"
    )
    return pack_sequences(
        with_counts, "doc_id", "n_bpe_tokens", budget=2048,
        stream_col="lang",
    ).select(
        "doc_id", "lang", "n_tokens", "token_start", "pack_id",
        "pack_offset", "split_across",
    )


@query(
    "sim_kmeans_step",
    oracle="""
    WITH qe AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))
                   AS qv
        FROM embeddings
    ), cent AS (
        SELECT vec_id AS cid, qv AS qc,
               CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS nq
        FROM qe WHERE vec_id < 8
    ), dots AS (
        SELECT e.vec_id, e.qv, c.cid, c.nq,
               CAST(list_sum(list_transform(list_zip(e.qv, c.qc),
                                            p -> p[1] * p[2])) AS BIGINT)
                   AS qdot
        FROM qe e CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, qv, cid FROM (
            SELECT vec_id, qv, cid,
                   row_number() OVER (PARTITION BY vec_id
                       ORDER BY CASE WHEN nq = 0 THEN 0.0
                                ELSE CAST(qdot AS DOUBLE)
                                     / sqrt(CAST(nq AS DOUBLE)) END DESC,
                                cid) AS rn
            FROM dots) WHERE rn = 1
    ), cells AS (
        SELECT cid, i AS dim, qv[i] AS q
        FROM assigned, unnest(range(1, len(qv) + 1)) AS t(i)
    )
    SELECT CAST(cid AS BIGINT) AS cid, CAST(dim AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(q) AS BIGINT) AS coord_sum_q
    FROM cells GROUP BY cid, dim
    """,
)
def sim_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed Lloyd step with bit-exact statistics
    (`operators/similarity.kmeans_step_exact`): quantized-argmax
    assignment to the 8 seed centroids on one scan, then per (cell,
    dim) occupancy + EXACT integer coordinate sums — k*dim rows out of
    a map-combined shuffle. The next centroid is the driver-side
    division of bounded numbers; the expensive distributed part of
    quantizer training is all-BIGINT and hash-stable."""
    from usgs_lidar_spark.operators.similarity import kmeans_step_exact

    emb = _t(spark, sf_dir, "embeddings")
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ] or [(0, [0.0])]
    return kmeans_step_exact(emb, cents)


@query(
    "sim_kmeans_two_steps",
    oracle="""
    WITH qe AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))
                   AS qv
        FROM embeddings
    ), cent1 AS (
        SELECT vec_id AS cid, qv AS qc,
               CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS nq
        FROM qe WHERE vec_id < 8
    ), dots1 AS (
        SELECT e.vec_id, e.qv, c.cid, c.nq,
               CAST(list_sum(list_transform(list_zip(e.qv, c.qc),
                                            p -> p[1] * p[2])) AS BIGINT)
                   AS qdot
        FROM qe e CROSS JOIN cent1 c
    ), a1 AS (
        SELECT vec_id, qv, cid FROM (
            SELECT vec_id, qv, cid,
                   row_number() OVER (PARTITION BY vec_id
                       ORDER BY CASE WHEN nq = 0 THEN 0.0
                                ELSE CAST(qdot AS DOUBLE)
                                     / sqrt(CAST(nq AS DOUBLE)) END DESC,
                                cid) AS rn
            FROM dots1) WHERE rn = 1
    ), step1 AS (
        SELECT cid, i AS dim,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(qv[i]) AS BIGINT) AS cs
        FROM a1, unnest(range(1, len(qv) + 1)) AS t(i)
        GROUP BY cid, i
    ), cent2 AS (
        -- update: mean_q = double(cs)/n, c = mean_q / 2^20, then
        -- re-quantize floor(c * 2^20) — two correctly-rounded IEEE ops
        -- + an exponent shift, identical in any engine. Seeds with an
        -- empty cell would keep their old centroid; every seed cell is
        -- occupied here (the seed vector itself assigns to it).
        SELECT cid,
               list_transform(
                   list(CAST(cs AS DOUBLE) / n / 1048576.0 ORDER BY dim),
                   x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS qc
        FROM step1 GROUP BY cid
    ), cent2n AS (
        SELECT cid, qc,
               CAST(list_sum(list_transform(qc, v -> v * v)) AS BIGINT) AS nq
        FROM cent2
    ), dots2 AS (
        SELECT e.vec_id, e.qv, c.cid, c.nq,
               CAST(list_sum(list_transform(list_zip(e.qv, c.qc),
                                            p -> p[1] * p[2])) AS BIGINT)
                   AS qdot
        FROM qe e CROSS JOIN cent2n c
    ), a2 AS (
        SELECT vec_id, qv, cid FROM (
            SELECT vec_id, qv, cid,
                   row_number() OVER (PARTITION BY vec_id
                       ORDER BY CASE WHEN nq = 0 THEN 0.0
                                ELSE CAST(qdot AS DOUBLE)
                                     / sqrt(CAST(nq AS DOUBLE)) END DESC,
                                cid) AS rn
            FROM dots2) WHERE rn = 1
    )
    SELECT CAST(cid AS BIGINT) AS cid, CAST(i AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(qv[i]) AS BIGINT) AS coord_sum_q
    FROM a2, unnest(range(1, len(qv) + 1)) AS t(i)
    GROUP BY cid, i
    """,
)
def sim_kmeans_two_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two full Lloyd iterations — assign, update, re-assign — with the
    float feedback loop itself cross-engine exact
    (`operators/similarity.kmeans_two_steps_exact`): the centroid
    update is double(coord_sum_q)/n then a power-of-two exponent
    shift (two correctly-rounded IEEE ops, identical in Spark, DuckDB,
    Python), re-quantized with the rounding-free floor quantizer, so
    the ITERATION — the part float k-means cannot reproduce across
    engines — hashes stably. Only k*dim bounded numbers cross the
    driver between rounds.

    Oracle limitation (by construction, not a bug): the SQL twin does
    not model EMPTY round-1 cells (a centroid that attracts no vector
    keeps its old position in the engine; the oracle's update CTE would
    simply have no row to join). The 8 seed centroids here are distinct
    corpus vectors, each of which attracts at least itself, so no cell
    can be empty for this query; duplicate or adversarial seeds would
    need the engine-side `kmeans_two_steps_exact` empty-cell keep that
    `test_kmeans_two_steps_monotone_inertia_and_empty_cell_keep` pins."""
    from usgs_lidar_spark.operators.similarity import kmeans_two_steps_exact

    emb = _t(spark, sf_dir, "embeddings")
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ] or [(0, [0.0])]
    return kmeans_two_steps_exact(emb, cents)


@query(
    "text_nb_train",
    oracle=f"""
    WITH toks AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
               unnest({_TOK_LOWER_SQL}) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), feats AS (
        SELECT y,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(w) + 1),
                                      i -> CAST(ascii(w[i]) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007) % 64
                   AS feature_id
        FROM toks
    ), fc AS (
        SELECT feature_id,
               CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN y = 1 THEN 0 ELSE 1 END) AS BIGINT) AS b
        FROM feats GROUP BY feature_id
    ), tot AS (
        SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb
        FROM fc
    ), scored AS (
        SELECT feature_id,
               CAST((length(to_base(a + 1, 2)) - 1)
                  + (length(to_base(tb - b + 1, 2)) - 1)
                  - (length(to_base(b + 1, 2)) - 1)
                  - (length(to_base(ta - a + 1, 2)) - 1)
                  AS BIGINT) AS weight
        FROM fc CROSS JOIN tot
    )
    SELECT f.fid AS feature_id,
           CAST(coalesce(s.weight, 0) AS BIGINT) AS weight
    FROM (SELECT unnest(range(0, 64)) AS fid) f
    LEFT JOIN scored s ON f.fid = s.feature_id
    """,
)
def text_nb_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN the hashed-feature quality classifier in-engine
    (`operators/textquality.nb_train_bits`, labels lang='en' vs rest):
    Naive-Bayes log-odds weights in integer bits — one map-combined
    (feature, class) aggregate, no iteration, bit-exact in any engine;
    the output weight table is exactly what `hashed_feature_score`
    (the serving query) consumes, so train and serve close the loop
    in one feature space. Verified to fully separate a planted
    marker-token task in the unit test."""
    from usgs_lidar_spark.operators.textquality import nb_train_bits

    docs = _t(spark, sf_dir, "documents")
    return nb_train_bits(
        docs,
        F.when(F.col("lang") == "en", 1).otherwise(-1),
        n_features=64,
    )


@query(
    "dedup_simhash_portable",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOK_LOWER_SQL}) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), hashed AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(w) + 1),
                                      i -> CAST(ascii(w[i]) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007) AS h
        FROM toks
    ), cells AS (
        SELECT doc_id, j.bit,
               CASE WHEN ({_LEHMER_LONG("h * 67 + j.bit")}) % 2 = 1
                    THEN 1 ELSE -1 END AS v
        FROM hashed CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) j
    ), bits AS (
        SELECT doc_id, bit, sum(v) AS s FROM cells GROUP BY doc_id, bit
    ), fp AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0
                             THEN (CAST(1 AS BIGINT) << bit)
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(coalesce(fp.simhash, 0) AS BIGINT) AS simhash
    FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
    """,
)
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints under the HARD oracle
    (`operators/dedup.simhash_portable`, 32 bits): the hash family is
    the two-round Lehmer parity of (token polyhash, bit), reproducible
    in ANSI SQL — this closes the signal gap the xxhash64 SimHash pair
    necessarily carries (those stay golden-pinned; the portable family
    brings the SimHash TIER onto the driver's value-hash check). Same
    majority-sign semantics and the same scale shape: n_bits partials
    per doc on the wire, never text."""
    from usgs_lidar_spark.operators.dedup import simhash_portable

    return simhash_portable(_t(spark, sf_dir, "documents"), n_bits=32)


@query(
    "dedup_simhash_portable_pairs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOK_LOWER_SQL}) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), hashed AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(w) + 1),
                                      i -> CAST(ascii(w[i]) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007) AS h
        FROM toks
    ), cells AS (
        SELECT doc_id, j.bit,
               CASE WHEN ({_LEHMER_LONG("h * 67 + j.bit")}) % 2 = 1
                    THEN 1 ELSE -1 END AS v
        FROM hashed CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) j
    ), bits AS (
        SELECT doc_id, bit, sum(v) AS s FROM cells GROUP BY doc_id, bit
    ), fp AS (
        SELECT d.doc_id,
               CAST(coalesce(f.sh, 0) AS BIGINT) AS simhash
        FROM documents d LEFT JOIN (
            SELECT doc_id,
                   sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit)
                            ELSE 0 END) AS sh
            FROM bits GROUP BY doc_id) f ON d.doc_id = f.doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_portable_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup DETECTION under the hard oracle
    (`operators/dedup.simhash_portable_near_dup_pairs`): pigeonhole
    block join over portable 32-bit fingerprints + popcount verify —
    the plan never compares all pairs (candidates come from the
    (block, value) equi-self-join), while the oracle IS the exact
    all-pairs Hamming scan, so the driver's value hash proves the
    blocking lossless at max_hamming < n_blocks."""
    from usgs_lidar_spark.operators.dedup import (
        simhash_portable_near_dup_pairs,
    )

    return simhash_portable_near_dup_pairs(
        _t(spark, sf_dir, "documents"), n_bits=32, max_hamming=3, n_blocks=4
    )


@query("sim_gram_from_store", oracle=ORACLE["sim_embedding_gram"])
def sim_gram_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gram reduction served from a persisted additive store —
    SAME oracle as `sim_embedding_gram` (access path, not semantics,
    the `search_bm25_from_index` pattern): `write_gram_store` appends
    per-batch integer moment partials (no derived state, no sidecar —
    additivity makes the store append-only crash-safe by construction)
    and the read aggregates d*(d+1)/2 + d + 1 bounded rows instead of
    scanning the corpus. Builds once into the per-(sf_dir, snapshot)
    cache path; steady-state runs measure serving."""
    from usgs_lidar_spark.operators.linalg import (
        read_gram_store,
        write_gram_store,
    )

    path, complete = _cached_index_path(
        sf_dir, "gram_store", "embeddings", ""
    )
    if not complete:
        import os

        write_gram_store(_t(spark, sf_dir, "embeddings"), path)
        # write_gram_store's single write ends with parquet's _SUCCESS
        # at the root — the completeness marker _cached_index_path
        # checks when marker_sidecar is ''.
        assert os.path.exists(os.path.join(path, "_SUCCESS"))
    return (
        read_gram_store(spark, path)
        .filter((F.col("i") >= 1) & (F.col("j") >= 1))
        .select("i", "j", "g")
    )


@query(
    "pipe_end_to_end_v5",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, {_TOK_LOWER_SQL} AS tk
        FROM documents WHERE length(trim(text)) > 0
    ), slots AS (
        SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
        FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
              FROM t WHERE len(tk) >= 2)
    ), bc AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS bc
        FROM slots GROUP BY w1, w2
    ), ctx AS (
        SELECT w1, CAST(sum(bc) AS BIGINT) AS ctx FROM bc GROUP BY w1
    ), v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM bc),
    surp AS (
        SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum((length(to_base(c.ctx + v.v, 2)) - 1)
                      - (length(to_base(b.bc + 1, 2)) - 1)) AS BIGINT)
                   AS bits
        FROM slots s JOIN bc b USING (w1, w2) JOIN ctx c USING (w1)
        CROSS JOIN v GROUP BY s.doc_id
    ),
    -- stage 1: keep docs whose mean surprisal is under 5.5 bits/bigram
    -- (integer cross-multiply; docs with < 2 tokens pass trivially)
    lm_kept AS (
        SELECT d.doc_id, d.lang, d.text
        FROM documents d LEFT JOIN surp s ON d.doc_id = s.doc_id
        WHERE coalesce(s.bits, 0) * 10 <= coalesce(s.n_bigrams, 0) * 55
    ),
    -- stage 2: passage-dedup the survivors (election among survivors
    -- only) and reassemble
    kt AS (
        SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS tk
        FROM lm_kept WHERE length(trim(text)) > 0
    ), ch AS (
        SELECT doc_id, lang, CAST(s // 4 AS BIGINT) AS chunk_id,
               array_to_string(list_slice(tk, s + 1, s + 4), ' ') AS ct
        FROM (SELECT doc_id, lang, tk, unnest(range(0, len(tk), 4)) AS s
              FROM kt)
    ), kept AS (
        SELECT doc_id, lang, chunk_id, ct FROM (
            SELECT doc_id, lang, chunk_id, ct,
                   row_number() OVER (PARTITION BY ct
                                      ORDER BY doc_id, chunk_id) AS rn
            FROM ch) WHERE rn = 1
    ), rebuilt AS (
        SELECT l.doc_id, l.lang,
               coalesce(k.new_text, '') AS new_text
        FROM lm_kept l LEFT JOIN (
            SELECT doc_id, string_agg(ct, ' ' ORDER BY chunk_id) AS new_text
            FROM kept GROUP BY doc_id) k ON l.doc_id = k.doc_id
    ),
    -- stage 3: classifier score over the REASSEMBLED text
    weights AS (
        SELECT CAST(f AS BIGINT) AS feature_id,
               CAST({_LEHMER_LONG("f")} % 2001 - 1000 AS BIGINT) AS weight
        FROM (SELECT unnest(range(0, 256)) AS f)
    ), rtoks AS (
        SELECT doc_id, lang,
               unnest(list_transform(
                   regexp_split_to_array(trim(new_text), '\\s+'),
                   x -> lower(x))) AS w
        FROM rebuilt WHERE length(trim(new_text)) > 0
    ), scored AS (
        SELECT r.doc_id, r.lang,
               CAST(coalesce(sum(w2.weight), 0) AS BIGINT) AS score
        FROM (SELECT doc_id, lang,
                     list_reduce(
                         list_prepend(CAST(0 AS BIGINT),
                             list_transform(range(1, length(w) + 1),
                                            i -> CAST(ascii(w[i]) AS BIGINT))),
                         (acc, x) -> (acc * 31 + x) % 1000000007) % 256
                         AS feature_id
              FROM rtoks) r
        LEFT JOIN weights w2 USING (feature_id)
        GROUP BY r.doc_id, r.lang
    )
    -- per-language report over the full chain
    SELECT r.lang,
           CAST(count(*) AS BIGINT) AS n_after_lm,
           CAST(sum(CASE WHEN length(r.new_text) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_text,
           CAST(coalesce(sum(len(string_split_regex(trim(r.new_text),
                                                    '\\s+'))) FILTER (
                    WHERE length(trim(r.new_text)) > 0), 0) AS BIGINT)
               AS tokens_after_dedup,
           CAST(coalesce(sum(s.score), 0) AS BIGINT) AS score_sum
    FROM rebuilt r LEFT JOIN scored s ON r.doc_id = s.doc_id
    GROUP BY r.lang
    """,
)
def pipe_end_to_end_v5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed pipeline v5 — the round-8 signals CHAINED, each stage
    consuming the previous one's output: integer bigram-LM filter
    (mean surprisal < 5.5 bits/bigram, cross-multiplied — no
    division), passage-dedup + reassembly over the SURVIVORS (the
    election runs on the filtered corpus), hashed-feature classifier
    scoring over the REASSEMBLED text, rolled up per language. Pins
    that the quality, dedup, and classifier tiers compose — the v3/v4
    precedent extended to the round-8 operators."""
    from usgs_lidar_spark.functions.textstats import token_count
    from usgs_lidar_spark.operators.dedup import chunk_dedup_docs
    from usgs_lidar_spark.operators.pipeline import portable_hash_long
    from usgs_lidar_spark.operators.textquality import (
        bigram_surprisal,
        hashed_feature_score,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    surp = bigram_surprisal(docs)
    # Stage boundaries are localCheckpoint-pinned: lm_kept's lineage
    # contains the whole LM filter and is referenced 3x downstream
    # (chunk election, reassembly base, report), rebuilt 2x (classifier
    # + final join) — without the pins the un-replanned NO_AQE physical
    # tree re-executes the chain per reference and OOM'd a vanilla-heap
    # session at sf0.01 (observed live; AQE masked it by replanning).
    # Materializing between stages is also what a production pipeline
    # does — each stage's output IS a dataset.
    lm_kept = (
        docs.join(surp, "doc_id", "left")
        .filter(
            F.coalesce("surprisal_bits", F.lit(0)) * 10
            <= F.coalesce("n_bigrams", F.lit(0)) * 55
        )
        .select("doc_id", "lang", "text")
        .localCheckpoint(eager=False)
    )
    rebuilt = (
        lm_kept.select("doc_id", "lang")
        .join(
            chunk_dedup_docs(lm_kept, chunk_tokens=4).select(
                "doc_id", "new_text"
            ),
            "doc_id",
        )
        .localCheckpoint(eager=False)
    )
    weights = spark.range(256).select(
        F.col("id").cast("long").alias("feature_id"),
        (portable_hash_long(F.col("id")) % 2001 - 1000)
        .cast("long")
        .alias("weight"),
    )
    scored = hashed_feature_score(
        rebuilt, weights, n_features=256, text_col="new_text"
    ).select("doc_id", "score")
    return (
        rebuilt.join(scored, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_after_lm"),
            F.sum(F.when(F.length("new_text") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_with_text"),
            F.sum(
                F.when(
                    F.length(F.trim("new_text")) > 0,
                    token_count("new_text"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("tokens_after_dedup"),
            F.coalesce(F.sum("score"), F.lit(0))
            .cast("long")
            .alias("score_sum"),
        )
    )


@query(
    "pipe_end_to_end_v6",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
        FROM documents WHERE length(trim(text)) > 0
    ), ch AS (
        SELECT doc_id, CAST(s // 4 AS BIGINT) AS chunk_id,
               array_to_string(list_slice(tk, s + 1, s + 4), ' ') AS ct
        FROM (SELECT doc_id, tk, unnest(range(0, len(tk), 4)) AS s FROM t)
    ), ranked AS (
        SELECT doc_id, chunk_id, ct,
               row_number() OVER (PARTITION BY ct
                                  ORDER BY doc_id, chunk_id) AS rn
        FROM ch
    ), kept AS (SELECT doc_id, chunk_id, ct FROM ranked WHERE rn = 1),
    tot AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
        FROM ch GROUP BY doc_id
    ), kp AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(ct, ' ' ORDER BY chunk_id) AS new_text
        FROM kept GROUP BY doc_id
    ), alive AS (
        SELECT tot.doc_id, tot.n_chunks, kp.n_kept,
               CASE WHEN trim(kp.new_text) = '' THEN 0
                    ELSE len(string_split_regex(trim(kp.new_text), '\s+'))
                    END AS n_tokens,
               {_LEHMER_STREAM("tot.doc_id", 8)} AS pack_stream
        FROM tot JOIN kp ON tot.doc_id = kp.doc_id
        WHERE kp.n_kept > 0
    ), packed AS (
        SELECT doc_id, n_chunks, n_kept, pack_stream,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT)
                   AS token_start,
               CAST(sum(n_tokens) OVER w AS BIGINT) AS token_end
        FROM alive
        WINDOW w AS (PARTITION BY pack_stream ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT doc_id, n_chunks, n_kept, pack_stream, n_tokens, token_start,
           CAST(floor(token_start / 512.0) AS BIGINT) AS pack_id,
           token_start % 512 AS pack_offset,
           token_end > (floor(token_start / 512.0) + 1) * 512
               AS split_across
    FROM packed
    """,
)
def pipe_end_to_end_v6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed pipeline v6 — the INGEST path: cross-document passage
    dedup + reassembly (`chunk_dedup_docs`, 4-token chunks), drop docs
    whose every chunk lost election, then pack the REASSEMBLED texts
    into 512-token training sequences over 8 deterministic Lehmer
    streams (`pack_sequences`). This is the batch twin of the
    exactly-once streaming ingest (`streaming/ingest.py`): the
    crash-restart parity test pins that draining the foreachBatch
    ingest and packing its output reproduces THIS query bit-for-bit,
    so the oracle here hard-checks the streaming composition too.
    Scale shape: digest-keyed election (text never shuffles twice),
    one stream-keyed window for packing — no global sort."""
    from usgs_lidar_spark.functions.textstats import token_count
    from usgs_lidar_spark.operators.dedup import chunk_dedup_docs
    from usgs_lidar_spark.operators.pipeline import pack_sequences

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ded = chunk_dedup_docs(d, chunk_tokens=4).filter(F.col("n_kept") > 0)
    return pack_sequences(
        ded.select("doc_id", "n_chunks", "n_kept", "new_text"),
        "doc_id",
        token_count("new_text"),
        budget=512,
        n_streams=8,
    ).select(
        "doc_id", "n_chunks", "n_kept", "pack_stream", "n_tokens",
        "token_start", "pack_id", "pack_offset", "split_across",
    )


@query(
    "text_rules_filter",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\s+') END AS t
        FROM documents
    ), s AS (
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(coalesce(list_sum(list_transform(t, x -> length(x))), 0)
                    AS BIGINT) AS total_chars,
               CAST(len(list_filter(t, x -> list_contains(
                    ['the','and','of','to','in','is','that','it'],
                    lower(x)))) AS BIGINT) AS n_stop_hits
        FROM toks
    )
    SELECT doc_id, n_tokens, total_chars, n_stop_hits,
           n_tokens BETWEEN 50 AND 100000 AS r_word_count,
           3 * n_tokens <= total_chars AND total_chars <= 10 * n_tokens
               AS r_mean_word_len,
           n_stop_hits >= 2 AS r_stop_words,
           (CAST(n_tokens BETWEEN 50 AND 100000 AS INTEGER)
            + CAST(3 * n_tokens <= total_chars
                   AND total_chars <= 10 * n_tokens AS INTEGER)
            + CAST(n_stop_hits >= 2 AS INTEGER)) = 3 AS keep
    FROM s
    """,
)
def text_rules_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document-quality RULES filter (Rae et al. 2021,
    MassiveText §A.1.1, adapted to the signals this corpus carries):
    per-doc hard rules — 50 <= word count <= 100,000; mean word length
    in [3, 10] (CROSS-MULTIPLIED as 3n <= chars <= 10n, so the decision
    is pure BIGINT comparison, no division anywhere); >= 2 stop-word
    hits — plus the conjunction as `keep`. Every rule column is emitted
    (the curation-audit form: you tune rules by looking at what each
    one rejects, not just the survivor set). Map-only, zero shuffle;
    at sf0.01 the rules reject 223/500, 0/500, and 276/500 docs
    respectively — real discrimination, not a pass-through."""
    t = F.expr(
        r"CASE WHEN trim(text) = '' THEN array() "
        r"ELSE split(trim(text), '\\s+') END"
    )
    stop = F.array([F.lit(w) for w in
                    ["the", "and", "of", "to", "in", "is", "that", "it"]])
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.coalesce(
            F.aggregate(
                F.transform(t, lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ),
            F.lit(0).cast("long"),
        ).alias("total_chars"),
        F.size(
            F.filter(t, lambda x: F.array_contains(stop, F.lower(x)))
        ).cast("long").alias("n_stop_hits"),
    )
    r_count = (F.col("n_tokens") >= 50) & (F.col("n_tokens") <= 100000)
    r_len = (F.lit(3) * F.col("n_tokens") <= F.col("total_chars")) & (
        F.col("total_chars") <= F.lit(10) * F.col("n_tokens")
    )
    r_stop = F.col("n_stop_hits") >= 2
    return d.select(
        "doc_id",
        "n_tokens",
        "total_chars",
        "n_stop_hits",
        r_count.alias("r_word_count"),
        r_len.alias("r_mean_word_len"),
        r_stop.alias("r_stop_words"),
        (r_count & r_len & r_stop).alias("keep"),
    )


@query(
    "dedup_source_overlap",
    oracle="""
    WITH sh0 AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(length(text) - 7, 0) + 1),
                       i -> substr(text, CAST(i AS INTEGER), 8))) AS shingle
            FROM documents)
    ), cap AS (
        SELECT greatest(1, CAST(ceil(0.04 * count(DISTINCT doc_id))
                                AS BIGINT)) AS max_df
        FROM sh0
    ), freq AS (
        SELECT shingle FROM sh0, cap
        GROUP BY shingle, max_df HAVING count(*) <= max_df
    ), ssh AS (
        SELECT DISTINCT d.source AS g, s.shingle
        FROM sh0 s JOIN freq USING (shingle)
        JOIN documents d USING (doc_id)
    ), sizes AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n_sh FROM ssh GROUP BY g
    ), inter AS (
        SELECT a.g AS src_a, b.g AS src_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM ssh a JOIN ssh b ON a.shingle = b.shingle AND a.g < b.g
        GROUP BY 1, 2
    )
    SELECT src_a, src_b, n_shared, sa.n_sh AS n_a, sb.n_sh AS n_b,
           CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared)
               AS jaccard
    FROM inter
    JOIN sizes sa ON sa.g = src_a
    JOIN sizes sb ON sb.g = src_b
    """,
)
def dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix
    (operators/dedup.source_overlap_matrix): per source pair, the
    Jaccard of their df-capped char-8 shingle sets — "how much does
    source A republish source B", the question that decides which
    source to DROP when near-dup clusters straddle origins. The
    doc-level df cap runs before source aggregation (a stop-shingle in
    every source is noise, not overlap), the self-join rides the same
    capped key as the pairwise dedups, and the output is bounded by
    #sources². Counts exact, Jaccard one double division.

    The cap is the SCALE-STABLE fractional form (max_df_frac=0.04: drop
    shingles in >4% of shingle-bearing docs — ceil(0.04 * n) = 20 at
    sf0.01, the old absolute cap exactly, but invariant in MEANING as
    the corpus grows; SCALE.md measured the absolute max_df=20 emitting
    89 pairs at 10x vs 190 at 1x because rotation-shared shingles drift
    past a fixed df). The fraction resolves with zero extra corpus
    passes (`char_shingles` pins the distinct pairs once and rides the
    denominator in on a one-row broadcast)."""
    from usgs_lidar_spark.operators.dedup import source_overlap_matrix

    return source_overlap_matrix(
        _t(spark, sf_dir, "documents"),
        "text", "doc_id", "source", k=8, max_df=None, max_df_frac=0.04,
    )


@query(
    "pipe_dsir_select",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, unnest({_TOK_LOWER_SQL}) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), feats AS (
        SELECT doc_id, lang,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(w) + 1),
                                      i -> CAST(ascii(w[i]) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007) % 64 AS f
        FROM toks
    ), fc AS (
        SELECT g.fid AS f,
               CAST(coalesce(cr, 0) AS BIGINT) AS cr,
               CAST(coalesce(ct, 0) AS BIGINT) AS ct
        FROM (SELECT unnest(range(0, 64)) AS fid) g
        LEFT JOIN (
            SELECT f, count(*) AS cr,
                   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
            FROM feats GROUP BY f) c ON g.fid = c.f
    ), tot AS (
        SELECT CAST(sum(cr) AS BIGINT) AS tr,
               CAST(sum(ct) AS BIGINT) AS tt
        FROM fc
    ), wts AS (
        SELECT f AS feature_id,
               CAST((length(to_base(ct + 1, 2)) - 1)
                  + (length(to_base(tr + 64, 2)) - 1)
                  - (length(to_base(cr + 1, 2)) - 1)
                  - (length(to_base(tt + 64, 2)) - 1) AS BIGINT) AS weight
        FROM fc CROSS JOIN tot
    ), scored AS (
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(w2.weight) AS BIGINT) AS dsir_bits
        FROM feats t JOIN wts w2 ON t.f = w2.feature_id
        GROUP BY t.doc_id
    ), ranked AS (
        SELECT doc_id, n_tokens, dsir_bits,
               CAST(row_number() OVER (ORDER BY dsir_bits, doc_id)
                    AS BIGINT) AS r,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM scored
    )
    SELECT doc_id, n_tokens, dsir_bits, r * 4 > 3 * n AS keep
    FROM ranked
    """,
)
def pipe_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023) end to end, exact-integer:
    train IMPORTANCE weights from the target-vs-raw hashed-feature
    distributions (`operators/textquality.dsir_weights_bits`, target =
    the lang='en' slice standing in for a trusted quality corpus),
    score every token-bearing document with the per-token summed
    log-ratio (`hashed_feature_score` — the serving pass is shared with
    the supervised classifier, same feature space by construction), and
    RESAMPLE by keeping the top quartile under the exact distributed
    global rank on (dsir_bits, doc_id) — `ranking.global_rank`, no
    single-task window; the corpus total rides a one-row broadcast so
    the keep decision is a lazy integer comparison (r*4 > 3n). Output
    is every TOKEN-BEARING doc with its weight and the keep verdict —
    zero-token (empty/whitespace-only) documents are excluded BEFORE
    the rank: they carry no feature evidence, can never be selected as
    training data, and counting them in the rank denominator would
    shift every real doc's quartile cut by the corpus's junk fraction
    (n_tokens > 0 is exactly the oracle's length(trim(text)) > 0 —
    whitespace tokenization yields a token iff trimmed text is
    non-empty)."""
    from usgs_lidar_spark.operators.ranking import global_rank
    from usgs_lidar_spark.operators.textquality import (
        dsir_weights_bits,
        hashed_feature_score,
    )

    d = _t(spark, sf_dir, "documents")
    weights = dsir_weights_bits(d, F.col("lang") == "en", n_features=64)
    # Pin: `scored`'s lineage (explode + broadcast-weight join over the
    # corpus) is referenced by BOTH the rank path and the count rider —
    # unpinned, the un-replanned NO_AQE tree executes it twice (the
    # pipe_end_to_end_v5 lesson).
    scored = (
        hashed_feature_score(d, weights, n_features=64)
        .filter(F.col("n_tokens") > 0)
        .select("doc_id", "n_tokens", F.col("score").alias("dsir_bits"))
        .localCheckpoint(eager=False)
    )
    ranked = global_rank(scored, ["dsir_bits", "doc_id"], rank_col="__r")
    n = scored.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    return ranked.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "n_tokens",
        "dsir_bits",
        (F.col("__r") * 4 > 3 * F.col("__n")).alias("keep"),
    )


@query(
    "stats_bootstrap_by_lang",
    oracle=f"""
    WITH reps AS (SELECT unnest(range(0, 16)) AS b),
    cells AS (
        SELECT d.lang, r.b AS replicate, d.n_chars,
               (CASE WHEN u >= 790015083 THEN 1 ELSE 0 END
              + CASE WHEN u >= 1580030167 THEN 1 ELSE 0 END
              + CASE WHEN u >= 1975037709 THEN 1 ELSE 0 END
              + CASE WHEN u >= 2106706890 THEN 1 ELSE 0 END
              + CASE WHEN u >= 2139624185 THEN 1 ELSE 0 END) AS m
        FROM documents d CROSS JOIN reps r
        CROSS JOIN LATERAL (SELECT
            {_LEHMER_LONG(_FOLD64("d.doc_id") + " * 131 + r.b")}
            AS u) h
    ), agg AS (
        SELECT lang, replicate, CAST(sum(m) AS BIGINT) AS n_eff,
               CAST(sum(m * n_chars) AS BIGINT) AS value_sum
        FROM cells WHERE m > 0 GROUP BY lang, replicate
    )
    SELECT g.lang AS "group", CAST(r.b AS BIGINT) AS replicate,
           CAST(coalesce(a.n_eff, 0) AS BIGINT) AS n_eff,
           CAST(coalesce(a.value_sum, 0) AS BIGINT) AS value_sum
    FROM (SELECT DISTINCT lang FROM documents) g
    CROSS JOIN reps r
    LEFT JOIN agg a ON g.lang = a.lang AND r.b = a.replicate
    """,
)
def stats_bootstrap_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Poisson-bootstrap replicates of sum/count of
    n_chars (`operators/stats.poisson_bootstrap_grouped`, B=16): the
    per-source CI report — same deterministic multiplicities as the
    global bootstrap (slicing by group does not perturb any row's
    draw), one map-only pass, |groups| x B partials per partition."""
    from usgs_lidar_spark.operators.stats import poisson_bootstrap_grouped

    return poisson_bootstrap_grouped(
        _t(spark, sf_dir, "documents"), "lang", "n_chars", "doc_id",
        n_replicates=16,
    )


@query(
    "dedup_semantic_semdedup",
    oracle=f"""
    WITH m AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        -- re-encodes: every 7th vector appears again under a new id,
        -- SCALED by 1.25 — a different byte payload (exact dedup blind)
        -- with cosine ~1 to its original, the case semantic dedup exists
        -- to catch. x*1.25 is exact in double; the float32 round-trip is
        -- the same correctly-rounded op in both engines.
        SELECT vec_id + 100000 AS vec_id,
               list_transform(embedding, x -> CAST(x * 1.25 AS REAL))
                   AS embedding
        FROM embeddings WHERE vec_id % 7 = 0
    ), cent AS (
        SELECT vec_id AS cid, embedding AS cvec
        FROM embeddings WHERE vec_id < 48
    ), csim AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_cos4("e.embedding", "c.cvec")} AS csim
        FROM m e CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim) WHERE rn = 1
    ), dups AS (
        SELECT a.vec_id, CAST(count(*) AS BIGINT) AS n_dups
        FROM assigned a JOIN assigned b
          ON a.cid = b.cid AND b.vec_id < a.vec_id
        WHERE {_cos4("a.embedding", "b.embedding")} >= 0.99
        GROUP BY a.vec_id
    )
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
           CAST(coalesce(d.n_dups, 0) AS BIGINT) AS n_dups,
           coalesce(d.n_dups, 0) = 0 AS keep
    FROM assigned a LEFT JOIN dups d USING (vec_id)
    """,
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (`operators/similarity.semdedup_flags` — Abbas et al.
    2023, arXiv:2303.09540): cluster-then-dedup over the embedding
    column, the semantic tier of the dedup family (exact -> MinHash ->
    SimHash -> Levenshtein -> THIS). The corpus is embeddings plus a
    deterministic re-encode slice — every 7th vector again under a new
    id, scaled 1.25x: byte-different (exact/media dedup blind to it),
    cosine ~1 (semantic dedup's whole reason to exist) — so real
    duplicate groups collapse: keeper = the original id, n_dups = 1 on
    each re-encode. Assignment is the map-side broadcast-quantizer
    argmax against 48 seed centroids (k*dim = 3072 literal nodes is past
    the expression-path budget — the quantizer ships as one broadcast
    row, plan O(1) in k) — the sqrt-of-corpus sizing SemDeDup prescribes at
    this scale (SCALE.md measured fixed k=8 going quadratic at 10x,
    566 s, while sqrt-k stays near-linear, 16.9 s); re-encodes land in
    their original's cell under ANY quantizer (identical rounded
    centroid cosines), so the dup answer is k-robust here. Candidates
    come from the cell equi-join (sum of cell² blowup, never corpus²),
    and the oracle replays assignment + within-cell pair search over
    the same rounded cosines — the keep DECISION hashes identically
    cross-engine."""
    from usgs_lidar_spark.operators.similarity import semdedup_flags

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    reups = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(1.25)).cast("float")
        ).alias("embedding"),
    )
    corpus = emb.unionByName(reups)
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 48).collect()
    ] or [(0, [0.0])]  # empty-corpus placeholder (see sim_topk_ivf)
    return semdedup_flags(corpus, cents, threshold=0.99)


@query(
    "pipe_decontamination_13gram",
    oracle=r"""
    WITH bench AS (
        -- benchmark questions are EXCERPTS of web text (tokens 3..20 of
        -- every 97th doc) — the realistic decontamination setup: the
        -- corpus contains the page the benchmark quoted.
        SELECT array_to_string(list_slice(
            regexp_split_to_array(trim(text), '\s+'), 3, 20), ' ') AS text
        FROM documents WHERE doc_id % 97 = 0
    ), ct AS (
        SELECT doc_id,
               list_transform(regexp_split_to_array(trim(text), '\s+'),
                              w -> lower(w)) AS t
        FROM documents WHERE length(trim(text)) > 0
    ), cg AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, greatest(len(t) - 12, 0) + 1),
                      i -> array_to_string(list_slice(t, i, i + 12), ' ')))
                   AS g
        FROM ct
    ), bt AS (
        SELECT list_transform(regexp_split_to_array(trim(text), '\s+'),
                              w -> lower(w)) AS t
        FROM bench WHERE length(trim(text)) > 0
    ), bg AS (
        SELECT DISTINCT
               unnest(list_transform(range(1, greatest(len(t) - 12, 0) + 1),
                      i -> array_to_string(list_slice(t, i, i + 12), ' ')))
                   AS g
        FROM bt
    ), sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
        FROM cg GROUP BY doc_id
    ), hits AS (
        SELECT cg.doc_id, CAST(count(*) AS BIGINT) AS n_hit
        FROM cg JOIN bg USING (g) GROUP BY cg.doc_id
    )
    SELECT h.doc_id, s.n_shingles, h.n_hit,
           CAST(h.n_hit AS DOUBLE) / s.n_shingles AS hit_frac
    FROM hits h JOIN sizes s USING (doc_id)
    """,
)
def pipe_decontamination_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-lineage TOKEN-gram decontamination (`operators/pipeline.
    contaminated_docs(unit="token")` over `dedup.token_shingles` —
    Brown et al. 2020 appendix C: flag training documents sharing any
    13-gram with a benchmark): the char-shingle contamination scan's
    sibling for verbatim PHRASES, robust to whitespace/formatting drift
    that breaks byte-level shingles. The benchmark here is built the
    way real ones are contaminated — token excerpts (positions 3..20)
    of every 97th document, so the corpus provably contains each
    quoted source and the scan must recover exactly those docs (plus
    any other doc sharing a full 13-token phrase; the synthetic corpus
    has none — char-8 shingles DO cross-hit at this sf, which is the
    two units' difference made visible). Same scale shape as
    pipe_contamination: one gram-keyed equi-join against a tiny
    benchmark side (AQE-broadcast), linear in corpus, no df cap needed
    (13-grams have no stop-gram mass). min_frac=0: ANY shared 13-gram
    flags — the GPT-3 rule."""
    from usgs_lidar_spark.functions.textstats import ws_tokens
    from usgs_lidar_spark.operators.pipeline import contaminated_docs

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0).select(
        F.array_join(F.slice(ws_tokens("text"), 3, 18), " ").alias("text")
    ).withColumn("doc_id", F.lit(0))
    return contaminated_docs(
        d, bench, "text", "doc_id", k=13, max_df=None, min_frac=0.0,
        unit="token",
    ).select("doc_id", "n_shingles", "n_hit", "hit_frac")


def _sign_bucket8(col: str) -> str:
    """DuckDB sign-LSH bucket over the first 8 dims of a list column —
    the exact SQL twin of `functions/vectors.sign_lsh_bucket(col, 8)`
    (axis-aligned sign bits, seedless, engine-reproducible)."""
    terms = " + ".join(
        f"(CASE WHEN {col}[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(8)
    )
    return f"CAST({terms} AS BIGINT)"


@query(
    "dedup_semdedup_hotcell",
    oracle=f"""
    WITH m AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000 AS vec_id,
               list_transform(embedding, x -> CAST(x * 1.25 AS REAL))
                   AS embedding
        FROM embeddings WHERE vec_id % 7 = 0
    ), cent AS (
        SELECT vec_id AS cid, embedding AS cvec
        FROM embeddings WHERE vec_id < 8
    ), csim AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_cos4("e.embedding", "c.cvec")} AS csim
        FROM m e CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, embedding, cid,
               {_sign_bucket8("embedding")} AS sub
        FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim) WHERE rn = 1
    ), hot AS (
        SELECT cid, count(*) > 72 AS is_hot FROM assigned GROUP BY cid
    ), dups AS (
        SELECT a.vec_id, CAST(count(*) AS BIGINT) AS n_dups
        FROM assigned a JOIN assigned b
          ON a.cid = b.cid AND b.vec_id < a.vec_id
        JOIN hot h ON h.cid = a.cid
        WHERE (NOT h.is_hot OR bit_count(xor(a.sub, b.sub)) <= 1)
          AND {_cos4("a.embedding", "b.embedding")} >= 0.99
        GROUP BY a.vec_id
    )
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
           CAST(coalesce(d.n_dups, 0) AS BIGINT) AS n_dups,
           coalesce(d.n_dups, 0) = 0 AS keep
    FROM assigned a LEFT JOIN dups d USING (vec_id)
    """,
)
def dedup_semdedup_hotcell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup under the HOT-CELL GUARD (`semdedup_flags(max_cell_size
    =72, sub_bits=8)`) — the r11 verdict's lead item made a first-class
    oracled query. The corpus and keep rule match
    `dedup_semantic_semdedup`, but the quantizer is deliberately the
    FIXED k=8 seed set — the regime SCALE.md measured going quadratic
    at 10x (566 s): every cell holds ~n/8 rows, so sqrt-k sizing can't
    save the within-cell join and the guard must. Cells above 72 rows
    are sub-blocked by the deterministic axis-aligned sign bucket of
    the first 8 dims with Hamming<=1 multiprobe (the
    `sim_topk_lsh_multiprobe` probe set, applied to a SELF-join);
    cells at or under 72 keep the exact search — at sf0.01 the corpus
    splits 5 hot / 3 cold cells, so BOTH regimes execute, and at
    sf0.1 all 8 cells are hot. The oracle replays the guard semantics
    EXACTLY (bit_count(xor(sub_a, sub_b)) <= 1 on hot cells), so the
    keep decision under the relaxation hashes identically cross-engine
    — the guard is part of the contract, not silent approximation.
    Scaled re-encodes share their original's sign pattern (positive
    scaling never flips a sign bit), so every true dup group still
    collapses to its min id."""
    from usgs_lidar_spark.operators.similarity import semdedup_flags

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    reups = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(1.25)).cast("float")
        ).alias("embedding"),
    )
    corpus = emb.unionByName(reups)
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ] or [(0, [0.0])]
    return semdedup_flags(
        corpus, cents, threshold=0.99, max_cell_size=72, sub_bits=8
    )


@query(
    "dedup_semdedup_incremental",
    oracle=f"""
    WITH m AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        -- batch 1: every 7th vector re-encoded (scaled 1.25x) under
        -- id +100000 — monotone above all history ids.
        SELECT vec_id + 100000 AS vec_id,
               list_transform(embedding, x -> CAST(x * 1.25 AS REAL))
                   AS embedding
        FROM embeddings WHERE vec_id % 7 = 0
        UNION ALL
        -- batch 2, half A: every 21st vector scaled 1.5x, id +200000.
        SELECT vec_id + 200000 AS vec_id,
               list_transform(embedding, x -> CAST(x * 1.5 AS REAL))
                   AS embedding
        FROM embeddings WHERE vec_id % 21 = 0
        UNION ALL
        -- batch 2, half B: every 42nd vector scaled 0.75x, id +300000
        -- — a WITHIN-batch duplicate of half A's re-encode (and of the
        -- original and batch 1's), exercising the batch-x-batch arm.
        SELECT vec_id + 300000 AS vec_id,
               list_transform(embedding, x -> CAST(x * 0.75 AS REAL))
                   AS embedding
        FROM embeddings WHERE vec_id % 42 = 0
    ), cent AS (
        SELECT vec_id AS cid, embedding AS cvec
        FROM embeddings WHERE vec_id < 48
    ), csim AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_cos4("e.embedding", "c.cvec")} AS csim
        FROM m e CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim) WHERE rn = 1
    ), dups AS (
        SELECT a.vec_id, CAST(count(*) AS BIGINT) AS n_dups
        FROM assigned a JOIN assigned b
          ON a.cid = b.cid AND b.vec_id < a.vec_id
        WHERE {_cos4("a.embedding", "b.embedding")} >= 0.99
        GROUP BY a.vec_id
    )
    -- the incremental claim, checked one-shot: flags for BATCH ids
    -- computed batch-by-batch equal the one-shot answer over the whole
    -- corpus restricted to those ids.
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
           CAST(coalesce(d.n_dups, 0) AS BIGINT) AS n_dups,
           coalesce(d.n_dups, 0) = 0 AS keep
    FROM assigned a LEFT JOIN dups d USING (vec_id)
    WHERE a.vec_id >= 100000
    """,
)
def dedup_semdedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup (`operators/similarity.semdedup_append_flags`
    — round 13, wiring the r11-item-6 operator the r12 verdict flagged
    as dead code): dedup appended batches against committed history +
    themselves without ever re-scoring a history-history pair. The
    corpus is embeddings (history) plus TWO appended batches with
    monotone ids — batch 1 = every 7th vector scaled 1.25x (+100000);
    batch 2 = every 21st scaled 1.5x (+200000) UNION every 42nd scaled
    0.75x (+300000), so batch 2 contains within-batch duplicate pairs
    (half B dups half A) on top of batch-vs-history dups — all three
    join arms (batch x history, batch x earlier-committed-batch,
    batch x batch) carry real duplicates. The query drains the batches
    in order, committing batch 1 into the assigned store via
    `ivf_append` (assign-only-the-batch, zero history bytes moved)
    before flagging batch 2, and returns the union of the per-batch
    flags. Because the keep rule counts only LOWER-id neighbors and
    ids are monotone, committed flags are immutable and batch-wise
    flags equal the one-shot answer — which is exactly what the oracle
    checks: a single one-shot SemDeDup replay over the full corpus in
    SQL, restricted to batch ids. Expected shape: every 42nd original
    has n_dups 1 (+100000, dups the original... counted fully in the
    one-shot), e.g. the +300000 rows see three lower-id dups (original,
    1.25x, 1.5x). Scale: per batch one map-side quantizer assignment +
    one cell equi-join of batch x (cell-pruned history + batch) — the
    history is semi-join-pruned to the <=k cells the batch touches
    before any pair work."""
    from usgs_lidar_spark.operators.similarity import (
        ivf_append,
        ivf_assign,
        semdedup_append_flags,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def reenc(mod: int, off: int, scale: float) -> DataFrame:
        return emb.filter(F.col("vec_id") % mod == 0).select(
            (F.col("vec_id") + off).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x * F.lit(scale)).cast("float")
            ).alias("embedding"),
        )

    batch1 = reenc(7, 100000, 1.25)
    batch2 = reenc(21, 200000, 1.5).unionByName(reenc(42, 300000, 0.75))
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 48).collect()
    ] or [(0, [0.0])]  # empty-corpus placeholder (see sim_topk_ivf)
    hist = ivf_assign(emb, cents)
    flags1 = semdedup_append_flags(hist, batch1, cents, threshold=0.99)
    hist = ivf_append(hist, batch1, cents)
    flags2 = semdedup_append_flags(hist, batch2, cents, threshold=0.99)
    return flags1.unionByName(flags2)


def _sign_bucketn(col: str, bits: int) -> str:
    """DuckDB sign-LSH bucket over the first ``bits`` dims of a list
    column — the parameterized form of `_sign_bucket8` (same axis-aligned
    sign bits as `functions/vectors.sign_lsh_bucket(col, bits)`)."""
    terms = " + ".join(
        f"(CASE WHEN {col}[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(bits)
    )
    return f"CAST({terms} AS BIGINT)"


@query(
    "dedup_semdedup_repcollapse",
    oracle=f"""
    WITH m AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000 AS vec_id,
               list_transform(embedding, x -> CAST(x * 1.25 AS REAL))
                   AS embedding
        FROM embeddings WHERE vec_id % 7 = 0
    ), cent AS (
        SELECT vec_id AS cid, embedding AS cvec
        FROM embeddings WHERE vec_id < 8
    ), csim AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_cos4("e.embedding", "c.cvec")} AS csim
        FROM m e CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, embedding, cid,
               {_sign_bucketn("embedding", 2)} AS sub
        FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim) WHERE rn = 1
    ), hot AS (
        SELECT cid, count(*) > 72 AS is_hot FROM assigned GROUP BY cid
    ), jam AS (
        -- jammed buckets: hot (cell, sub) groups above the cap; their
        -- min id is the sole b-side-visible representative.
        SELECT a.cid, a.sub, min(a.vec_id) AS rep
        FROM assigned a JOIN hot h ON h.cid = a.cid AND h.is_hot
        GROUP BY a.cid, a.sub HAVING count(*) > 16
    ), dups AS (
        SELECT a.vec_id, CAST(count(*) AS BIGINT) AS n_dups
        FROM assigned a JOIN assigned b
          ON a.cid = b.cid AND b.vec_id < a.vec_id
        JOIN hot h ON h.cid = a.cid
        LEFT JOIN jam j ON j.cid = b.cid AND j.sub = b.sub
        WHERE (NOT h.is_hot OR bit_count(xor(a.sub, b.sub)) <= 1)
          AND (j.rep IS NULL OR b.vec_id = j.rep)
          AND {_cos4("a.embedding", "b.embedding")} >= 0.99
        GROUP BY a.vec_id
    )
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
           CAST(coalesce(d.n_dups, 0) AS BIGINT) AS n_dups,
           coalesce(d.n_dups, 0) = 0 AS keep
    FROM assigned a LEFT JOIN dups d USING (vec_id)
    """,
)
def dedup_semdedup_repcollapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup under CAP / REPRESENTATIVE-COLLAPSE (`semdedup_flags(
    max_cell_size=72, sub_bits=2, max_bucket_size=16)`) — round 13's
    rung above the hot-cell guard, for the regime the sub-block cannot
    split (SCALE.md r13: a near-identical hot cell shares one sign
    pattern and guarded cost degrades to bucket²). Same corpus and
    fixed-k=8 worst-case quantizer as `dedup_semdedup_hotcell`, but
    sub_bits=2 (4 buckets) so hot cells of ~100+ rows produce buckets
    over the 16-row cap and the collapse ACTUALLY ENGAGES at both
    driver scales (~20-35/bucket at sf0.01, ~70 at sf0.1): in a jammed
    bucket only the min-id representative remains visible as a lower-id
    neighbor — to members and Hamming<=1 probers alike — so jammed pair
    work is bucket-size, not bucket². The oracle replays the visibility
    rule EXACTLY (LEFT JOIN jam ... AND (rep IS NULL OR b = rep)), so
    the relaxed keep decision hashes identically cross-engine: the
    collapse is contract, not silent approximation. Scaled re-encodes
    share their original's sign pattern, so each true dup group still
    sits in one bucket; a re-encode whose bucket is jammed is flagged
    iff it matches the bucket REPRESENTATIVE — the audit-count
    difference vs exact search is the documented price of the cap
    (keep-set equality in the near-identical regime is pinned by
    test_semdedup_rep_collapse_keep_set_on_degenerate_cell)."""
    from usgs_lidar_spark.operators.similarity import semdedup_flags

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    reups = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(1.25)).cast("float")
        ).alias("embedding"),
    )
    corpus = emb.unionByName(reups)
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ] or [(0, [0.0])]
    return semdedup_flags(
        corpus, cents, threshold=0.99, max_cell_size=72, sub_bits=2,
        max_bucket_size=16,
    )


@query(
    "pipe_semantic_decontamination",
    oracle=f"""
    WITH bench AS (
        -- the benchmark is built the way real ones leak: RE-ENCODES of
        -- every 97th corpus page (scaled 1.25, float32 round-trip) —
        -- byte-different (token-gram decon may miss a paraphrase; here
        -- the surface form is gone entirely), cosine ~1 to its source.
        SELECT vec_id AS bid,
               list_transform(embedding, x -> CAST(x * 1.25 AS REAL))
                   AS embedding
        FROM embeddings WHERE vec_id % 97 = 0
    ), cent AS (
        SELECT vec_id AS cid, embedding AS cvec
        FROM embeddings WHERE vec_id < 48
    ), csim AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_cos4("e.embedding", "c.cvec")} AS csim
        FROM embeddings e CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim) WHERE rn = 1
    ), bsim AS (
        SELECT b.bid, b.embedding, c.cid,
               {_cos4("b.embedding", "c.cvec")} AS csim
        FROM bench b CROSS JOIN cent c
    ), bassigned AS (
        SELECT embedding, cid FROM (
            SELECT embedding, cid,
                   row_number() OVER (PARTITION BY bid
                                      ORDER BY csim DESC, cid) AS rn
            FROM bsim) WHERE rn = 1
    ), hits AS (
        SELECT a.vec_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM assigned a JOIN bassigned b ON a.cid = b.cid
        WHERE {_cos4("a.embedding", "b.embedding")} >= 0.99
        GROUP BY a.vec_id
    )
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           coalesce(h.n_hits, 0) > 0 AS contaminated
    FROM assigned a LEFT JOIN hits h USING (vec_id)
    """,
)
def pipe_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space test-set decontamination (`operators/similarity.
    semantic_contamination`) — the semantic tier of the contamination
    family (char-8 shingles -> token 13-grams -> THIS): flag corpus
    documents whose embedding is a near neighbor (rounded cosine >=
    0.99) of any benchmark vector, catching the paraphrase/re-encode
    leaks that share no surface n-gram with the benchmark. The bench
    here is re-encodes (x1.25, float32) of every 97th corpus vector —
    zero shared bytes with its source, cosine ~1 — so the scan must
    recover exactly those sources plus any corpus vector semantically
    near a benchmark entry. Candidates come from the SemDeDup cell
    block (48 seed centroids, the sqrt-corpus sizing): both sides
    assign map-side, the tiny assigned bench broadcasts, and the pair
    search runs inside the corpus scan stage — zero corpus shuffle
    end-to-end, vs the within-cell SELF-join SemDeDup pays. Cross-cell
    benchmark neighbors are the documented blocking relaxation,
    mirrored exactly by this oracle (same argmax assignment + rounded
    cosines), so the flag decision hashes identically cross-engine."""
    from usgs_lidar_spark.operators.similarity import semantic_contamination

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bench = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.transform(
            "embedding", lambda x: (x * F.lit(1.25)).cast("float")
        ).alias("embedding")
    )
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 48).collect()
    ] or [(0, [0.0])]
    return semantic_contamination(emb, bench, cents, threshold=0.99)


@query(
    "pipe_end_to_end_v7",
    oracle=rf"""
    WITH RECURSIVE {_SHINGLE_CTE},
    pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.6),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b AS u, id_a AS v FROM pairs),
    walk(id, reach) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT w.id, e.v FROM walk w JOIN edges e ON e.u = w.reach
    ),
    cc AS (SELECT id AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY id),
    scored AS (SELECT cc.doc_id, cc.cluster_id, d.n_chars
               FROM cc JOIN documents d USING (doc_id)),
    keepers AS (SELECT first(doc_id ORDER BY n_chars DESC, doc_id) AS doc_id,
                       cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
                FROM scored GROUP BY cluster_id),
    bench AS (
        SELECT list_transform(embedding, x -> CAST(x * 1.25 AS REAL))
                   AS embedding
        FROM embeddings WHERE vec_id % 97 = 0
    ), cent AS (
        SELECT vec_id AS cid, embedding AS cvec
        FROM embeddings WHERE vec_id < 48
    ), corpus AS (
        SELECT e.vec_id, e.embedding FROM embeddings e
        JOIN keepers k ON e.vec_id = k.doc_id
    ), csim AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_cos4("e.embedding", "c.cvec")} AS csim
        FROM corpus e CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim) WHERE rn = 1
    ), bsim AS (
        SELECT b.rn AS bid, b.embedding, c.cid,
               {_cos4("b.embedding", "c.cvec")} AS csim
        FROM (SELECT row_number() OVER () AS rn, embedding FROM bench) b
        CROSS JOIN cent c
    ), bassigned AS (
        SELECT embedding, cid FROM (
            SELECT embedding, cid,
                   row_number() OVER (PARTITION BY bid
                                      ORDER BY csim DESC, cid) AS rn
            FROM bsim) WHERE rn = 1
    ), hits AS (
        SELECT a.vec_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM assigned a JOIN bassigned b ON a.cid = b.cid
        WHERE {_cos4("a.embedding", "b.embedding")} >= 0.99
        GROUP BY a.vec_id
    ), toks AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+'))
                    END AS n_tokens
        FROM documents
    )
    SELECT k.doc_id, CAST(k.cluster_id AS BIGINT) AS cluster_id,
           k.cluster_size, CAST(t.n_tokens AS BIGINT) AS n_tokens
    FROM keepers k
    LEFT JOIN hits h ON h.vec_id = k.doc_id
    JOIN toks t ON t.doc_id = k.doc_id
    WHERE coalesce(h.n_hits, 0) = 0 AND t.n_tokens >= 8
    """,
)
def pipe_end_to_end_v7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed pipeline v7 — the CURATION path, stitching round 13's
    two new operators into the family (v6 = ingest; THIS = what runs
    between crawl and tokenizer): (1) near-dup cluster collapse with
    QUALITY-AWARE keeper selection (`collapse_clusters_keep_best` by
    n_chars — longest version of each page wins, not first-crawled);
    (2) SEMANTIC test-set decontamination of the keepers
    (`semantic_contamination` over their embeddings vs x1.25 re-encode
    benchmark — the paraphrase leak token-grams miss); (3) a minimum-
    length gate (>= 8 whitespace tokens). Output: the surviving
    training set with its audit columns (cluster id/size, token
    count). Stage order is the cost argument: dedup first so the
    per-row decon fold is paid only for keepers; decon's corpus side
    is the keeper semi-join (broadcast bench, zero corpus exchange);
    the length gate is a free scan predicate. Every stage's relaxations
    are the ones its standalone oracle pins (cell blocking, LSH
    banding); this oracle replays the full composition end-to-end."""
    from usgs_lidar_spark.functions.textstats import token_count
    from usgs_lidar_spark.operators.dedup import minhash_lsh_pairs
    from usgs_lidar_spark.operators.graph import collapse_clusters_keep_best
    from usgs_lidar_spark.operators.similarity import semantic_contamination

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, "text", "doc_id", k=8, num_perm=64, bands=32,
        threshold=0.6, max_df=20,
    )
    # keepers feeds three consumers (decon corpus semi-join, the flagged
    # anti-join's lineage, the final output join) — pin it once or the
    # whole cluster-collapse subtree re-evaluates per consumer.
    keepers = (
        collapse_clusters_keep_best(d, pairs, score_col="n_chars")
        .filter(F.col("is_kept"))
        .select("doc_id", "cluster_id", "cluster_size")
        .localCheckpoint(eager=False)
    )
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.join(
        keepers.select(F.col("doc_id").alias("vec_id")), "vec_id", "semi"
    )
    bench = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.transform(
            "embedding", lambda x: (x * F.lit(1.25)).cast("float")
        ).alias("embedding")
    )
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 48).collect()
    ] or [(0, [0.0])]
    # Drop by ANTI-join on the flagged set, not semi-join on the clean
    # set: a keeper with no embedding row cannot be scored and therefore
    # cannot be flagged — it must survive (the oracle's LEFT JOIN hits
    # ... coalesce(n_hits, 0) = 0 semantics). At sf0.1 the embeddings
    # table deliberately covers only a prefix of documents, so the
    # difference is live, not theoretical.
    flagged = (
        semantic_contamination(corpus, bench, cents, threshold=0.99)
        .filter(F.col("contaminated"))
        .select(F.col("vec_id").alias("doc_id"))
    )
    return (
        keepers.join(flagged, "doc_id", "anti")
        .join(d.select("doc_id", token_count("text").alias("n_tokens")),
              "doc_id")
        .filter(F.col("n_tokens") >= 8)
        .select("doc_id", "cluster_id", "cluster_size", "n_tokens")
    )


@query(
    "pipe_semantic_decon_hotbench",
    oracle=f"""
    WITH bench AS (
        SELECT list_transform(embedding, x -> CAST(x * 1.25 AS REAL))
                   AS embedding
        FROM embeddings WHERE vec_id % 3 = 0
    ), cent AS (
        SELECT vec_id AS cid, embedding AS cvec
        FROM embeddings WHERE vec_id < 8
    ), csim AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_cos4("e.embedding", "c.cvec")} AS csim
        FROM embeddings e CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, embedding, cid,
               {_sign_bucket8("embedding")} AS sub
        FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim) WHERE rn = 1
    ), bsim AS (
        SELECT b.rn AS bid, b.embedding, c.cid,
               {_cos4("b.embedding", "c.cvec")} AS csim
        FROM (SELECT row_number() OVER () AS rn, embedding FROM bench) b
        CROSS JOIN cent c
    ), bassigned AS (
        SELECT embedding, cid, {_sign_bucket8("embedding")} AS bsub
        FROM (
            SELECT embedding, cid,
                   row_number() OVER (PARTITION BY bid
                                      ORDER BY csim DESC, cid) AS rn
            FROM bsim) WHERE rn = 1
    ), psize AS (
        SELECT cid, count(*) > 16 AS is_hot FROM bassigned GROUP BY cid
    ), hits AS (
        SELECT a.vec_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM assigned a JOIN bassigned b ON a.cid = b.cid
        JOIN psize p ON p.cid = a.cid
        WHERE (NOT p.is_hot OR bit_count(xor(a.sub, b.bsub)) <= 1)
          AND {_cos4("a.embedding", "b.embedding")} >= 0.99
        GROUP BY a.vec_id
    )
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           coalesce(h.n_hits, 0) > 0 AS contaminated
    FROM assigned a LEFT JOIN hits h USING (vec_id)
    """,
)
def pipe_semantic_decon_hotbench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination under the HOT-PACK GUARD
    (`semantic_contamination(max_pack_size=16, sub_bits=8)`) — the
    SemDeDup hot-cell guard transplanted to the asymmetric corpus x
    bench join, exercised in its engaged regime: a deliberately coarse
    fixed k=8 quantizer plus a LARGE clustered benchmark (re-encodes of
    every 3rd vector, ~a third of the corpus) parks bench packs well
    over the 16-vector cap, so hot cells pre-expand Hamming<=1 packs on
    the bench side while cold cells keep the exact per-cell pack — BOTH
    regimes live at the driver scales (~20/cell at sf0.01, ~80 at
    sf0.1). Re-encodes share their source's sign pattern exactly
    (positive scaling never flips a sign), so every true leak survives
    the block; the relaxation (hot pairs counted only within Hamming<=1
    of the leading 8 sign bits) is mirrored exactly by this oracle's
    bit_count(xor) <= 1, keeping the flag decision hash-stable
    cross-engine — contract, not silent approximation."""
    from usgs_lidar_spark.operators.similarity import semantic_contamination

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bench = emb.filter(F.col("vec_id") % 3 == 0).select(
        F.transform(
            "embedding", lambda x: (x * F.lit(1.25)).cast("float")
        ).alias("embedding")
    )
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ] or [(0, [0.0])]
    return semantic_contamination(
        emb, bench, cents, threshold=0.99, max_pack_size=16, sub_bits=8
    )


@query(
    "text_viterbi_segment",
    oracle=r"""
    WITH cand AS (
        SELECT d.doc_id, CAST(s.s AS INTEGER) AS s,
               CAST(s.s + l.l - 1 AS INTEGER) AS e,
               substring(d.text, CAST(s.s AS INTEGER), CAST(l.l AS INTEGER))
                   AS piece
        FROM documents d
        CROSS JOIN LATERAL (SELECT unnest(range(1, length(d.text) + 1)) AS s) s
        CROSS JOIN (SELECT unnest([2, 3, 4, 5]) AS l) l
        WHERE s.s + l.l - 1 <= length(d.text)
    ), freq AS (
        SELECT piece, CAST(count(*) AS BIGINT) AS freq
        FROM cand GROUP BY piece
    ), vocab AS (
        SELECT piece FROM freq ORDER BY freq DESC, piece LIMIT 64
    ), spans AS (
        SELECT c.doc_id, c.s, c.e FROM cand c JOIN vocab v USING (piece)
    ), packs AS (
        SELECT doc_id, list({'s': s, 'e': e}) AS spans
        FROM spans GROUP BY doc_id
    ), dp AS (
        SELECT d.doc_id, CAST(length(d.text) AS INTEGER) AS n,
               list_reduce(
                 list_prepend([CAST(0 AS BIGINT)],
                     list_transform(range(1, length(d.text) + 1),
                                    i -> [CAST(i AS BIGINT)])),
                 (acc, x) -> list_append(acc,
                   least(
                     list_min(list_transform(
                       list_filter(
                         coalesce(p.spans,
                                  CAST([] AS STRUCT(s INTEGER, e INTEGER)[])),
                         sp -> sp.e = x[1]),
                       sp -> acc[sp.s] + 1)),
                     acc[CAST(x[1] AS INTEGER)] + 1))
               ) AS costs
        FROM documents d LEFT JOIN packs p USING (doc_id)
        WHERE length(d.text) > 0
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
           costs[n + 1] AS n_pieces,
           CAST(n AS DOUBLE) / costs[n + 1] AS compression
    FROM dp
    """,
)
def text_viterbi_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMAL segmentation (`operators/textquality.viterbi_min_pieces`
    over `derive_piece_vocab`) — the Viterbi step of a SentencePiece
    unigram tokenizer (Kudo 2018) with unit piece costs: minimum piece
    count per document against the corpus's own top-64 substring vocab
    (lengths 2-5, ties lexicographic), single-char fallback keeping
    every position reachable. The greedy BPE tier (`text_bpe_tokenize`)
    approximates exactly this objective; here OPTIMALITY ITSELF is
    under the hash oracle — the DuckDB side replays the identical
    shortest-path fold with list_reduce, so a DP off-by-one or a
    wrong tie-break breaks the value hash, not just a unit fixture.
    Scale shape: lattice = substring explode joined against the
    broadcast 64-piece vocab (the char_shingles shape), one span pack
    per doc, DP as a JVM-side sequential fold (no UDF, no driver);
    vocab derivation is a distributed top-k, never a global window."""
    from usgs_lidar_spark.operators.textquality import (
        derive_piece_vocab,
        viterbi_min_pieces,
    )

    d = _t(spark, sf_dir, "documents")
    vocab = derive_piece_vocab(d, vocab_size=64, min_len=2, max_len=5)
    return viterbi_min_pieces(d, vocab, min_len=2, max_len=5)


# =====================================================================
# Round 14: the jammed-pack compositional fix, PINNED — r13's
# `semantic_contamination` docstring argued that an internally-
# duplicated benchmark should be SemDeDup'd first (keepers only) and
# that the contamination DECISION survives; this query registers that
# claim under the hard oracle instead of leaving it prose.
# =====================================================================


@query(
    "pipe_decon_dedup_bench",
    oracle=f"""
    WITH bench AS (
        -- internally-duplicated benchmark: every 97th corpus vector
        -- re-encoded FIVE times (x(1.25 + 0.05j), float32 round-trip)
        -- under distinct ids — same exemplar, cosine exactly 1 after
        -- rounding, one shared cell: the jammed-pack regime.
        SELECT e.vec_id * 5 + j.j AS bid,
               list_transform(e.embedding,
                   x -> CAST(x * (1.25 + 0.05 * j.j) AS REAL)) AS embedding
        FROM embeddings e, (SELECT unnest(range(0, 5)) AS j) j
        WHERE e.vec_id % 97 = 0
    ), cent AS (
        SELECT vec_id AS cid, embedding AS cvec
        FROM embeddings WHERE vec_id < 48
    ), csim AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_cos4("e.embedding", "c.cvec")} AS csim
        FROM embeddings e CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim) WHERE rn = 1
    ), bsim AS (
        SELECT b.bid, b.embedding, c.cid,
               {_cos4("b.embedding", "c.cvec")} AS csim
        FROM bench b CROSS JOIN cent c
    ), bassigned AS (
        SELECT bid, embedding, cid FROM (
            SELECT bid, embedding, cid,
                   row_number() OVER (PARTITION BY bid
                                      ORDER BY csim DESC, cid) AS rn
            FROM bsim) WHERE rn = 1
    ), bdup AS (
        -- SemDeDup keep rule over the BENCH: drop iff some lower-id
        -- same-cell neighbor has rounded cosine >= 0.99.
        SELECT DISTINCT a.bid
        FROM bassigned a JOIN bassigned b
          ON a.cid = b.cid AND b.bid < a.bid
        WHERE {_cos4("a.embedding", "b.embedding")} >= 0.99
    ), keepers AS (
        SELECT * FROM bassigned WHERE bid NOT IN (SELECT bid FROM bdup)
    ), hits_full AS (
        SELECT a.vec_id, count(*) AS n
        FROM assigned a JOIN bassigned b ON a.cid = b.cid
        WHERE {_cos4("a.embedding", "b.embedding")} >= 0.99
        GROUP BY a.vec_id
    ), hits_dedup AS (
        SELECT a.vec_id, count(*) AS n
        FROM assigned a JOIN keepers b ON a.cid = b.cid
        WHERE {_cos4("a.embedding", "b.embedding")} >= 0.99
        GROUP BY a.vec_id
    )
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
           coalesce(hd.n, 0) > 0 AS contaminated_dedup,
           coalesce(hf.n, 0) > 0 AS contaminated_full,
           (coalesce(hd.n, 0) > 0) = (coalesce(hf.n, 0) > 0) AS agree
    FROM assigned a
    LEFT JOIN hits_dedup hd ON hd.vec_id = a.vec_id
    LEFT JOIN hits_full hf ON hf.vec_id = a.vec_id
    """,
)
def pipe_decon_dedup_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-self-dedup decontamination — the jammed-pack fix as a
    REGISTERED composition (`semdedup_flags` over the benchmark,
    keepers only -> `semantic_contamination`), pinned for DECISION
    EQUALITY against decon over the full duplicated bench. The fixture
    is the degenerate regime the hot-pack guard cannot split: every
    97th corpus vector re-encoded five times under cosine-invariant
    rescales, so all copies of an exemplar share one cell (and one
    sign pattern). SemDeDup'ing the bench first keeps one copy per
    exemplar — a bench-sized pass — and the per-corpus-row fold cost
    drops by the duplication factor (measured flat in SCALE.md round
    14, decon_jammed_bench), while the contaminated decision is
    UNCHANGED: each dropped copy is cosine ~1 to its keeper, in the
    keeper's cell, so any corpus row above threshold to a copy is
    above threshold to the keeper (at sf0.01: 500/500 agree, 6
    contaminated either way). Output carries BOTH decisions plus the
    agreement bit, and the oracle replays bench dedup, both decon
    passes, and the comparison — so equality is under the value hash,
    not asserted in prose. Production runs only the dedup path; the
    full path exists here to keep the equality claim checkable."""
    from usgs_lidar_spark.operators.similarity import (
        semantic_contamination,
        semdedup_flags,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bench = (
        emb.filter(F.col("vec_id") % 97 == 0)
        .select(
            "vec_id",
            "embedding",
            F.explode(F.sequence(F.lit(0), F.lit(4))).alias("j"),
        )
        .select(
            (F.col("vec_id") * 5 + F.col("j")).alias("bid"),
            F.transform(
                "embedding",
                lambda x: (
                    x * (F.lit(1.25) + F.lit(0.05) * F.col("j"))
                ).cast("float"),
            ).alias("embedding"),
        )
    )
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 48).collect()
    ] or [(0, [0.0])]
    bflags = semdedup_flags(bench, cents, threshold=0.99, id_col="bid")
    keepers = bench.join(
        bflags.filter("keep").select("bid"), "bid"
    ).select("embedding")
    dedup = semantic_contamination(
        emb, keepers, cents, threshold=0.99
    ).select(
        "vec_id", "cid", F.col("contaminated").alias("contaminated_dedup")
    )
    full = semantic_contamination(
        emb, bench.select("embedding"), cents, threshold=0.99
    ).select("vec_id", F.col("contaminated").alias("contaminated_full"))
    return dedup.join(full, "vec_id").select(
        "vec_id",
        "cid",
        "contaminated_dedup",
        "contaminated_full",
        (F.col("contaminated_dedup") == F.col("contaminated_full")).alias(
            "agree"
        ),
    )


@query(
    "text_viterbi_weighted",
    oracle=r"""
    WITH cand AS (
        SELECT d.doc_id, CAST(s.s AS INTEGER) AS s,
               CAST(s.s + l.l - 1 AS INTEGER) AS e,
               substring(d.text, CAST(s.s AS INTEGER), CAST(l.l AS INTEGER))
                   AS piece
        FROM documents d
        CROSS JOIN LATERAL (SELECT unnest(range(1, length(d.text) + 1)) AS s) s
        CROSS JOIN (SELECT unnest([2, 3, 4, 5]) AS l) l
        WHERE s.s + l.l - 1 <= length(d.text)
    ), freq AS (
        SELECT piece, CAST(count(*) AS BIGINT) AS freq
        FROM cand GROUP BY piece
    ), vocab AS (
        SELECT piece,
               CAST(row_number() OVER (ORDER BY freq DESC, piece) AS BIGINT)
                   AS w
        FROM freq ORDER BY freq DESC, piece LIMIT 64
    ), spans AS (
        SELECT c.doc_id, c.s, c.e, v.w
        FROM cand c JOIN vocab v USING (piece)
    ), packs AS (
        SELECT doc_id, list({'s': s, 'e': e, 'w': w}) AS spans
        FROM spans GROUP BY doc_id
    ), dp AS (
        SELECT d.doc_id, CAST(length(d.text) AS INTEGER) AS n,
               list_reduce(
                 list_prepend([CAST(0 AS BIGINT)],
                     list_transform(range(1, length(d.text) + 1),
                                    i -> [CAST(i AS BIGINT)])),
                 (acc, x) -> list_append(acc,
                   least(
                     list_min(list_transform(
                       list_filter(
                         coalesce(p.spans,
                                  CAST([] AS
                                       STRUCT(s INTEGER, e INTEGER,
                                              w BIGINT)[])),
                         sp -> sp.e = x[1]),
                       sp -> acc[sp.s] + sp.w)),
                     acc[CAST(x[1] AS INTEGER)] + 65))
               ) AS costs
        FROM documents d LEFT JOIN packs p USING (doc_id)
        WHERE length(d.text) > 0
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
           costs[n + 1] AS total_cost,
           CAST(costs[n + 1] AS DOUBLE) / n AS cost_per_char
    FROM dp
    """,
)
def text_viterbi_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED Viterbi segmentation (round 14 — r13 verdict item 6):
    `operators/textquality.viterbi_min_cost` with integer frequency-
    RANK costs — piece cost = its 1-based rank in `derive_piece_vocab`'s
    freq-desc/piece-asc order, single-char fallback = vocab_size + 1
    (= 65) — so segmentation prefers COMMON pieces, the quality-aware
    objective a real unigram tokenizer's -log p costs encode, in the
    integer form both engines reproduce bit-for-bit (rank is monotone
    in frequency, so the preference ORDER matches -log p; cross-engine
    float logs would break the hash in the last ulp). The DuckDB side
    replays vocab ranking AND the weighted shortest-path fold with
    list_reduce, so the weighted optimum itself is under the value
    hash. Plan shape identical to `text_viterbi_segment`: broadcast
    64-piece vocab, one span pack per doc, JVM-side sequential fold,
    no UDF, no driver participation; the rank window runs over the
    64-row vocab frame only, never data."""
    from pyspark.sql import Window as W

    from usgs_lidar_spark.operators.textquality import (
        derive_piece_vocab,
        viterbi_min_cost,
    )

    d = _t(spark, sf_dir, "documents")
    vocab = derive_piece_vocab(d, vocab_size=64, min_len=2, max_len=5)
    ranked = vocab.select(
        "piece",
        F.row_number()
        .over(W.orderBy(F.desc("freq"), F.asc("piece")))
        .cast("long")
        .alias("cost"),
    )
    return viterbi_min_cost(
        d, ranked, fallback_cost=65, min_len=2, max_len=5
    )


@query(
    "pipe_end_to_end_v8",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
        FROM documents WHERE length(trim(text)) > 0
    ), ch AS (
        SELECT doc_id, CAST(s // 4 AS BIGINT) AS chunk_id,
               array_to_string(list_slice(tk, s + 1, s + 4), ' ') AS ct
        FROM (SELECT doc_id, tk, unnest(range(0, len(tk), 4)) AS s FROM t)
    ), ranked AS (
        SELECT doc_id, chunk_id, ct,
               row_number() OVER (PARTITION BY ct
                                  ORDER BY doc_id, chunk_id) AS rn
        FROM ch
    ), kept AS (SELECT doc_id, chunk_id, ct FROM ranked WHERE rn = 1),
    tot AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
        FROM ch GROUP BY doc_id
    ), kp AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(ct, ' ' ORDER BY chunk_id) AS new_text
        FROM kept GROUP BY doc_id
    ), bench AS (
        SELECT list_transform(embedding, x -> CAST(x * 1.25 AS REAL))
                   AS embedding
        FROM embeddings WHERE vec_id % 97 = 0
    ), cent AS (
        SELECT vec_id AS cid, embedding AS cvec
        FROM embeddings WHERE vec_id < 48
    ), csim AS (
        SELECT e.vec_id, e.embedding, c.cid,
               {_cos4("e.embedding", "c.cvec")} AS csim
        FROM embeddings e CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY csim DESC, cid) AS rn
            FROM csim) WHERE rn = 1
    ), bsim AS (
        SELECT b.rn AS bid, b.embedding, c.cid,
               {_cos4("b.embedding", "c.cvec")} AS csim
        FROM (SELECT row_number() OVER () AS rn, embedding FROM bench) b
        CROSS JOIN cent c
    ), bassigned AS (
        SELECT embedding, cid FROM (
            SELECT embedding, cid,
                   row_number() OVER (PARTITION BY bid
                                      ORDER BY csim DESC, cid) AS rn
            FROM bsim) WHERE rn = 1
    ), hits AS (
        SELECT DISTINCT a.vec_id
        FROM assigned a JOIN bassigned b ON a.cid = b.cid
        WHERE {_cos4("a.embedding", "b.embedding")} >= 0.99
    ), alive AS (
        SELECT tot.doc_id, tot.n_chunks, kp.n_kept,
               CASE WHEN trim(kp.new_text) = '' THEN 0
                    ELSE len(string_split_regex(trim(kp.new_text), '\s+'))
                    END AS n_tokens,
               {_LEHMER_STREAM("tot.doc_id", 8)} AS pack_stream
        FROM tot JOIN kp ON tot.doc_id = kp.doc_id
        WHERE kp.n_kept > 0
          AND tot.doc_id NOT IN (SELECT vec_id FROM hits)
    ), packed AS (
        SELECT doc_id, n_chunks, n_kept, pack_stream,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT)
                   AS token_start,
               CAST(sum(n_tokens) OVER w AS BIGINT) AS token_end
        FROM alive
        WINDOW w AS (PARTITION BY pack_stream ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT doc_id, n_chunks, n_kept, pack_stream, n_tokens, token_start,
           CAST(floor(token_start / 512.0) AS BIGINT) AS pack_id,
           token_start % 512 AS pack_offset,
           token_end > (floor(token_start / 512.0) + 1) * 512
               AS split_across
    FROM packed
    """,
)
def pipe_end_to_end_v8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed pipeline v8 — the INGEST + DECON path (round 14): v6's
    cross-document passage dedup + reassembly (`chunk_dedup_docs`,
    4-token chunks, drop fully-deduped docs), then a SEMANTIC
    decontamination gate over the survivors' embeddings
    (`semantic_contamination` vs the x1.25 re-encode benchmark, anti-
    join on the flagged set — a doc with no embedding row survives,
    the v7 convention), then 512-token Lehmer-stream sequence packing
    over what remains. This is the batch twin of the STREAMING
    composition `streaming/ingest.py::semantic_decon_ingest_writer` +
    `chunk_dedup_ingest_writer`: the drain-parity test pins that
    draining both foreachBatch ingests (including a crash replay) and
    composing their outputs reproduces THIS query bit-for-bit, so the
    oracle hard-checks the incremental decon too. Packing runs AFTER
    the gate — token offsets are over the decontaminated stream, the
    order a real pipeline needs (dropping flagged docs post-packing
    would leave holes in every pack)."""
    from usgs_lidar_spark.functions.textstats import token_count
    from usgs_lidar_spark.operators.dedup import chunk_dedup_docs
    from usgs_lidar_spark.operators.pipeline import pack_sequences
    from usgs_lidar_spark.operators.similarity import semantic_contamination

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ded = chunk_dedup_docs(d, chunk_tokens=4).filter(F.col("n_kept") > 0)
    bench = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.transform(
            "embedding", lambda x: (x * F.lit(1.25)).cast("float")
        ).alias("embedding")
    )
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 48).collect()
    ] or [(0, [0.0])]
    flagged = (
        semantic_contamination(emb, bench, cents, threshold=0.99)
        .filter("contaminated")
        .select(F.col("vec_id").alias("doc_id"))
    )
    clean = ded.join(flagged, "doc_id", "left_anti")
    return pack_sequences(
        clean.select("doc_id", "n_chunks", "n_kept", "new_text"),
        "doc_id",
        token_count("new_text"),
        budget=512,
        n_streams=8,
    ).select(
        "doc_id", "n_chunks", "n_kept", "pack_stream", "n_tokens",
        "token_start", "pack_id", "pack_offset", "split_across",
    )


def _V9_ORACLE() -> str:
    from usgs_lidar_spark.plans.q3_analytics import _DHASH_CTE

    cos_ab = """ROUND(
          list_sum(list_transform(list_zip(ea.embedding, eb.embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(ea.embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(eb.embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)"""
    return f"""
    WITH RECURSIVE m AS (
        SELECT doc_id AS media_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS media_id,
               substr(text, 1, length(text) // 2)
                 || '~' || substr(text, length(text) // 2 + 2) AS text
        FROM documents WHERE doc_id % 7 = 0
    ),
    {_DHASH_CTE},
    pairs AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b
      FROM h a JOIN h b
        ON a.media_id < b.media_id
       AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
      WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
    ),
    emap AS (
      SELECT media_id,
             CASE WHEN media_id >= 100000 THEN
                 CASE WHEN (media_id - 100000) % 21 = 0
                      THEN media_id - 100000 + 3
                      ELSE media_id - 100000 END
             ELSE media_id END AS eid
      FROM m
    ),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM pairs c
      JOIN emap xa ON xa.media_id = c.id_a
      JOIN embeddings ea ON ea.vec_id = xa.eid
      JOIN emap xb ON xb.media_id = c.id_b
      JOIN embeddings eb ON eb.vec_id = xb.eid
      WHERE {cos_ab} >= 0.9
    ),
    edges AS (SELECT id_a AS u, id_b AS v FROM verified
              UNION SELECT id_b AS u, id_a AS v FROM verified),
    walk(id, reach) AS (
        SELECT media_id, media_id FROM m
        UNION
        SELECT w.id, e.v FROM walk w JOIN edges e ON e.u = w.reach
    ),
    cc AS (SELECT id AS media_id, min(reach) AS cluster_id
           FROM walk GROUP BY id),
    keepers AS (SELECT media_id FROM cc WHERE media_id = cluster_id),
    gatein AS (
      SELECT k.media_id, x.eid,
             CASE WHEN x.eid % 5 = 0 THEN x.eid + 3 ELSE x.eid END
                 AS img_eid
      FROM keepers k JOIN emap x USING (media_id)
    ),
    gated AS (
      SELECT g.media_id, {cos_ab} AS clip_score
      FROM gatein g
      JOIN embeddings ea ON ea.vec_id = g.eid
      JOIN embeddings eb ON eb.vec_id = g.img_eid
    ),
    kept AS (
      SELECT g.media_id, CAST(strlen(m.text) AS BIGINT) AS n_bytes,
             {_LEHMER_STREAM("g.media_id", 8)} AS pack_stream
      FROM gated g JOIN m USING (media_id)
      WHERE g.clip_score >= 0.9
    ),
    packed AS (
      SELECT media_id, pack_stream, n_bytes,
             CAST(sum(n_bytes) OVER w - n_bytes AS BIGINT) AS byte_start,
             CAST(sum(n_bytes) OVER w AS BIGINT) AS byte_end
      FROM kept
      WINDOW w AS (PARTITION BY pack_stream ORDER BY media_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT media_id, CAST(pack_stream AS BIGINT) AS pack_stream, n_bytes,
           byte_start,
           CAST(floor(byte_start / 4096.0) AS BIGINT) AS shard_id,
           byte_start % 4096 AS shard_offset,
           byte_end > (floor(byte_start / 4096.0) + 1) * 4096
               AS split_across
    FROM packed
    """


@query("pipe_end_to_end_v9", oracle=_V9_ORACLE())
def pipe_end_to_end_v9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end MULTIMODAL curation (round 15 — the v-series moves to
    image-text): two-tier near-dup dedup (dHash banded candidates ->
    embedding-cosine verify -> CC, min-id keepers — the
    `mm_near_dedup_semantic` composition) -> image-text pair gate over
    the keepers (`image_text_gate`: rounded caption x image cosine >=
    0.9; every fifth mapped id carries a mismatched image vector — the
    misaligned-crawl drop) -> BYTE-budget shard packing of the aligned
    survivors (`pack_sequences` over payload bytes, 4096-byte shards, 8
    Lehmer streams) — the loader-facing output of a multimodal
    training-data pipeline: which payload bytes land where in which
    shard. Stage order is the cost argument: dedup first so the gate's
    embedding joins are paid per KEEPER, gate before packing so shard
    offsets cover exactly the trainable stream (the v8 rule, one
    modality up). Payloads never shuffle — hashes, pair ids, embedding
    ids, and byte counts move; the pack is one window over one
    stream-keyed shuffle. Drop semantics at every tier are strict-
    verify: no embedding row -> no merge at tier 1, no trainable pair
    at tier 2 (inner joins in both engines)."""
    from usgs_lidar_spark.multimodal import (
        fake_dhash_image,
        image_text_gate,
        near_dup_media_by_dhash,
        semantic_verify_pairs,
        to_media_table,
    )
    from usgs_lidar_spark.operators.graph import collapse_clusters
    from usgs_lidar_spark.operators.pipeline import pack_sequences

    d = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    n = F.length("text")
    reup = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, F.floor(n / 2).cast("int")),
            F.lit("~"),
            F.expr(
                "substring(text, CAST(length(text) / 2 AS INT) + 2)"
            ),
        ).alias("text"),
    )
    media = to_media_table(
        d.select("doc_id", "text").unionByName(reup), "doc_id", "text"
    ).localCheckpoint(eager=False)  # three consumers: hash, emap, sizes
    doc0 = F.col("media_id") - 100000
    eid = F.when(
        F.col("media_id") >= 100000,
        F.when(doc0 % 21 == 0, doc0 + 3).otherwise(doc0),
    ).otherwise(F.col("media_id"))
    emap = media.select("media_id", eid.alias("__eid"))
    media_emb = emap.join(
        emb.select(F.col("vec_id").alias("__eid"), "embedding"), "__eid"
    ).select("media_id", "embedding")
    verified = semantic_verify_pairs(
        near_dup_media_by_dhash(fake_dhash_image(media), max_hamming=3),
        media_emb, threshold=0.9, id_col="media_id",
    )
    keepers = collapse_clusters(
        media.select("media_id"), verified,
        id_col="media_id", pair_a="id_a", pair_b="id_b",
    ).filter(F.col("is_kept")).select("media_id")
    img_eid = F.when(
        F.col("__eid") % 5 == 0, F.col("__eid") + 3
    ).otherwise(F.col("__eid"))
    gate_in = (
        keepers.join(emap, "media_id")
        .withColumn("__img_eid", img_eid)
        .join(
            emb.select(
                F.col("vec_id").alias("__eid"),
                F.col("embedding").alias("caption_embedding"),
            ),
            "__eid",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("__img_eid"),
                F.col("embedding").alias("image_embedding"),
            ),
            "__img_eid",
        )
    )
    kept = (
        image_text_gate(gate_in, threshold=0.9)
        .filter(F.col("kept"))
        .join(media.select("media_id", "n_bytes"), "media_id")
        .select("media_id", "n_bytes")
    )
    packed = pack_sequences(
        kept, "media_id", F.col("n_bytes"), budget=4096, n_streams=8
    )
    return packed.select(
        "media_id",
        F.col("pack_stream").cast("long").alias("pack_stream"),
        F.col("n_tokens").alias("n_bytes"),
        F.col("token_start").alias("byte_start"),
        F.col("pack_id").alias("shard_id"),
        F.col("pack_offset").alias("shard_offset"),
        "split_across",
    )


def _V10_ORACLE() -> str:
    from usgs_lidar_spark.plans.q2_ann_pipeline import _cos4
    from usgs_lidar_spark.plans.q3_analytics import _DHASH_CTE

    cos_ab = _cos4("ea.embedding", "eb.embedding")
    # SQL twin of functions/vectors.sign_lsh_bucket(n_bits=6): sign bits
    # of the first six dims (axis-aligned hyperplanes, no randomness).
    bucket = """CAST((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
                  + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
                  + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
                  + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
                  + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)
                AS BIGINT)"""
    return f"""
    WITH RECURSIVE m AS (
        SELECT doc_id AS media_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS media_id,
               substr(text, 1, length(text) // 2)
                 || '~' || substr(text, length(text) // 2 + 2) AS text
        FROM documents WHERE doc_id % 7 = 0
    ),
    {_DHASH_CTE},
    pairs AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b
      FROM h a JOIN h b
        ON a.media_id < b.media_id
       AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
      WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
    ),
    emap AS (
      SELECT media_id,
             CASE WHEN media_id >= 100000 THEN
                 CASE WHEN (media_id - 100000) % 21 = 0
                      THEN media_id - 100000 + 3
                      ELSE media_id - 100000 END
             ELSE media_id END AS eid
      FROM m
    ),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM pairs c
      JOIN emap xa ON xa.media_id = c.id_a
      JOIN embeddings ea ON ea.vec_id = xa.eid
      JOIN emap xb ON xb.media_id = c.id_b
      JOIN embeddings eb ON eb.vec_id = xb.eid
      WHERE {cos_ab} >= 0.9
    ),
    edges AS (SELECT id_a AS u, id_b AS v FROM verified
              UNION SELECT id_b AS u, id_a AS v FROM verified),
    walk(id, reach) AS (
        SELECT media_id, media_id FROM m
        UNION
        SELECT w.id, e.v FROM walk w JOIN edges e ON e.u = w.reach
    ),
    cc AS (SELECT id AS media_id, min(reach) AS cluster_id
           FROM walk GROUP BY id),
    keepers AS (SELECT media_id FROM cc WHERE media_id = cluster_id),
    gatein AS (
      SELECT k.media_id, x.eid,
             CASE WHEN x.eid % 5 = 0 THEN x.eid + 3 ELSE x.eid END
                 AS img_eid
      FROM keepers k JOIN emap x USING (media_id)
    ),
    gated AS (
      SELECT g.media_id, g.eid, {cos_ab} AS clip_score
      FROM gatein g
      JOIN embeddings ea ON ea.vec_id = g.eid
      JOIN embeddings eb ON eb.vec_id = g.img_eid
    ),
    imgs AS (SELECT media_id, eid FROM gated WHERE clip_score >= 0.9),
    cap AS (SELECT i.media_id, embedding AS cvec, {bucket} AS bucket
            FROM imgs i JOIN embeddings e ON e.vec_id = i.eid),
    t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
          FROM documents WHERE length(trim(text)) > 0),
    ch AS (SELECT doc_id, CAST(s // 16 AS BIGINT) AS chunk_id,
                  (doc_id * 13 + CAST(s // 16 AS BIGINT) * 7) % 500
                      AS pe_id
           FROM (SELECT doc_id, tk, unnest(range(0, len(tk), 16)) AS s
                 FROM t)),
    pas AS (SELECT ch.doc_id, ch.chunk_id, embedding AS pvec,
                   {bucket} AS bucket
            FROM ch JOIN embeddings e ON e.vec_id = ch.pe_id),
    cand AS (SELECT c.media_id, p.doc_id, p.chunk_id,
                    {_cos4("c.cvec", "p.pvec")} AS score
             FROM cap c JOIN pas p USING (bucket)
             WHERE {_cos4("c.cvec", "p.pvec")} >= 0.2),
    best AS (SELECT *, row_number() OVER (PARTITION BY media_id
                  ORDER BY score DESC, doc_id, chunk_id) AS rn FROM cand),
    placed AS (SELECT media_id, doc_id, chunk_id, score
               FROM best WHERE rn = 1),
    capped AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, media_id) AS dn FROM placed)
    SELECT doc_id, chunk_id AS position, media_id, score
    FROM capped WHERE dn <= 2
    """


@query("pipe_end_to_end_v10", oracle=_V10_ORACLE())
def pipe_end_to_end_v10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERLEAVED multimodal document assembly, MMC4 shape (round 16 —
    Zhu et al. 2023 built interleaved image-text pretraining docs by
    assigning each image to its best-matching sentence by CLIP score,
    capped per document): the v9 curation chain (two-tier perceptual +
    semantic dedup -> image-text gate) supplies the IMAGE pool, then
    each surviving image is placed INTO a text document at the passage
    position whose embedding it matches best — top-1 passage per image
    by rounded caption x passage cosine (>= 0.2), at most 2 images per
    document (score-ranked) — emitting the interleave manifest
    (doc_id, position, media_id, score) a sequence builder consumes.

    Scale shape: the image x passage match is NEVER all-pairs — both
    sides bucket by the deterministic `sign_lsh_bucket` (6 axis-aligned
    sign bits, the ANN tier's single-probe LSH), so candidates form an
    equi-join on the bucket key exactly like the dedup tiers' banded
    joins — and the 64-dim cosine is paid once per DISTINCT
    (caption vec, passage vec) bucket-mate pair (bounded by the vector
    table's size a side), thresholded there, then expanded back to
    (image, passage) candidates through two id equi-joins moving only
    (id, score) rows: the within-bucket quadratic term costs id-row
    width, never vector math (the first draft scored per candidate —
    2M cosines at sf0.1, 100x that at sf1). Passages come from the
    map-only `chunk_documents` (16-token non-overlapping windows) and
    both rankings are windows over the thresholded candidate frame —
    text and payloads never shuffle. At a real 100-TB corpus, bucket
    bits grow ~log2(n / target bucket size) to hold the within-bucket
    population constant. Strict-verify drops hold at every tier: no
    embedding -> no merge, no aligned pair, no placement. At sf0.01:
    572 media -> 419 aligned keepers -> 419 placements -> 313 after
    the per-doc cap (the cap measurably binds)."""
    from usgs_lidar_spark.functions.vectors import dot, norm, sign_lsh_bucket
    from usgs_lidar_spark.multimodal import (
        fake_dhash_image,
        image_text_gate,
        near_dup_media_by_dhash,
        semantic_verify_pairs,
        to_media_table,
    )
    from usgs_lidar_spark.operators.graph import collapse_clusters
    from usgs_lidar_spark.operators.textquality import chunk_documents

    d = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    n = F.length("text")
    reup = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, F.floor(n / 2).cast("int")),
            F.lit("~"),
            F.expr(
                "substring(text, CAST(length(text) / 2 AS INT) + 2)"
            ),
        ).alias("text"),
    )
    media = to_media_table(
        d.select("doc_id", "text").unionByName(reup), "doc_id", "text"
    ).localCheckpoint(eager=False)  # two consumers: hash + emap
    doc0 = F.col("media_id") - 100000
    eid = F.when(
        F.col("media_id") >= 100000,
        F.when(doc0 % 21 == 0, doc0 + 3).otherwise(doc0),
    ).otherwise(F.col("media_id"))
    emap = media.select("media_id", eid.alias("__eid"))
    media_emb = emap.join(
        emb.select(F.col("vec_id").alias("__eid"), "embedding"), "__eid"
    ).select("media_id", "embedding")
    verified = semantic_verify_pairs(
        near_dup_media_by_dhash(fake_dhash_image(media), max_hamming=3),
        media_emb, threshold=0.9, id_col="media_id",
    )
    keepers = collapse_clusters(
        media.select("media_id"), verified,
        id_col="media_id", pair_a="id_a", pair_b="id_b",
    ).filter(F.col("is_kept")).select("media_id")
    img_eid = F.when(
        F.col("__eid") % 5 == 0, F.col("__eid") + 3
    ).otherwise(F.col("__eid"))
    gate_in = (
        keepers.join(emap, "media_id")
        .withColumn("__img_eid", img_eid)
        .join(
            emb.select(
                F.col("vec_id").alias("__eid"),
                F.col("embedding").alias("caption_embedding"),
            ),
            "__eid",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("__img_eid"),
                F.col("embedding").alias("image_embedding"),
            ),
            "__img_eid",
        )
    )
    imgs = (
        image_text_gate(gate_in, threshold=0.9)
        .filter(F.col("kept"))
        .select("media_id", "__eid")
        .localCheckpoint(eager=False)  # two consumers: cvecs + cand
    )
    pe_id = (F.col("doc_id") * 13 + F.col("chunk_id") * 7) % 500
    pas = (
        chunk_documents(d, chunk_tokens=16, stride=16)
        .select("doc_id", "chunk_id", pe_id.alias("pe_id"))
        .localCheckpoint(eager=False)  # two consumers: pvecs + cand
    )
    # Score DISTINCT vector pairs, not candidate pairs: the 64-dim
    # cosine is the expensive expression, and many images/passages
    # share a vector id — compute it once per (caption vec, passage
    # vec) bucket-mate pair (bounded by the vector table, not the
    # corpus: the bucket equi-join over <= |embeddings| distinct ids a
    # side), threshold THERE, then expand back to (image, passage)
    # candidates through two cheap id equi-joins that move only
    # (id, score) rows. Same candidate set, same scores — the bucket
    # join's quadratic-within-bucket term pays id-row width instead of
    # vector width, and the cosine count stops scaling with corpus
    # fan-out entirely.
    cvecs = (
        imgs.select(F.col("__eid").alias("ceid"))
        .distinct()
        .join(emb.select(F.col("vec_id").alias("ceid"), "embedding"), "ceid")
        .select(
            "ceid",
            F.col("embedding").alias("cvec"),
            sign_lsh_bucket("embedding", 6).alias("bucket"),
        )
    )
    pvecs = (
        pas.select("pe_id")
        .distinct()
        .join(emb.select(F.col("vec_id").alias("pe_id"), "embedding"), "pe_id")
        .select(
            "pe_id",
            F.col("embedding").alias("pvec"),
            sign_lsh_bucket("embedding", 6).alias("bucket"),
        )
    )
    score = F.round(
        dot("cvec", "pvec") / (norm("cvec") * norm("pvec")), 4
    )
    scores = (
        cvecs.join(pvecs, "bucket")
        .withColumn("score", score)
        .filter(F.col("score") >= 0.2)
        .select("ceid", "pe_id", "score")
    )
    cand = (
        imgs.select("media_id", F.col("__eid").alias("ceid"))
        .join(scores, "ceid")
        .join(pas, "pe_id")
        .select("media_id", "doc_id", "chunk_id", "score")
    )
    w_img = Window.partitionBy("media_id").orderBy(
        F.desc("score"), "doc_id", "chunk_id"
    )
    placed = (
        cand.withColumn("rn", F.row_number().over(w_img))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), "media_id"
    )
    return (
        placed.withColumn("dn", F.row_number().over(w_doc))
        .filter(F.col("dn") <= 2)
        .select(
            "doc_id",
            F.col("chunk_id").alias("position"),
            "media_id",
            "score",
        )
    )


def _V11_ORACLE() -> str:
    # The whole v9 oracle rides as ONE nested-WITH CTE (DuckDB scopes
    # the inner WITH RECURSIVE to the subquery), then the slice-span
    # expansion and the loader_schedule arithmetic replay on top.
    return f"""
    WITH v9 AS ({_V9_ORACLE()}),
    spans AS (
      SELECT pack_stream, byte_start, n_bytes,
             unnest(generate_series(
                 CAST(floor(byte_start / 4096.0) AS BIGINT),
                 CAST(floor((byte_start + n_bytes - 1) / 4096.0)
                      AS BIGINT))) AS shard_id
      FROM v9 WHERE n_bytes > 0
    ),
    manifest AS (
      SELECT pack_stream, shard_id,
             CAST(sum(least(byte_start + n_bytes, (shard_id + 1) * 4096)
                      - greatest(byte_start, shard_id * 4096))
                  AS BIGINT) AS n_bytes
      FROM spans GROUP BY 1, 2
    ),
    wq AS (
        SELECT pack_stream,
               CAST(floor(sqrt(CAST(sum(n_bytes) AS DOUBLE)) * 1048576.0)
                    AS BIGINT) AS wq
        FROM manifest GROUP BY pack_stream
        HAVING CAST(floor(sqrt(CAST(sum(n_bytes) AS DOUBLE)) * 1048576.0)
                    AS BIGINT) > 0
    ),
    tot AS (SELECT CAST(sum(wq) AS BIGINT) AS totq FROM wq),
    vt AS (
        SELECT m.pack_stream, m.shard_id, m.n_bytes,
               CAST(2 * (row_number() OVER (PARTITION BY m.pack_stream
                                            ORDER BY m.shard_id) - 1) + 1
                    AS DOUBLE)
               * CAST(t.totq AS DOUBLE)
               / CAST(2 * w.wq AS DOUBLE) AS vtime
        FROM manifest m JOIN wq w USING (pack_stream) CROSS JOIN tot t
    )
    SELECT CAST(row_number() OVER (ORDER BY vtime, pack_stream, shard_id)
                AS BIGINT) AS step,
           pack_stream, shard_id, n_bytes AS shard_bytes, vtime
    FROM vt
    """


@query("pipe_end_to_end_v11", oracle=_V11_ORACLE())
def pipe_end_to_end_v11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal curation THROUGH the loader's read plan
    (round 16 — v9 + `pipe_loader_schedule` composed): the v9 chain
    (two-tier media dedup -> image-text gate -> byte-shard packing)
    produces the shard layout; this query expands each packed item
    into its per-shard byte slices (pure arithmetic on byte_start /
    n_bytes — no payload touched), aggregates the (pack_stream,
    shard_id) manifest, and stride-schedules it with sqrt-temperature
    weights (`operators/pipeline.loader_schedule`) — the output IS the
    order a training loader reads the curated corpus in, every prefix
    holding each stream's byte-share within one shard. The corpus-
    proportional work all happens in v9; the manifest, weights, and
    schedule are shard-count-sized. Bit-replayable end to end: the
    DuckDB oracle nests the entire v9 oracle as a CTE and replays the
    slice spans and the exact-integer stride arithmetic on top."""
    from usgs_lidar_spark.operators.pipeline import loader_schedule

    packed = pipe_end_to_end_v9(spark, sf_dir)
    b = F.lit(4096)
    first = F.floor(F.col("byte_start") / b).cast("long")
    last = F.floor(
        (F.col("byte_start") + F.col("n_bytes") - 1) / b
    ).cast("long")
    spans = packed.filter(F.col("n_bytes") > 0).select(
        "pack_stream", "byte_start", "n_bytes",
        F.explode(F.sequence(first, last)).alias("shard_id"),
    )
    manifest = spans.groupBy("pack_stream", "shard_id").agg(
        F.sum(
            F.least(
                F.col("byte_start") + F.col("n_bytes"),
                (F.col("shard_id") + 1) * b,
            )
            - F.greatest(F.col("byte_start"), F.col("shard_id") * b)
        ).cast("long").alias("n_bytes")
    )
    return loader_schedule(
        manifest, "pack_stream", "shard_id", "n_bytes", temperature=2.0
    )
