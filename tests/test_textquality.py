"""Hand-checked cases for operators/textquality.py (repetition metrics,
token-window chunking, corpus-frequency scoring). The sf0.01 parity with
DuckDB is covered by the driver oracle; these pin exact small-case
semantics the oracle's agreement alone would not explain."""

from __future__ import annotations

from usgs_lidar_spark.operators.textquality import (
    chunk_documents,
    corpus_freq_score,
    repetition_metrics,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_metrics_hand_case(spark):
    df = _docs(
        spark,
        [
            (1, "a a a a"),  # maximal repetition
            (2, "w x y z"),  # no repetition
            (3, "x"),  # too short for any n-gram
            (4, "  "),  # blank
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_metrics(df).collect()}

    # doc 1: 4 tokens, 1 type; bigrams = 3x "a a" -> top frac 1.0;
    # trigrams = 2x "a a a" -> 1 duplicate slot of 2.
    assert got[1]["n_tokens"] == 4
    assert got[1]["type_token_ratio"] == 0.25
    assert got[1]["top_bigram_frac"] == 1.0
    assert got[1]["dup_trigram_frac"] == 0.5

    # doc 2: all distinct -> TTR 1, top bigram 1/3, no dup trigrams.
    assert got[2]["type_token_ratio"] == 1.0
    assert got[2]["top_bigram_frac"] == 1.0 / 3.0
    assert got[2]["dup_trigram_frac"] == 0.0

    # doc 3: single token -> no n-grams, fracs are 0 (short != repetitive).
    assert got[3] == {
        "doc_id": 3,
        "n_tokens": 1,
        "type_token_ratio": 1.0,
        "top_bigram_frac": 0.0,
        "dup_trigram_frac": 0.0,
    }

    # blank doc: zero tokens, all-zero metrics (not dropped).
    assert got[4]["n_tokens"] == 0
    assert got[4]["type_token_ratio"] == 0.0


def test_chunk_documents_covers_tail_and_overlaps(spark):
    text = " ".join(f"t{i}" for i in range(5))  # t0..t4
    df = _docs(spark, [(1, text), (2, "")])
    rows = sorted(
        (r["chunk_id"], r["start_tok"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=3, stride=2).collect()
    )
    # starts 0,2,4: [t0 t1 t2], [t2 t3 t4], tail [t4].
    assert rows == [
        (0, 0, 3, "t0 t1 t2"),
        (1, 2, 3, "t2 t3 t4"),
        (2, 4, 1, "t4"),
    ]
    # chunk i and i+1 overlap by chunk_tokens - stride = 1 token.
    assert rows[0][3].split()[-1] == rows[1][3].split()[0]


def test_chunk_documents_rejects_bad_params(spark):
    import pytest

    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0, stride=2)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, stride=0)


def test_corpus_freq_score_exact_and_tier_invariant(spark):
    # corpus counts: the=3, cat=2, qq=1
    df = _docs(spark, [(1, "the cat"), (2, "the the cat qq")])
    got = {r["doc_id"]: r.asDict() for r in corpus_freq_score(df).collect()}
    assert got[1]["n_tokens"] == 2
    assert got[1]["mean_token_count"] == (3 + 2) / 2
    assert got[1]["rare_frac"] == 0.5  # cat(2) < 3, the(3) not rare
    assert got[2]["mean_token_count"] == (3 + 3 + 2 + 1) / 4
    assert got[2]["rare_frac"] == 0.5  # cat + qq rare, 2 of 4 slots

    # The hot/tail split is an execution detail: forcing everything through
    # the broadcast tier or everything through the shuffle tier must not
    # change a single value.
    all_hot = {
        r["doc_id"]: r.asDict()
        for r in corpus_freq_score(df, hot_vocab=100).collect()
    }
    all_tail = {
        r["doc_id"]: r.asDict()
        for r in corpus_freq_score(df, hot_vocab=1).collect()
    }
    assert got == all_hot == all_tail


def test_threshold_sweep_hand_case(spark):
    """Suffix-sum semantics: each bucket row reports keeps at
    score >= bucket/resolution, weights sum correctly, and the lowest
    bucket keeps everything."""
    import pytest
    from pyspark.sql import functions as F
    from usgs_lidar_spark.operators.textquality import threshold_sweep

    rows = [(0.25, 10), (0.25, 20), (0.71, 5), (0.99, 1)]
    df = spark.createDataFrame(rows, ["q", "w"])
    out = {
        r["score_bucket"]: (r["n_docs"], r["n_kept"], r["weight_kept"])
        for r in threshold_sweep(df, "q", "w").collect()
    }
    assert out == {
        990: (1, 1, 1),
        710: (1, 2, 6),
        250: (2, 4, 36),
    }
    # weight defaults to 1 per doc
    unweighted = {
        r["score_bucket"]: r["weight_kept"]
        for r in threshold_sweep(df, "q").collect()
    }
    assert unweighted == {990: 1, 710: 2, 250: 4}
    with pytest.raises(ValueError, match="resolution"):
        threshold_sweep(df, "q", resolution=0)


def test_redact_pii_hand_cases(spark):
    """Typed placeholders replace every match, per-kind counts are
    computed on the original text, NULL text stays NULL with zero
    counts, and non-PII lookalikes survive."""
    import pytest
    from usgs_lidar_spark.operators.redact import redact_pii

    rows = [
        (1, "mail a.b+c@ex-1.org and d@e.io now"),
        (2, "ip 192.168.0.1 phone 555-123-4567 and 555 123 4567"),
        (3, "version 1.2.3 is not an ip, 12-34-56 not a phone"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = {r["id"]: r.asDict() for r in redact_pii(df, "t").collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_redactions"] == 2
    assert out[1]["text_redacted"] == "mail [PII-email] and [PII-email] now"
    assert out[2]["n_ipv4"] == 1 and out[2]["n_phone"] == 2
    assert out[2]["text_redacted"] == (
        "ip [PII-ipv4] phone [PII-phone] and [PII-phone]"
    )
    assert out[3]["n_redactions"] == 0 and out[3]["text_redacted"] == rows[2][1]
    assert out[4]["text_redacted"] is None and out[4]["n_redactions"] == 0
    with pytest.raises(ValueError, match="patterns"):
        redact_pii(df, "t", patterns={})
