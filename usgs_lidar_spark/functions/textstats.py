"""Text-analysis scalar functions for the LLM-data-pipeline surface:
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All built from Catalyst built-ins + higher-order array
functions — no Python in the hot path, so they stay JVM-side and
whole-stage-codegen'd over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish tokenizer regex: letter runs, digit runs, single non-space symbols.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Tiny per-language marker-word sets for the n-gram/stopword language-ID
#: heuristic. Deterministic and SQL-expressible (no model weights).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans"),
    "es": ("el", "la", "de", "que", "y", "los", "es", "una"),
}

#: Rolling-hash modulus (fits comfortably in int64 under acc*31+255).
FP_MOD = 1_000_000_007
#: Fingerprint looks at the first N characters (bounded work per row).
FP_PREFIX = 64


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty/blank text -> empty array."""
    t = F.trim(_c(col))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count (long)."""
    return F.size(ws_tokens(col)).cast("long")


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish regex token count (long) — letter runs / digit runs / symbols."""
    return F.regexp_count(_c(col), F.lit(BPE_PATTERN)).cast("long")


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars per text char (0 for empty text). NOT rounded:
    int/int division is bit-deterministic across engines, while rounding
    a terminating binary fraction (e.g. 1/128) is engine-dependent."""
    t = _c(col)
    n = F.length(t)
    p = F.regexp_count(t, F.lit(r"[.,!?;:]"))
    return F.when(n == 0, F.lit(0.0)).otherwise(p / n)


def stopword_ratio(col: Column | str, markers=LANG_MARKERS["en"]) -> Column:
    """Fraction of whitespace tokens that are in the marker set."""
    toks = ws_tokens(col)
    arr = F.array(*[F.lit(m) for m in markers])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n)


def lang_marker_hits(col: Column | str, lang: str) -> Column:
    """Count of tokens matching the language's marker set (long)."""
    toks = ws_tokens(col)
    arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def lang_id(col: Column | str) -> Column:
    """Argmax language by marker hits; ties broken by fixed priority order
    (en > de > fr > es); zero hits everywhere -> 'und' (undetermined)."""
    hits = {lang: lang_marker_hits(col, lang) for lang in LANG_MARKERS}
    best = None
    # Fixed priority: a language wins only on a strictly greater score than
    # every earlier language and >= every later one — deterministic in both
    # engines regardless of evaluation order.
    langs = list(LANG_MARKERS)
    expr = F.lit("und")
    for lang in reversed(langs):
        prior = langs[: langs.index(lang)]
        later = langs[langs.index(lang) + 1 :]
        cond = hits[lang] > 0
        for p in prior:
            cond = cond & (hits[lang] > hits[p])
        for l2 in later:
            cond = cond & (hits[lang] >= hits[l2])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
        best = expr
    return best


def fingerprint(col: Column | str, prefix: int = FP_PREFIX, mod: int = FP_MOD) -> Column:
    """Polynomial rolling hash over the first `prefix` characters:
    h = fold(h*31 + ascii(c)) % mod — a deterministic document fingerprint
    computable identically in ANSI SQL (list_reduce in DuckDB)."""
    # The transform lambda needs substring with a dynamic start index;
    # expressed via expr() (the SQL form of the same higher-order chain).
    name = col if isinstance(col, str) else None
    assert name is not None, "fingerprint() requires a column name"
    return F.expr(
        f"CASE WHEN length({name}) < 1 THEN CAST(0 AS BIGINT) ELSE "
        f"aggregate(transform(sequence(1, least(length({name}), {prefix})), "
        f"i -> CAST(ascii(substring({name}, i, 1)) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % {mod}) END"
    )
