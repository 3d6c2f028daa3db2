"""PII redaction over text columns — the privacy-filtering stage of a
training-data pipeline (strip emails/IPs/phone numbers before anything
downstream sees the text), expressed entirely in JVM-side regex
expressions: no UDF, whole-stage-codegen friendly, map-only (zero
shuffle — the plan test pins that).

Not in the reference (no text surface beyond a year regex); north-star
extension alongside quality filtering and dedup.

Pattern dialect: every pattern here restricts itself to syntax with
IDENTICAL semantics in Java regex (Spark) and RE2 (DuckDB) — character
classes, bounded repetition, \\b word boundaries, no backrefs, no
lookaround — so the DuckDB oracle replays redaction and match counts
exactly. Counts are computed on the ORIGINAL text per kind before any
replacement, so pattern application order cannot shift them; the
replacement chain applies in sorted-kind order for determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Java+RE2-compatible patterns, deliberately conservative: a miss is a
#: quality problem, a dialect divergence is a correctness problem.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str,
    out_col: str = "text_redacted",
    patterns: dict[str, str] | None = None,
    token: str = "[PII-{kind}]",
) -> DataFrame:
    """Replace every PII match with a typed placeholder and attach
    per-kind match counts plus ``n_redactions`` (their sum). Keeps all
    input columns; adds ``out_col`` and one ``n_<kind>`` column per
    pattern. NULL text stays NULL with zero counts."""
    pats = patterns if patterns is not None else PII_PATTERNS
    if not pats:
        raise ValueError("patterns must be non-empty")
    src = F.col(text_col)
    out: Column = src
    counts = []
    total = F.lit(0).cast("long")
    for kind in sorted(pats):
        pat = pats[kind]
        n = F.coalesce(
            F.regexp_count(src, F.lit(pat)).cast("long"), F.lit(0)
        ).alias(f"n_{kind}")
        counts.append(n)
        total = total + F.coalesce(
            F.regexp_count(src, F.lit(pat)).cast("long"), F.lit(0)
        )
        out = F.regexp_replace(out, pat, token.format(kind=kind))
    return df.select(
        "*",
        out.alias(out_col),
        *counts,
        total.alias("n_redactions"),
    )
