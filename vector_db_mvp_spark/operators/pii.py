"""PII detection and redaction over a text column.

A training-data pipeline scrubs personally-identifiable information before
anything else touches the corpus (the reference engine has no PII pass —
this extends the curation surface the same way dedup/quality do). Patterns
are the standard structured-PII families: email, NANP phone, IPv4, and
SSN-shaped ids.

Everything is native Catalyst ``regexp_count`` / ``regexp_replace`` — one
whole-stage-codegen pass over the text column, no shuffle, no Python. The
patterns deliberately use only RE2-compatible syntax (character classes,
bounded quantifiers, ``\\b``) so the same strings run verbatim in DuckDB
oracles and in any RE2-based scanner a production pipeline would swap in.

Scale notes (100 TB): per-row map work only — parallelism is the scan's
input splits, cost is one regex automaton pass per pattern per row. Order
redaction from most- to least-specific pattern so a later pattern never
matches inside an earlier placeholder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2- and java.util.regex-compatible (no backrefs / lookaround).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

# Redaction order matters: ssn before phone would also work, but phone's
# {3}-{3}-{4} shape cannot match an ssn's {3}-{2}-{4}, so the dict order
# (email, phone, ssn, ipv4) is stable; ipv4 goes last because a dotted
# phone (555.123.4567) must be consumed by the phone pattern first.
REDACTIONS: dict[str, str] = {
    "email": "<EMAIL>",
    "phone": "<PHONE>",
    "ssn": "<SSN>",
    "ipv4": "<IP>",
}


def pii_scan(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII match counts: (id, n_email, n_phone, n_ssn, n_ipv4,
    has_pii). Pure map-side; counts come from one ``regexp_count`` per
    pattern."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    out = df.select(F.col(id_col), *counts)
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("has_pii", total > 0)


def redacted_text(text: Column) -> Column:
    """Text with every PII match replaced by its typed placeholder, applied
    in ``REDACTIONS`` order."""
    out = text
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, REDACTIONS[name])
    return out


def pii_redact(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, per-pattern counts, has_pii, redacted text) in ONE projection —
    no join/shuffle; counts and the rewrite share the single codegen stage."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    out = df.select(
        F.col(id_col), *counts, redacted_text(F.col(text_col)).alias("redacted")
    )
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.select(
        id_col, *[f"n_{n}" for n in PII_PATTERNS], total.alias("n_pii"), "redacted"
    ).withColumn("has_pii", F.col("n_pii") > 0)


def sql_redacted(expr: str) -> str:
    """DuckDB twin of :func:`redacted_text` over SQL expression ``expr``."""
    out = expr
    for name, pat in PII_PATTERNS.items():
        out = f"regexp_replace({out}, '{pat}', '{REDACTIONS[name]}', 'g')"
    return out
