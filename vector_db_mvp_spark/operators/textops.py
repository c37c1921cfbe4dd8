"""Text-analysis operators (north-star surface): token stats + quality
scoring, language-ID, document fingerprinting. Pure Catalyst expressions
over the ``documents`` table; each has an exact SQL twin in
``workload/text.py``.

Quality score follows the standard cheap-heuristics recipe (length,
punctuation density, stopword ratio) used by LLM-data pipelines as a
first-pass filter; weights are fixed constants so the score is deterministic
and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_MARKERS,
    LANG_PRIORITY,
    STOPWORDS,
    marker_hits,
    tokens,
)
from ..operators.dedup import NORM_TEXT


def token_stats(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token counts + quality heuristics + composite score."""
    t = tokens(F.col(text_col))
    n_tokens = F.size(t)
    n_chars = F.length(NORM_TEXT(F.col(text_col)))
    punct = F.length(F.col(text_col)) - F.length(F.regexp_replace(F.col(text_col), r"[.!?,;:]", ""))
    stop = marker_hits(t, STOPWORDS)
    avg_len = F.round((n_chars - (n_tokens - 1)) / n_tokens, 6)  # chars sans separators
    stop_ratio = F.round(stop / n_tokens, 6)
    punct_ratio = F.round(punct / n_chars, 6)
    quality = F.round(
        F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.5
        + stop_ratio * 2.0
        + (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * 10.0)) * 0.3,
        6,
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_norm"),
        avg_len.alias("avg_token_len"),
        punct.alias("punct_count"),
        stop.alias("stopword_count"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


# GPT-2-style pre-tokenizer regex (contractions | word | number | punct run,
# each optionally space-prefixed) — the standard cheap proxy for an LLM token
# budget when the real BPE merges aren't available. Java and RE2 agree on
# this pattern (parity tested against DuckDB).
BPE_ISH_PATTERN = r"'(?:ll|ve|re|[sdmt])| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def token_counts_bpe(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace vs BPE-ish token counts per doc + chars-per-token ratio
    (the budget planners' number). Pure Catalyst: one regexp_count, no UDF."""
    t = tokens(F.col(text_col))
    n_bpe = F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN))
    return df.select(
        F.col(id_col),
        F.size(t).alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(
            F.length(F.col(text_col)) / F.greatest(n_bpe, F.lit(1)), 6
        ).alias("chars_per_bpe_token"),
    )


def language_id(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: per-language hit counts, argmax with fixed
    priority tie-break (first in LANG_PRIORITY wins ties)."""
    t = tokens(F.col(text_col))
    hits = {lang: marker_hits(t, LANG_MARKERS[lang]) for lang in LANG_PRIORITY}
    best = F.lit(None).cast("string")
    best_n = F.lit(-1)
    # fold in reverse priority so earlier languages win ties with strict >
    for lang in reversed(LANG_PRIORITY):
        take = hits[lang] >= best_n
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_n = F.when(take, hits[lang]).otherwise(best_n)
    out = df.select(
        F.col(id_col),
        *[hits[lang].alias(f"hits_{lang}") for lang in LANG_PRIORITY],
        best.alias("pred_lang"),
    )
    return out


def deterministic_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    train_pct: int = 90,
    buckets: int = 100,
) -> DataFrame:
    """Reproducible train/val assignment by content-independent id hash:
    bucket = int(md5(id)[:8], 16) % buckets; train iff bucket < train_pct.
    The standard split primitive for dataset curation — stable across runs,
    machines, and engines (no RNG), and any engine that can md5 reproduces
    the exact same membership. Joins/filters on `split` prune with the scan."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % buckets
    )
    return df.withColumn("split_bucket", bucket).withColumn(
        "split",
        F.when(F.col("split_bucket") < train_pct, F.lit("train")).otherwise(
            F.lit("val")
        ),
    )


def fingerprints(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact fingerprint (md5 of normalized text) + content minhash
    fingerprint (min token-hash — a 1-hash minhash, stable under
    reordering-free edits)."""
    from ..functions.text import h64

    t = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.md5(NORM_TEXT(F.col(text_col))).alias("fingerprint"),
        F.array_min(F.transform(t, lambda tok: h64(tok))).alias("min_token_hash"),
    )
