"""Gopher-style document quality rules.

The rule set follows the public heuristics from Rae et al., "Scaling
Language Models: Methods, Analysis & Insights from Training Gopher"
(arXiv:2112.11446, Appendix A1.1): word-count bounds, mean-word-length
bounds, a minimum fraction of alphabetic words, and a minimum number of
distinct stopwords. Each rule is emitted as its own boolean column so a
pipeline can inspect *why* a document was dropped, plus a conjunctive
``keep`` flag.

Implementation: tokenize ONCE into a materialized array column, then derive
every metric from that array with native higher-order functions. The
two-step select is deliberate — deriving metrics directly from
``tokens(text)`` re-runs the tokenizer regex inside every lambda (HOF
lambdas defeat common-subexpression elimination; measured on this repo's
simhash path). All JVM codegen, no shuffle: at 100 TB this is pure map work
scaling with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS
from ..sqltext import sql_str

# Public Gopher-rule constants (loosened word-count lower bound to fit the
# short synthetic fixture docs; production would use 50/100_000).
MIN_WORDS = 30
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_ALPHA_WORD_RATIO = 0.80
MIN_DISTINCT_STOPWORDS = 2


def quality_rules(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document rule verdicts:
    (id, word_count, mean_word_len, alpha_word_ratio, stopword_distinct,
    rule_* booleans, keep)."""
    toks = df.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_toks"),
    )
    metrics = toks.select(
        id_col,
        F.size("_toks").alias("word_count"),
        (
            F.aggregate(
                "_toks", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
            )
            / F.size("_toks")
        ).alias("mean_word_len"),
        (
            F.size(F.filter("_toks", lambda x: x.rlike("[a-z]")))
            / F.size("_toks")
        ).alias("alpha_word_ratio"),
        F.size(
            F.array_intersect(
                F.array_distinct("_toks"), F.array(*[F.lit(s) for s in STOPWORDS])
            )
        ).alias("stopword_distinct"),
    )
    rules = metrics.select(
        "*",
        F.col("word_count").between(MIN_WORDS, MAX_WORDS).alias("rule_word_count"),
        F.col("mean_word_len")
        .between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
        .alias("rule_mean_word_len"),
        (F.col("alpha_word_ratio") >= MIN_ALPHA_WORD_RATIO).alias("rule_alpha_words"),
        (F.col("stopword_distinct") >= MIN_DISTINCT_STOPWORDS).alias(
            "rule_stopwords"
        ),
    )
    return rules.withColumn(
        "keep",
        F.col("rule_word_count")
        & F.col("rule_mean_word_len")
        & F.col("rule_alpha_words")
        & F.col("rule_stopwords"),
    )


def sql_quality_rules(table: str = "documents", text: str = "text") -> str:
    """DuckDB twin of :func:`quality_rules` (same constants, same rounding)."""
    stop = ", ".join(sql_str(s) for s in STOPWORDS)
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower({text})), '\\s+') AS t
  FROM {table}
), metrics AS (
  SELECT doc_id,
         len(t) AS word_count,
         list_aggregate(list_transform(t, x -> length(x)), 'sum')::DOUBLE
           / len(t) AS mean_word_len,
         len(list_filter(t, x -> regexp_matches(x, '[a-z]')))::DOUBLE
           / len(t) AS alpha_word_ratio,
         len(list_filter(list_distinct(t), x -> x IN ({stop})))
           AS stopword_distinct
  FROM toks
), rules AS (
  SELECT *,
         word_count BETWEEN {MIN_WORDS} AND {MAX_WORDS} AS rule_word_count,
         mean_word_len BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN}
           AS rule_mean_word_len,
         alpha_word_ratio >= {MIN_ALPHA_WORD_RATIO} AS rule_alpha_words,
         stopword_distinct >= {MIN_DISTINCT_STOPWORDS} AS rule_stopwords
  FROM metrics
)
SELECT doc_id, word_count, round(mean_word_len, 6) AS mean_word_len,
       round(alpha_word_ratio, 6) AS alpha_word_ratio, stopword_distinct,
       rule_word_count, rule_mean_word_len, rule_alpha_words, rule_stopwords,
       rule_word_count AND rule_mean_word_len AND rule_alpha_words
         AND rule_stopwords AS keep
FROM rules ORDER BY doc_id
"""
