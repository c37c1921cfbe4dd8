"""Sentence segmentation as a Python UDTF (table function) — SURVEY §2.10
X4's UDTF surface, plus the native twin that is the actual scale path.

A UDTF maps one input row to N output rows with arbitrary Python per row —
the lateral-join extension point for logic that genuinely needs imperative
code (real sentence splitters, tokenizers, parsers). Python UDTFs are
row-at-a-time (no Arrow batching in the UDTF protocol), so the contract
here is: UDTF = extension-point API, ``split_sentences_native`` = the
equivalent Catalyst plan (split + posexplode, whole-stage codegen) that the
same query should compile to when the logic is regex-expressible. Both
paths produce identical rows (parity-tested); the oracle checks the native
one.

The split pattern ``[.!?]+\\s*`` is deliberately RE2-compatible (no
lookbehind/backreferences) so Python ``re``, Java regex, and DuckDB RE2
all agree on the resulting parts array. Empty parts keep their array index
(a trailing terminator yields a trailing empty part) and are filtered
AFTER indexing, so ``sentence_idx`` is stable across engines.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

SENTENCE_SPLIT_PATTERN = r"[.!?]+\s*"


@udtf(returnType="sentence_idx: int, sentence: string")
class SplitSentences:
    """Lateral UDTF: text -> (sentence_idx, sentence) rows, empties dropped
    after indexing. Register with ``spark.udtf.register`` and invoke as
    ``SELECT d.doc_id, s.* FROM documents d, LATERAL split_sentences(d.text) s``.
    """

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        if text is None:
            return
        for i, part in enumerate(re.split(SENTENCE_SPLIT_PATTERN, text)):
            if part:
                yield i, part


def register_split_sentences(spark) -> None:
    spark.udtf.register("split_sentences", SplitSentences)


def split_sentences_native(
    df: DataFrame, *, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Native twin: same rows as the UDTF via split + posexplode — zero
    Python, one codegen stage, no shuffle. This is what runs at 100 TB;
    the UDTF exists for logic regex can't express."""
    parts = F.split(F.col(text_col), SENTENCE_SPLIT_PATTERN)
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(*id_cols, F.posexplode(parts).alias("sentence_idx", "sentence"))
        .filter(F.col("sentence") != "")
    )
