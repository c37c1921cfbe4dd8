"""Streaming exact dedup (north-star: training-data ingestion at 100 TB/day).

The batch dedup operators (operators/dedup.py) assume the corpus is at rest;
an ingestion pipeline also needs dedup *on the stream itself* so duplicate
documents never reach storage. This is the Structured Streaming twin of
``exact_dedup``'s fingerprint (md5 of normalized text, workload/text.py
SQL_DEDUP_EXACT): first-seen wins, later copies are dropped.

``dropDuplicatesWithinWatermark`` keeps one state-store entry per
fingerprint and evicts entries older than the watermark — the knob that
keeps state finite on an unbounded stream. The tradeoff is explicit: a
duplicate arriving *after* its original's watermark expiry passes through
(and is caught later by the batch pass); tightening the watermark trades
memory for that window. State is hash-partitioned by fingerprint across
executors, so the operator scales horizontally with no skew beyond the
fingerprint distribution (uniform by construction — it's a hash).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import NORM_TEXT
from .windows import as_event_time


def with_fingerprint(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Attach the batch-identical content fingerprint (md5 of normalized
    text) — same expression as ``exact_dedup``, so stream-deduped and
    batch-deduped corpora agree."""
    return df.withColumn("fingerprint", F.md5(NORM_TEXT(F.col(text_col))))


def dedup_stream_exact(
    stream: DataFrame,
    *,
    keys: Sequence[str] = ("fingerprint",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop rows whose ``keys`` were already seen within the watermark
    horizon; first arrival wins. Works on a streaming DataFrame in append
    mode; on a batch frame it degrades to plain dropDuplicates semantics
    (useful for the batch==stream twin test)."""
    out = as_event_time(stream, ts_col).withWatermark(ts_col, watermark)
    return out.dropDuplicatesWithinWatermark(list(keys))
