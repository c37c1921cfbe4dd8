"""Document chunking: sliding token windows for embedding ingestion.

The reference engine stores user-supplied chunks (`app/models/chunk.py`) —
it never creates them. A corpus pipeline needs the step that produces those
chunks from whole documents: fixed-size token windows with overlap, the
standard retrieval-ingestion primitive (window w, stride s < w keeps w-s
tokens of context between neighbors).

Plan shape: tokenize ONCE into a materialized array (HOF-CSE safe), build
the window-start index list with ``sequence(0, len-1, stride)``, explode,
slice per start. Pure native expressions — the explode fan-out is
len/stride rows per doc, each carrying only its slice, not the full token
array. No shuffle at all until the caller aggregates; at 100 TB chunking is
embarrassingly parallel map work scaling with input splits.

Tail rule: a window starts at every stride offset < n_tokens, so the final
window may be shorter than ``window`` (kept — dropping tails silently loses
corpus; filter on n_tokens downstream if a model needs full windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    *,
    window: int = 20,
    stride: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, chunk_start, n_tokens, chunk_text): sliding token
    windows of ``window`` tokens every ``stride`` tokens."""
    assert 0 < stride <= window
    toks = df.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_t"),
    )
    starts = toks.select(
        id_col,
        "_t",
        F.posexplode(
            F.sequence(F.lit(0), F.size("_t") - 1, F.lit(stride))
        ).alias("chunk_idx", "chunk_start"),
    )
    # slice() is 1-indexed; the slice shorter than `window` at the tail is
    # whatever remains.
    sliced = starts.select(
        id_col,
        "chunk_idx",
        "chunk_start",
        F.slice(F.col("_t"), F.col("chunk_start") + 1, F.lit(window)).alias("_w"),
    )
    return sliced.select(
        id_col,
        "chunk_idx",
        "chunk_start",
        F.size("_w").alias("n_tokens"),
        F.array_join("_w", " ").alias("chunk_text"),
    )


def sql_chunk_documents(
    *,
    window: int = 20,
    stride: int = 15,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin (list_slice is 1-indexed like Spark's slice)."""
    return f"""
WITH toks AS (
  SELECT {id_col}, regexp_split_to_array(trim({text_col}), '\\s+') AS t
  FROM {table}
),
starts AS (
  SELECT {id_col}, t,
         CAST(i AS INTEGER) AS chunk_idx,
         CAST(i * {stride} AS INTEGER) AS chunk_start
  FROM toks, UNNEST(range(0, CAST(ceil(len(t) / {stride}.0) AS BIGINT))) AS r(i)
),
sliced AS (
  SELECT {id_col}, chunk_idx, chunk_start,
         list_slice(t, chunk_start + 1, chunk_start + {window}) AS w
  FROM starts
)
SELECT {id_col}, chunk_idx, chunk_start,
       len(w) AS n_tokens,
       array_to_string(w, ' ') AS chunk_text
FROM sliced ORDER BY {id_col}, chunk_idx
"""
