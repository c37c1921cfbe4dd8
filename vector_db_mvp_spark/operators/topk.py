"""Exact brute-force top-k cosine similarity (reference T1,
``app/indexing/brute_force.py:19-47``) as a declarative Spark plan.

Physical shape and why it scales:
- score = native double expressions (functions/vector.py) inside whole-stage
  codegen — no Python in the hot path;
- ``orderBy(desc).limit(k)`` compiles to **TakeOrderedAndProject**: each
  partition keeps a k-sized heap, the driver merges heaps. O(N log k) with no
  full shuffle/sort — strictly better than the reference's full sort+slice
  (brute_force.py:45-47) and it survives a 1000-partition scan unchanged.
- Tie-break: the reference relies on Python sort stability (insertion order).
  A distributed sort is not stable, so we impose a deterministic total order:
  (score desc, id asc) — the documented contract for our engine and the oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.lsh import spark_sql_array_lit
from ..functions.vector import cosine_similarity


def topk_cosine(
    df: DataFrame,
    query_vector: Sequence[float] | Column | str,
    k: int,
    *,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    score_col: str = "score",
    score_decimals: int | None = None,
) -> DataFrame:
    """Top-k rows of ``df`` by cosine similarity to ``query_vector``.

    Null embeddings are invisible to search (reference
    search_service.py:43-46). ``k <= 0`` returns an empty frame
    (search_service.py:95-96). ``score_decimals`` optionally rounds the score
    (used by oracle-compared queries so Spark and DuckDB order identically).
    """
    if isinstance(query_vector, Column):
        q = query_vector
    elif isinstance(query_vector, str):
        q = F.col(query_vector)
    else:
        # One F.expr parse instead of D py4j round-trips of F.lit.
        q = F.expr(spark_sql_array_lit([float(x) for x in query_vector]))
    scored = (
        df.filter(F.col(embedding_col).isNotNull())
        .withColumn(score_col, cosine_similarity(F.col(embedding_col), q))
    )
    if score_decimals is not None:
        scored = scored.withColumn(score_col, F.round(F.col(score_col), score_decimals))
    if k <= 0:
        return scored.limit(0)
    return scored.orderBy(F.desc(score_col), F.asc(id_col)).limit(k)
