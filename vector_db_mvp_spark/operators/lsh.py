"""LSH approximate top-k (reference T3/J2/U1, ``app/indexing/lsh.py:73-95``)
and the composed search dispatch with brute-force fallback
(``app/services/search_service.py:118-133``).

Plan shapes:
- **Single query** (``lsh_topk``): compute per-row codes, compute the query's
  codes in the same plan (1-row broadcast), keep rows sharing ≥1 table bucket
  (the reference's union-distinct of per-table candidate sets — expressed as
  one ``exists`` filter, so no union or distinct is ever materialized), exact
  cosine re-rank, TakeOrderedAndProject top-k.
- **Query batch** (``lsh_topk_batch``): the 100 TB shape. Explode codes into
  (table_id, code) pairs on both sides, hash-join on the pair, dedupe
  (query, row) candidates, re-rank per query with a window top-k. The fact
  side shuffles once on the bucket key; candidate lists per query are ~C ≪ N
  (lsh.py:29), so the re-rank is tiny.

Fallback (search_service.py:127-131): if LSH yields zero candidates and the
row count is ≤ ``fallback_max_rows``, silently re-run brute force and report
``index_used='brute'``. The candidate-count check is one cheap action over
the already-pruned frame.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.lsh import (
    bucket_codes_native,
    bucket_codes_pandas,
    spark_sql_array_lit,
)
from ..functions.vector import cosine_similarity
from .topk import topk_cosine

FALLBACK_MAX_ROWS = 10_000  # search_service.py:128


def with_bucket_codes(
    df: DataFrame,
    planes: list[list[list[float]]],
    *,
    embedding_col: str = "embedding",
    codes_col: str = "lsh_codes",
    native: bool = False,
) -> DataFrame:
    """Attach array<long> per-table bucket codes. ``native=True`` uses the
    sequential-fold Catalyst expression (oracle-exact); default uses the
    vectorized Arrow path (index-build throughput)."""
    codes = (
        bucket_codes_native(embedding_col, planes)  # one F.expr parse
        if native
        else bucket_codes_pandas(planes, embedding_col)
    )
    return df.withColumn(codes_col, codes)


def lsh_candidates(
    df: DataFrame,
    query_codes: Column,
    *,
    codes_col: str = "lsh_codes",
) -> DataFrame:
    """Rows sharing at least one table bucket with the query — the
    union-distinct of per-table candidate sets (lsh.py:79-83) as one filter."""
    return df.filter(
        F.exists(
            F.zip_with(F.col(codes_col), query_codes, lambda c, q: c == q),
            lambda x: x,
        )
    )


def lsh_topk(
    df: DataFrame,
    query_vector: Sequence[float] | Column,
    k: int,
    planes: list[list[list[float]]],
    *,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    score_col: str = "score",
    score_decimals: int | None = None,
    native: bool = False,
) -> DataFrame:
    """Approximate top-k: bucket-prune then exact re-rank (lsh.py:73-95).

    ``query_vector`` may be a literal vector, a column NAME (str), or a
    Column. Name/literal forms compile via single F.expr parses — the fast
    plan-construction path; an arbitrary Column falls back to tree building.
    """
    if isinstance(query_vector, str):
        q: Column | str = F.col(query_vector)
        qv_for_codes: object = query_vector
    elif isinstance(query_vector, Column):
        q = query_vector
        qv_for_codes = query_vector
    else:
        vec = [float(x) for x in query_vector]
        q = F.expr(spark_sql_array_lit(vec))
        qv_for_codes = vec
    pruned = with_bucket_codes(
        df.filter(F.col(embedding_col).isNotNull()), planes,
        embedding_col=embedding_col, native=native,
    )
    # Query codes are always the native expression: it's one vector, and the
    # sequential fold keeps it bitwise-aligned with the oracle.
    qc = bucket_codes_native(qv_for_codes, planes)
    cands = lsh_candidates(pruned, qc).drop("lsh_codes")
    return topk_cosine(
        cands, q, k,
        embedding_col=embedding_col, id_col=id_col,
        score_col=score_col, score_decimals=score_decimals,
    )


def search_with_fallback(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int,
    planes: list[list[list[float]]],
    *,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    fallback_max_rows: int = FALLBACK_MAX_ROWS,
    native: bool = False,
) -> tuple[DataFrame, str]:
    """Reference dispatch (search_service.py:118-133): LSH first; if it finds
    nothing and the corpus is small, fall back to brute force. Returns
    (result, index_used)."""
    approx = lsh_topk(
        df, query_vector, k, planes,
        embedding_col=embedding_col, id_col=id_col, native=native,
    )
    if k <= 0:
        return approx.limit(0), "lsh"
    if len(approx.take(1)) > 0:
        return approx, "lsh"
    n = df.filter(F.col(embedding_col).isNotNull()).count()
    if n <= fallback_max_rows:
        return (
            topk_cosine(df, query_vector, k, embedding_col=embedding_col, id_col=id_col),
            "brute",
        )
    return approx, "lsh"


def lsh_topk_batch(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int,
    planes: list[list[list[float]]],
    *,
    query_id_col: str = "query_id",
    query_embedding_col: str = "query_embedding",
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    score_col: str = "score",
    score_decimals: int | None = None,
    native: bool = False,
) -> DataFrame:
    """Batched LSH top-k — many queries against one corpus in one shuffle.

    explode(codes) on both sides -> equi-join on (table_id, code) ->
    drop duplicate (query, row) candidate pairs -> exact cosine ->
    per-query window top-k. At 100 TB the corpus side is the big relation:
    it shuffles once on the bucket key, and AQE handles skewed buckets.
    """
    from pyspark.sql import Window

    def _codes(col: str) -> Column:
        return (
            bucket_codes_native(col, planes) if native
            else bucket_codes_pandas(planes, col)
        )

    # posexplode the codes EXPRESSION directly: materializing it first via
    # withColumn makes Catalyst re-inline the (UDF) expression into both the
    # Generate input and the outer project — two ArrowEvalPython passes over
    # every corpus row (measured 2x; the CSE-loss pathology). The direct
    # generator form evaluates it once.
    c = corpus_df.filter(F.col(embedding_col).isNotNull()).select(
        id_col, embedding_col,
        F.posexplode(_codes(embedding_col)).alias("table_id", "code"),
    )
    q = queries_df.filter(F.col(query_embedding_col).isNotNull()).select(
        query_id_col, query_embedding_col,
        F.posexplode(_codes(query_embedding_col)).alias("table_id", "code"),
    )
    cand = (
        c.join(q, ["table_id", "code"])
        .select(query_id_col, query_embedding_col, id_col, embedding_col)
        .dropDuplicates([query_id_col, id_col])
        .withColumn(
            score_col,
            cosine_similarity(F.col(embedding_col), F.col(query_embedding_col)),
        )
    )
    if score_decimals is not None:
        cand = cand.withColumn(score_col, F.round(F.col(score_col), score_decimals))
    w = Window.partitionBy(query_id_col).orderBy(F.desc(score_col), F.asc(id_col))
    return (
        cand.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .select(query_id_col, id_col, score_col, F.col("_rank").alias("rank"))
    )
