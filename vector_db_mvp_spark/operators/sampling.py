"""Deterministic sampling operators for dataset curation.

Training-data pipelines need *reproducible* samples — the same corpus must
yield the same subset on every run, engine, and cluster size, so the
selection key is a content-independent id hash (md5), never an RNG. This is
the same portability contract as ``operators/textops.deterministic_split``
(reference capability analog: the corpus-curation surface; the reference
itself has no sampling — north-star addition per SURVEY.md §2.9/§10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    quota: int,
) -> DataFrame:
    """Exact per-group quota sample: the ``quota`` rows of each group with
    the smallest md5(id) — i.e. a uniform-without-replacement sample that is
    bit-reproducible (domain-mixing / per-source caps in curation pipelines).

    Plan: one shuffle keyed by the group, then a per-group sort + row_number
    — Spark's rank-based filter pushes the limit into the sort where groups
    fit a partition. Groups are typically few and fat here; AQE skew split
    handles a hot group. For pathological single-group scale (quota ≪ group
    size in the billions), the two-pass variant — approx-quantile the hash,
    filter below the threshold, exact-rank the survivors — does the same
    selection with a near-constant-memory first pass; this exact form is the
    oracle path.
    """
    key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= quota)
        .drop("sample_rank")
    )


def weighted_sample(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES, IPL 2006): each row gets key = ln(u)/w for a pseudo-
    uniform u derived from md5(id) — no RNG, bit-reproducible — and the k
    largest keys are the sample. Inclusion probability is proportional to
    weight (quality score, token count, ...), the knob curation pipelines
    use to oversample high-value sources deterministically.

    Plan: one scan computing the key in codegen, then TakeOrderedAndProject
    top-k — no shuffle of the corpus. The key is rounded to 12 decimals so
    rank order is identical cross-engine (ln differs by <=1 ulp between
    libms; ties then break on id).

    Rows with weight <= 0 are excluded (their key is undefined)."""
    from ..functions.text import h64

    # u in (0,1) strictly: (h + 1) / (2^60 + 2), h in [0, 2^60).
    u = (h64(F.col(id_col).cast("string")) + F.lit(1).cast("double")) / F.lit(
        float(2**60 + 2)
    )
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 12)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def sql_weighted_sample(
    *,
    table: str,
    id_col: str,
    weight_col: str,
    k: int,
    select: str = "*",
) -> str:
    """DuckDB mirror of :func:`weighted_sample` (identical u, ln, rounding,
    tie order)."""
    h = f"CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
    return f"""
SELECT {select},
       ROUND(ln(({h} + CAST(1 AS DOUBLE)) / {float(2**60 + 2)!r})
             / CAST({weight_col} AS DOUBLE), 12) AS sample_key
FROM {table}
WHERE {weight_col} > 0
ORDER BY sample_key DESC, {id_col} ASC
LIMIT {k}
"""
