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
