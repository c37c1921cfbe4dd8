"""Data mixing: temperature-scaled source sampling.

Training mixtures rarely take sources in proportion to their raw size —
over-represented sources are downweighted by sampling each source s with
probability proportional to ``count(s)^alpha`` (temperature sampling,
alpha < 1 flattens the distribution; the standard trick from multilingual
pretraining, e.g. Conneau & Lample, arXiv:1901.07291 §3.1, and T5/mT5).

This operator turns that into a deterministic quota plan:

    quota(s) = floor(round(total * count(s)^alpha / sum_s count(s)^alpha, 6))

and picks each source's quota by smallest ``md5(doc_id)`` — the same
content-independent, rerun-stable selection primitive as
``operators/sampling.stratified_sample``. No RNG anywhere: the same corpus
and parameters always yield the same sample, and any md5-capable engine
reproduces it bit-for-bit.

Scale notes (100 TB): the per-source count is one map-side-combined
aggregation; the quota table is #sources rows (broadcast); selection is one
window rank per source partition — the only corpus-sized shuffle, keyed by
source. The round-to-6 before floor absorbs double-summation-order ulps so
quota boundaries cannot flip between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def temperature_mix(
    df: DataFrame,
    *,
    total: int,
    alpha: float = 0.5,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Select ~``total`` documents with per-source quotas proportional to
    ``count^alpha``: (id, group, quota) rows of the sampled documents.
    A source with fewer documents than its quota contributes all of them."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_source"))
    # #sources rows: the empty-frame window is a deliberate single-task step
    # over a tiny frame, not a corpus-sized one.
    denom = F.sum(F.pow("n_source", F.lit(alpha))).over(
        Window.partitionBy(F.lit(1))
    )
    quotas = counts.select(
        group_col,
        F.floor(
            F.round(
                F.lit(total) * F.pow("n_source", F.lit(alpha)) / denom, 6
            )
        ).alias("quota"),
    )
    ranked = df.select(id_col, group_col).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(
                F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
            )
        ),
    )
    return (
        ranked.join(F.broadcast(quotas), group_col)
        .filter(F.col("_rn") <= F.col("quota"))
        .select(id_col, group_col, "quota")
    )


def sql_temperature_mix(
    table: str = "documents",
    *,
    total: int,
    alpha: float = 0.5,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`temperature_mix`."""
    return f"""
WITH counts AS (
  SELECT {group_col}, COUNT(*) AS n_source FROM {table} GROUP BY 1
), quotas AS (
  SELECT {group_col},
         CAST(floor(round({total} * pow(n_source, {alpha})
           / SUM(pow(n_source, {alpha})) OVER (), 6)) AS BIGINT) AS quota
  FROM counts
), ranked AS (
  SELECT {id_col}, {group_col},
         ROW_NUMBER() OVER (
           PARTITION BY {group_col}
           ORDER BY md5(CAST({id_col} AS VARCHAR)) ASC, {id_col} ASC
         ) AS rn
  FROM {table}
)
SELECT r.{id_col}, r.{group_col}, q.quota
FROM ranked r JOIN quotas q USING ({group_col})
WHERE r.rn <= q.quota
ORDER BY r.{id_col}
"""
