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


def char_budget_mix(
    df: DataFrame,
    *,
    budget: int,
    alpha: float = 0.5,
    group_col: str = "lang",
    id_col: str = "doc_id",
    cost_col: str = "n_chars",
) -> DataFrame:
    """Cost-aware mixture planning: split a character budget across groups
    by water-filling, then select each group's cheapest-first (by md5 order)
    document prefix that fits its allocation.

    ``temperature_mix`` plans in *document counts*; real token budgets are
    *cost* budgets (a 100-token doc is not a 10k-token doc). Water-filling
    (the classic max-min fair allocation) fixes the over-ask: each group's
    fair share is ``budget * w_g / W`` with ``w_g = total_g^alpha``, but a
    group whose entire corpus is smaller than its share is *capped* at its
    total and its surplus is redistributed across the rest — the standard
    fixpoint. Because groups sorted by total cost ascending are capped in
    prefix order, the fixpoint has a closed form over prefix/suffix sums —
    no iteration, no driver loop.

    Selection inside a group is the deterministic md5-order prefix whose
    running cost fits the allocation (same rerun-stable primitive as
    ``stratified_sample``; a doc is kept iff the running sum *through it*
    fits, so the sample is a prefix, not a knapsack).

    Scale notes (100 TB): the totals frame is #groups rows (the ordered
    windows over it are deliberate single-task steps over a tiny frame);
    the only corpus-sized work is one map-side-combined sum and one window
    keyed by group. Float care: group totals are exact integers in DOUBLE
    (< 2^53); weights are round-6 doubles so both engines fold identical
    values; allocations are round-6. No RNG anywhere.

    Requires ``0 <= alpha <= 1``: the closed form relies on capped groups
    forming a prefix of the total_cost-ascending order, which holds
    because total/w = total^(1-alpha) is non-decreasing only for
    alpha <= 1. For alpha > 1 the capping order inverts and the prefix
    closed form would agree across engines on an allocation that is NOT
    the max-min fixpoint — so it is rejected, not silently mis-planned."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(
            f"char_budget_mix requires 0 <= alpha <= 1 (got {alpha}): the "
            "prefix-capping closed form needs total^(1-alpha) non-decreasing"
        )
    totals = df.groupBy(group_col).agg(F.sum(cost_col).alias("total_cost"))
    w = F.round(F.pow("total_cost", F.lit(alpha)), 6)
    order = Window.orderBy("total_cost", group_col)
    prefix_total = F.coalesce(
        F.sum("total_cost").over(order.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    suffix_w = F.sum("w").over(
        order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # capped iff the fair share over the not-yet-capped suffix exceeds the
    # group's whole corpus: (B - capped_prefix) * w >= total * suffix_w.
    # Monotone in the sort order; the running MIN makes closure explicit.
    cond = F.when(
        (F.lit(budget) - prefix_total) * F.col("w")
        >= F.col("total_cost") * F.col("suffix_w"),
        1,
    ).otherwise(0)
    full = Window.orderBy("total_cost", group_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    plan = (
        totals.select(group_col, "total_cost", w.alias("w"))
        .withColumn("suffix_w", suffix_w)
        .withColumn(
            "capped",
            F.min(cond).over(order.rowsBetween(Window.unboundedPreceding, 0)) == 1,
        )
        .withColumn(
            "capped_total",
            F.coalesce(
                F.sum(F.when(F.col("capped"), F.col("total_cost"))).over(full),
                F.lit(0),
            ),
        )
        .withColumn(
            "uncapped_w",
            F.sum(F.when(~F.col("capped"), F.col("w"))).over(full),
        )
        .select(
            group_col,
            F.round(
                F.when(F.col("capped"), F.col("total_cost").cast("double")).otherwise(
                    (F.lit(budget) - F.col("capped_total"))
                    * F.col("w")
                    / F.col("uncapped_w")
                ),
                6,
            ).alias("alloc_cost"),
        )
    )
    running = F.sum(cost_col).over(
        Window.partitionBy(group_col).orderBy(
            F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
        )
    )
    return (
        df.select(id_col, group_col, cost_col)
        .withColumn("running_cost", running)
        .join(F.broadcast(plan), group_col)
        .filter(F.col("running_cost") <= F.col("alloc_cost"))
        .select(id_col, group_col, cost_col, "alloc_cost")
    )


def sql_char_budget_mix(
    table: str = "documents",
    *,
    budget: int,
    alpha: float = 0.5,
    group_col: str = "lang",
    id_col: str = "doc_id",
    cost_col: str = "n_chars",
) -> str:
    """DuckDB twin of :func:`char_budget_mix` (same ``alpha`` domain)."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(
            f"sql_char_budget_mix requires 0 <= alpha <= 1 (got {alpha})"
        )
    return f"""
WITH totals AS (
  SELECT {group_col}, SUM({cost_col}) AS total_cost,
         round(pow(SUM({cost_col}), {alpha}), 6) AS w
  FROM {table} GROUP BY 1
), flags AS (
  SELECT *,
         SUM(w) OVER (ORDER BY total_cost, {group_col}
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS suffix_w,
         CASE WHEN ({budget} - COALESCE(SUM(total_cost) OVER (
                      ORDER BY total_cost, {group_col}
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
                   * w >= total_cost
                   * SUM(w) OVER (ORDER BY total_cost, {group_col}
                                  ROWS BETWEEN CURRENT ROW
                                           AND UNBOUNDED FOLLOWING)
              THEN 1 ELSE 0 END AS cond
  FROM totals
), plan0 AS (
  SELECT *,
         MIN(cond) OVER (ORDER BY total_cost, {group_col}
                         ROWS UNBOUNDED PRECEDING) = 1 AS capped
  FROM flags
), plan AS (
  SELECT {group_col},
         round(CASE WHEN capped THEN CAST(total_cost AS DOUBLE)
                    ELSE ({budget} - COALESCE(SUM(CASE WHEN capped
                                     THEN total_cost END) OVER (), 0))
                         * w
                         / SUM(CASE WHEN NOT capped THEN w END) OVER ()
               END, 6) AS alloc_cost
  FROM plan0
), ranked AS (
  SELECT {id_col}, {group_col}, {cost_col},
         SUM({cost_col}) OVER (
           PARTITION BY {group_col}
           ORDER BY md5(CAST({id_col} AS VARCHAR)) ASC, {id_col} ASC
           ROWS UNBOUNDED PRECEDING) AS running_cost
  FROM {table}
)
SELECT r.{id_col}, r.{group_col}, r.{cost_col}, p.alloc_cost
FROM ranked r JOIN plan p USING ({group_col})
WHERE r.running_cost <= p.alloc_cost
ORDER BY r.{id_col}
"""


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
